"""Persisted ANN index artifacts: the FAISS train/add split, machine-checked.

The contract (VERDICT r10 order 4): fitted model parameters (coarse
centroids, PQ codebooks, corpus counts) are written ONCE per corpus
snapshot under the index root; a warm session — even a brand-new Python
process — loads the artifact and plans ZERO training jobs; an in-place
corpus mutation changes the snapshot fingerprint so stale artifacts are
never served.
"""

from __future__ import annotations

import os
import shutil

import pytest

from mapreduce_hadoop_spark.operators import ann_index
from mapreduce_hadoop_spark.operators.similarity import _with_norm
from mapreduce_hadoop_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    """The (vec_id, v, norm) relation every similarity operator trains
    on — coarse_centroids expects the projected column ``v``."""
    return _with_norm(load_table(spark, sf_dir, "embeddings"))


@pytest.fixture()
def index_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "annidx")
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", d)
    ann_index.clear_memos()
    yield d
    ann_index.clear_memos()


def test_warm_load_plans_zero_training_jobs(spark, sf_dir, index_dir, monkeypatch):
    """Second load of the same model must come from the disk artifact:
    after clearing the in-session memo, KMeans itself is poisoned — if
    the warm path ever re-fits, the test explodes."""
    emb = _emb(spark, sf_dir)
    cold = ann_index.coarse_centroids(spark, emb, sf_dir, k=4)
    assert len(cold) == 4 and len(cold[0][1]) > 0

    ann_index.clear_memos()
    import pyspark.ml.clustering as mlc

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("warm load must not re-fit KMeans")

    monkeypatch.setattr(mlc, "KMeans", boom)
    warm = ann_index.coarse_centroids(spark, emb, sf_dir, k=4)
    assert warm == cold


def test_artifacts_keyed_by_corpus_fingerprint(spark, sf_dir, index_dir, tmp_path):
    """An in-place corpus rewrite (same path, new bytes/mtime) must yield
    a NEW snapshot key — stale artifacts orphan instead of serving."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"),
        corpus / "embeddings.parquet",
    )
    key1 = ann_index._fingerprint(str(corpus))
    # Same snapshot -> same key (stable across calls).
    assert ann_index._fingerprint(str(corpus)) == key1
    os.utime(corpus / "embeddings.parquet", ns=(1, 1))
    key2 = ann_index._fingerprint(str(corpus))
    assert key2 != key1


def test_corpus_count_persists(spark, sf_dir, index_dir, monkeypatch):
    emb = _emb(spark, sf_dir)
    n = ann_index.corpus_count(emb, sf_dir)
    assert n == emb.count()
    # Warm path: memo cleared, count() poisoned -> must read meta.json.
    ann_index.clear_memos()
    from pyspark.sql import DataFrame

    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("warm corpus_count must not run a count() job")

    monkeypatch.setattr(DataFrame, "count", boom)
    assert ann_index.corpus_count(emb, sf_dir) == n


def test_pq_codebooks_shape_and_warm_identity(spark, sf_dir, index_dir, monkeypatch):
    import pyspark.sql.functions as F

    emb = _emb(spark, sf_dir)
    nvt = emb.select(
        "vec_id", F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("nv")
    )
    m_sub, sub, k = 4, 16, 8
    rows = ann_index.pq_codebooks(spark, nvt, sf_dir, m_sub, sub, k, tag="nv")
    assert len(rows) == m_sub * k
    assert all(len(cd) == sub for _, _, cd in rows)
    assert {m for m, _, _ in rows} == set(range(m_sub))
    assert {c for _, c, _ in rows} == set(range(k))

    ann_index.clear_memos()
    import pyspark.ml.clustering as mlc

    monkeypatch.setattr(
        mlc, "KMeans", lambda *a, **kw: (_ for _ in ()).throw(AssertionError("refit"))
    )
    assert ann_index.pq_codebooks(spark, nvt, sf_dir, m_sub, sub, k, tag="nv") == rows


def test_volatile_corpus_gets_no_disk_artifact(spark, sf_dir, index_dir, tmp_path):
    """Unlistable/remote corpus -> volatile fingerprint, session-memo only:
    a path whose bytes cannot be fingerprinted must never serve a stale
    model across sessions (mirrors parquet_scan_width's
    unknown-never-narrow stance)."""
    key = ann_index._fingerprint("/no/such/dir")
    assert key.startswith("volatile-")
    assert not ann_index._durable(key)

    # A count against a volatile key memoizes but writes nothing to disk.
    emb = _emb(spark, sf_dir)
    n = ann_index.corpus_count(emb, "/no/such/dir")
    assert n == emb.count()
    assert key in ann_index._META_MEMO
    assert not os.path.exists(index_dir) or key not in os.listdir(index_dir)


def test_cached_relation_builds_once(spark, sf_dir, index_dir):
    """The FAISS `add` half: second load must come from the parquet
    artifact — the build callable is poisoned after the first call."""
    emb = _emb(spark, sf_dir)
    small = emb.select("vec_id").limit(7)
    got = ann_index.cached_relation(spark, sf_dir, "t.parquet", lambda: small)
    assert got.count() == 7

    def boom():  # pragma: no cover - failure path
        raise AssertionError("warm cached_relation must not rebuild")

    warm = ann_index.cached_relation(spark, sf_dir, "t.parquet", boom)
    assert warm.count() == 7
    # And the artifact is a committed Spark parquet directory.
    d = os.path.join(index_dir, ann_index._fingerprint(sf_dir), "t.parquet")
    assert os.path.isfile(os.path.join(d, "_SUCCESS"))


def test_cached_relation_volatile_skips_disk(spark, sf_dir, index_dir):
    emb = _emb(spark, sf_dir)
    small = emb.select("vec_id").limit(3)
    got = ann_index.cached_relation(spark, "/no/such/dir", "t.parquet", lambda: small)
    assert got.count() == 3
    key = ann_index._fingerprint("/no/such/dir")
    assert not os.path.exists(os.path.join(index_dir, key))


def test_incremental_append_serves_without_refit(spark, sf_dir, index_dir, tmp_path, monkeypatch):
    """The FAISS ``add`` contract (round 12): an append-only corpus with
    a declared lineage (ann_base.json) serves against the BASE
    snapshot's FROZEN models — KMeans is poisoned, so any refit
    explodes — encoding ONLY the appended rows into a delta artifact;
    the base codes artifact's bytes are untouched, and the appended
    vectors are immediately searchable (an exact duplicate of each
    query vector must come back at cosine 1.0)."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from mapreduce_hadoop_spark.operators.similarity import (
        N_QUERIES,
        topk_ivfpq_trained,
        topk_pq_trained,
        unpersist_intermediates,
    )

    base = tmp_path / "base"
    base.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), base / "embeddings.parquet"
    )
    # Index the base snapshot (train + add, persisted under its key).
    for fn in (topk_pq_trained, topk_ivfpq_trained):
        fn(spark, str(base)).collect()
        unpersist_intermediates()

    # Appended corpus: base rows + an exact duplicate of every query
    # vector at vec_id = watermark + qid.
    wm = 1_000_000
    t = pq.read_table(base / "embeddings.parquet")
    dup = t.filter(pc.less(t.column("vec_id"), pa.scalar(N_QUERIES)))
    dup = dup.set_column(
        dup.schema.get_field_index("vec_id"),
        dup.schema.field("vec_id"),
        pc.add(dup.column("vec_id"), pa.scalar(wm, pa.int64())),
    )
    app = tmp_path / "app"
    app.mkdir()
    pq.write_table(pa.concat_tables([t, dup]), app / "embeddings.parquet")
    with open(app / "ann_base.json", "w") as f:
        json.dump({"base": str(base), "watermark": wm}, f)

    base_key = ann_index._fingerprint(str(base))
    base_dir = os.path.join(index_dir, base_key)
    snapshot = {
        os.path.join(r, fn): os.path.getmtime(os.path.join(r, fn))
        for r, _, fns in os.walk(base_dir)
        for fn in fns
    }
    assert any("codes_" in p for p in snapshot)

    ann_index.clear_memos()
    import pyspark.ml.clustering as mlc

    monkeypatch.setattr(
        mlc,
        "KMeans",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("append must serve frozen models, not refit")
        ),
    )
    for fn in (topk_pq_trained, topk_ivfpq_trained):
        rows = fn(spark, str(app)).collect()
        unpersist_intermediates()
        hits = {
            (r["query_id"], r["vec_id"]) for r in rows if r["cosine"] == 1.0
        }
        for qid in range(N_QUERIES):
            assert (qid, wm + qid) in hits, (fn.__name__, qid)

    # Base artifacts byte-untouched; delta artifacts live under the
    # APPENDED corpus' own fingerprint.
    after = {
        os.path.join(r, fn): os.path.getmtime(os.path.join(r, fn))
        for r, _, fns in os.walk(base_dir)
        for fn in fns
    }
    assert after == snapshot
    app_dir = os.path.join(index_dir, ann_index._fingerprint(str(app)))
    deltas = [d for d in os.listdir(app_dir) if d.endswith(".delta")]
    assert len(deltas) == 2, deltas  # flat codes + residual codes
    for d in deltas:
        assert os.path.isfile(os.path.join(app_dir, d, "_SUCCESS"))
        n_delta = pq.read_table(os.path.join(app_dir, d)).num_rows
        assert n_delta == N_QUERIES, (d, n_delta)
