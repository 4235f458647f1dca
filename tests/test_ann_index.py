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
    deltas = [d for d in os.listdir(app_dir) if ".delta." in d]
    # Flat-PQ codes + by-list residual codes + by-list raw serving copy
    # (the round-15 split: codes and raw are separate co-partitioned
    # artifacts so each scan opens only its own bytes) + the FLAT
    # re-layout of the residual codes (round 16: the codes-side cost
    # branch serves whichever copy reads fewer bytes at the probe set).
    assert len(deltas) == 4, deltas
    for d in deltas:
        # The delta name keys the base fingerprint AND the watermark
        # (ADVICE r12): an in-place ann_base.json edit must orphan it.
        assert f".delta.{base_key}.w{wm}" in d, d
        assert os.path.isfile(os.path.join(app_dir, d, "_SUCCESS"))
        n_delta = pq.read_table(os.path.join(app_dir, d)).num_rows
        assert n_delta == N_QUERIES, (d, n_delta)

    # Rewriting the DECLARATION in place (same embeddings bytes, new
    # watermark) must orphan the old delta: the served union re-encodes
    # under the new watermark instead of silently riding the stale one.
    ann_index.cached_relation(
        spark,
        str(base),
        "t.parquet",
        lambda: spark.createDataFrame([(1,)], "vec_id long"),
    )
    built = []

    def delta(w):
        built.append(w)
        return spark.createDataFrame([(w,)], "vec_id long")

    for new_wm in (wm + 1, wm + 2):
        ann_index.clear_memos()
        with open(app / "ann_base.json", "w") as f:
            json.dump({"base": str(base), "watermark": new_wm}, f)
        got = ann_index.cached_relation(
            spark,
            str(app),
            "t.parquet",
            lambda: (_ for _ in ()).throw(AssertionError("base must serve")),
            delta_build=delta,
        )
        assert got.count() == 2
    assert built == [wm + 1, wm + 2]


def test_fingerprint_directory_source_is_durable(spark, sf_dir, index_dir, tmp_path):
    """A directory-shaped embeddings.parquet (standard Spark writer
    output) must fingerprint durably from its largest part file — before
    round 13 it IsADirectoryError'd into volatile, silently disabling
    artifact persistence — and a regeneration with different bytes must
    re-key."""
    import pyarrow.parquet as pq

    corpus = tmp_path / "corpus"
    emb_dir = corpus / "embeddings.parquet"
    emb_dir.mkdir(parents=True)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    pq.write_table(t.slice(0, 100), emb_dir / "part-00000.parquet")
    pq.write_table(t.slice(100, 50), emb_dir / "part-00001.parquet")

    key = ann_index._fingerprint(str(corpus))
    assert not key.startswith("volatile-")
    # Stable across calls (memoized) and across processes (stat-derived).
    assert ann_index._fingerprint(str(corpus)) == key
    ann_index.clear_memos()
    assert ann_index._fingerprint(str(corpus)) == key

    # Regenerating the largest member in place (same mtime preserved via
    # utime) still re-keys: the footer hash sees the new bytes.
    st = os.stat(emb_dir / "part-00000.parquet")
    pq.write_table(t.slice(200, 100), emb_dir / "part-00000.parquet")
    os.utime(emb_dir / "part-00000.parquet", ns=(st.st_atime_ns, st.st_mtime_ns))
    ann_index.clear_memos()
    key2 = ann_index._fingerprint(str(corpus))
    if os.path.getsize(emb_dir / "part-00000.parquet") == st.st_size:
        assert key2 != key  # footer must carry the difference
    else:
        assert key2 != key  # size already re-keys


def test_fingerprint_memoized_one_footer_read(sf_dir, monkeypatch):
    """The 64 KiB footer read runs once per stat-identical snapshot per
    session (ADVICE r12: it was re-read on every call)."""
    ann_index.clear_memos()
    opens = []
    real_open = open

    def counting_open(path, *a, **k):
        if str(path).endswith(".parquet"):
            opens.append(str(path))
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", counting_open)
    k1 = ann_index._fingerprint(sf_dir)
    k2 = ann_index._fingerprint(sf_dir)
    k3 = ann_index._fingerprint(sf_dir)
    assert k1 == k2 == k3
    assert len(opens) == 1, opens


def test_append_lineage_missing_base_meta_warns(spark, sf_dir, index_dir, tmp_path):
    """A declared lineage whose base was never indexed falls back to the
    live count — correct but expensive — and must say so (ADVICE r12:
    the silent fallback hid a full retrain behind an 'append')."""
    import json
    import warnings

    import pyarrow.parquet as pq

    base = tmp_path / "base"
    base.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), base / "embeddings.parquet"
    )
    app = tmp_path / "app"
    app.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), app / "embeddings.parquet"
    )
    with open(app / "ann_base.json", "w") as f:
        json.dump({"base": str(base), "watermark": 10}, f)

    emb = _emb(spark, str(app))
    live_n = pq.read_metadata(app / "embeddings.parquet").num_rows
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n = ann_index.model_corpus_count(emb, str(app))
    assert n == live_n
    assert any("no index meta.json" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]

    # Once the base is indexed (meta.json exists) the frozen geometry
    # resolves silently.
    ann_index.corpus_count(_emb(spark, str(base)), str(base))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n2 = ann_index.model_corpus_count(emb, str(app))
    assert n2 == live_n  # same bytes, so same n — but from the base meta
    assert not caught, [str(w.message) for w in caught]


def test_write_committed_post_swap_recheck(spark, index_dir, tmp_path):
    """The swap must end with a committed build in place; replacing an
    existing artifact goes through the aside-rename (never an in-place
    rmtree) and cleans up after itself."""
    path = str(tmp_path / "rel.parquet")
    one = spark.createDataFrame([(1,)], "a long")
    ann_index._write_committed(one, path)
    assert os.path.isfile(os.path.join(path, "_SUCCESS"))
    two = spark.createDataFrame([(1,), (2,)], "a long")
    ann_index._write_committed(two, path)
    assert spark.read.parquet(path).count() == 2
    leftovers = [
        d for d in os.listdir(tmp_path) if ".old." in d or ".tmp." in d
    ]
    assert not leftovers, leftovers


def test_fit_env_sidecar_records_input_order(spark, sf_dir, index_dir, tmp_path):
    """Every fitted artifact gets a ``.fit_env.json`` sidecar whose
    ``vec_id_order_sha`` hashes the training input's PHYSICAL row order —
    the variable the round-14 diagnosis named for the cross-session
    kmeans hash shifts (same logical rows, shuffled layout -> 1999/2000
    pq book cells move). Two corpora with identical logical rows but
    different order must be attributable by sidecar diff alone."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = _emb(spark, sf_dir)
    ann_index.coarse_centroids(spark, emb, sf_dir, k=4)
    sidecar = os.path.join(
        ann_index._corpus_dir(sf_dir),
        f"coarse_k4_{ann_index._recipe(ann_index.COARSE_MAXITER)}.parquet.fit_env.json",
    )
    assert os.path.isfile(sidecar)
    with open(sidecar) as f:
        env = json.load(f)
    assert env["model"] == "coarse" and env["k"] == 4
    assert len(env["vec_id_order_sha"]) == 16

    # Same logical rows, reversed order -> different order hash.
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    rev = src.take(pa.array(range(src.num_rows - 1, -1, -1)))
    alt = tmp_path / "alt_corpus"
    alt.mkdir()
    pq.write_table(rev, str(alt / "embeddings.parquet"))
    alt_emb = _emb(spark, str(alt))
    ann_index.coarse_centroids(spark, alt_emb, str(alt), k=4)
    alt_sidecar = os.path.join(
        ann_index._corpus_dir(str(alt)),
        f"coarse_k4_{ann_index._recipe(ann_index.COARSE_MAXITER)}.parquet.fit_env.json",
    )
    with open(alt_sidecar) as f:
        alt_env = json.load(f)
    assert alt_env["vec_id_order_sha"] != env["vec_id_order_sha"]
    assert alt_env["vec_id_order_rows"] == env["vec_id_order_rows"]


def test_fit_is_layout_independent(spark, sf_dir, index_dir, tmp_path):
    """Round 15: the canonicalized training sample (one partition,
    vec_id-sorted — ``_canonical_sample``) makes every KMeans fit a pure
    function of LOGICAL corpus content. Same rows written in a shuffled
    physical order must yield bit-identical coarse centroids AND PQ
    books — the property whose absence caused the round-13/14
    cross-session hash shifts (k-means|| seeds by row position;
    tools/fit_order_probe.py experiment 2 measured 1999/2000 book cells
    moving without the canonicalization)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    perm = np.random.default_rng(7).permutation(src.num_rows)
    shuf = tmp_path / "shuffled_corpus"
    shuf.mkdir()
    pq.write_table(src.take(pa.array(perm)), str(shuf / "embeddings.parquet"))

    def fits(d):
        emb = _emb(spark, d)
        cents = ann_index.coarse_centroids(spark, emb, d, k=8)
        nvt = emb.select(
            "vec_id",
            F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("nv"),
        )
        books = ann_index.pq_codebooks(spark, nvt, d, 4, 16, 8, tag="nv")
        return cents, sorted(books)

    orig = fits(sf_dir)
    shuffled = fits(str(shuf))
    assert shuffled[0] == orig[0], "coarse centroids track physical row order"
    assert shuffled[1] == orig[1], "PQ books track physical row order"


def test_zero_row_delta_serves_base_alone(spark, sf_dir, index_dir, tmp_path):
    """A degenerate append declaration (watermark above every vec_id —
    a legal zero-row delta) must serve the base artifact alone instead
    of failing schema inference on a data-file-less delta commit
    (ADVICE r15), for flat AND by-list layouts; relation_paths mirrors
    the same resolution (base only)."""
    import json

    base = tmp_path / "base"
    base.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), base / "embeddings.parquet"
    )
    emb_base = _emb(spark, str(base))
    app = tmp_path / "app"
    app.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), app / "embeddings.parquet"
    )
    with open(app / "ann_base.json", "w") as f:
        json.dump({"base": str(base), "watermark": 1 << 40}, f)

    import pyspark.sql.functions as F

    for name, part in (("zrd_flat.parquet", None), ("zrd_bylist.parquet", "cent_id")):
        build = lambda: emb_base.select(
            "vec_id", (F.col("vec_id") % 4).cast("int").alias("cent_id")
        )
        got = ann_index.cached_relation(
            spark, str(base), name, build, delta_build=None, partition_by=part
        )
        n_base = got.count()
        emb_app = _emb(spark, str(app))
        served = ann_index.cached_relation(
            spark,
            str(app),
            name,
            lambda: emb_app.select(
                "vec_id", (F.col("vec_id") % 4).cast("int").alias("cent_id")
            ),
            delta_build=lambda wm: emb_app.filter(F.col("vec_id") >= wm).select(
                "vec_id", (F.col("vec_id") % 4).cast("int").alias("cent_id")
            ),
            partition_by=part,
        )
        assert served.count() == n_base
        paths = ann_index.relation_paths(str(app), name)
        assert paths is not None
        assert paths[0] == os.path.join(ann_index._corpus_dir(str(base)), name)
        if part is not None:
            # partitionBy writes NO data files for zero rows — the read
            # and the byte accounting must both resolve to base alone.
            assert paths == [os.path.join(ann_index._corpus_dir(str(base)), name)]


def test_relation_paths_is_none_before_delta_commits(spark, sf_dir, index_dir, tmp_path):
    """ADVICE r15: with a lineage declared and the base committed but
    the delta NOT yet built, relation_paths must return None (the cost
    rule then takes the safe flat branch) instead of silently resolving
    to a stale full artifact."""
    import json

    import pyspark.sql.functions as F

    base = tmp_path / "base"
    base.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), base / "embeddings.parquet"
    )
    app = tmp_path / "app"
    app.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), app / "embeddings.parquet"
    )

    name = "rp_probe.parquet"
    emb_base = _emb(spark, str(base))
    ann_index.cached_relation(
        spark,
        str(base),
        name,
        lambda: emb_base.select("vec_id"),
    )
    # A stale FULL artifact exists under the appended corpus' own key
    # (e.g. built before the lineage was declared)...
    emb_app_pre = _emb(spark, str(app))
    ann_index.cached_relation(
        spark, str(app), name, lambda: emb_app_pre.select("vec_id")
    )
    # ...then the lineage lands.
    with open(app / "ann_base.json", "w") as f:
        json.dump({"base": str(base), "watermark": 50}, f)
    ann_index.clear_memos()
    assert ann_index.relation_paths(str(app), name) is None


def test_column_bytes_prices_only_named_columns(sf_dir, tmp_path):
    """ADVICE r15: the cost rule's flat side must price only the columns
    the re-rank scan reads. On a file with an extra fat column,
    column_bytes(vec_id, embedding) must exclude it; on the gate corpus
    (exactly those columns) it is bounded by the whole-file size and
    accounts for nearly all of it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "embeddings.parquet")
    want = ann_index.column_bytes(src, ["vec_id", "embedding"])
    whole = ann_index.tree_bytes(src)
    assert 0 < want < whole
    assert want > whole * 0.8, "2-column file: column bytes ~= file bytes"

    import numpy as np

    t = pq.read_table(src)
    rng = np.random.default_rng(5)
    pad = pa.array(
        [rng.integers(0, 256, 4096, dtype=np.uint8).tobytes() for _ in range(t.num_rows)],
        pa.binary(),
    )
    fat = t.append_column("pad", pad)
    fat_path = tmp_path / "fat.parquet"
    pq.write_table(fat, fat_path)
    pruned = ann_index.column_bytes(str(fat_path), ["vec_id", "embedding"])
    assert pruned < ann_index.tree_bytes(str(fat_path)) * 0.5
    # Unreadable metadata falls back to the whole-file upper bound.
    bogus = tmp_path / "bogus.parquet"
    bogus.write_bytes(b"not parquet")
    assert ann_index.column_bytes(str(bogus), ["x"]) == ann_index.tree_bytes(
        str(bogus)
    )
