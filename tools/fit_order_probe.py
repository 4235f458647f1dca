"""Reproduce the round-14 kmeans row-order diagnosis (SCALE_ann_r14.md §2).

Two experiments over one corpus (default sf0.01):

1. ``refit``   — fit the PQ books into a FRESH index root and compare
   bit-for-bit against the reference artifact under the default root
   (the warm fit from a previous session). Expected: EQUAL — the fit is
   a deterministic function of the file bytes, across processes.
2. ``shuffled`` — rewrite the SAME logical rows in a shuffled physical
   order, fit, and count differing book cells. Expected: almost every
   cell moves (measured 1999/2000 at n=500) — k-means|| seeds by
   position, so the fit tracks the training input's PHYSICAL ROW ORDER.

Together these name the cross-session hash variable: the per-round
regenerated testdata refits (fingerprints key mtime) on a possibly
re-layouted file. The ``.fit_env.json`` sidecars record the layout
(``vec_id_order_sha``) so any future shift is attributable by diff.

3. ``canonical`` — the round-15 fix, PROVEN here before it ships: fit
   through ``repartition(1).sortWithinPartitions(vec_id)`` on both the
   original and the shuffled rewrite. Expected: bit-identical — the
   canonicalized sample makes the fit a pure function of logical
   content (the capped sample is executor-sized by TRAIN_SAMPLE_CAP, so
   one partition is the FAISS train-on-a-RAM-sample shape, not a
   scalability cost).

Usage: python tools/fit_order_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fit(spark, sf_dir: str):
    from mapreduce_hadoop_spark.operators import ann_index, similarity

    emb = similarity._with_norm(similarity.load_table(spark, sf_dir, "embeddings"))
    nvt = emb.select("vec_id", similarity._div_by("v", "norm").alias("nv"))
    n = ann_index.corpus_count(emb, sf_dir)
    k = min(similarity.PQ_TRAINED_K, max(16, n // 2))
    rows = ann_index.pq_codebooks(
        spark, nvt, sf_dir, similarity.PQ_TRAINED_M, similarity.PQ_TRAINED_SUB, k,
        tag="nv",
    )
    return sorted(rows), k


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_hadoop_spark.operators import ann_index
    from mapreduce_hadoop_spark.session import get_spark

    # Reference books: whatever the DEFAULT index root serves (load-or-fit).
    spark = get_spark("fit-order-probe", master="local[8]", shuffle_partitions=8)
    ref, k = _fit(spark, sf_dir)
    print(f"reference fit: k={k}, {len(ref)} book rows (root={ann_index.index_root()})")

    # 1. Fresh-root refit, same bytes.
    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/fit_order_probe_fresh"
    ann_index.clear_memos()
    fresh, _ = _fit(spark, sf_dir)
    print(f"refit (fresh root, same bytes) == reference: {fresh == ref}")

    # 2. Same logical rows, shuffled physical order.
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    perm = np.random.default_rng(7).permutation(t.num_rows)
    shuf_dir = "/tmp/fit_order_probe_shuffled_corpus"
    os.makedirs(shuf_dir, exist_ok=True)
    pq.write_table(t.take(pa.array(perm)), os.path.join(shuf_dir, "embeddings.parquet"))
    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/fit_order_probe_shuffled"
    ann_index.clear_memos()
    shuffled, _ = _fit(spark, shuf_dir)
    a = {(m, c): tuple(v) for m, c, v in shuffled}
    b = {(m, c): tuple(v) for m, c, v in ref}
    diff = sum(1 for kk in b if a.get(kk) != b[kk])
    print(f"shuffled-order fit: {diff}/{len(b)} book cells differ from reference")
    print(
        "verdict: fit is bit-reproducible on identical bytes; it is a "
        "function of PHYSICAL ROW ORDER (the named cross-session variable)"
    )

    # 3. The r15 recipe: canonicalized sample -> layout-independent fit.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from mapreduce_hadoop_spark.operators import similarity

    def canon_fit(d: str, m_subspaces=8, sub=8, kk=None):
        emb = similarity._with_norm(similarity.load_table(spark, d, "embeddings"))
        nvt = emb.select("vec_id", similarity._div_by("v", "norm").alias("nv"))
        kk = kk or k
        sample = (
            nvt.repartition(1)
            .sortWithinPartitions("vec_id")
            .select(
                *[
                    array_to_vector(
                        F.slice(F.col("nv"), m * sub + 1, sub)
                    ).alias(f"sub{m}")
                    for m in range(m_subspaces)
                ]
            )
            .persist()
        )
        rows = []
        for m in range(m_subspaces):
            km = KMeans(k=kk, seed=42 + m, maxIter=20, featuresCol=f"sub{m}").fit(
                sample
            )
            rows.extend(
                (m, code, [float(x) for x in c])
                for code, c in enumerate(km.clusterCenters())
            )
        sample.unpersist()
        return sorted(rows)

    ca, cb = canon_fit(sf_dir), canon_fit(shuf_dir)
    print(f"canonical fit: original == shuffled-order rewrite: {ca == cb}")
    print(
        "r15 recipe verdict: repartition(1).sortWithinPartitions(vec_id) "
        "before .fit() makes the model a pure function of logical content"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
