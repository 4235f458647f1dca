"""Demonstrate the kmeans row-order variable and the shipped fix.

Round 14 diagnosed the cross-session kmeans hash shifts
(SCALE_ann_r14.md §2): k-means|| seeds by PHYSICAL ROW POSITION, so a
fit was a deterministic function of (file bytes, layout) but NOT of
logical content — a regenerated corpus with identical rows in a
different layout moved 1999/2000 PQ book cells. Round 15 SHIPPED the
fix (`ann_index._canonical_sample`: every fit's capped sample goes
through ``repartition(1).sortWithinPartitions("vec_id")``; recipe
bumped to ``...o1``).

Three experiments over one corpus (default sf0.01):

1. ``refit``   — fit the PQ books into a FRESH index root and compare
   bit-for-bit against the reference artifact under the default root.
   Expected: EQUAL — the fit is deterministic across processes.
2. ``shuffled`` — rewrite the SAME logical rows in a shuffled physical
   order and fit through the SHIPPED path. Expected since round 15:
   0/2000 cells differ (the canonicalized sample makes the fit a pure
   function of logical content; tests/test_ann_index.py::
   test_fit_is_layout_independent pins this in the suite).
3. ``legacy``  — the same two fits through an UN-canonicalized inline
   KMeans (the pre-r15 recipe). Expected: almost every cell moves
   (measured 1999/2000 at n=500) — demonstrating the underlying
   variable still exists in k-means|| itself and is neutralized only
   by the canonicalization.

Usage: python tools/fit_order_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fit(spark, sf_dir: str):
    """The SHIPPED fit path (canonicalized sample since round 15)."""
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


def _legacy_fit(spark, sf_dir: str, k: int):
    """The pre-r15 fit: KMeans straight over the sample in file order —
    kept here to demonstrate the row-order variable the shipped
    canonicalization neutralizes."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from mapreduce_hadoop_spark.operators import similarity

    m_subspaces, sub = similarity.PQ_TRAINED_M, similarity.PQ_TRAINED_SUB
    emb = similarity._with_norm(similarity.load_table(spark, sf_dir, "embeddings"))
    nvt = emb.select("vec_id", similarity._div_by("v", "norm").alias("nv"))
    sample = nvt.select(
        *[
            array_to_vector(F.slice(F.col("nv"), m * sub + 1, sub)).alias(f"sub{m}")
            for m in range(m_subspaces)
        ]
    ).persist()
    rows = []
    for m in range(m_subspaces):
        km = KMeans(k=k, seed=42 + m, maxIter=20, featuresCol=f"sub{m}").fit(sample)
        rows.extend(
            (m, code, [float(x) for x in c])
            for code, c in enumerate(km.clusterCenters())
        )
    sample.unpersist()
    return sorted(rows)


def _diff(a_rows, b_rows) -> str:
    a = {(m, c): tuple(v) for m, c, v in a_rows}
    b = {(m, c): tuple(v) for m, c, v in b_rows}
    return f"{sum(1 for kk in b if a.get(kk) != b[kk])}/{len(b)}"


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

    # 2. Same logical rows, shuffled physical order — SHIPPED path.
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    perm = np.random.default_rng(7).permutation(t.num_rows)
    shuf_dir = "/tmp/fit_order_probe_shuffled_corpus"
    os.makedirs(shuf_dir, exist_ok=True)
    pq.write_table(t.take(pa.array(perm)), os.path.join(shuf_dir, "embeddings.parquet"))
    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/fit_order_probe_shuffled"
    ann_index.clear_memos()
    shuffled, _ = _fit(spark, shuf_dir)
    print(
        f"shipped (canonicalized) fit, shuffled-order rewrite: "
        f"{_diff(shuffled, ref)} book cells differ from reference "
        f"(expected 0 since round 15)"
    )

    # 3. The pre-r15 legacy fit: the variable itself, still demonstrable.
    legacy_orig = _legacy_fit(spark, sf_dir, k)
    legacy_shuf = _legacy_fit(spark, shuf_dir, k)
    print(
        f"legacy (un-canonicalized) fit: {_diff(legacy_shuf, legacy_orig)} "
        f"book cells differ between original and shuffled layouts "
        f"(the named round-14 variable)"
    )
    print(
        "verdict: k-means|| seeds by physical row position; the shipped "
        "repartition(1).sortWithinPartitions(vec_id) sample makes the "
        "fitted model a pure function of logical content"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
