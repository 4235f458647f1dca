"""Measure the by-list layout's byte mechanics on production-shaped data.

The committed crossover corpus (xover_f500, n=1M) is SYNTHETICALLY
compressible: 500 mutated replicas of 2000 vectors share a per-file
parquet dictionary, so the flat embeddings file holds 512 MB of raw
doubles in 143 MB — an advantage a by-list (clustered-by-coarse-list)
copy cannot keep, because clustering scatters each base vector's
replicas across lists. Production embeddings are incompressible, so the
committed corpus UNDERPRICES the layout exactly where it is designed to
win (SCALE_ann_r15.md).

This tool derives an INCOMPRESSIBLE twin of xover_f500 — every element
multiplied by (1 + u*1e-9) with a deterministic per-element jitter:
cosines and probe geometry preserved to ~1e-9, parquet dictionaries
destroyed — and measures batch-1 ivfpq_trained scan bytes in a 2x2:

  probe mode:   adaptive (eps=0.3, the recall knee on mutated data)
                x fixed floor (nprobe = K/3, the organic-profile width)
  raw source:   cost-based (by-list pruned when it wins)
                x forced-flat (the pre-r15 plan shape)

The floor row prices the ORGANIC probe profile's bytes on this corpus
(organic corpora keep the floor width — measured r13/r14); its recall
on THIS clustered corpus is the known 0.54 floor, so it is a bytes-
mechanism row, not a serving configuration.

Usage: python tools/bylist_bytes_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ann_crossover import _scan_bytes_since, derive  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def derive_incompressible() -> str:
    src_dir = derive(500)
    dst = os.path.join(REPO, ".scale_data", "xover_f500ic")
    out = os.path.join(dst, "embeddings.parquet")
    t = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    if os.path.isfile(out) and pq.read_metadata(out).num_rows == t.num_rows:
        return dst
    os.makedirs(dst, exist_ok=True)
    emb = t.column("embedding").combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(2027)
    jitter = 1.0 + rng.uniform(-1e-9, 1e-9, size=len(flat))
    vals = pa.array(flat * jitter, type=pa.float64())
    new_emb = pa.FixedSizeListArray.from_arrays(vals, emb.type.list_size) if (
        pa.types.is_fixed_size_list(emb.type)
    ) else pa.ListArray.from_arrays(emb.offsets, vals)
    out_t = pa.table(
        {
            n: (new_emb if n == "embedding" else t.column(n))
            for n in t.schema.names
        }
    )
    pq.write_table(out_t, out)
    return dst


def main() -> int:
    from mapreduce_hadoop_spark.operators import ann_index, similarity
    from mapreduce_hadoop_spark.session import get_spark

    sf_dir = derive_incompressible()
    print(
        f"incompressible twin: "
        f"{ann_index.tree_bytes(os.path.join(sf_dir, 'embeddings.parquet')) / 1e6:.1f}"
        f" MB flat file (vs "
        f"{ann_index.tree_bytes(os.path.join(derive(500), 'embeddings.parquet')) / 1e6:.1f}"
        f" MB synthetic-compressible)"
    )

    spark = get_spark("bylist-bytes", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1).count()

    # Forcing the flat branch now zeroes column_bytes (round 16: the
    # cost rule prices the flat side by column-chunk bytes, not
    # tree_bytes — and the codes side is cost-based too, so forced_flat
    # forces BOTH sides flat, the exact pre-r15 plan shape).
    real_column_bytes = ann_index.column_bytes
    real_eps = similarity.IVFPQ_PROBE_EPS
    results = {}
    for probe_mode, eps in (("adaptive", real_eps), ("floor", 0.0)):
        for raw_mode in ("cost_based", "forced_flat"):
            similarity.IVFPQ_PROBE_EPS = eps
            ann_index.column_bytes = (
                (lambda p, c: 0) if raw_mode == "forced_flat" else real_column_bytes
            )
            old_nq = similarity.N_QUERIES
            similarity.N_QUERIES = 1
            try:
                # warm untimed (artifacts + plan), then min-of-2 with bytes.
                spark.catalog.clearCache()
                similarity.unpersist_intermediates()
                similarity.topk_ivfpq_trained(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                best, bytes_read = float("inf"), -1
                cursor = _scan_bytes_since(spark, -1)[1]
                for _ in range(2):
                    spark.catalog.clearCache()
                    similarity.unpersist_intermediates()
                    t0 = time.time()
                    similarity.topk_ivfpq_trained(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.time() - t0)
                    bytes_read, cursor = _scan_bytes_since(spark, cursor)
            finally:
                similarity.N_QUERIES = old_nq
                similarity.IVFPQ_PROBE_EPS = real_eps
                ann_index.column_bytes = real_column_bytes
            key = f"{probe_mode}/{raw_mode}"
            results[key] = {
                "sec": round(best, 2),
                "mb_scanned": round(bytes_read / 1e6, 1),
            }
            print(f"| n=1M incompressible | batch1 | {key} | {results[key]['sec']} s "
                  f"| {results[key]['mb_scanned']} MB scanned |", flush=True)
    # Round 16 (the r15 residual, VERDICT order 3): the SYNTHETIC
    # compressible corpus at the default batch (N_QUERIES=10, adaptive
    # probes = full union) — where r15's always-by-list codes scan paid
    # 171.0 vs the pre-r15 163.1 MB. With the codes-side cost branch the
    # scan must return to the flat codes artifact and <= 163 MB.
    syn = derive(500)
    spark.catalog.clearCache()
    similarity.unpersist_intermediates()
    similarity.topk_ivfpq_trained(spark, syn).write.format("noop").mode(
        "overwrite"
    ).save()
    best, bytes_read = float("inf"), -1
    cursor = _scan_bytes_since(spark, -1)[1]
    for _ in range(2):
        spark.catalog.clearCache()
        similarity.unpersist_intermediates()
        t0 = time.time()
        similarity.topk_ivfpq_trained(spark, syn).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
        bytes_read, cursor = _scan_bytes_since(spark, cursor)
    results["synthetic/batch10/cost_based"] = {
        "sec": round(best, 2),
        "mb_scanned": round(bytes_read / 1e6, 1),
    }
    print(
        f"| n=1M synthetic | batch10 | cost_based | {round(best, 2)} s "
        f"| {round(bytes_read / 1e6, 1)} MB scanned |",
        flush=True,
    )
    print(json.dumps({"bylist_bytes_probe": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
