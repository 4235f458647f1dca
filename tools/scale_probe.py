"""Spark-only scale probe: time registry queries at two derived scales.

Produced SCALE_sf10_r5.md. Usage:

    python tools/make_scale_data.py 100 /root/testdata/sf0.1 .scale_data/sf10
    python tools/scale_probe.py [sf_dir_a] [sf_dir_b]

Defaults to .scale_data/sf1 vs .scale_data/sf10. Every query is forced
through the `noop` sink — NEVER time with ``df.count()``: Catalyst prunes
unevaluated projections under a bare count, which zeroes the cost of
map-only operators (a first probe reported 0.26 s for an operator whose
true cost was 29 s). Pair-generation queries are excluded by default on
key-shift-replicated data because true pair count grows with
replication^2 (output-bound by data shape, not plan shape).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_hadoop_spark import registry  # noqa: E402
from mapreduce_hadoop_spark.operators import dedup  # noqa: E402
from mapreduce_hadoop_spark.session import get_spark  # noqa: E402

LINEAR_PATH_QUERIES = [
    "trip_length_histogram", "segments_clean_positions", "trips_sessionize_window",
    "airport_trips_parity", "daily_revenue", "total_revenue", "pricing_summary",
    "revenue_by_nation", "shipping_priority", "top_orders_per_customer",
    "events_cube", "events_tumbling_window", "events_session_window",
    "events_keyed_dedup", "events_funnel", "events_cohort_retention",
    "views_before_purchase_range_join", "purchase_asof_view", "corpus_vocab_topk",
    "corpus_pack_sequences", "corpus_domain_mix", "text_quality_score",
    "text_token_counts", "text_gopher_rules", "text_span_dedup", "text_pii_scrub",
    "contamination_check", "dedup_exact", "embedding_quantize_int8",
    "similarity_topk_bruteforce", "similarity_topk_ivf",
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dir_a = sys.argv[1] if len(sys.argv) > 1 else f"{repo}/.scale_data/sf1"
    dir_b = sys.argv[2] if len(sys.argv) > 2 else f"{repo}/.scale_data/sf10"
    spark = get_spark("scale-probe")
    qs = registry.queries()
    out: dict[str, dict[str, float]] = {}
    for name in LINEAR_PATH_QUERIES:
        row: dict[str, float] = {}
        for label, d in [("a", dir_a), ("b", dir_b)]:
            df = qs[name](spark, d)
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            dedup.unpersist_intermediates()
            row[label] = round(time.time() - t, 2)
        row["ratio"] = round(row["b"] / max(row["a"], 0.01), 1)
        out[name] = row
        print(name, row, flush=True)
    print("JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
