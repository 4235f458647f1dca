"""Query registry: every implemented operator exposed as a (query, oracle) pair.

Each entry maps a SURVEY.md §2 operator (or north-star extension) to
1. a Spark callable ``(spark, sf_dir) -> DataFrame`` and
2. (where SQL-expressible) a DuckDB oracle SQL string over the same tables.

Column names are aliased identically on both sides — the driver sorts columns
by name before hashing values.

Driver-window rotation policy
-----------------------------
The correctness driver checks only the FIRST 50 registry entries; the
registry holds 75 (the counts below track the current registry — the
rule, not the numbers, is what's fixed). Ordering rule, from round 4 on:

1. Any query whose code, oracle, or output changed this round MUST be in
   the head-50 (a fresh driver row is the only acceptable evidence).
2. The remaining head slots go to the queries whose last driver row is
   oldest, so no query ever goes more than one round without a driver
   row (2-round cadence worst case).
3. Every tail entry must carry a green (or documented rows-only)
   driver row from the IMMEDIATELY PRECEDING round, and
   tools/check_oracle.py still gates the full registry locally every
   round (committed GATE_*.log artifacts).

Round-4 application: the 22 queries displaced in round 3 (multimodal x4,
similarity LSH/bruteforce/filtered, six text ops, six relational-ext, two
analytics) rotate into the head, as do this round's three new queries
(text_pii_scrub, dedup_keep_best, trips_concurrency) and every changed
one; the 25-entry tail is all round-3-green queries untouched this round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]


def _specs() -> dict[str, QuerySpec]:
    from mapreduce_hadoop_spark.operators import (
        analytics,
        corpus,
        dedup,
        histogram,
        multimodal,
        relational_ext,
        revenue,
        scalars,
        segments,
        sessionize,
        similarity,
        sqlapi,
        temporal,
        textops,
    )
    from mapreduce_hadoop_spark.streaming import joins as stream_joins
    from mapreduce_hadoop_spark.streaming import sessions, trips

    specs: dict[str, QuerySpec] = {
        # --- Driver-window head (first 50) --------------------------------
        # Rotated in this round: no driver row since round 2 (rule 2).
        "events_daily_by_type": (
            analytics.events_daily_by_type,
            analytics.EVENTS_DAILY_ORACLE,
        ),
        "market_segment_balance": (
            analytics.market_segment_balance,
            analytics.MARKET_SEGMENT_ORACLE,
        ),
        "text_language_id_ngram": (
            textops.language_id_ngram,
            textops.LANGUAGE_ID_NGRAM_ORACLE,
        ),
        "text_fingerprints": (textops.fingerprints, textops.FINGERPRINTS_ORACLE),
        "text_tfidf_top_terms": (textops.tfidf_top_terms, textops.TFIDF_ORACLE),
        "text_document_chunks": (textops.document_chunks, textops.DOCUMENT_CHUNKS_ORACLE),
        "text_normalize": (textops.text_normalize, textops.TEXT_NORMALIZE_ORACLE),
        "text_repetition_score": (textops.repetition_score, textops.REPETITION_ORACLE),
        # Similarity search (north-star extension).
        "similarity_topk_bruteforce": (
            similarity.topk_bruteforce,
            similarity.TOPK_BRUTEFORCE_ORACLE,
        ),
        "similarity_topk_filtered": (
            similarity.topk_filtered,
            similarity.TOPK_FILTERED_ORACLE,
        ),
        "similarity_topk_lsh": (similarity.topk_lsh, similarity.TOPK_LSH_ORACLE),
        "similarity_near_dup_lsh": (
            similarity.near_dup_cosine_lsh,
            similarity.NEAR_DUP_LSH_ORACLE,
        ),
        # Multimodal binary-column plumbing (north-star extension).
        "multimodal_metadata": (multimodal.media_metadata, multimodal.MEDIA_METADATA_ORACLE),
        "multimodal_decode_stub": (
            multimodal.media_decode_query,
            multimodal.MEDIA_DECODE_ORACLE,
        ),
        "multimodal_resize_stub": (
            multimodal.media_resize_query,
            multimodal.MEDIA_RESIZE_ORACLE,
        ),
        "multimodal_frame_sample": (
            multimodal.frame_sample_query,
            multimodal.FRAME_SAMPLE_ORACLE,
        ),
        # Extended relational surface (rollup / as-of / JSON / sketches / set ops).
        "events_rollup": (
            relational_ext.events_rollup,
            relational_ext.EVENTS_ROLLUP_ORACLE,
        ),
        "purchase_asof_view": (
            relational_ext.purchase_asof_view,
            relational_ext.PURCHASE_ASOF_ORACLE,
        ),
        "event_props_json": (
            relational_ext.event_props_stats,
            relational_ext.EVENT_PROPS_ORACLE,
        ),
        "distinct_users_daily": (
            relational_ext.distinct_users_daily,
            relational_ext.DISTINCT_USERS_ORACLE,
        ),
        # HLL sketch: estimates are engine-specific -> rows-only check;
        # tests/test_relational_ext.py bounds the error vs the exact twin.
        "approx_distinct_users_daily": (
            relational_ext.approx_distinct_users_daily,
            None,
        ),
        "segment_customer_setops": (
            relational_ext.segment_customer_setops,
            relational_ext.SETOPS_ORACLE,
        ),
        # Changed this round (rule 1): IVF defaults re-tuned (nprobe knee),
        # trained variant promoted; contamination n_sh widened to bigint;
        # dedup_clusters non-convergence now raises; streaming trip machine
        # grew a late-drop counter + event-time-timeout variant.
        # New this round (rule 1): PII redaction pass, the cluster ->
        # keep-decision composition, and sweep-line trip concurrency.
        "text_pii_scrub": (textops.pii_scrub, textops.PII_SCRUB_ORACLE),
        "dedup_keep_best": (dedup.dedup_keep_best, dedup.DEDUP_KEEP_BEST_ORACLE),
        "trips_concurrency": (
            temporal.trips_concurrency,
            temporal.TRIPS_CONCURRENCY_ORACLE,
        ),
        # Changed this round (rule 1): rewritten as the skew-routed
        # interval join (hot-branch decomposition + statistics probe).
        "views_before_purchase_range_join": (
            temporal.views_before_purchase_range_join,
            temporal.VIEWS_BEFORE_PURCHASE_ORACLE,
        ),
        "similarity_topk_ivf": (similarity.topk_ivf, similarity.TOPK_IVF_ORACLE),
        # K-means training is not SQL-expressible -> rows-only; recall vs
        # the fixed-centroid variant bounded in tests/test_similarity_ivf.py.
        "similarity_topk_ivf_trained": (similarity.topk_ivf_trained, None),
        "contamination_check": (dedup.contamination_check, dedup.CONTAMINATION_ORACLE),
        "dedup_clusters": (dedup.dedup_clusters, dedup.DEDUP_CLUSTERS_ORACLE),
        # Streaming trip machine, batch-twin form: replays the reducer
        # carrier across simulated micro-batch boundaries. Order-dependent
        # stateful fold -> rows-only; bit-identity to the parity path (and
        # its committed golden fixture) pinned in tests/test_streaming_trips.py.
        "airport_trips_microbatch": (trips.airport_trips_microbatch, None),
        # Reference surface (O1-O23) — the engine's core; always in-window.
        "trip_length_histogram": (histogram.histogram_query, histogram.ORACLE_SQL),
        "segments_clean_positions": (segments.clean_positions_query, segments.ORACLE_SQL),
        "trips_sessionize_window": (
            sessionize.trips_window_query,
            sessionize.TRIPS_WINDOW_ORACLE,
        ),
        "airport_trips_window": (
            sessionize.airport_trips_query,
            sessionize.AIRPORT_TRIPS_ORACLE,
        ),
        # O15 parity path: exact state-machine replay (order-dependent
        # speed-drop semantics; not SQL-expressible -> rows-only check,
        # unit fixtures in tests/test_sessionize.py).
        "airport_trips_parity": (sessionize.airport_trips_parity_query, None),
        "daily_revenue": (revenue.daily_revenue_query, revenue.DAILY_ORACLE),
        "total_revenue": (revenue.total_revenue_query, revenue.TOTAL_ORACLE),
        # Deduplication + composed corpus pipeline.
        "dedup_exact": (dedup.exact_dedup, dedup.EXACT_DEDUP_ORACLE),
        "dedup_minhash_lsh": (dedup.minhash_lsh_pairs, dedup.MINHASH_LSH_ORACLE),
        "dedup_simhash": (dedup.simhash_pairs, dedup.SIMHASH_ORACLE),
        "dedup_ngram_jaccard": (dedup.ngram_jaccard_pairs, dedup.NGRAM_JACCARD_ORACLE),
        "corpus_clean_stats": (corpus.corpus_clean_stats, corpus.CORPUS_CLEAN_ORACLE),
        # Generic gap sessionization via Spark's native session_window
        # (batch surface; streaming twin in streaming/sessions.py).
        "events_session_window": (sessions.session_agg, sessions.SESSION_AGG_ORACLE),
        # Relational breadth beyond the reference (joins / window top-N /
        # grouped rollups) — SURVEY.md §2.4 "available for extensions".
        "pricing_summary": (analytics.pricing_summary, analytics.PRICING_SUMMARY_ORACLE),
        "revenue_by_nation": (
            analytics.revenue_by_nation,
            analytics.REVENUE_BY_NATION_ORACLE,
        ),
        "top_orders_per_customer": (
            analytics.top_orders_per_customer,
            analytics.TOP_ORDERS_ORACLE,
        ),
        "shipping_priority": (
            analytics.shipping_priority,
            analytics.SHIPPING_PRIORITY_ORACLE,
        ),
        # Text analysis representatives.
        "text_quality_score": (textops.quality_score, textops.QUALITY_ORACLE),
        "text_token_counts": (textops.token_counts, textops.TOKEN_COUNTS_ORACLE),
        # --- Past the 50-entry driver window ------------------------------
        # Everything below is UNCHANGED this round and carries a green (or
        # documented rows-only) CORRECTNESS_r03 row; tools/check_oracle.py
        # still gates all of it locally every round (committed GATE_*.log).
        # Per the rotation policy these rotate back into the head next round.
        "events_cube": (relational_ext.events_cube, relational_ext.EVENTS_CUBE_ORACLE),
        "customer_balance_windows": (
            relational_ext.customer_balance_windows,
            relational_ext.CUSTOMER_WINDOWS_ORACLE,
        ),
        "events_hash_sample": (
            relational_ext.events_hash_sample,
            relational_ext.EVENTS_HASH_SAMPLE_ORACLE,
        ),
        "events_stratified_sample": (
            relational_ext.events_stratified_sample,
            relational_ext.EVENTS_STRATIFIED_SAMPLE_ORACLE,
        ),
        "customer_order_semi_anti": (
            relational_ext.customer_order_semi_anti,
            relational_ext.SEMI_ANTI_ORACLE,
        ),
        "events_grouping_sets": (
            relational_ext.events_grouping_sets,
            relational_ext.EVENTS_GROUPING_SETS_ORACLE,
        ),
        "orders_pivot_priority": (
            relational_ext.orders_pivot_priority,
            relational_ext.ORDERS_PIVOT_ORACLE,
        ),
        "lineitem_measures_unpivot": (
            relational_ext.lineitem_measures_unpivot,
            relational_ext.LINEITEM_UNPIVOT_ORACLE,
        ),
        "lineitem_percentiles": (
            relational_ext.lineitem_percentiles,
            relational_ext.LINEITEM_PERCENTILES_ORACLE,
        ),
        # Sketch percentiles: estimates are algorithm-specific -> rows-only;
        # tests/test_relational_ext.py bounds the error vs the exact twin.
        "approx_lineitem_percentiles": (
            relational_ext.approx_lineitem_percentiles,
            None,
        ),
        "events_salted_agg": (
            relational_ext.events_salted_agg,
            relational_ext.EVENTS_SALTED_ORACLE,
        ),
        # Temporal windows + range join (north-star extension).
        "events_tumbling_window": (
            temporal.events_tumbling_window,
            temporal.EVENTS_TUMBLING_ORACLE,
        ),
        "events_sliding_window": (
            temporal.events_sliding_window,
            temporal.EVENTS_SLIDING_ORACLE,
        ),
        "events_daily_gapfill": (
            temporal.events_daily_gapfill,
            temporal.EVENTS_GAPFILL_ORACLE,
        ),
        # Scalar-function layer, each standalone (SURVEY §7 step 2).
        "fn_distance": (scalars.fn_distance, scalars.FN_DISTANCE_ORACLE),
        "fn_width_bucket": (scalars.fn_width_bucket, scalars.FN_WIDTH_BUCKET_ORACLE),
        "fn_epoch": (scalars.fn_epoch, scalars.FN_EPOCH_ORACLE),
        # Pretraining domain-mix rebalance + sequence packing.
        "corpus_domain_mix": (corpus.corpus_domain_mix, corpus.DOMAIN_MIX_ORACLE),
        "corpus_pack_sequences": (textops.pack_sequences, textops.PACK_SEQUENCES_ORACLE),
        # Batch twins of the streaming keyed-dedup / stream-static joins.
        "events_keyed_dedup": (sessions.keyed_dedup_batch, sessions.KEYED_DEDUP_ORACLE),
        "events_enriched": (
            stream_joins.enriched_events_batch,
            stream_joins.ENRICHED_EVENTS_ORACLE,
        ),
        # All-pairs cosine baseline (labeled O(n^2); LSH twin is the scale path).
        "similarity_near_dup_cosine": (
            similarity.near_dup_cosine,
            similarity.NEAR_DUP_ORACLE,
        ),
        # Displaced by this round's new queries (all r3-green).
        "text_language_id": (textops.language_id, textops.LANGUAGE_ID_ORACLE),
        "global_top_orders": (
            analytics.global_top_orders,
            analytics.GLOBAL_TOP_ORDERS_ORACLE,
        ),
        # spark.sql surface: the same join plan declared as SQL text with
        # broadcast hints; shares the DataFrame twin's oracle.
        "sql_revenue_by_nation": (
            sqlapi.sql_revenue_by_nation,
            sqlapi.SQL_REVENUE_BY_NATION_ORACLE,
        ),
    }
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _specs().items() if sql is not None}
