"""Query registry: every implemented operator exposed as a (query, oracle) pair.

Each entry maps a SURVEY.md §2 operator (or north-star extension) to
1. a Spark callable ``(spark, sf_dir) -> DataFrame`` and
2. (where SQL-expressible) a DuckDB oracle SQL string over the same tables.

Column names are aliased identically on both sides — the driver sorts columns
by name before hashing values.

Driver-window rotation policy
-----------------------------
The correctness driver checks only the FIRST ``DRIVER_WINDOW`` registry
entries; the registry holds more. Ordering rule, from round 4 on:

1. Any query whose code, oracle, or output changed this round MUST be in
   the head (a fresh driver row is the only acceptable evidence). This
   round's set is ``CHANGED_THIS_ROUND`` below.
   1a. Exception — hash-identical plan rewrites: when a rewrite lands
   AFTER the round's head window is already full, it may stay in the
   tail iff its output value-hash is UNCHANGED at every gate scale
   (sf0.01 through sf1), proven by the committed pre-rewrite GATE logs
   matching the post-rewrite regenerated ones hash-for-hash. Identical
   output bytes mean the prior round's driver row still binds to what
   the code now produces. Such entries are listed in
   ``REWRITTEN_HASH_IDENTICAL`` and the hash equality is pinned by
   ``tests/test_registry_rotation.py`` against the committed log.
   1b. New queries registered after the head filled go into
   ``STAGED_NEXT_ROUND``: they sit in the tail with NO driver row,
   gate-verified locally this round, and MUST rotate into the next
   round's head (they are the oldest-evidence entries by definition).
   The freshness test exempts exactly this set and requires it to be
   empty of any query that ever received a driver row.
2. The remaining head slots go to the queries whose last driver row is
   oldest, so no query ever goes more than one round without a driver
   row (2-round cadence worst case).
3. Every tail entry must carry a green (or documented rows-only)
   driver row from the IMMEDIATELY PRECEDING round, and
   tools/check_oracle.py still gates the full registry locally every
   round (committed GATE_*.log artifacts).

The split is machine-checked: tests/test_registry_rotation.py asserts the
head size, that every CHANGED_THIS_ROUND entry is in the head, and that
every tail entry has a row in the newest committed CORRECTNESS_r*.json —
so a forgotten rotation fails the suite instead of aging silently.

Round-5 application: the 25 round-3-green tail entries rotate back into
the head (their r3 rows would otherwise age past the policy bound), as
does everything in CHANGED_THIS_ROUND — the eight queries touched this
round (concurrency single-pass rewrite, keep-best left-join, PII pattern
broadening, trigram-probe rewrite, range-join/IVF cache keying,
multimodal decode/resize internals) and the eight NEW queries
(timeout-twin trip stream, curation-sampling trio, real media
round-trip, full-outer reconcile, correlated-subquery SQL, vocabulary).
The reference surface stays in-window as always; the tail is unchanged
round-4-green queries. Late in round 5 (head already full) four
candidate-pair plans were rewritten hash-identically (rule 1a,
``REWRITTEN_HASH_IDENTICAL``; ``dedup_simhash`` was still head-resident
so it simply joined ``CHANGED_THIS_ROUND``) and three new corpus
operators were registered under rule 1b (``STAGED_NEXT_ROUND``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

# How many leading registry entries the driver's correctness check covers.
DRIVER_WINDOW = 50

# The build round this registry ordering was arranged FOR. Bump this when
# rotating at the start of each round — the freshness test then demands
# tail rows from the new preceding round, so an un-rotated registry fails
# the suite the moment the round number moves.
ROUND = 5

# Rotation rule 1, this round: queries whose code, oracle, or output
# changed and therefore require a fresh driver row.
CHANGED_THIS_ROUND = (
    "trips_concurrency",  # single-pass delta emission (explode)
    "dedup_keep_best",  # left-join quality + NULLS LAST tie rule
    "text_pii_scrub",  # broadened phone pattern + guard groups
    "views_before_purchase_range_join",  # realpath-keyed probe cache
    "similarity_topk_ivf_trained",  # realpath-keyed centroid cache
    "multimodal_decode_stub",  # nullable-dtype batch construction
    "multimodal_resize_stub",  # stub message references header decode
    "airport_trips_timeout",  # NEW: timeout variant's batch twin
    "corpus_weighted_sample",  # NEW: derandomized A-Res weighted sample
    "corpus_train_split",  # NEW: deterministic 90/5/5 hash split
    "corpus_domain_quota",  # NEW: per-source quality top-N quota
    "multimodal_real_roundtrip",  # NEW: valid PNG/GIF encode -> real decode
    "customer_activity_reconcile",  # NEW: full-outer aggregate reconcile
    "sql_orders_above_customer_avg",  # NEW: correlated scalar subquery
    "corpus_vocab_topk",  # NEW: tokenizer-prep vocabulary table
    "text_language_id_ngram",  # trigram probes rewrite (same hash, 6.8x)
    "dedup_simhash",  # in-row first-block dedup replaces distinct (same hash)
)

# Rule 1a: plan rewrites landed after the head filled, output value-hash
# unchanged at every gate scale (sf0.01 hashes pinned in
# tests/test_registry_rotation.py; sf1 additionally exceptAll-verified
# against the pre-rewrite plan). Their round-4 driver rows still bind.
REWRITTEN_HASH_IDENTICAL = (
    "dedup_ngram_jaccard",  # one-shuffle hashed-shingle buckets (3.2x at sf1)
    "contamination_check",  # hash-before-explode (9x at sf1)
    "similarity_near_dup_lsh",  # in-row first-band dedup (2x at sf1)
    "text_repetition_score",  # sort-free distinct-shingle count (same hash)
)

# Rule 1b: registered after the round-5 head filled; no driver row yet,
# gate-verified at five scales this round. Round-6 builder: rotate these
# into the head FIRST and clear this tuple.
STAGED_NEXT_ROUND = (
    "text_span_dedup",
    "text_gopher_rules",
    "embedding_quantize_int8",
    "events_funnel",
    "events_cohort_retention",
)


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
        # --- Driver-window head (first DRIVER_WINDOW) ---------------------
        # Rotated in this round: last driver row is round 3 (rule 2).
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
        # Temporal windows (north-star extension).
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
        # Changed this round (rule 1) — see CHANGED_THIS_ROUND.
        "trips_concurrency": (
            temporal.trips_concurrency,
            temporal.TRIPS_CONCURRENCY_ORACLE,
        ),
        "dedup_keep_best": (dedup.dedup_keep_best, dedup.DEDUP_KEEP_BEST_ORACLE),
        "text_pii_scrub": (textops.pii_scrub, textops.PII_SCRUB_ORACLE),
        "views_before_purchase_range_join": (
            temporal.views_before_purchase_range_join,
            temporal.VIEWS_BEFORE_PURCHASE_ORACLE,
        ),
        # K-means training is not SQL-expressible -> rows-only; recall vs
        # the fixed-centroid variant bounded in tests/test_similarity_ivf.py.
        "similarity_topk_ivf_trained": (similarity.topk_ivf_trained, None),
        "multimodal_decode_stub": (
            multimodal.media_decode_query,
            multimodal.MEDIA_DECODE_ORACLE,
        ),
        "multimodal_resize_stub": (
            multimodal.media_resize_query,
            multimodal.MEDIA_RESIZE_ORACLE,
        ),
        # NEW this round: batch twin of the event-time-timeout trip stream
        # (the production variant: bounded state, trailing trips flushed at
        # the end-of-input watermark). Deterministic — the flush decision
        # depends only on the final watermark, not on micro-batch splits —
        # but an order-dependent stateful fold, so rows-only; parity rows
        # bit-match the no-timeout path and the flush semantics are pinned
        # in tests/test_streaming_trips.py.
        "airport_trips_timeout": (trips.airport_trips_timeout_batch, None),
        # NEW this round: corpus-curation sampling trio — derandomized
        # Efraimidis-Spirakis weighted sampling, the deterministic
        # train/val/test hash split, and per-domain quality top-N quota.
        "corpus_weighted_sample": (
            corpus.corpus_weighted_sample,
            corpus.WEIGHTED_SAMPLE_ORACLE,
        ),
        "corpus_train_split": (corpus.corpus_train_split, corpus.TRAIN_SPLIT_ORACLE),
        "corpus_domain_quota": (
            corpus.corpus_domain_quota,
            corpus.DOMAIN_QUOTA_ORACLE,
        ),
        # NEW this round: spec-valid PNG/GIF synthesis -> stdlib header
        # decode in one Arrow pass; the oracle predicts dimensions from
        # doc_id, so the hash verifies the REAL byte-level decode path.
        "multimodal_real_roundtrip": (
            multimodal.media_real_roundtrip,
            multimodal.MEDIA_REAL_ROUNDTRIP_ORACLE,
        ),
        # NEW this round: FULL OUTER reconciliation (aggregate-then-join)
        # and the correlated-scalar-subquery SQL surface (Catalyst
        # decorrelation pinned by plan test).
        "customer_activity_reconcile": (
            analytics.customer_activity_reconcile,
            analytics.CUSTOMER_RECONCILE_ORACLE,
        ),
        "sql_orders_above_customer_avg": (
            sqlapi.sql_orders_above_customer_avg,
            sqlapi.SQL_ABOVE_AVG_ORACLE,
        ),
        # NEW this round: corpus-level token vocabulary (tokenizer prep);
        # partial combine absorbs the Zipf hot tokens map-side.
        "corpus_vocab_topk": (textops.vocab_topk, textops.VOCAB_TOPK_ORACLE),
        # Changed this round (rule 1): trigram-set intersection rewritten
        # as 40 substring probes (hash-identical, 50.4s -> 7.4s at sf1).
        "text_language_id_ngram": (
            textops.language_id_ngram,
            textops.LANGUAGE_ID_NGRAM_ORACLE,
        ),
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
        # Remaining head slots (rule 2 fill, all round-4 rows).
        "dedup_minhash_lsh": (dedup.minhash_lsh_pairs, dedup.MINHASH_LSH_ORACLE),
        "dedup_simhash": (dedup.simhash_pairs, dedup.SIMHASH_ORACLE),
        "corpus_clean_stats": (corpus.corpus_clean_stats, corpus.CORPUS_CLEAN_ORACLE),
        # --- Past the DRIVER_WINDOW ---------------------------------------
        # Everything below is UNCHANGED this round and carries a green (or
        # documented rows-only) CORRECTNESS_r04 row; tools/check_oracle.py
        # still gates all of it locally every round (committed GATE_*.log).
        # Per the rotation policy these rotate back into the head next round.
        "events_daily_by_type": (
            analytics.events_daily_by_type,
            analytics.EVENTS_DAILY_ORACLE,
        ),
        "market_segment_balance": (
            analytics.market_segment_balance,
            analytics.MARKET_SEGMENT_ORACLE,
        ),
        "text_fingerprints": (textops.fingerprints, textops.FINGERPRINTS_ORACLE),
        "text_tfidf_top_terms": (textops.tfidf_top_terms, textops.TFIDF_ORACLE),
        "text_document_chunks": (textops.document_chunks, textops.DOCUMENT_CHUNKS_ORACLE),
        "text_normalize": (textops.text_normalize, textops.TEXT_NORMALIZE_ORACLE),
        "text_repetition_score": (textops.repetition_score, textops.REPETITION_ORACLE),
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
        "similarity_topk_ivf": (similarity.topk_ivf, similarity.TOPK_IVF_ORACLE),
        "multimodal_metadata": (multimodal.media_metadata, multimodal.MEDIA_METADATA_ORACLE),
        "multimodal_frame_sample": (
            multimodal.frame_sample_query,
            multimodal.FRAME_SAMPLE_ORACLE,
        ),
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
        "contamination_check": (dedup.contamination_check, dedup.CONTAMINATION_ORACLE),
        "dedup_clusters": (dedup.dedup_clusters, dedup.DEDUP_CLUSTERS_ORACLE),
        "dedup_ngram_jaccard": (dedup.ngram_jaccard_pairs, dedup.NGRAM_JACCARD_ORACLE),
        "dedup_exact": (dedup.exact_dedup, dedup.EXACT_DEDUP_ORACLE),
        "revenue_by_nation": (
            analytics.revenue_by_nation,
            analytics.REVENUE_BY_NATION_ORACLE,
        ),
        "pricing_summary": (analytics.pricing_summary, analytics.PRICING_SUMMARY_ORACLE),
        "top_orders_per_customer": (
            analytics.top_orders_per_customer,
            analytics.TOP_ORDERS_ORACLE,
        ),
        "shipping_priority": (
            analytics.shipping_priority,
            analytics.SHIPPING_PRIORITY_ORACLE,
        ),
        "text_quality_score": (textops.quality_score, textops.QUALITY_ORACLE),
        "text_token_counts": (textops.token_counts, textops.TOKEN_COUNTS_ORACLE),
        # Streaming trip machine, batch-twin form: replays the reducer
        # carrier across simulated micro-batch boundaries. Order-dependent
        # stateful fold -> rows-only; bit-identity to the parity path (and
        # its committed golden fixture) pinned in tests/test_streaming_trips.py.
        "airport_trips_microbatch": (trips.airport_trips_microbatch, None),
        # Generic gap sessionization via Spark's native session_window
        # (batch surface; streaming twin in streaming/sessions.py).
        "events_session_window": (sessions.session_agg, sessions.SESSION_AGG_ORACLE),
        # STAGED_NEXT_ROUND (rule 1b): registered after the round-5 head
        # filled — gate-verified at five scales this round, first driver
        # row in round 6. C4-style cross-document span dedup stats and the
        # Gopher per-rule quality gate.
        "text_span_dedup": (dedup.span_dedup_stats, dedup.SPAN_DEDUP_ORACLE),
        "text_gopher_rules": (textops.gopher_rules, textops.GOPHER_RULES_ORACLE),
        "embedding_quantize_int8": (
            similarity.embedding_quantize_int8,
            similarity.EMBEDDING_QUANTIZE_ORACLE,
        ),
        "events_funnel": (temporal.events_funnel, temporal.EVENTS_FUNNEL_ORACLE),
        "events_cohort_retention": (
            temporal.events_cohort_retention,
            temporal.EVENTS_COHORT_ORACLE,
        ),
    }
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _specs().items() if sql is not None}
