"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries (a subset of the registry worth timing; each is forced with
# a cheap count() action so results never funnel through the driver).
HEADLINE = [
    # Reference-parity pipeline (Exercise 1 + 2).
    "trip_length_histogram",
    "segments_clean_positions",
    "trips_sessionize_window",
    "airport_trips_parity",
    "daily_revenue",
    # Relational breadth.
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "top_orders_per_customer",
    "events_cube",
    # Temporal surface.
    "events_tumbling_window",
    "views_before_purchase_range_join",
    "purchase_asof_view",
    # Training-data extensions.
    "text_quality_score",
    "text_token_counts",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # NEW round 13: the exact all-pairs baseline joined the headline set
    # when its triangle-blocked rewrite made it benchable (sf1 109 -> 9.3 s
    # warm, bit-identical; the first round it runs at every gate scale).
    "similarity_near_dup_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "similarity_topk_pq_trained",
    # similarity_topk_ivfpq retired from the registry round 13 (trained
    # twin carries the rows at 4.1x the wall); the bench slot goes to the
    # new append-lineage serving path.
    "ann_append_serving",
    "similarity_topk_ivfpq_trained",
    "multimodal_real_jpeg_color",
    "events_session_window",
    # Composed training-data pipeline (quality -> dedup -> near-dup -> stats).
    "corpus_clean_stats",
]

# Subtotal split (VERDICT r11 order 6): the ANN+media family was 56% of
# the sf1 total, diluting every regression signal in the other queries.
# Both subtotals print inside the same capped metric line, so drift in
# either is visible in driver records without reading 26 per-query keys.
ANN_MEDIA = {
    q for q in HEADLINE if q.startswith(("similarity_", "multimodal_", "ann_"))
}

# The driver records only the LAST 2000 characters of bench output and
# parses the metric JSON out of that tail. Round 10's ~2,400-char note
# pushed the head of the JSON line out of the capture window and the
# driver recorded `parsed: null` — the round's headline number simply
# does not exist in driver records. Two defenses now: the metric line is
# hard-capped (note auto-truncated to fit MAX_METRIC_LINE, asserted
# below) and round narrative belongs in SCALE_*/SKEW_*/README, not here.
MAX_METRIC_LINE = 1800

# One line per build round, keyed on registry.ROUND so BENCH_rN.json can
# never ship describing a stale build: a round that forgets to add its
# line emits an explicit "note missing" marker instead of last round's
# text (the r8/r9 failure mode — BENCH_r09.json carried the verbatim
# round-7 note).
ROUND_NOTES = {
    # registry.ROUND stays 17 through the round-18 OPTIMIZATION round
    # (no rotation), so the r18 note lives under key 17.
    17: (
        "r18 (optimization round, r17 registry): gate 92 queries x 5 "
        "scales, all hashes == r17. Map-side IVF/SPANN assignment (was "
        "full-corpus window exchange), one-shuffle LSH candidates, "
        "corpus quality in the scan, SPANN/LSH dedup+rank share one "
        "exchange, simhash md5 chain evaluated once (was twice via "
        "pushed filter), setops 6 exchanges->1, tfidf tokenize 2->1. "
        "Pools vs r17 tree: sf0.1 29.7 vs 31.5 s, sf1 70.4 vs 84.9 s. "
        "zstd codec measured worse, rejected. See OPTIMIZATION_r18.md."
    ),
    16: (
        "r16: by-list + cost-rule serving is now driver-HASH-verified "
        "(similarity_topk_ivfpq_fixed: deterministic books through the "
        "real artifacts; both forced branches bit-identical). Adaptive "
        "probe rule hash-verified (similarity_topk_ivf_adaptive). Codes "
        "side cost-based too: flat vec_id-sorted re-layout copy, "
        "paths-first lazy open -> synthetic batch-10 back to 163.4 MB, "
        "incompressible floor win 2.95x. Escalating widen (deep fires "
        "16x): f20 recall 0.86->1.00, organic hashes unchanged at all 5 "
        "scales (rule-1a pins). calibration_shuffle_sec = second probe. "
        "Details: SCALE_ann_r16.md."
    ),
    15: (
        "r15: deterministic kmeans fit SHIPPED (canonicalized sample, "
        "recipe o1): books/serving now bit-identical across physical "
        "row layouts (probe: 0/2000 cells move; was 1999/2000). By-list "
        "raw-in-index layout for ivfpq_trained: codes + raw serving "
        "copy hive-partitioned by coarse list, both scans prune to the "
        "driver-known probe union; re-rank source is cost-based (exact "
        "stat bytes) so the measured batch-1 bytes are never worse than "
        "flat (164 vs 163 MB synthetic / wins ~1/f incompressible). "
        "ann_append_serving adopts the adaptive dial; append demos "
        "share one derivation. value_calibrated normalizes VM drift. "
        "Details: SCALE_ann_r15.md."
    ),
    14: (
        "r14: append union semantics HASH-verified (new "
        "ann_append_serving_fixed: fixed-books twin, DuckDB-green x5). "
        "Flat PQ serving now per-query ADAPTIVE: covered-gap signal "
        "widens the re-rank 4x only where recall is lost (sf0.1 "
        "0.80->1.00, mutated n20k 0.82->1.00, ~0% organic wall). "
        "Cross-session kmeans shifts DIAGNOSED: fits track the training "
        "input's physical row order (same-rows shuffle moves 1999/2000 "
        "book cells); fit_env sidecars record it; deterministic fit "
        "staged r15. NEW calibration key self-normalizes VM drift; "
        "stream timing now min-of-2. Details: SCALE_ann_r14.md."
    ),
    13: (
        "r13: ANN exact re-rank folds its normalize ABOVE the broadcast "
        "join (was per-corpus-row below) — bit-identical, n=1M warm "
        "pq_trained 26.7->17.0s, ivfpq_trained 36.0->23.1s (-36%); found "
        "via the new measured bytes column (r12 '64x bytes' corrected: "
        "codes ~12x, one full re-rank scan dominates). Adaptive ivfpq "
        "dials: mutated recall 0.54->0.92 at +7% organic wall. Near-dup "
        "triangle-blocked: sf1 109->9.3s hash-equal, the sf1 gate "
        "exclusion RETIRED (92 queries x 5 scales, zero exclusions). "
        "Simhash fold Arrow-vectorized (3.2x warm, integer-identical). "
        "topk_ivfpq retired -> NEW ann_append_serving + near_dup_cosine "
        "bench lines. Details: SCALE_ann_r13.md."
    ),
    12: (
        "r12: the r11 'stage-latency floor' on trained PQ was a Catalyst "
        "CollapseProject O(d^2) blowup (projected norm fold re-inlined "
        "into per-element lambdas; 9.4s of the 13.2s sf1 wall) — fixed "
        "via _div_by + driver-built query side from persisted artifacts: "
        "pq_trained sf1 warm 13.0->1.45s, UNDER bruteforce's 1.54s; "
        "ivfpq_trained 14.5->1.98s; outputs rule-1a pinned bit-identical "
        "at 5 scales (fresh-fit pre-logs). Crossover MEASURED to n=1M: "
        "bruteforce 101s vs pq_trained 29s at recall 1.0 "
        "(SCALE_ann_r12.md). SPANN first driver row + fetch-count "
        "table. JPEG DRI/RSTn in profile. Incremental append: frozen "
        "models, delta-only encode."
    ),
    11: (
        "r11: first driver rows for the five round-10 staged queries "
        "(pq/ivfpq/ivfpq_trained + wav/avi); metric line now hard-capped "
        "at 1800 chars (r10's 2.4k note pushed the JSON out of the "
        "driver's 2000-char tail: parsed:null); streaming timeout "
        "eviction measured (see 'stream' key). NEW "
        "similarity_topk_pq_trained (Lloyd codebooks, near-constant "
        "max(50,n/100) re-rank, recall 1.0/1.0/0.8/1.0) + persisted ANN "
        "index artifacts (warm sessions plan zero training jobs) + "
        "array-ADC scan + Arrow coarse assign (ivfpq_trained sf1 "
        "44->17.7s, global trained residual book replaces the per-list "
        "8GB-at-scale caveat; codes persisted as the FAISS add half + "
        "adaptive one-window shortlist: pq_trained sf1 27.7->13.9s "
        "cold). NEW multimodal_real_jpeg_color (YCbCr at 4:2:0/4:2:2/"
        "4:4:4 cycled by doc_id, closed-form RGB-sum oracle). STAGED "
        "similarity_topk_ivf_spann (boundary replication: recall "
        "0.98/0.94 vs 0.80/0.88 at 2.3x/2.8x index). fn_epoch + "
        "fn_width_bucket + multimodal_frame_sample retired "
        "(unit-pinned). Narrative in SCALE_ann_r11.md and README."
    ),
    10: (
        "r10: parquet_scan_width reports unknown (never narrow) on "
        "remote/unlistable paths so widen consumers cannot full-table-"
        "exchange at 100 TB; measured_sign_bits probe memoized per "
        "(session, plan); sf10mut candidate evidence committed "
        "(SCALE_sf10_r10.md: 30.3M candidates, ~152/vector, 10x data -> "
        "7.8x candidates); GIF decoder hardened (min_code_size/palette/"
        "dict-freeze fuzz fixtures) and the LZW loops vectorized "
        "bit-identical (encode+decode 2.2x each, PNG unfilter 1.7x, real "
        "pixel path 1.8x end-to-end, golden-stream-pinned); NEW "
        "multimodal_real_jpeg: baseline-sequential grayscale JPEG decode "
        "(Huffman+DPCM+IDCT) with a closed-form block-constant oracle, "
        "replacing the retired multimodal_resize_stub slot; dedup_simhash "
        "rebuilt as 60-bit multi-index Hamming search (4x15-bit blocks, "
        "1-flip probes, COMPLETE for hamming<=7 — was equality-join "
        "complete only to 3): sf10mut output now grows 10.0x for 10x "
        "data vs the old scheme's 98x quadratic noise. NEW staged "
        "(rule 1b): similarity_topk_pq — product-quantization ANN, 4x8-bit "
        "sign-pattern codebooks built in one exact fixed-point "
        "aggregation, broadcast ADC lookup scan over 4-byte codes, "
        "two-phase shortlist, 50-deep exact re-rank (recall@5 0.86 at "
        "sf0.01); multimodal_real_wav — real RIFF/WAVE PCM chunk-walk "
        "parse, 8/16-bit decode, floor-index resample, integer energy "
        "features, closed-form oracle; similarity_topk_ivfpq — now the FULL "
        "FAISS IVFPQ (residual encoding x per-list codebooks, recall@5 0.78 "
        "at sf0.001 = the nprobe=8 pruning ceiling exactly; a global "
        "residual book measured 0.56 and was rejected); "
        "similarity_topk_ivfpq_trained — k-means coarse quantizer in the "
        "identical plan; recall@5 0.80 at both small scales under the "
        "original fixed K=16 (as-shipped K=sqrt(n): 0.76/0.74/0.84 at "
        "sf0.001/0.01/0.1) = the trained "
        "ceiling, rows-only. ADC-via-broadcast-maps was measured and "
        "REJECTED (46% slower on the ivfpq scan: Spark map element_at "
        "linear-scans vs O(1) hash-join probes). Late round 10: the nprobe "
        "sweep exposed a FLAT recall curve at sf0.1 - the fixed 50-deep ADC "
        "shortlist was the bottleneck, not pruning - so the shortlist is "
        "now scale-adaptive max(50, n/10), oracle-derived from count(*) "
        "(sf0.1: pq 0.36 -> 0.82, ivfpq back to its 0.72 ceiling; the "
        "linear law is the honest cost of one-step codebooks); "
        "similarity_topk_ivfpq_trained now fits K=sqrt(n) lists with "
        "nprobe=K/3 (sf0.1: recall 0.84 at 36% of the corpus vs 0.72 at "
        "51% for fixed K=16); NEW "
        "multimodal_real_avi (real RIFF/AVI container parse: stream "
        "enumeration, palette, foreign-stream skipping, idx1 cross-check, "
        "bottom-up stride-padded DIB decode, quadrant-sum oracle) replaces "
        "the retired text_language_id (dominated by the ngram variant, "
        "scoring pinned in tests)."
    ),
}


def _round_note() -> str:
    from mapreduce_hadoop_spark import registry

    return ROUND_NOTES.get(
        registry.ROUND,
        f"round {registry.ROUND}: note missing — add it to ROUND_NOTES "
        "in bench.py (this marker exists so a stale note can never be "
        "misattributed to the build it did not describe)",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from mapreduce_hadoop_spark import registry
    from mapreduce_hadoop_spark.session import get_spark

    spark = get_spark("bench")
    queries = registry.queries()

    # Warm the JVM, codegen, and parquet footers once so per-query numbers
    # measure the plan, not session startup or first-file-listing overhead.
    spark.range(1).count()
    from mapreduce_hadoop_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # Compile warm-up: run each headline query once at the smallest scale
    # factor first. Planning + whole-stage codegen + JIT of a plan shape are
    # one-time costs amortized to zero on a long-lived cluster; timing them
    # per-query at sf0.1 would measure the compiler, not the engine. Data
    # work at sf0.001 is ~1% of the timed run.
    # Any timed dir (sf0.1, a derived sf1, ...) warms at the smallest
    # available sibling scale unless overridden: prefer sf0.001 next to
    # sf_dir, then the driver default, so the warm-up still runs on
    # machines without /root/testdata.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR")
    if warm_dir is None:
        sibling = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        warm_dir = sibling if os.path.isdir(sibling) else "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        print(f"note: warm-up skipped ({warm_dir} missing)", file=sys.stderr)
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
        try:
            _pipeline_airport_revenue(spark, warm_dir)
        except Exception:
            pass

    # Cache honesty: some builders persist an intermediate (LSH shingle
    # hashes, simhash signatures). Left cached, the CacheManager silently
    # substitutes it into LATER queries' plans, flattering their numbers
    # (r2: simhash benched 7.3s vs 153s standalone). Clearing between
    # queries makes each number reproduce standalone.
    from mapreduce_hadoop_spark.operators import dedup, similarity

    # Two timed executions per query, report the min. Single-shot numbers
    # on this shared VM swing +-40% run-to-run (measured: 21.8s / 30.4s /
    # 26.0s totals for the identical build); min-of-2 keeps the numbers
    # comparable across rounds. Each execution is still data-cold: the
    # cache is cleared and builder persists released between runs, so only
    # plan/codegen warmth carries over — the same one-time cost the
    # sf0.001 warm-up loop already amortizes deliberately.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            dedup.unpersist_intermediates()
            similarity.unpersist_intermediates()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # The reference's Exercise-2 lifecycle as ONE bench line (VERDICT r12
    # order 8): cleanse -> sessionize -> airport filter computed once and
    # CACHED, then all three reference outputs (airport trips, daily
    # revenue, grand total) materialized off the shared DAG — the direct
    # engine analogue of the reference's 230 s EP2+EP3 number
    # (src/AirportTripsRevenue.java: job 1 + job 2 + driver total), minus
    # the two HDFS round-trips between them.
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        _pipeline_airport_revenue(spark, sf_dir)
        best = min(best, time.time() - t0)
    timings["pipeline_airport_revenue"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    stream = _stream_timeout_bench(spark, sf_dir)
    calibration = _calibration_bench(spark)
    calibration_shuffle = _calibration_shuffle_bench(spark)

    payload = {
        "metric": "headline_queries_total",
        "value": total,
        # Fixed engine-independent workload (pure spark.range -> hash ->
        # shuffle -> agg; touches no repo operator and no data file), so
        # BENCH files self-normalize across VM-drift days: if this key
        # moves between rounds, the SHARED VM moved — divide it out
        # before reading per-query deltas (VERDICT r13 order 3).
        "calibration_sec": calibration,
        "calibration_shuffle_sec": calibration_shuffle,
        # The normalization APPLIED (VERDICT r14 wrong item 1 / order 5):
        # the total rescaled to the reference machine speed
        # (CALIBRATION_REF anchors to the r14 committed sf0.1 run), so
        # committed BENCH files compare directly without reader-side
        # arithmetic. The r14 sf1 afternoon scattered -18% same-tree in
        # twenty minutes; this key is what makes that visible in the
        # artifact itself.
        "value_calibrated": round(total * CALIBRATION_REF / calibration, 3),
        "unit": "sec",
        "reference_relational_sec": round(
            sum(t for q, t in timings.items() if q not in ANN_MEDIA), 3
        ),
        "ann_media_sec": round(
            sum(t for q, t in timings.items() if q in ANN_MEDIA), 3
        ),
        "queries": timings,
        "sf": sf,
        "stream": stream,
        "note": _round_note(),
    }
    line = json.dumps(payload)
    if len(line) > MAX_METRIC_LINE:
        # Truncate ONLY the note until the line fits — data never yields
        # to prose again (the r10 parsed:null lesson).
        overshoot = len(line) - MAX_METRIC_LINE
        note = payload["note"]
        payload["note"] = note[: max(0, len(note) - overshoot - 16)] + "...[capped]"
        line = json.dumps(payload)
    assert len(line) <= MAX_METRIC_LINE, len(line)
    print(line)


# The calibration anchor: the committed BENCH_r14.json sf0.1 run's
# calibration_sec. value_calibrated = value * CALIBRATION_REF /
# calibration_sec expresses every committed total in "r14 reference
# machine seconds", so cross-round deltas read code, not VM.
CALIBRATION_REF = 1.911


def _calibration_bench(spark) -> float:
    """Deterministic CPU + shuffle probe, min-of-2: 5x10^9 xxhash64 rows
    summed (whole-stage codegen CPU) plus a 5x10^7-row groupBy on 1024
    keys (one real exchange). No repo operator, no data file — the
    number moves only when the MACHINE does. Sized to ~2 s at local[32]
    so a 10% VM drift reads well above the timer noise floor."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        # % 1e6 keeps the ANSI-mode sum far from long overflow.
        spark.range(5_000_000_000).select(
            F.sum(F.xxhash64("id") % 1_000_000).alias("s")
        ).collect()
        spark.range(50_000_000).groupBy(
            (F.col("id") % 1024).alias("k")
        ).count().select(F.sum("count")).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _calibration_shuffle_bench(spark) -> float:
    """Shuffle-bound twin of _calibration_bench (VERDICT r15 order 6,
    min-of-2): 2x10^7 rows carrying a 48-byte deterministic payload
    through ONE full exchange (hash repartition), then a post-exchange
    fold. Exchange serialization + transfer dominates; codegen CPU is
    negligible. The two probes bound the machine band's two axes —
    calibration workloads scale differently with machine state than
    query workloads (the committed-vs-driver r15 discrepancy), so a
    cross-round reader compares BOTH ratios: if they disagree, the
    drift is state-shaped and per-query deltas need a same-day
    two-tree control; if they agree, dividing either out is sound."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(20_000_000).select(
            "id", F.lpad(F.col("id").cast("string"), 48, "x").alias("p")
        ).repartition(64, F.col("id") % 9973).select(
            F.sum(F.length("p")).alias("s")
        ).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _pipeline_airport_revenue(spark, sf_dir: str) -> None:
    """One fused run of the reference pipeline: the sessionized airport
    trips persist once; the trips relation, the daily-revenue rollup, and
    the grand total all materialize off that single cached DAG (the
    reference re-read job 1's HDFS output for job 2 and the output FILE
    for the driver total — here the reuse is a cache hit, not a
    filesystem round-trip)."""
    from mapreduce_hadoop_spark.operators import revenue, sessionize

    trips = sessionize.airport_trips_query(spark, sf_dir).persist()
    try:
        trips.write.format("noop").mode("overwrite").save()
        revenue.daily_revenue(trips).write.format("noop").mode("overwrite").save()
        revenue.total_revenue(trips).write.format("noop").mode("overwrite").save()
    finally:
        trips.unpersist()


def _stream_timeout_bench(spark, sf_dir: str) -> dict:
    """Measure the event-time-timeout stream (applyInPandasWithState) at
    sf_dir: wall time, micro-batch count, and state-store growth/eviction
    from StateOperatorProgress — so bounded state is measured per round,
    not asserted once in a unit test.

    ``events.parquet`` ships as ONE file per scale dir, which would give a
    single micro-batch (no watermark movement, no timeout eviction). The
    bench stages a time-ordered 8-file split (pyarrow, schema-preserving,
    mtime-ordered so the file stream replays in event-time order) under
    the repo-local ``.stream_stage/`` (gitignored) and streams THAT with
    maxFilesPerTrigger=1: 8 batches, watermark advancing per batch,
    timeouts firing mid-stream exactly as on a live ingest.
    """
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_hadoop_spark.streaming.trips import airport_trips_stream_timeout

    n_files = 8
    repo = os.path.dirname(os.path.abspath(__file__))
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    stage = os.path.join(repo, ".stream_stage", tag)
    try:
        src = os.path.join(sf_dir, "events.parquet")
        marker = os.path.join(stage, "_staged_mtime")
        src_mtime = str(os.path.getmtime(src))
        if not (
            os.path.isfile(marker) and open(marker).read() == src_mtime
        ):
            shutil.rmtree(stage, ignore_errors=True)
            os.makedirs(stage)
            tbl = pq.read_table(src)
            order = pa.compute.sort_indices(tbl.column("ts"))
            tbl = tbl.take(order)
            step = (tbl.num_rows + n_files - 1) // n_files
            for i in range(n_files):
                chunk = tbl.slice(i * step, step)
                if chunk.num_rows == 0:
                    break
                # Chunk 0 keeps the canonical name: positions_stream
                # infers the stream schema from {dir}/events.parquet.
                name = "events.parquet" if i == 0 else f"events{i:02d}.parquet"
                path = os.path.join(stage, name)
                pq.write_table(chunk, path)
                os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
            with open(marker, "w") as f:
                f.write(src_mtime)

        # Min-of-2 like every batch number (VERDICT r13 order 8: the
        # single-shot stream timing swung +-34% on flat sf1 twins — VM
        # noise, not code). Each run replays the full staged file
        # sequence from scratch. Per-run (sec, finished, progress)
        # tracking (ADVICE r14): the timing min is taken over FINISHED
        # runs only and the batch/state counts come from the same run
        # that produced it — a run-2 timeout can no longer discard a
        # valid run-1 measurement or mix counts across runs.
        runs: "list[tuple[float, list]]" = []
        for _ in range(2):
            t0 = time.time()
            q = (
                airport_trips_stream_timeout(spark, stage, max_files_per_trigger=1)
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            try:
                finished = q.awaitTermination(600)
                progress = [json.loads(p.json) for p in q.recentProgress]
            finally:
                q.stop()
            if finished:
                runs.append((round(time.time() - t0, 3), progress))
        if not runs:
            return {"airport_trips_timeout_sec": -1.0, "batches": 0,
                    "state_rows_peak": 0, "state_rows_removed": 0}
        sec, progress = min(runs, key=lambda r: r[0])
        ops = [so for p in progress for so in p.get("stateOperators", [])]
        return {
            "airport_trips_timeout_sec": sec,
            "batches": len(progress),
            "state_rows_peak": max((so.get("numRowsTotal", 0) for so in ops), default=0),
            "state_rows_removed": sum(so.get("numRowsRemoved", 0) for so in ops),
        }
    except Exception as e:  # never let the stream probe kill the headline
        return {"airport_trips_timeout_sec": -1.0, "err": type(e).__name__}


if __name__ == "__main__":
    main()
