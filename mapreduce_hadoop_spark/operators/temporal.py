"""Time-window aggregation and range joins (north-star extensions).

The reference has no time-window operators beyond the sessionization gap
rule (SURVEY.md §2.4 "Streaming ... Absent"); these add the standard
temporal surface an analytics engine needs:

- ``events_tumbling_window``: fixed 6-hour tumbling windows via Spark's
  native ``F.window`` (epoch-aligned, same convention DuckDB's epoch
  arithmetic reproduces exactly).
- ``events_sliding_window``: 6-hour windows sliding every 3 hours — each
  event lands in exactly duration/slide windows; Spark materializes the
  copies inside ``F.window``, the oracle reproduces them with a 2-way
  UNION ALL of shifted buckets.
- ``views_before_purchase_range_join``: interval join (view events in the
  24 h before each purchase, same user). The scalable formulation avoids
  the O(n·m) inequality join: both sides are bucketed to calendar days,
  the purchase's lookback interval explodes into its (bounded, 2-row) day
  buckets, the join is a plain equi-join on (user, day), and the precise
  range predicate runs as a residual filter. At 100 TB the equi-join
  shuffles on a high-cardinality composite key instead of broadcasting an
  inequality — the standard bin-then-refine range-join pattern.

All windows are emitted as epoch-second doubles so both engines hash the
same representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.functions import fixedpoint as FP
from mapreduce_hadoop_spark.sources.tables import load_table

TUMBLE_S = 6 * 3600
SLIDE_S = 3 * 3600


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type counts/sums over 6-hour tumbling windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{TUMBLE_S} seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            FP.sum_micro("value").alias("v_u"),
        )
        .select(
            F.col("w.start").cast("double").alias("win_start"),
            "event_type",
            "n",
            FP.round_micro("v_u").alias("value_sum"),
        )
    )


EVENTS_TUMBLING_ORACLE = f"""
WITH g AS (
    SELECT floor(epoch(ts) / {TUMBLE_S}) * {TUMBLE_S}.0 AS win_start,
           event_type,
           count(*)                      AS n,
           {FP.sum_micro_sql('"value"')} AS v_u
    FROM events
    GROUP BY 1, 2
)
SELECT win_start, event_type, n, {FP.round_micro_sql("v_u")} AS value_sum FROM g
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type counts/sums over 6-hour windows sliding every 3 hours."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{TUMBLE_S} seconds", f"{SLIDE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            FP.sum_micro("value").alias("v_u"),
        )
        .select(
            F.col("w.start").cast("double").alias("win_start"),
            "event_type",
            "n",
            FP.round_micro("v_u").alias("value_sum"),
        )
    )


# An event at t belongs to the two 3h-aligned window starts
# floor(t/slide)*slide and floor(t/slide)*slide - slide (duration = 2 slides).
EVENTS_SLIDING_ORACLE = f"""
WITH expanded AS (
    SELECT floor(epoch(ts) / {SLIDE_S}) * {SLIDE_S}.0 AS win_start, event_type, "value"
    FROM events
    UNION ALL
    SELECT floor(epoch(ts) / {SLIDE_S}) * {SLIDE_S}.0 - {SLIDE_S}, event_type, "value"
    FROM events
)
SELECT win_start, event_type, n, {FP.round_micro_sql("v_u")} AS value_sum
FROM (
    SELECT win_start, event_type,
           count(*)                      AS n,
           {FP.sum_micro_sql('"value"')} AS v_u
    FROM expanded
    GROUP BY 1, 2
)
"""


RANGE_H = 24


def views_before_purchase_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View events within the 24 h before each purchase, same user —
    bin-then-refine equi-join formulation (module docstring).

    Both sides bucket to calendar days; a purchase's 24 h lookback spans at
    most 2 day-buckets, so the probe side explodes into a bounded 2-row
    fanout and the join is a plain equi-join on (user, day) with the precise
    interval as a residual filter.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), "value", F.to_date("ts").alias("day")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.explode(
            F.sequence(F.date_sub(F.to_date("ts"), 1), F.to_date("ts"))
        ).alias("day"),
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("user_id")) & (purchases["day"] == views["day"]),
    ).filter(
        (F.col("vts") >= F.col("pts") - F.expr(f"INTERVAL {RANGE_H} HOURS"))
        & (F.col("vts") < F.col("pts"))
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            FP.sum_micro("value").alias("v_u"),
        )
        .select(
            "purchase_id", "n_views", FP.round_micro("v_u").alias("view_value_sum")
        )
    )


VIEWS_BEFORE_PURCHASE_ORACLE = f"""
WITH g AS (
    SELECT p.event_id AS purchase_id,
           count(*)                         AS n_views,
           {FP.sum_micro_sql('v."value"')}  AS v_u
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL {RANGE_H} HOUR
     AND v.ts <  p.ts
    GROUP BY p.event_id
)
SELECT purchase_id, n_views, {FP.round_micro_sql("v_u")} AS view_value_sum FROM g
"""


# --- calendar gap-fill / resample -----------------------------------------


def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts per type resampled onto a dense calendar: days
    with no events appear with n = 0 (time-series training data needs
    gapless grids; a bare groupBy silently drops empty buckets).

    The dense (type x day) spine is built in-plan: the global [min, max]
    date range is one scalar aggregate broadcast into `sequence()` +
    explode, cross-joined with the distinct types (both sides tiny — the
    spine is O(types x days) regardless of fact size), then left-joined
    with the per-day counts. The only fact-sized shuffle is the groupBy.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"), F.to_date("ts").alias("day"), F.col("value")
    )
    counts = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), FP.sum_micro("value").alias("v_u"))
        .select(
            "event_type", "day", "n", FP.round_micro("v_u").alias("sum_value")
        )
    )
    span = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    return (
        spine.join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


EVENTS_GAPFILL_ORACLE = f"""
WITH ev AS (
    SELECT event_type, CAST(ts AS DATE) AS day, "value" FROM events
),
counts AS (
    SELECT event_type, day, n, {FP.round_micro_sql("v_u")} AS sum_value
    FROM (
        SELECT event_type, day, count(*) AS n,
               {FP.sum_micro_sql('"value"')} AS v_u
        FROM ev GROUP BY event_type, day
    )
),
days AS (
    SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
    FROM ev
),
spine AS (
    SELECT t.event_type, d.day
    FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN days d
)
SELECT s.event_type,
       strftime(s.day, '%Y-%m-%d') AS day,
       coalesce(n, 0) AS n,
       coalesce(sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN counts c
  ON c.event_type = s.event_type AND c.day = s.day
"""
