"""Extended relational operators: rollup, as-of join, JSON, sketches, set ops.

None of these exist in the reference (SURVEY.md §2.4 "Absent" rows) — they
round out the engine surface a production user expects. Each is
oracle-checked except the approximate sketch (algorithm-specific estimates
can't match across engines; tests bound its error against the exact
companion instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.sources.tables import load_table


# --- ROLLUP ---------------------------------------------------------------


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical day -> event_type rollup with subtotal + grand-total rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "value",
        )
        .rollup("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
    )


EVENTS_ROLLUP_ORACLE = """
SELECT
    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
    event_type,
    count(*) AS n,
    round(sum("value"), 4) AS value_sum
FROM events
GROUP BY ROLLUP (1, 2)
"""


# --- as-of join -----------------------------------------------------------


def orders_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to the customer's latest event at-or-before the
    order date (point-in-time / as-of join).

    Scalable formulation: union the two streams tagged, one window pass per
    key carries the last-seen event forward (``last(..., ignorenulls)``).
    One shuffle on the key, no range-join explosion — the classic
    time-series as-of shape. (DuckDB verifies with its native ASOF JOIN.)
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
    )
    # Events sort before orders at equal t (is_order asc) => "at-or-before"
    # is inclusive; event_id breaks ties deterministically.
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_order", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = ev.unionByName(orders).select(
        "*",
        F.last("event_id", ignorenulls=True).over(w).alias("last_event_id"),
    )
    return merged.filter(F.col("is_order") == 1).select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.date_format("t", "yyyy-MM-dd").alias("order_day"),
        "last_event_id",
    )


ORDERS_ASOF_ORACLE = """
SELECT
    o_orderkey,
    o_custkey,
    strftime(o_orderdate, '%Y-%m-%d') AS order_day,
    e.event_id AS last_event_id
FROM orders
ASOF LEFT JOIN (
    SELECT user_id, ts, event_id FROM events
) e ON e.user_id = o_custkey AND e.ts <= o_orderdate
"""


# --- JSON extraction ------------------------------------------------------


def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column and aggregate the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 6).alias("k_avg"),
        )
        .orderBy("event_type")
    )


EVENT_PROPS_ORACLE = """
SELECT
    event_type,
    count(k)  AS n_with_k,
    min(k)    AS k_min,
    max(k)    AS k_max,
    round(avg(k), 6) AS k_avg
FROM (SELECT event_type, json_extract(props, '$.k')::INT AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# --- distinct counting: exact + sketch ------------------------------------


def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day distinct users (the oracle-checkable companion)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


DISTINCT_USERS_ORACLE = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch per day — rows-only driver check (estimates are
    algorithm-specific); tests bound its error against the exact count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"))
        .orderBy("day")
    )


# --- set operations -------------------------------------------------------


def segment_customer_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets of two segments
    (per-nation membership sets), emitted as one labeled relation."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey").distinct()
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_nationkey")
        .unionByName(
            a.intersect(b).select(F.lit("intersect").alias("op"), "c_nationkey")
        )
        .unionByName(
            a.exceptAll(b).select(F.lit("except").alias("op"), "c_nationkey")
        )
    )


SETOPS_ORACLE = """
WITH a AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT 'union' AS op, c_nationkey FROM (SELECT c_nationkey FROM a UNION SELECT c_nationkey FROM b)
UNION ALL
SELECT 'intersect', c_nationkey FROM (SELECT c_nationkey FROM a INTERSECT SELECT c_nationkey FROM b)
UNION ALL
SELECT 'except', c_nationkey FROM (SELECT c_nationkey FROM a EXCEPT SELECT c_nationkey FROM b)
"""
