"""General relational analytics over the TPC-H-ish driver tables.

The reference has no joins (SURVEY.md §2.4) — these queries document the
breadth the Spark engine adds for free: broadcast hash joins for dims,
multi-way join chains, grouped aggregation with partial agg, window top-N.

Scale notes (100 TB stance):
- Dimension joins (`region`,`nation`,`customer`,`supplier`,`part`) are
  explicitly `broadcast()` — no shuffle of the fact table for them.
- Fact aggregations reduce before they join where possible (group-then-join
  beats join-then-group when the join is 1:N on the group key).
- Top-N uses window row_number with a deterministic tiebreak, which AQE
  executes as partial top-N per partition before the final sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.sources.tables import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (pure agg breadth)."""
    li = load_table(spark, sf_dir, "lineitem")
    kept = li.filter(F.col("l_shipdate") < F.lit("1998-09-01"))
    return (
        kept.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * (F.lit(1.0) + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 4)       AS sum_qty,
    round(sum(l_extendedprice), 4)  AS sum_base_price,
    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
    round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
    round(avg(l_quantity), 6)       AS avg_qty,
    round(avg(l_extendedprice), 6)  AS avg_price,
    round(avg(l_discount), 6)       AS avg_disc,
    count(*)                        AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join chain: region -> nation -> customer -> orders -> lineitem.

    Dims are broadcast; the two fact tables join on o_orderkey. lineitem is
    pre-aggregated to per-order revenue BEFORE the join with orders, so the
    join input is one row per order instead of one per line item.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev")
    )
    dim = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        # No explicit broadcast on the customer-sized dim: unlike
        # nation/region it grows with the corpus, and a static hint OOMs the
        # driver once it stops being small (seen at the derived sf1). AQE's
        # size-based decision broadcasts it while it fits and sort-merges
        # beyond — the correct behavior at every scale.
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


REVENUE_BY_NATION_ORACLE = """
WITH per_order AS (
    SELECT l_orderkey, sum(l_extendedprice * (1.0 - l_discount)) AS rev
    FROM lineitem GROUP BY l_orderkey
)
SELECT
    r_name,
    n_name,
    round(sum(rev), 4) AS revenue,
    count(*)           AS n_orders
FROM orders
JOIN per_order ON o_orderkey = l_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation    ON c_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N: each customer's 3 highest-value orders."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


TOP_ORDERS_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rank
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders
)
WHERE rank <= 3
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment filter -> 3-way join -> per-order revenue ->
    global top-10. Customer is broadcast after its segment filter; the
    lineitem shipdate filter pushes to the scan; the final top-10 is a
    TakeOrderedAndProject."""
    cutoff = "1998-06-01"
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # Segment-filtered customer is corpus-proportional: size-based
        # broadcast (AQE), not a static hint (see revenue_by_nation).
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_ORACLE = """
SELECT
    l_orderkey,
    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
    strftime(o_orderdate, '%Y-%m-%d') AS order_day,
    o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by value: orderBy + limit.

    Catalyst plans this as TakeOrderedAndProject — a bounded per-partition
    heap merged at the driver — NOT a full sort of the table; the plan shape
    is pinned in tests. This is the global-top-k companion to the per-group
    window top-N above.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


GLOBAL_TOP_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def events_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped daily event rollup (date x type counts + value sums)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_DAILY_ORACLE = """
SELECT
    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
    event_type,
    count(*)              AS n,
    round(sum("value"), 4) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def market_segment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join + grouped avg: customer account balance by segment/nation."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_balance"),
        )
        .orderBy("c_mktsegment", "n_name")
    )


MARKET_SEGMENT_ORACLE = """
SELECT c_mktsegment, n_name,
       count(*) AS n_customers,
       round(avg(c_acctbal), 6) AS avg_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
"""
