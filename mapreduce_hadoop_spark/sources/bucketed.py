"""Bucketed-table layout for shuffle-free fact-fact joins.

The reference tuned physical layout by hand (split sizes, reducer counts,
``AirportTripsRevenue.java:525-560``); the Spark-native equivalent of
"co-locate what you join" is bucketing: both fact tables are written
pre-hash-partitioned on the join key, so every future join/aggregation on
that key is exchange-free — the shuffle is paid once at write time and
amortized over every downstream query. At 100 TB this converts the
orders⋈lineitem sort-merge (two full shuffles of the biggest tables per
query) into a zero-exchange zip of co-numbered buckets.

Bucket pruning note: bucket counts should match between tables being
joined (or be integer multiples, with AQE bucket coalescing enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_hadoop_spark.sources.tables import load_table

N_BUCKETS = 32


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = N_BUCKETS,
    name: str | None = None,
) -> str:
    """Persist a testdata table bucketed+sorted on ``key``; returns the
    catalog table name. Idempotent per session (overwrites)."""
    name = name or f"{table}_by_{key}"
    # A stale warehouse directory without a metastore entry (fresh session,
    # leftover files) makes saveAsTable refuse; clear both.
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil

    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{loc.removeprefix('file:')}/{name}", ignore_errors=True)
    (
        load_table(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return name


def orders_lineitem_bucketed_join(
    spark: SparkSession, orders_tbl: str, lineitem_tbl: str
) -> DataFrame:
    """Per-order revenue joined to order metadata, both sides bucketed on the
    order key: plans with ZERO shuffle exchanges (asserted in tests) — the
    aggregation reuses lineitem's bucket partitioning and the join zips
    co-numbered buckets."""
    from pyspark.sql import functions as F

    li = spark.table(lineitem_tbl)
    orders = spark.table(orders_tbl)
    per_order = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
        ).alias("rev")
    )
    # hint("merge"): at toy scale AQE would broadcast one side, which works
    # but bypasses the bucket zip this layout exists to demonstrate; the
    # sort-merge path reads co-numbered buckets with no exchange on either
    # side — the plan shape that matters at 100 TB.
    return orders.join(
        per_order.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey")
    ).select("o_orderkey", "o_orderdate", "o_totalprice", "rev")
