"""Scalar-function layer exposed as standalone oracle-checked queries.

SURVEY.md §7 step 2: each scalar function (O3 distance, O4 width-bucket,
O13 epoch conversions) gets its own oracle-checked query so a regression in
the function layer pinpoints itself, independent of the pipelines built on
top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.functions.geo import spherical_earth_distance
from mapreduce_hadoop_spark.functions.timefns import str_to_epoch, ts_to_epoch
from mapreduce_hadoop_spark.operators import gps
from mapreduce_hadoop_spark.operators.histogram import width_bucket_label
from mapreduce_hadoop_spark.sources.tables import load_table


def fn_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: raw plane-projection distances over the derived endpoints."""
    t = gps.trip_endpoints(spark, sf_dir)
    # Rounded at the output edge: JVM Math.cos and libm cos can disagree in
    # the final ulp for some inputs, so raw transcendental outputs are the
    # one place full-bit equality cannot be promised across engines.
    return t.select(
        "event_id",
        F.round(
            spherical_earth_distance("start_lat", "start_lon", "stop_lat", "stop_lon"), 6
        ).alias("dist_km"),
    )


FN_DISTANCE_ORACLE = f"""
SELECT event_id,
       round({gps.distance_sql("start_lat", "start_lon", "stop_lat", "stop_lon")}, 6) AS dist_km
FROM ({gps.TRIP_ENDPOINTS_SQL})
"""


def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: the bin labeling applied directly to the events value column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", width_bucket_label(F.col("value")).alias("bin"))


FN_WIDTH_BUCKET_ORACLE = """
SELECT event_id,
       CASE WHEN floor("value" / 2.0) < 40
            THEN printf('%02d', CAST(floor("value" / 2.0) * 2 AS INT))
            ELSE '>=80' END AS bin
FROM events
"""


def fn_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 both directions: timestamp->double epoch, and the reference's
    string->epoch parse (with the NULL->0.0 sentinel) round-tripped through
    a formatted string."""
    ev = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 100 == 0, F.lit("NULL")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    return ev.select(
        "event_id",
        ts_to_epoch("ts").alias("epoch_micro"),
        str_to_epoch(s).alias("epoch_parsed"),
    )


FN_EPOCH_ORACLE = """
SELECT event_id,
       epoch(ts) AS epoch_micro,
       CASE WHEN event_id % 100 = 0 THEN 0.0
            ELSE epoch(date_trunc('second', ts)) END AS epoch_parsed
FROM events
"""
