"""Exercise 2 Job 2 + driver aggregation (SURVEY.md §2.3, operators O19-O23).

Reference: job 2 re-reads job 1's HDFS output, projects (date, revenue),
sums per date with a combiner (``src/AirportTripsRevenue.java:417-451``),
then the driver re-reads the output file and sums the dailies into the grand
total (``:616-641``).

Spark-first formulation: no filesystem round-trip and no driver-side file
loop — the trips DataFrame flows straight into `groupBy(date).sum` and
`agg(sum)` within one DAG. Partial (map-side) aggregation is automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.operators import sessionize


# Trip revenues are exact 1e-6 multiples (fixed-point derivation in
# sessionize.py), so round(revenue * 1e6) recovers the exact micro-unit
# BIGINT and the per-day/grand sums are integer arithmetic — deterministic
# under any partial-aggregation merge order, bit-identical to the DuckDB
# oracle. 4-dp HALF_UP is (x + 50) div 100 on non-negative micro units.
_REV_MICRO = "cast(round(revenue * 1e6) as bigint)"


def daily_revenue(airport_trips: DataFrame) -> DataFrame:
    return (
        airport_trips.groupBy("trip_date")
        .agg(F.sum(F.expr(_REV_MICRO)).alias("rev_micro"))
        .select(
            "trip_date",
            F.expr("((rev_micro + 50) div 100) / 1e4").alias("daily_revenue"),
        )
        .orderBy("trip_date")
    )


def total_revenue(airport_trips: DataFrame) -> DataFrame:
    return airport_trips.agg(F.sum(F.expr(_REV_MICRO)).alias("rev_micro")).select(
        F.expr("((rev_micro + 50) div 100) / 1e4").alias("total_revenue")
    )


def daily_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_revenue(sessionize.airport_trips_query(spark, sf_dir))


def total_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_revenue(sessionize.airport_trips_query(spark, sf_dir))


_REV_MICRO_SQL = "CAST(round(revenue * 1e6) AS BIGINT)"

DAILY_ORACLE = f"""
WITH t AS ({sessionize.AIRPORT_TRIPS_ORACLE}),
g AS (
    SELECT trip_date, CAST(sum({_REV_MICRO_SQL}) AS BIGINT) AS rev_micro
    FROM t GROUP BY trip_date
)
SELECT trip_date, ((rev_micro + 50) // 100) / 1e4 AS daily_revenue
FROM g ORDER BY trip_date
"""

TOTAL_ORACLE = f"""
WITH t AS ({sessionize.AIRPORT_TRIPS_ORACLE}),
g AS (SELECT CAST(sum({_REV_MICRO_SQL}) AS BIGINT) AS rev_micro FROM t)
SELECT ((rev_micro + 50) // 100) / 1e4 AS total_revenue FROM g
"""
