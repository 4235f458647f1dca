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


def daily_revenue(airport_trips: DataFrame) -> DataFrame:
    return (
        airport_trips.groupBy("trip_date")
        .agg(F.round(F.sum("revenue"), 4).alias("daily_revenue"))
        .orderBy("trip_date")
    )


def total_revenue(airport_trips: DataFrame) -> DataFrame:
    return airport_trips.agg(F.round(F.sum("revenue"), 4).alias("total_revenue"))


def daily_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_revenue(sessionize.airport_trips_query(spark, sf_dir))


def total_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_revenue(sessionize.airport_trips_query(spark, sf_dir))


DAILY_ORACLE = f"""
WITH t AS ({sessionize.AIRPORT_TRIPS_ORACLE})
SELECT trip_date, round(sum(revenue), 4) AS daily_revenue
FROM t GROUP BY trip_date ORDER BY trip_date
"""

TOTAL_ORACLE = f"""
WITH t AS ({sessionize.AIRPORT_TRIPS_ORACLE})
SELECT round(sum(revenue), 4) AS total_revenue FROM t
"""
