"""Histogram (Exercise 1, SURVEY §2.1 O1-O8) unit + oracle tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_hadoop_spark.functions.geo import spherical_earth_distance
from mapreduce_hadoop_spark.operators.histogram import (
    ORACLE_SQL,
    histogram_query,
    width_bucket_label,
)


def ref_distance(lat1, lon1, lat2, lon2):
    """Python transcription of SparkTripLength.java:22-27 for spot checks."""
    d2r = math.pi / 180
    dlat = (lat1 - lat2) * d2r
    dlon = (lon1 - lon2) * d2r
    mean = (lat1 + lat2) * d2r / 2
    return 6371.009 * math.sqrt(dlat**2 + (math.cos(mean) * dlon) ** 2)


def test_distance_matches_reference_example(spark):
    # Worked example from SparkTripLength.java:30-35: the mapper docstring
    # says this trip is 46.497 km (bin 46).
    df = spark.createDataFrame(
        [(37.61373, -122.39722, 37.34666, -121.99176)], ["a", "b", "c", "d"]
    )
    got = df.select(spherical_earth_distance("a", "b", "c", "d").alias("km")).first()["km"]
    assert abs(got - 46.497) < 0.001
    assert got == ref_distance(37.61373, -122.39722, 37.34666, -121.99176)


def test_width_bucket_labels(spark):
    rows = [(0.0,), (1.99,), (2.0,), (45.3,), (79.99,), (80.0,), (250.0,)]
    df = spark.createDataFrame(rows, ["d"])
    got = [r["bin"] for r in df.select(width_bucket_label(F.col("d")).alias("bin")).collect()]
    assert got == ["00", "00", "02", "44", "78", ">=80", ">=80"]


def test_histogram_matches_duckdb(spark, sf_dir, duck):
    sdf = histogram_query(spark, sf_dir).toPandas()
    odf = duck.execute(ORACLE_SQL).df()
    assert list(sdf["bin"]) == list(odf["bin"])
    assert list(sdf["n"]) == list(odf["n"])
    assert sdf["n"].sum() == duck.execute("select count(*) from events").fetchone()[0]
