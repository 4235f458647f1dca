"""Reconstructed-trip text file source + text sinks (O1/O2, O8/O18/O22).

Trip file format (FIXTURES.md §2; built at ``src/AirportTripsRevenue.java:
351-356``, parsed at ``:422`` and ``src/SparkTripLength.java:44-49``):
space-separated, 11 fields (Exercise-1 inputs may carry only the first 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIP_COLUMNS = [
    ("taxi", "int"),
    ("start_t", "double"),
    ("start_lat", "double"),
    ("start_lon", "double"),
    ("stop_t", "double"),
    ("stop_lat", "double"),
    ("stop_lon", "double"),
    ("is_airport", "boolean"),
    ("dist_km", "double"),
    ("revenue", "double"),
    ("trip_date", "string"),
]


def read_trips(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-separated trip lines -> typed DataFrame.

    Tolerates the short (7-field) Exercise-1 layout: missing trailing fields
    become nulls. Uses a single text scan + split, mirroring
    ``SparkTripLength.java:44`` (``split("\\s+")``).
    """
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    cols = [
        F.try_element_at(parts, F.lit(i + 1)).cast(typ).alias(name)
        for i, (name, typ) in enumerate(TRIP_COLUMNS)
    ]
    return lines.select(*cols).filter(F.col("taxi").isNotNull())


def write_tsv(df: DataFrame, path: str) -> None:
    """TSV sink — the reference's TextOutputFormat `key \\t value` shape
    (``SparkTripLength.java:92``, ``AirportTripsRevenue.java:605-606``)."""
    df.write.mode("overwrite").csv(path, sep="\t", header=False)


def write_trip_lines(trips: DataFrame, path: str) -> None:
    """Space-separated trip lines with the reference's presentation formats
    (%.1f epoch, %.3f distance, %.2f revenue — ``AirportTripsRevenue.java:
    351-356``). Formatting happens only at this output edge."""
    line = F.concat_ws(
        " ",
        F.col("taxi").cast("string"),
        F.format_string("%.1f", "start_t"),
        F.col("start_lat").cast("string"),
        F.col("start_lon").cast("string"),
        F.format_string("%.1f", "stop_t"),
        F.col("stop_lat").cast("string"),
        F.col("stop_lon").cast("string"),
        F.lit("true"),
        F.format_string("%.3f", "dist_km"),
        F.format_string("%.2f", "revenue"),
        F.col("trip_date"),
    )
    trips.select(line.alias("value")).write.mode("overwrite").text(path)
