"""Derived GPS views over the driver's `events` table.

The reference's native inputs (taxi GPS segment files) do not exist in the
driver testdata, so the engine derives a deterministic GPS-shaped stream from
`events` with pure IEEE-double arithmetic (fmod / multiply / add), which both
Spark and DuckDB evaluate bit-identically. Every GPS query and its DuckDB
oracle build on the same derivation:

- ``positions``: one taxi position per event —
  taxi ≙ user_id, t ≙ epoch(ts)/10 (compressed so consecutive fixes straddle
  the reference's 210 s session gap), lat/lon folded into a ~11 km box around
  SFO (so the airport-radius predicate fires), status M/E from event_type
  (matching the segment-file status domain, FIXTURES.md §1).

- ``trip_endpoints``: one (start, stop) coordinate pair per event over a
  4°x6° box — the Exercise-1 trip shape (FIXTURES.md §2), wide enough that
  the >=80 km histogram clamp triggers.

The SQL constants here must stay in lock-step with the Column expressions;
tests/test_gps.py cross-checks them value-for-value against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.sources.tables import load_table

# --- positions: sessionization-grade stream -------------------------------

TIME_COMPRESSION = 10.0  # epoch seconds / 10 → median per-taxi gap ≈ 210 s

POSITIONS_SQL = """
SELECT
    user_id                                        AS taxi,
    epoch(ts) / 10.0                               AS t,
    37.58 + fmod("value", 0.1)                     AS lat,
    -122.43 + fmod("value" * 0.618033, 0.1)        AS lon,
    CASE WHEN event_type IN ('click','view','purchase') THEN 'M' ELSE 'E' END AS status,
    event_id,
    CAST(ts AS DATE)                               AS event_date
FROM events
"""


def positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS-position stream: (taxi, t, lat, lon, status, event_id, event_date)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("taxi"),
        (F.col("ts").cast("double") / F.lit(TIME_COMPRESSION)).alias("t"),
        (F.lit(37.58) + F.col("value") % F.lit(0.1)).alias("lat"),
        (F.lit(-122.43) + (F.col("value") * F.lit(0.618033)) % F.lit(0.1)).alias("lon"),
        F.when(F.col("event_type").isin("click", "view", "purchase"), F.lit("M"))
        .otherwise(F.lit("E"))
        .alias("status"),
        F.col("event_id"),
        F.col("ts").cast("date").alias("event_date"),
    )


# --- trip endpoints: Exercise-1 histogram shape ---------------------------

TRIP_ENDPOINTS_SQL = """
SELECT
    event_id,
    user_id                                        AS taxi,
    36.0 + fmod("value", 4.0)                      AS start_lat,
    -124.5 + fmod("value" * 0.618033, 6.0)         AS start_lon,
    36.0 + fmod("value" * 2.414213, 4.0)           AS stop_lat,
    -124.5 + fmod("value" * 3.141592, 6.0)         AS stop_lon
FROM events
"""


def trip_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event (start, stop) coordinate pairs for the trip-length histogram."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("user_id").alias("taxi"),
        (F.lit(36.0) + F.col("value") % F.lit(4.0)).alias("start_lat"),
        (F.lit(-124.5) + (F.col("value") * F.lit(0.618033)) % F.lit(6.0)).alias("start_lon"),
        (F.lit(36.0) + (F.col("value") * F.lit(2.414213)) % F.lit(4.0)).alias("stop_lat"),
        (F.lit(-124.5) + (F.col("value") * F.lit(3.141592)) % F.lit(6.0)).alias("stop_lon"),
    )


# DuckDB SQL text of the plane-projection distance (functions/geo.py) —
# identical operation order so doubles match bit-for-bit.
def distance_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    d2r = "0.017453292519943295"  # math.pi / 180, repr-exact
    return (
        f"6371.009 * sqrt("
        f"pow(({lat1} - {lat2}) * {d2r}, 2) + "
        f"pow(cos(({lat1} + {lat2}) * {d2r} / 2) * (({lon1} - {lon2}) * {d2r}), 2))"
    )
