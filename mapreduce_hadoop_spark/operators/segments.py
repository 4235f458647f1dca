"""Exercise 2 Job 1, cleansing stage (SURVEY.md §2.2, operators O9a-O10).

Reference pipeline (``src/AirportTripsRevenue.java:141-225``): parse the raw
9-field segment line, coerce any status other than 'M' to 'E', drop E-E
segments, unpivot each segment into its two endpoint positions, drop NULL
positions, drop geo-invalid positions (bounding box + coastline half-plane),
then dedup (adjacent segments share interior points).

Spark-first formulation: one scan -> `when/otherwise` normalization ->
`filter` -> `explode(array(struct, struct))` unpivot -> `filter` ->
`dropDuplicates`. Everything is built-in expressions; the unpivot is a
single-scan explode rather than a self-union, so the source is read once.

The driver testdata has no raw segment files, so ``derived_segments`` builds
a deterministic segment-shaped stream from `events` with the same dirtiness
the reference documents (FIXTURES.md §1): out-of-domain statuses, NULL
positions, out-of-bounds coordinates, exact duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.functions.geo import is_valid_position
from mapreduce_hadoop_spark.operators import gps
from mapreduce_hadoop_spark.sources.tables import load_table

# Derived dirty segment stream: two positions per event over a 4°x6° box
# (wide enough that the bounding box + coastline filters fire), raw statuses
# outside the {M,E} domain (exercising coercion), every-53rd-event NULL
# first position, and every-7th-event duplicated (exercising dedup).
DERIVED_SEGMENTS_SQL = f"""
SELECT
    user_id                                          AS taxi,
    CASE WHEN event_id % 53 = 0 THEN NULL
         ELSE epoch(ts) / 40.0 END                   AS t1,
    CASE WHEN event_id % 53 = 0 THEN NULL
         ELSE 36.0 + {gps.fold_sql('"value"', '4.0')} END AS lat1,
    CASE WHEN event_id % 53 = 0 THEN NULL
         ELSE -124.5 + {gps.fold_sql('"value" * 0.618033', '6.0')} END AS lon1,
    CASE event_type WHEN 'click' THEN 'M' WHEN 'view' THEN 'M'
         WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
         ELSE 'E' END                                AS status1,
    epoch(ts) / 40.0 + 6.0 + {gps.fold_sql('"value" * 7.0', '30.0')} AS t2,
    36.0 + {gps.fold_sql('"value" * 2.414213', '4.0')}   AS lat2,
    -124.5 + {gps.fold_sql('"value" * 3.141592', '6.0')} AS lon2,
    CASE WHEN {gps.fold_sql('"value"', '0.01')} < 0.004 THEN 'M' ELSE 'e' END AS status2
FROM events
"""

DERIVED_SEGMENTS_WITH_DUPS_SQL = f"""
WITH seg AS ({DERIVED_SEGMENTS_SQL})
SELECT * FROM seg
UNION ALL
SELECT * FROM seg WHERE taxi % 7 = 0
"""


def derived_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t1 = F.col("ts").cast("double") / F.lit(gps.TIME_COMPRESSION)
    null1 = F.col("event_id") % 53 == 0
    seg = ev.select(
        F.col("user_id").alias("taxi"),
        F.when(null1, F.lit(None)).otherwise(t1).alias("t1"),
        F.when(null1, F.lit(None))
        .otherwise(F.lit(36.0) + gps.fold(F.col("value"), 4.0))
        .alias("lat1"),
        F.when(null1, F.lit(None))
        .otherwise(F.lit(-124.5) + gps.fold(F.col("value") * F.lit(0.618033), 6.0))
        .alias("lon1"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("M"))
        .when(F.col("event_type") == "purchase", F.lit("P"))
        .when(F.col("event_type") == "signup", F.lit("S"))
        .otherwise(F.lit("E"))
        .alias("status1"),
        (t1 + F.lit(6.0) + gps.fold(F.col("value") * F.lit(7.0), 30.0)).alias("t2"),
        (F.lit(36.0) + gps.fold(F.col("value") * F.lit(2.414213), 4.0)).alias("lat2"),
        (F.lit(-124.5) + gps.fold(F.col("value") * F.lit(3.141592), 6.0)).alias("lon2"),
        F.when(gps.fold(F.col("value"), 0.01) < F.lit(0.004), F.lit("M"))
        .otherwise(F.lit("e"))
        .alias("status2"),
    )
    # Dup injection via a row multiplier, not a self-union: a self-union
    # would scan the source twice (visible as two Scan nodes in the plan);
    # exploding a 1- or 2-element array keeps the whole derivation one scan.
    n_copies = F.when(F.col("taxi") % 7 == 0, F.lit(2)).otherwise(F.lit(1))
    return (
        seg.withColumn("_copy", F.explode(F.sequence(F.lit(1), n_copies)))
        .drop("_copy")
    )


def normalize_status(c: F.Column) -> F.Column:
    """Any status other than 'M' is coerced to 'E' (AirportTripsRevenue.java:158-167)."""
    return F.when(c == F.lit("M"), F.lit("M")).otherwise(F.lit("E"))


def clean_positions(segments: DataFrame) -> DataFrame:
    """Cleanse + unpivot a segment DataFrame into distinct valid positions.

    Output: (taxi, t, lat, lon, status) — the job-1 shuffle record
    (AirportTripsRevenue.java:181-193).
    """
    seg = segments.withColumn("status1", normalize_status(F.col("status1"))).withColumn(
        "status2", normalize_status(F.col("status2"))
    )
    # O9d: E-E segments carry no trip information (55% of real input).
    seg = seg.filter(~((F.col("status1") == "E") & (F.col("status2") == "E")))
    # O9e: unpivot segment -> its two endpoint positions; single scan.
    pos = seg.select(
        F.col("taxi"),
        F.explode(
            F.array(
                F.struct(
                    F.col("t1").alias("t"),
                    F.col("lat1").alias("lat"),
                    F.col("lon1").alias("lon"),
                    F.col("status1").alias("status"),
                ),
                F.struct(
                    F.col("t2").alias("t"),
                    F.col("lat2").alias("lat"),
                    F.col("lon2").alias("lon"),
                    F.col("status2").alias("status"),
                ),
            )
        ).alias("p"),
    ).select("taxi", "p.t", "p.lat", "p.lon", "p.status")
    # O9f: NULL positions; O9g: geo validity.
    pos = pos.filter(F.col("t").isNotNull()).filter(is_valid_position("lat", "lon"))
    # O10: distinct (combiner-as-dedup in the reference).
    return pos.dropDuplicates(["taxi", "t", "lat", "lon", "status"])


def clean_positions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_positions(derived_segments(spark, sf_dir))


_VALID = (
    "lat >= (-1.3388206045302447 * lon + -126.75838718367324) "
    "AND lat >= 36.50 AND lat <= 39.80 AND lon >= -123.80 AND lon <= -119.10"
)

ORACLE_SQL = f"""
WITH seg0 AS ({DERIVED_SEGMENTS_WITH_DUPS_SQL}),
seg AS (
    SELECT taxi, t1, lat1, lon1,
           CASE WHEN status1 = 'M' THEN 'M' ELSE 'E' END AS status1,
           t2, lat2, lon2,
           CASE WHEN status2 = 'M' THEN 'M' ELSE 'E' END AS status2
    FROM seg0
),
kept AS (SELECT * FROM seg WHERE NOT (status1 = 'E' AND status2 = 'E')),
pos AS (
    SELECT taxi, t1 AS t, lat1 AS lat, lon1 AS lon, status1 AS status FROM kept
    UNION ALL
    SELECT taxi, t2, lat2, lon2, status2 FROM kept
)
SELECT DISTINCT taxi, t, lat, lon, status
FROM pos
WHERE t IS NOT NULL AND {_VALID}
"""
