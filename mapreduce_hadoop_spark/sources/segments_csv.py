"""Raw GPS segment file source (SURVEY.md §2.2 O9a/O9b).

Reference input format (``src/AirportTripsRevenue.java:128-134``, FIXTURES.md
§1): CSV, no header, 9 positional fields, single-quoted timestamps, literal
``NULL`` for missing positions, malformed rows silently dropped
(``:153-157`` — quote-strip + split + arity check).

Spark-first: the csv reader with ``quote="'"`` and an explicit 9-column
schema in DROPMALFORMED mode reproduces the parse semantics; timestamps are
parsed as UTC (session timezone pinned) and converted to double epoch
seconds, NULL -> 0.0, exactly like ``strTimeToSystemTime`` (``:106-126``).
The reference's split-size tuning (``:567-568``) maps to
``spark.sql.files.maxPartitionBytes`` (set in session.py), not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from mapreduce_hadoop_spark.functions.timefns import str_to_epoch

SEGMENT_SCHEMA = StructType(
    [
        StructField("taxi", IntegerType()),
        StructField("ts1", StringType()),
        StructField("lat1", DoubleType()),
        StructField("lon1", DoubleType()),
        StructField("status1", StringType()),
        StructField("ts2", StringType()),
        StructField("lat2", DoubleType()),
        StructField("lon2", DoubleType()),
        StructField("status2", StringType()),
    ]
)


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Read a raw ``.segments`` file into the canonical segment shape.

    Output columns match operators/segments.py:``clean_positions`` input:
    (taxi, t1, lat1, lon1, status1, t2, lat2, lon2, status2) with t* as
    double epoch seconds (NULL timestamp -> null t, distinct from the
    reference's 0.0 sentinel — the cleanse stage filters nulls either way).
    Gzip input is transparent; unlike the reference (single-split gzip,
    report.pdf p.3 §3.3), prefer uncompressed/zstd for splittability.
    """
    df = spark.read.csv(
        path,
        schema=SEGMENT_SCHEMA,
        quote="'",
        mode="DROPMALFORMED",
        header=False,
        nullValue="NULL",
    )
    # Rows where every field failed to parse arrive as all-null; the arity
    # check of the reference drops them (:154-157).
    df = df.filter(F.col("taxi").isNotNull())
    return df.select(
        "taxi",
        _epoch_or_null("ts1").alias("t1"),
        "lat1",
        "lon1",
        "status1",
        _epoch_or_null("ts2").alias("t2"),
        "lat2",
        "lon2",
        "status2",
    )


def _epoch_or_null(col: str) -> F.Column:
    c = F.col(col)
    return F.when((c.isNull()) | (c == "NULL"), F.lit(None).cast("double")).otherwise(
        str_to_epoch(c)
    )
