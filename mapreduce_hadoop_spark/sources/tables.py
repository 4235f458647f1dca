"""Parquet table catalog for the driver's synthetic testdata (TESTDATA.md).

Parquet scans give the engine predicate pushdown + column pruning for free —
`.explain` on any query here should show PushedFilters / ReadSchema narrowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimensions small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def ensure_confs(spark: SparkSession) -> None:
    """Runtime confs the engine needs even on externally created sessions
    (the driver passes its own SparkSession to entry()): events.ts is
    TIMESTAMP(NANOS) parquet, which Spark only reads via this runtime-settable
    legacy conf, and the engine's timestamp arithmetic assumes a UTC session."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # timestamp[us] parquet without the UTC flag must read as session-tz
        # TIMESTAMP, not TIMESTAMP_NTZ — NTZ has no numeric cast and the
        # engine's epoch arithmetic (and the DuckDB oracle) treat naive
        # timestamps as UTC instants.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = _denaive_timestamps(df)
    if name == "events":
        df = normalize_events(df)
    return df


def _denaive_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    Belt-and-braces for sessions where ensure_confs could not take effect
    (conf locked, or the scan was planned before we ran): with the session
    timezone pinned to UTC the cast maps each naive wall-clock to the same
    instant the oracle assumes.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def normalize_events(df: DataFrame) -> DataFrame:
    """Restore TimestampType on events.ts read as nanos-long.

    events.ts is parquet TIMESTAMP(NANOS): with
    spark.sql.legacy.parquet.nanosAsLong it arrives as bigint nanoseconds.
    Truncate to microseconds (exactly what DuckDB does on read) using integer
    division — nanos exceed 2^53, so a double round-trip would lose
    sub-microsecond bits.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    schema = dict(zip(df.schema.names, df.schema.fields))
    if isinstance(schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def widen_to_cores(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session parallelism — ONLY when the
    scan is narrower than the cluster.

    Heavy per-row map work (hundreds of us/doc: shingle folds, codec
    stages) is throughput-bound by scan splits, and a single parquet file
    yields ~size/128MB of them: at sf1 the whole Gopher pipeline ran on 2
    of 16 threads (measured 10.3 s -> 1.3 s with this exchange). The guard
    makes it scale-safe: when the scan already has >= cores partitions —
    the 100 TB case, where splits outnumber executors a thousandfold —
    this is a NO-OP, because round-robin-shuffling a wide scan's full
    payload would be pure waste.
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can address them."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
