"""Partitioned-parquet layout: directory partition pruning.

The reference had a flat file per job; a 100 TB table lives as
``.../day=YYYY-MM-DD/part-*.parquet`` so a time-bounded query touches only
its days' directories — pruning happens at file listing, before any IO.
``write_events_partitioned`` materializes the events table in that layout;
plan tests assert a day-filtered read shows the filter under
``PartitionFilters`` (listing-time) rather than ``PushedFilters``
(row-group-time), and scans only the matching partition directories.

Partition-column cardinality note: partition by low-cardinality columns
(day, source); partitioning by a high-cardinality key explodes the file
count and kills listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.sources.tables import load_table


def write_events_partitioned(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    )
    # The partition column must not also live in the file payload; Spark
    # handles that automatically for partitionBy.
    ev.write.mode("overwrite").partitionBy("day").parquet(out_dir)


def read_events_day(spark: SparkSession, out_dir: str, day: str) -> DataFrame:
    """Day-bounded read over the partitioned layout; the day predicate is a
    directory filter, not a data filter.

    PATHS-FIRST (round 17 — the ANN by-list listing lesson,
    SCALE_ann_r16.md, applied to the one non-ANN hive surface with a
    driver-known pruning set): opening the ROOT lists every ``day=``
    directory at plan time before the partition filter prunes — at one
    directory per day, a year of events is ~365 paths, well past the 32
    where Spark switches to a distributed listing job. The day is a
    driver-side literal here, so the scan opens exactly the one
    directory; ``basePath`` keeps ``day`` as a partition column with the
    same schema and PartitionFilters-visible semantics as the root read
    (pinned by tests/test_partitioned.py). A day with no directory falls
    back to the pruned root read — the only case that still pays the
    listing is the one that returns zero rows. The fallback holds on
    EVERY store (ADVICE r17): local paths pre-check with isdir; for
    remote URIs (or an existing-but-empty local directory, where schema
    inference fails) the paths-first open itself raises
    AnalysisException and the root read restores the empty-day contract
    the pre-r17 root formulation had."""
    import os

    from pyspark.errors import AnalysisException

    def _root() -> DataFrame:
        return spark.read.parquet(out_dir).filter(F.col("day") == day)

    one_day = f"{out_dir}/day={day}"
    if "://" not in out_dir and not os.path.isdir(one_day):
        return _root()
    try:
        return (
            spark.read.option("basePath", out_dir)
            .parquet(one_day)
            .filter(F.col("day") == day)
        )
    except AnalysisException:
        # PATH_NOT_FOUND (remote missing day) or UNABLE_TO_INFER_SCHEMA
        # (existing-but-empty day directory): the pruned root read keeps
        # the contract, at listing cost, exactly when the answer is empty.
        return _root()
