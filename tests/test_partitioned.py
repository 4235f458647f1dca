"""Partition pruning: day filters resolve at file listing, not row groups."""

from __future__ import annotations

import re

from mapreduce_hadoop_spark.plans.checks import executed_plan
from mapreduce_hadoop_spark.sources.partitioned import (
    read_events_day,
    write_events_partitioned,
)
from mapreduce_hadoop_spark.sources.tables import load_table

import pyspark.sql.functions as F


def test_day_filter_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    write_events_partitioned(spark, sf_dir, out)

    day = "2024-01-05"
    df = read_events_day(spark, out, day)
    plan = executed_plan(df)

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan[:2000]
    # The pruned scan must read exactly the one matching directory.
    m = re.search(r"partition count: (\d+)", plan) or re.search(
        r"PartitionCount: (\d+)", plan
    )
    if m:
        assert int(m.group(1)) == 1, plan[:2000]

    # Round-trip correctness vs the unpartitioned source.
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd") == day)
        .count()
    )
    assert df.count() == want > 0


def test_day_read_opens_single_directory_paths_first(spark, sf_dir, tmp_path):
    """Round 17 (the ANN listing lesson applied): the day-bounded read
    must OPEN only the requested ``day=`` directory — the root is never
    listed for a known day — while keeping the partition column, the
    PartitionFilters semantics, and the empty-day fallback."""
    out = str(tmp_path / "events_by_day")
    write_events_partitioned(spark, sf_dir, out)

    day = "2024-01-05"
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = read_events_day(spark, out, day)
        plan = executed_plan(df)
        # The scan's Location points at the single day directory, not
        # the root (the root read prints the root as its path).
        assert f"day={day}" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "day" in df.columns and df.count() > 0
    # A day with no directory returns empty instead of failing.
    assert read_events_day(spark, out, "1999-01-01").count() == 0


def test_day_read_empty_directory_falls_back(spark, sf_dir, tmp_path):
    """ADVICE r17: an existing-but-EMPTY ``day=`` directory fails parquet
    schema inference on the paths-first open; the read must fall back to
    the pruned root read and return zero rows instead of raising (the
    same except-path a remote store's missing-day PATH_NOT_FOUND takes,
    which a local test cannot reach directly)."""
    out = str(tmp_path / "events_by_day")
    write_events_partitioned(spark, sf_dir, out)
    (tmp_path / "events_by_day" / "day=1999-01-01").mkdir()
    assert read_events_day(spark, out, "1999-01-01").count() == 0
