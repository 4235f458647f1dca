"""Query registry: every implemented operator exposed as a (query, oracle) pair.

Each entry maps a SURVEY.md §2 operator (or north-star extension) to
1. a Spark callable ``(spark, sf_dir) -> DataFrame`` and
2. (where SQL-expressible) a DuckDB oracle SQL string over the same tables.

Column names are aliased identically on both sides — the driver sorts columns
by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]


def _specs() -> dict[str, QuerySpec]:
    from mapreduce_hadoop_spark.operators import histogram

    specs: dict[str, QuerySpec] = {
        # O1-O8: Exercise-1 trip-length histogram (flagship).
        "trip_length_histogram": (histogram.histogram_query, histogram.ORACLE_SQL),
    }
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _specs().items() if sql is not None}
