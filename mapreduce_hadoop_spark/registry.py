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
    from mapreduce_hadoop_spark.operators import (
        histogram,
        revenue,
        segments,
        sessionize,
    )

    specs: dict[str, QuerySpec] = {
        # O1-O8: Exercise-1 trip-length histogram (flagship).
        "trip_length_histogram": (histogram.histogram_query, histogram.ORACLE_SQL),
        # O9b-O9g + O10: segment cleansing pipeline (normalize / E-E drop /
        # unpivot / null+geo filters / dedup).
        "segments_clean_positions": (segments.clean_positions_query, segments.ORACLE_SQL),
        # O11-O16: window-function sessionization (all reconstructed trips).
        "trips_sessionize_window": (
            sessionize.trips_window_query,
            sessionize.TRIPS_WINDOW_ORACLE,
        ),
        # O15+O17: emitted airport trips.
        "airport_trips_window": (
            sessionize.airport_trips_query,
            sessionize.AIRPORT_TRIPS_ORACLE,
        ),
        # O15 parity path: exact state-machine replay (order-dependent
        # speed-drop semantics; not SQL-expressible -> rows-only check,
        # unit fixtures in tests/test_sessionize.py).
        "airport_trips_parity": (sessionize.airport_trips_parity_query, None),
        # O19-O22: daily revenue aggregation.
        "daily_revenue": (revenue.daily_revenue_query, revenue.DAILY_ORACLE),
        # O23: grand total (driver-side sum replaced by in-plan agg).
        "total_revenue": (revenue.total_revenue_query, revenue.TOTAL_ORACLE),
    }
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _specs().items() if sql is not None}
