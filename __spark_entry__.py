"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_hadoop_spark/``; this module only wires
the registry. See SURVEY.md §2 for the operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Exercise-1 trip-length histogram) on sf0.001."""
    from mapreduce_hadoop_spark.operators import histogram

    return histogram.histogram_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mapreduce_hadoop_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from mapreduce_hadoop_spark import registry

    return registry.oracle_sql()
