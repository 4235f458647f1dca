"""Bucketed layout: the fact-fact join must plan with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_hadoop_spark.plans.checks import plan_counts
from mapreduce_hadoop_spark.sources.bucketed import (
    orders_lineitem_bucketed_join,
    write_bucketed,
)
from mapreduce_hadoop_spark.sources.tables import load_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    o = write_bucketed(spark, sf_dir, "orders", "o_orderkey")
    l = write_bucketed(spark, sf_dir, "lineitem", "l_orderkey")
    df = orders_lineitem_bucketed_join(spark, o, l)
    c = plan_counts(df)
    assert c["exchange"] == 0, c
    assert c["broadcast_exchange"] == 0, c

    # And it computes the same result as the unbucketed formulation.
    li = load_table(spark, sf_dir, "lineitem")
    want = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("rev")
        )
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_orderkey", "rev")
    )
    got = df.select("o_orderkey", "rev")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
