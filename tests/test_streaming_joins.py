"""Stream-stream range join matches its batch twin."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_hadoop_spark.operators.temporal import views_before_purchase_range_join
from mapreduce_hadoop_spark.streaming.joins import views_before_purchase_stream


def test_stream_stream_join_matches_batch(spark, sf_dir):
    q = (
        views_before_purchase_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    got = (
        spark.sql("select * from ssj_test")
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.round(F.sum("value"), 4).alias("view_value_sum"),
        )
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    want = (
        views_before_purchase_range_join(spark, sf_dir)
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    from mapreduce_hadoop_spark.sources.tables import load_table
    from mapreduce_hadoop_spark.streaming.joins import enriched_events_stream

    q = (
        enriched_events_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("sse_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    agg = lambda df: (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    got = agg(spark.sql("select * from sse_test"))
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = agg(ev.join(cust, "user_id"))
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c
