"""Stateful streaming trip sessionization matches the batch parity path."""

from __future__ import annotations

from mapreduce_hadoop_spark.operators.sessionize import airport_trips_parity_query
from mapreduce_hadoop_spark.streaming.trips import airport_trips_stream


def test_stream_trips_match_batch_parity(spark, sf_dir):
    q = (
        airport_trips_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("trips_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    key = ["taxi", "start_t"]
    got = (
        spark.sql("select * from trips_stream_test")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = (
        airport_trips_parity_query(spark, sf_dir)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c
