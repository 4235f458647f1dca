"""Stateful streaming trip sessionization matches the batch parity path."""

from __future__ import annotations

from mapreduce_hadoop_spark.operators.sessionize import airport_trips_parity_query
from mapreduce_hadoop_spark.streaming.trips import (
    airport_trips_microbatch,
    airport_trips_stream,
)


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


def test_microbatch_twin_matches_parity(spark, sf_dir):
    # The batch twin chunks each taxi's stream into event-time buckets and
    # carries the reducer state across them; any carry bug (lost open trip,
    # re-consumed position, reset previous fix) breaks bit-identity with
    # the single-pass parity replay.
    key = ["taxi", "start_t"]
    got = (
        airport_trips_microbatch(spark, sf_dir, n_batches=4)
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
