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


def test_trip_state_survives_checkpoint_restart(spark, tmp_path):
    """Stop the trip stream mid-corpus, deliver the rest, restart on the
    same checkpoint: the per-taxi carriers (incl. open trips straddling
    the stop) must round-trip the state store so the union of both runs'
    emissions equals the single-pass batch parity on the full data."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    half = t.num_rows // 2
    src, full = str(tmp_path / "src"), str(tmp_path / "full")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src), os.makedirs(full)
    pq.write_table(t.slice(0, half), f"{src}/events.parquet")
    pq.write_table(t, f"{full}/events.parquet")

    def run_stream():
        q = (
            airport_trips_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180), "stream did not finish"
        finally:
            q.stop()

    run_stream()
    pq.write_table(t.slice(half), f"{src}/events2.parquet")
    run_stream()

    key = ["taxi", "start_t"]
    got = (
        spark.read.parquet(out).toPandas().sort_values(key).reset_index(drop=True)
    )
    want = (
        airport_trips_parity_query(spark, full)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c
