"""Structured Streaming session aggregation matches its batch twin."""

from __future__ import annotations

from mapreduce_hadoop_spark.streaming.sessions import session_agg, session_agg_stream


def test_stream_sessions_match_batch(spark, sf_dir):
    q = (
        session_agg_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    key = ["user_id", "session_start"]
    got = spark.sql("select * from sess_test").toPandas().sort_values(key).reset_index(drop=True)
    want = session_agg(spark, sf_dir).toPandas().sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in ("user_id", "session_start", "session_end", "n_events", "value_sum"):
        assert (got[c].values == want[c].values).all(), c


def test_stream_tumbling_matches_batch(spark, sf_dir):
    # Append mode: with availableNow over a finite file, every window except
    # those still open at the final watermark emits; the final watermark sits
    # 2h behind max(ts), so compare against the batch result restricted to
    # windows the stream could close.
    from mapreduce_hadoop_spark.operators.temporal import (
        TUMBLE_S,
        events_tumbling_window,
    )
    from mapreduce_hadoop_spark.sources.tables import load_table
    from mapreduce_hadoop_spark.streaming.sessions import tumbling_agg_stream

    q = (
        tumbling_agg_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("tumb_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    key = ["win_start", "event_type"]
    got = spark.sql("select * from tumb_test").toPandas().sort_values(key).reset_index(drop=True)

    import pyspark.sql.functions as F

    max_ts = load_table(spark, sf_dir, "events").agg(F.max(F.col("ts").cast("double"))).collect()[0][0]
    final_wm = max_ts - 2 * 3600
    want = (
        events_tumbling_window(spark, sf_dir)
        .filter(F.col("win_start") + TUMBLE_S <= final_wm)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_stream_dedup_suppresses_redelivery(spark, tmp_path):
    # Redeliver the whole events file as a second identical file: the
    # watermarked dropDuplicates must emit each event_id exactly once.
    import shutil

    from mapreduce_hadoop_spark.streaming.sessions import dedup_stream

    d = str(tmp_path / "stream_src")
    import os

    os.makedirs(d, exist_ok=True)
    orig = "/root/testdata/sf0.001/events.parquet"
    shutil.copy(orig, f"{d}/events.parquet")
    shutil.copy(orig, f"{d}/events_redelivery.parquet")

    n_unique = spark.read.parquet(orig).count()

    q = (
        dedup_stream(spark, d)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    got = spark.sql("select event_id from dedup_test")
    assert got.count() == n_unique > 0
    assert got.distinct().count() == n_unique
