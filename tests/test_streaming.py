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
