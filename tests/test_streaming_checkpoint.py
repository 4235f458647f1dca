"""Checkpointed restart: a resumed stream processes only new files, once.

The reference's only fault model was "rerun the job"; Structured Streaming
checkpoints give exactly-once file processing across restarts — stop a
query, add data, restart with the same checkpoint: the first batch is not
reprocessed and the new file is picked up exactly once.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_hadoop_spark.streaming.sessions import dedup_stream

SRC = "/root/testdata/sf0.001/events.parquet"


def _shifted_copy(dst: str, shift: int, days: int) -> None:
    """Copy the events file with event_id shifted and timestamps moved
    ``days`` forward — new data must sit AHEAD of the restored watermark or
    the dedup operator correctly drops it as late (same schema, incl. the
    nanos timestamp type the stream's schema expects)."""
    t = pq.read_table(SRC)
    ids = pa.compute.add(t.column("event_id"), shift)
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id", ids)
    ts_type = t.column("ts").type
    ts = pa.compute.add(
        t.column("ts").cast(pa.int64()), days * 86400 * 1_000_000_000
    ).cast(ts_type)
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    pq.write_table(t, dst)


def _run_once(spark, src_dir: str, ckpt: str, out: str) -> None:
    q = (
        dedup_stream(spark, src_dir)
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


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    import os

    os.makedirs(src, exist_ok=True)
    shutil.copy(SRC, f"{src}/events.parquet")
    n1 = spark.read.parquet(SRC).count()

    _run_once(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == n1

    # New data arrives while the query is down.
    _shifted_copy(f"{src}/events_late.parquet", 10_000_000, days=31)
    _run_once(spark, src, ckpt, out)

    got = spark.read.parquet(out)
    assert got.count() == 2 * n1  # first file NOT reprocessed, new file once
    assert got.select("event_id").distinct().count() == 2 * n1


def test_foreachbatch_idempotent_sink(spark, tmp_path):
    # Two runs over a growing source with one checkpoint: each batch lands
    # in its own batch_id dir exactly once; total rows = distinct source rows.
    import os

    from mapreduce_hadoop_spark.streaming.sessions import dedup_stream
    from mapreduce_hadoop_spark.streaming.sinks import write_stream_idempotent

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    shutil.copy(SRC, f"{src}/events.parquet")
    n1 = spark.read.parquet(SRC).count()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    for add_file in (None, "events_b.parquet"):
        if add_file:
            _shifted_copy(f"{src}/{add_file}", 20_000_000, days=31)
        q = (
            write_stream_idempotent(dedup_stream(spark, src), out, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180), "stream did not finish"
        finally:
            q.stop()

    got = spark.read.option("basePath", out).parquet(out)
    assert got.count() == 2 * n1
    assert got.select("event_id").distinct().count() == 2 * n1
