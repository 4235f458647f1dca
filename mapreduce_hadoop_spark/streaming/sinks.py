"""Idempotent streaming sink via foreachBatch.

The built-in parquet sink is already exactly-once per *file* (manifest
tracking), but cannot apply per-batch logic (dedup against the target,
partition overwrite, upsert into an external store). ``foreachBatch`` is
the escape hatch; exactly-once then rests on the writer being IDEMPOTENT
in ``batch_id``: after a crash between "write" and "commit", the batch
replays with the same id, and overwriting ``batch_id=N`` makes the replay
a no-op instead of a duplicate — the standard contract for streaming
writes to stores without transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_idempotent(stream_df: DataFrame, path: str, checkpoint: str):
    """Start an append stream writing each micro-batch to
    ``{path}/batch_id=N`` with dynamic overwrite — replayed batches
    overwrite their own directory, never duplicate. Returns the query."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{path}/batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
