"""Streaming ingestion into the deterministic shard layout — the write
side of a streaming pipeline (kafka → bronze parquet, here with the file
source standing in for kafka).

``foreachBatch`` hands each micro-batch to the BATCH sharded writer
(operators/sink.py), so stream and batch exports share one code path: rows
land under ``__shard=<h60(id) % n>/`` with the same content-stable shard
assignment the batch path and the t21 oracle use.  Shard membership of a
row is independent of which micro-batch delivered it (the hash ignores
arrival), so compaction or re-ingestion never moves a row across shards.

Exactly-once: the parquet append per micro-batch is atomic per task file
and the streaming engine retries whole batches; per-batch dedup is the
upstream operator's job (``deduped_events_stream``) when the source is
at-least-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.functions.hashing import h60_col


def stream_to_sharded(
    sdf: DataFrame, path: str, id_col: str, n_shards: int,
    checkpoint: str | None = None,
):
    """Start a streaming query appending ``sdf`` to ``path`` in the
    deterministic shard layout; returns the StreamingQuery (caller drives
    and stops it).

    With ``checkpoint`` set, source offsets persist across restarts: a
    stopped query restarted with the same checkpoint resumes from the
    first unprocessed micro-batch — already-delivered files are never
    re-ingested (tests/test_sink.py pins this resume contract)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # hash materialized before the sort, not a sort-key expression:
        # same ordering, 4x faster write (see operators/sink.py:sharded)
        hh = h60_col(F.col(id_col).cast("string"))
        (
            batch_df.withColumn("__h", hh)
            .withColumn("__shard", (F.col("__h") % n_shards).cast("int"))
            .sortWithinPartitions("__shard", "__h", id_col)
            .drop("__h")
            .write.mode("append")
            .partitionBy("__shard")
            .parquet(path)
        )

    w = sdf.writeStream.foreachBatch(write_batch)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
