"""Deterministic write-side operators — the training-data export path.

`t21_shard_assign` (queries.py) is the oracle-checkable READ formulation of
sharding; this module is the WRITE path a pipeline actually runs: shard the
corpus into a fixed number of files whose contents and internal order are a
pure function of the data — independent of input partitioning, task
scheduling, speculative retries, or cluster size — so a training job can
resume, re-run, or diff exports row-for-row (part-file names carry a
per-job UUID; determinism is of contents and order, not paths).

Scale shape: ONE hash-partitioned shuffle into ``n_shards`` partitions
(uniform by construction — the shard key is a high-quality content hash),
then Spark's spillable external sort within each partition, then a
hive-layout write (``partitionBy`` on the shard — cardinality is exactly
``n_shards``, so no small-file explosion).  The within-partition sort
leads with the shard column, which satisfies the file writer's required
ordering — Spark inserts NO extra sort, so the written row order is the
deterministic hash order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.functions.hashing import h60_col


def sharded(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Return ``df`` repartitioned into exactly ``n_shards`` deterministic
    shards, hash-ordered within each — ready for a per-partition write.

    The shard id and intra-shard order derive from ``h60(id)`` (a
    content-stable md5-based hash, NOT Spark's seed/partitioning-sensitive
    defaults), so the layout is reproducible across engines and runs.
    Note ``repartition(n, col)`` re-hashes the shard value, so a physical
    partition may carry several shards (and some carry none) — which is
    why the write below partitions the FILES by the shard column rather
    than trusting partition==shard.

    The hash is MATERIALIZED as a column before the sort instead of
    passed as a sort-key expression: sorting by the raw md5 expression
    made the write 4x slower at sf0.1 (3.2 s vs 0.8 s measured r11 —
    the non-codegen md5 chain is evaluated interpreted inside the sort),
    with identical ordering.  The helper column is dropped before the
    rows reach the caller/writer."""
    hh = h60_col(F.col(id_col).cast("string"))
    return (
        df.withColumn("__h", hh)
        .withColumn("__shard", (F.col("__h") % n_shards).cast("int"))
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__h", id_col)
        .drop("__h")
    )


def write_sharded(df: DataFrame, path: str, id_col: str, n_shards: int) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (hive layout ``__shard=i/``, one file per shard).  Shard
    CONTENTS and row ORDER are reproducible across runs and input
    layouts (what test_sink verifies); the part-file NAMES are not —
    Spark embeds a per-job UUID — so byte-diff the read-back rows, not
    the directory listing."""
    (
        sharded(df, id_col, n_shards)
        .write.mode("overwrite")
        .partitionBy("__shard")
        .parquet(path)
    )
