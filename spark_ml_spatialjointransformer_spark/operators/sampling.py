"""Corpus shaping operators for training-data pipelines: deterministic
stratified sampling and context-window sequence packing.

Both are pure JVM DataFrame plans (no Python in the hot path) and fully
deterministic — ordering always derives from content hashes or ids, never
from engine row order — so each carries an exact DuckDB oracle in
queries.py (t12/t13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_ml_spatialjointransformer_spark.functions.hashing import h60_col


def stratified_take(
    df: DataFrame, group_col: str, id_col: str, n: int
) -> DataFrame:
    """Deterministic per-group quota sample: rank rows inside each group by
    (h60(id), id) — a content-independent pseudo-random but reproducible
    order — and keep the first ``n``.

    The hash order makes the sample stable across runs/engines/partitionings
    (unlike ``sampleBy``, whose RNG is partitioning-dependent), which is
    what a training-data pipeline needs for reproducible mixtures.

    At 100 TB: one shuffle on the group key; for heavy-hitter groups replace
    the exact window with a pre-filter ``h60(id) < threshold(group)`` from an
    approximate per-group quantile, then rank only the survivors — same
    output, the window's sort touches ~n rows per group instead of all.

    Output: input columns ++ ``rn`` (1-based rank within the group).
    """
    w = Window.partitionBy(group_col).orderBy(
        h60_col(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    window_tokens: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-then-chunk packing assignment — the standard LLM-pretraining
    layout: documents in ``id_col`` order form one virtual token stream,
    and each document is assigned the context window its first token lands
    in (``window_id``) plus its offset inside that window.

    Scale shape: a single global cumulative sum would serialize on one
    partition, so this runs the classic TWO-LEVEL prefix sum — ONE shuffle
    total: range-partition by id, then a partition-LOCAL exclusive running
    sum (Arrow pass over the sorted partition — a Window keyed on the
    physical partition id would force a second full-data hash exchange,
    because the optimizer cannot prove range partitioning already clusters
    it), plus an exclusive per-partition prefix (a tiny aggregate over
    #partitions rows) broadcast back.  The result is identical to the
    global formula and invariant to the partition count (property-tested);
    documents spanning windows is intended concat-then-chunk semantics.

    Callers should project to the columns they need before packing — every
    input column rides through the Arrow pass.

    Output: input columns ++ (window_id, offset).
    """
    import numpy as np
    from pyspark.sql import types as T

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    base = df.repartitionByRange(n_parts, id_col).sortWithinPartitions(id_col)
    mid_schema = T.StructType(
        list(base.schema.fields)
        + [
            T.StructField("__part", T.IntegerType()),
            T.StructField("__local_excl", T.LongType()),
        ]
    )

    def local_cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            tok = pdf[n_tokens_col].to_numpy(dtype="int64")
            excl = run + np.concatenate(([0], np.cumsum(tok[:-1]))) if len(tok) else tok
            run += int(tok.sum())
            yield pdf.assign(__part=np.int32(pid), __local_excl=excl)

    # one materialization: the per-partition totals and the main branch both
    # read it (otherwise the scan + range shuffle + cumsum run twice)
    local = base.mapInPandas(local_cumsum, schema=mid_schema).localCheckpoint(
        eager=False
    )
    totals = local.groupBy("__part").agg(
        F.sum(n_tokens_col).cast("bigint").alias("__tot")
    )
    w_tot = Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "__prefix", F.coalesce(F.sum("__tot").over(w_tot), F.lit(0)).cast("bigint")
    ).select("__part", "__prefix")

    before = F.col("__local_excl") + F.col("__prefix")
    return (
        local.join(F.broadcast(prefix), "__part")
        .withColumn(
            "window_id",
            F.floor(before / F.lit(float(window_tokens))).cast("bigint"),
        )
        .withColumn("offset", (before % window_tokens).cast("bigint"))
        .drop("__part", "__local_excl", "__prefix")
    )
