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
    df: DataFrame, group_col: str, id_col: str, n: int, prefilter: bool = True
) -> DataFrame:
    """Deterministic per-group quota sample: rank rows inside each group by
    (h60(id), id) — a content-independent pseudo-random but reproducible
    order — and keep the first ``n``.

    The hash order makes the sample stable across runs/engines/partitionings
    (unlike ``sampleBy``, whose RNG is partitioning-dependent), which is
    what a training-data pipeline needs for reproducible mixtures.

    Heavy-hitter guard (``prefilter=True``): before the exact per-group
    window, an Arrow pass keeps only each batch's LOCAL first-``n`` rows
    per group (combiner-style top-n).  The union of batch-local top-n sets
    is always a superset of the global top-n — for ANY partitioning — so
    the final window output is bit-identical, but the group-key shuffle
    and sort now carry at most n·num_batches rows per group instead of
    every row of a hot group.  h60 is computed JVM-side once and reused as
    the window key.

    Output: input columns ++ ``rn`` (1-based rank within the group).
    """
    if not prefilter:
        w = Window.partitionBy(group_col).orderBy(
            h60_col(F.col(id_col).cast("string")), F.col(id_col)
        )
        return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n)

    base = df.withColumn("__h", h60_col(F.col(id_col).cast("string")))
    schema = base.schema

    def local_topn(batches):
        for pdf in batches:
            yield (
                pdf.sort_values(["__h", id_col])
                .groupby(group_col, sort=False)
                .head(n)
            )

    surv = base.mapInPandas(local_topn, schema=schema)
    w = Window.partitionBy(group_col).orderBy("__h", id_col)
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .drop("__h")
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
    partition, so this runs the classic TWO-LEVEL prefix sum over a
    DETERMINISTIC bucket key derived from the id value itself
    (``(id - min_id) div ceil(span / B)``) — never from the physical
    partition id, so the result is a pure function of the data and
    identical under any partitioning, task order, or retry.  Plan: one
    tiny min/max job to fix the bucket width, a map-side-combined
    per-bucket total (B rows) windowed into an exclusive bucket prefix and
    broadcast back, and ONE full-data shuffle — the within-bucket
    exclusive-prefix window partitioned by bucket and ordered by id.
    All arithmetic is 64-bit integer (``div``/``%``), exact past 2^53
    cumulative tokens.  Documents spanning windows is intended
    concat-then-chunk semantics.

    ``id_col`` must be integral; id gaps/clustering only skew bucket
    sizes, never results (raise ``num_partitions`` if skewed).

    Output: input columns ++ (window_id, offset).
    """
    spark = df.sparkSession
    n_buckets = num_partitions or spark.sparkContext.defaultParallelism
    bounds = df.agg(
        F.min(F.col(id_col).cast("bigint")).alias("lo"),
        F.max(F.col(id_col).cast("bigint")).alias("hi"),
    ).first()
    if bounds["lo"] is None:  # empty input: just add the two columns
        return df.withColumn("window_id", F.lit(0).cast("bigint")).withColumn(
            "offset", F.lit(0).cast("bigint")
        )
    span = bounds["hi"] - bounds["lo"] + 1
    width = max(1, -(-span // n_buckets))  # ceil(span / B)
    b = df.withColumn(
        "__bucket",
        F.expr(
            f"(CAST(`{id_col}` AS BIGINT) - {bounds['lo']}L) div {width}L"
        ).cast("int"),
    )

    totals = b.groupBy("__bucket").agg(
        F.sum(n_tokens_col).cast("bigint").alias("__tot")
    )
    w_tot = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "__prefix", F.coalesce(F.sum("__tot").over(w_tot), F.lit(0)).cast("bigint")
    ).select("__bucket", "__prefix")

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_excl = F.coalesce(
        F.sum(F.col(n_tokens_col).cast("bigint")).over(w_in), F.lit(0)
    )
    return (
        b.join(F.broadcast(prefix), "__bucket")
        .withColumn("__before", (local_excl + F.col("__prefix")).cast("bigint"))
        .withColumn(
            "window_id", F.expr(f"__before div {int(window_tokens)}L").cast("bigint")
        )
        .withColumn("offset", (F.col("__before") % window_tokens).cast("bigint"))
        .drop("__bucket", "__prefix", "__before")
    )


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global 1-based rank by ``(key_col, id_col)`` — the
    scale-safe replacement for ``row_number() OVER (ORDER BY ...)``,
    whose empty-partitionBy window serializes the whole input through
    ONE task.  Same two-level decomposition as ``pack_sequences``, but
    bucketed on the SORT KEY's value range instead of the id: rows with
    equal keys always land in the same bucket, so the (key, id)
    tie-break inside each bucket is globally consistent.  One tiny
    min/max job fixes the bucket width, per-bucket counts (B rows)
    window into an exclusive prefix and broadcast back, and the single
    full-data exchange is the within-bucket rank window.  Deterministic
    under any partitioning/retry; 64-bit exact.  ``key_col`` must be
    integral; value skew only unbalances buckets (raise
    ``num_partitions``), never changes results.

    Output: input columns ++ ``out_col``.
    """
    spark = df.sparkSession
    n_buckets = num_partitions or spark.sparkContext.defaultParallelism
    bounds = df.agg(
        F.min(F.col(key_col).cast("bigint")).alias("lo"),
        F.max(F.col(key_col).cast("bigint")).alias("hi"),
    ).first()
    if bounds["lo"] is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    span = bounds["hi"] - bounds["lo"] + 1
    width = max(1, -(-span // n_buckets))
    b = df.withColumn(
        "__bucket",
        F.expr(
            f"(CAST(`{key_col}` AS BIGINT) - {bounds['lo']}L) div {width}L"
        ).cast("int"),
    )
    totals = b.groupBy("__bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    w_tot = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.withColumn(
        "__prefix",
        F.coalesce(F.sum("__n").over(w_tot), F.lit(0)).cast("bigint"),
    ).select("__bucket", "__prefix")
    w_in = Window.partitionBy("__bucket").orderBy(key_col, id_col)
    return (
        b.join(F.broadcast(prefix), "__bucket")
        .withColumn(
            out_col,
            (F.row_number().over(w_in) + F.col("__prefix")).cast("bigint"),
        )
        .drop("__bucket", "__prefix")
    )
