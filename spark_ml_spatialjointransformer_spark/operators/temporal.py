"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

Both are expressed as compositions of existing DataFrame ops (the brief's
tier (a) for custom operators) — no Python in the hot path, fully
whole-stage-codegen plans:

- ``asof_join`` runs the classic union-merge formulation: tag both sides,
  union, ONE window shuffle on the join keys ordered by time, and a
  ``last(..., ignorenulls=True)`` carries the most recent right-side row
  forward onto each left row.  No join node at all — the naive
  formulation (inequality join + per-left-row argmax) explodes to
  |left|·|right-per-key| intermediate rows, while this shuffles each row
  exactly once.
- ``range_join`` equi-joins on (keys, time-bucket): the range side
  explodes into the fixed-width buckets its interval covers, the point
  side computes its single bucket, and the exact interval predicate
  filters after the hash join.  Each matching pair meets in EXACTLY one
  bucket (the point's), so no post-join dedup is needed.  This turns the
  O(n·m) inequality join into a shuffle-bounded hash join whose fanout is
  ``1 + range_len / bucket_width`` per range row.

At 100 TB: both shuffle only on the join keys (+ bucket), state per task
is one sort run — skew follows hot keys, the usual salting/AQE answers
apply.  The window in ``asof_join`` is running (rowsBetween preceding),
never whole-partition-buffered.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[tuple[str, str]],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``right_time`` <= ``left_time`` (direction='backward'; 'forward' takes
    the smallest >=) within the same ``on`` key group — the standard
    as-of/point-in-time join (reference engines ship it natively; Spark
    composes it from union + window).

    ``right`` must be unique per (keys, right_time) — pre-aggregate or
    window-dedupe first, otherwise which duplicate wins is undefined (and
    engines will disagree).  Equal timestamps match (inclusive): the union
    sort key is (time, side-tag) with the right side first.

    Left rows with no match keep nulls for all ``right_cols`` (left-join
    semantics).

    Output: all left columns ++ right_cols aliased per the (src, alias)
    pairs.
    """
    keys = list(on)
    rv = F.struct(*[F.col(c).alias(a) for c, a in right_cols])
    rv_t = right.select(rv.alias("__rv")).schema[0].dataType
    pay_cols = [c for c in left.columns]
    pay = F.struct(*[F.col(c) for c in pay_cols])
    pay_t = left.select(pay.alias("__pay")).schema[0].dataType

    l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        pay.alias("__pay"),
        F.lit(None).cast(rv_t).alias("__rv"),
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(pay_t).alias("__pay"),
        rv.alias("__rv"),
    )
    tcol: Column = F.col("__t") if direction == "backward" else F.col("__t").desc()
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(tcol, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l.unionByName(r)
        .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .where(F.col("__tag") == 1)
        .select(F.col("__pay.*"), F.col("__m.*"))
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Inner-join left points into right intervals: rows pair when the
    ``on`` keys match and ``lo_col <= point_col < hi_col`` (``<=`` with
    ``hi_inclusive``).

    ``bucket_width`` should be on the order of the typical interval
    length: the range side fans out into ``(hi-lo)/width + 1`` bucket
    rows, the point side into exactly one, and the equi-join on
    (keys, bucket) replaces the unbounded inequality join.  All three
    bound columns must be numeric (epoch seconds/micros for timestamps).

    Output: all left columns ++ all right columns (names must not
    collide apart from the join keys).
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("range_join: bucket_width must be positive")
    r = right.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("bigint"),
                F.floor(F.col(hi_col) / w).cast("bigint"),
            )
        ),
    )
    l = left.withColumn("__bk", F.floor(F.col(point_col) / w).cast("bigint"))
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if hi_inclusive
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        l.join(r, on=list(on) + ["__bk"])
        .where((F.col(point_col) >= F.col(lo_col)) & hi_ok)
        .drop("__bk")
    )
