"""Backend-portability shims shared by the iterative/multi-reader operators.

The engine truncates plan lineage wherever (a) an iterative loop would
otherwise grow the logical plan each round (graph algorithms, kNN radius
expansion, Hash-Min closure) or (b) one expensive sub-plan (an LSH
signature UDF, a parsed-feature pass) is referenced by several downstream
readers and must compute once.  On classic Spark the cheapest barrier is
``DataFrame.localCheckpoint`` — executor-local block storage, no lineage.
Spark Connect sessions (and any backend where the call is unsupported)
raise instead; these wrappers fall back to ``persist()``, which has the
same compute-once / lineage-cut effect through the block manager at the
cost of keeping the lineage object graph alive.

Used via ``df.transform(barrier)`` so operator code keeps its fluent
chains; ``barrier_eager`` additionally forces materialization (count) the
way ``localCheckpoint(eager=True)`` does — iterative algorithms use it to
pin a round's state before unpersisting the previous round's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def barrier(df: DataFrame) -> DataFrame:
    """Lazy lineage barrier: ``localCheckpoint(eager=False)`` with a
    Connect-safe ``persist()`` fallback."""
    try:
        return df.localCheckpoint(eager=False)
    except Exception:
        return df.persist()


def barrier_eager(df: DataFrame) -> DataFrame:
    """Eager lineage barrier: ``localCheckpoint(eager=True)`` with a
    Connect-safe ``persist() + count()`` fallback."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:
        out = df.persist()
        out.count()
        return out
