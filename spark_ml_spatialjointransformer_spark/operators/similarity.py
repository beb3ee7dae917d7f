"""Similarity search over embedding columns.

Two tiers:

- **exact brute-force top-k** (queries.py v1): cross join against a
  broadcast query set, JVM-side dot products (`zip_with` + `aggregate`) —
  the correctness baseline; O(N·Q·d).
- **sign-random-projection LSH** (`srp_bucket_col` / `lsh_neardup_pairs` /
  `lsh_topk`): each vector hashes to a small bucket id from the signs of
  `n_planes` fixed pseudo-random hyperplane dot products; candidates share
  a bucket; exact cosine refine.  The shuffle key is the bucket int —
  bytes per vector — so the pattern survives 100TB fan-in; recall is
  tunable via n_planes / multi-probe (band rotations).

Hyperplane coefficients come from a deterministic LCG (`srp_planes`) so
tests reproduce buckets bit-for-bit in numpy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1) via a 64-bit LCG
    (Knuth MMIX constants) — shared with the numpy test oracle."""
    state = 0x9E3779B97F4A7C15
    out = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        out.append(row)
    return out


def dot_col(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def srp_bucket_col(emb: Column, n_planes: int, dim: int) -> Column:
    """Sign-random-projection bucket id (int in [0, 2^n_planes))."""
    planes = srp_planes(n_planes, dim)
    bits = [
        F.when(
            dot_col(emb, F.array(*[F.lit(c) for c in plane])) > 0.0,
            F.lit(1 << i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def _normed(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
    emb = F.col(emb_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("__id"),
        emb.alias("__emb"),
        F.sqrt(dot_col(emb, emb)).alias("__norm"),
    ).where(F.col("__norm") > 0.0)


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding near-duplicate pairs: same SRP bucket + exact cosine ≥
    threshold.  Output (id_a, id_b, cos_e6).  Approximate: pairs split by a
    hyperplane are missed — raise recall by lowering n_planes or unioning
    rotated bands; precision is exact (refined)."""
    base = _normed(df, id_col, emb_col).withColumn(
        "__bucket", srp_bucket_col(F.col("__emb"), n_planes, dim)
    )
    a, b = base.alias("a"), base.alias("b")
    cos = dot_col(F.col("a.__emb"), F.col("b.__emb")) / (
        F.col("a.__norm") * F.col("b.__norm")
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cos * 1_000_000).cast("bigint").alias("cos_e6"),
        )
        .where(F.col("cos_e6") >= int(threshold * 1_000_000))
    )


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    q_id_col: str,
    q_emb_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of df rows for each (broadcast) query vector.
    Output (q_id, id, cos_e6) — the evaluation baseline for the LSH tier."""
    from pyspark.sql.window import Window

    base = _normed(df, id_col, emb_col)
    q = _normed(queries, q_id_col, q_emb_col).select(
        F.col("__id").alias("__qid"),
        F.col("__emb").alias("__qemb"),
        F.col("__norm").alias("__qnorm"),
    )
    sim = dot_col(F.col("__emb"), F.col("__qemb")) / (F.col("__norm") * F.col("__qnorm"))
    w = Window.partitionBy("__qid").orderBy(F.col("__sim").desc(), F.col("__id"))
    return (
        base.crossJoin(F.broadcast(q))
        .where(F.col("__id") != F.col("__qid"))
        .withColumn("__sim", sim)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__qid").alias("q_id"),
            F.col("__id").alias("id"),
            F.round(F.col("__sim") * 1_000_000).cast("bigint").alias("cos_e6"),
        )
    )
