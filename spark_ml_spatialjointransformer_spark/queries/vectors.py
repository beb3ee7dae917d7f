"""Query registry, vectors family — split from the single-module registry (r11);
see ``queries/_core.py`` for the registration machinery and shared helpers."""

from __future__ import annotations

from spark_ml_spatialjointransformer_spark.queries._core import (
    DataFrame,
    F,
    QUERIES,
    SparkSession,
    _EMB_DIM,
    _register,
    _v2_oracle,
    h60_col,
    h60_sql,
    load_table,
)



@_register("v2_lsh_neardup", _v2_oracle())
def v2_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via quantized sign-random-projection
    LSH + exact cosine refine ≥ 0.3 — integer bucket math makes the whole
    pipeline DuckDB-reproducible (also numpy-verified in tests/test_dedup.py).
    The scale path for v1's brute force."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )


_V3_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nm FROM u GROUP BY vec_id),
q AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 500 = 0),
d AS (SELECT q.q_vec_id, u.vec_id, sum(u.v * q.v) AS dot
      FROM u JOIN q ON u.i = q.i GROUP BY q.q_vec_id, u.vec_id),
c AS (SELECT d.q_vec_id, d.vec_id, d.dot / (nq.nm * nv.nm) AS sim
      FROM d
      JOIN nrm nq ON nq.vec_id = d.q_vec_id
      JOIN nrm nv ON nv.vec_id = d.vec_id
      WHERE d.vec_id != d.q_vec_id AND nq.nm > 0 AND nv.nm > 0),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY sim DESC, vec_id) AS rn
      FROM c)
SELECT q_vec_id AS q_id, vec_id AS id, CAST(round(sim * 1000000) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 10
"""


@_register("v3_ivf_topk", _V3_ORACLE)
def v3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 over 16 spherical-kmeans cells with ALL cells probed —
    the standard IVF exactness property (n_probe = n_centroids ⇒ the probed
    union is the whole corpus), so the full machinery (driver k-means, cell
    assignment, inverted-list join, in-cell exact ranking) must reproduce
    the brute-force oracle hash-for-hash.  The approximate path (n_probe=4)
    is covered by the recall assertion in tests/test_fingerprint_ivf.py."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 500 == 0)
    return ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=10, n_centroids=16, n_probe=16,
    )


@_register(
    "v1_cosine_topk",
    """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM u GROUP BY vec_id),
q AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 500 = 0),
d AS (SELECT q.q_vec_id, u.vec_id, sum(u.v * q.v) AS dot
      FROM u JOIN q ON u.i = q.i GROUP BY q.q_vec_id, u.vec_id),
c AS (SELECT d.q_vec_id, d.vec_id,
             d.dot / sqrt(nq.nn * nv.nn) AS sim
      FROM d
      JOIN nrm nq ON nq.vec_id = d.q_vec_id
      JOIN nrm nv ON nv.vec_id = d.vec_id
      WHERE d.vec_id != d.q_vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY sim DESC, vec_id) AS rn
      FROM c)
SELECT q_vec_id, vec_id AS neighbor_id, CAST(round(sim * 1000000) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 10
""",
)
def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (every 500th vec_id) —
    the exact-ANN baseline.  Dot products stay JVM-side (zip_with +
    aggregate over array<double>); the query side is broadcast."""
    from pyspark.sql.window import Window

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    norms = emb.select("vec_id", dot(F.col("emb"), F.col("emb")).alias("nn"))
    embn = emb.join(norms, "vec_id")
    q = (
        embn.filter(F.col("vec_id") % 500 == 0)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("emb").alias("qemb"),
            F.col("nn").alias("qnn"),
        )
    )
    sims = (
        embn.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            (dot(F.col("emb"), F.col("qemb")) / F.sqrt(F.col("qnn") * F.col("nn"))).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "q_vec_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("sim") * 1000000).cast("bigint").alias("cos_e6"),
        )
    )


_V4_ORACLE = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) - 1 AS i FROM e),
nrm0 AS (SELECT vec_id, sqrt(sum(v * v)) AS nm FROM u GROUP BY vec_id),
q AS (SELECT u.vec_id, u.i, CAST(floor(u.v * 100000.0 + 0.5) AS BIGINT) AS qv
      FROM u JOIN nrm0 ON nrm0.vec_id = u.vec_id WHERE nrm0.nm > 0),
qn AS (SELECT vec_id, sum(qv * qv) AS qn2 FROM q GROUP BY vec_id HAVING sum(qv * qv) > 0),
p AS (SELECT j, i, ((j * 73856093 + i * 19349663 + 83492791) % 2039) % 17 - 8 AS pv
      FROM range(12) t1(j) CROSS JOIN range(64) t2(i)),
d AS (SELECT q.vec_id, p.j, sum(q.qv * p.pv) AS dot
      FROM q JOIN qn USING (vec_id) JOIN p ON p.i = q.i GROUP BY q.vec_id, p.j),
b AS (SELECT vec_id,
       sum(CASE WHEN j >= 0 AND j < 6 AND dot > 0
           THEN CAST(1 AS BIGINT) << (j - 0) ELSE 0 END) AS k0,
       sum(CASE WHEN j >= 6 AND j < 12 AND dot > 0
           THEN CAST(1 AS BIGINT) << (j - 6) ELSE 0 END) AS k1
      FROM d GROUP BY vec_id),
cand AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         FROM b x JOIN b y ON x.vec_id < y.vec_id
         WHERE x.k0 = y.k0 OR x.k1 = y.k1),
dp AS (SELECT c.id_a, c.id_b, sum(qa.qv * qb.qv) AS dot
       FROM cand c
       JOIN q qa ON qa.vec_id = c.id_a
       JOIN q qb ON qb.vec_id = c.id_b AND qb.i = qa.i
       GROUP BY c.id_a, c.id_b),
pairs AS (
  SELECT dp.id_a, dp.id_b
  FROM dp
  JOIN qn na ON na.vec_id = dp.id_a
  JOIN qn nb ON nb.vec_id = dp.id_b
  WHERE CAST(round(CAST(dp.dot AS DOUBLE)
                   / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE)))
                   * 1000000) AS BIGINT) >= 900000
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach(v, u2) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.v, eg.b FROM reach r JOIN edges eg ON eg.a = r.u2
),
k AS (SELECT v AS vec_id, min(u2) AS keeper FROM reach GROUP BY v)
SELECT em.vec_id, k.keeper, k.keeper != em.vec_id AS is_dup
FROM embeddings em JOIN k USING (vec_id)
"""


@_register("v4_embedding_dedup", _V4_ORACLE)
def v4_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup end-to-end: quantized SRP-LSH candidate pairs
    at cosine ≥ 0.9 → transitive-closure keeper assignment over the vector
    ids — the multimodal twin of the text dedup pipeline (t5 → t11),
    composed from v2's LSH and t11's label propagation."""
    from spark_ml_spatialjointransformer_spark.operators.dedup import (
        dedup_connected_components,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.9,
        n_planes=6, bands=2, quantized=True,
    )
    return dedup_connected_components(
        pairs.select("id_a", "id_b"), emb.select("vec_id"), "vec_id"
    )


_V5_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) - 1 AS i FROM e),
nrm0 AS (SELECT vec_id, sqrt(sum(v * v)) AS nm FROM u GROUP BY vec_id),
q AS (SELECT u.vec_id, u.i, CAST(floor(u.v * 100000.0 + 0.5) AS BIGINT) AS qv
      FROM u JOIN nrm0 ON nrm0.vec_id = u.vec_id WHERE nrm0.nm > 0),
qn AS (SELECT vec_id, sum(qv * qv) AS qn2 FROM q GROUP BY vec_id HAVING sum(qv * qv) > 0),
p AS (SELECT j, i, ((j * 73856093 + i * 19349663 + 83492791) % 2039) % 17 - 8 AS pv
      FROM range(12) t1(j) CROSS JOIN range(64) t2(i)),
d AS (SELECT q.vec_id, p.j, sum(q.qv * p.pv) AS dot
      FROM q JOIN qn USING (vec_id) JOIN p ON p.i = q.i GROUP BY q.vec_id, p.j),
b AS (SELECT vec_id,
       sum(CASE WHEN j >= 0 AND j < 6 AND dot > 0
           THEN CAST(1 AS BIGINT) << (j - 0) ELSE 0 END) AS k0,
       sum(CASE WHEN j >= 6 AND j < 12 AND dot > 0
           THEN CAST(1 AS BIGINT) << (j - 6) ELSE 0 END) AS k1
      FROM d GROUP BY vec_id),
cand AS (SELECT qb.vec_id AS q_id, xb.vec_id AS id
         FROM b qb JOIN b xb
           ON xb.vec_id != qb.vec_id AND (xb.k0 = qb.k0 OR xb.k1 = qb.k1)
         WHERE qb.vec_id % 500 = 0),
dp AS (SELECT c.q_id, c.id, sum(qa.qv * qb2.qv) AS dot
       FROM cand c
       JOIN q qa ON qa.vec_id = c.id
       JOIN q qb2 ON qb2.vec_id = c.q_id AND qb2.i = qa.i
       GROUP BY c.q_id, c.id),
cosv AS (SELECT dp.q_id, dp.id,
                CAST(dp.dot AS DOUBLE)
                / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE))) AS cos
         FROM dp
         JOIN qn na ON na.vec_id = dp.id
         JOIN qn nb ON nb.vec_id = dp.q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, id) AS rn
      FROM cosv)
SELECT q_id, id, CAST(round(cos * 1000000) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 10
"""


@_register("v5_lsh_topk", _V5_ORACLE)
def v5_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 — the third ANN tier beside v1
    (brute force) and v3 (IVF): candidates share any quantized-SRP band
    bucket with the query, ranked by the exact integer-dot cosine.  The
    whole pipeline is BIGINT arithmetic + per-side sqrts, so the DuckDB
    oracle reproduces the candidate set AND the ranking bit-for-bit."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 500 == 0)
    return lsh_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        dim=_EMB_DIM, k=10, n_planes=6, bands=2,
    )


_V6_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
q AS (SELECT vec_id, i, CAST(floor(v * 100000.0 + 0.5) AS BIGINT) AS qv FROM u),
qn AS (SELECT vec_id, sum(qv * qv) AS qn2 FROM q GROUP BY vec_id
       HAVING sum(qv * qv) > 0),
d AS (SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.qv * b.qv) AS dot
      FROM q a JOIN q b ON a.i = b.i AND a.vec_id != b.vec_id
      WHERE a.vec_id IN (SELECT vec_id FROM qn)
        AND b.vec_id IN (SELECT vec_id FROM qn)
      GROUP BY a.vec_id, b.vec_id),
c AS (SELECT d.ia, d.ib,
             d.dot / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE)))
               AS sim
      FROM d JOIN qn na ON na.vec_id = d.ia JOIN qn nb ON nb.vec_id = d.ib),
r AS (SELECT *, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
      FROM c)
SELECT ia AS vec_id, ib AS neighbor_id,
       CAST(floor(sim * 1000000e0 + 0.5e0) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 5
"""


@_register("v6_knn_join", _V6_ORACLE)
def v6_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact cosine kNN self-join (top-5 neighbors for EVERY
    vector) — the neighbor-graph / hard-negative-mining operator.  Blocked
    int64 matmul per Arrow batch against the broadcast quantized corpus;
    quantized dots are exact integers, so the Spark kernel and the DuckDB
    SQL agree bit-for-bit (see operators/similarity.knn_join_exact)."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        knn_join_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_exact(emb, "vec_id", "embedding", k=5)


def _v9_oracle(k: int = 8, iters: int = 2) -> str:
    """Unrolled Lloyd's k-means: each round is one assignment CTE
    (row_number argmin of the exact integer squared L2, centroid-id
    tie-break — identical to Spark's min-struct) plus one centroid-mean
    CTE (``sum // count`` over the non-negative shifted components)."""
    rounds = []
    prev_c = "c0"
    for i in range(1, iters + 1):
        rounds.append(
            f"""a{i} AS (SELECT q.vec_id, {prev_c}.cid,
              sum((q.qv - {prev_c}.cv) * (q.qv - {prev_c}.cv)) AS d2
       FROM q JOIN {prev_c} ON q.i = {prev_c}.i
       GROUP BY q.vec_id, {prev_c}.cid),
s{i} AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM a{i}),
m{i} AS (SELECT vec_id, cid FROM s{i} WHERE rn = 1),
c{i} AS (SELECT m{i}.cid, q.i, CAST(sum(q.qv) // count(*) AS BIGINT) AS cv
        FROM q JOIN m{i} USING (vec_id) GROUP BY m{i}.cid, q.i)"""
        )
        prev_c = f"c{i}"
    chain = ",\n".join(rounds)
    n = iters + 1
    return f"""
WITH e AS (SELECT vec_id,
                  generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS i,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
q AS (SELECT vec_id, i,
             CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT) + 100000 AS qv
      FROM e),
c0 AS (SELECT vec_id AS cid, i, qv AS cv FROM q
       WHERE vec_id IN (SELECT vec_id FROM embeddings
                        ORDER BY vec_id LIMIT {k})),
{chain},
a{n} AS (SELECT q.vec_id, {prev_c}.cid,
              sum((q.qv - {prev_c}.cv) * (q.qv - {prev_c}.cv)) AS d2
       FROM q JOIN {prev_c} ON q.i = {prev_c}.i
       GROUP BY q.vec_id, {prev_c}.cid),
s{n} AS (SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM a{n})
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, CAST(d2 AS BIGINT) AS d2
FROM s{n} WHERE rn = 1
"""


@_register("v9_kmeans", _v9_oracle())
def v9_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus — the
    iterative-ML flagship: two (assign, update) rounds then a final
    assignment, ALL integer (quantize + shift keeps every component
    non-negative so the centroid mean's truncating div matches the
    oracle's floor), checked bit-for-bit against an unrolled CTE replay.
    This is the e-step/m-step plan every distributed k-means uses: the
    k×dim centroid table broadcasts into a codegen cross join (no
    Python anywhere), assignment reduces via the partially-aggregatable
    min-struct, and the update shuffles (cluster, dim)-keyed int64
    components.  See ``operators/similarity.py:kmeans_int``."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        kmeans_int,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_int(emb, "vec_id", "embedding", dim=_EMB_DIM, k=8, iters=2)


#: v7 sub-vector layout: 64-dim embeddings split into 4 contiguous
#: sub-vectors of 16 — the multi-vector ("late interaction") document
#: representation; components quantize to int64 at 1e5 so every dot
#: product and max is integer-exact across engines.
_V7_ORACLE = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
z AS (SELECT vec_id, (i - 1) // 16 AS s, (i - 1) % 16 AS j,
             CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT) AS q
      FROM e),
qq AS (SELECT * FROM z WHERE vec_id % 100 = 0),
d AS (SELECT qq.vec_id AS qid, c.vec_id AS cid, qq.s AS qa, c.s AS cb,
             sum(qq.q * c.q) AS dot
      FROM qq JOIN z c ON qq.j = c.j AND c.vec_id <> qq.vec_id
      GROUP BY 1, 2, 3, 4),
m AS (SELECT qid, cid, qa, max(dot) AS mx FROM d GROUP BY 1, 2, 3),
s AS (SELECT qid, cid, sum(mx) AS maxsim FROM m GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY maxsim DESC, cid) AS rn
      FROM s)
SELECT qid AS q_vec_id, cid AS neighbor_id, CAST(maxsim AS BIGINT) AS maxsim
FROM r WHERE rn <= 5
"""


@_register("v7_maxsim_topk", _V7_ORACLE)
def v7_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (ColBERT-style MaxSim):
    each embedding is a BAG of 4 sub-vectors; the query–document score is
    Σ over query sub-vectors of the max dot product against any document
    sub-vector, and the top-5 documents per query win.  Components
    quantize to int64 before any arithmetic, so scores are integer-exact.
    Scale shape: the query set broadcasts (queries ≪ corpus by
    construction, like v1/v6) as a [Nq, 4, 16] int64 tensor; each Arrow
    batch of the corpus runs 16 blocked integer matmuls and emits only
    its local top-k per query (~40× faster than the JVM zip_with
    formulation at 5× scale — per-dot array allocation dominates there);
    one tiny window over Nq·k·n_batches rows finishes the global top-k.
    See ``operators/similarity.py:maxsim_topk``."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        maxsim_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return maxsim_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", k=5, n_sub=4
    )


#: v8 PQ geometry: 4 sub-spaces × 16 codewords × 16 dims; codewords from
#: the closed-form LCG family (±8, lifted ×12500 to the ±1e5 quantized
#: embedding scale) so both engines derive the identical codebook.
_V8_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i, unnest(emb) AS v
      FROM e),
z AS (SELECT vec_id, i // 16 AS a, i % 16 AS j,
             CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT) AS qv
      FROM u),
cb AS (SELECT a, c, j,
              ((((a * 73856093 + c * 19349663 + j * 83492791 + 7) % 2039)
                % 17) - 8) * 12500 AS w
       FROM range(4) t1(a) CROSS JOIN range(16) t2(c)
            CROSS JOIN range(16) t3(j)),
dist AS (SELECT z.vec_id, z.a, cb.c,
                sum((z.qv - cb.w) * (z.qv - cb.w)) AS d2
         FROM z JOIN cb ON cb.a = z.a AND cb.j = z.j
         GROUP BY 1, 2, 3),
code AS (SELECT vec_id, a, c FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, a
                                        ORDER BY d2, c) AS rn
           FROM dist) x
         WHERE rn = 1),
qq AS (SELECT vec_id AS qid, a, j, qv FROM z WHERE vec_id % 100 = 0),
lut AS (SELECT qq.qid, cb.a, cb.c, sum(qq.qv * cb.w) AS dot
        FROM qq JOIN cb ON cb.a = qq.a AND cb.j = qq.j
        GROUP BY 1, 2, 3),
adc AS (SELECT l.qid, code.vec_id, sum(l.dot) AS score
        FROM code JOIN lut l ON l.a = code.a AND l.c = code.c
        WHERE code.vec_id <> l.qid
        GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, vec_id) AS rn
      FROM adc)
SELECT qid AS q_vec_id, vec_id AS neighbor_id, CAST(score AS BIGINT) AS adc_score
FROM r WHERE rn <= 10
"""


@_register("v8_pq_adc_topk", _V8_ORACLE)
def v8_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization retrieval with asymmetric distance computation:
    every corpus vector compresses to 4 codeword bytes (16× over float32)
    and query scoring is pure table lookup — Σ over sub-spaces of the
    query's precomputed dot against the assigned codeword.  The codebook
    is the closed-form integer family (production trains it k-means-style
    on a sample, like v3's centroids — assignment/ADC machinery is
    identical), so scores are engine-exact int64 end-to-end: the argmin
    tie rule (first minimum = lowest codeword index) matches numpy's
    argmin and the oracle's ``ORDER BY d2, c`` rank.  Scale shape: one
    corpus scan assigns codes and LUT-scores in the same pass; at 100 TB
    the 4-byte codes materialize once and every later query scans codes
    only, broadcasting just its n_sub×n_codes LUT.  See
    ``operators/similarity.py:pq_adc_topk``."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        pq_adc_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_adc_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", k=10
    )


#: v10 SQ8 retrieval: candidates per query from the int8 tier before the
#: exact re-rank, and final k.  All arithmetic integer: embeddings
#: quantize to e5 ints, per-dim [mn, mx] comes from a corpus agg, codes
#: are (qv-mn)·255 div (mx-mn), dequant mn + code·(mx-mn) div 255 — both
#: divisions on non-negative operands so div == // in both engines.
_V10_CAND = 40
_V10_K = 10

_V10_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i,
             CAST(floor(unnest(emb) * 100000e0 + 0.5e0) AS BIGINT) AS qv
      FROM e),
st AS (SELECT i, min(qv) AS mn, max(qv) AS mx FROM u GROUP BY i),
c AS (SELECT u.vec_id, u.i,
             st.mn + (((u.qv - st.mn) * 255 // greatest(1, st.mx - st.mn))
                      * (st.mx - st.mn)) // 255 AS deq
      FROM u JOIN st USING (i)),
q AS (SELECT vec_id AS qid, i, qv FROM u WHERE vec_id % 100 = 0),
approx AS (SELECT q.qid, c.vec_id, sum(q.qv * c.deq) AS a_score
           FROM q JOIN c ON c.i = q.i AND c.vec_id <> q.qid
           GROUP BY 1, 2),
cand AS (SELECT qid, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY a_score DESC, vec_id) AS rn
           FROM approx) x
         WHERE rn <= {_V10_CAND}),
exact AS (SELECT cand.qid, cand.vec_id, sum(q.qv * u.qv) AS score
          FROM cand JOIN u ON u.vec_id = cand.vec_id
                    JOIN q ON q.qid = cand.qid AND q.i = u.i
          GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, vec_id) AS rn
      FROM exact)
SELECT qid AS q_vec_id, vec_id AS neighbor_id, CAST(score AS BIGINT) AS dot_e10
FROM r WHERE rn <= {_V10_K}
"""


@_register("v10_sq8_rerank", _V10_ORACLE)
def v10_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier retrieval with int8 SCALAR quantization: corpus vectors
    compress 4× to per-dimension uint8 codes (the other classic ANN
    compression beside v8's product quantization — per-dim min/max
    affine, no codebook to train), queries score the DEQUANTIZED codes
    asymmetrically to pick 40 candidates, and only those join
    back to full-precision vectors for the exact top-10 re-rank —
    the standard recall-repair step every compressed index ships with.
    Everything is JVM arrays: per-dim stats are one 64-row agg broadcast
    back as two 1-row arrays, codes/dequant/dots are zip_with+aggregate
    folds, and the re-rank joins the candidate (qid, vec_id) pairs — not
    scores-for-everything — against the corpus.  At 100 TB the int8
    tier is the only full scan; exact vectors page in for
    queries×40 rows."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " v -> CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT))"
        ).alias("qv"),
    )
    dims = emb.select(
        F.posexplode("qv").alias("i", "v")
    )
    st = (
        dims.groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .groupBy()
        .agg(
            F.expr("array_sort(collect_list(struct(i, mn, mx)))").alias("st")
        )
        .select(
            F.expr("transform(st, s -> s.mn)").alias("mns"),
            F.expr("transform(st, s -> s.mx)").alias("mxs"),
        )
    )
    deq = (
        emb.crossJoin(F.broadcast(st))
        .select(
            "vec_id",
            F.expr(
                "transform(qv, (v, i) -> element_at(mns, i + 1)"
                " + (((v - element_at(mns, i + 1)) * 255"
                "     div greatest(1, element_at(mxs, i + 1)"
                "                     - element_at(mns, i + 1)))"
                "    * (element_at(mxs, i + 1) - element_at(mns, i + 1)))"
                " div 255)"
            ).alias("deq"),
        )
    )
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("q_qv")
    )
    from pyspark.sql import Window

    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (s, t) -> s + t)"
    approx = (
        deq.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(dot.format(a="q_qv", b="deq")).alias("a_score"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("a_score").desc(), F.col("vec_id")
    )
    cand = (
        approx.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _V10_CAND)
        .select("qid", "vec_id")
    )
    exact = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vec_id",
            F.expr(dot.format(a="q_qv", b="qv")).alias("score"),
        )
    )
    we = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        exact.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") <= _V10_K)
        .select(
            F.col("qid").alias("q_vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("score").cast("bigint").alias("dot_e10"),
        )
    )


#: v11 composes the two tiers' own oracles — the exact baseline and the
#: LSH approximation are both already SQL-replayable, so their recall is
#: too.  Scoring reuses the registered oracle strings verbatim.
_V11_ORACLE = f"""
WITH ex AS (SELECT q_vec_id AS q_id, neighbor_id AS id
            FROM ({QUERIES['v1_cosine_topk'].oracle})),
ap AS (SELECT q_id, id FROM ({_V5_ORACLE})),
h AS (SELECT ex.q_id, count(*) AS n_exact, count(ap.id) AS n_hit
      FROM ex LEFT JOIN ap ON ap.q_id = ex.q_id AND ap.id = ex.id
      GROUP BY ex.q_id)
SELECT q_id, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_hit * 10000 // n_exact AS BIGINT) AS recall_e4
FROM h
"""


@_register("v11_lsh_recall", _V11_ORACLE)
def v11_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH tier against the exact baseline — the
    evaluation harness every approximate index needs before it replaces
    a brute-force scan: per query, how many of the TRUE top-10 (v1's
    plan) did the banded-SRP candidate generation (v5's plan) actually
    surface?  Both tiers run as their registered plans and the overlap
    is one left join + count — so this query IS the tuning loop for
    n_planes/bands, with an oracle composed of the two tiers' own
    replays.  Scale shape: both inputs are queries×10 rows; the join
    adds nothing to either tier's cost."""
    ex = v1_cosine_topk(spark, sf_dir).select(
        F.col("q_vec_id").alias("q_id"), F.col("neighbor_id").alias("id")
    )
    ap = v5_lsh_topk(spark, sf_dir).select(
        F.col("q_id").alias("a_qid"), F.col("id").alias("a_id")
    )
    return (
        ex.join(
            ap,
            (F.col("q_id") == F.col("a_qid")) & (F.col("id") == F.col("a_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("a_id").alias("n_hit"),
        )
        .select(
            "q_id",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.expr("CAST(n_hit * 10000 div n_exact AS BIGINT)").alias(
                "recall_e4"
            ),
        )
    )


_V13_CAND = 40
_V13_K = 10
_V13_PREFIX = 16

_V13_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i,
             CAST(floor(unnest(emb) * 100000e0 + 0.5e0) AS BIGINT) AS qv
      FROM e),
q AS (SELECT vec_id AS qid, i, qv FROM u WHERE vec_id % 100 = 0),
approx AS (SELECT q.qid, u.vec_id, sum(q.qv * u.qv) AS a_score
           FROM q JOIN u ON u.i = q.i AND u.vec_id <> q.qid
           WHERE q.i < {_V13_PREFIX}
           GROUP BY 1, 2),
cand AS (SELECT qid, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY a_score DESC, vec_id) AS rn
           FROM approx) x
         WHERE rn <= {_V13_CAND}),
exact AS (SELECT cand.qid, cand.vec_id, sum(q.qv * u.qv) AS score
          FROM cand JOIN u ON u.vec_id = cand.vec_id
                    JOIN q ON q.qid = cand.qid AND q.i = u.i
          GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, vec_id) AS rn
      FROM exact)
SELECT qid AS q_vec_id, vec_id AS neighbor_id, CAST(score AS BIGINT) AS dot_e10
FROM r WHERE rn <= {_V13_K}
"""


@_register("v13_matryoshka_rerank", _V13_ORACLE)
def v13_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) prefix retrieval: the candidate tier scores only
    the FIRST 16 of 64 dimensions — the nested-representation trick
    where a prefix of the embedding is itself a usable embedding — then
    the 40 survivors re-rank against full vectors for the exact top-10.
    Beside v10 (int8 rows) and v8/v12 (codebooks), this is the third
    compression axis: truncate DIMENSIONS, keep precision.  All tiers
    are JVM ``slice``/``zip_with``/``aggregate`` folds over quantized
    int64 components (engine-exact), queries broadcast, and the re-rank
    joins only the queries×40 candidate pairs back to full vectors.  At
    100 TB the prefix tier reads a quarter of the vector bytes — with a
    columnar prefix layout, a quarter of the I/O — and the full-width
    scan happens for candidate rows only."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " v -> CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT))"
        ).alias("qv"),
    )
    pre = emb.select(
        "vec_id", F.expr(f"slice(qv, 1, {_V13_PREFIX})").alias("pv")
    )
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("qv").alias("q_qv"),
        F.expr(f"slice(qv, 1, {_V13_PREFIX})").alias("q_pv"),
    )
    from pyspark.sql import Window

    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (s, t) -> s + t)"
    )
    approx = (
        pre.crossJoin(F.broadcast(q.select("qid", "q_pv")))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(dot.format(a="q_pv", b="pv")).alias("a_score"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("a_score").desc(), F.col("vec_id")
    )
    cand = (
        approx.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _V13_CAND)
        .select("qid", "vec_id")
    )
    exact = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q.select("qid", "q_qv")), "qid")
        .select(
            "qid",
            "vec_id",
            F.expr(dot.format(a="q_qv", b="qv")).alias("score"),
        )
    )
    we = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        exact.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") <= _V13_K)
        .select(
            F.col("qid").alias("q_vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("score").cast("bigint").alias("dot_e10"),
        )
    )


#: v12's oracle replays the WHOLE IVF-PQ pipeline: the v8 closed-form PQ
#: codebook/codes/LUT plus the closed-form coarse centroids, corpus cell
#: assignment, query nprobe-cell selection, and the candidate mask.
_V12_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i, unnest(emb) AS v
      FROM e),
zi AS (SELECT vec_id, i,
              CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT) AS qv
       FROM u),
z AS (SELECT vec_id, i // 16 AS a, i % 16 AS j, qv FROM zi),
cc AS (SELECT cell, i,
              ((((cell * 40503 + i * 69621 + 11) % 2017) % 17) - 8) * 12500
                AS w
       FROM range(8) t1(cell) CROSS JOIN range(64) t2(i)),
d2c AS (SELECT zi.vec_id, cc.cell,
               sum((zi.qv - cc.w) * (zi.qv - cc.w)) AS d2
        FROM zi JOIN cc USING (i) GROUP BY 1, 2),
asg AS (SELECT vec_id, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cell) AS rn
          FROM d2c) x WHERE rn = 1),
probe AS (SELECT vec_id AS qid, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, cell) AS rn
            FROM d2c WHERE vec_id % 100 = 0) x WHERE rn <= 2),
cb AS (SELECT a, c, j,
              ((((a * 73856093 + c * 19349663 + j * 83492791 + 7) % 2039)
                % 17) - 8) * 12500 AS w
       FROM range(4) t1(a) CROSS JOIN range(16) t2(c)
            CROSS JOIN range(16) t3(j)),
dist AS (SELECT z.vec_id, z.a, cb.c,
                sum((z.qv - cb.w) * (z.qv - cb.w)) AS d2
         FROM z JOIN cb ON cb.a = z.a AND cb.j = z.j
         GROUP BY 1, 2, 3),
code AS (SELECT vec_id, a, c FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, a
                                        ORDER BY d2, c) AS rn
           FROM dist) x
         WHERE rn = 1),
qq AS (SELECT vec_id AS qid, a, j, qv FROM z WHERE vec_id % 100 = 0),
lut AS (SELECT qq.qid, cb.a, cb.c, sum(qq.qv * cb.w) AS dot
        FROM qq JOIN cb ON cb.a = qq.a AND cb.j = qq.j
        GROUP BY 1, 2, 3),
adc AS (SELECT l.qid, code.vec_id, sum(l.dot) AS score
        FROM code
        JOIN asg ON asg.vec_id = code.vec_id
        JOIN lut l ON l.a = code.a AND l.c = code.c
        JOIN probe p ON p.qid = l.qid AND p.cell = asg.cell
        WHERE code.vec_id <> l.qid
        GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, vec_id) AS rn
      FROM adc)
SELECT qid AS q_vec_id, vec_id AS neighbor_id, CAST(score AS BIGINT) AS adc_score
FROM r WHERE rn <= 10
"""


@_register("v12_ivfpq_topk", _V12_ORACLE)
def v12_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed IVF-PQ ANN tier (FAISS IndexIVFPQ shape): an 8-cell
    coarse quantizer prunes candidates to each query's 2 nearest cells,
    then v8's PQ-ADC table-lookup scoring runs over the survivors only —
    prune THEN approximate, the architecture every billion-scale vector
    index uses.  Coarse centroids are closed-form integers (production
    trains them, like v3/v8 — the assignment/mask machinery is what's
    exercised), so cells, codes, LUTs, and scores are all engine-exact
    int64 and the oracle replays the full pipeline.  See
    ``operators/similarity.py:ivf_pq_topk`` for the 100 TB shape
    (cell-partitioned inverted lists; the candidate mask here is that
    partition pruning in single-scan form)."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        ivf_pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_pq_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", k=10, nprobe=2
    )


_V14_ORACLE = """
WITH e AS (SELECT vec_id, label,
                  generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS i,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
q AS (SELECT vec_id, label, i,
             CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT) + 100000 AS qv
      FROM e),
c AS (SELECT label, i, CAST(sum(qv) // count(*) AS BIGINT) AS cv,
             count(*) AS n
      FROM q GROUP BY label, i),
d AS (SELECT q.vec_id, q.label,
             CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2
      FROM q JOIN c ON q.label = c.label AND q.i = c.i
      GROUP BY q.vec_id, q.label),
intra AS (SELECT label, count(*) AS n_members,
                 CAST(sum(d2) // count(*) AS BIGINT) AS avg_intra_d2
          FROM d GROUP BY label),
cd AS (SELECT a.label AS la, b.label AS lb,
              CAST(sum((a.cv - b.cv) * (a.cv - b.cv)) AS BIGINT) AS d2
       FROM c a JOIN c b ON a.i = b.i AND a.label <> b.label
       GROUP BY a.label, b.label),
nn AS (SELECT la AS label, lb, d2,
              row_number() OVER (PARTITION BY la ORDER BY d2, lb) AS rn
       FROM cd)
SELECT i.label, i.n_members, i.avg_intra_d2,
       nn.lb AS nn_label, nn.d2 AS nn_d2
FROM intra i JOIN nn ON nn.label = i.label AND nn.rn = 1
"""


@_register("v14_label_centroid_metrics", _V14_ORACLE)
def v14_label_centroid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cluster quality audit: per class label, the member
    count, the mean squared distance to the class centroid (compactness)
    and the nearest OTHER centroid with its distance (separation) — the
    integer-exact core of a silhouette-style label-quality report, the
    signal that flags mislabeled or collapsed classes before training.
    Quantize + shift (v9's move) keeps every component non-negative so
    centroid means truncate identically in both engines.  Scale shape:
    one (label, dim) aggregation builds the tiny centroid table, which
    BROADCASTS back for the per-vector distance pass (map-side combine
    on (vec, label)); the labels² × dim centroid self-join never touches
    the corpus."""
    from pyspark.sql.window import Window

    q = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "i", "v"
            ),
        )
        .select(
            "vec_id", "label", "i",
            (
                F.expr("CAST(floor(v * 100000e0 + 0.5e0) AS BIGINT)")
                + 100000
            ).alias("qv"),
        )
    )
    # NO barriers on q/c (r12 interleaved A/B: 0.57 vs 0.59 s): the
    # (label, i) aggregation exchange is already the reuse point here
    c = q.groupBy("label", "i").agg(
        F.expr("CAST(sum(qv) div count(1) AS BIGINT)").alias("cv"),
        F.count(F.lit(1)).alias("n"),
    )
    d = (
        q.join(F.broadcast(c.select("label", "i", "cv")), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv")))
            .cast("bigint")
            .alias("d2")
        )
    )
    intra = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr("CAST(sum(d2) div count(1) AS BIGINT)").alias("avg_intra_d2"),
    )
    a = c.select(
        F.col("label").alias("la"), F.col("i").alias("ia"),
        F.col("cv").alias("cva"),
    )
    b = c.select(
        F.col("label").alias("lb"), F.col("i").alias("ib"),
        F.col("cv").alias("cvb"),
    )
    cd = (
        a.join(
            b,
            (F.col("ia") == F.col("ib")) & (F.col("la") != F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(
            F.sum(
                (F.col("cva") - F.col("cvb")) * (F.col("cva") - F.col("cvb"))
            )
            .cast("bigint")
            .alias("d2")
        )
    )
    w = Window.partitionBy("la").orderBy("d2", "lb")
    nn = (
        cd.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("la").alias("label"),
            F.col("lb").alias("nn_label"),
            F.col("d2").alias("nn_d2"),
        )
    )
    return intra.join(nn, "label").select(
        "label", "n_members", "avg_intra_d2", "nn_label", "nn_d2"
    )


_V15_ORACLE = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
      FROM e),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM u GROUP BY vec_id),
q AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 500 = 0),
d AS (SELECT q.q_vec_id, u.vec_id, sum(u.v * q.v) AS dot
      FROM u JOIN q ON u.i = q.i GROUP BY 1, 2),
c AS (SELECT d.q_vec_id, d.vec_id, d.dot / sqrt(nq.nn * nv.nn) AS sim,
             ea.label AS ql, eb.label AS vl
      FROM d JOIN nrm nq ON nq.vec_id = d.q_vec_id
             JOIN nrm nv ON nv.vec_id = d.vec_id
             JOIN e ea ON ea.vec_id = d.q_vec_id
             JOIN e eb ON eb.vec_id = d.vec_id
      WHERE d.vec_id != d.q_vec_id)
SELECT q_vec_id,
       CAST(round(min(CASE WHEN ql = vl THEN sim END) * 1000000) AS BIGINT)
         AS hard_pos_e6,
       CAST(round(max(CASE WHEN ql <> vl THEN sim END) * 1000000) AS BIGINT)
         AS hard_neg_e6,
       CAST(round((min(CASE WHEN ql = vl THEN sim END)
                   - max(CASE WHEN ql <> vl THEN sim END)) * 1000000)
            AS BIGINT) AS margin_e6
FROM c GROUP BY q_vec_id
"""


@_register("v15_triplet_mining", _V15_ORACLE)
def v15_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining for metric-learning curation: per anchor (every
    500th vector), the HARDEST positive (lowest cosine among same-label
    vectors) and HARDEST negative (highest cosine among other-label
    vectors), plus the margin between them — the triplet-selection pass
    that decides which examples are worth a contrastive gradient, and the
    per-anchor health report for an embedding space (negative margin ⇒ an
    imposter sits inside the class boundary).  Scale shape: identical to
    v1's exact-kNN contract — anchors broadcast (bounded set), dot
    products stay JVM-side (zip_with fold), and the per-anchor reduction
    is a CONDITIONAL min/max aggregate (map-side combinable, no rank
    window, and min/max over doubles has no tie-order sensitivity)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    norms = emb.withColumn("nn", dot(F.col("emb"), F.col("emb")))
    q = (
        norms.filter(F.col("vec_id") % 500 == 0)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("label").alias("ql"),
            F.col("emb").alias("qemb"),
            F.col("nn").alias("qnn"),
        )
    )
    sims = (
        norms.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id", "ql", "label",
            (dot(F.col("emb"), F.col("qemb"))
             / F.sqrt(F.col("qnn") * F.col("nn"))).alias("sim"),
        )
    )
    hp = F.min(F.when(F.col("ql") == F.col("label"), F.col("sim")))
    hn = F.max(F.when(F.col("ql") != F.col("label"), F.col("sim")))
    return sims.groupBy("q_vec_id").agg(
        F.round(hp * 1000000).cast("bigint").alias("hard_pos_e6"),
        F.round(hn * 1000000).cast("bigint").alias("hard_neg_e6"),
        F.round((hp - hn) * 1000000).cast("bigint").alias("margin_e6"),
    )
#: a30: Pareto concentration per market — the smallest customer set
#: covering 80% of revenue (cumulative window over the per-customer
#: rollup, integer cross-multiplied threshold).  ONE nation exchange
#: serves the running sum, the totals, and the rank; the per-customer
#: rollup map-combines on o_custkey before anything sorts.


#: sign bits pack into TWO 32-bit halves per 64-d vector — a single 64-bit
#: word would need `1 << 63`, which overflows int64 in both engines; two
#: halves keep every shift value positive and the Hamming distance is just
#: the sum of the two popcounts.
_V16_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
      FROM e),
w AS (SELECT vec_id,
        bit_or(CASE WHEN i <= 32 AND v > 0
                    THEN 1::BIGINT << (i - 1) ELSE 0 END) AS lo,
        bit_or(CASE WHEN i > 32 AND v > 0
                    THEN 1::BIGINT << (i - 33) ELSE 0 END) AS hi
      FROM u GROUP BY vec_id),
q AS (SELECT vec_id AS q_vec_id, lo AS qlo, hi AS qhi FROM w
      WHERE vec_id % 500 = 0),
h AS (SELECT q.q_vec_id, w.vec_id,
             bit_count(xor(w.lo, q.qlo)) + bit_count(xor(w.hi, q.qhi)) AS ham
      FROM w CROSS JOIN q WHERE w.vec_id != q.q_vec_id),
cand AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                      ORDER BY ham, vec_id) AS hrn
         FROM h),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM u GROUP BY vec_id),
qd AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 500 = 0),
dots AS (SELECT c.q_vec_id, c.vec_id, c.ham, sum(u.v * qd.v) AS dot
         FROM cand c
         JOIN u ON u.vec_id = c.vec_id
         JOIN qd ON qd.q_vec_id = c.q_vec_id AND qd.i = u.i
         WHERE c.hrn <= 50
         GROUP BY c.q_vec_id, c.vec_id, c.ham),
sims AS (SELECT d.q_vec_id, d.vec_id, d.ham,
                d.dot / sqrt(nq.nn * nv.nn) AS sim
         FROM dots d
         JOIN nrm nq ON nq.vec_id = d.q_vec_id
         JOIN nrm nv ON nv.vec_id = d.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY sim DESC, vec_id) AS rn
      FROM sims)
SELECT q_vec_id, vec_id AS neighbor_id, CAST(ham AS INTEGER) AS hamming,
       CAST(round(sim * 1000000) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 10
"""

_PACK = (
    "aggregate(zip_with(slice(emb, {off}, 32), sequence(0, 31),"
    " (v, i) -> IF(v > 0D, shiftleft(CAST(1 AS BIGINT), i),"
    " CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a | x)"
)


@_register("v16_binary_quant_rerank", _V16_ORACLE)
def v16_binary_quant_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized retrieval with exact rerank — the 1-bit tier of
    the quantization ladder (v10 SQ8, v8/v12 PQ): each 64-d vector
    collapses to its 64 SIGN BITS (two 32-bit words, packed JVM-side with
    a fold of shifts — 32 B/vector, a 8× compression over float32), the
    candidate stage ranks by HAMMING distance (two XOR+popcounts — the
    reason this tier wins at 100 TB: no float touches the scan), and only
    the top-50 candidates per query pay the exact-cosine rerank.  Output
    pins both the Hamming and the reranked cosine, so the oracle checks
    the full two-stage contract."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    w = emb.select(
        "vec_id", "emb",
        F.expr(_PACK.format(off=1)).alias("lo"),
        F.expr(_PACK.format(off=33)).alias("hi"),
    )
    q = (
        w.filter(F.col("vec_id") % 500 == 0)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("emb").alias("qemb"),
            F.col("lo").alias("qlo"), F.col("hi").alias("qhi"),
        )
    )
    ham = (
        w.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id", "vec_id", "emb", "qemb",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
            ).alias("ham"),
        )
    )
    hw = Window.partitionBy("q_vec_id").orderBy("ham", "vec_id")
    cand = ham.withColumn("hrn", F.row_number().over(hw)).filter(
        F.col("hrn") <= 50
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    sims = cand.select(
        "q_vec_id", "vec_id", "ham",
        (
            dot(F.col("emb"), F.col("qemb"))
            / F.sqrt(
                dot(F.col("emb"), F.col("emb"))
                * dot(F.col("qemb"), F.col("qemb"))
            )
        ).alias("sim"),
    )
    rw = Window.partitionBy("q_vec_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= 10)
        .select(
            "q_vec_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("ham").cast("int").alias("hamming"),
            F.round(F.col("sim") * 1000000).cast("bigint").alias("cos_e6"),
        )
    )


_V17_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM u GROUP BY vec_id),
qv AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 500 = 0),
d AS (SELECT qv.q_vec_id, u.vec_id, sum(u.v * qv.v) AS dot
      FROM u JOIN qv ON u.i = qv.i GROUP BY qv.q_vec_id, u.vec_id),
rl AS (SELECT d.q_vec_id, d.vec_id,
              floor(d.dot / sqrt(nq.nn * nv.nn) * 1000000000e0 + 0.5e0)
                / 1000000000e0 AS rel
       FROM d JOIN nrm nq ON nq.vec_id = d.q_vec_id
              JOIN nrm nv ON nv.vec_id = d.vec_id
       WHERE d.vec_id != d.q_vec_id),
cand AS (SELECT q_vec_id, vec_id, rel, rn FROM
           (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                         ORDER BY rel DESC, vec_id) AS rn
            FROM rl) WHERE rn <= 8),
pd_ AS (SELECT a.q_vec_id, a.vec_id AS av, b.vec_id AS bv,
               sum(ua.v * ub.v) AS dot
        FROM cand a
        JOIN cand b ON b.q_vec_id = a.q_vec_id AND b.vec_id <> a.vec_id
        JOIN u ua ON ua.vec_id = a.vec_id
        JOIN u ub ON ub.vec_id = b.vec_id AND ub.i = ua.i
        GROUP BY a.q_vec_id, a.vec_id, b.vec_id),
psim AS (SELECT p.q_vec_id, p.av, p.bv,
                floor(p.dot / sqrt(na.nn * nb.nn) * 1000000000e0 + 0.5e0)
                  / 1000000000e0 AS sim
         FROM pd_ p JOIN nrm na ON na.vec_id = p.av
                    JOIN nrm nb ON nb.vec_id = p.bv),
s1 AS (SELECT q_vec_id, vec_id, rel AS score FROM cand WHERE rn = 1),
r2 AS (SELECT c.q_vec_id, c.vec_id, 0.5 * c.rel - 0.5 * p.sim AS score
       FROM cand c
       JOIN s1 ON s1.q_vec_id = c.q_vec_id AND c.vec_id <> s1.vec_id
       JOIN psim p ON p.q_vec_id = c.q_vec_id AND p.av = c.vec_id
                  AND p.bv = s1.vec_id),
s2 AS (SELECT q_vec_id, vec_id, score FROM
         (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY score DESC, vec_id) AS rn2
          FROM r2) WHERE rn2 = 1),
r3 AS (SELECT c.q_vec_id, c.vec_id,
              0.5 * c.rel - 0.5 * greatest(p1.sim, p2.sim) AS score
       FROM cand c
       JOIN s1 ON s1.q_vec_id = c.q_vec_id AND c.vec_id <> s1.vec_id
       JOIN s2 ON s2.q_vec_id = c.q_vec_id AND c.vec_id <> s2.vec_id
       JOIN psim p1 ON p1.q_vec_id = c.q_vec_id AND p1.av = c.vec_id
                   AND p1.bv = s1.vec_id
       JOIN psim p2 ON p2.q_vec_id = c.q_vec_id AND p2.av = c.vec_id
                   AND p2.bv = s2.vec_id),
s3 AS (SELECT q_vec_id, vec_id, score FROM
         (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY score DESC, vec_id) AS rn3
          FROM r3) WHERE rn3 = 1)
SELECT q_vec_id, vec_id AS neighbor_id, CAST(1 AS INTEGER) AS mmr_rank,
       CAST(round(score * 1000000) AS BIGINT) AS score_e6 FROM s1
UNION ALL
SELECT q_vec_id, vec_id, CAST(2 AS INTEGER),
       CAST(round(score * 1000000) AS BIGINT) FROM s2
UNION ALL
SELECT q_vec_id, vec_id, CAST(3 AS INTEGER),
       CAST(round(score * 1000000) AS BIGINT) FROM s3
"""


def _make_mmr_select():
    """Factory keeps ``mmr_select``'s qualname NON-importable
    (``_make_mmr_select.<locals>.mmr_select``) so cloudpickle serializes
    it BY VALUE into the v17 Arrow kernel's closure — executors never
    need this package on their sys.path (the repo's self-contained-
    closure rule; a plain module-level def pickles by reference and
    fails on workers without the package installed)."""

    def mmr_select(cands, k=3, lam=0.5):
        """Greedy Maximal-Marginal-Relevance selection over candidate
        tuples ``(id, rel, vec, norm²)``: pick 1 by pure relevance, then
        repeatedly the candidate maximizing ``lam·rel − (1−lam)·
        max_{s∈sel} cos(c, s)`` (ties: smaller id).  Both the incoming
        ``rel`` values and the pairwise cosines are QUANTIZED to the e9
        grid (``floor(x·1e9 + 0.5)/1e9`` — the v17 oracle applies the
        identical expression) before any comparison: DuckDB's SUM has no
        guaranteed aggregation order vs this kernel's sequential fold,
        so unrounded doubles could disagree by ulps and flip a near-tied
        greedy pick.  After quantization the score arithmetic
        (``lam·rel − (1−lam)·max``) runs on identical doubles in both
        engines, so picks agree unless the TRUE cosine sits within an
        ulp of an e9 grid boundary — the residual near-tie assumption.
        Returns ([picked tuples], [their scores])."""
        import math

        cands = sorted(cands, key=lambda c: (-c[1], c[0]))
        if not cands:
            return [], []

        def cos(a, b):
            t = 0.0
            for x, y in zip(a[2], b[2]):
                t += x * y
            raw = t / math.sqrt(a[3] * b[3])
            return math.floor(raw * 1e9 + 0.5) / 1e9

        selected = [cands[0]]
        scores = [cands[0][1]]
        remaining = cands[1:]
        while len(selected) < k and remaining:
            best, best_score = None, None
            for c in remaining:
                ms = max(cos(c, s) for s in selected)
                sc = lam * c[1] - (1.0 - lam) * ms
                if (
                    best is None
                    or sc > best_score
                    or (sc == best_score and c[0] < best[0])
                ):
                    best, best_score = c, sc
            selected.append(best)
            scores.append(best_score)
            remaining = [c for c in remaining if c[0] != best[0]]
        return selected, scores

    return mmr_select


#: single shared implementation: the v17 kernel closes over this (pickled
#: by value) and the property tests import it
mmr_select = _make_mmr_select()


@_register("v17_mmr_rerank", _V17_ORACLE)
def v17_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking: retrieve the top-8 cosine
    candidates per query vector (v1's exact machinery), then greedily
    select 3 balancing relevance against redundancy — pick i maximizes
    ``0.5·rel(i) − 0.5·max_{s∈selected} cos(i, s)`` (rank 1 is pure
    relevance) — the retrieval-diversification step RAG stacks run
    between ANN and the context window, and the repo's first
    re-ranking-family operator (v10/v16 rerank by the SAME score; MMR
    re-SCORES against what was already picked, which no window function
    expresses).  Scale shape: the expensive part stays the retrieval
    (broadcast zip_with dot products, JVM); candidate vectors rejoin
    AFTER the top-8 cut so the shuffle carries 8 arrays per query, not
    |corpus|; the greedy runs per-query in ONE applyInPandas over a
    bounded 8-row group (k² = 64 pairwise cosines, arrival-order
    independent), with rel and pairwise cosines quantized to the e9 grid
    in BOTH engines before any comparison (see mmr_select), so the greedy
    picks agree regardless of either engine's summation order."""
    import pandas as pd
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    embn = emb.withColumn("nn", dot(F.col("emb"), F.col("emb")))
    q = embn.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("emb").alias("qemb"),
        F.col("nn").alias("qnn"),
    )
    # rel quantized to the e9 grid with the same expression the oracle
    # uses (floor(x*1e9 + 0.5)/1e9), so the greedy MMR comparisons run on
    # identical doubles in both engines (r8 ADVICE: unrounded near-ties
    # could flip a pick under DuckDB's unordered SUM)
    rel = (
        embn.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            (
                F.floor(
                    dot(F.col("emb"), F.col("qemb"))
                    / F.sqrt(F.col("qnn") * F.col("nn"))
                    * F.lit(1000000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000000.0)
            ).alias("rel"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("rel").desc(), "vec_id")
    cut = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .select("q_vec_id", "vec_id", "rel")
    )
    # arrays rejoin AFTER the cut, with the join direction PINNED: the
    # 8-per-query cut broadcasts and the corpus streams — left to Catalyst
    # the sf0.1 plan flipped to shuffling the whole array column instead
    cand = embn.join(F.broadcast(cut), "vec_id")

    out_schema = "q_vec_id long, neighbor_id long, mmr_rank int, score double"

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        selected, scores = mmr_select(
            [
                (int(r.vec_id), float(r.rel), [float(x) for x in r.emb],
                 float(r.nn))
                for r in pdf.itertuples(index=False)
            ]
        )
        qid = int(pdf["q_vec_id"].iloc[0])
        return pd.DataFrame(
            {
                "q_vec_id": [qid] * len(selected),
                "neighbor_id": [s[0] for s in selected],
                "mmr_rank": list(range(1, len(selected) + 1)),
                "score": scores,
            }
        )

    return (
        cand.groupBy("q_vec_id")
        .applyInPandas(mmr, out_schema)
        .select(
            "q_vec_id",
            "neighbor_id",
            "mmr_rank",
            F.round(F.col("score") * 1000000).cast("bigint").alias("score_e6"),
        )
    )


_V18_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM u GROUP BY vec_id),
en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
cu AS (SELECT u.vec_id, u.v, u.i FROM u JOIN en ON en.doc_id = u.vec_id),
qv AS (SELECT vec_id AS q_vec_id, v, i FROM u WHERE vec_id % 250 = 0),
d AS (SELECT qv.q_vec_id, cu.vec_id, sum(cu.v * qv.v) AS dot
      FROM cu JOIN qv ON cu.i = qv.i GROUP BY qv.q_vec_id, cu.vec_id),
c AS (SELECT d.q_vec_id, d.vec_id, d.dot / sqrt(nq.nn * nv.nn) AS sim
      FROM d JOIN nrm nq ON nq.vec_id = d.q_vec_id
             JOIN nrm nv ON nv.vec_id = d.vec_id
      WHERE d.vec_id != d.q_vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY sim DESC, vec_id) AS rn
      FROM c)
SELECT q_vec_id, vec_id AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       CAST(round(sim * 1000000) AS BIGINT) AS cos_e6
FROM r WHERE rn <= 5
"""


@_register("v18_filtered_topk", _V18_ORACLE)
def v18_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: top-5 cosine neighbors per query
    vector, restricted to vectors whose DOCUMENT is English — the
    filtered-ANN pattern every RAG deployment runs (vector similarity
    under a metadata predicate), done PRE-FILTER: the predicate cuts the
    corpus before any dot product, instead of over-fetching top-k and
    discarding (post-filter can return < k or scan far past k under a
    selective predicate).  Scale shape: `lang = 'en'` reaches the
    documents parquet scan as a PushedFilter; the surviving id set joins
    the embedding table BEFORE norms/dots, so the expensive zip_with
    kernel runs on the filtered corpus only; queries broadcast as in v1."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    embn = emb.withColumn("nn", dot(F.col("emb"), F.col("emb")))
    en = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = embn.join(en, "vec_id")  # pre-filter: dots never see non-en
    q = embn.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("emb").alias("qemb"),
        F.col("nn").alias("qnn"),
    )
    sims = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            (dot(F.col("emb"), F.col("qemb"))
             / F.sqrt(F.col("qnn") * F.col("nn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "q_vec_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round(F.col("sim") * 1000000).cast("bigint").alias("cos_e6"),
        )
    )


def _v21_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_v2_oracle()}),
pe AS (SELECT id_a AS a, id_b AS b FROM pairs),
e0 AS (SELECT a AS src, b AS dst FROM pe UNION ALL SELECT b, a FROM pe),
cn AS (SELECT pe.a, pe.b, count(*) AS n
       FROM pe JOIN e0 x ON x.src = pe.a
               JOIN e0 y ON y.src = pe.b AND y.dst = x.dst
       GROUP BY pe.a, pe.b),
kept AS (SELECT pe.a, pe.b FROM pe JOIN cn ON cn.a = pe.a AND cn.b = pe.b),
edges AS (SELECT a, b FROM kept UNION ALL SELECT b, a FROM kept),
reach(v, u2) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.v, eg.b FROM reach r JOIN edges eg ON eg.a = r.u2
),
k AS (SELECT v AS vec_id, min(u2) AS keeper FROM reach GROUP BY v)
SELECT em.vec_id, k.keeper, k.keeper != em.vec_id AS is_dup
FROM embeddings em JOIN k USING (vec_id)
"""


@_register("v21_bridge_cut_keepers", _v21_oracle())
def v21_bridge_cut_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge-robust dedup clustering — g12's signal APPLIED: cut every
    local bridge (zero common-neighbor support) out of the loose
    cosine>=0.3 near-dup graph, then run the transitive-closure keeper
    election on what remains.  This is the standard defense against LSH
    chaining: A~B~C chains through template accidents weld unrelated
    docs into one mega-cluster under plain closure (v4 avoids it only by
    its conservative 0.9 threshold); requiring each surviving edge to
    sit in at least one triangle keeps the aggressive threshold's recall
    while confining the closure to locally-dense (genuine duplicate)
    neighborhoods.  Scale shape: g12's wedge join + t11's O(edges)
    Hash-Min closure, both int64 node-keyed; the pair lineage
    checkpoints once and feeds both."""
    from spark_ml_spatialjointransformer_spark.operators.dedup import (
        dedup_connected_components,
    )
    from spark_ml_spatialjointransformer_spark.operators.graph import (
        edge_common_neighbors,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    kept = edge_common_neighbors(pairs, "id_a", "id_b").where(
        F.col("n_common") > 0
    )
    return dedup_connected_components(
        kept.select("id_a", "id_b"), emb.select("vec_id"), "vec_id"
    )


#: v19 semantic-dedup eviction threshold (cosine ×1e6)
_V19_THR_E6 = 400_000
#: v19 cell resolution: 6 SRP planes => 64 cells (the paper's k knob)
_V19_PLANES = 6


def _srp_cells_cte() -> str:
    """Shared WITH-chain prefix: v2's quantization + integer planes +
    the {_V19_PLANES}-plane SRP cell id per vector (CTEs e/u/nrm0/q/qn/
    p/d/cell) — the deterministic cell assignment v19 (semantic dedup)
    and v20 (cell-stratified sampling) both build on."""
    return f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) - 1 AS i FROM e),
nrm0 AS (SELECT vec_id, sqrt(sum(v * v)) AS nm FROM u GROUP BY vec_id),
q AS (SELECT u.vec_id, u.i, CAST(floor(u.v * 100000.0 + 0.5) AS BIGINT) AS qv
      FROM u JOIN nrm0 ON nrm0.vec_id = u.vec_id WHERE nrm0.nm > 0),
qn AS (SELECT vec_id, sum(qv * qv) AS qn2 FROM q GROUP BY vec_id
       HAVING sum(qv * qv) > 0),
p AS (SELECT j, i, ((j * 73856093 + i * 19349663 + 83492791) % 2039) % 17 - 8 AS pv
      FROM range({_V19_PLANES}) t1(j) CROSS JOIN range({_EMB_DIM}) t2(i)),
d AS (SELECT q.vec_id, p.j, sum(q.qv * p.pv) AS dot
      FROM q JOIN qn USING (vec_id) JOIN p ON p.i = q.i GROUP BY q.vec_id, p.j),
cell AS (SELECT vec_id,
                sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS c
         FROM d GROUP BY vec_id)"""


def _v19_oracle() -> str:
    """DuckDB replica of operators/similarity.semdedup: v2's quantization
    and integer planes, cell = the 6-plane SRP bucket, centroid affinity =
    exact BIGINT dot(member, cell sum), rank by (affinity, id), evict on
    quantized cosine >= threshold to ANY earlier-ranked cell member."""
    return f"""
WITH {_srp_cells_cte()},
cs AS (SELECT cell.c, q.i, sum(q.qv) AS sv
       FROM q JOIN cell USING (vec_id) GROUP BY cell.c, q.i),
aff AS (SELECT q.vec_id, cell.c, sum(q.qv * cs.sv) AS a
        FROM q JOIN cell USING (vec_id)
        JOIN cs ON cs.c = cell.c AND cs.i = q.i
        GROUP BY q.vec_id, cell.c),
rk AS (SELECT vec_id, c, a,
              row_number() OVER (PARTITION BY c ORDER BY a, vec_id) AS rk
       FROM aff),
pr AS (SELECT x.vec_id AS vid, y.vec_id AS other
       FROM rk x JOIN rk y ON y.c = x.c AND y.rk < x.rk),
dp AS (SELECT pr.vid, pr.other, sum(qa.qv * qb.qv) AS dot
       FROM pr JOIN q qa ON qa.vec_id = pr.vid
               JOIN q qb ON qb.vec_id = pr.other AND qb.i = qa.i
       GROUP BY pr.vid, pr.other),
mx AS (SELECT dp.vid AS vec_id,
              max(CAST(round(CAST(dp.dot AS DOUBLE)
                    / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE)))
                    * 1000000) AS BIGINT)) AS ms
       FROM dp JOIN qn na ON na.vec_id = dp.vid
               JOIN qn nb ON nb.vec_id = dp.other
       GROUP BY dp.vid
       HAVING max(CAST(round(CAST(dp.dot AS DOUBLE)
                    / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE)))
                    * 1000000) AS BIGINT)) >= {_V19_THR_E6})
SELECT rk.vec_id, CAST(rk.c AS BIGINT) AS cell,
       CAST(rk.rk AS BIGINT) AS rank_in_cell,
       CAST(CASE WHEN mx.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept,
       CAST(coalesce(mx.ms, 0) AS BIGINT) AS max_sim_e6
FROM rk LEFT JOIN mx ON mx.vec_id = rk.vec_id
"""


@_register("v19_semdedup", _v19_oracle())
def v19_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): coarse
    embedding cells, centroid-affinity keeper ranking, evict members
    >= 0.4 cosine to an earlier-ranked cell-mate — the embedding-space
    curation pass that removes REDUNDANT MEANING (paraphrases, template
    text, re-encodings) where v4 removes only re-encoded bytes and
    t5/t6 only shared surface n-grams.  Every step is engine-exact (SRP
    integer cells, BIGINT centroid dots, v2's quantized-cosine refine),
    so the full keep/evict decision — not a proxy — is oracle-gated.
    Scale shape: see ``operators/similarity.py:semdedup`` — the one
    quadratic term is intra-cell pairs, controlled by the plane count
    exactly like the paper's cluster count k."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        semdedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(
        emb, "vec_id", "embedding", dim=_EMB_DIM,
        n_planes=_V19_PLANES, threshold=_V19_THR_E6 / 1_000_000,
    ).select(
        F.col("id").alias("vec_id"),
        "cell",
        "rank_in_cell",
        "kept",
        "max_sim_e6",
    )


#: v20 picks per cell (the stratum quota)
_V20_K = 3


def _v20_oracle() -> str:
    h = h60_sql("'v20#' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH {_srp_cells_cte()},
g AS (SELECT vec_id, c, {h} AS ph,
             count(*) OVER (PARTITION BY c) AS csize
      FROM cell),
r AS (SELECT vec_id, c, csize,
             row_number() OVER (PARTITION BY c ORDER BY ph, vec_id) AS rk
      FROM g)
SELECT vec_id, CAST(c AS BIGINT) AS cell, CAST(rk AS BIGINT) AS pick_rank,
       CAST(csize AS BIGINT) AS cell_size
FROM r WHERE rk <= {_V20_K}
"""


@_register("v20_cell_stratified_sample", _v20_oracle())
def v20_cell_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-stratified corpus sampling in EMBEDDING space: pick (up
    to) {_V20_K} members per semantic cell by deterministic hash rank —
    the cluster-balanced subset selection step of data-curation
    pipelines (small eval/seed sets that cover the semantic space
    instead of oversampling its dense core; t12 stratifies by METADATA
    column, this stratifies by learned geometry).  Cells are v19's SRP
    buckets — same assignment, so v19's audit and v20's sample describe
    the same partition of the corpus; the pick hash is salted ('v20#')
    so selection is independent of every other vec_id-keyed decision.
    Scale shape: one Arrow pass for the cell ids (shared machinery),
    then ONE cell-keyed exchange of (int, int) rows for the rank window;
    embeddings never shuffle — quota selection needs no pairwise work at
    all, which is what makes it the cheap first cut before v19's
    pairwise dedup."""
    from pyspark.sql.window import Window

    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        _quantized_base,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cells = _quantized_base(
        emb, "vec_id", "embedding", _EMB_DIM, _V19_PLANES, 1
    ).select(
        F.col("__id").alias("vec_id"),
        F.col("__buckets")[0].alias("cell"),
        h60_col(
            F.concat(F.lit("v20#"), F.col("__id").cast("string"))
        ).alias("ph"),
    )
    wc = Window.partitionBy("cell")
    wr = Window.partitionBy("cell").orderBy("ph", "vec_id")
    return (
        cells.withColumn("cell_size", F.count(F.lit(1)).over(wc))
        .withColumn("pick_rank", F.row_number().over(wr))
        .where(F.col("pick_rank") <= _V20_K)
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("pick_rank").cast("bigint").alias("pick_rank"),
            F.col("cell_size").cast("bigint").alias("cell_size"),
        )
    )


#: v22 outlier gate: a vector whose 5th-nearest neighbor is below this
#: cosine (e6) sits in an empty region of embedding space (sf0.01
#: distribution: min 242k, p5 260k, median 291k)
_V22_K = 5
_V22_THR_E6 = 260_000

_V22_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
q AS (SELECT vec_id, i, CAST(floor(v * 100000.0 + 0.5) AS BIGINT) AS qv FROM u),
qn AS (SELECT vec_id, sum(qv * qv) AS qn2 FROM q GROUP BY vec_id
       HAVING sum(qv * qv) > 0),
d AS (SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.qv * b.qv) AS dot
      FROM q a JOIN q b ON a.i = b.i AND a.vec_id != b.vec_id
      WHERE a.vec_id IN (SELECT vec_id FROM qn)
        AND b.vec_id IN (SELECT vec_id FROM qn)
      GROUP BY a.vec_id, b.vec_id),
c AS (SELECT d.ia, d.ib,
             d.dot / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE)))
               AS sim
      FROM d JOIN qn na ON na.vec_id = d.ia JOIN qn nb ON nb.vec_id = d.ib),
r AS (SELECT *, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
      FROM c)
SELECT ia AS vec_id,
       CAST(floor(sim * 1000000e0 + 0.5e0) AS BIGINT) AS kth_sim_e6,
       floor(sim * 1000000e0 + 0.5e0) < {_V22_THR_E6} AS is_outlier
FROM r WHERE rn = {_V22_K}
"""


@_register("v22_knn_outliers", _V22_ORACLE)
def v22_knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring by k-NN distance (Ramaswamy et
    al. 2000, the curation form): every vector's similarity to its 5th
    nearest neighbor — a LOW kth-neighbor similarity means the vector
    sits in an empty region (mis-embedded junk, OCR garbage, wrong-
    modality rows), the standard embedding-QA gate before centroid/
    cluster work trusts the space.  v19 removes points for having
    near-identical neighbors; this flags the OPPOSITE tail (no close
    neighbors at all), and unlike v9's centroid distances it is
    model-free — no cluster assumption, just local density.  Score =
    min cos_e6 over the exact top-5 (the 5th-best, since rounding is
    monotone and the top-5 set matches the oracle's (sim DESC, id)
    rank — v6's tie contract).  Scale shape: one scan-shaped Arrow
    pass against the broadcast quantized corpus (v6's kernel, guarded
    collect with the IVF/LSH tiers as the named big-corpus path) + ONE
    map-combinable min-aggregate keyed by vec_id; nothing else
    shuffles."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        knn_join_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_join_exact(emb, "vec_id", "embedding", k=_V22_K)
    # the oracle's rn = k filter emits NO row for a vector with fewer
    # than k eligible neighbors (corpus of <= k non-zero-norm vectors);
    # knn_join_exact would emit min(k, n-1) rows there, so gate the min
    # on a full group — a no-op at every sf scale, exact parity always
    return (
        knn.groupBy("vec_id")
        .agg(
            F.min("cos_e6").cast("bigint").alias("kth_sim_e6"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == _V22_K)
        .drop("_n")
        .select(
            "vec_id",
            "kth_sim_e6",
            (F.col("kth_sim_e6") < _V22_THR_E6).alias("is_outlier"),
        )
    )
