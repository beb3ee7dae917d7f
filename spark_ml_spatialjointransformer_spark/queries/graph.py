"""Query registry, graph family — split from the single-module registry (r11);
see ``queries/_core.py`` for the registration machinery and shared helpers."""

from __future__ import annotations

from spark_ml_spatialjointransformer_spark.queries._core import (
    DataFrame,
    F,
    QUERIES,
    QueryDef,
    SparkSession,
    _EMB_DIM,
    _barrier,
    _register,
    _sql_query,
    _v2_oracle,
    load_table,
)



def _g1_oracle() -> str:
    """Unrolled 5-iteration integer PageRank over the v2 near-dup pair
    graph: the pair set is v2's oracle verbatim (nested subquery), and
    each iteration is one CTE of the join-aggregate recurrence.  `//`
    (floor) here equals Spark's `div` (truncate) because every term is
    non-negative."""
    iter_ctes, prev = [], "r0"
    for i in range(1, 6):
        iter_ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS id,
         CAST(150000 + (85 * sum({prev}.r // deg.d)) // 100 AS BIGINT) AS r
  FROM e JOIN {prev} ON {prev}.id = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iter_ctes)
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
{chain}
SELECT id AS vec_id, r AS pr_e6 FROM r5
"""


@_register("g1_pagerank", _g1_oracle())
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-analysis ranking: 5 iterations of integer-exact PageRank over
    the v2 near-duplicate pair graph — which duplicate-cluster members
    are most central (the canonical-pick / influence signal transitive
    closure alone can't give).  All arithmetic is non-negative int64
    (rank ×1e6, truncating division), so Spark's iterated join-aggregate
    and the oracle's unrolled CTE chain agree bit-for-bit.  Scale shape:
    per iteration one node-keyed hash join + one map-combined
    aggregation; the edge list checkpoints once and the fixed-depth rank
    lineage stays lazy (see ``operators/graph.py``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import pagerank_int
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    return pagerank_int(pairs, "id_a", "id_b", iters=5).select(
        F.col("id").alias("vec_id"), "pr_e6"
    )


def _g3_oracle() -> str:
    """Unrolled 4-round multi-source BFS over the v2 pair graph: each
    round is one CTE of the frontier relaxation
    dist_i = min(dist_{i-1}, min over edges of neighbor dist + 1)."""
    ctes, prev = [], "d0"
    for i in range(1, 5):
        ctes.append(
            f"""d{i} AS (
  SELECT id, CAST(min(hops) AS BIGINT) AS hops FROM (
    SELECT id, hops FROM {prev}
    UNION ALL
    SELECT e.dst AS id, {prev}.hops + 1 AS hops
    FROM e JOIN {prev} ON {prev}.id = e.src
  ) GROUP BY id)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
d0 AS (SELECT vec_id AS id, CAST(0 AS BIGINT) AS hops FROM embeddings
       WHERE vec_id % 500 = 0),
{chain}
SELECT id AS vec_id, hops FROM d4
"""


@_register("g3_bfs_hops", _g3_oracle())
def g3_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-proximity labeling: hop distance from every embedding to
    its nearest ANCHOR (vec_id % 500 = 0 — the curated query-set
    convention) through the near-duplicate pair graph, bounded at 4
    hops — multi-source BFS by frontier relaxation, the third iterative
    graph pattern alongside g1's fixed-point recurrence and t11's label
    propagation.  "Within k dup-hops of a vetted example" is a real
    curation signal: transitive near-dup proximity to known-good data.
    Scale shape: per round one src-keyed hash join + one min-aggregation
    with map-side combine, node-id int64 shuffles only; the LSH pair
    lineage checkpoints once (see ``operators/graph.py:bfs_hops``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import bfs_hops
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    seeds = emb.where(F.col("vec_id") % 500 == 0).select("vec_id")
    return bfs_hops(pairs, "id_a", "id_b", seeds, "vec_id", iters=4).select(
        F.col("id").alias("vec_id"), "hops"
    )


def _g2_oracle() -> str:
    """Degree-oriented triangle counting over the v2 pair graph, replayed
    relationally: the (degree, id) total order collapses into one int64
    key d·10^7 + id, each edge points low-key → high-key, wedges self-join
    on the source with the key order making each triangle appear exactly
    once, and a wedge closes iff its (v, w) is itself an oriented edge."""
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS a, id_b AS b FROM pairs),
und AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
k AS (SELECT e.a, e.b,
             da.d * 10000000 + e.a AS ka, db.d * 10000000 + e.b AS kb
      FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b),
o AS (SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
             CASE WHEN ka < kb THEN b ELSE a END AS dst,
             CASE WHEN ka < kb THEN kb ELSE ka END AS dkey
      FROM k),
tri AS (SELECT x.src AS u, x.dst AS v, y.dst AS w
        FROM o x
        JOIN o y ON x.src = y.src AND x.dkey < y.dkey
        JOIN o z ON z.src = x.dst AND z.dst = y.dst),
n AS (SELECT u AS id FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri)
SELECT id AS vec_id, CAST(count(*) AS BIGINT) AS n_tri FROM n GROUP BY id
"""


@_register("g2_triangles", _g2_oracle())
def g2_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-density signal over the v2 near-duplicate pair graph:
    per-node triangle counts via degree orientation (compact-forward) —
    the structural complement to g1's centrality and t11's connectivity:
    a node in many triangles sits in a dense duplicate CLUSTER, not just
    a long chain, which is what cluster-aware keeper election and
    cluster-size caps key on.  Orientation bounds the wedge fanout by
    the graph's arboricity, so the self-join survives power-law degree
    skew that kills the naive neighbor×neighbor expansion.  Scale shape:
    node-id-keyed shuffles only; the LSH pair lineage checkpoints once
    (see ``operators/graph.py``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import (
        triangles_per_node,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    return triangles_per_node(pairs, "id_a", "id_b").select(
        F.col("id").alias("vec_id"), "n_tri"
    )


def _g4_oracle(k: int = 2, rounds: int = 3) -> str:
    """Unrolled k-core peeling over the v2 pair graph: each round is a
    degree CTE, a keep set, and the surviving edge list."""
    ctes, prev = [], "e0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS (SELECT src, count(*) AS d FROM {prev} GROUP BY src),
k{i} AS (SELECT src FROM d{i} WHERE d >= {k}),
e{i} AS (SELECT e.src, e.dst FROM {prev} e
         JOIN k{i} a ON a.src = e.src JOIN k{i} b ON b.src = e.dst)"""
        )
        prev = f"e{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH pairs AS ({_v2_oracle()}),
e0 AS (SELECT id_a AS src, id_b AS dst FROM pairs
       UNION ALL SELECT id_b, id_a FROM pairs),
{chain}
SELECT src AS vec_id, count(*) AS deg FROM {prev} GROUP BY src
"""


@_register("g4_kcore", _g4_oracle())
def g4_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-cluster extraction: 3 peeling rounds of the 2-core over the
    near-duplicate pair graph — nodes that survive sit in tightly
    duplicated families (the ones worth canonical-picking first), while
    the sparse fringe peels away.  The fourth iterative graph pattern in
    the registry: monotone deletion, vs g1's fixed point, g3's frontier
    relaxation, and t11's label propagation.  Scale shape: per round one
    map-combined degree agg + two node-id semi-joins; the edge list only
    shrinks, and survivor edges checkpoint per round because each round
    reads them twice (see ``operators/graph.py:kcore``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import kcore
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    return kcore(pairs, "id_a", "id_b", k=2, rounds=3).select(
        F.col("id").alias("vec_id"), F.col("deg").cast("bigint").alias("deg")
    )


def _g5_oracle() -> str:
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
cn AS (SELECT e1.src AS x, e2.src AS y, count(*) AS n_common
       FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
       GROUP BY 1, 2),
nl AS (SELECT cn.x, cn.y, cn.n_common FROM cn
       WHERE NOT EXISTS (SELECT 1 FROM pairs p
                         WHERE p.id_a = cn.x AND p.id_b = cn.y))
SELECT nl.x AS vec_a, nl.y AS vec_b,
       CAST(nl.n_common AS BIGINT) AS n_common,
       CAST(nl.n_common * 1000000 // (dx.d + dy.d - nl.n_common) AS BIGINT)
         AS jac_ppm
FROM nl
JOIN deg dx ON dx.src = nl.x
JOIN deg dy ON dy.src = nl.y
"""


@_register("g5_link_prediction", _g5_oracle())
def g5_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the v2 near-duplicate graph:
    node pairs NOT currently connected, scored by neighborhood-Jaccard
    (|N(x)∩N(y)| / |N(x)∪N(y)| as ppm) — the 'these two clusters are
    probably the same near-dup family' signal that LSH band collisions
    miss (two docs can share many neighbors yet never share a band).
    The wedge self-join is the same degree-bounded expansion g2's
    triangle count uses; everything downstream is node-id-keyed
    join-aggregate with integer-exact scoring (non-negative ``div`` ==
    floor).  Scale shape: shuffles carry (node, node) int pairs only —
    the text/embedding payloads never enter the graph stage."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # FIVE consumers below read the pair list (two union arms, both wedge
    # arms through e, the anti join) — the lazy checkpoint computes the
    # LSH self-join + refine once
    pairs = (
        lsh_neardup_pairs(
            emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
            n_planes=6, bands=2, quantized=True,
        )
        .select("id_a", "id_b")
        .transform(_barrier)
    )
    e = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cn = (
        e1.join(
            e2,
            (F.col("e1.dst") == F.col("e2.dst"))
            & (F.col("e1.src") < F.col("e2.src")),
        )
        .groupBy(
            F.col("e1.src").alias("x"), F.col("e2.src").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nl = cn.join(
        pairs,
        (F.col("x") == F.col("id_a")) & (F.col("y") == F.col("id_b")),
        "left_anti",
    )
    dx = deg.select(F.col("src").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("src").alias("y"), F.col("d").alias("dy"))
    return (
        nl.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("vec_a"),
            F.col("y").alias("vec_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr(
                "CAST(n_common * 1000000 div (dx + dy - n_common) AS BIGINT)"
            ).alias("jac_ppm"),
        )
    )


def _g6_oracle() -> str:
    """Unrolled 4-round weighted SSSP over the v2 pair graph: each round
    relaxes dist through one more edge; the per-canonical-pair integer
    weight (id_a·31 + id_b·17) mod 99 + 1 rides both directions."""
    ctes, prev = [], "d0"
    for i in range(1, 5):
        ctes.append(
            f"""d{i} AS (
  SELECT id, CAST(min(cost) AS BIGINT) AS cost FROM (
    SELECT id, cost FROM {prev}
    UNION ALL
    SELECT e.dst AS id, {prev}.cost + e.w AS cost
    FROM e JOIN {prev} ON {prev}.id = e.src
  ) GROUP BY id)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH pairs AS ({_v2_oracle()}),
wp AS (SELECT id_a, id_b, (id_a * 31 + id_b * 17) % 99 + 1 AS w FROM pairs),
e AS (SELECT id_a AS src, id_b AS dst, w FROM wp
      UNION ALL SELECT id_b, id_a, w FROM wp),
d0 AS (SELECT vec_id AS id, CAST(0 AS BIGINT) AS cost FROM embeddings
       WHERE vec_id % 500 = 0),
{chain}
SELECT id AS vec_id, cost FROM d4
"""


@_register("g6_weighted_sssp", _g6_oracle())
def g6_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (bounded Bellman-Ford) over the near-dup
    graph: minimum path COST from every embedding to its cheapest anchor
    (vec_id % 500 = 0) within 4 edges, where each edge carries a
    deterministic integer weight — the weighted generalization of g3's
    hop counting ("how cheaply does this example connect to vetted
    data", with edge costs standing in for dissimilarity).  Scale shape:
    per round one src-keyed hash join + one min aggregation with
    map-side combine, int64 id/cost shuffles only; per-round lazy
    checkpoints stop the union+join lineage doubling (see
    ``operators/graph.py:sssp_int``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import sssp_int
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    ).withColumn(
        "w", (F.col("id_a") * 31 + F.col("id_b") * 17) % 99 + 1
    )
    seeds = emb.where(F.col("vec_id") % 500 == 0).select("vec_id")
    return sssp_int(
        pairs, "id_a", "id_b", "w", seeds, "vec_id", iters=4
    ).select(F.col("id").alias("vec_id"), "cost")
#: t49: per-source corpus hygiene profile — byte-vs-char divergence
#: (multibyte/UTF-8 presence), digit incidence, double-space and tab
#: contamination — the pre-tokenizer sanity report every ingest runs.
#: One scan, map-combined per-source aggregate; all signals are
#: length/replace identities that stay in whole-stage codegen.


_G7_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
deg AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
tot AS (SELECT count(DISTINCT user_id) AS nu FROM ut),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_shared
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_shared,
       CAST(round(p.n_shared * tot.nu * 1000000e0 * 1.0e0
                  / (da.n * db.n)) AS BIGINT) AS lift_e6
FROM pairs p
JOIN deg da ON da.event_type = p.type_a
JOIN deg db ON db.event_type = p.type_b
CROSS JOIN tot
"""


@_register("g7_coengagement_lift", _G7_ORACLE)
def g7_coengagement_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection with lift: project the user↔event-type
    bipartite graph onto event types — for every type pair, how many
    users touched BOTH, scored by observed/expected lift
    (``n_shared·N / (n_a·n_b)``) — the co-engagement / market-basket
    signal (d18 measures pairs in TIME; this measures them in SET
    membership).  The distinct collapse runs FIRST, so the self-join
    sees one row per (user, type) — fanout bounded by types-per-user
    (≤5), never events-per-user.  Scale shape: one distinct exchange
    builds the (user, type) incidence list ONCE (checkpointed — four
    branches read it: both wedge arms, the degrees, and the user
    total), one user-keyed wedge join, then joins against the
    |types|-row degree/total frames, which broadcast."""
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .transform(_barrier)
    )
    deg = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = ut.agg(F.countDistinct("user_id").alias("nu"))
    a = ut.select(
        F.col("user_id").alias("ua"), F.col("event_type").alias("type_a")
    )
    b = ut.select(
        F.col("user_id").alias("ub"), F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    da = deg.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    db = deg.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a", "type_b", "n_shared",
            F.expr(
                "CAST(round(n_shared * nu * 1000000e0 * 1.0e0"
                " / (na * nb)) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )
#: a28: TPC-H Q19 (shipmode columns absent in this schema, so the brackets
#: key on brand/size/quantity only) — OR-of-ANDs bracket revenue.  The
#: classic Q19 rewrite is spelled explicitly: the brand-IN / size / quantity
#: conjuncts common to all three disjuncts are hoisted so they PUSH DOWN to
#: the parquet scans (the disjunction alone straddles both tables and can't),
#: then the residual OR filters post-join.  Part broadcasts; one 3-group
#: map-combined aggregate.

_G8_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       CAST(floor(n * 1000000e0 / sum(n) OVER (PARTITION BY prev_type)
                  + 0.5e0) AS BIGINT) AS p_e6
FROM t
"""
QUERIES["g8_markov_transitions"] = QueryDef(
    _sql_query(("events",), _G8_SQL), _G8_SQL
)
#: d22: Benford first-digit audit per event stream — the classic
#: fabricated-data / unit-mix detector: observed leading-digit shares
#: (e6-scaled) against Benford's log10(1+1/d) expectation (precomputed
#: integer constants, so no float enters either engine).  One scan, one
#: map-combined ≤45-group combine, share window on ≤45 rows.  The only
#: engine-split spelling is integer division (Spark DIV vs DuckDB //) on
#: the always-positive mantissa.


#: moments go through wide integers: n·Σdy² reaches ~5.6e19 at 5× (type
#: activity ≈ |events|/5), past int64 — Spark spells the wide tier as
#: DECIMAL(38,0) (exact, 100 TB-safe, the step above d21's int64
#: cross-multiplication), DuckDB as its native HUGEINT (int128; a
#: DECIMAL(38,0)×DECIMAL(38,0) product would exceed DuckDB's max decimal
#: width).  Both drop to double exactly once, on identical values.
_G9_BODY = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
du AS (SELECT user_id, count(*) AS dx FROM events GROUP BY 1),
dt AS (SELECT event_type, count(*) AS dy FROM events GROUP BY 1),
e AS (SELECT dx, dy FROM ut
      JOIN du ON ut.user_id = du.user_id
      JOIN dt ON ut.event_type = dt.event_type),
s AS (SELECT CAST(count(*) AS {BIG}) AS n,
             CAST(sum(dx) AS {BIG}) AS sx,
             CAST(sum(dy) AS {BIG}) AS sy,
             CAST(sum(dx * dy) AS {BIG}) AS sxy,
             CAST(sum(dx * dx) AS {BIG}) AS sxx,
             CAST(sum(dy * dy) AS {BIG}) AS syy
      FROM e)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000e0
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)) + 0.5e0)
            AS BIGINT) AS assortativity_e6
FROM s
"""
QUERIES["g9_degree_assortativity"] = QueryDef(
    _sql_query(("events",), _G9_BODY.replace("{BIG}", "DECIMAL(38, 0)")),
    _G9_BODY.replace("{BIG}", "HUGEINT"),
)


def _g10_oracle() -> str:
    """g2's degree-oriented triangle CTEs plus the degree table: local
    clustering coefficient = 2*tri / (deg*(deg-1)) per node of degree >= 2
    (nodes in no triangle zero-fill)."""
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS a, id_b AS b FROM pairs),
und AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
k AS (SELECT e.a, e.b,
             da.d * 10000000 + e.a AS ka, db.d * 10000000 + e.b AS kb
      FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b),
o AS (SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
             CASE WHEN ka < kb THEN b ELSE a END AS dst,
             CASE WHEN ka < kb THEN kb ELSE ka END AS dkey
      FROM k),
tri AS (SELECT x.src AS u, x.dst AS v, y.dst AS w
        FROM o x
        JOIN o y ON x.src = y.src AND x.dkey < y.dkey
        JOIN o z ON z.src = x.dst AND z.dst = y.dst),
n AS (SELECT u AS id FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri),
t AS (SELECT id, count(*) AS n_tri FROM n GROUP BY id)
SELECT deg.u AS vec_id, CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(round(2.0 * coalesce(t.n_tri, 0) * 1000000
                  / (deg.d * (deg.d - 1))) AS BIGINT) AS coeff_e6
FROM deg LEFT JOIN t ON t.id = deg.u
WHERE deg.d >= 2
"""


@_register("g10_clustering_coefficient", _g10_oracle())
def g10_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the v2 near-duplicate pair graph:
    2*tri(u) / (deg(u)*(deg(u)-1)) for every node of degree >= 2, with
    zero-fill for triangle-free nodes — the per-node DENSITY ratio that
    separates "hub of a near-dup clique" (coeff ~1: all my neighbors
    duplicate each other too; safe to keep one representative) from
    "template bridge" (coeff ~0: I share boilerplate with many otherwise-
    unrelated docs; keeper election must NOT collapse my neighborhood) —
    the standard graph-curation refinement on top of g2's raw counts.
    Scale shape: one canonical-pair localCheckpoint feeds BOTH the degree
    agg and the triangle counter (the LSH self-join lineage never
    re-executes); everything downstream shuffles (int64 id, int64 count)
    rows keyed by node id, the same budget class as g2."""
    from spark_ml_spatialjointransformer_spark.operators.graph import (
        triangles_per_node,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    raw = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    pairs = raw.select(
        F.least("id_a", "id_b").cast("long").alias("id_a"),
        F.greatest("id_a", "id_b").cast("long").alias("id_b"),
    ).transform(_barrier)
    und = pairs.select(F.col("id_a").alias("u")).unionByName(
        pairs.select(F.col("id_b").alias("u"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    tri = triangles_per_node(pairs, "id_a", "id_b")
    d = F.col("degree")
    return (
        deg.where(d >= 2)
        .join(tri, deg["u"] == tri["id"], "left")
        .select(
            F.col("u").alias("vec_id"),
            d.cast("bigint").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
            F.round(
                F.coalesce(F.col("n_tri"), F.lit(0)) * 2.0 * 1000000
                / (d * (d - 1))
            )
            .cast("bigint")
            .alias("coeff_e6"),
        )
    )


def _g11_oracle() -> str:
    """g1's unrolled integer recurrence with the restart mass concentrated
    on the seed set (vec_id % 500 = 0, the g3 anchor convention): r0 is
    scale on seeds / 0 elsewhere, and each iteration's teleport term is
    150000·[dst ∈ seeds] via max() of the constant-per-receiver flag."""
    iter_ctes, prev = [], "r0"
    for i in range(1, 6):
        iter_ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS id,
         CAST(150000 * max(CASE WHEN sd.id IS NOT NULL THEN 1 ELSE 0 END)
              + (85 * sum({prev}.r // deg.d)) // 100 AS BIGINT) AS r
  FROM e JOIN {prev} ON {prev}.id = e.src
         JOIN deg ON deg.src = e.src
         LEFT JOIN sd ON sd.id = e.dst
  GROUP BY e.dst)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iter_ctes)
    return f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
sd AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 50 = 0),
r0 AS (SELECT deg.src AS id,
              CAST(CASE WHEN sd.id IS NOT NULL THEN 1000000 ELSE 0 END
                   AS BIGINT) AS r
       FROM deg LEFT JOIN sd ON sd.id = deg.src),
{chain}
SELECT id AS vec_id, r AS ppr_e6 FROM r5
"""


@_register("g11_personalized_pagerank", _g11_oracle())
def g11_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Personalized PageRank (random walk with restart) from the curated
    anchor set (vec_id % 50 = 0 — denser than g3's query-set convention so
    the walk has in-graph sources at every driver scale) over the v2
    near-duplicate pair graph —
    the SMOOTH proximity-to-vetted-examples score whose hard-threshold
    counterpart is g3's hop distance: g3 says "within k dup-hops of a
    known-good doc", g11 says how strongly all walk paths tie the node to
    the anchors (multiplicity and path length both count).  Integer-exact
    like g1: rank ×1e6, truncating division, restart mass only on seeds
    — so Spark's iterated join-aggregate and the oracle's unrolled CTE
    chain agree bit-for-bit.  Scale shape: per iteration one src-keyed
    hash join + one dst-keyed map-combined aggregation; the seed flag
    rides the edge list (joined ONCE before the loop), so no extra
    per-iteration exchange vs g1 (see
    ``operators/graph.py:personalized_pagerank_int``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import (
        personalized_pagerank_int,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    seeds = emb.where(F.col("vec_id") % 50 == 0).select("vec_id")
    return personalized_pagerank_int(
        pairs, "id_a", "id_b", seeds, "vec_id", iters=5
    ).select(F.col("id").alias("vec_id"), "ppr_e6")


def _g12_oracle() -> str:
    return f"""
WITH pairs AS ({_v2_oracle()}),
pe AS (SELECT id_a AS a, id_b AS b FROM pairs),
e AS (SELECT a AS src, b AS dst FROM pe UNION ALL SELECT b, a FROM pe),
cn AS (SELECT pe.a, pe.b, count(*) AS n
       FROM pe JOIN e x ON x.src = pe.a
               JOIN e y ON y.src = pe.b AND y.dst = x.dst
       GROUP BY pe.a, pe.b)
SELECT pe.a AS id_a, pe.b AS id_b,
       CAST(coalesce(cn.n, 0) AS BIGINT) AS n_common,
       CAST(CASE WHEN coalesce(cn.n, 0) = 0 THEN 1 ELSE 0 END AS INTEGER)
         AS is_bridge
FROM pe LEFT JOIN cn ON cn.a = pe.a AND cn.b = pe.b
"""


@_register("g12_local_bridges", _g12_oracle())
def g12_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-bridge detection over the v2 near-duplicate pair graph:
    per-EDGE common-neighbor support, zero meaning the edge is a LOCAL
    BRIDGE (its endpoints share no other connection) — the
    edge-granularity refinement of g10's per-node clustering
    coefficient: g10 scores how clique-like a NODE's neighborhood is,
    g12 pinpoints WHICH edges are the template accidents / hash
    collisions stitching unrelated neighborhoods together, the exact
    edges a dedup keeper election must not contract across (cutting
    them splits spurious mega-clusters; t52 measures that pathology,
    g12 locates its causes).  Scale shape: one wedge join + per-edge
    count + zero-fill, all (int64, int64) node-keyed shuffles; the LSH
    pair lineage checkpoints once (``operators/graph.py:
    edge_common_neighbors``)."""
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
    cn = edge_common_neighbors(pairs, "id_a", "id_b")
    return cn.select(
        "id_a",
        "id_b",
        "n_common",
        F.when(F.col("n_common") == 0, 1).otherwise(0).cast("int").alias(
            "is_bridge"
        ),
    )


def _g13_oracle() -> str:
    rnd = """
n{i} AS (SELECT e.a AS v, l{p}.lbl, count(*) AS c
        FROM e JOIN l{p} ON l{p}.v = e.b GROUP BY e.a, l{p}.lbl),
p{i} AS (SELECT v, lbl, row_number() OVER (PARTITION BY v
                                           ORDER BY c DESC, lbl) AS rk
        FROM n{i}),
l{i} AS (SELECT v, lbl FROM p{i} WHERE rk = 1)"""
    return (
        f"""
WITH pairs AS ({_v2_oracle()}),
pe AS (SELECT id_a AS a, id_b AS b FROM pairs),
e AS (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM e),"""
        + rnd.format(i=1, p=0)
        + ","
        + rnd.format(i=2, p=1)
        + """
SELECT v AS node, CAST(lbl AS BIGINT) AS community FROM l2
"""
    )


@_register("g13_label_propagation", _g13_oracle())
def g13_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007)
    over the loose cosine>=0.3 near-dup graph, 2 synchronous rounds,
    deterministic (count DESC, label) adoption — finds locally-DENSE
    communities where t11/v4's closure finds connected components: a
    thin chain of template accidents cannot carry a label across two
    dup cliques in 2 rounds, so this is the iterative counterpart of
    v21's structural bridge cut (v21 deletes the weak edges, g13
    out-votes them).  The fixed unroll is what makes the exact oracle
    possible; production tiers would run rounds to label-change
    convergence with the same per-round plan.  Scale shape: per round
    ONE label join on the bidirectional edge list + (node, label)
    count + per-node argmax window — (int64, int64) shuffles only,
    labels checkpoint per round (``operators/graph.py:
    label_propagation``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import (
        label_propagation,
    )
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    return label_propagation(pairs, "id_a", "id_b", rounds=2)


def _g14_oracle() -> str:
    sweep = """
a{i} AS (SELECT e.dst AS id, CAST(sum(h{p}.h) AS BIGINT) AS a
         FROM e JOIN h{p} ON h{p}.id = e.src GROUP BY e.dst),
h{i} AS (SELECT e.src AS id, CAST(sum(a{i}.a) AS BIGINT) AS h
         FROM e JOIN a{i} ON a{i}.id = e.dst GROUP BY e.src)"""
    return (
        f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs),
n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
h0 AS (SELECT id, CAST(1 AS BIGINT) AS h FROM n),"""
        + sweep.format(i=1, p=0)
        + ","
        + sweep.format(i=2, p=1)
        + """
SELECT n.id AS vec_id, CAST(coalesce(a2.a, 0) AS BIGINT) AS auth,
       CAST(coalesce(h2.h, 0) AS BIGINT) AS hub
FROM n LEFT JOIN a2 ON a2.id = n.id LEFT JOIN h2 ON h2.id = n.id
"""
    )


@_register("g14_hits", _g14_oracle())
def g14_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub/authority decomposition (HITS, Kleinberg 1999) of the v2
    near-duplicate graph read as a DIRECTED relation — edges point
    low vec_id → high vec_id, i.e. crawl order, so a HUB is an origin
    whose content spreads into many well-copied later documents and an
    AUTHORITY is a later document assembled from many productive
    origins: the mirror-farm/aggregator signature that g1's single
    PageRank score cannot separate (a node central in ONE role scores
    the same as a node central in both).  Two full integer sweeps,
    un-normalized (normalization only rescales a linear update, so
    rankings are exact and both engines stay in int64 — no float norm
    anywhere).  Scale shape: per half-sweep ONE node-keyed hash join +
    one map-combined sum of (int64, int64) rows; the LSH pair lineage
    checkpoints once (``operators/graph.py:hits_int``)."""
    from spark_ml_spatialjointransformer_spark.operators.graph import hits_int
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    return hits_int(pairs, "id_a", "id_b", iters=2).select(
        F.col("id").alias("vec_id"), "auth", "hub"
    )


#: g15 correlation arithmetic: same floor(x + 0.5) scaled-int form as d30
#: — num/den are exact int64 sums, only the final ratio touches doubles.
_G15_ORACLE = f"""
WITH pairs AS ({_v2_oracle()}),
e AS (SELECT id_a AS a, id_b AS b FROM pairs),
und AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
de AS (SELECT da.d AS x, db.d AS y
       FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b),
sym AS (SELECT x, y FROM de UNION ALL SELECT y AS x, x AS y FROM de),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM sym)
SELECT n // 2 AS n_edges,
       CAST(floor((n * sxy - sx * sy) * 1000000e0
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) + 0.5e0)
            AS BIGINT) AS assortativity_e6
FROM m
WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""


@_register("g15_degree_assortativity", _G15_ORACLE)
def g15_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the v2 near-duplicate graph:
    the Pearson correlation of endpoint degrees over the symmetrized
    edge list — ONE number that separates the two dedup-graph shapes
    every other g-query measures locally: clone FAMILIES (high-degree
    nodes linking to high-degree nodes → positive) vs template STARS
    (boilerplate hubs linking to degree-1 leaves → negative).  Negative
    assortativity tells the curation pipeline its pair volume is
    template-driven, so keeper election (t9/t55) will under-dedup unless
    the template is stripped first; the per-node g10 coefficient cannot
    see this — it is blind to WHO the neighbors are.  Arithmetic is
    d30's scaled-int correlation: int64 sums, one final double ratio,
    floor(x·1e6 + 0.5).  Scale shape: the pair list computes once
    (lineage barrier), degrees are one map-combinable count, attaching
    them is two id-keyed hash joins of (int64, int64) rows, and the
    moment rollup is a single-row global aggregate — nothing downstream
    of the LSH join carries more than two longs per edge."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    raw = lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=_EMB_DIM, threshold=0.3,
        n_planes=6, bands=2, quantized=True,
    )
    pairs = raw.select(
        F.col("id_a").cast("long").alias("a"),
        F.col("id_b").cast("long").alias("b"),
    ).transform(_barrier)
    und = pairs.select(F.col("a").alias("u")).unionByName(
        pairs.select(F.col("b").alias("u"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    de = (
        pairs.join(deg.withColumnsRenamed({"u": "a", "d": "x"}), "a")
        .join(deg.withColumnsRenamed({"u": "b", "d": "y"}), "b")
        .select("x", "y")
    )
    sym = de.unionByName(de.select(F.col("y").alias("x"), F.col("x").alias("y")))
    m = sym.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        m.where((varx > 0) & (vary > 0))
        .select(
            F.expr("n div 2").alias("n_edges"),
            F.floor(
                num * 1000000.0 / (F.sqrt(varx) * F.sqrt(vary)) + 0.5
            )
            .cast("bigint")
            .alias("assortativity_e6"),
        )
    )
