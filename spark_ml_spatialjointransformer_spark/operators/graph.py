"""Graph analytics over edge lists (beyond the transitive closure in
``dedup.py``): link-analysis ranking via integer-exact PageRank and
degree-oriented triangle counting.

The join-aggregate PageRank is the canonical distributed formulation:
each iteration is one (edges ⋈ ranks) hash join keyed on the source id
plus one destination-keyed aggregation — both shuffles key on node ids
only, state is O(nodes + edges), and the iteration count is fixed and
small.  All arithmetic is non-negative int64 (rank scaled by 1e6,
truncating division for both the contribution split and the damping
factor), so the result is bit-identical between Spark and a DuckDB
replay of the same recurrence — `div` (truncate) and `//` (floor) agree
on the non-negative domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.operators._compat import (
    barrier as _barrier,
)


def pagerank_int(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    iters: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer PageRank over the UNDIRECTED graph given as unique pairs.

    Recurrence (all int64, non-negative):
        r0(v)   = scale
        c_i(u)  = r_i(u) div deg(u)
        r_i+1(v)= 0.15·scale + (85 · Σ_{u→v} c_i(u)) div 100

    Every node of an undirected pair list has deg ≥ 1 and receives at
    least one contribution, so each iteration covers every node.  Fixed
    ``iters`` (not convergence-tested) keeps the plan shape static and
    the oracle replayable as an unrolled CTE chain.

    Scale shape: per iteration one src-keyed hash join + one dst-keyed
    aggregation with map-side combine — node-id shuffles only.  The edge
    list (the one input every iteration re-reads) is checkpointed ONCE;
    the rank lineage itself stays lazy — with a FIXED small iteration
    count the plan depth is bounded, and skipping the per-round
    materialization barrier saves ~1 s/round of job-scheduling overhead
    (an unbounded convergence loop like the t11 closure still needs its
    per-round checkpoint).

    Output: (id, pr_e6) — one row per node.
    """
    teleport = (15 * scale) // 100
    # the canonical pair list is read by BOTH union arms below; the lazy
    # checkpoint computes its (often LSH-self-join) lineage once — the
    # flip arm re-reads materialized (long, long) rows, not the refine
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    ).transform(_barrier)
    # checkpoint the expanded edge list ONCE — it is the subtree every
    # branch below re-reads (degree, the initial ranks, and the join in
    # every iteration), and without the barrier the potentially expensive
    # `pairs` lineage (e.g. an LSH self-join) would compile into — and
    # execute in — each of those branches
    e = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(_barrier)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__d"))
    # edges with their source degree attached; identical deg exchanges
    # across iterations collapse via ReusedExchange in the single plan
    ed = e.join(deg, "src")
    ranks = deg.select("src", F.lit(scale).cast("long").alias("__r"))
    for _ in range(iters):
        contrib = ed.join(ranks, "src").select(
            F.col("dst").alias("src"),  # next iteration keys on the receiver
            F.expr("__r div __d").alias("__c"),
        )
        ranks = contrib.groupBy("src").agg(
            F.expr(f"CAST({teleport} + (85 * sum(__c)) div 100 AS BIGINT)").alias(
                "__r"
            )
        )
    return ranks.select(F.col("src").alias("id"), F.col("__r").alias("pr_e6"))


def bfs_hops(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    seeds: DataFrame,
    id_col: str,
    iters: int = 4,
) -> DataFrame:
    """Multi-source BFS over the undirected pair graph: hop distance from
    every node to its nearest SEED, bounded at ``iters`` hops — the
    frontier-relaxation iteration pattern (each round improves distances
    through one more edge), distinct from both PageRank's fixed-point
    recurrence and the closure's label propagation.

    Round ``i``: dist_i(v) = min(dist_{i-1}(v), min over edges u→v of
    dist_{i-1}(u) + 1) — relationally one src-keyed hash join + one
    dst-keyed min-aggregation, node-id shuffles only, all int64.  A
    fixed ``iters`` keeps the plan depth bounded (lazy lineage, no
    per-round barrier — the g1 trade-off) and the oracle replayable as
    an unrolled CTE chain; unreached nodes simply never appear
    (no sentinel infinities to reconcile across engines).

    Output: (id, hops) for every node within ``iters`` of a seed —
    seeds themselves at 0, isolated seeds included.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).transform(_barrier)  # pair lineage computes once (see g1)
    # bucketed ONCE on the relaxation join key: each checkpointed round is
    # its own job, so an unbucketed edge list would re-shuffle per round
    # once the frontier outgrows AQE's broadcast threshold (LogicalRDD
    # preserves the partitioning across rounds — the dedup-closure trade)
    par = pairs.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(par, "src")
        .transform(_barrier)
    )
    d = seeds.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(0).cast("long").alias("hops"),
    )
    for _ in range(iters):
        nxt = e.join(d, F.col("src") == F.col("id")).select(
            F.col("dst").alias("id"), (F.col("hops") + 1).alias("hops")
        )
        d = (
            d.unionByName(nxt)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            # each round reads d TWICE (the union arm and the join arm):
            # without truncation the lineage doubles per round — 2^iters
            # copies of round 1 in the final plan.  The lazy checkpoint
            # makes each round's table compute once (g1 skips this only
            # because its rank is read once per round).
            .transform(_barrier)
        )
    return d


#: orientation-key multiplier: key = degree · _KEY + node id gives the
#: (degree, id) lexicographic total order as ONE int64 comparison that both
#: Spark and a SQL replay compute identically; ids must stay below it.
_ORIENT_KEY = 10_000_000


def triangles_per_node(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED graph given as unique
    canonical pairs (each {u,v} exactly once) — the compact-forward /
    degree-orientation algorithm every distributed triangle counter uses:

    1. direct each edge from its lower-(degree, id) endpoint to the
       higher one — a total order, so the directed graph is acyclic and
       every triangle has exactly ONE wedge u→v, u→w with v before w;
    2. wedges come from the oriented list self-joined on the source —
       orientation bounds each node's out-degree by O(√edges) (arboricity),
       which is what caps the wedge fanout a naive all-pairs self-join
       has no defense against;
    3. a wedge closes iff (v, w) is itself an oriented edge — a hash join
       against the same edge list, no membership broadcast needed.

    Scale shape: node-id-keyed shuffles only (degree agg, two degree
    attaches, the src-keyed wedge join whose two arms are the identical
    oriented subtree — runtime ReusedExchange — and the closing-edge
    join); ids and degrees ride as int64, payloads never enter.  The
    pair lineage (often an expensive LSH self-join) checkpoints once.

    Output: (id, n_tri) — one row per node in ≥ 1 triangle.
    """
    e0 = pairs.select(
        F.least(F.col(a_col), F.col(b_col)).cast("long").alias("a"),
        F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("b"),
    ).transform(_barrier)
    und = e0.select(F.col("a").alias("u")).unionByName(
        e0.select(F.col("b").alias("u"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
    # ids at/above the multiplier would collide the packed key (e.g.
    # deg=2,id=5 vs deg=1,id=10000005) and silently undercount — fail
    # loud instead.  The guard rides inside the key expression (coalesce
    # of an always-NULL assert) so Catalyst cannot prune it and it costs
    # no extra job.
    _guard = F.coalesce(
        F.assert_true(
            F.col("u") < _ORIENT_KEY,
            F.lit(
                "triangles_per_node: node id >= 10^7 collides the packed "
                "(degree, id) orientation key — densify ids first "
                "(e.g. zipWithIndex-style re-map) or raise _ORIENT_KEY"
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    key = (F.col("__d") * _ORIENT_KEY + _guard).cast("long")
    ka = deg.select(F.col("u").alias("a"), (key + F.col("u")).alias("__ka"))
    kb = deg.select(F.col("u").alias("b"), (key + F.col("u")).alias("__kb"))
    lt = F.col("__ka") < F.col("__kb")
    # checkpoint the oriented list too: three consumers below (both wedge
    # arms + the closing-edge probe) would otherwise each re-derive the
    # degree-attach joins — this is the subtree every triangle step reads
    oriented = (
        e0.join(ka, "a")
        .join(kb, "b")
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.greatest("__ka", "__kb").alias("__dkey"),
        )
        .transform(_barrier)
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (F.col("x.__dkey") < F.col("y.__dkey")),
    ).select(
        F.col("x.src").alias("u"),
        F.col("x.dst").alias("v"),
        F.col("y.dst").alias("w"),
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    nodes = (
        tri.select(F.col("u").alias("id"))
        .unionByName(tri.select(F.col("v").alias("id")))
        .unionByName(tri.select(F.col("w").alias("id")))
    )
    return nodes.groupBy("id").agg(F.count(F.lit(1)).alias("n_tri"))


def kcore(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """Bounded k-core peeling over the undirected pair graph: each round
    simultaneously deletes every node whose CURRENT degree is < ``k``
    (and all its edges), the classic dense-subgraph extraction that
    separates a duplicate cluster's core from its sparse fringe.  A
    fixed ``rounds`` (not peel-to-fixpoint) keeps the plan depth bounded
    and the oracle replayable as an unrolled CTE chain; the survivors of
    round ``rounds`` are a superset of the true k-core that equals it
    once no round removes anything.

    Scale shape: per round one map-combined degree aggregation plus two
    semi-joins of the edge list against the (node-id only) keep set —
    everything shuffles on int64 node ids, and the edge list SHRINKS
    monotonically.  Each round reads its predecessor's edges twice (the
    degree agg and the filter), so every round's survivor edge list is
    checkpointed (the g3 trade-off, not the g1 one).

    Output: (id, deg) for surviving nodes with their within-core degree.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).transform(_barrier)  # pair lineage computes once (see g1)
    e = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(_barrier)
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__d"))
        keep = deg.where(F.col("__d") >= k).select("src")
        e = (
            e.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .transform(_barrier)
        )
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("id"), "deg"
    )


def sssp_int(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    weight_col: str,
    seeds: DataFrame,
    id_col: str,
    iters: int = 4,
) -> DataFrame:
    """Bounded multi-source WEIGHTED shortest paths (Bellman-Ford rounds)
    over the undirected pair graph: minimum path cost from every node to
    its cheapest SEED using at most ``iters`` edges — the weighted
    generalization of ``bfs_hops`` (hop counts are the ``weight = 1``
    special case), and the fourth iterative graph pattern in this module
    (fixed-point recurrence / frontier relaxation / peeling / now
    distance relaxation).

    ``weight_col`` must be a non-negative int64 on the CANONICAL pair
    (attached before the direction flip, so both directions of an edge
    share it) — integer path costs make every round's min engine-exact.

    Round ``i``: dist_i(v) = min(dist_{i-1}(v), min over edges u→v of
    dist_{i-1}(u) + w(u,v)) — one src-keyed hash join + one min
    aggregation per round, int64 node-id/cost shuffles only.  Like
    ``bfs_hops`` the oracle replays as an unrolled CTE chain, unreached
    nodes never appear, and each round's table is lazily checkpointed
    because the union + join arms both read it (lineage would double
    per round otherwise).

    Output: (id, cost) for every node within ``iters`` edges of a seed;
    seeds at 0, even when isolated.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
        F.col(weight_col).cast("long").alias("__w"),
    ).transform(_barrier)  # pair lineage computes once (see g1)
    # bucketed once on the relaxation join key — see bfs_hops
    par = pairs.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
            )
        )
        .repartition(par, "src")
        .transform(_barrier)
    )
    d = seeds.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(0).cast("long").alias("cost"),
    )
    for _ in range(iters):
        nxt = e.join(d, F.col("src") == F.col("id")).select(
            F.col("dst").alias("id"),
            (F.col("cost") + F.col("__w")).alias("cost"),
        )
        d = (
            d.unionByName(nxt)
            .groupBy("id")
            .agg(F.min("cost").alias("cost"))
            .transform(_barrier)
        )
    return d


def personalized_pagerank_int(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    seeds: DataFrame,
    id_col: str,
    iters: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer personalized PageRank (random walk with restart) over the
    undirected pair graph: ``pagerank_int``'s recurrence with the restart
    mass concentrated on the SEED set instead of spread uniformly —
    proximity-to-seeds ranking (curation: "how close is this node to the
    vetted examples, weighted by all walk paths" — the smooth counterpart
    of ``bfs_hops``' hard hop distance).

    Recurrence (all int64, non-negative):
        r0(v)   = scale·[v ∈ seeds]
        c_i(u)  = r_i(u) div deg(u)
        r_i+1(v)= [v ∈ seeds]·(15·scale div 100) + (85 · Σ_{u→v} c_i(u)) div 100

    The seed indicator joins onto the EDGE list once before the loop
    (keyed by receiver), so each iteration stays exactly one src-keyed
    hash join + one dst-keyed aggregation with map-side combine — the
    same two-exchange-per-round budget as ``pagerank_int``; the teleport
    term folds into the aggregate as ``max`` of the constant-per-receiver
    flag.  Fixed ``iters`` keeps the plan static and the oracle an
    unrolled CTE chain; truncating division on the non-negative domain
    makes Spark `div` and DuckDB `//` agree bit-for-bit.

    Output: (id, ppr_e6) — one row per node of the pair graph (nodes the
    walk never reaches carry 0, so row sets match engine-for-engine).
    """
    teleport = (15 * scale) // 100
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).transform(_barrier)  # pair lineage computes once (see g1)
    e = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(_barrier)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__d"))
    sd = seeds.select(
        F.col(id_col).cast("long").alias("dst"),
        F.lit(1).cast("long").alias("__s"),
    )
    # receiver-side seed flag rides the edge list: no per-iteration
    # node-keyed teleport join
    ed = (
        e.join(deg, "src")
        .join(sd, "dst", "left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(0)))
    )
    ranks = deg.join(
        sd.withColumnRenamed("dst", "src"), "src", "left"
    ).select(
        "src",
        (F.coalesce(F.col("__s"), F.lit(0)) * scale).cast("long").alias("__r"),
    )
    for _ in range(iters):
        contrib = ed.join(ranks, "src").select(
            F.col("dst").alias("src"),  # next iteration keys on the receiver
            F.col("__s"),
            F.expr("__r div __d").alias("__c"),
        )
        ranks = contrib.groupBy("src").agg(
            F.expr(
                f"CAST({teleport} * max(__s) + (85 * sum(__c)) div 100 AS BIGINT)"
            ).alias("__r")
        )
    return ranks.select(F.col("src").alias("id"), F.col("__r").alias("ppr_e6"))


def edge_common_neighbors(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-EDGE common-neighbor counts over the undirected pair graph:
    for each canonical pair (a, b), how many nodes are adjacent to BOTH —
    the edge-granularity triangle support.  n_common = 0 identifies a
    LOCAL BRIDGE (Easley/Kleinberg: an edge whose endpoints share no
    other connection), the edge-level counterpart of a low clustering
    coefficient: in a near-duplicate graph a zero-support edge is a
    template accident or hash collision joining two otherwise-unrelated
    neighborhoods — exactly the edges a keeper election must NOT
    contract across, where high-support edges sit inside genuine
    duplicate cliques.

    Relationally: one wedge join (edges from a × edges from b on the
    shared far endpoint) + a per-edge count + a zero-fill left join —
    the same O(Σ wedge) budget class as ``triangles_per_node`` but
    WITHOUT the degree-orientation machinery, because the output is per
    edge and each common neighbor must count exactly once per edge
    (orientation dedup is only needed when triangles would otherwise be
    triple-counted per NODE).  All shuffles move (int64, int64) rows
    keyed by node ids; the pair lineage checkpoints once.

    Output: (id_a, id_b, n_common) — one row per input pair, zero-filled.
    """
    pe = pairs.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    ).transform(_barrier)  # pair lineage computes once (see g1)
    e = pe.unionByName(
        pe.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(_barrier)
    x = e.select(F.col("a").alias("__xa"), F.col("b").alias("__w"))
    y = e.select(F.col("a").alias("__ya"), F.col("b").alias("__yw"))
    cn = (
        pe.join(x, pe["a"] == x["__xa"])
        .join(y, (pe["b"] == y["__ya"]) & (x["__w"] == y["__yw"]))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return pe.join(cn, ["a", "b"], "left").select(
        F.col("a").alias("id_a"),
        F.col("b").alias("id_b"),
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_common"),
    )


def label_propagation(
    pairs: DataFrame, a_col: str, b_col: str, rounds: int = 2
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the undirected pair graph: every node starts as its
    own label; each round it adopts the label held by the MOST of its
    neighbors (tie -> smallest label), all nodes updating from the same
    previous-round snapshot.  Deterministic by construction (the
    classic algorithm breaks ties randomly; the (count DESC, label)
    rule makes every round a pure function of the graph) and UNROLLED
    a fixed ``rounds`` deep so an exact SQL oracle can replay it —
    unlike Hash-Min closure (``dedup_connected_components``), which
    converges to connected components, a bounded propagation finds
    locally-dense COMMUNITIES: a thin chain of template accidents does
    not merge two dup cliques in 2 rounds, which is exactly the
    anti-chaining behavior a keeper election wants (the iterative
    counterpart of v21's structural bridge cut).

    Scale shape: per round ONE label join onto the bidirectional edge
    list + a (node, label) count + a per-node argmax window — every
    shuffle carries (int64, int64[, int64]) rows keyed by node id; the
    pair lineage checkpoints once and each round's labels checkpoint so
    round N+1 never recomputes round N.

    Output: (node, community) — one row per graph node.
    """
    from pyspark.sql.window import Window

    pe = pairs.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    ).transform(_barrier)
    edges = pe.unionByName(
        pe.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(_barrier)
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .transform(_barrier)
    )
    w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        nb = edges.join(
            labels.select(F.col("v").alias("__nv"), "lbl"),
            edges["b"] == F.col("__nv"),
        ).select(F.col("a").alias("v"), "lbl")
        labels = (
            nb.groupBy("v", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("v", "lbl")
            .transform(_barrier)
        )
    return labels.select(F.col("v").alias("node"), F.col("lbl").alias("community"))


def hits_int(
    pairs: DataFrame, a_col: str, b_col: str, iters: int = 2
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) over the pair list read as a
    DIRECTED graph (a_col → b_col): mutually-reinforcing hub and
    authority scores, ``iters`` full update sweeps —
    ``a_i(v) = Σ_{u→v} h_{i-1}(u)`` then ``h_i(u) = Σ_{u→v} a_i(v)``.
    The classic algorithm L2-normalizes between sweeps; normalization
    only rescales (both updates are linear), so the raw integer sums
    preserve the ranking exactly while keeping every value int64 and
    the oracle an unrolled CTE replay — no float norm on either engine.
    Magnitude bound: scores grow like (max degree)^(2·iters); at
    iters=2 a degree-10⁴ graph stays < 10¹⁶, inside int64.

    Unlike PageRank (g1 — a single EIGENVECTOR of the walk matrix),
    HITS separates the two ROLES a node plays in an asymmetric
    relation: on a duplication graph directed by crawl order, a high
    HUB is an origin whose content spreads into many strong sinks and
    a high AUTHORITY is a sink assembled from many strong origins —
    the mirror-farm / aggregator signature one score cannot expose.

    Every src has ≥1 out-edge and every dst ≥1 in-edge BY CONSTRUCTION
    of the edge list, so after the first sweep each side's aggregation
    covers exactly the src / dst node sets and the final zero-fill is
    only for nodes missing a side entirely (pure sources have auth 0,
    pure sinks hub 0).

    Scale shape: per half-sweep ONE node-id-keyed hash join + one
    map-side-combinable sum — (int64, int64) shuffles only; the edge
    list checkpoints once and with a fixed small ``iters`` the score
    lineage stays lazy (g1's trade).

    Output: (id, auth, hub) — one row per graph node.
    """
    if iters < 1:
        raise ValueError(
            f"hits_int needs at least one sweep, got iters={iters}"
        )
    e = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).transform(_barrier)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .transform(_barrier)
    )
    h = nodes.select("id", F.lit(1).cast("long").alias("h"))
    a = None
    for _ in range(iters):
        a = (
            e.join(h.select(F.col("id").alias("__u"), "h"), F.col("src") == F.col("__u"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").cast("long").alias("a"))
        )
        h = (
            e.join(a.select(F.col("id").alias("__v"), "a"), F.col("dst") == F.col("__v"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").cast("long").alias("h"))
        )
    return (
        nodes.join(a, "id", "left")
        .join(h, "id", "left")
        .select(
            "id",
            F.coalesce("a", F.lit(0)).cast("long").alias("auth"),
            F.coalesce("h", F.lit(0)).cast("long").alias("hub"),
        )
    )
