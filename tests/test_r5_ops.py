"""Hand-built-fixture tests for the r5-late operators: edge cases the
parquet oracles only hit by luck — ties, gaps, missing keys, batch
boundaries, and a reference recurrence for PageRank."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


class TestMaxSim:
    def test_matches_numpy_brute_force_across_small_batches(self, spark):
        """Force many Arrow batches (maxRecordsPerBatch=7) and check the
        distributed local-top-k + global window equals a single-matrix
        numpy MaxSim — batch-boundary bugs in the local top-k would show
        here."""
        from spark_ml_spatialjointransformer_spark.operators.similarity import (
            maxsim_topk,
        )

        rng = np.random.default_rng(11)
        n, dim, nsub, k = 60, 16, 4, 3
        vecs = rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(map(list, vecs))}
        )
        df = spark.createDataFrame(pdf)
        q = df.filter(F.col("vec_id") % 20 == 0)

        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        try:
            got = sorted(
                tuple(r)
                for r in maxsim_topk(
                    df, q, "vec_id", "embedding", "vec_id", "embedding",
                    k=k, n_sub=nsub,
                ).collect()
            )
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

        # numpy reference on the same quantization
        Z = np.floor(vecs.astype(np.float64) * 100000.0 + 0.5).astype(np.int64)
        Zs = Z.reshape(n, nsub, dim // nsub)
        want = []
        for qi in range(0, n, 20):
            scores = np.zeros(n, dtype=np.int64)
            for qa in range(nsub):
                dots = np.stack(
                    [Zs[:, cb, :] @ Zs[qi, qa, :] for cb in range(nsub)]
                )
                scores += dots.max(axis=0)
            order = sorted(
                (i for i in range(n) if i != qi),
                key=lambda i: (-scores[i], i),
            )[:k]
            want.extend((qi, i, int(scores[i])) for i in order)
        assert got == sorted(want)


class TestSCD2Ties:
    def test_same_timestamp_ties_pin_by_event_id(self, spark, tmp_path):
        """Two state changes at the SAME timestamp must collapse in
        event_id order (the documented tiebreak), giving one zero-length
        interval, not a nondeterministic merge."""
        from spark_ml_spatialjointransformer_spark.queries import d8_scd2

        rows = [
            (1, "a", "2024-01-01 00:00:00", 10),
            (1, "b", "2024-01-01 00:00:00", 11),  # same ts, later id
            (1, "b", "2024-01-01 01:00:00", 12),
            (1, "a", "2024-01-01 02:00:00", 13),
        ]
        pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
        df = spark.createDataFrame(pdf).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        d = str(tmp_path)
        df.select("event_id", "ts", "user_id", "event_type").write.mode(
            "overwrite"
        ).parquet(f"{d}/events.parquet")
        out = sorted(
            (r.event_type, r.valid_from_us, r.valid_to_us, r.n_rows, r.is_current)
            for r in d8_scd2(spark, d).collect()
        )
        t0 = 1704067200_000000
        h = 3600_000000
        assert out == [
            ("a", t0, t0, 1, False),          # zero-length run, id 10
            ("a", t0 + 2 * h, -1, 1, True),   # current run
            ("b", t0, t0 + 2 * h, 2, False),  # ids 11+12 merged
        ]


class TestGapFill:
    def test_forward_fill_carries_last_observed_value(self, spark, tmp_path):
        from spark_ml_spatialjointransformer_spark.queries import d7_gap_fill

        rows = [
            (1, "2024-01-01 05:00:00", 1.0),
            (1, "2024-01-04 05:00:00", 2.5),  # 2-day gap before this
        ]
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        df = (
            spark.createDataFrame(pdf)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withColumn("event_id", F.lit(1))
            .withColumn("event_type", F.lit("x"))
            .withColumn("props", F.lit("{}"))
        )
        d = str(tmp_path)
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = sorted(
            (r.day_idx, r.filled_e4, r.is_gap) for r in d7_gap_fill(spark, d).collect()
        )
        d0 = out[0][0]
        assert out == [
            (d0, 10000, False),
            (d0 + 1, 10000, True),   # carried forward
            (d0 + 2, 10000, True),   # still carried
            (d0 + 3, 25000, False),
        ]


class TestAsofEnrich:
    def test_event_before_first_dim_row_gets_nulls(self, spark):
        """Batch-mode probe of the streaming enrichment kernel (mapInPandas
        is source-agnostic): an event before the user's first order and a
        user absent from the dimension both yield NULL enrichment."""
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            asof_enrich_stream,
        )

        ev = spark.createDataFrame(
            pd.DataFrame(
                {
                    "event_id": [1, 2, 3],
                    "user_id": [7, 7, 9],  # user 9 has no dim rows
                    "ts": pd.to_datetime(
                        ["2024-01-01", "2024-03-01", "2024-03-01"]
                    ),
                }
            )
        )
        feb1 = 1706745600_000000
        dim = [(7, feb1, 100, 5000)]
        out = {r.event_id: (r.order_key, r.total_e2)
               for r in asof_enrich_stream(ev, dim).collect()}
        assert out == {1: (None, None), 2: (100, 5000), 3: (None, None)}


class TestPageRank:
    def test_matches_reference_recurrence_on_known_graph(self, spark):
        """Triangle {1,2,3} plus pendant 4–1: iterate the integer
        recurrence in plain Python and demand bit-equality."""
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            pagerank_int,
        )

        pairs = [(1, 2), (2, 3), (1, 3), (1, 4)]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r.id: r.pr_e6 for r in pagerank_int(df, "a", "b", iters=5).collect()}

        edges = pairs + [(b, a) for a, b in pairs]
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {v: 1_000_000 for v in deg}
        for _ in range(5):
            s = {v: 0 for v in deg}
            for u, v in edges:
                s[v] += r[u] // deg[u]
            r = {v: 150_000 + (85 * s[v]) // 100 for v in deg}
        assert got == r
        # pendant-adjacent hub outranks the symmetric pair
        assert got[1] > got[2] == got[3] > got[4]


class TestTriangles:
    def test_known_graph_counts(self, spark):
        """K4 on {1,2,3,4} (4 triangles, 3 per node) plus a pendant 5–1
        (no triangle) plus a disjoint triangle {6,7,8}; brute-force every
        node triple as the oracle."""
        from itertools import combinations

        from spark_ml_spatialjointransformer_spark.operators.graph import (
            triangles_per_node,
        )

        pairs = list(combinations([1, 2, 3, 4], 2)) + [
            (1, 5), (6, 7), (7, 8), (6, 8),
        ]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r.id: r.n_tri for r in triangles_per_node(df, "a", "b").collect()}

        es = {frozenset(p) for p in pairs}
        nodes = sorted({n for p in pairs for n in p})
        want: dict = {}
        for t in combinations(nodes, 3):
            if all(frozenset(e) in es for e in combinations(t, 2)):
                for n in t:
                    want[n] = want.get(n, 0) + 1
        assert got == want
        assert got[1] == 3 and 5 not in got and got[6] == 1

    def test_orientation_beats_hub_skew(self, spark):
        """Star hub 0 with 30 leaves, leaves pairwise unconnected except
        one closing edge: exactly one triangle, and the oriented wedge
        count stays O(1) per leaf (orientation points INTO the hub)."""
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            triangles_per_node,
        )

        pairs = [(0, i) for i in range(1, 31)] + [(1, 2)]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r.id: r.n_tri for r in triangles_per_node(df, "a", "b").collect()}
        assert got == {0: 1, 1: 1, 2: 1}


class TestAsofGuard:
    def test_oversized_dimension_raises_with_routing_hint(self, spark):
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            asof_enrich_stream,
        )

        ev = spark.createDataFrame(
            pd.DataFrame(
                {"event_id": [1], "user_id": [1],
                 "ts": pd.to_datetime(["2024-01-01"])}
            )
        )
        dim = [(1, 0, 1, 1), (2, 0, 2, 2), (3, 0, 3, 3)]
        with pytest.raises(ValueError, match="asof_join"):
            asof_enrich_stream(ev, dim, max_dim_rows=2)

    def test_dataframe_dimension_guard_counts_before_collect(self, spark):
        """DataFrame dimensions hit a distributed count() guard BEFORE any
        collect — the failure mode that matters at scale is the collect
        itself, so the refusal must come first."""
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            asof_enrich_stream,
        )

        ev = spark.createDataFrame(
            pd.DataFrame(
                {"event_id": [1], "user_id": [1],
                 "ts": pd.to_datetime(["2024-01-01"])}
            )
        )
        dim_df = spark.createDataFrame(
            [(i, 0, i, i) for i in range(5)],
            "user_id long, ts_us long, order_key long, total_e2 long",
        )
        with pytest.raises(ValueError, match="asof_join"):
            asof_enrich_stream(ev, dim_df, max_dim_rows=2)
        # under the bound, the DataFrame path collects and enriches
        feb1 = 1706745600_000000
        ok_df = spark.createDataFrame(
            [(7, feb1, 100, 5000)],
            "user_id long, ts_us long, order_key long, total_e2 long",
        )
        ev2 = spark.createDataFrame(
            pd.DataFrame(
                {"event_id": [2], "user_id": [7],
                 "ts": pd.to_datetime(["2024-03-01"])}
            )
        )
        out = asof_enrich_stream(ev2, ok_df).collect()
        assert [(r.order_key, r.total_e2) for r in out] == [(100, 5000)]


class TestPageRankProperty:
    def test_random_graphs_match_reference(self, spark):
        """Randomized cross-check: several random pair graphs, each checked
        bit-for-bit against the plain-Python recurrence (the generalized
        form of the known-graph test)."""
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            pagerank_int,
        )

        rng = np.random.default_rng(23)
        for trial in range(3):
            n = int(rng.integers(5, 30))
            # cap by the graph's maximum distinct pair count, or the
            # rejection loop below can never terminate for small n
            m = min(int(rng.integers(4, 60)), n * (n - 1) // 2)
            pairs = set()
            while len(pairs) < m:
                a, b = rng.integers(0, n, size=2)
                if a != b:
                    pairs.add((int(min(a, b)), int(max(a, b))))
            pairs = sorted(pairs)
            df = spark.createDataFrame(pairs, "a long, b long")
            got = {
                r.id: r.pr_e6 for r in pagerank_int(df, "a", "b", iters=4).collect()
            }

            edges = list(pairs) + [(b, a) for a, b in pairs]
            deg = {}
            for s, _ in edges:
                deg[s] = deg.get(s, 0) + 1
            r = {v: 1_000_000 for v in deg}
            for _ in range(4):
                s = {v: 0 for v in deg}
                for u, v in edges:
                    s[v] += r[u] // deg[u]
                r = {v: 150_000 + (85 * s[v]) // 100 for v in deg}
            assert got == r, f"trial {trial}: {sorted(got.items())[:3]}..."


class TestBfsHops:
    def test_known_graph_hops(self, spark):
        """Path 0-1-2-3-4 plus branch 2-5, seeds {0}: hops are the path
        distances, capped at iters; unreached nodes absent."""
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            bfs_hops,
        )

        pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5)]
        df = spark.createDataFrame(pairs, "a long, b long")
        seeds = spark.createDataFrame([(0,)], "vec_id long")
        got = {
            r.id: r.hops
            for r in bfs_hops(df, "a", "b", seeds, "vec_id", iters=3).collect()
        }
        # node 4 is 4 hops away — beyond iters=3, so absent
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 5: 3}

    def test_multi_source_takes_nearest_and_isolated_seed(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            bfs_hops,
        )

        pairs = [(1, 2), (2, 3)]
        df = spark.createDataFrame(pairs, "a long, b long")
        # seeds at both ends; 99 is isolated (still emitted at 0)
        seeds = spark.createDataFrame([(1,), (3,), (99,)], "vec_id long")
        got = {
            r.id: r.hops
            for r in bfs_hops(df, "a", "b", seeds, "vec_id", iters=4).collect()
        }
        assert got == {1: 0, 2: 1, 3: 0, 99: 0}


class TestTrianglesProperty:
    def test_random_graphs_match_brute_force(self, spark):
        """Randomized cross-check for the degree-oriented counter: random
        pair graphs vs brute-force enumeration of every node triple."""
        from itertools import combinations

        from spark_ml_spatialjointransformer_spark.operators.graph import (
            triangles_per_node,
        )

        rng = np.random.default_rng(41)
        for trial in range(3):
            n = int(rng.integers(6, 25))
            m = min(int(rng.integers(8, 80)), n * (n - 1) // 2)
            pairs = set()
            while len(pairs) < m:
                a, b = rng.integers(0, n, size=2)
                if a != b:
                    pairs.add((int(min(a, b)), int(max(a, b))))
            pairs = sorted(pairs)
            df = spark.createDataFrame(pairs, "a long, b long")
            got = {
                r.id: r.n_tri
                for r in triangles_per_node(df, "a", "b").collect()
            }
            es = set(map(frozenset, pairs))
            want: dict = {}
            for t in combinations(range(n), 3):
                if all(frozenset(e) in es for e in combinations(t, 2)):
                    for v in t:
                        want[v] = want.get(v, 0) + 1
            assert got == want, f"trial {trial}"


class TestPQCodes:
    def test_adc_scores_match_python_reference(self, spark):
        """Random embeddings through the distributed PQ pipeline must match
        a from-scratch Python replay (codebook, argmin assignment with
        first-minimum ties, LUT scoring, top-k with id ties)."""
        from spark_ml_spatialjointransformer_spark.operators.similarity import (
            pq_adc_topk,
            pq_codebook,
        )

        rng = np.random.default_rng(5)
        n, dim, k = 40, 64, 4
        vecs = rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64),
             "embedding": list(map(list, vecs))}
        )
        df = spark.createDataFrame(pdf)
        q = df.filter(F.col("vec_id") % 13 == 0)
        got = sorted(
            tuple(r)
            for r in pq_adc_topk(
                df, q, "vec_id", "embedding", "vec_id", "embedding", k=k
            ).collect()
        )

        cb = pq_codebook()
        Z = np.floor(vecs.astype(np.float64) * 100000.0 + 0.5).astype(np.int64)
        Zs = Z.reshape(n, 4, 16)
        codes = np.array(
            [
                [
                    int(np.argmin(((Zs[i, a] - cb[a]) ** 2).sum(axis=1)))
                    for a in range(4)
                ]
                for i in range(n)
            ]
        )
        want = []
        for qi in range(0, n, 13):
            lut = np.einsum("ad,acd->ac", Zs[qi], cb)
            scores = np.array(
                [sum(lut[a, codes[i, a]] for a in range(4)) for i in range(n)]
            )
            order = sorted(
                (i for i in range(n) if i != qi),
                key=lambda i: (-scores[i], i),
            )[:k]
            want.extend((qi, i, int(scores[i])) for i in order)
        assert got == sorted(want)
