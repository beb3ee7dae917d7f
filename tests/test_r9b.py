"""Round-9 continuation batch: unit/semantic pins for f7/g14/d27/t57/
t58/j38/v22/e24 — constructed fixtures that pin the SEMANTICS the
sf-scale oracles exercise statistically (oracle parity lives in
test_oracle_parity.py; plan budgets in test_plan_budgets.py)."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F


class TestHitsInt:
    def test_star_hub_and_authority(self, spark):
        """A 'hub' node pointing at 3 sinks and a 'sink' fed by 3
        sources separate into the two roles; hand-unrolled 2-sweep
        values confirm the un-normalized integer recurrence."""
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            hits_int,
        )

        # 1 -> {10, 11, 12}; {2, 3} -> 10  (node 10: strong authority;
        # node 1: strong hub; 2/3 weaker hubs; 11/12 weaker authorities)
        pairs = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10)], "a long, b long"
        )
        rows = {
            r.id: (r.auth, r.hub)
            for r in hits_int(pairs, "a", "b", iters=2).collect()
        }
        # sweep 1: a(10)=3, a(11)=a(12)=1; h(1)=3+1+1=5, h(2)=h(3)=3
        # sweep 2: a(10)=5+3+3=11, a(11)=a(12)=5; h(1)=11+5+5=21,
        #          h(2)=h(3)=11
        assert rows[10] == (11, 0)
        assert rows[11] == (5, 0)
        assert rows[12] == (5, 0)
        assert rows[1] == (0, 21)
        assert rows[2] == (0, 11)
        assert rows[3] == (0, 11)

    def test_pure_roles_zero_fill(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            hits_int,
        )

        pairs = spark.createDataFrame([(1, 2)], "a long, b long")
        rows = {
            r.id: (r.auth, r.hub)
            for r in hits_int(pairs, "a", "b", iters=2).collect()
        }
        # pure source has auth 0, pure sink hub 0 — never NULL
        assert rows[1][0] == 0 and rows[2][1] == 0
        assert rows[1][1] > 0 and rows[2][0] > 0

    def test_zero_iters_rejected(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            hits_int,
        )

        pairs = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError, match="at least one sweep"):
            hits_int(pairs, "a", "b", iters=0)


class TestV22SmallCorpus:
    def test_under_k_neighbors_emits_no_row(self, spark, tmp_path):
        """Oracle parity at the degenerate boundary: a corpus of k
        non-zero vectors has only k-1 eligible neighbors per vector, so
        the oracle's rn = k filter emits NOTHING — the Spark side must
        gate the min-aggregate on a full k-group, not score from a
        short one."""
        from spark_ml_spatialjointransformer_spark.queries import (
            _V22_K,
            v22_knn_outliers,
        )

        rows = [
            (i, [float(i + 1), float((i * 7) % 5 + 1), 0.5])
            for i in range(_V22_K)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        assert v22_knn_outliers(spark, str(tmp_path)).count() == 0


class TestBitemporalAsof:
    def test_late_recording_invisible_until_known(self, spark, monkeypatch):
        """The bitemporal split: a quote already IN EFFECT (valid_from
        past) but recorded after the knowledge instant must lose to an
        older-validity quote that WAS known — the axis divergence d1's
        single-time as-of cannot express.  Exercised via the registry
        query's own synthesis at sf0.001: find an event where the
        winning quote is NOT the max-valid_from quote overall."""
        from spark_ml_spatialjointransformer_spark.queries import QUERIES

        out = QUERIES["d27_bitemporal_asof"].fn(
            spark, "/root/testdata/sf0.001"
        )
        rows = out.collect()
        assert len(rows) > 0
        # ages are non-negative (valid_from <= t by the join filter) and
        # bounded by the month span (valid_from within Jan days 0-22,
        # events through Jan 31)
        assert all(0 <= r.valid_age_days <= 31 for r in rows)

    def test_struct_argmax_matches_window(self, spark):
        """max(struct(vf, ra, -sk)) == row_number-over-window pick on a
        constructed tie ladder (same vf twice -> ra breaks; same vf+ra
        -> smaller suppkey wins)."""
        q = spark.createDataFrame(
            [
                (1, 100, 50, 10, 111),
                (2, 100, 60, 10, 222),  # same vf, later ra -> wins over 1
                (3, 100, 60, 10, 333),  # same vf+ra as 2 -> 2 wins (min id)
                (4, 90, 99, 10, 444),   # older validity
            ],
            "s long, vf long, ra long, k long, price long",
        )
        best = (
            q.groupBy("k")
            .agg(
                F.max(
                    F.struct(
                        "vf", "ra", (-F.col("s")).alias("neg"), "price"
                    )
                ).alias("b")
            )
            .select((-F.col("b.neg")).alias("s"))
            .collect()
        )
        assert best[0].s == 2


class TestSourceOverlap:
    def test_inrow_pair_expansion_equals_self_join(self, spark):
        """The JVM in-row pair expansion over each fingerprint's sorted
        source set must equal the classic distinct self-join."""
        f = spark.createDataFrame(
            [
                ("s1", 1), ("s2", 1), ("s3", 1),  # fp 1 shared by 3
                ("s1", 2), ("s2", 2),             # fp 2 by 2
                ("s3", 3),                        # fp 3 unique
            ],
            "source string, fp long",
        ).distinct()
        grp = f.groupBy("fp").agg(
            F.sort_array(F.collect_set("source")).alias("srcs")
        )
        pair_expr = (
            "flatten(transform(srcs, (x, i) -> "
            "transform(slice(srcs, i + 2, size(srcs)), "
            "y -> struct(x AS a, y AS b))))"
        )
        got = sorted(
            (
                (r["p"]["a"], r["p"]["b"], r["n"])
                for r in grp.where(F.size("srcs") >= 2)
                .select(F.explode(F.expr(pair_expr)).alias("p"))
                .groupBy("p")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        )
        a = f.alias("a")
        b = f.alias("b")
        want = sorted(
            (r.sa, r.sb, r.n)
            for r in a.join(b, "fp")
            .where(F.col("a.source") < F.col("b.source"))
            .groupBy(
                F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert got == want == [("s1", "s2", 2), ("s1", "s3", 1), ("s2", "s3", 1)]


class TestTvDrift:
    def test_identical_sources_zero_uniform_shift_positive(self, spark):
        """Two sources with the SAME distribution both read ~0 TV; a
        third with disjoint vocabulary reads large — the drift order
        the gate keys on."""
        from spark_ml_spatialjointransformer_spark.queries import QUERIES

        rows = {
            r.source: r.tv_e6
            for r in QUERIES["t58_source_tv_drift"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert len(rows) >= 2
        assert all(0 <= v <= 1_000_000 for v in rows.values())


class TestColocationLift:
    def test_lift_identity_on_cells(self, spark):
        """Σ obs·lift over a row equals T·1e6-ish only for independent
        layouts; here just pin the integer identity lift = obs·T·1e6
        div (rm·cm) against a hand aggregate at sf0.001."""
        from spark_ml_spatialjointransformer_spark.queries import QUERIES

        out = QUERIES["j38_colocation_lift"].fn(
            spark, "/root/testdata/sf0.001"
        )
        rows = out.collect()
        assert len(rows) > 0
        t = sum(r.n_pairs for r in rows)
        rm = {}
        cm = {}
        for r in rows:
            rm[r.segment] = rm.get(r.segment, 0) + r.n_pairs
            cm[r.supp_nation] = cm.get(r.supp_nation, 0) + r.n_pairs
        for r in rows:
            assert r.lift_e6 == r.n_pairs * t * 1_000_000 // (
                rm[r.segment] * cm[r.supp_nation]
            )


class TestKnnOutliers:
    def test_score_is_fifth_best(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.similarity import (
            knn_join_exact,
        )
        from spark_ml_spatialjointransformer_spark.queries import QUERIES

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        knn = knn_join_exact(emb, "vec_id", "embedding", k=5)
        per = {
            r.vec_id: r.kth
            for r in knn.groupBy("vec_id")
            .agg(F.min("cos_e6").alias("kth"))
            .collect()
        }
        out = {
            r.vec_id: r.kth_sim_e6
            for r in QUERIES["v22_knn_outliers"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert out == per


class TestStreamFunnel:
    def test_cross_trigger_carry_and_latch(self, spark, tmp_path):
        """File 1: user 1 purchase BEFORE the view (never converts), then
        the view; user 2 purchase with no view (never).  File 2 (second
        trigger): user 1 purchase +30 min -> exactly ONE emit with
        delay 30 using the CARRIED view ts; a later purchase in the
        same file must be latched out."""
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            funnel_conversion_stream,
            run_to_memory,
        )

        base = dt.datetime(2024, 3, 2, 9, 0, 0)
        d = os.path.join(str(tmp_path), "events")
        os.makedirs(d)
        f1 = [
            (100, base - dt.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
            (101, base, 1, "view", 1.0, "{}"),
            (102, base, 2, "purchase", 1.0, "{}"),
        ]
        f2 = [
            (200, base + dt.timedelta(minutes=30), 1, "purchase", 1.0, "{}"),
            (201, base + dt.timedelta(minutes=45), 1, "purchase", 1.0, "{}"),
        ]
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        spark.createDataFrame(f1, schema).coalesce(1).write.parquet(
            os.path.join(d, "a")
        )
        time.sleep(1.1)  # file-source replays in mtime order: f1 first
        spark.createDataFrame(f2, schema).coalesce(1).write.parquet(
            os.path.join(d, "b")
        )
        for sub in ("a", "b"):
            for fn in os.listdir(os.path.join(d, sub)):
                if fn.endswith(".parquet"):
                    os.rename(
                        os.path.join(d, sub, fn),
                        os.path.join(d, f"{sub}_{fn}"),
                    )

        out = run_to_memory(
            funnel_conversion_stream(spark, d),
            "q_e24_carry_test",
            output_mode="append",
        ).collect()
        assert [(r.user_id, r.purchase_event, r.delay_min) for r in out] == [
            (1, 200, 30)
        ]

    def test_same_trigger_equal_ts_converts(self, spark, tmp_path):
        """View and purchase at the SAME timestamp in one trigger must
        convert with delay 0 (the batch `ts >= v_ts` contract) even
        when the purchase sorts before the view by event_id."""
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            funnel_conversion_stream,
            run_to_memory,
        )

        base = dt.datetime(2024, 3, 2, 9, 0, 0)
        d = os.path.join(str(tmp_path), "events")
        rows = [
            (100, base, 7, "purchase", 1.0, "{}"),
            (101, base, 7, "view", 1.0, "{}"),
        ]
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        out = run_to_memory(
            funnel_conversion_stream(spark, d),
            "q_e24_equal_ts_test",
            output_mode="append",
        ).collect()
        assert [(r.user_id, r.purchase_event, r.delay_min) for r in out] == [
            (7, 100, 0)
        ]


class TestHoltTrend:
    def test_declining_series_negative_trend_floors(self, spark):
        """A strictly declining stream drives the trend negative — the
        axis where floor(x/2) (both engines) and integer `div`
        (Spark-only truncation) diverge; pin the hand-rolled
        recurrence including the negative floors."""
        import datetime as dtm

        base = dtm.datetime(2024, 1, 1)
        rows = [
            (i, base + dtm.timedelta(minutes=i), 1, float(v), "{}")
            for i, v in enumerate([100.0, 80.0, 60.0, 40.0])
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, value double,"
            " props string",
        ).createOrReplaceTempView("__d28_events")
        from spark_ml_spatialjointransformer_spark.queries import (
            _d28_holt_partitions,
        )

        import pandas as pd

        # the r11 kernel takes pre-sorted (user, ts, event_id) batches
        pdf = pd.DataFrame(
            {
                "user_id": [1] * 4,
                "event_id": [0, 1, 2, 3],
                "v_e4": [1000000, 800000, 600000, 400000],
            }
        )
        out = pd.concat(list(_d28_holt_partitions(iter([pdf]))))
        # hand-unrolled: l1=1000000,b1=0; l2=(800000+1000000)//2=900000,
        # b2=(0+(900000-1000000))//2=-50000; l3=(600000+900000-50000)//2
        # =725000, b3=(-50000+(725000-900000))//2=-112500;
        # l4=(400000+725000-112500)//2=506250,
        # b4=(-112500+(506250-725000))//2=floor(-331250/2)=-165625
        assert out["level_e4"].to_list() == [1000000, 900000, 725000, 506250]
        assert out["trend_e4"].to_list() == [0, -50000, -112500, -165625]


class TestLabelAgreement:
    def test_kappa_negative_safe_and_exact(self, spark):
        """Construct a source whose raters systematically DISAGREE
        (kappa < 0) and one in perfect agreement (kappa = 1e6); the
        shifted integer formula must survive both."""
        rows = []
        # source 'anti': A says yes iff B says no (n10 = n01 = 5)
        for i in range(5):
            rows.append(("anti", 1, 0))
            rows.append(("anti", 0, 1))
        # source 'same': perfect agreement, balanced
        for i in range(5):
            rows.append(("same", 1, 1))
            rows.append(("same", 0, 0))
        df = spark.createDataFrame(rows, "source string, a int, b int")
        from pyspark.sql import functions as FF

        c = df.groupBy("source").agg(
            FF.count(FF.lit(1)).cast("bigint").alias("n"),
            FF.sum(FF.expr("a * b")).cast("bigint").alias("n11"),
            FF.sum(FF.expr("a * (1 - b)")).cast("bigint").alias("n10"),
            FF.sum(FF.expr("(1 - a) * b")).cast("bigint").alias("n01"),
            FF.sum(FF.expr("(1 - a) * (1 - b)")).cast("bigint").alias("n00"),
        )
        k = c.select(
            "source",
            FF.expr(
                "n * (n11 + n00)"
                " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
            ).alias("num"),
            FF.expr(
                "n * n"
                " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
            ).alias("den"),
        ).select(
            "source",
            FF.expr("(num + den) * 1000000 div den - 1000000").alias("kappa"),
        )
        got = {r.source: r.kappa for r in k.collect()}
        assert got["same"] == 1_000_000
        assert got["anti"] == -1_000_000


class TestIntervalRelations:
    def test_all_seven_classes_on_constructed_windows(self, spark):
        """Hand-built window set hitting every relation class including
        the boundary ones (meets/starts/finishes/equals) the sf data
        may not produce.  Each base relation is tested in BOTH
        orientations — the reversed pair must fold onto the same class
        via the time-order normalization (after→before, met-by→meets,
        contains→during, overlapped-by→overlaps, started-by→starts,
        finished-by→finishes)."""
        from spark_ml_spatialjointransformer_spark.queries import (
            _D29_REL_SQL,
            _D29_SWAP_SQL,
        )

        rows = [
            # (a_s, a_e, b_s, b_e, want)
            (0, 10, 20, 30, "before"),
            (20, 30, 0, 10, "before"),  # after → folds
            (0, 10, 10, 30, "meets"),
            (10, 30, 0, 10, "meets"),  # met-by → folds
            (0, 10, 0, 10, "equals"),
            (0, 10, 0, 30, "starts"),
            (0, 30, 0, 10, "starts"),  # started-by → folds
            (5, 30, 20, 30, "finishes"),
            (20, 30, 5, 30, "finishes"),  # finished-by → folds
            (0, 30, 10, 20, "during"),  # contains → folds
            (10, 20, 0, 30, "during"),
            (0, 15, 10, 30, "overlaps"),
            (10, 30, 0, 15, "overlaps"),  # overlapped-by → folds
        ]
        df = spark.createDataFrame(
            [(a, b, c, d) for a, b, c, d, _ in rows],
            "a_s long, a_e long, b_s long, b_e long",
        )
        swap = F.expr(_D29_SWAP_SQL)
        norm = df.select(
            F.when(swap, F.col("a_s")).otherwise(F.col("b_s")).alias("na_s"),
            F.when(swap, F.col("a_e")).otherwise(F.col("b_e")).alias("na_e"),
            F.when(swap, F.col("b_s")).otherwise(F.col("a_s")).alias("nb_s"),
            F.when(swap, F.col("b_e")).otherwise(F.col("a_e")).alias("nb_e"),
        ).withColumnsRenamed(
            {"na_s": "a_s", "na_e": "a_e", "nb_s": "b_s", "nb_e": "b_e"}
        )
        got = [
            r.rel
            for r in norm.select(F.expr(_D29_REL_SQL).alias("rel")).collect()
        ]
        assert got == [w for *_, w in rows]
        assert set(got) == {
            "before", "meets", "equals", "starts",
            "finishes", "during", "overlaps",
        }


class TestArchiveMembers:
    def test_corrupt_header_poisons_only_that_archive(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.multimodal import (
            parse_tar_members,
            synth_tar_archives,
        )

        docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
        tars = synth_tar_archives(docs, "doc_id", out_col="tar")
        # corrupt doc 2's checksum field (bytes 148:156 of block 0)
        import pandas as pd

        pdf = tars.toPandas()
        blob = bytearray(pdf.loc[pdf.doc_id == 2, "tar"].iloc[0])
        blob[148:156] = b"00000000"
        pdf.loc[pdf.doc_id == 2, "tar"] = bytes(blob)
        corrupted = spark.createDataFrame(pdf)
        out = parse_tar_members(corrupted, "doc_id", "tar").toPandas()
        got = sorted(out.doc_id.unique())
        assert got == [1, 3]
        # doc 1: 1 % 3 + 1 = 2 members; doc 3: 3 % 3 + 1 = 1 member
        assert len(out[out.doc_id == 1]) == 2
        assert len(out[out.doc_id == 3]) == 1

    def test_member_facts_match_synthesis(self, spark):
        from spark_ml_spatialjointransformer_spark.functions.hashing import (
            h60_py,
        )
        from spark_ml_spatialjointransformer_spark.operators.multimodal import (
            parse_tar_members,
            synth_tar_archives,
        )

        docs = spark.createDataFrame([(7,)], "doc_id long")
        out = parse_tar_members(
            synth_tar_archives(docs, "doc_id"), "doc_id", "tar"
        ).collect()
        # doc 7: 7 % 3 + 1 = 2 members; sizes (7*7 + i*13) % 200 + 10
        assert len(out) == 2
        for r in out:
            i = r.member_idx
            size = (7 * 7 + i * 13) % 200 + 10
            assert r.size == size
            assert r.byte_sum == sum((7 + (i + 1) * j) % 256 for j in range(size))
            assert r.name_h60 == h60_py(f"m7_{i}.bin")
