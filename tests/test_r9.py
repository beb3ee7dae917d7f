"""Round-9 regression tests.

Covers the r8 ADVICE fixes (f3/f5 numPartitions contract moved out of the
production path, v17 sim quantization, flush-dir cache revalidation) and
the r9 additions.
"""

import pytest

from spark_ml_spatialjointransformer_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


class TestTransformerNumPartitionsContract:
    """X1: the numPartitions string param must control the output
    partition count of the Transformer-driven f-queries.  Lives here
    instead of a bare ``assert`` inside the registry functions — that
    form is silently skipped under ``python -O`` and triggers a DF->RDD
    conversion on every production plan build (r8 ADVICE)."""

    @pytest.mark.parametrize(
        "qname, want",
        [("f3_transformer_within_filtered", 7),
         ("f5_transformer_polygon_nearest", 6)],
    )
    def test_output_partitions(self, spark, qname, want):
        out = Q.QUERIES[qname].fn(spark, SF_DIR)
        assert out.rdd.getNumPartitions() == want


class TestFlushDirCacheRevalidation:
    """_FLUSH_DIR_CACHE must not return a /tmp dir whose sentinels or
    data symlinks were removed behind its back (tmp cleaner, concurrent
    md5-colliding process) — that stream would silently drop outer-join
    NULL rows (r8 ADVICE)."""

    def test_damaged_cache_hit_rebuilds(self, spark, tmp_path):
        import os

        from spark_ml_spatialjointransformer_spark.streaming import (
            windowed as W,
        )

        src = str(tmp_path / "events.parquet")
        spark.createDataFrame(
            [(1, 1000000000000, 7, "click"), (2, 2000000000000, 7, "purchase")],
            "event_id long, ts long, user_id long, event_type string",
        ).coalesce(1).write.parquet(src)

        d, n = W._flushed_events_dir(spark, src)
        assert W._flush_dir_intact(d, n)
        # damage 1: a tmp cleaner removes one flush sentinel
        victim = next(f for f in os.listdir(d) if f.startswith("flush1"))
        os.remove(os.path.join(d, victim))
        d2, n2 = W._flushed_events_dir(spark, src)
        assert (d2, n2) == (d, n)
        assert W._flush_dir_intact(d2, n2)  # sentinel restored
        # damage 2: a data symlink dangles (part file renamed away)
        link = next(
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith("flush")
        )
        os.remove(os.path.join(d, link))
        d3, n3 = W._flushed_events_dir(spark, src)
        assert W._flush_dir_intact(d3, n3)


class TestT53SpanDedup:
    """t53 must catch a long span duplicated at DIFFERENT offsets inside
    otherwise-distinct documents — the case whole-doc/shingle/chunk/
    prefix dedup miss — and must NOT pair docs with no long shared
    span."""

    def test_embedded_span_at_different_offsets(self, spark):
        import random

        rng = random.Random(53)
        vocab = [f"w{i}" for i in range(1000)]
        span = " ".join(rng.choice(vocab) for _ in range(30))

        def noise(n):
            return " ".join(rng.choice(vocab) for _ in range(n))

        rows = [
            (1, noise(5) + " " + span + " " + noise(40)),   # span at off 5
            (2, noise(25) + " " + span + " " + noise(10)),  # span at off 25
            (3, noise(80)),                                  # unrelated
            (4, noise(80)),                                  # unrelated
        ]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .createOrReplaceTempView("documents_t53")

        from spark_ml_spatialjointransformer_spark import queries as Q

        tmpdir = None  # reuse the registry fn via a temp parquet dir
        import tempfile, os
        tmpdir = tempfile.mkdtemp()
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.mode("overwrite").parquet(os.path.join(tmpdir, "documents.parquet"))
        out = Q.QUERIES["t53_span_dedup"].fn(spark, tmpdir)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        assert (1, 2) in pairs
        assert all(p == (1, 2) for p in pairs), pairs


class TestT54SpanCoverage:
    """Coverage must union overlapping spans (no double-count) and report
    zero for docs whose spans match nothing."""

    def test_interval_union_no_double_count(self, spark, tmp_path):
        import os
        import random

        rng = random.Random(54)
        vocab = [f"w{i}" for i in range(1000)]
        # 40-token span duplicated across docs 1 and 2 -> its anchors
        # overlap heavily inside each doc; union must not exceed doc length
        span = " ".join(rng.choice(vocab) for _ in range(40))

        def noise(n):
            return " ".join(rng.choice(vocab) for _ in range(n))

        rows = [
            (1, noise(10) + " " + span + " " + noise(10)),
            (2, span + " " + noise(20)),
            (3, noise(60)),
        ]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.mode("overwrite") \
            .parquet(os.path.join(str(tmp_path), "documents.parquet"))

        from spark_ml_spatialjointransformer_spark import queries as Q

        out = {
            r.doc_id: r
            for r in Q.QUERIES["t54_span_coverage"].fn(spark, str(tmp_path)).collect()
        }
        assert out[3].covered_tokens == 0 and out[3].coverage_e6 == 0
        for d in (1, 2):
            assert 0 < out[d].covered_tokens <= out[d].n_tokens
            # the union of anchored 12-token spans inside one 40-token
            # duplicated region can never exceed the region itself
            assert out[d].covered_tokens <= 40
