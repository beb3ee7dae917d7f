"""Round-7 regression tests pinning the five r6 ADVICE.md fixes:

1. stale stream flush-sentinels are purged/re-pinned on entry
   (streaming/windowed.py _flushed_events_dir);
2. triangles_per_node fails loud on ids that would collide the packed
   (degree, id) orientation key (operators/graph.py);
3. frame_byte_sums walks any netpbm-legal header, not just the byte
   layout encode_ppm writes (operators/multimodal.py);
4. kmeans_int guards the [-1, 1] input range and seeds from the k
   lowest OBSERVED ids (operators/similarity.py);
5. image_ahash / audio_fingerprint grow a strict=False poison-row mode
   (operators/multimodal.py).
"""

import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.operators import multimodal


class TestOrientKeyGuard:
    def test_big_id_fails_loud(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            triangles_per_node,
        )

        # deg=2,id=5 vs deg=1,id=10000005 would pack to the same key;
        # the guard must refuse rather than silently undercount
        pairs = [(10_000_005, 1), (1, 2), (2, 10_000_005)]
        df = spark.createDataFrame(pairs, "a long, b long")
        with pytest.raises(Exception, match="orientation key"):
            triangles_per_node(df, "a", "b").collect()

    def test_max_legal_id_still_counts(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.graph import (
            triangles_per_node,
        )

        hi = 9_999_999  # largest id the packed key supports
        pairs = [(hi, 1), (1, 2), (2, hi)]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r.id: r.n_tri for r in triangles_per_node(df, "a", "b").collect()}
        assert got == {1: 1, 2: 1, hi: 1}


class TestFrameWalkerHeaders:
    def test_comment_variant_header_does_not_desync(self, spark):
        img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
        std = multimodal.encode_ppm(img)
        # netpbm-legal but NOT what encode_ppm writes: comment + padding
        weird = b"P6\n# made elsewhere\n 3  3 \n255\n" + img.tobytes()
        blob = std + weird + std
        df = spark.createDataFrame(
            [(1, bytearray(blob))], "vid long, video binary"
        )
        out = (
            multimodal.frame_byte_sums(df, "video", id_cols=("vid",))
            .orderBy("frame_idx")
            .collect()
        )
        assert [r.frame_idx for r in out] == [0, 1, 2]
        assert all(r.luma == int(img.sum()) for r in out)


class TestKmeansIntGuards:
    def test_out_of_range_component_fails_loud(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.similarity import (
            kmeans_int,
        )

        df = spark.createDataFrame(
            [(0, [0.1, 0.2]), (1, [1.5, 0.0]), (2, [-0.3, 0.4])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(Exception, match="kmeans_int"):
            kmeans_int(df, "vec_id", "embedding", dim=2, k=2, iters=1).collect()

    def test_offset_ids_get_k_seeds(self, spark):
        from spark_ml_spatialjointransformer_spark.operators.similarity import (
            kmeans_int,
        )

        # ids start at 100: old "vid < k" init would find ZERO centroids;
        # the fix seeds from the k lowest observed ids and the result must
        # be the exact id-shifted image of the ids-from-0 run
        base = [(i, [0.01 * i, -0.02 * i]) for i in range(12)]
        shifted = [(i + 100, v) for i, v in base]
        k = 3
        r0 = kmeans_int(
            spark.createDataFrame(base, "vec_id long, embedding array<double>"),
            "vec_id", "embedding", dim=2, k=k, iters=2,
        ).collect()
        r1 = kmeans_int(
            spark.createDataFrame(shifted, "vec_id long, embedding array<double>"),
            "vec_id", "embedding", dim=2, k=k, iters=2,
        ).collect()
        m0 = {r.vec_id: (r.cluster, r.d2) for r in r0}
        m1 = {r.vec_id: (r.cluster, r.d2) for r in r1}
        assert len(m1) == len(shifted)
        assert {c for c, _ in m1.values()} <= {100, 101, 102}
        for vid, (c, d2) in m0.items():
            assert m1[vid + 100] == (c + 100, d2)


class TestPoisonRowMode:
    def test_image_ahash_nonstrict_nulls_oversized(self, spark):
        big = multimodal.synth_ppm_images(
            spark.range(1).select(F.col("id").alias("doc_id")), "doc_id", 16, 12
        )
        out = multimodal.image_ahash(big, "img", strict=False).toPandas()
        assert out["ahash"].isna().all()
        # strict default still refuses loudly
        with pytest.raises(Exception, match="63"):
            multimodal.image_ahash(big, "img").collect()

    def test_audio_fingerprint_nonstrict_nulls_indivisible(self, spark):
        odd = np.zeros(10, dtype=np.int64)
        df = spark.createDataFrame(
            [(0, bytearray(multimodal.encode_wav(odd, 8000)))],
            "id long, wav binary",
        )
        out = multimodal.audio_fingerprint(
            df, "wav", n_windows=4, strict=False
        ).toPandas()
        assert out["afp"].isna().all()
        with pytest.raises(Exception, match="equal windows"):
            multimodal.audio_fingerprint(df, "wav", n_windows=4).collect()


class TestFlushSentinelStaleness:
    def test_stale_sentinels_purged_and_repinned(self, spark, tmp_path):
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            _flushed_events_dir,
        )

        path = str(tmp_path / "events")

        def write(ts_vals):
            pdf = pd.DataFrame(
                {
                    "event_id": range(len(ts_vals)),
                    "ts": pd.to_datetime(ts_vals),
                    "user_id": [1] * len(ts_vals),
                    "event_type": ["click"] * len(ts_vals),
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "overwrite"
            ).parquet(path)

        write(["2024-01-01 00:00:00", "2024-01-01 01:00:00"])
        d1, n1 = _flushed_events_dir(spark, path)
        tag1 = {
            f for f in os.listdir(d1) if f.startswith("flush")
        }
        assert len(tag1) == 2

        # regenerate the data with a NEWER max ts (new tag) and newer
        # file mtimes — the old sentinels keep their old mtimes and would
        # sort FIRST, advancing the watermark past the real data
        write(["2024-02-01 00:00:00", "2024-02-01 01:00:00"])
        d2, n2 = _flushed_events_dir(spark, path)
        assert d2 == d1
        flushes = {f for f in os.listdir(d2) if f.startswith("flush")}
        # stale tag purged, fresh tag present
        assert flushes.isdisjoint(tag1)
        assert len(flushes) == 2
        # no dangling symlinks survive the regeneration
        for f in os.listdir(d2):
            assert os.path.exists(os.path.join(d2, f)), f
        # every sentinel sorts strictly after every data file by mtime
        data_mtimes = [
            os.stat(os.path.join(d2, f)).st_mtime
            for f in os.listdir(d2)
            if not f.startswith("flush")
        ]
        flush_mtimes = [
            os.stat(os.path.join(d2, f)).st_mtime for f in flushes
        ]
        assert min(flush_mtimes) > max(data_mtimes)

    def test_same_data_repin_after_rewrite_in_place(self, spark, tmp_path):
        """Rewriting IDENTICAL data (same max ts, same tag) must still
        re-pin surviving sentinels after the new data mtimes."""
        from spark_ml_spatialjointransformer_spark.streaming.windowed import (
            _flushed_events_dir,
        )

        path = str(tmp_path / "events")
        pdf = pd.DataFrame(
            {
                "event_id": [0, 1],
                "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                "user_id": [1, 2],
                "event_type": ["click", "purchase"],
            }
        )

        def write():
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "overwrite"
            ).parquet(path)

        write()
        d1, _ = _flushed_events_dir(spark, path)
        write()  # same content, fresh mtimes
        d2, _ = _flushed_events_dir(spark, path)
        assert d2 == d1
        data_mtimes = [
            os.stat(os.path.join(d2, f)).st_mtime
            for f in os.listdir(d2)
            if not f.startswith("flush") and os.path.exists(os.path.join(d2, f))
        ]
        flush_mtimes = [
            os.stat(os.path.join(d2, f)).st_mtime
            for f in os.listdir(d2)
            if f.startswith("flush")
        ]
        assert data_mtimes and flush_mtimes
        assert min(flush_mtimes) > max(data_mtimes)


class TestGridDbscanFallback:
    def test_distributed_route_matches_union_find(self, spark):
        """VERDICT r6 item 5: crossing the driver union-find bound must
        route through dedup_connected_components and produce IDENTICAL
        cluster labels (cluster = component-min cid on both routes)."""
        from spark_ml_spatialjointransformer_spark.queries import (
            _grid_component_labels,
        )

        # two chains (0-1-2-3, 10-11) + isolates 20, 30
        dense = spark.createDataFrame(
            [(i,) for i in (0, 1, 2, 3, 10, 11, 20, 30)], "cid long"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        fast = {
            r.cid: r.cluster
            for r in _grid_component_labels(
                spark, dense, pairs, driver_bound=10_000
            ).collect()
        }
        dist = {
            r.cid: r.cluster
            for r in _grid_component_labels(
                spark, dense, pairs, driver_bound=0
            ).collect()
        }
        want = {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 30: 30}
        assert fast == want
        assert dist == want
