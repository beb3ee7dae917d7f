"""Unit pins for the r10 registry additions (constructed inputs, exact
expected values — the oracle parity suite covers the sf-scale data)."""

import datetime

import pytest
from pyspark.sql import functions as F


class TestT60RepetitionSignals:
    def test_hand_computed_fractions(self, spark, tmp_path):
        from spark_ml_spatialjointransformer_spark.queries import (
            t60_repetition_signals,
        )

        rows = [
            # 10 tokens, 'spam' x5 -> uni 500000; bigram 'spam spam' x4
            # -> bi 800000: flagged
            (1, "spam spam spam spam spam a b c d e", "s1"),
            # 8 distinct tokens: uni 125000 (> 120000 -> flagged), top
            # bigram unique -> bi 250000 (> 180000)
            (2, "w x y z u v q r", "s1"),
            # 1 token: excluded (no bigram)
            (3, "solo", "s1"),
            # 4 tokens 'a b a c': uni 2/4 -> 500000 flagged
            (4, "a b a c", "s1"),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = {
            r.doc_id: (
                r.ntok,
                r.top_unigram_frac_e6,
                r.top_bigram_frac_e6,
                r.is_repetitive,
            )
            for r in t60_repetition_signals(spark, str(tmp_path)).collect()
        }
        assert 3 not in got
        assert got[1] == (10, 500_000, 800_000, True)
        # doc 2: every token unique -> top unigram 1/8, top bigram 2/8
        assert got[2] == (8, 125_000, 250_000, True)
        assert got[4] == (4, 500_000, 500_000, True)

    def test_clean_doc_not_flagged(self, spark, tmp_path):
        from spark_ml_spatialjointransformer_spark.queries import (
            t60_repetition_signals,
        )

        text = " ".join(f"tok{i}" for i in range(20))
        spark.createDataFrame(
            [(1, text, "s")], "doc_id long, text string, source string"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        row = t60_repetition_signals(spark, str(tmp_path)).collect()[0]
        # 20 unique tokens: uni 50000, bi 100000 — both under threshold
        assert row.top_unigram_frac_e6 == 50_000
        assert row.top_bigram_frac_e6 == 100_000
        assert not row.is_repetitive


class TestD31WeekdayProfile:
    def test_epoch_weekday_mapping_and_shares(self, spark, tmp_path):
        from spark_ml_spatialjointransformer_spark.queries import (
            d31_weekday_profile,
        )

        def ts(day, hour=0):
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                days=day, hours=hour
            )

        # day 0 = Thursday (dow 4), day 3 = Sunday (dow 0)
        rows = [
            (1, 10, "view", ts(0), 1.0),
            (2, 10, "view", ts(0, 5), 1.0),
            (3, 10, "view", ts(3), 1.0),
            (4, 11, "buy", ts(7), 1.0),  # day 7 = Thursday again
        ]
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, "
            "ts timestamp, value double",
        ).write.parquet(f"{tmp_path}/events.parquet")
        got = {
            (r.event_type, r.dow): (r.n_events, r.share_e6, r.is_peak_day)
            for r in d31_weekday_profile(spark, str(tmp_path)).collect()
        }
        assert got[("view", 4)] == (2, 666_666, True)
        assert got[("view", 0)] == (1, 333_333, False)
        assert got[("buy", 4)] == (1, 1_000_000, True)
        assert len(got) == 3


class TestD32Cusum:
    def test_level_shift_localized(self, spark, tmp_path):
        """10 quiet days (1 event/day) then 10 loud days (5/day): the
        integer CUSUM peaks in magnitude exactly at the last quiet day."""
        from spark_ml_spatialjointransformer_spark.queries import (
            d32_cusum_changepoint,
        )

        rows = []
        eid = 0
        for day in range(20):
            n = 1 if day < 10 else 5
            for k in range(n):
                eid += 1
                rows.append(
                    (
                        eid,
                        7,
                        "view",
                        datetime.datetime(1970, 1, 1)
                        + datetime.timedelta(days=day, minutes=k),
                        1.0,
                    )
                )
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, "
            "ts timestamp, value double",
        ).write.parquet(f"{tmp_path}/events.parquet")
        got = d32_cusum_changepoint(spark, str(tmp_path)).collect()
        assert len(got) == 1
        r = got[0]
        # deviations: quiet day = 1*20-60 = -40, loud day = 5*20-60 = +40
        # cusum bottoms at day 9 (last quiet day): -400
        assert r.change_day == 9
        assert r.cusum_at_peak == -400
        assert r.max_abs_cusum == 400


class TestT61Zipf:
    def test_perfect_zipf_slope(self, spark, tmp_path):
        """A constructed corpus with freq(rank r) = 2^(7-r) for ranks
        1..7 has slope -ln2 per unit ln-rank... but ranks are not
        log-spaced, so pin instead the exact closed form computed in
        python over the same (rank, freq) head."""
        import math

        from spark_ml_spatialjointransformer_spark.queries import (
            t61_zipf_exponent,
        )

        freqs = {f"w{r}": 2 ** (8 - r) for r in range(1, 8)}
        text = " ".join(
            " ".join([w] * f) for w, f in sorted(freqs.items())
        )
        spark.createDataFrame(
            [(1, text, "s1")], "doc_id long, text string, source string"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        row = t61_zipf_exponent(spark, str(tmp_path)).collect()[0]
        ranked = sorted(freqs.values(), reverse=True)
        xs = [math.log(i + 1) for i in range(len(ranked))]
        ys = [math.log(f) for f in ranked]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        want = math.floor(
            (sx * sy - n * sxy) * 1e6 / (n * sxx - sx * sx) + 0.5
        )
        assert row.n_ranks == 7
        assert row.zipf_s_e6 == want
        assert row.zipf_s_e6 > 0  # positive exponent convention
