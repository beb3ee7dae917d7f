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
