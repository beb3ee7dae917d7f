"""Sampling/packing operators: partitioning-invariance is the contract."""

import pytest

from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.functions.hashing import h60_py
from spark_ml_spatialjointransformer_spark.operators.sampling import (
    pack_sequences,
    stratified_take,
)


def test_stratified_take_deterministic_and_quota(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(200)], "doc_id long, lang string"
    )
    out = stratified_take(df, "lang", "doc_id", 10).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert {len(v) for v in by_lang.values()} == {10}
    # python mirror of the (h60(id), id) order
    for lang, rows in by_lang.items():
        ids = [i for i in range(200) if (("en" if i % 3 else "de") == lang)]
        expect = sorted(ids, key=lambda i: (h60_py(str(i)), i))[:10]
        got = [r.doc_id for r in sorted(rows, key=lambda r: r.rn)]
        assert got == expect, lang


def test_stratified_take_heavy_hitter_prefilter_exact(spark):
    """One group holding 90% of rows: the combiner-style local-top-n
    prefilter must return EXACTLY the naive window's output (superset
    property), under several partitionings."""
    rows = [(i, "hot" if i % 10 else "cold") for i in range(2000)]
    for n_parts in (1, 4, 13):
        df = spark.createDataFrame(
            rows, "doc_id long, lang string"
        ).repartition(n_parts)
        fast = {
            (r.doc_id, r.lang, r.rn)
            for r in stratified_take(df, "lang", "doc_id", 25).collect()
        }
        exact = {
            (r.doc_id, r.lang, r.rn)
            for r in stratified_take(
                df, "lang", "doc_id", 25, prefilter=False
            ).collect()
        }
        assert fast == exact, n_parts
        assert len(fast) == 50


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_pack_sequences_partitioning_invariant(spark, n_parts):
    """The two-level prefix sum must equal the global formula for ANY
    partition count (the scale property: boundaries don't change results)."""
    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r.doc_id: (r.window_id, r.offset)
        for r in pack_sequences(
            df, "doc_id", "n_tokens", window_tokens=256, num_partitions=n_parts
        ).collect()
    }
    before = 0
    for i, n in rows:
        assert out[i] == (before // 256, before % 256), i
        before += n


def test_pack_sequences_column_count_preserved(spark):
    df = spark.createDataFrame([(1, 5, "x")], "doc_id long, n_tokens long, extra string")
    out = pack_sequences(df, "doc_id", "n_tokens", 64)
    assert set(out.columns) == {"doc_id", "n_tokens", "extra", "window_id", "offset"}
