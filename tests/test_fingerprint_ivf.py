"""Winnowing fingerprints vs a pure-Python oracle; IVF top-k recall vs the
exact brute-force answer.  Real sf0.001 tables."""

import hashlib
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from spark_ml_spatialjointransformer_spark.operators import fingerprint, similarity
from spark_ml_spatialjointransformer_spark.sources.tables import load_table

SF = os.environ.get("SJT_TEST_SF_DIR", "/root/testdata/sf0.001")


def py_winnow(text: str, k: int = 3, w: int = 4) -> set[str]:
    toks = text.lower().split(" ")
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if len(grams) < w:
        return set()
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}


@pytest.fixture(scope="module")
def docs_pd(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text").toPandas()


def test_winnow_matches_python(spark, docs_pd):
    got: dict[int, set[str]] = {}
    rows = fingerprint.winnow_fingerprints(
        load_table(spark, SF, "documents"), "doc_id", "text"
    ).collect()
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.fp)
    expected = {
        d: py_winnow(t) for d, t in zip(docs_pd.doc_id, docs_pd.text) if py_winnow(t)
    }
    assert got == expected
    assert len(got) > 100


def test_fingerprint_match_pairs_sound(spark, docs_pd):
    pairs = fingerprint.fingerprint_match_pairs(
        load_table(spark, SF, "documents"), "doc_id", "text", min_shared=2
    ).collect()
    fps = {d: py_winnow(t) for d, t in zip(docs_pd.doc_id, docs_pd.text)}
    assert len(pairs) > 0
    for r in pairs:
        assert len(fps[r.id_a] & fps[r.id_b]) == r.n_shared
        assert r.n_shared >= 2


def test_ivf_topk_recall_and_exactness(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") % 250 == 0)
    exact = similarity.brute_force_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=5
    ).collect()
    approx = similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_centroids=8, n_probe=3,
    ).collect()

    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.id)
    approx_sets: dict[int, set[int]] = {}
    approx_cos: dict[tuple[int, int], int] = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.id)
        approx_cos[(r.q_id, r.id)] = r.cos_e6

    # cosines reported by IVF must be exact (refine step is exact)
    pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ix = {v: i for i, v in enumerate(pdf.vec_id)}
    for (qid, vid), cos_e6 in approx_cos.items():
        true = float(norm[ix[qid]] @ norm[ix[vid]])
        assert abs(cos_e6 - round(true * 1_000_000)) <= 1

    # recall@5 over all queries: probing 3/8 cells must recover most of the
    # exact top-5 (deterministic inputs — this is a fixed number, not flaky)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.6, f"recall@5 = {hits}/{total}"


def test_knn_join_exact_edge_cases(spark):
    """k exceeding the corpus clamps to N-1; zero-norm vectors neither
    emit rows nor appear as neighbors; every other vector gets exactly
    min(k, N_nonzero - 1) neighbors and never itself."""
    from spark_ml_spatialjointransformer_spark.operators.similarity import (
        knn_join_exact,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.0, 0.0]),  # zero norm: no cosine exists
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join_exact(df, "vec_id", "embedding", k=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.vec_id, []).append(r.neighbor_id)
        assert r.neighbor_id != r.vec_id
        assert r.neighbor_id != 4
    assert set(by_id) == {1, 2, 3}
    assert all(len(v) == 2 for v in by_id.values())  # min(10, 3-1)
    # nearest neighbor of 1 is 2 (cos ~ .994), not 3 (orthogonal)
    assert by_id[1][0] == 2


def test_knn_join_exact_empty_and_guard(spark, monkeypatch):
    """An empty corpus (or all-zero-norm corpus) returns an empty DataFrame
    with the contract schema instead of crashing in numpy; a corpus above
    the broadcast bound raises with a pointer to the scale tiers."""
    from spark_ml_spatialjointransformer_spark.operators import similarity

    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    out = similarity.knn_join_exact(empty, "vec_id", "embedding", k=3)
    assert out.columns == ["vec_id", "neighbor_id", "cos_e6"]
    assert out.count() == 0

    zeros = spark.createDataFrame([(1, [0.0, 0.0]), (2, [0.0, 0.0])], schema)
    assert similarity.knn_join_exact(zeros, "vec_id", "embedding").count() == 0

    monkeypatch.setattr(similarity, "_KNN_EXACT_MAX_BROADCAST_ROWS", 2)
    big = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)], schema
    )
    with pytest.raises(ValueError, match="ivf_topk|lsh_topk"):
        similarity.knn_join_exact(big, "vec_id", "embedding")
