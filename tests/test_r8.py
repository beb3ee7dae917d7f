"""Round-8 regression tests.

j34's above-broadcast route: the k=2 nearest retrieval must produce the
IDENTICAL margin table whether it rides the broadcast argmin kernel or the
partitioned grid loop (`operators/knn.partitioned_nearest`), and the
strategy probe must cross to the partitioned path when the supplier side's
Catalyst size estimate exceeds the bound — the same guard-crossing contract
j31 pins for `_grid_component_labels` (tests/test_r7_advice.py).
"""

import pytest

from spark_ml_spatialjointransformer_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestBenchRepPolicy:
    """bench.py's adaptive rep rule: two best readings within 20% stop
    the loop; agreeing SLOW readings alone don't (a load spike tainting
    consecutive reps must force another look), and the cap bounds it."""

    def test_convergence_rule(self):
        from bench import reps_converged

        assert not reps_converged([])
        assert not reps_converged([3.0])
        assert reps_converged([3.0, 3.1])         # steady state at 2
        assert not reps_converged([6.0, 3.0])      # JIT-slow rep1 → rep3
        assert reps_converged([6.0, 3.0, 3.3])     # best two now agree
        assert not reps_converged([8.0, 8.1, 3.0])  # spike pair + 1 fast
        assert reps_converged([8.0, 8.1, 3.0, 3.1])  # cap reached
        assert reps_converged([9.0, 5.0, 7.0, 6.5])  # cap bounds the loop


class TestMMRSelect:
    """Property tests for the v17 greedy kernel (queries.mmr_select)."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vecs = st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=4,
                 max_size=4).filter(lambda v: any(v)),
        min_size=1, max_size=8,
    )

    @staticmethod
    def _cands(vec_lists):
        # rel = cosine to a fixed probe direction [1,1,1,1]
        import math

        out = []
        for i, v in enumerate(vec_lists):
            nn = float(sum(x * x for x in v))
            rel = sum(v) / math.sqrt(4.0 * nn)
            out.append((i, rel, [float(x) for x in v], nn))
        return out

    @settings(max_examples=200, deadline=None)
    @given(vecs=vecs)
    def test_greedy_invariants(self, vecs):
        import math

        from spark_ml_spatialjointransformer_spark.queries import mmr_select

        cands = self._cands(vecs)
        sel, scores = mmr_select(cands, k=3, lam=0.5)
        assert len(sel) == min(3, len(cands))
        assert len(set(s[0] for s in sel)) == len(sel)  # no repeats
        # rank 1 is pure relevance with min-id ties
        best_rel = max(c[1] for c in cands)
        tied = [c[0] for c in cands if c[1] == best_rel]
        assert sel[0][0] == min(tied)
        assert scores[0] == best_rel

        def cos(a, b):
            t = 0.0
            for x, y in zip(a[2], b[2]):
                t += x * y
            return t / math.sqrt(a[3] * b[3])

        # each later pick maximizes the MMR score among the then-remaining
        for step in (1, 2):
            if step >= len(sel):
                break
            chosen_ids = {s[0] for s in sel[:step]}
            rem = [c for c in cands if c[0] not in chosen_ids]
            best = None
            for c in rem:
                ms = max(cos(c, s) for s in sel[:step])
                sc = 0.5 * c[1] - 0.5 * ms
                if (best is None or sc > best[1]
                        or (sc == best[1] and c[0] < best[0])):
                    best = (c[0], sc)
            assert sel[step][0] == best[0]
            assert scores[step] == best[1]


class TestP11Invariants:
    def test_budget_and_prefix_closure(self, spark):
        from spark_ml_spatialjointransformer_spark import queries as Q

        out = Q.QUERIES["p11_token_budget_fill"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        assert by_src  # non-empty selection
        for src, rows in by_src.items():
            rows.sort(key=lambda r: r.cum_tok)
            # never overshoots, and cum_tok is the running sum of n_tok
            assert rows[-1].cum_tok <= Q._P11_BUDGET
            run = 0
            for r in rows:
                run += r.n_tok
                assert r.cum_tok == run


class TestJ34GuardCrossing:
    def test_both_routes_identical(self, spark):
        bc = _sorted_rows(Q._j34_margin(spark, SF_DIR, "broadcast"))
        pt = _sorted_rows(Q._j34_margin(spark, SF_DIR, "partitioned"))
        assert len(bc) == 150  # one row per customer at sf0.001
        assert bc == pt

    def test_strategy_probe_crosses_bound(self, spark, monkeypatch):
        assert Q._j34_strategy(spark, SF_DIR) == "broadcast"
        monkeypatch.setattr(Q, "_J34_BROADCAST_BOUND_BYTES", 0)
        assert Q._j34_strategy(spark, SF_DIR) == "partitioned"

    def test_no_estimate_means_partitioned(self, spark, monkeypatch):
        from spark_ml_spatialjointransformer_spark.operators import _guard

        # unknown size must route to the distributed path, never broadcast
        assert _guard.estimated_plan_bytes(None) is None
        monkeypatch.setattr(_guard, "estimated_plan_bytes", lambda df: None)
        assert Q._j34_strategy(spark, SF_DIR) == "partitioned"
