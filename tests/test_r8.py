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
