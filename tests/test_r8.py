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
