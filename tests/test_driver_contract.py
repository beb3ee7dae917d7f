"""The driver contract (__spark_entry__.py) must never break shape:
entry() runs the flagship and returns rows; queries()/oracle_sql() stay
key-aligned; every oracle is a non-empty SQL string."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_registry_alignment():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 90
    # every oracle key is a query; every query has an oracle (full-strength
    # value gate for the whole registry — no rows-only weak checks)
    assert set(oracles) == set(qs)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"c_custkey", "supp_key", "supp_name", "dist_m"} <= set(df.columns)
