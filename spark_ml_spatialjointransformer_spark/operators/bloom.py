"""Bloom-filter pre-filter for shuffle joins.

The standard 100 TB pruning move: before an (anti/semi) join against a
reference key set, broadcast a fixed-size bitmap of the set's Bloom
positions and drop probe rows whose positions aren't all occupied —
false positives pass through to the EXACT join that follows (so results
are unchanged), false negatives are impossible (every inserted key sets
exactly the positions membership checks), and the probe volume that
reaches the shuffle shrinks by the filter's selectivity.

Positions come from classic double hashing over the h60 key itself
(Kirsch–Mitzenmacher: ``p_i = (h1 + i·h2) mod m``) — no second hash pass
over the data, pure int64 numpy on both build and probe.  The bitmap is
``m/8`` bytes no matter how big the corpus is (default 2²⁰ bits = 128 KiB);
size m to ~10 bits per expected distinct key for ~1% false positives.
"""

from __future__ import annotations

import pandas as pd

#: default geometry: 2^20 bits / 7 probes ≈ 1% FP at ~100k distinct keys
M_BITS = 1 << 20
N_PROBES = 7


def _h1_h2(h, m_bits):
    """Double-hash bases from a non-negative int64 h60 array (numpy)."""
    h1 = h % m_bits
    h2 = 1 + (h >> 20) % (m_bits - 1)  # odd-ish stride, never 0
    return h1, h2


def build_bitmap(hashes, m_bits: int = M_BITS, n_probes: int = N_PROBES):
    """Build the bitmap (numpy uint8[m/8]) from an int64 array of keys."""
    import numpy as np

    bm = np.zeros(m_bits >> 3, dtype=np.uint8)
    if len(hashes) == 0:
        return bm
    h = np.asarray(hashes, dtype=np.int64)
    h1, h2 = _h1_h2(h, m_bits)
    for i in range(n_probes):
        p = (h1 + i * h2) % m_bits
        np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
    return bm


def bloom_member_col(
    spark, hashes, m_bits: int = M_BITS, n_probes: int = N_PROBES
):
    """Return a function mapping an int64 hash Column to a boolean
    membership Column (vectorized pandas_udf over the broadcast bitmap).

    The bitmap builds from the BUILD side's distinct keys — by contract
    the small side (here: the held-out benchmark grams), same size bound
    as broadcasting the key set itself, but the bitmap stays m/8 bytes
    even when the key set wouldn't fit."""
    from spark_ml_spatialjointransformer_spark.functions._serde import (
        ensure_udf_portability,
    )

    ensure_udf_portability()  # `member` closes over module-level _h1_h2
    bc = spark.sparkContext.broadcast(build_bitmap(hashes, m_bits, n_probes))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def member(s: pd.Series) -> pd.Series:
        import numpy as np  # executor-side body

        bm = bc.value
        h = s.to_numpy(dtype=np.int64)
        h1, h2 = _h1_h2(h, m_bits)
        ok = np.ones(len(h), dtype=bool)
        for i in range(n_probes):
            p = (h1 + i * h2) % m_bits
            ok &= ((bm[p >> 3] >> (p & 7)) & 1).astype(bool)
        return pd.Series(ok)

    return member
