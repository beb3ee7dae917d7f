"""Cross-engine 60-bit hash primitive.

Every probabilistic dedup/similarity operator keys on ``h60``: the first 15
hex digits of md5, parsed as a 60-bit BIGINT.  md5 is the one cryptographic
hash that Spark, DuckDB, and hashlib all expose with identical semantics, so
choosing it makes every LSH signature *SQL-expressible in the DuckDB oracle*
— the same move t8's winnowing fingerprints made (operators/fingerprint.py).
60 bits (not 64) keeps every downstream shift/multiply/sum clear of the
BIGINT sign bit in both engines.

The three synchronized forms:

- Spark Column:  ``h60_col`` / ``h60_binary_col``  (conv(substr(md5 …)))
- DuckDB SQL:    ``h60_sql``                       (CAST('0x' || … AS BIGINT))
- Python:        ``h60_py``                        (int(md5 hex[:15], 16))

tests/test_units.py pins all three to the same golden values.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits of the hash — 15 hex digits
H60_BITS = 60


def h60_binary_col(c: Column) -> Column:
    """60-bit md5 hash of a binary column (Spark)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_col(c: Column) -> Column:
    """60-bit md5 hash of a string column's UTF-8 bytes (Spark)."""
    return h60_binary_col(F.encode(c, "utf-8"))


def h60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same hash of ``expr`` (string or
    blob — DuckDB's md5 hashes a VARCHAR's UTF-8 bytes, matching
    ``encode(col, 'utf-8')`` on the Spark side)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h60_py(s: str | bytes) -> int:
    """Python reference implementation (test oracles)."""
    data = s.encode() if isinstance(s, str) else s
    return int(hashlib.md5(data).hexdigest()[:15], 16)
