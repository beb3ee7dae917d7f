"""Z-order (Morton) spatial clustering key — the data-LAYOUT half of
spatial performance at 100 TB.

The join operators (operators/spatial_join.py) fix the compute shape; what
they cannot fix is I/O locality: a spatial range query over parquet laid
out in ingest order reads every row group.  Sorting by an interleaved-bit
Morton key clusters spatially-near rows into the same row groups, so
min/max column statistics prune file scans to the query window — the same
technique Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``, expressed here
as plain integer expressions any engine can evaluate.

Everything below is pure BIGINT shift/mask arithmetic (after ONE
float-quantize step whose op sequence is identical SQL text in Spark and
DuckDB), so z-keys are engine-exact and oracle-checkable — the same
cross-engine-determinism rule as functions/hashing.py.
"""

from __future__ import annotations

#: (shift, mask) chain spreading a 16-bit value over 32 bits with zero gaps
_SPREAD16 = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def quant16_sql(expr: str, lo: float, span: float) -> str:
    """SQL quantizing ``expr`` from [lo, lo+span] to a 16-bit integer.
    One multiply + one divide + floor — the identical IEEE op sequence in
    Spark and DuckDB, so the quantized value is bit-exact cross-engine."""
    return (
        f"CAST(floor((({expr}) - ({lo:.1f}e0)) * 65535e0 / {span:.1f}e0"
        " + 0.5e0) AS BIGINT)"
    )


def spread16_sql(col: str) -> str:
    """SQL spreading a 16-bit integer column over even bit positions of a
    32-bit value (classic shift-or-mask chain).  ``col`` should be a short
    column reference — the chain references it 2^4 times."""
    out = f"({col})"
    for shift, mask in _SPREAD16:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def zorder_sql(qx_col: str, qy_col: str) -> str:
    """SQL interleaving two 16-bit quantized columns into a 32-bit Morton
    key: x bits at even positions, y bits at odd."""
    return f"({spread16_sql(qx_col)} | ({spread16_sql(qy_col)} << 1))"


def quant16_py(v: float, lo: float, span: float) -> int:
    import math

    return int(math.floor((v - lo) * 65535.0 / span + 0.5))


def spread16_py(x: int) -> int:
    for shift, mask in _SPREAD16:
        x = (x | (x << shift)) & mask
    return x


def zorder_py(qx: int, qy: int) -> int:
    """Python reference implementation (test oracle)."""
    return spread16_py(qx) | (spread16_py(qy) << 1)
