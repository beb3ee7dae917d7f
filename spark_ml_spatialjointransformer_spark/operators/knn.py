"""Partitioned (big×big) nearest-neighbor join — the beyond-reference scale
path that lifts the broadcast memory bound of ``nearest``.

The reference's contract requires the indexed side to fit in memory
(/root/reference/README.md:163-166); at 100 TB a kNN whose query side
outgrows memory is the first real wall.  This operator keeps BOTH sides
distributed:

1. bucket both sides on a fixed-width lon/lat grid (cell keys — small ints,
   the only thing that shuffles besides the carried payload);
2. iterative radius expansion: round ``r`` joins each unresolved left row's
   Chebyshev-``r`` cell ANNULUS (only the new ring, not the already-seen
   disk) against the right side's cells — a plain shuffled hash join on the
   cell key, skew-safe under AQE;
3. local argmin via the partially-aggregatable ``min(struct(...))`` (one
   candidate per left row crosses each round's shuffle);
4. a row RESOLVES when its best-so-far distance is provably smaller than
   anything outside the explored disk.  The bound is per-row:

   - crossing > r unseen latitude cells means Δφ > r·w, so
     d > r·w·110500 m (min meters per degree of latitude, WGS84-safe);
   - crossing > r unseen longitude cells means Δλ > r·w, so
     d > r·w·70600·cos(φmax) m (chord bound with the polar radius, where
     φmax bounds both endpoints' latitudes: |φ_left| + (r+1)·w);

   rows too close to a pole for the longitude bound to converge
   (|lat| ≥ 75°) join on the latitude band alone — all longitudes of the
   band, which at the pole IS the neighborhood — so only the latitude
   bound applies to them;
5. the radius doubles each round; once the ring covers the globe every
   remaining row resolves unconditionally, so termination is guaranteed
   (rows that never met a right row vanish — inner-join semantics).

Dense data resolves almost everything in the first rounds; the driver loop
runs O(log(globe/cell)) rounds worst-case.  ``localCheckpoint`` truncates
the per-round lineage (same trade-off as the LSH self-joins).  At
production scale the right side would be written bucketed by cell so the
per-round shuffle of the right side disappears; the left side's payload
stays OUT of the loop entirely (only id + coords + best-struct iterate) and
is joined back once at the end.
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEBUG = bool(os.environ.get("SJT_KNN_DEBUG"))

#: grid cell width (degrees) — decoupled from data scale; 4° keeps the
#: round count low (each driver round costs a scheduling round-trip) while
#: cells stay fine enough to prune
KNN_CELL_DEG = 4.0
#: minimum meters per degree of latitude (WGS84 meridian arc ≥ 110567;
#: margin for kernel differences)
_MPD_LAT = 110500.0
#: chord bound per degree of longitude at the equator, polar radius
#: (2·6356752/180 ≈ 70630; margin)
_MPD_LON = 70600.0
#: rows with |lat| ≥ this use latitude-band joins (cos φ too small for the
#: longitude bound to converge near the poles)
_POLAR_LAT = 75.0
_PHI_CAP = 89.9


def partitioned_nearest(
    left: DataFrame,
    right: DataFrame,
    left_id_cols: list[str],
    left_xy: tuple[str, str],
    right_pay_cols: list[str],
    right_xy: tuple[str, str],
    tie_break: list[str],
    dist_expr,
    distance_column: str | None,
    out_names: list[str],
    cell_deg: float = KNN_CELL_DEG,
    max_rounds: int = 16,
) -> DataFrame:
    """For every left row, the nearest right row — no broadcast of either
    side.  ``dist_expr(lx, ly, rx, ry) -> Column`` computes meters;
    ``out_names`` = output columns in order left_id_cols ++ renamed
    right_pay_cols (++ distance_column).  Ties break on (distance,
    tie_break right columns, right insertion id) like the broadcast paths.
    """
    w = cell_deg
    nbx = max(1, int(round(360.0 / w)))
    nby_r = int(math.floor(90.0 / w)) - int(math.floor(-90.0 / w)) + 1

    lx, ly = F.col(left_xy[0]), F.col(left_xy[1])
    rx, ry = F.col(right_xy[0]), F.col(right_xy[1])

    def wrap_cx(c: Column) -> Column:
        return ((c % nbx) + nbx) % nbx

    R = (
        right.select(
            *[F.col(c) for c in right_pay_cols],
            rx.alias("__rx"),
            ry.alias("__ry"),
            wrap_cx(F.floor(rx / w)).alias("__rcx"),
            F.floor(ry / w).alias("__rcy"),
        )
        .withColumn("__rid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )

    # the loop state: only id + coords + cell + best-so-far struct iterate
    rem = left.select(
        *[F.col(c) for c in left_id_cols],
        lx.alias("__lx"),
        ly.alias("__ly"),
    ).withColumn("__pid", F.monotonically_increasing_id())
    payload = rem.localCheckpoint(eager=False)  # joined back at the end
    rem = payload.select(
        "__pid",
        "__lx",
        "__ly",
        wrap_cx(F.floor(F.col("__lx") / w)).alias("__lcx"),
        F.floor(F.col("__ly") / w).alias("__lcy"),
        (F.abs(F.col("__ly")) >= F.lit(_POLAR_LAT)).alias("__polar"),
        F.lit(None)
        .cast(_best_type(right, right_pay_cols, tie_break))
        .alias("__best"),
    )

    sel = _best_struct(right_pay_cols, tie_break)
    resolved: DataFrame | None = None
    half = nbx // 2
    # sparse schedule: each driver round costs several scheduling
    # round-trips, so grow the radius aggressively; the cell join prunes
    # the (≈ 16×) annulus area growth.  r=2 resolves the bulk for
    # realistically dense data; the final entry forces global coverage.
    schedule = [4, 32, max(nbx, nby_r)][: max(1, max_rounds)]
    schedule[-1] = max(schedule[-1], nbx, nby_r)
    r_prev = -1  # first round is the full disk INCLUDING the own cell
    for r in schedule:
        _t0 = time.time()
        global_cover = (2 * r + 1) >= nbx and (2 * r + 1) >= nby_r

        # ONE cell join per round: polar rows sweep every longitude cell of
        # the band (their dx bounds cover the whole ring of the globe), so
        # no separate band-join branch.  Annulus via per-row sequence
        # explodes + filter (a literal offset array would put (2r+1)^2
        # elements into one codegen expression).
        dx_lo = F.when(F.col("__polar"), F.lit(-half)).otherwise(F.lit(-r))
        dx_hi = F.when(F.col("__polar"), F.lit(nbx - half - 1)).otherwise(F.lit(r))
        new_ring = F.when(
            F.col("__polar"), F.abs(F.col("__dy")) > r_prev
        ).otherwise(F.greatest(F.abs("__dx"), F.abs("__dy")) > r_prev)
        cand = (
            rem.withColumn("__dx", F.explode(F.sequence(dx_lo, dx_hi)))
            .withColumn("__dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .where(new_ring)
            .withColumn("__jcx", wrap_cx(F.col("__lcx") + F.col("__dx")))
            .withColumn("__jcy", F.col("__lcy") + F.col("__dy"))
            .join(
                R,
                (F.col("__jcx") == F.col("__rcx")) & (F.col("__jcy") == F.col("__rcy")),
            )
        )

        found = (
            cand.withColumn(
                "__d",
                dist_expr(
                    F.col("__lx"), F.col("__ly"), F.col("__rx"), F.col("__ry")
                ),
            )
            .groupBy("__pid")
            .agg(F.min(sel).alias("__new"))
        )
        # ONE materialization per round (repartitioned first: AQE would
        # coalesce the shrinking state to one partition and serialize the
        # next round's much larger explode+join); done/rem are then cheap
        # filters over the checkpointed result, so neither the final union
        # nor the next round recomputes this round's join
        par = left.sparkSession.sparkContext.defaultParallelism
        merged = (
            rem.join(found, "__pid", "left")
            .withColumn("__best", F.least("__best", "__new"))
            .drop("__new")
            .repartition(par)
            .localCheckpoint(eager=True)
        )

        if global_cover:
            final = merged.where(F.col("__best").isNotNull())
            resolved = final if resolved is None else resolved.unionByName(final)
            break

        # Per-row resolution test: the best-so-far is provably THE nearest
        # when no point outside the explored disk can be closer.
        # - latitude crossing (> r unseen lat cells): d > r·w·_MPD_LAT;
        # - longitude crossing at lat offset Δφ from this row:
        #   d ≥ max(Δφ·_MPD_LAT, r·w·_MPD_LON·cos(|φ|+Δφ)).  Offsets with
        #   Δφ·_MPD_LAT ≥ best already lose on latitude alone, so only
        #   Δφ ≤ best/_MPD_LAT matters — evaluating cos at THAT offset (not
        #   at the full ring height, whose cos collapses to 0 as r grows)
        #   keeps the bound convergent at every latitude.
        d_best = F.col("__best.__d")
        lat_ok = d_best <= F.lit(_MPD_LAT * r * w)
        phi_star = F.least(
            F.lit(_PHI_CAP),
            F.abs(F.col("__ly"))
            + F.least(F.lit((r + 1) * w), d_best / F.lit(_MPD_LAT)),
        )
        lon_ok = d_best <= F.lit(_MPD_LON * r * w) * F.cos(F.radians(phi_star))
        accept = (
            F.col("__best").isNotNull()
            & lat_ok
            & (F.lit((2 * r + 1) >= nbx) | F.col("__polar") | lon_ok)
        )

        done = merged.where(accept)
        resolved = done if resolved is None else resolved.unionByName(done)
        rem = merged.where(~F.coalesce(accept, F.lit(False)))
        if _DEBUG:
            print(
                f"[knn] round r={r}: rem_next={rem.count()} "
                f"({time.time() - _t0:.1f}s)", flush=True,
            )
        if rem.isEmpty():
            break
        r_prev = r

    out_right = [
        F.col(f"__best.p.__p{i}").alias(out_names[len(left_id_cols) + i])
        for i in range(len(right_pay_cols))
    ]
    cols = [F.col(c).alias(n) for c, n in zip(left_id_cols, out_names)] + out_right
    if distance_column:
        cols.append(
            F.round(F.col("__best.__d")).cast("int").alias(distance_column)
        )
    return payload.join(resolved.select("__pid", "__best"), "__pid").select(*cols)


def _best_struct(right_pay_cols: list[str], tie_break: list[str]) -> Column:
    return F.struct(
        F.col("__d").alias("__d"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tie_break)],
        F.col("__rid").alias("__rid"),
        F.struct(
            *[F.col(c).alias(f"__p{i}") for i, c in enumerate(right_pay_cols)]
        ).alias("p"),
    )


def _best_type(right: DataFrame, right_pay_cols: list[str], tie_break: list[str]):
    """StructType of the best-so-far column (for the initial NULL)."""
    from pyspark.sql import types as T

    fields = {f.name: f for f in right.schema.fields}
    out = [T.StructField("__d", T.DoubleType())]
    for i, c in enumerate(tie_break):
        out.append(T.StructField(f"__tb{i}", fields[c].dataType))
    out.append(T.StructField("__rid", T.LongType()))
    out.append(
        T.StructField(
            "p",
            T.StructType(
                [
                    T.StructField(f"__p{i}", fields[c].dataType)
                    for i, c in enumerate(right_pay_cols)
                ]
            ),
        )
    )
    return T.StructType(out)
