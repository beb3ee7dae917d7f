"""The core operator: broadcast spatial join, compiled to one DataFrame plan.

Semantics (parity with reference BroadcastSpatialJoin.scala:349-478):

- two sides: the transformer *input* and an *external* dataset;
- ``broadcast_input=True`` (default) broadcasts the input and iterates the
  external side; the spatial predicate is evaluated as
  ``iterated.predicate(broadcast)`` — e.g. default direction + ``within``
  means "external geometry within input geometry";
- ``nearest`` returns, for every iterated-side row, the single nearest
  broadcast-side row by geodesic centroid distance (result cardinality =
  iterated side row count);
- ``withindist n``: all pairs whose rounded geodesic centroid distance ≤ n
  meters (coarse degree-window prefilter, exact re-filter —
  SpatialJoin.scala:62-80, BroadcastSpatialJoin.scala:353-368);
- extra ``condition`` filters candidate pairs *before* nearest selection
  (BroadcastSpatialJoin.scala:493-535); ``left`` = external, ``right`` =
  input, in both directions;
- output = all input columns ++ selected/aliased external columns ++
  optional Int-meters distance, in that order
  (BroadcastSpatialJoin.scala:401-432);
- rows with null/unparseable geometry are dropped (inner-join semantics,
  DatasetGeometry.scala:40-42,64).

Execution strategy (Spark-first, nothing leaves DataFrame land):

- candidate enumeration = ``join(F.broadcast(small), on=<sargable bbox
  window>)`` → Catalyst picks BroadcastNestedLoopJoin; bbox columns are
  extracted from WKT **JVM-side** (regexp + higher-order array functions, no
  Python) so the prefilter runs inside whole-stage codegen;
- exact geometry predicates and the WGS84 geodesic run as Arrow
  ``pandas_udf`` batches (vectorized numpy; per-batch WKT parse memoization);
  point-point joins with the haversine kernel stay 100% JVM-side;
- ``nearest`` = ``groupBy(iterated-row-id).agg(F.min(struct(distance,
  tie-break, payload)))`` — min is partially aggregatable, so Spark combines
  map-side and shuffles ONE candidate row per iterated row instead of
  windowing the full candidate set (this is the 100TB-scale reason to prefer
  min-over-struct to ``row_number() == 1``);
- ties broken deterministically by (distance, tie_break cols, broadcast row
  id) — the reference leaves ties to index-traversal order
  (nondeterministic); we document and pin ours.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_ml_spatialjointransformer_spark.functions._serde import (
    ensure_udf_portability,
)
from spark_ml_spatialjointransformer_spark.functions.geodesic import (
    geodesic_distance_udf,
    haversine_expr,
)
from spark_ml_spatialjointransformer_spark.functions.geometry import (
    PREDICATE_FUNCS,
    axis_rect,
    centroid,
    parse_wkt,
    point_geom,
    point_in_polygon_np,
    polygon_predicate_np,
    rect_predicate_np,
)
from spark_ml_spatialjointransformer_spark.plans.config import (
    SideConfig,
    SpatialJoinPlan,
    condition_external_columns,
    rewrite_condition,
)

EXT_PREFIX = "__sjt_e__"
_NUM_PATTERN = r"[-+]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][-+]?[0-9]+)?"

# geometry-kind capability flags per predicate
_NEEDS_BBOX = {"withindist", "within", "contains", "intersects", "overlaps"}
_NEEDS_REFINE = {"within", "contains", "intersects", "overlaps"}


def _wkt_number_array(col: Column) -> Column:
    """All numeric tokens of a WKT string as array<double> — pure JVM
    (regexp_extract_all + transform), stays in whole-stage codegen."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(_NUM_PATTERN), F.lit(0)),
        lambda x: x.cast("double"),
    )


def _wkt_centroid_udf():
    """Arrow pandas_udf: WKT → struct(x, y); nulls for unparseable input.
    Parse results are memoized per batch (broadcast sides repeat heavily)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )

    @F.pandas_udf(schema)
    def _centroid(wkt: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[float, float] | None] = {}
        xs: list[float | None] = []
        ys: list[float | None] = []
        for w in wkt:
            if w in cache:
                c = cache[w]
            else:
                g = parse_wkt(w) if isinstance(w, str) else None
                c = centroid(g) if g is not None else None
                if len(cache) > 200_000:
                    cache.clear()
                cache[w] = c
            xs.append(c[0] if c else None)
            ys.append(c[1] if c else None)
        return pd.DataFrame({"x": xs, "y": ys})

    # pure function; nondeterministic only to block SPARK-17728
    # re-substitution (the not-null filter on the derived centroid
    # columns re-inlined the parse, doubling the Arrow pass)
    return _centroid.asNondeterministic()


def _refine_udf(op: str, l_is_wkt: bool = True, r_is_wkt: bool = True):
    """Arrow pandas_udf evaluating ``op(left_geom, right_geom)`` over
    (wkt|point) encodings of both sides; unparseable/null geometry → False
    (the pair is dropped — inner-join null semantics).

    Fast path: when one side is raw points and the other a polygon WKT and
    the predicate reduces to point-in-polygon (within / contains /
    intersects), the batch is grouped by the polygon value and evaluated as
    a vectorized numpy ray-cast — O(edges) vector passes per distinct
    polygon instead of a Python call per pair (the broadcast side repeats
    heavily, so distinct polygons per batch ≪ rows)."""

    fn = PREDICATE_FUNCS[op]
    # (points are on the left?) and the strictness the op implies
    pip_dir, pip_ok = None, ()  # "l"/"r" = which side is the points side
    if op == "within" and not l_is_wkt and r_is_wkt:
        pip_dir, pip_ok = "l", (1,)
    elif op == "contains" and l_is_wkt and not r_is_wkt:
        pip_dir, pip_ok = "r", (1,)
    elif op == "intersects" and (l_is_wkt != r_is_wkt):
        pip_dir, pip_ok = ("r" if l_is_wkt else "l"), (0, 1)

    @F.pandas_udf("boolean")
    def _refine(
        l_wkt: pd.Series,
        l_x: pd.Series,
        l_y: pd.Series,
        r_wkt: pd.Series,
        r_x: pd.Series,
        r_y: pd.Series,
    ) -> pd.Series:
        cache: dict[str, object] = {}

        def geom(w, x, y):
            if isinstance(w, str):
                if w in cache:
                    return cache[w]
                g = parse_wkt(w)
                if len(cache) > 200_000:
                    cache.clear()
                cache[w] = g
                return g
            if x is None or y is None or x != x or y != y:
                return None
            return point_geom(float(x), float(y))

        n = len(l_wkt)
        if pip_dir is not None and n:
            # point_in_polygon_np is a module-top import: an import statement
            # INSIDE this worker-side body would require the package on the
            # executor PYTHONPATH, defeating ensure_udf_portability
            px = (l_x if pip_dir == "l" else r_x).to_numpy(dtype=np.float64)
            py = (l_y if pip_dir == "l" else r_y).to_numpy(dtype=np.float64)
            poly_wkt = r_wkt if pip_dir == "l" else l_wkt
            out = np.zeros(n, dtype=bool)
            valid = ~(np.isnan(px) | np.isnan(py))
            for w in poly_wkt.unique():
                g = geom(w, None, None)
                mask = (poly_wkt == w).to_numpy() & valid
                if g is None or not mask.any():
                    continue
                if g.kind == "polygon":
                    res = point_in_polygon_np(px[mask], py[mask], g)
                    out[mask] = np.isin(res, pip_ok)
                else:  # point × line etc. — scalar fallback for this group
                    idxs = np.nonzero(mask)[0]
                    for i in idxs:
                        p = point_geom(float(px[i]), float(py[i]))
                        out[i] = bool(
                            fn(p, g) if pip_dir == "l" else fn(g, p)
                        )
            return pd.Series(out)

        # general WKT×WKT path.  Axis-aligned rectangles (bboxes, tiles —
        # the dominant real-world WKT shape) vectorize: every DE-9IM
        # predicate on closed positive-extent rects is interval arithmetic
        # (rect_predicate_np), detected ONCE per distinct WKT through the
        # memo.  Irregular polygon×polygon pairs evaluate once per DISTINCT
        # (left, right) pair per batch (the broadcast side repeats heavily,
        # and WKT×WKT joins often repeat whole pairs across candidate rows)
        # through the numpy edge-table kernel (polygon_predicate_np): the
        # Ea×Eb segment tests run as one broadcast orient computation and
        # vertex containment as one ray-cast batch — identical outcomes to
        # the scalar DE-9IM kernels, asserted by the property suite.
        rect_memo: dict[str, tuple | None] = {}

        def rect_of(w):
            if not isinstance(w, str):
                return None
            r = rect_memo.get(w, False)
            if r is False:
                r = axis_rect(geom(w, None, None))
                rect_memo[w] = r
            return r

        ra = [rect_of(w) for w in l_wkt]
        rb = [rect_of(w) for w in r_wkt]
        fast = np.array([a is not None and b is not None for a, b in zip(ra, rb)])
        out = np.zeros(n, dtype=bool)
        if fast.any():
            A = np.array([a for a, m in zip(ra, fast) if m], dtype=np.float64)
            B = np.array([b for b, m in zip(rb, fast) if m], dtype=np.float64)
            out[fast] = rect_predicate_np(op, A, B)
        if not fast.all():
            pair_memo: dict[tuple, bool] = {}
            for i in np.nonzero(~fast)[0]:
                w1, x1, y1 = l_wkt.iat[i], l_x.iat[i], l_y.iat[i]
                w2, x2, y2 = r_wkt.iat[i], r_x.iat[i], r_y.iat[i]
                key = (
                    w1 if isinstance(w1, str) else (x1, y1),
                    w2 if isinstance(w2, str) else (x2, y2),
                )
                hit = pair_memo.get(key)
                if hit is None:
                    g1 = geom(w1, x1, y1)
                    g2 = geom(w2, x2, y2)
                    hit = bool(
                        g1 is not None
                        and g2 is not None
                        and polygon_predicate_np(op, g1, g2)
                    )
                    if len(pair_memo) > 200_000:
                        pair_memo.clear()
                    pair_memo[key] = hit
                out[i] = hit
        return pd.Series(out)

    return _refine


def _prepare_side(
    df: DataFrame,
    side: SideConfig,
    tag: str,
    need_centroid: bool,
    need_bbox: bool,
    need_wkt: bool,
) -> DataFrame:
    """Attach internal geometry columns (``__sjt_{tag}_*``) and drop rows
    with null geometry.  All bbox math is JVM-side; only WKT centroids use a
    pandas_udf."""
    gx, gy = f"__sjt_{tag}_gx", f"__sjt_{tag}_gy"
    x0, y0, x1, y1 = (f"__sjt_{tag}_{c}" for c in ("x0", "y0", "x1", "y1"))
    wktc = f"__sjt_{tag}_wkt"

    if not side.is_wkt:
        lon = F.col(side.point_columns.lon).cast("double")
        lat = F.col(side.point_columns.lat).cast("double")
        # lenient coercion parity: DatasetGeometry.scala:90-96,105-107
        df = df.where(lon.isNotNull() & lat.isNotNull())
        if need_centroid:
            df = df.withColumns({gx: lon, gy: lat})
        if need_bbox:
            df = df.withColumns({x0: lon, y0: lat, x1: lon, y1: lat})
        if need_wkt:
            df = df.withColumn(wktc, F.lit(None).cast("string"))
        return df

    wcol = F.col(side.wkt_column)
    nums = _wkt_number_array(wcol)
    xs = F.filter(nums, lambda v, i: i % 2 == 0)
    ys = F.filter(nums, lambda v, i: i % 2 == 1)
    if need_bbox:
        df = df.withColumns(
            {
                x0: F.array_min(xs),
                y0: F.array_min(ys),
                x1: F.array_max(xs),
                y1: F.array_max(ys),
            }
        )
        df = df.where(F.col(x0).isNotNull() & F.col(y0).isNotNull())
    else:
        # null-geometry drop without bbox columns
        df = df.where(F.size(nums) >= 2)
    if need_centroid:
        c = _wkt_centroid_udf()(wcol)
        df = df.withColumns({gx: c.getField("x"), gy: c.getField("y")})
        df = df.where(F.col(gx).isNotNull())
    if need_wkt:
        df = df.withColumn(wktc, wcol.cast("string"))
    return df


def _bbox_condition(op: str, lt: str, rt: str) -> Column | None:
    """Sargable coarse prefilter relating the two sides' bboxes.

    - within  (left within right):   left bbox ⊆ right bbox
    - contains (left contains right): right bbox ⊆ left bbox
    - intersects/overlaps:            bbox intersection
    - withindist: handled by ``_withindist_bins`` (grid-cell equi-keys +
      degree windows), not here
    - nearest: None (unbounded search)
    """
    lx0, ly0, lx1, ly1 = (F.col(f"__sjt_{lt}_{c}") for c in ("x0", "y0", "x1", "y1"))
    rx0, ry0, rx1, ry1 = (F.col(f"__sjt_{rt}_{c}") for c in ("x0", "y0", "x1", "y1"))
    if op == "within":
        return (lx0 >= rx0) & (lx1 <= rx1) & (ly0 >= ry0) & (ly1 <= ry1)
    if op == "contains":
        return (rx0 >= lx0) & (rx1 <= lx1) & (ry0 >= ly0) & (ry1 <= ly1)
    if op in ("intersects", "overlaps"):
        return (lx0 <= rx1) & (lx1 >= rx0) & (ly0 <= ry1) & (ly1 >= ry0)
    return None


#: withindist grid binning: the bin width is DECOUPLED from the radius (a
#: radius-sized bin makes the equi-key's selectivity collapse as the radius
#: grows — candidate volume then scales like the cross join), clamped so that
#: (a) tiny radii over wide geometries can't explode rows into millions of
#: bins, and (b) large radii keep a useful number of distinct keys.
_BIN_W_MIN, _BIN_W_MAX = 0.5, 2.0
#: longitude binning is disabled for radii so large the ±360° wraparound
#: frames could overlap (a pair matching under two shifts would duplicate);
#: for points that needs 2·radius ≥ 360°, so 90° is a 4× safety margin.
_LON_BIN_MAX_RADIUS_DEG = 90.0
#: chord lower bound: a pair within d meters has Δλ ≤ d / (_MPD_LON·cos φmax)
#: degrees (2·polar-radius/180 ≈ 70630; margin) — the latitude-AWARE lon
#: window.  The reference's flat meters/35000 inflation stops over-covering
#: above ~72° latitude (its known limitation); the oracle gate demands exact
#: semantics at every latitude, so the engine goes beyond the reference here.
_MPD_LON_CHORD = 70600.0
_PHI_CAP_DEG = 89.99


def _lon_window_deg(radius_m: float, d: float, phi_basis: Column) -> Column:
    """Safe longitude half-window (degrees) for a side whose partner's
    latitude can reach ``|phi_basis| + d`` (the inflated lat window):
    ``radius / (70600 · cos(φmax))``, capped so near-pole rows get the
    'whole circle' sentinel (≥ 180)."""
    phi_max = F.least(F.lit(_PHI_CAP_DEG), F.abs(phi_basis) + F.lit(d))
    return F.least(
        F.lit(360.0), F.lit(radius_m / _MPD_LON_CHORD) / F.cos(F.radians(phi_max))
    )


def _withindist_bins(
    left: DataFrame,
    right: DataFrame,
    lt: str,
    rt: str,
    d: float,
    radius_m: float,
    lon_binnable: bool,
) -> tuple[DataFrame, DataFrame, Column]:
    """Discretize the distance join into grid-cell equi-keys so Catalyst
    plans a hash join (broadcast or shuffled) with O(cell-density) probe
    cost instead of a nested loop over every broadcast row.

    - Latitude (always): left explodes over the bands its bbox covers,
      right over its radius-expanded interval; a pair sharing several bands
      survives only in the band of ``max(ly0, ry0 - d)`` (reference-point
      dedup — no distinct needed).  Sequences are clamped to the ±90° globe
      range, so off-globe garbage can't inflate rows.
    - Longitude (point×point sides only): same scheme with antimeridian
      wraparound — the right side emits (bin, shift) pairs for the shifts
      {-360, 0, +360} whose expanded window reaches into [-180, 180], and
      the precise per-shift window + reference-bin dedup keep each matching
      pair exactly once.  WKT sides keep longitude in the residual condition
      (a globe-spanning polygon would otherwise explode quadratically).

    Returns ``(left, right, condition)`` with the bin columns attached and
    the full coarse spatial condition (equi-keys + dedup + degree windows).
    The exact meter re-filter stays downstream (SpatialJoin.scala:353-368).
    """
    w = max(_BIN_W_MIN, min(_BIN_W_MAX, d))
    dd, ww = F.lit(float(d)), F.lit(float(w))
    ly0, ly1 = F.col(f"__sjt_{lt}_y0"), F.col(f"__sjt_{lt}_y1")
    ry0, ry1 = F.col(f"__sjt_{rt}_y0"), F.col(f"__sjt_{rt}_y1")
    lat_lo, lat_hi = math.floor(-90.0 / w), math.floor(90.0 / w)

    def clamped_seq(lo: Column, hi: Column, lo_lim: int, hi_lim: int) -> Column:
        lo = F.greatest(lo, F.lit(lo_lim))
        hi = F.least(hi, F.lit(hi_lim))
        return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<bigint>")
        )

    left = left.withColumn(
        "__sjt_bin_l",
        F.explode(clamped_seq(F.floor(ly0 / ww), F.floor(ly1 / ww), lat_lo, lat_hi)),
    )
    right = right.withColumn(
        "__sjt_bin_r",
        F.explode(
            clamped_seq(
                F.floor((ry0 - dd) / ww), F.floor((ry1 + dd) / ww), lat_lo, lat_hi
            )
        ),
    )
    ref_bin = F.greatest(
        F.floor(F.greatest(ly0, ry0 - dd) / ww), F.lit(lat_lo)
    )
    cond = (
        (F.col("__sjt_bin_l") == F.col("__sjt_bin_r"))
        & (F.col("__sjt_bin_l") == ref_bin)
        & (ly0 - dd <= ry1)
        & (ly1 + dd >= ry0)
    )

    lx0, lx1 = F.col(f"__sjt_{lt}_x0"), F.col(f"__sjt_{lt}_x1")
    rx0, rx1 = F.col(f"__sjt_{rt}_x0"), F.col(f"__sjt_{rt}_x1")

    if not lon_binnable:
        # longitude window with antimeridian wraparound stays residual: a
        # pair at lon -180.0 vs +177.7 is ~250 km apart but 357.7 apart in
        # raw degrees (the reference's planar index misses these; the
        # geodesic refine is wraparound-correct, so the prefilter must be).
        # The half-window is latitude-aware; near-pole rows (dl ≥ 180)
        # place no longitude constraint at all.
        dl = _lon_window_deg(radius_m, d, F.greatest(F.abs(ry0), F.abs(ry1)))
        wide = dl >= F.lit(180.0)

        def lon_ok(shift: float) -> Column:
            return (lx0 - dl <= rx1 + shift) & (lx1 + dl >= rx0 + shift)

        return (
            left,
            right,
            cond & (wide | lon_ok(0.0) | lon_ok(360.0) | lon_ok(-360.0)),
        )

    lon_lo, lon_hi = math.floor(-180.0 / w), math.floor(180.0 / w)
    # clamp the left bin into the same [lon_lo, lon_hi] domain as the right
    # side's emitted cells: a left lon marginally outside [-180, 180]
    # (dirty data) then behaves like boundary data instead of silently
    # matching nothing (in-domain rows are unaffected — floor(lx0/ww) is
    # already inside the clamp range)
    left = left.withColumn(
        "__sjt_lbin_l",
        F.greatest(F.least(F.floor(lx0 / ww), F.lit(lon_hi)), F.lit(lon_lo)),
    )

    def _bin_shift_struct(shift: float):
        # single-arg lambda: a 2-arg lambda would be read by F.transform as
        # its (element, index) variant and bind the shift to the array index
        return lambda b: F.struct(b.alias("bin"), F.lit(shift).alias("sh"))

    # per-row latitude-aware half-window; rows whose window reaches the
    # whole circle (dl ≥ 180) emit every cell in the s=0 frame only, so a
    # pair matches exactly one (bin, shift) and needs no dedup
    dl = _lon_window_deg(radius_m, d, ry0)
    wide = dl >= F.lit(180.0)
    full_range = F.transform(
        F.sequence(F.lit(lon_lo), F.lit(lon_hi)), _bin_shift_struct(0.0)
    )
    arrs = []
    for s in (-360.0, 0.0, 360.0):
        lo = F.greatest(F.floor((rx0 + s - dl) / ww), F.lit(lon_lo))
        hi = F.least(F.floor((rx1 + s + dl) / ww), F.lit(lon_hi))
        normal = F.when(
            lo <= hi, F.transform(F.sequence(lo, hi), _bin_shift_struct(s))
        ).otherwise(F.array().cast("array<struct<bin:bigint,sh:double>>"))
        if s == 0.0:
            arrs.append(F.when(wide, full_range).otherwise(normal))
        else:
            arrs.append(
                F.when(
                    wide, F.array().cast("array<struct<bin:bigint,sh:double>>")
                ).otherwise(normal)
            )
    right = (
        right.withColumn("__sjt_lonbin", F.explode(F.concat(*arrs)))
        .withColumn("__sjt_lbin_r", F.col("__sjt_lonbin.bin"))
        .withColumn("__sjt_sh", F.col("__sjt_lonbin.sh"))
        .drop("__sjt_lonbin")
    )
    sh = F.col("__sjt_sh")
    dl_post = _lon_window_deg(radius_m, d, F.col(f"__sjt_{rt}_y0"))
    wide_post = dl_post >= F.lit(180.0)
    lon_ref = F.least(
        F.greatest(
            F.floor(F.greatest(lx0, rx0 + sh - dl_post) / ww), F.lit(lon_lo)
        ),
        F.lit(lon_hi),
    )
    lon_cond = F.when(wide_post, F.lit(True)).otherwise(
        (F.col("__sjt_lbin_l") == lon_ref)
        & (lx0 - dl_post <= rx1 + sh)
        & (lx1 + dl_post >= rx0 + sh)
    )
    cond = cond & (F.col("__sjt_lbin_l") == F.col("__sjt_lbin_r")) & lon_cond
    return left, right, cond


def _bbox_bins(
    op: str, left: DataFrame, right: DataFrame, lt: str, rt: str
) -> tuple[DataFrame, DataFrame, Column]:
    """Grid-cell equi-keys for the bbox predicates under
    ``strategy='partitioned'`` — big×big joins with no broadcast for
    within/contains/intersects/overlaps.

    - ``within`` (left ⊆ right): the left side emits only its bbox
      MIN-CORNER cell — containment implies the right side's covered cells
      include it — so no dedup is needed (one cell per left row);
    - ``contains``: symmetric (right emits its corner, left explodes);
    - ``intersects``/``overlaps``: both sides explode their covered cells
      and a pair survives only in the cell of the bbox-intersection's min
      corner (the withindist reference-point dedup at radius 0).

    Cells are planar (no antimeridian wrap), matching the reference's
    planar bbox semantics for these predicates; sequences clamp to the
    globe range so degenerate geometry can't explode rows.  The precise
    bbox window stays in the residual condition and the exact DE-9IM
    refine runs downstream unchanged.
    """
    w = _BIN_W_MAX
    ww = F.lit(w)
    lat_lo, lat_hi = math.floor(-90.0 / w), math.floor(90.0 / w)
    lon_lo, lon_hi = math.floor(-180.0 / w), math.floor(180.0 / w)

    def clamp(c: Column, lo: int, hi: int) -> Column:
        return F.greatest(F.least(c, F.lit(hi)), F.lit(lo))

    def cover(df: DataFrame, tag: str) -> DataFrame:
        x0, y0, x1, y1 = (F.col(f"__sjt_{tag}_{c}") for c in ("x0", "y0", "x1", "y1"))

        def seq(lo: Column, hi: Column, lo_lim: int, hi_lim: int) -> Column:
            lo, hi = clamp(lo, lo_lim, hi_lim), clamp(hi, lo_lim, hi_lim)
            return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )

        return df.withColumn(
            f"__sjt_cx_{tag}",
            F.explode(seq(F.floor(x0 / ww), F.floor(x1 / ww), lon_lo, lon_hi)),
        ).withColumn(
            f"__sjt_cy_{tag}",
            F.explode(seq(F.floor(y0 / ww), F.floor(y1 / ww), lat_lo, lat_hi)),
        )

    def corner(df: DataFrame, tag: str) -> DataFrame:
        x0, y0 = F.col(f"__sjt_{tag}_x0"), F.col(f"__sjt_{tag}_y0")
        return df.withColumn(
            f"__sjt_cx_{tag}", clamp(F.floor(x0 / ww), lon_lo, lon_hi)
        ).withColumn(f"__sjt_cy_{tag}", clamp(F.floor(y0 / ww), lat_lo, lat_hi))

    dedup: Column | None = None
    if op == "within":
        left, right = corner(left, lt), cover(right, rt)
    elif op == "contains":
        left, right = cover(left, lt), corner(right, rt)
    else:  # intersects / overlaps
        left, right = cover(left, lt), cover(right, rt)
        lx0, ly0 = F.col(f"__sjt_{lt}_x0"), F.col(f"__sjt_{lt}_y0")
        rx0, ry0 = F.col(f"__sjt_{rt}_x0"), F.col(f"__sjt_{rt}_y0")
        dedup = (
            F.col(f"__sjt_cx_{lt}")
            == clamp(F.floor(F.greatest(lx0, rx0) / ww), lon_lo, lon_hi)
        ) & (
            F.col(f"__sjt_cy_{lt}")
            == clamp(F.floor(F.greatest(ly0, ry0) / ww), lat_lo, lat_hi)
        )

    cond = (F.col(f"__sjt_cx_{lt}") == F.col(f"__sjt_cx_{rt}")) & (
        F.col(f"__sjt_cy_{lt}") == F.col(f"__sjt_cy_{rt}")
    )
    if dedup is not None:
        cond = cond & dedup
    return left, right, cond


def prepare_external(df: DataFrame, plan: SpatialJoinPlan) -> DataFrame:
    """Filter → project → repartition the external side, then move it into
    the internal ``__sjt_e__`` namespace so it can never collide with input
    column names.  Parity: BroadcastSpatialJoin.scala:233-248."""
    side = plan.external_side
    if plan.filter:
        df = df.filter(plan.filter)

    keep: list[str] = []
    for name, _alias in plan.data_columns:
        if name not in keep:
            keep.append(name)
    geom_cols = (
        [side.wkt_column]
        if side.is_wkt
        else [side.point_columns.lon, side.point_columns.lat]
    )
    # tie_break columns survive pruning even when not projected out —
    # nearest-ties are broken on them BEFORE the data_columns projection,
    # and dropping them here surfaced as an unresolved `__sjt_e__<col>`
    # (r6: j32 asked for k=3 nearest keeping only s_nationkey).  tie_break
    # names BROADCAST-side columns, which is the INPUT side under
    # broadcast="input" — keep only the ones that live on this frame.
    tb_here = [c for c in plan.tie_break if c in df.columns]
    for c in geom_cols + tb_here + condition_external_columns(plan.condition):
        if c and c not in keep:
            keep.append(c)
    df = df.select(*keep)

    if plan.num_partitions:
        df = df.repartition(plan.num_partitions)
    return df.select([F.col(c).alias(f"{EXT_PREFIX}{c}") for c in df.columns])


def _prefixed_side(side: SideConfig) -> SideConfig:
    from spark_ml_spatialjointransformer_spark.plans.config import PointColumns

    if side.is_wkt:
        return SideConfig(wkt_column=f"{EXT_PREFIX}{side.wkt_column}")
    return SideConfig(
        point_columns=PointColumns(
            f"{EXT_PREFIX}{side.point_columns.lon}",
            f"{EXT_PREFIX}{side.point_columns.lat}",
        )
    )


def spatial_join(
    input_df: DataFrame, external_df: DataFrame, plan: SpatialJoinPlan
) -> DataFrame:
    """Compile the spatial join plan against the two DataFrames.

    ``external_df`` is the raw external dataset (pre-filter); ``input_df`` is
    the transformer input.  Returns the joined DataFrame with columns
    ``input ++ selected-aliased-external ++ [distance]``.

    ``num_partitions`` honors the reference X1 contract (output has exactly
    N partitions — BroadcastSpatialJoinTest.scala:151): broadcast plans that
    iterate the repartitioned external side carry N through for free; plans
    that shuffle after the join (nearest aggregation/window, partitioned
    strategy) append one explicit repartition.
    """
    out = _compile_spatial_join(input_df, external_df, plan)
    if plan.num_partitions:
        preserved = (
            plan.strategy == "broadcast"
            and plan.broadcast_input  # external side is the iterated left
            and (plan.op != "nearest" or not plan.condition)
        )
        if not preserved:
            out = out.repartition(plan.num_partitions)
    return out


def _compile_spatial_join(
    input_df: DataFrame, external_df: DataFrame, plan: SpatialJoinPlan
) -> DataFrame:
    ensure_udf_portability()
    op = plan.op
    if plan.strategy == "partitioned" and op == "nearest":
        if plan.external_side.is_wkt or plan.input_side.is_wkt:
            raise ValueError(
                "strategy='partitioned' nearest requires point geometry on both sides"
            )
    if op == "withindist" and plan.radius_meters <= 0:
        raise ValueError(
            "withindist requires a positive radius in meters, e.g. "
            f"'withindist 500' (got predicate {plan.predicate!r})"
        )
    if plan.k != 1 and op != "nearest":
        raise ValueError(f"k={plan.k} is only meaningful for 'nearest'")
    if plan.k < 1:
        raise ValueError(f"k must be >= 1 (got {plan.k})")
    need_dist = bool(plan.distance_column) or op in ("nearest", "withindist")
    need_refine = op in _NEEDS_REFINE
    need_bbox = op in _NEEDS_BBOX

    ext = prepare_external(external_df, plan)
    ext_side = _prefixed_side(plan.external_side)

    input_cols = list(input_df.columns)

    ext = _prepare_side(ext, ext_side, "e", need_dist, need_bbox, need_refine)
    inp = _prepare_side(
        input_df, plan.input_side, "i", need_dist, need_bbox, need_refine
    )

    # iterated (left) vs broadcast (right); predicate applies left.op(right)
    if plan.broadcast_input:
        left, right, lt, rt = ext, inp, "e", "i"
    else:
        left, right, lt, rt = inp, ext, "i", "e"

    # Parallelism guard: the iterated side drives every task.  Small local
    # parquet collapses to 1-2 input splits, which would serialize the whole
    # join; at cluster scale the side already has >= defaultParallelism
    # partitions and this is a no-op (stats-only probe — see
    # operators/_guard.py).  An explicit numPartitions on the external side
    # is honored as-is (reference X1 semantics).
    explicit_parts = plan.num_partitions is not None and lt == "e"
    if not explicit_parts and not left.isStreaming:
        from spark_ml_spatialjointransformer_spark.operators._guard import (
            ensure_min_parallelism,
        )

        left = ensure_min_parallelism(left)

    if op == "nearest" and plan.strategy == "partitioned":
        # big×big kNN: grid cells + radius-expansion rounds, no broadcast
        return _partitioned_nearest_route(left, right, lt, rt, plan, input_cols)

    if op == "nearest":
        # fast path: vectorized broadcast-kNN, no join/shuffle at all.
        # A simple `left.<col> op right.<col>` numeric condition rides
        # along as an in-kernel candidate mask (distances of disallowed
        # pairs set to +inf before the argmin) — same semantics as the
        # min-struct path's post-join filter, but without the
        # BroadcastNestedLoopJoin + 15M-row SortAggregate it forces
        # (measured sf0.1: j10 2.9s agg path → ~1s masked kernel).
        # Conditions the parser doesn't recognize fall through to the
        # general aggregation path below.
        cond_spec = (
            _kernel_condition_spec(plan.condition, ext, inp)
            if plan.condition
            else None
        )
        if not plan.condition or cond_spec is not None:
            return _broadcast_knn(
                left, right, lt, plan, input_cols, inp, ext, cond_spec
            )

    if op == "nearest":
        # per-row ids only exist for the nearest aggregation/window paths
        # (group key + deterministic tie order); predicate joins never read
        # them — and leaving them off keeps those plans streaming-legal
        left = left.withColumn("__sjt_lid", F.monotonically_increasing_id())
        right = right.withColumn("__sjt_rid", F.monotonically_increasing_id())

    cond = (
        None if op == "withindist" else _bbox_condition(op, lt, rt)
    )
    if plan.condition:
        rewritten = rewrite_condition(plan.condition, EXT_PREFIX)
        _validate_condition_syntax(input_df, rewritten, plan.condition)
        extra = F.expr(rewritten)
        cond = extra if cond is None else (cond & extra)

    if op == "withindist":
        l_cfg = ext_side if lt == "e" else plan.input_side
        r_cfg = plan.input_side if rt == "i" else ext_side
        lon_binnable = (
            not l_cfg.is_wkt
            and not r_cfg.is_wkt
            and plan.radius_degrees < _LON_BIN_MAX_RADIUS_DEG
        )
        left, right, bin_cond = _withindist_bins(
            left, right, lt, rt, plan.radius_degrees, plan.radius_meters,
            lon_binnable,
        )
        cond = bin_cond if cond is None else (bin_cond & cond)
    elif plan.strategy == "partitioned":
        # bbox predicates under partitioned strategy: grid-cell equi-keys
        # turn the would-be nested loop into a shuffled hash join
        left, right, bin_cond = _bbox_bins(op, left, right, lt, rt)
        cond = bin_cond if cond is None else (bin_cond & cond)

    if plan.strategy == "partitioned":
        # big×big join: no broadcast — both sides shuffle on the grid-cell
        # equi-keys built above (sort-merge/shuffled-hash under AQE,
        # skew-split on hot cells)
        joined = left.join(right, on=cond, how="inner")
    else:
        joined = (
            left.crossJoin(F.broadcast(right))
            if cond is None
            else left.join(F.broadcast(right), on=cond, how="inner")
        )

    if need_refine:
        def side_args(tag: str, side: SideConfig):
            if side.is_wkt:
                return [
                    F.col(f"__sjt_{tag}_wkt"),
                    F.lit(None).cast("double"),
                    F.lit(None).cast("double"),
                ]
            return [
                F.lit(None).cast("string"),
                F.col(side.point_columns.lon).cast("double"),
                F.col(side.point_columns.lat).cast("double"),
            ]

        l_side = ext_side if lt == "e" else plan.input_side
        r_side = plan.input_side if rt == "i" else ext_side
        joined = joined.where(
            _refine_udf(op, l_side.is_wkt, r_side.is_wkt)(
                *side_args(lt, l_side), *side_args(rt, r_side)
            )
        )

    if need_dist:
        args = (
            F.col("__sjt_e_gx"),
            F.col("__sjt_e_gy"),
            F.col("__sjt_i_gx"),
            F.col("__sjt_i_gy"),
        )
        if plan.distance_kernel == "haversine":
            dist = haversine_expr(*args)
        else:
            dist = geodesic_distance_udf()(*args)
        joined = joined.withColumn("__sjt_dist", dist)

    if op == "withindist":
        # exact re-filter on rounded Int meters: BroadcastSpatialJoin.scala:353-368
        joined = joined.where(
            F.round(F.col("__sjt_dist")).cast("int") <= int(plan.radius_meters)
        )

    if op != "nearest":
        # output assembly: input cols ++ selected external ++ distance
        out_cols: list[Column] = [F.col(c) for c in input_cols]
        for name, alias in plan.data_columns:
            out_cols.append(F.col(f"{EXT_PREFIX}{name}").alias(alias))
        if plan.distance_column:
            out_cols.append(
                F.round(F.col("__sjt_dist")).cast("int").alias(plan.distance_column)
            )
        return joined.select(*out_cols)

    if op == "nearest" and plan.k > 1:
        # k-nearest with extra condition: row_number over the candidate set
        # (a k-row min-struct would not be partially aggregatable; the
        # window shuffles the post-condition candidates once)
        from pyspark.sql.window import Window

        tb_order = [
            F.col(c if rt == "i" else f"{EXT_PREFIX}{c}") for c in plan.tie_break
        ]
        wnd = Window.partitionBy("__sjt_lid").orderBy(
            F.col("__sjt_dist"), *tb_order, F.col("__sjt_rid")
        )
        out_cols = [F.col(c) for c in input_cols]
        for name, alias in plan.data_columns:
            out_cols.append(F.col(f"{EXT_PREFIX}{name}").alias(alias))
        if plan.distance_column:
            out_cols.append(
                F.round(F.col("__sjt_dist")).cast("int").alias(plan.distance_column)
            )
        return (
            joined.withColumn("__sjt_rn", F.row_number().over(wnd))
            .where(F.col("__sjt_rn") <= plan.k)
            .select(*out_cols)
        )

    # nearest (with extra condition): min-by-(distance, tie-break, rid) per
    # iterated row.  min is partially aggregatable, so only one candidate
    # per group crosses the shuffle; columns of the iterated side are
    # group-constants and travel via first() instead of inflating the
    # compared struct.
    out_items: list[tuple[str, int, str]] = []  # (side, idx, out_name)
    left_exprs: list[Column] = []
    right_exprs: list[Column] = []

    def _route(col: Column, out_name: str, from_left: bool) -> None:
        if from_left:
            out_items.append(("left", len(left_exprs), out_name))
            left_exprs.append(col)
        else:
            out_items.append(("right", len(right_exprs), out_name))
            right_exprs.append(col)

    for c in input_cols:
        _route(F.col(c), c, from_left=(lt == "i"))
    for name, alias in plan.data_columns:
        _route(F.col(f"{EXT_PREFIX}{name}"), alias, from_left=(lt == "e"))
    if plan.distance_column:
        _route(
            F.round(F.col("__sjt_dist")).cast("int"),
            plan.distance_column,
            from_left=False,  # varies per candidate — must ride the min-struct
        )

    tb_cols = [
        F.col(c if rt == "i" else f"{EXT_PREFIX}{c}").alias(f"__tb{i}")
        for i, c in enumerate(plan.tie_break)
    ]
    sel = F.struct(
        F.col("__sjt_dist").alias("__d"),
        *tb_cols,
        F.col("__sjt_rid").alias("__rid"),
        F.struct(
            *[e.alias(f"__p{i}") for i, e in enumerate(right_exprs)]
        ).alias("p"),
    )
    aggs = [F.min(sel).alias("__m")] + [
        F.first(e).alias(f"__l{i}") for i, e in enumerate(left_exprs)
    ]
    final = [
        (F.col(f"__l{idx}") if side == "left" else F.col(f"__m.p.__p{idx}")).alias(name)
        for side, idx, name in out_items
    ]
    return joined.groupBy("__sjt_lid").agg(*aggs).select(*final)


def _validate_condition_syntax(df: DataFrame, rewritten: str, original: str) -> None:
    """Config-time failure parity: the reference rejects bad ``condition``
    strings when the plan is built (IllegalArgumentException,
    BroadcastSpatialJoin.scala:531).  ``F.expr`` defers parsing to analysis,
    so force a parse here; on backends without the classic parser handle the
    failure still surfaces at analysis (best-effort early check)."""
    try:
        parser = df.sparkSession._jsparkSession.sessionState().sqlParser()
    except Exception:
        return
    try:
        parser.parseExpression(rewritten)
    except Exception as e:
        raise ValueError(
            f"invalid condition {original!r}: "
            "not parseable as a SQL boolean expression"
        ) from e


def _partitioned_nearest_route(
    left: DataFrame,
    right: DataFrame,
    lt: str,
    rt: str,
    plan: SpatialJoinPlan,
    input_cols: list[str],
) -> DataFrame:
    """Adapter from the plan surface to operators/knn.partitioned_nearest:
    routes payload/tie-break columns per join direction and restores the
    contract output order (input cols ++ data cols ++ distance)."""
    from spark_ml_spatialjointransformer_spark.operators.knn import (
        partitioned_nearest,
    )

    if lt == "i":
        left_ids = list(input_cols)
        right_pay = [f"{EXT_PREFIX}{n}" for n, _ in plan.data_columns]
        out_names = list(input_cols) + [a for _, a in plan.data_columns]
        tb = [f"{EXT_PREFIX}{c}" for c in plan.tie_break]
    else:
        left_ids = [f"{EXT_PREFIX}{n}" for n, _ in plan.data_columns]
        right_pay = list(input_cols)
        out_names = [a for _, a in plan.data_columns] + list(input_cols)
        tb = list(plan.tie_break)

    cond_col = None
    l_extra: list[str] = []
    r_extra: list[str] = []
    if plan.condition:
        from spark_ml_spatialjointransformer_spark.plans.config import (
            condition_input_columns,
        )

        rewritten = rewrite_condition(plan.condition, EXT_PREFIX)
        _validate_condition_syntax(left, rewritten, plan.condition)
        cond_col = F.expr(rewritten)
        ext_cond = [
            f"{EXT_PREFIX}{c}" for c in condition_external_columns(plan.condition)
        ]
        inp_cond = condition_input_columns(plan.condition)
        l_extra, r_extra = (
            (inp_cond, ext_cond) if lt == "i" else (ext_cond, inp_cond)
        )

    if plan.distance_kernel == "haversine":
        dist_fn = haversine_expr
    else:
        _geo = geodesic_distance_udf()

        def dist_fn(a, b, c, d):  # noqa: ANN001 — Column quadruple
            return _geo(a, b, c, d)

    res = partitioned_nearest(
        left,
        right,
        left_ids,
        (f"__sjt_{lt}_gx", f"__sjt_{lt}_gy"),
        right_pay,
        (f"__sjt_{rt}_gx", f"__sjt_{rt}_gy"),
        tb,
        dist_fn,
        plan.distance_column,
        out_names,
        condition=cond_col,
        l_extra_cols=l_extra,
        r_extra_cols=r_extra,
        k=plan.k,
    )
    order = list(input_cols) + [a for _, a in plan.data_columns]
    if plan.distance_column:
        order.append(plan.distance_column)
    return res.select(*order)


def _knn_kernel(kernel: str):
    from spark_ml_spatialjointransformer_spark.functions.geodesic import (
        haversine_np,
        vincenty_np,
    )

    return haversine_np if kernel == "haversine" else vincenty_np


#: condition shapes the vectorized kNN kernel can evaluate as a numpy mask:
#: one comparison between one external and one input column, both numeric.
_KERNEL_COND_RE = re.compile(
    r"^\s*left\.(\w+)\s*(==|=|!=|<>|<=|>=|<|>)\s*right\.(\w+)\s*$"
)
#: the flipped spelling (`right.B op left.A`) normalizes into the same
#: spec with the comparison mirrored
_KERNEL_COND_RE_FLIP = re.compile(
    r"^\s*right\.(\w+)\s*(==|=|!=|<>|<=|>=|<|>)\s*left\.(\w+)\s*$"
)

_MIRROR_OP = {
    "=": "=", "==": "==", "!=": "!=", "<>": "<>",
    "<": ">", "<=": ">=", ">": "<", ">=": "<=",
}

_KERNEL_COND_OPS = {
    "=": lambda e, i: e == i,
    "==": lambda e, i: e == i,
    "!=": lambda e, i: e != i,
    "<>": lambda e, i: e != i,
    "<": lambda e, i: e < i,
    "<=": lambda e, i: e <= i,
    ">": lambda e, i: e > i,
    ">=": lambda e, i: e >= i,
}

_KERNEL_COND_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType,
)


def _kernel_condition_spec(
    condition: str, ext: DataFrame, inp: DataFrame
) -> "tuple[str, str, str] | None":
    """Parse ``left.<A> op right.<B>`` into ``(ext_col, op, inp_col)`` if —
    and only if — the vectorized kNN kernel can evaluate it exactly:
    single comparison, both columns plain NUMERIC (int/float) columns of
    their sides.  Anything else (compound booleans, string/timestamp
    operands, expressions) returns None and the caller routes the join
    through the general min-struct aggregation path, whose F.expr handles
    arbitrary SQL.  Values are compared in float64 inside the kernel, so
    integral operands are loudly rejected at runtime beyond 2^53 (see
    the kernel's ``_cond_f64_local``) rather than silently losing equality precision."""
    m = _KERNEL_COND_RE.match(condition)
    if m is not None:
        ext_col, op_s, inp_col = m.group(1), m.group(2), m.group(3)
    else:
        m = _KERNEL_COND_RE_FLIP.match(condition)
        if m is None:
            return None
        inp_col, op_s, ext_col = m.group(1), m.group(2), m.group(3)
        op_s = _MIRROR_OP[op_s]
    ext_fields = {f.name: f.dataType for f in ext.schema.fields}
    inp_fields = {f.name: f.dataType for f in inp.schema.fields}
    et = ext_fields.get(f"{EXT_PREFIX}{ext_col}")
    it = inp_fields.get(inp_col)
    if not isinstance(et, _KERNEL_COND_NUMERIC):
        return None
    if not isinstance(it, _KERNEL_COND_NUMERIC):
        return None
    return ext_col, op_s, inp_col


def _broadcast_knn(
    left: DataFrame,
    right: DataFrame,
    lt: str,
    plan: SpatialJoinPlan,
    input_cols: list[str],
    inp: DataFrame,
    ext: DataFrame,
    cond_spec: "tuple[str, str, str] | None" = None,
) -> DataFrame:
    """``nearest`` fast path: the broadcast side is collected (it must fit in
    memory — the reference's own contract, README.md:163-166), shipped as a
    Spark broadcast of numpy arrays, and each iterated-side partition
    computes a vectorized distance matrix + argmin via mapInPandas.

    Compared to cross-join + min-aggregate this removes the joined
    intermediate AND the shuffle entirely: output partitioning == iterated
    side partitioning, O(L·R/cores) numpy flops.  Ties break by the
    tie_break columns then by broadcast collect order (stable argmin on a
    pre-sorted array).
    """
    ensure_udf_portability()
    spark = left.sparkSession
    kernel = _knn_kernel(plan.distance_kernel)

    # ---- broadcast side: payload + coordinates, deterministically ordered
    if lt == "i":  # right == external: contributes the selected data columns
        pay_src = [f"{EXT_PREFIX}{name}" for name, _ in plan.data_columns]
        out_right = [alias for _, alias in plan.data_columns]
        r_df, r_schema_src = ext, ext
        tb = [f"{EXT_PREFIX}{c}" for c in plan.tie_break]
    else:  # right == input: contributes every input column
        pay_src = list(input_cols)
        out_right = list(input_cols)
        r_df, r_schema_src = inp, inp
        tb = list(plan.tie_break)

    # condition mask operands: ext col rides with whichever side holds it
    if cond_spec is not None:
        c_ext, c_op, c_inp = cond_spec
        bc_cond_col = f"{EXT_PREFIX}{c_ext}" if lt == "i" else c_inp
        it_cond_col = c_inp if lt == "i" else f"{EXT_PREFIX}{c_ext}"
    else:
        bc_cond_col = it_cond_col = c_op = None

    # collect the broadcast side (object arrays: exact nulls/ints/timestamps,
    # unlike toPandas' float64 coercion of nullable ints)
    rt_tag = "i" if lt == "e" else "e"
    npay = len(pay_src)
    sel = r_df.select(
        *[F.col(c).alias(f"__pay{i}") for i, c in enumerate(pay_src)],
        F.col(f"__sjt_{rt_tag}_gx").alias("__gx"),
        F.col(f"__sjt_{rt_tag}_gy").alias("__gy"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tb)],
        *([F.col(bc_cond_col).alias("__cnd")] if bc_cond_col else []),
    )
    # Arrow transfer when every column is timezone-free: ~2-3x cheaper than
    # the pickled-Row path for a 10k+-row broadcast side (measured r11:
    # 0.48 s -> ~0.2 s of f7's per-run plan-build).  to_pylist() yields the
    # same exact python values as Row access for numeric/string/binary/
    # date/decimal; TIMESTAMP columns fall back to collect() because Arrow
    # hands back tz-AWARE datetimes where Row gives session-naive ones —
    # a silent value shift under non-UTC sessions.
    _TS = (T.TimestampType, T.TimestampNTZType)
    cols: dict[str, list] | None = None
    if not any(isinstance(f.dataType, _TS) for f in sel.schema.fields):
        try:
            tbl = sel.toArrow()
            cols = {
                name: tbl.column(i).to_pylist()
                for i, name in enumerate(tbl.column_names)
            }
            n_rows = tbl.num_rows
        except Exception:
            cols = None
    if cols is None:
        collected = sel.collect()
        names = sel.columns
        cols = {
            name: [r[j] for r in collected] for j, name in enumerate(names)
        }
        n_rows = len(collected)
    order = list(range(n_rows))
    if tb:
        # None-safe sort key, nulls FIRST — matching the SQL null ordering
        # of the min-struct aggregate path (a bare tuple key would raise
        # TypeError on None vs non-None comparisons)
        tbvals = [cols[f"__tb{i}"] for i in range(len(tb))]
        order.sort(
            key=lambda j: tuple(
                (tbvals[i][j] is not None, tbvals[i][j])
                for i in range(len(tb))
            )
        )
    r_lon = np.array([cols["__gx"][j] for j in order], dtype=np.float64)
    r_lat = np.array([cols["__gy"][j] for j in order], dtype=np.float64)
    r_payload = {
        out_right[i]: np.array(
            [cols[f"__pay{i}"][j] for j in order], dtype=object
        )
        for i in range(npay)
    }
    def _cond_f64_local(values):
        out = np.array(
            [np.nan if pd.isna(v) else float(v) for v in values],
            dtype=np.float64,
        )
        finite = np.isfinite(out)
        if np.any(np.abs(out[finite]) >= 2.0**53):
            raise ValueError(
                "spatial_join condition kernel: operand magnitude >= 2^53 "
                "loses comparison precision in float64 — use the "
                "aggregation path (rewrite the condition so the kernel "
                "parser skips it)"
            )
        return out

    r_cond = (
        _cond_f64_local([cols["__cnd"][j] for j in order])
        if cond_spec is not None
        else None
    )
    bc = spark.sparkContext.broadcast((r_lon, r_lat, r_payload, r_cond))

    # ---- output schema: input cols ++ aliased data cols ++ distance
    src_fields = {f.name: f for f in inp.schema.fields}
    ext_fields = {f.name: f for f in ext.schema.fields}
    fields = [
        T.StructField(c, src_fields[c].dataType, src_fields[c].nullable)
        for c in input_cols
    ]
    for name, alias in plan.data_columns:
        f = ext_fields[f"{EXT_PREFIX}{name}"]
        fields.append(T.StructField(alias, f.dataType, True))
    if plan.distance_column:
        fields.append(T.StructField(plan.distance_column, T.IntegerType(), True))
    out_schema = T.StructType(fields)

    left_keep = (
        list(input_cols) if lt == "i" else [f"{EXT_PREFIX}{n}" for n, _ in plan.data_columns]
    )
    left_out_names = (
        list(input_cols) if lt == "i" else [a for _, a in plan.data_columns]
    )
    lgx, lgy = f"__sjt_{lt}_gx", f"__sjt_{lt}_gy"
    distance_column = plan.distance_column
    is_geodesic = plan.distance_kernel != "haversine"
    # bound the B×R temp matrices.  Sized for CACHE, not just memory: the
    # haversine chain allocates ~8 full-size temporaries, and at 8M cells
    # (64 MB each) every op round-trips DRAM — measured r6: 8M-cell chunks
    # ran the same task 5x slower than 1M-cell chunks (6.5 s vs 1.3 s for
    # 11.7M pairs; vincenty's iterated temporaries: 76 s at 2M vs 45 s at
    # 125k cells).
    max_cells = 125_000 if is_geodesic else 1_000_000

    k = plan.k

    # everything the executor closure touches must be closure-local or an
    # importable third-party module: this module itself is NOT registered
    # for by-value pickling (ensure_udf_portability), so a reference to a
    # module-level helper here would ModuleNotFoundError on executors that
    # don't have the package installed (the repo's portability contract).
    # _KERNEL_COND_OPS holds plain lambdas (cloudpickle ships those by
    # value); the float64 conversion is re-stated as a nested function.
    op_fn = _KERNEL_COND_OPS[c_op] if cond_spec is not None else None

    def knn_batches(batches):
        r_lon_, r_lat_, r_payload_, r_cond_ = bc.value
        n_r = len(r_lon_)
        take = min(k, n_r)
        for pdf in batches:
            if n_r == 0 or len(pdf) == 0:
                continue
            l_lon = pdf[lgx].to_numpy(np.float64)
            l_lat = pdf[lgy].to_numpy(np.float64)
            l_cond = (
                _cond_f64_local(pdf[it_cond_col])
                if op_fn is not None
                else None
            )

            def mask_inf(dm, s, e):
                # disallowed pairs → +inf BEFORE the argmin; the condition
                # is written `left.<ext> op right.<inp>`, so orient the
                # operands by which side is iterated.  NULL operands never
                # match (numpy NaN != x is True, SQL says unknown → drop,
                # hence the explicit NaN mask).
                if lt == "i":
                    ev, iv = r_cond_[None, :], l_cond[s:e, None]
                else:
                    ev, iv = l_cond[s:e, None], r_cond_[None, :]
                ok = op_fn(ev, iv) & ~np.isnan(ev) & ~np.isnan(iv)
                dm[~ok] = np.inf
                return dm

            step = max(1, max_cells // max(n_r, 1))
            if take == 1:
                idx = np.empty(len(pdf), dtype=np.int64)
                dmin = np.empty(len(pdf), dtype=np.float64)
                for s in range(0, len(pdf), step):
                    e = min(s + step, len(pdf))
                    dm = kernel(
                        l_lon[s:e, None], l_lat[s:e, None],
                        r_lon_[None, :], r_lat_[None, :],
                    )
                    if op_fn is not None:
                        dm = mask_inf(dm, s, e)
                    idx[s:e] = np.argmin(dm, axis=1)  # first min → tie-break order
                    dmin[s:e] = dm[np.arange(e - s), idx[s:e]]
                rep = np.arange(len(pdf))
            else:
                # top-k: stable argsort keeps equal distances in broadcast
                # (tie-break) order, matching the window path's ordering
                idx2 = np.empty((len(pdf), take), dtype=np.int64)
                dk = np.empty((len(pdf), take), dtype=np.float64)
                for s in range(0, len(pdf), step):
                    e = min(s + step, len(pdf))
                    dm = kernel(
                        l_lon[s:e, None], l_lat[s:e, None],
                        r_lon_[None, :], r_lat_[None, :],
                    )
                    if op_fn is not None:
                        dm = mask_inf(dm, s, e)
                    order = np.argsort(dm, axis=1, kind="stable")[:, :take]
                    idx2[s:e] = order
                    dk[s:e] = dm[np.arange(e - s)[:, None], order]
                idx = idx2.ravel()
                dmin = dk.ravel()
                rep = np.repeat(np.arange(len(pdf)), take)
            if op_fn is not None:
                # inner-join semantics: candidates (and whole rows) whose
                # every pairing failed the condition simply don't emit
                keep = np.isfinite(dmin)
                rep, idx, dmin = rep[keep], idx[keep], dmin[keep]
            out = {}
            for name, src in zip(left_out_names, left_keep):
                out[name] = pdf[src].to_numpy()[rep]
            for name, arr in r_payload_.items():
                out[name] = arr[idx]
            if distance_column:
                out[distance_column] = np.floor(dmin + 0.5).astype(np.int32)
            yield pd.DataFrame(out)

    res = left.mapInPandas(knn_batches, schema=out_schema)
    # mapInPandas emits columns in dict order == left-then-right; reorder to
    # the contract: input cols ++ data cols ++ distance
    order = list(input_cols) + [a for _, a in plan.data_columns]
    if distance_column:
        order.append(distance_column)
    return res.select(*order)
