"""Table loaders over the driver's TPC-H-ish parquet plus deterministic
geo-column synthesis.

The driver's tables (TESTDATA.md) carry no spatial columns, so the engine's
scale queries synthesize WGS84 lon/lat points and rectangle WKT from the
integer keys.  Every formula is integer arithmetic followed by one double
division/offset, written IDENTICALLY here (Spark Column expressions) and in
:mod:`queries`' DuckDB oracle SQL — bit-identical doubles in both engines.

Latitudes are clamped to ±60° so the reference's ``meters/35000`` degree
inflation for `withindist` prefilters (SpatialJoin.scala:62-80) stays a
strict over-approximation (1° lon ≥ 55 km at 60°).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Session-scoped RELATION cache: building `spark.read.parquet(path)`
#: costs ~75-120 ms of driver work (file listing + footer schema
#: inference) EVERY call, and a full registry pass makes ~1000 such
#: calls over the same ten static files — pure repeated metadata work,
#: ~1.5 min of driver time per bench sweep (guide §5: the driver should
#: do almost no data work; §6: listing is cached per session — schema
#: inference was not).  A DataFrame handle is an immutable logical plan:
#: reusing it holds NO rows, every action still scans the parquet, so
#: this is plan reuse (exactly what a registered temp view would give),
#: not result caching.  Keyed weakly per session so test suites that
#: churn sessions don't pin them; safe because the driver testdata is
#: static for a session's lifetime (anything that rewrites its own
#: parquet output reads it back through a fresh `spark.read`, never
#: through this loader).
_RELATION_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _cached(spark: SparkSession, key: str, build) -> DataFrame:
    try:
        per = _RELATION_CACHE.setdefault(spark, {})
    except TypeError:  # session impl without weakref support (stubs)
        return build()
    df = per.get(key)
    if df is None:
        df = build()
        per[key] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    return _cached(spark, path, lambda: spark.read.parquet(path))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with a proper TimestampType ``ts``.

    The driver writes ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4
    refuses to read unless ``spark.sql.legacy.parquet.nanosAsLong`` is set
    (runtime-settable).  We read nanos as long and truncate to microseconds
    (``timestamp_micros(ts div 1000)``) — DuckDB keeps nanos, but every
    query aggregates at ≥second granularity so results agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def build() -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df

    return _cached(spark, f"{sf_dir}/events.parquet#events", build)


# --- point synthesis ------------------------------------------------------
# customers and suppliers get different multipliers so they are not colocated

CUST_LON_SQL = "(c_custkey * 9973 % 3600) / 10.0 - 180.0"
CUST_LAT_SQL = "(c_custkey * 7919 % 1200) / 10.0 - 60.0"
SUPP_LON_SQL = "(s_suppkey * 7177 % 3600) / 10.0 - 180.0"
SUPP_LAT_SQL = "(s_suppkey * 4831 % 1200) / 10.0 - 60.0"


def customers_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("lon", F.expr(CUST_LON_SQL))
        .withColumn("lat", F.expr(CUST_LAT_SQL))
    )


def suppliers_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .withColumn("lon", F.expr(SUPP_LON_SQL))
        .withColumn("lat", F.expr(SUPP_LAT_SQL))
    )


# --- rectangle synthesis --------------------------------------------------
# offsets 0.05 / 0.03 keep every rect edge off the 0.1-grid points and off
# each other, so strict-vs-closed boundary semantics can never disagree
# between the engine's DE-9IM kernels and the oracle's interval arithmetic.

NATION_RECT_SQL = {
    "x0": "(n_nationkey * 131 % 300) - 170 + 0.05",
    "y0": "(n_nationkey * 61 % 100) - 55 + 0.05",
    "x1": "(n_nationkey * 131 % 300) - 170 + 0.05 + (n_nationkey % 7) * 3 + 4",
    "y1": "(n_nationkey * 61 % 100) - 55 + 0.05 + (n_nationkey % 5) * 2 + 3",
}

SUPP_RECT_SQL = {
    "x0": "(s_suppkey * 37 % 300) - 170 + 0.03",
    "y0": "(s_suppkey * 53 % 100) - 55 + 0.03",
    "x1": "(s_suppkey * 37 % 300) - 170 + 0.03 + (s_suppkey % 5) * 2 + 3",
    "y1": "(s_suppkey * 53 % 100) - 55 + 0.03 + (s_suppkey % 3) * 2 + 2",
}


def _rect_wkt(x0, y0, x1, y1):
    """Axis-aligned rectangle as POLYGON WKT (closed ring, CCW)."""
    return F.concat(
        F.lit("POLYGON(("),
        x0.cast("string"), F.lit(" "), y0.cast("string"), F.lit(","),
        x1.cast("string"), F.lit(" "), y0.cast("string"), F.lit(","),
        x1.cast("string"), F.lit(" "), y1.cast("string"), F.lit(","),
        x0.cast("string"), F.lit(" "), y1.cast("string"), F.lit(","),
        x0.cast("string"), F.lit(" "), y0.cast("string"),
        F.lit("))"),
    )


def nations_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "nation")
    b = {k: F.expr(v) for k, v in NATION_RECT_SQL.items()}
    return df.withColumn("wkt", _rect_wkt(b["x0"], b["y0"], b["x1"], b["y1"]))


def suppliers_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "supplier")
    b = {k: F.expr(v) for k, v in SUPP_RECT_SQL.items()}
    return df.withColumn("wkt", _rect_wkt(b["x0"], b["y0"], b["x1"], b["y1"]))
