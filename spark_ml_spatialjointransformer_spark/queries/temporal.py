"""Query registry, temporal family — split from the single-module registry (r11);
see ``queries/_core.py`` for the registration machinery and shared helpers."""

from __future__ import annotations

from spark_ml_spatialjointransformer_spark.queries._core import (
    DataFrame,
    F,
    QUERIES,
    QueryDef,
    SparkSession,
    _D1_ORACLE,
    _D25_BODY,
    _D25_ORACLE,
    _F6_END_SQL,
    _F6_START_SQL,
    _O_TS_DUCK,
    _O_TS_SPARK,
    _barrier,
    _register,
    _sql_query,
    load_events,
    load_table,
)



@_register("d1_asof_join", _D1_ORACLE)
def d1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each event picks the user's most recent
    order at event time.  Spark-side this is the union-merge plan (ONE
    window shuffle, no join node — see operators/temporal.py); the oracle
    is DuckDB's native ASOF LEFT JOIN, an algorithmically different merge
    implementation, so agreement checks the semantics not the plan."""
    from pyspark.sql.window import Window

    from spark_ml_spatialjointransformer_spark.operators.temporal import asof_join

    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id")
    w = Window.partitionBy("user_id", "o_ts").orderBy(F.col("o_orderkey").desc())
    od = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.expr(_O_TS_SPARK).alias("o_ts"),
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("total_e2"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return asof_join(
        ev,
        od,
        on=["user_id"],
        left_time="ts",
        right_time="o_ts",
        right_cols=(("o_orderkey", "order_key"), ("total_e2", "total_e2")),
    ).select("event_id", "user_id", "order_key", "total_e2")


_D2_ORACLE = f"""
WITH od AS (SELECT o_orderkey AS order_key, o_custkey AS user_id,
                   {_O_TS_DUCK} AS o_ts
            FROM orders)
SELECT od.order_key, count(*) AS n_events
FROM events e JOIN od
  ON e.user_id = od.user_id
 AND e.ts >= od.o_ts AND e.ts < od.o_ts + INTERVAL 7 DAY
GROUP BY od.order_key
"""


@_register("d2_range_join", _D2_ORACLE)
def d2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: events land in each order's 7-day follow-up
    window.  Spark-side the interval side explodes into 7-day buckets and
    the join is a hash equi-join on (user, bucket) + exact filter — the
    oracle runs the plain inequality join."""
    from spark_ml_spatialjointransformer_spark.operators.temporal import range_join

    week_us = 7 * 86400 * 1_000_000
    ev = load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        # ts may load as TIMESTAMP_NTZ (driver parquet is timestamp[us]);
        # session TZ is pinned UTC so the cast is value-preserving
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__p"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("user_id"),
        F.unix_micros(F.expr(_O_TS_SPARK)).alias("__lo"),
        (F.unix_micros(F.expr(_O_TS_SPARK)) + week_us).alias("__hi"),
    )
    return (
        range_join(
            ev, od, on=["user_id"], point_col="__p", lo_col="__lo",
            hi_col="__hi", bucket_width=week_us,
        )
        .groupBy("order_key")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_D3_SQL = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(v_e4) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov3_e4
FROM v
"""

#: 3-event moving sum per user (the feature-engineering window shape).
#: Each double scales to an integer ONCE per row (deterministic), and the
#: moving aggregate then runs over BIGINTs — integer-exact regardless of
#: how either engine implements sliding frames (segment trees, inverse
#: updates, or recompute all drift on floating point; none can drift on
#: ints).  Scale shape: one user_id shuffle, spillable within-user sort,
#: O(frame) running state.
QUERIES["d3_moving_window"] = QueryDef(_sql_query(("events",), _D3_SQL), _D3_SQL)


#: the explicit ts >= epoch filter (a no-op on this dataset) closes the
#: floor-vs-truncate asymmetry by construction: DuckDB's `//` floors while
#: Spark's `div` truncates toward zero, so a pre-1970 timestamp would
#: bucket differently (-5 // 10 = -1 vs -5 div 10 = 0).  On a non-negative
#: domain the two are identical.
_D4_ORACLE = """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
           WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
b AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM e GROUP BY user_id),
g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day_idx FROM b),
c AS (SELECT user_id, d AS day_idx, count(*) AS n FROM e GROUP BY user_id, d)
SELECT g.user_id, g.day_idx, COALESCE(c.n, 0) AS n_events
FROM g LEFT JOIN c USING (user_id, day_idx)
"""


@_register("d4_resample_daily", _D4_ORACLE)
def d4_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: each user's daily event
    counts over their OWN active span, zero-filled for silent days — the
    regular-grid densification every per-entity time-series feature needs.
    Day indices come from integer microsecond division (no doubles, no
    timezone math — exact in both engines).  Scale shape: per-user span
    agg + sequence explode generates only each user's own days (never a
    global calendar cross join); both aggregations shuffle on user keys
    with map-side combine."""
    # ts >= epoch keeps `div` (truncating) and the oracle's `//` (flooring)
    # identical by construction — see _D4_ORACLE comment
    ev = (
        load_events(spark, sf_dir)
        .where(F.expr("ts >= TIMESTAMP '1970-01-01 00:00:00'"))
        .select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("d"),
        )
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day_idx")
    )
    counts = ev.groupBy("user_id", F.col("d").alias("day_idx")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return grid.join(counts, ["user_id", "day_idx"], "left").select(
        "user_id", "day_idx", F.coalesce("n", F.lit(0)).alias("n_events")
    )


_D5_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id)
SELECT v.user_id,
       p.p_ts IS NOT NULL AS converted,
       COALESCE((epoch_us(p.p_ts) - epoch_us(v.v_ts)) // 60000000, -1)
         AS delay_min
FROM v LEFT JOIN p ON v.user_id = p.user_id
"""


@_register("d5_funnel", _D5_ORACLE)
def d5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: for every user with a 'view', whether a
    'purchase' followed it and after how many whole minutes — the ordered
    two-step pattern behind every conversion/attribution metric.  The
    delay is integer microsecond arithmetic (exact in both engines; a
    seconds-truncating formulation would disagree on sub-second
    boundaries).  Scale shape: both stages are type-filtered at the scan
    (predicate pushdown) and aggregate map-side per user; the step-2 join
    keys on user_id only."""
    ev = load_events(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # bigint `div`, not `/`: double division of near-integer quotients can
    # round up across the integer before a truncating cast.  `div` truncates
    # while the oracle's `//` floors, but the difference is non-negative BY
    # CONSTRUCTION (the step-2 join requires ts >= v_ts), where both agree.
    delay = F.expr(
        "(unix_micros(CAST(p_ts AS TIMESTAMP)) - "
        "unix_micros(CAST(v_ts AS TIMESTAMP))) div 60000000"
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("p_ts").isNotNull().alias("converted"),
            F.coalesce(delay, F.lit(-1)).cast("bigint").alias("delay_min"),
        )
    )


#: Both "snapshots" derive from orders by integer filters, so the diff is
#: fully deterministic: old = keys not divisible by 97, new = keys not
#: divisible by 89, and every key divisible by 13 gets +500 cents in new.
#: Prices scale to integer cents ONCE per row before any arithmetic.
_D6_ORACLE = """
WITH base AS (SELECT o_orderkey, o_orderpriority,
                     CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents
              FROM orders),
old AS (SELECT * FROM base WHERE o_orderkey % 97 <> 0),
new AS (SELECT o_orderkey, o_orderpriority,
               cents + CASE WHEN o_orderkey % 13 = 0 THEN 500 ELSE 0 END AS cents
        FROM base WHERE o_orderkey % 89 <> 0),
diff AS (
  SELECT coalesce(old.o_orderpriority, new.o_orderpriority) AS priority,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.cents <> new.cents THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         coalesce(new.cents, 0) - coalesce(old.cents, 0) AS delta
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
SELECT priority, change_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(delta) AS BIGINT) AS delta_cents
FROM diff GROUP BY priority, change_type
"""


@_register("d6_snapshot_diff", _D6_ORACLE)
def d6_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: full-outer-join two table versions on the
    primary key and classify every row added / removed / changed /
    unchanged, with the net value delta per priority class — the audit
    that precedes any incremental pipeline run.  Scale shape: one
    key-partitioned shuffle (sort-merge full outer join on the primary
    key — both snapshots co-partition, so at 100 TB this is the same
    one-pass merge a storage-level diff would do), then a tiny map-side
    combined aggregate.  Prices become integer cents before the diff, so
    `changed` is exact, never a double comparison."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT)").alias(
            "cents"
        ),
    )
    old = base.where(F.col("o_orderkey") % 97 != 0).alias("old")
    new = (
        base.where(F.col("o_orderkey") % 89 != 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            (
                F.col("cents")
                + F.when(F.col("o_orderkey") % 13 == 0, 500).otherwise(0)
            ).alias("cents"),
        )
        .alias("new")
    )
    diff = old.join(
        new, F.col("old.o_orderkey") == F.col("new.o_orderkey"), "full_outer"
    ).select(
        F.coalesce("old.o_orderpriority", "new.o_orderpriority").alias(
            "priority"
        ),
        F.when(F.col("old.o_orderkey").isNull(), "added")
        .when(F.col("new.o_orderkey").isNull(), "removed")
        .when(F.col("old.cents") != F.col("new.cents"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("new.cents", F.lit(0)) - F.coalesce("old.cents", F.lit(0))
        ).alias("delta"),
    )
    return diff.groupBy("priority", "change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delta").cast("bigint").alias("delta_cents"),
    )


#: d14 uses a RANGE frame on the epoch-micros key: peers at the same
#: timestamp are included together (peer-inclusive), which makes the
#: trailing window DETERMINISTIC under ties — a ROWS frame would depend
#: on the engine's sort order between equal timestamps.
_D14_ORACLE = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events)
SELECT user_id, event_id,
       CAST(sum(v_e4) OVER (PARTITION BY user_id ORDER BY t_us
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS trail7_e4
FROM e
"""


@_register("d14_trailing_window", _D14_ORACLE)
def d14_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day sum per user via a RANGE (interval) window frame —
    the sliding-by-TIME semantics the d3 ROWS frame can't express: the
    frame is 'everything in the last week', not 'the last N rows', and
    peer rows at an identical timestamp enter together, which is what
    makes the answer deterministic under ties.  Scale shape: one
    user-keyed exchange + per-partition ordered scan; the range frame
    evaluates with two moving pointers, no per-row rescan.  Integer e4
    values end-to-end."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-604_800_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum("v_e4").over(w).cast("bigint").alias("trail7_e4"),
    )


_D16_ORACLE = """
WITH e AS (SELECT user_id, event_id,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events)
SELECT user_id, event_id,
       CAST(128 * v_e4
            + 64 * coalesce(lag(v_e4, 1) OVER w, 0)
            + 32 * coalesce(lag(v_e4, 2) OVER w, 0)
            + 16 * coalesce(lag(v_e4, 3) OVER w, 0)
            +  8 * coalesce(lag(v_e4, 4) OVER w, 0)
            +  4 * coalesce(lag(v_e4, 5) OVER w, 0)
            +  2 * coalesce(lag(v_e4, 6) OVER w, 0)
            +  1 * coalesce(lag(v_e4, 7) OVER w, 0) AS BIGINT)
         AS ewma_x128_e4
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@_register("d16_ewma", _D16_ORACLE)
def d16_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2, 8 taps) per user —
    the smoothing signal every metrics pipeline wants and plain frame
    SUMs can't express, because each lag needs its OWN weight.  The
    recursive EWMA definition is unrollable to lag terms with
    power-of-two weights, so the whole thing is 8 ``lag`` expressions
    over ONE window (a single user-keyed exchange + ordered scan;
    Catalyst collapses same-window functions into one Window node) and
    stays integer-exact end-to-end — weights 128..1 are the 2^-i decay
    scaled by 2^7, no float division anywhere.  Ordering is by the
    integer sequence id (same nanos-vs-micros rationale as j28)."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    taps = F.lit(128) * F.col("v_e4")
    for i in range(1, 8):
        taps = taps + F.lit(128 >> i) * F.coalesce(
            F.lag("v_e4", i).over(w), F.lit(0)
        )
    return e.select(
        "user_id", "event_id", taps.cast("bigint").alias("ewma_x128_e4")
    )


#: d13 first/last-by-time are ARG-aggregates, not windows: the oracle
#: replays Spark's min/max-struct trick with rank-1 row_number picks
#: under the same total (ts, event_id) order.
_D13_ORACLE = """
WITH e AS (SELECT user_id, event_id, ts,
                  epoch_us(ts) // 86400000000 AS day_idx,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events),
r AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, day_idx
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, day_idx
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e),
o AS (SELECT user_id, day_idx, v_e4 AS open_e4 FROM r WHERE rn_a = 1),
c AS (SELECT user_id, day_idx, v_e4 AS close_e4 FROM r WHERE rn_d = 1),
g AS (SELECT user_id, day_idx, max(v_e4) AS high_e4, min(v_e4) AS low_e4,
             count(*) AS n_events
      FROM e GROUP BY user_id, day_idx)
SELECT g.user_id, g.day_idx, o.open_e4, g.high_e4, g.low_e4, c.close_e4,
       g.n_events
FROM g JOIN o USING (user_id, day_idx) JOIN c USING (user_id, day_idx)
"""


@_register("d13_ohlc_bars", _D13_ORACLE)
def d13_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per user — the candlestick rollup every
    time-series store ships: open/close are FIRST/LAST-BY-TIME
    arg-aggregates (min/max over a (ts, event_id, value) struct — the
    partially-aggregatable form, so map-side combine carries one
    candidate per group and NO window sort touches the fact), high/low
    are plain min/max, all in the SAME single aggregation.  One shuffle
    keyed (user, day) for the whole bar — the oracle needs three passes
    (two rank windows + a group) to say the same thing.  Integer e4
    values end-to-end."""
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias(
            "day_idx"
        ),
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
    )
    return e.groupBy("user_id", "day_idx").agg(
        F.min(F.struct("t_us", "event_id", "v_e4"))["v_e4"].alias("open_e4"),
        F.max("v_e4").alias("high_e4"),
        F.min("v_e4").alias("low_e4"),
        F.max(F.struct("t_us", "event_id", "v_e4"))["v_e4"].alias("close_e4"),
        F.count(F.lit(1)).alias("n_events"),
    )


_D7_ORACLE = """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events
           WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
day AS (SELECT user_id, d AS day_idx, CAST(sum(v_e4) AS BIGINT) AS day_e4
        FROM e GROUP BY user_id, d),
b AS (SELECT user_id, min(day_idx) AS d0, max(day_idx) AS d1
      FROM day GROUP BY user_id),
g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day_idx FROM b),
j AS (SELECT g.user_id, g.day_idx, day.day_e4
      FROM g LEFT JOIN day USING (user_id, day_idx))
SELECT user_id, day_idx,
       last_value(day_e4 IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING) AS filled_e4,
       day_e4 IS NULL AS is_gap
FROM j
"""


@_register("d7_gap_fill", _D7_ORACLE)
def d7_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward: densify each
    user's daily value series over their own active span (d4's grid) and
    forward-fill silent days from the last observed day — the LOCF
    interpolation every sensor/metrics/feature pipeline needs (d4
    zero-fills counts; d7 carries VALUES).  Values scale per-row to BIGINT
    before any aggregation, so the carried value is integer-exact in both
    engines.  Scale shape: day-sums and spans shuffle on user keys with
    map-side combine; the forward-fill window runs inside the same
    user-hash partitioning (no extra exchange), and the grid explode
    generates only each user's own days — never a global calendar cross
    join."""
    from pyspark.sql.window import Window

    ev = (
        load_events(spark, sf_dir)
        .where(F.expr("ts >= TIMESTAMP '1970-01-01 00:00:00'"))
        .select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("d"),
            F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
        )
    )
    day = ev.groupBy("user_id", F.col("d").alias("day_idx")).agg(
        F.sum("v_e4").alias("day_e4")
    )
    bounds = day.groupBy("user_id").agg(
        F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day_idx")
    )
    j = grid.join(day, ["user_id", "day_idx"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "day_idx",
        F.last("day_e4", ignorenulls=True).over(w).alias("filled_e4"),
        F.col("day_e4").isNull().alias("is_gap"),
    )


_D8_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
m AS (SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM o),
r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM m),
g AS (SELECT user_id, event_type, run,
             min(epoch_us(ts)) AS valid_from_us,
             count(*) AS n_rows
      FROM r GROUP BY user_id, event_type, run)
SELECT user_id, event_type, valid_from_us,
       COALESCE(lead(valid_from_us)
                  OVER (PARTITION BY user_id ORDER BY run), -1) AS valid_to_us,
       n_rows,
       (lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run)) IS NULL
         AS is_current
FROM g
"""


@_register("d8_scd2", _D8_ORACLE)
def d8_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse each user's
    event-type history into validity intervals ``[valid_from, valid_to)``
    — one row per run of consecutive equal states, the open (current) run
    marked — the change-history table every warehouse dimension load
    produces.  Interval bounds are integer epoch microseconds (no
    division, exact in both engines); window order is pinned by
    ``(ts, event_id)`` so same-timestamp events collapse identically.
    Scale shape: one user-hash exchange feeds lag, cumulative run ids,
    the run aggregation, AND the lead over runs (all four reuse the same
    partitioning — Catalyst plans a single exchange); state per user is
    its run list, never all-pairs."""
    from pyspark.sql.window import Window

    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        load_events(spark, sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w_ev))
        .withColumn(
            "chg",
            F.when(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run",
            F.sum("chg").over(w_ev.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "event_type", "run")
        .agg(
            F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).alias(
                "valid_from_us"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    w_run = Window.partitionBy("user_id").orderBy("run")
    nxt = F.lead("valid_from_us").over(w_run)
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.coalesce(nxt, F.lit(-1)).cast("bigint").alias("valid_to_us"),
        "n_rows",
        nxt.isNull().alias("is_current"),
    )


#: MERGE fixture, deterministic by integer filters (d6's convention):
#: base = keys not divisible by 97; changeset = keys divisible by 11
#: (price +777 cents), of which keys also divisible by 13 are DELETE
#: tombstones; changeset keys outside the base are inserts.
_D9_ORACLE = """
WITH src AS (SELECT o_orderkey,
                    CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents
             FROM orders),
base AS (SELECT * FROM src WHERE o_orderkey % 97 <> 0),
chg AS (SELECT o_orderkey, cents + 777 AS cents,
               (o_orderkey % 13 = 0) AS del
        FROM src WHERE o_orderkey % 11 = 0),
m AS (
  SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
         coalesce(c.cents, b.cents) AS cents,
         CASE WHEN c.o_orderkey IS NULL THEN 'kept'
              WHEN b.o_orderkey IS NULL THEN 'inserted'
              ELSE 'updated' END AS origin,
         coalesce(c.del, FALSE) AS del
  FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey)
SELECT o_orderkey, cents, origin FROM m WHERE NOT del
"""


@_register("d9_merge_upsert", _D9_ORACLE)
def d9_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg CDC-apply shape) as one
    relational pass: a changeset of upserts + delete tombstones applies to
    a base snapshot via a single key-keyed FULL OUTER join — update wins
    over base, changeset-only keys insert, tombstones drop the row — and
    the post-merge table comes back row-for-row (d6 reports what CHANGED
    between snapshots; d9 produces the merged STATE).  Prices scale to
    integer cents once per row.  Scale shape: one hash-partitioned
    full-outer join on the key (both sides shuffle once on o_orderkey;
    with bucketed base tables the base-side shuffle disappears — see
    tests/test_bucketing.py)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT)").alias(
            "cents"
        ),
    )
    base = src.where(F.col("o_orderkey") % 97 != 0)
    chg = src.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        (F.col("cents") + 777).alias("cents"),
        (F.col("o_orderkey") % 13 == 0).alias("del"),
    )
    b = base.select(
        F.col("o_orderkey").alias("b_key"), F.col("cents").alias("b_cents")
    )
    c = chg.select(
        F.col("o_orderkey").alias("c_key"), F.col("cents").alias("c_cents"), "del"
    )
    m = b.join(c, F.col("b_key") == F.col("c_key"), "full_outer").select(
        F.coalesce("b_key", "c_key").alias("o_orderkey"),
        F.coalesce("c_cents", "b_cents").alias("cents"),
        F.when(F.col("c_key").isNull(), F.lit("kept"))
        .when(F.col("b_key").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("origin"),
        F.coalesce("del", F.lit(False)).alias("__del"),
    )
    return m.where(~F.col("__del")).select("o_orderkey", "cents", "origin")


_D10_ORACLE = """
WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS w
           FROM events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
c AS (SELECT user_id, min(w) AS cw FROM e GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, c.cw, e.w - c.cw AS k
      FROM e JOIN c USING (user_id)),
s AS (SELECT cw, count(*) AS cohort_n FROM c GROUP BY cw),
r AS (SELECT cw, k, count(*) AS n_active FROM a
      WHERE k BETWEEN 0 AND 3 GROUP BY cw, k)
SELECT r.cw AS cohort_week, CAST(r.k AS INTEGER) AS week_k,
       r.n_active, s.cohort_n,
       CAST((r.n_active * 1000000) // s.cohort_n AS BIGINT) AS retention_ppm
FROM r JOIN s USING (cw)
"""


@_register("d10_retention_cohorts", _D10_ORACLE)
def d10_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users cohorted by first-activity week, and for
    offsets k = 0..3 the ppm of each cohort still active in week
    cohort+k — the engagement-curve shape behind every retention
    dashboard and data-freshness weighting.  Week indices are integer
    microsecond division (ts ≥ epoch keeps truncate/floor identical);
    the ppm is a non-negative integer division.  Scale shape: all three
    aggregations key on user or cohort-week hashes with map-side
    combine; the distinct-activity dedup happens BEFORE the count, so
    only (user, cohort, k) triples — not raw events — reach the final
    aggregation."""
    ev = (
        load_events(spark, sf_dir)
        .where(F.expr("ts >= TIMESTAMP '1970-01-01 00:00:00'"))
        .select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000").alias(
                "w"
            ),
        )
    )
    cohort = ev.groupBy("user_id").agg(F.min("w").alias("cw"))
    active = (
        ev.join(cohort, "user_id")
        .select("user_id", "cw", (F.col("w") - F.col("cw")).alias("k"))
        .distinct()
    )
    size = cohort.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_n"))
    ret = (
        active.where(F.col("k").between(0, 3))
        .groupBy("cw", "k")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(size, "cw").select(
        F.col("cw").alias("cohort_week"),
        F.col("k").cast("int").alias("week_k"),
        "n_active",
        "cohort_n",
        F.expr("CAST((n_active * 1000000) div cohort_n AS BIGINT)").alias(
            "retention_ppm"
        ),
    )


_D11_ORACLE = """
WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                  CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS v_e2
           FROM events),
i AS (SELECT user_id, v_e2,
             (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
               // 1000 AS dt_ms
      FROM o),
g AS (SELECT user_id, count(*) AS n_intervals,
             sum(v_e2 * dt_ms) AS num, sum(dt_ms) AS den
      FROM i WHERE dt_ms IS NOT NULL GROUP BY user_id)
SELECT user_id, n_intervals, CAST(num AS BIGINT) AS num,
       CAST(den AS BIGINT) AS den, CAST(num // den AS BIGINT) AS twap_e2
FROM g WHERE den > 0
"""


@_register("d11_twap", _D11_ORACLE)
def d11_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each user's value held from one event
    until the next, integrated over their activity span — the
    sampling-rate-independent mean every metering/pricing/telemetry
    pipeline needs (a plain AVG overweights bursts).  Everything is
    integer: cents × interval-milliseconds (non-negative values and
    non-negative interval diffs keep `div` and `//` identical; products
    stay orders of magnitude under the BIGINT edge at cents×ms scale).
    Scale shape: one user-hash exchange feeds the lead window AND the
    aggregation (same partitioning, one shuffle); state per user is its
    event intervals."""
    o = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t"),
        F.expr("CAST(floor(value * 100e0 + 0.5e0) AS BIGINT)").alias("v_e2"),
    )
    i = o.select(
        "user_id",
        "v_e2",
        F.expr("(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)"
               " div 1000").alias("dt_ms"),
    ).where(F.col("dt_ms").isNotNull())
    g = i.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("v_e2") * F.col("dt_ms")).cast("bigint").alias("num"),
        F.sum("dt_ms").cast("bigint").alias("den"),
    )
    return g.where(F.col("den") > 0).select(
        "user_id",
        "n_intervals",
        "num",
        "den",
        F.expr("CAST(num div den AS BIGINT)").alias("twap_e2"),
    )


#: d12 medians are RANK-DEFINED, not percentile built-ins: the median is
#: the value at row_number ⌈n/2⌉ ordered by (value, event_id) — a total
#: deterministic order both engines replicate exactly, where each
#: engine's percentile_disc/median functions have their own
#: interpolation and tie rules.  dev ≥ 3·MAD tests as the integer
#: cross-multiplication dev ≥ 3·max(mad, 1) — MAD 0 (constant user)
#: floors to 1 so the rule stays divide-free and total.
_D12_ORACLE = """
WITH e AS (SELECT user_id, event_id,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events),
r AS (SELECT *, row_number() OVER
        (PARTITION BY user_id ORDER BY v_e4, event_id) AS rn,
        count(*) OVER (PARTITION BY user_id) AS n
      FROM e),
med AS (SELECT user_id, v_e4 AS med_e4 FROM r WHERE rn = (n + 1) // 2),
d AS (SELECT e.user_id, e.event_id, e.v_e4,
             abs(e.v_e4 - med.med_e4) AS dev_e4
      FROM e JOIN med USING (user_id)),
r2 AS (SELECT *, row_number() OVER
         (PARTITION BY user_id ORDER BY dev_e4, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
       FROM d),
mad AS (SELECT user_id, dev_e4 AS mad_e4 FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.event_id, d.user_id, d.v_e4, d.dev_e4,
       d.dev_e4 >= 3 * CASE WHEN mad.mad_e4 < 1 THEN 1 ELSE mad.mad_e4 END
         AS is_anomaly
FROM d JOIN mad USING (user_id)
"""


@_register("d12_mad_outliers", _D12_ORACLE)
def d12_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly flags: median / median-absolute-deviation
    (the estimator a mean/stddev z-score can't be — one huge outlier
    drags the mean toward itself and masks its own detection), flagging
    events ≥ 3·MAD from the user's median.  Medians are rank-defined
    (row ⌈n/2⌉ under a total (value, event_id) order) so both engines
    agree exactly — no percentile-builtin interpolation semantics in
    play.  Scale shape: every window and join keys on user_id, so ONE
    hash partitioning serves the two rank passes and the two med/MAD
    attach joins (Catalyst reuses the exchange); state per user is its
    own event list, never global."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
    )
    w = Window.partitionBy("user_id").orderBy("v_e4", "event_id")
    wn = Window.partitionBy("user_id")
    # `div`, not `/`: Spark's / is float division, and a float (n+1)/2
    # matches NO integer rank for even n — the whole user would vanish
    r = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = r.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "user_id", F.col("v_e4").alias("med_e4")
    )
    d = e.join(med, "user_id").select(
        "user_id",
        "event_id",
        "v_e4",
        F.abs(F.col("v_e4") - F.col("med_e4")).alias("dev_e4"),
    )
    w2 = Window.partitionBy("user_id").orderBy("dev_e4", "event_id")
    r2 = d.withColumn("rn", F.row_number().over(w2)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    mad = r2.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "user_id", F.col("dev_e4").alias("mad_e4")
    )
    return d.join(mad, "user_id").select(
        "event_id",
        "user_id",
        "v_e4",
        "dev_e4",
        (
            F.col("dev_e4")
            >= 3 * F.greatest(F.col("mad_e4"), F.lit(1))
        ).alias("is_anomaly"),
    )


#: d15 sessionization gap (30 min) in microseconds
_D15_GAP_US = 1_800_000_000

_D15_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4
           FROM events),
f AS (SELECT *, CASE WHEN t_us - lag(t_us) OVER w > {_D15_GAP_US}
                       OR lag(t_us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                     ORDER BY t_us, event_id) AS BIGINT) AS session_seq
      FROM f)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(t_us) AS t_start_us,
       max(t_us) AS t_end_us,
       max(t_us) - min(t_us) AS duration_us,
       CAST(sum(v_e4) AS BIGINT) AS value_e4
FROM s GROUP BY user_id, session_seq
"""


@_register("d15_gaps_islands", _D15_ORACLE)
def d15_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap — the gaps-and-islands
    pattern: an event starts a new session when it is > 30 min after the
    user's previous one; the running sum of those start flags numbers
    the sessions, and one aggregation rolls each island up.  This is the
    batch twin of e4's streaming session windows, and the window order
    includes event_id so simultaneous events sessionize deterministically.
    Scale shape: everything — both window passes AND the final rollup —
    keys on user_id, so the whole query rides ONE hash exchange; per-user
    event counts bound the window state, and no global sort exists."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias("v_e4"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.col("t_us") - F.lag("t_us").over(w) > _D15_GAP_US, 1
        ).when(F.lag("t_us").over(w).isNull(), 1).otherwise(0),
    ).withColumn("session_seq", F.sum("is_new").over(w).cast("bigint"))
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t_us").alias("t_start_us"),
        F.max("t_us").alias("t_end_us"),
        (F.max("t_us") - F.min("t_us")).alias("duration_us"),
        F.sum("v_e4").cast("bigint").alias("value_e4"),
    )


_D17_ORACLE = """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 3600 + 60) * 1000000 AS e
  FROM events
),
b AS (
  SELECT event_type, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS delta FROM iv
),
r AS (
  SELECT event_type, delta,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM b
)
SELECT event_type, CAST(max(conc) AS BIGINT) AS max_conc,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_iv
FROM r GROUP BY event_type
"""


@_register("d17_concurrent_intervals", _D17_ORACLE)
def d17_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: the peak number of simultaneously
    open intervals per event type — the classic ±1 boundary trick
    (session-overlap / resource-contention analysis) where each interval
    emits a +1 at its start and a −1 at its end and a running sum over
    the time-ordered boundary stream reads off the concurrency.
    Interval length derives deterministically from event_id; half-open
    ``[s, e)`` semantics come from ordering −1 before +1 at equal
    timestamps.  The peak is tie-robust: within a same-timestamp run the
    sum moves monotonically, so every intermediate value is dominated by
    the run's endpoints in both engines.  Scale shape: the union fans
    each row to two 16-byte boundary rows in place (no shuffle), then
    ONE exchange on event_type feeds both the running-sum window and —
    via ReuseExchange — the final aggregate; at 100 TB the partition key
    would widen to (event_type, day) with per-day carry-in, the standard
    sweep-line sharding."""
    from pyspark.sql.window import Window

    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        us.alias("s"),
        (us + (F.col("event_id") % 3600 + 60) * F.lit(1000000)).alias("e"),
    )
    b = ev.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.select(
        "event_type", "delta", F.sum("delta").over(w).alias("conc")
    )
    return r.groupBy("event_type").agg(
        F.max("conc").cast("bigint").alias("max_conc"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_iv"),
    )


_D18_ORACLE = """
WITH iv AS (
  SELECT user_id, event_type, epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 3600 + 60) * 1000000 AS e
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_pairs,
       CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
         AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
 AND a.s < b.e AND b.s < a.e
GROUP BY a.event_type, b.event_type
"""


@_register("d18_interval_overlap", _D18_ORACLE)
def d18_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: for every pair of event types, how often and
    for how long a user had BOTH types' intervals open simultaneously —
    the temporal co-occurrence matrix (feature interaction / contention
    analysis) built on d17's derived intervals.  The classic interval
    join shape: equi key on user_id carries the shuffle, the overlap
    predicate (``a.s < b.e AND b.s < a.e``) evaluates as a post-match
    residual, and overlap duration is the exact integer
    ``least(ends) − greatest(starts)``.  Scale shape: per-user
    self-join — fanout bounded by events-per-user, never corpus²; at
    100 TB the key widens to (user, day-bucket) with boundary-spanning
    intervals replicated into both buckets, the standard interval-join
    sharding."""
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    iv = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        us.alias("s"),
        (us + (F.col("event_id") % 3600 + 60) * F.lit(1000000)).alias("e"),
    )
    a = iv.select(
        F.col("user_id").alias("ua"), F.col("event_type").alias("type_a"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = iv.select(
        F.col("user_id").alias("ub"), F.col("event_type").alias("type_b"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    j = a.join(
        b,
        (F.col("ua") == F.col("ub"))
        & (F.col("type_a") < F.col("type_b"))
        & (F.col("sa") < F.col("eb"))
        & (F.col("sb") < F.col("ea")),
    )
    return j.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("ea", "eb") - F.greatest("sa", "sb")
        ).cast("bigint").alias("overlap_us"),
    )


#: day-of-week and hour derive from integer epoch arithmetic, not the
#: engines' calendar functions — Spark's dayofweek() is 1=Sunday while
#: DuckDB's dayofweek is 0=Sunday; ``day mod 7`` sidesteps the convention
#: split entirely (0 = the epoch's weekday, Thursday)
_D19_SQL_BODY = """
SELECT CAST(({EPOCH_US} // 86400000000) % 7 AS BIGINT) AS dow,
       CAST(({EPOCH_US} % 86400000000) // 3600000000 AS BIGINT) AS hod,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)) AS BIGINT)
         AS sum_value_e4
FROM events
GROUP BY 1, 2
"""

_D19_ORACLE = _D19_SQL_BODY.replace("{EPOCH_US}", "epoch_us(ts)")
_D19_SPARK = _D19_SQL_BODY.replace(
    "{EPOCH_US}", "unix_micros(CAST(ts AS TIMESTAMP))"
).replace("//", "div")

QUERIES["d19_seasonality_profile"] = QueryDef(
    _sql_query(("events",), _D19_SPARK), _D19_ORACLE
)
#: g8: first-order Markov transition matrix over per-user event streams —
#: the behavioral-model / next-event-prediction baseline (g7 projects SET
#: co-membership; this captures ORDER).  One user-keyed window exchange
#: builds the lag pairs, a map-combined |types|² aggregate, and the
#: row-normalization window runs on ≤25 rows.  Deterministic: ties on ts
#: break by event_id.


_D20_SQL = """
WITH e AS (SELECT event_type, event_id, ts,
                  CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v
           FROM events),
w AS (SELECT event_type, event_id,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY ts, event_id) AS k,
        sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
        count(*) OVER (PARTITION BY event_type) AS n,
        sum(v) OVER (PARTITION BY event_type) AS tot
      FROM e),
d AS (SELECT event_type, event_id, k,
             abs(n * pre - k * tot) AS dev FROM w),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev DESC, k) AS rn FROM d)
SELECT event_type, CAST(k AS BIGINT) AS cp_index,
       event_id AS cp_event_id, CAST(dev AS BIGINT) AS cusum_dev
FROM r WHERE rn = 1
"""
QUERIES["d20_cusum_changepoint"] = QueryDef(
    _sql_query(("events",), _D20_SQL), _D20_SQL
)


#: x is days since 2023-01-01 (events live in 2024, so x is always
#: POSITIVE — integer division floors in DuckDB but truncates toward zero
#: in Spark, and positivity makes them agree; the offset also keeps
#: n·Σxy ≈ 4e17 at 5× inside int64, where raw epoch-day x would overflow).
_D21_SQL_BODY = """
WITH e AS (
  SELECT event_type,
         ({EPOCH_US} - 1672531200000000) // 86400000000 AS x,
         CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS y
  FROM events),
s AS (SELECT event_type, count(*) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x * y) AS BIGINT) AS sxy,
        CAST(sum(x * x) AS BIGINT) AS sxx
      FROM e GROUP BY event_type)
SELECT event_type, n, sy AS sum_y_e2,
       CAST(floor((n * sxy - sx * sy) * 1000000e0
                  / (n * sxx - sx * sx) + 0.5e0) AS BIGINT) AS slope_e6
FROM s
"""
_D21_ORACLE = _D21_SQL_BODY.replace("{EPOCH_US}", "epoch_us(ts)")
_D21_SPARK = _D21_SQL_BODY.replace(
    "{EPOCH_US}", "unix_micros(CAST(ts AS TIMESTAMP))"
).replace("//", "div")

QUERIES["d21_trend_slope"] = QueryDef(
    _sql_query(("events",), _D21_SPARK), _D21_ORACLE
)
#: a29: TPC-H Q6 (forecasting revenue change) — the canonical
#: scan-predicate-aggregate: every predicate reaches the parquet scan as a
#: PushedFilter, the single global sum map-combines, and exactly ONE row
#: crosses the final exchange.  With Q6 in, every TPC-H query expressible
#: over this schema's 7-table subset (no partsupp ⇒ Q2/Q9/Q11/Q16/Q20 are
#: out of reach) is implemented: Q1,3-8,10,12-15,17-19,21,22.


#: the leading digit comes from a bounded integer CASE chain (v_e4 ≤ 5.7e6
#: has ≤ 7 digits), not log10/string casts — log10 is float (ulp-unsafe at
#: powers of ten) and CAST-to-string type names differ across engines.
_D22_SQL = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS x
  FROM events WHERE value > 0
),
d AS (
  SELECT event_type,
         CASE WHEN x >= 1000000 THEN x / 1000000
              WHEN x >= 100000 THEN x / 100000
              WHEN x >= 10000 THEN x / 10000
              WHEN x >= 1000 THEN x / 1000
              WHEN x >= 100 THEN x / 100
              WHEN x >= 10 THEN x / 10
              ELSE x END AS digit
  FROM v WHERE x > 0
),
c AS (SELECT event_type, CAST(digit AS INTEGER) AS digit, count(*) AS n
      FROM d GROUP BY 1, 2)
SELECT event_type, digit, n,
       CAST(floor(n * 1000000e0
                  / sum(n) OVER (PARTITION BY event_type) + 0.5e0)
            AS BIGINT) AS obs_e6,
       CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                  WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757
       END AS benford_e6
FROM c
"""
QUERIES["d22_benford_audit"] = QueryDef(
    _sql_query(("events",), _D22_SQL.replace(" x / ", " x DIV ")),
    _D22_SQL.replace(" x / ", " x // "),
)


#: EPOCH_US(col) resolves to epoch_us(col) on DuckDB and
#: unix_micros(CAST(col AS TIMESTAMP)) on Spark; IDIV to `//` / `DIV`.
#: Order days are positive, so floor-div and trunc-div agree.
_D23_BODY = """
WITH o AS (SELECT o_custkey,
                  EPOCH_US(o_orderdate) IDIV 86400000000 AS day
           FROM orders),
cnt AS (SELECT o_custkey, count(*) AS n_orders FROM o GROUP BY 1),
cust AS (SELECT c_custkey, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey),
rr AS (SELECT n_name, count(*) AS n_buyers,
              CAST(floor(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                         * 1000000e0 / count(*) + 0.5e0) AS BIGINT)
                AS repeat_rate_e6
       FROM cnt JOIN cust ON o_custkey = c_custkey GROUP BY 1),
g AS (SELECT n_name, gap FROM (
        SELECT o_custkey,
               day - lag(day) OVER (PARTITION BY o_custkey
                                    ORDER BY day) AS gap
        FROM o) x
      JOIN cust ON x.o_custkey = cust.c_custkey WHERE gap IS NOT NULL),
r AS (SELECT n_name, gap,
             row_number() OVER (PARTITION BY n_name ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY n_name) AS n FROM g),
q AS (SELECT n_name,
             CAST(max(CASE WHEN rn = (n + 1) IDIV 2 THEN gap END)
                  AS BIGINT) AS median_gap_days,
             CAST(max(CASE WHEN rn = (9 * n + 9) IDIV 10 THEN gap END)
                  AS BIGINT) AS p90_gap_days
      FROM r GROUP BY 1)
SELECT rr.n_name, rr.n_buyers, rr.repeat_rate_e6,
       q.median_gap_days, q.p90_gap_days
FROM rr JOIN q ON rr.n_name = q.n_name
"""
_D23_ORACLE = _D23_BODY.replace(
    "EPOCH_US(o_orderdate)", "epoch_us(o_orderdate)"
).replace(" IDIV ", " // ")
_D23_SPARK = _D23_BODY.replace(
    "EPOCH_US(o_orderdate)", "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
).replace(" IDIV ", " DIV ")

QUERIES["d23_repeat_cadence"] = QueryDef(
    _sql_query(("orders", "customer", "nation"), _D23_SPARK), _D23_ORACLE
)


#: signed flow: purchase/signup credit, everything else debits — value
#: alone is non-negative, so the raw cumulative sum is monotone and its
#: drawdown degenerately zero; the signed series is the real shape.
_D24_BODY = """
WITH e AS (SELECT user_id, ts, event_id,
                  CASE WHEN event_type IN ('purchase', 'signup')
                       THEN CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)
                       ELSE -CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)
                  END AS v
           FROM events),
c AS (SELECT user_id,
             sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
             ts, event_id
      FROM e),
r AS (SELECT user_id, cum,
             max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM c)
SELECT user_id,
       CAST(max(peak) AS BIGINT) AS peak_e4,
       CAST(max(peak - cum) AS BIGINT) AS max_drawdown_e4,
       count(*) AS n_events
FROM r GROUP BY user_id
"""
QUERIES["d24_user_drawdown"] = QueryDef(
    _sql_query(("events",), _D24_BODY), _D24_BODY
)
_D25_SPARK = _D25_BODY.replace(
    "{EPOCH_US}", "unix_micros(CAST(ts AS TIMESTAMP))"
)
QUERIES["d25_dynamic_sessions"] = QueryDef(
    _sql_query(("events",), _D25_SPARK), _D25_ORACLE
)


#: d26 forward-tolerance window: the next order counts only within 3 days
_D26_TOL_S = 3 * 86400

_D26_ORACLE = f"""
WITH od0 AS (SELECT o_custkey AS user_id, {_O_TS_DUCK} AS o_ts,
                    o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey, o_orderkey * 7 % 40000
                                       ORDER BY o_orderkey DESC) AS rn
             FROM orders),
od AS (SELECT user_id, o_ts, o_orderkey FROM od0 WHERE rn = 1),
a AS (SELECT e.event_id, e.user_id, od.o_orderkey, od.o_ts, e.ts
      FROM events e ASOF LEFT JOIN od
        ON e.user_id = od.user_id AND e.ts <= od.o_ts)
SELECT event_id, user_id,
       CASE WHEN epoch(o_ts) - floor(epoch(ts)) <= {_D26_TOL_S}
            THEN o_orderkey END AS order_key,
       CAST(CASE WHEN epoch(o_ts) - floor(epoch(ts)) <= {_D26_TOL_S}
                 THEN epoch(o_ts) - floor(epoch(ts)) END AS BIGINT) AS wait_s
FROM a
"""


@_register("d26_asof_tolerance", _D26_ORACLE)
def d26_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance bound — the other half of the
    as-of surface (d1/e14 are backward): each event attaches the user's
    NEXT order, null unless it arrives within 3 days — time-to-conversion
    attribution, pandas' ``merge_asof(direction='forward', tolerance=...)``
    re-expressed distributed.  Spark side reuses the union-merge as-of
    operator with the sort direction flipped (ONE user-keyed window
    exchange, no join node); the tolerance null-out runs post-match, so
    left rows stay left-join complete.  The oracle is DuckDB's native
    forward ASOF LEFT JOIN — an algorithmically different merge, so
    agreement checks semantics, not plan.  Scale shape: d1's exactly —
    state per user is one open candidate inside the window sort; only
    (id, ts) pairs shuffle."""
    from spark_ml_spatialjointransformer_spark.operators.temporal import (
        asof_join,
    )
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id")
    w = Window.partitionBy("user_id", "o_ts").orderBy(
        F.col("o_orderkey").desc()
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.expr(_O_TS_SPARK).alias("o_ts"),
            "o_orderkey",
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    m = asof_join(
        ev,
        od,
        on=["user_id"],
        left_time="ts",
        right_time="o_ts",
        right_cols=(("o_orderkey", "__ok"), ("o_ts", "__ots")),
        direction="forward",
    )
    wait = F.unix_timestamp("__ots") - F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    in_tol = wait <= _D26_TOL_S
    return m.select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("__ok")).alias("order_key"),
        F.when(in_tol, wait).cast("bigint").alias("wait_s"),
    )


#: d27 bitemporal quote synthesis from supplier: valid_from spread over
#: Jan days 0-22, recording LAG of 0-5 days (the transaction-time axis),
#: price = acctbal cents.  The knowledge lag below asks "what did the
#: system believe TWO DAYS BEFORE the event" — the recorded_at filter.
_D27_JAN1 = 1_704_067_200
_D27_LAG_S = 172_800
_D27_VF_SQL = f"{_D27_JAN1} + (s_suppkey * 37 % 23) * 86400"
_D27_RA_SQL = f"({_D27_VF_SQL}) + (s_suppkey * 13 % 6) * 86400"

_D27_ORACLE = f"""
WITH q AS (SELECT s_suppkey, s_nationkey AS k,
                  CAST(floor(s_acctbal * 100e0 + 0.5e0) AS BIGINT) AS price_c,
                  CAST({_D27_VF_SQL} AS BIGINT) AS valid_from,
                  CAST({_D27_RA_SQL} AS BIGINT) AS recorded_at
           FROM supplier),
ev AS (SELECT event_id, user_id % 25 AS k,
              CAST(floor(epoch(ts)) AS BIGINT) AS t
       FROM events),
j AS (SELECT ev.event_id, ev.k, ev.t,
             q.s_suppkey, q.price_c, q.valid_from, q.recorded_at
      FROM ev JOIN q ON q.k = ev.k
      WHERE q.valid_from <= ev.t
        AND q.recorded_at <= ev.t - {_D27_LAG_S}),
r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                                   ORDER BY valid_from DESC,
                                            recorded_at DESC,
                                            s_suppkey) AS rn
      FROM j)
SELECT event_id, CAST(k AS BIGINT) AS quote_key, s_suppkey AS quote_supp,
       price_c, CAST((t - valid_from) // 86400 AS BIGINT) AS valid_age_days
FROM r WHERE rn = 1
"""


@_register("d27_bitemporal_asof", _D27_ORACLE)
def d27_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of join — the two-axis temporal lookup d1/d26 (one
    time axis) and d8 (SCD2 intervals, one axis) cannot express: for
    every event, the quote that was IN EFFECT at event time (valid-time
    axis: max ``valid_from <= t``) *as the system KNEW it two days
    earlier* (transaction-time axis: ``recorded_at <= t - 172800``) —
    the reproducibility query behind every audited feature store and
    point-in-time-correct training set ("what did the model see THEN",
    immune to late backfills).  A quote recorded with a long lag is
    invisible near its valid_from even though a later snapshot shows it
    was in effect — that divergence between the axes is what the test
    pins.  Precedence: latest valid_from, then latest recorded_at (the
    freshest belief about the same validity instant), supplier id as
    the final deterministic tie.  Scale shape: the quote dimension
    BROADCASTS (dims are small by definition; a big-quote variant
    buckets both sides by key); the event side never widens — the
    range predicates filter inside the broadcast hash join and the
    per-event argmax is ONE map-side-combinable max(struct) aggregate,
    not a window (no second sort, ties resolved by the struct's
    lexicographic order on pure int64 fields)."""
    q = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("k"),
        F.expr("CAST(floor(s_acctbal * 100e0 + 0.5e0) AS BIGINT)").alias(
            "price_c"
        ),
        F.expr(f"CAST({_D27_VF_SQL} AS BIGINT)").alias("valid_from"),
        F.expr(f"CAST({_D27_RA_SQL} AS BIGINT)").alias("recorded_at"),
    )
    ev = load_events(spark, sf_dir).select(
        "event_id",
        (F.col("user_id") % 25).alias("k"),
        F.unix_timestamp("ts").alias("t"),
    )
    j = (
        ev.join(F.broadcast(q), "k")
        .where(
            (F.col("valid_from") <= F.col("t"))
            & (F.col("recorded_at") <= F.col("t") - _D27_LAG_S)
        )
    )
    best = j.groupBy("event_id", "k", "t").agg(
        F.max(
            F.struct(
                "valid_from",
                "recorded_at",
                (-F.col("s_suppkey")).alias("neg_sk"),
                "price_c",
            )
        ).alias("b")
    )
    return best.select(
        "event_id",
        F.col("k").cast("bigint").alias("quote_key"),
        (-F.col("b.neg_sk")).cast("bigint").alias("quote_supp"),
        F.col("b.price_c").alias("price_c"),
        F.expr("(t - b.valid_from) div 86400").cast("bigint").alias(
            "valid_age_days"
        ),
    )


#: d28 Holt smoothing: α = β = 1/2 as floor(x/2.0) — the double division
#: is EXACT here (|x| < 2^53 by the value bound) and floor() agrees with
#: DuckDB's on negatives, where Spark's integer `div` (truncating) would
#: not; trend can be negative, level cannot.
_D28_ORACLE = """
WITH RECURSIVE e AS (
  SELECT user_id, event_id,
         CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT) AS v_e4,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
h AS (
  SELECT user_id, event_id, rn, v_e4,
         v_e4 AS l, CAST(0 AS BIGINT) AS b
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_id, e.rn, e.v_e4,
         CAST(floor((e.v_e4 + h.l + h.b) / 2.0) AS BIGINT) AS l,
         CAST(floor((h.b
                     + CAST(floor((e.v_e4 + h.l + h.b) / 2.0) AS BIGINT)
                     - h.l) / 2.0) AS BIGINT) AS b
  FROM e JOIN h ON e.user_id = h.user_id AND e.rn = h.rn + 1)
SELECT user_id, event_id, CAST(l AS BIGINT) AS level_e4,
       CAST(b AS BIGINT) AS trend_e4,
       CAST(l + b AS BIGINT) AS forecast_e4
FROM h
"""


def _d28_holt_partitions(it):
    """Partition-wise Holt kernel: rows arrive hash-clustered by user and
    sorted (user_id, ts, event_id) within the partition, so each user's
    stream is a contiguous run and the recurrence restarts at every user
    boundary.  One Python call per ARROW BATCH instead of one per GROUP
    (the former grouped `applyInPandas` paid ~1-2 ms of per-call pandas
    overhead × one call per user — group count, not row count, priced the
    query; guide §4.2).  A user whose run spans a batch boundary continues
    from carried (l, b) state — batches of one partition arrive in order.
    The arithmetic is the SAME python-int `//` chain per row in the same
    order, so results are bit-identical."""
    import pandas as pd

    carry_u = None
    carry = None  # (l, b) of the partition's last-seen user
    for pdf in it:
        n = len(pdf)
        if n == 0:
            continue
        users = pdf["user_id"].to_list()
        v = pdf["v_e4"].to_list()  # python ints: floor-div never overflows
        ls = [0] * n
        bs = [0] * n
        prev_u = carry_u
        l, b = carry if carry is not None else (0, 0)
        for i in range(n):
            u = users[i]
            x = v[i]
            if u != prev_u:
                prev_u = u
                l, b = x, 0
            else:
                nl = (x + l + b) // 2  # python // floors — matches floor()
                b = (b + (nl - l)) // 2
                l = nl
            ls[i] = l
            bs[i] = b
        carry_u, carry = prev_u, (l, b)
        yield pd.DataFrame(
            {
                "user_id": pd.Series(users, dtype="int64"),
                "event_id": pdf["event_id"].to_numpy(),
                "level_e4": pd.Series(ls, dtype="int64"),
                "trend_e4": pd.Series(bs, dtype="int64"),
                "forecast_e4": pd.Series(
                    [x + y for x, y in zip(ls, bs)], dtype="int64"
                ),
            }
        )


@_register("d28_holt_trend", _D28_ORACLE)
def d28_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend), exact: per
    user-stream, ``l_t = ⌊(v_t + l_{t-1} + b_{t-1})/2⌋`` and ``b_t =
    ⌊(b_{t-1} + Δl)/2⌋`` with the one-step forecast ``l + b`` — the
    trend-aware counterpart of d16's EWMA, which is a FIR truncation
    (8 lag taps) precisely because an infinite-memory recurrence has
    no window form.  This query keeps the TRUE infinite-memory
    recurrence: rows are hash-clustered by user and sorted
    (user, ts, event_id) within the partition, and a ``mapInPandas``
    kernel replays each contiguous user run sequentially (restarting
    at user boundaries, carrying state across batch splits) — the
    group is still the unit of order, but Python is entered once per
    Arrow batch, not once per user.  The oracle replays it as
    a recursive CTE row-chain.  α = β = ½ via ``floor(x/2)`` on BOTH
    engines: the trend axis goes negative on declining streams, where
    Spark's integer ``div`` (truncate-toward-zero) would diverge from
    DuckDB's flooring ``//`` — the floor(double) form is exact below
    2^53 and floors identically on both (the d4/d22 sign rule, solved
    the opposite way).  Scale shape: ONE user-keyed exchange; each
    group's pass is O(rows) in Arrow batches; state never crosses
    groups, so the operator shards perfectly by key (the streaming
    twin would carry (l, b) per user — e23's state class)."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(floor(value * 10000e0 + 0.5e0) AS BIGINT)").alias(
            "v_e4"
        ),
    )
    out_schema = (
        "user_id long, event_id long, level_e4 long, trend_e4 long,"
        " forecast_e4 long"
    )
    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .select("user_id", "event_id", "v_e4")
        .mapInPandas(_d28_holt_partitions, out_schema)
    )


#: d29: Allen's interval relations between same-cohort visit windows
#: (f6's synthesis), collapsed to the 7 relation CLASSES (the 13-relation
#: algebra folds each inverse onto its base by normalizing every pair to
#: TIME order — earlier (start, end) lexicographically becomes `a` — so
#: after→before, met-by→meets, contains→during, overlapped-by→overlaps,
#: started-by→starts, finished-by→finishes).  Windows have duration
#: >= 2 days and distinct suppkeys, but starts/ends CAN coincide — all 7
#: classes are reachable.  The classifier below assumes the normalized
#: orientation a_s <= b_s (ties broken a_e <= b_e), which makes the
#: branches exhaustive: no ELSE bucket can swallow a reversed pair.
_D29_REL_SQL = """
CASE WHEN a_e < b_s THEN 'before'
     WHEN a_e = b_s THEN 'meets'
     WHEN a_s = b_s AND a_e = b_e THEN 'equals'
     WHEN a_s = b_s THEN 'starts'
     WHEN a_e = b_e THEN 'finishes'
     WHEN a_e > b_e THEN 'during'
     ELSE 'overlaps' END
"""

#: time-order normalization: put the lexicographically-earlier
#: (start, end) window in the `a` slot
_D29_SWAP_SQL = "(a_s < b_s OR (a_s = b_s AND a_e <= b_e))"

_D29_ORACLE = f"""
WITH v AS (SELECT s_suppkey, s_nationkey % 5 AS grp,
                  CAST({_F6_START_SQL} AS BIGINT) AS s,
                  CAST({_F6_END_SQL} AS BIGINT) AS e
           FROM supplier),
p0 AS (SELECT a.grp,
              a.s AS a_s, a.e AS a_e, b.s AS b_s, b.e AS b_e
       FROM v a JOIN v b ON a.grp = b.grp AND a.s_suppkey < b.s_suppkey),
p AS (SELECT grp,
             CASE WHEN {_D29_SWAP_SQL} THEN a_s ELSE b_s END AS a_s,
             CASE WHEN {_D29_SWAP_SQL} THEN a_e ELSE b_e END AS a_e,
             CASE WHEN {_D29_SWAP_SQL} THEN b_s ELSE a_s END AS b_s,
             CASE WHEN {_D29_SWAP_SQL} THEN b_e ELSE a_e END AS b_e
      FROM p0),
r AS (SELECT grp, {_D29_REL_SQL} AS rel FROM p)
SELECT CAST(grp AS BIGINT) AS cohort, rel,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM r GROUP BY 1, 2
"""


@_register("d29_interval_relations", _D29_ORACLE)
def d29_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (Allen 1983) over each nation's visit
    windows: classify every same-nation window pair into the seven
    relation classes (before/meets/overlaps/starts/during/finishes/
    equals; each inverse folds onto its base by normalizing the pair
    to TIME order — the lexicographically-earlier (start, end) window
    takes the `a` slot, so after→before, met-by→meets,
    contains→during, overlapped-by→overlaps) and count per
    (cohort, relation) — the temporal-RELATIONSHIP census d17/d18
    only aggregate through (d17 counts concurrency, d18 measures
    overlap length; neither says WHICH relation holds, which is what
    schedule-conflict detection, staffing-handoff analysis, and
    temporal-pattern features consume).  Boundary classes (meets,
    starts, finishes, equals) are exact integer-second comparisons —
    reachable by construction since the synthesized starts/ends land
    on shared day boundaries.  Grouping is the 5-way region cohort
    (``s_nationkey % 5``) so every scale factor down to sf0.001 has
    same-group pairs.  Scale shape: the pair stage joins WITHIN the
    partition key only (interval pair analysis is always run per
    entity group; the group bounds the quadratic — production uses
    the natural entity key), ONE key-equi shuffle join of
    (int, int, int) rows, then a map-combinable (cohort, relation)
    rollup of at most 7·|cohorts| output rows."""
    v = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_nationkey") % 5).alias("grp"),
        F.expr(f"CAST({_F6_START_SQL} AS BIGINT)").alias("s"),
        F.expr(f"CAST({_F6_END_SQL} AS BIGINT)").alias("e"),
    )
    a = v.select(
        "grp",
        F.col("s_suppkey").alias("ka"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = v.select(
        "grp",
        F.col("s_suppkey").alias("kb"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    p0 = a.join(b, "grp").where(F.col("ka") < F.col("kb"))
    swap = F.expr(_D29_SWAP_SQL)
    p = p0.select(
        "grp",
        F.when(swap, F.col("a_s")).otherwise(F.col("b_s")).alias("na_s"),
        F.when(swap, F.col("a_e")).otherwise(F.col("b_e")).alias("na_e"),
        F.when(swap, F.col("b_s")).otherwise(F.col("a_s")).alias("nb_s"),
        F.when(swap, F.col("b_e")).otherwise(F.col("a_e")).alias("nb_e"),
    ).withColumnsRenamed(
        {"na_s": "a_s", "na_e": "a_e", "nb_s": "b_s", "nb_e": "b_e"}
    )
    return (
        p.select("grp", F.expr(_D29_REL_SQL).alias("rel"))
        .groupBy(F.col("grp").cast("bigint").alias("cohort"), "rel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


#: d30 lags tested in both directions (a leads b / b leads a)
_D30_LAG_LIST = [-2, -1, 0, 1, 2]
_D30_LAGS = "[" + ", ".join(str(x) for x in _D30_LAG_LIST) + "]"

_D30_ORACLE = f"""
WITH e AS (SELECT event_type AS t, epoch_us(ts) // 86400000000 AS d
           FROM events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
cnt AS (SELECT t, d, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
days AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
ty AS (SELECT DISTINCT t FROM cnt),
g AS (SELECT ty.t, days.day, coalesce(cnt.c, 0) AS c
      FROM ty CROSS JOIN days
      LEFT JOIN cnt ON cnt.t = ty.t AND cnt.d = days.day),
lg AS (SELECT unnest({_D30_LAGS}) AS lag),
p AS (SELECT a.t AS type_a, b2.t AS type_b, lg.lag,
             a.c AS x, b2.c AS y
      FROM g a
      CROSS JOIN lg
      JOIN g b2 ON b2.t > a.t AND b2.day = a.day + lg.lag),
m AS (SELECT type_a, type_b, lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2, 3)
SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n AS n_days,
       CAST(floor((n * sxy - sx * sy) * 1000000e0
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) + 0.5e0)
            AS BIGINT) AS corr_e6
FROM m
WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""


@_register("d30_leadlag_xcorr", _D30_ORACLE)
def d30_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between event-type daily series:
    Pearson r at lags −2…+2 days for every type pair over the
    zero-filled global daily grid — the cross-SERIES dependence
    detector (does 'view' volume lead 'purchase' volume by a day?)
    that d21's per-series trend and d19's per-series seasonality
    cannot express; the lag argmax is the classic demand-forecasting /
    incident-correlation feature.  Zero-filling on the global span is
    part of the contract: absent days are real zeros, and correlating
    only co-present days would bias r toward busy periods.  All six
    moments are map-combinable int64 sums; the division happens once
    per (pair, lag) on the cross-multiplied integers with the sqrt as
    a fixed IEEE double sequence both engines replay bit-identically
    (v6's rule), rounded half-up to e6.  Zero-variance series are
    excluded on the INTEGER radicands (exact, no epsilon).  Scale
    shape: events collapse to (type, day) counts in ONE map-combined
    exchange; the grid is |types|·|span-days| rows — bounded by
    calendar time, not data volume — so the lag join and moment
    rollup run on broadcast-sized frames forever (a 10-year span at
    1000 types is 3.7M rows; shard the pair space only past that)."""
    ev = (
        load_events(spark, sf_dir)
        .where(F.expr("ts >= TIMESTAMP '1970-01-01 00:00:00'"))
        .select(
            F.col("event_type").alias("t"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias(
                "d"
            ),
        )
    )
    cnt = ev.groupBy("t", "d").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # the counts feed the grid twice (both join sides) plus the
    # type/day bounds: lazy-checkpoint the small frame once
    cnt = cnt.transform(_barrier)
    bounds = cnt.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    ty = cnt.select("t").distinct()
    cnt2 = cnt.select(
        F.col("t").alias("__ct"), F.col("d").alias("__cd"), "c"
    )
    g = (
        ty.crossJoin(F.broadcast(days))
        .join(
            cnt2,
            (F.col("t") == F.col("__ct")) & (F.col("day") == F.col("__cd")),
            "left",
        )
        .select("t", "day", F.coalesce("c", F.lit(0)).alias("c"))
        .transform(_barrier)
    )
    lg = spark.range(1).select(
        F.explode(F.array([F.lit(x) for x in _D30_LAG_LIST])).alias("lag")
    )
    a = g.select(F.col("t").alias("type_a"), F.col("day").alias("da"), F.col("c").alias("x"))
    b = g.select(F.col("t").alias("type_b"), F.col("day").alias("db"), F.col("c").alias("y"))
    p = (
        a.crossJoin(F.broadcast(lg))
        .join(
            F.broadcast(b),
            (F.col("type_b") > F.col("type_a"))
            & (F.col("db") == F.col("da") + F.col("lag")),
        )
    )
    m = p.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
    )
    return m.where(
        (F.expr("n * sxx - sx * sx") > 0) & (F.expr("n * syy - sy * sy") > 0)
    ).select(
        "type_a",
        "type_b",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(floor((n * sxy - sx * sy) * 1000000e0"
            " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            "    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) + 0.5e0)"
            " AS BIGINT)"
        ).alias("corr_e6"),
    )


#: d31 weekday index: epoch-day (UTC) shifted so 0=Sunday — 1970-01-01
#: was a Thursday (index 4).  Pure integer arithmetic in both engines; no
#: engine dayofweek() convention (Spark 1=Sunday, DuckDB 0=Sunday) leaks.
_D31_ORACLE = """
WITH e AS (SELECT event_type AS t,
                  (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
           FROM events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
c AS (SELECT t, dow, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
tot AS (SELECT t, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY t)
SELECT c.t AS event_type, CAST(c.dow AS BIGINT) AS dow, c.n AS n_events,
       c.n * 1000000 // tot.tn AS share_e6,
       c.n = max(c.n) OVER (PARTITION BY c.t) AS is_peak_day
FROM c JOIN tot ON tot.t = c.t
"""


@_register("d31_weekday_profile", _D31_ORACLE)
def d31_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: volume, share of
    the type's total, and peak-day flag per weekday — the calendar-
    periodicity census d30's lag correlation presumes but never shows
    (d30 asks "does type A lead type B"; d31 asks "is the series itself
    weekly-periodic", the first thing an anomaly baseline or a
    training-data freshness report needs).  The weekday index is derived
    from the raw epoch day ((day + 4) % 7, 0=Sunday) so no engine
    dayofweek() convention is involved — integer-exact parity by
    construction.  Scale shape: ONE map-combinable (type, dow) count —
    at most 7·|types| rows ever shuffle; the share and peak are computed
    over that tiny rollup (the window partitions are ≤ 7 rows)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp")
    )
    c = (
        ev.select(
            F.col("event_type").alias("event_type"),
            (
                ((F.unix_timestamp("ts") / F.lit(86400)).cast("long") + 4) % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    from pyspark.sql.window import Window

    wt = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "n_events",
        F.expr(
            "n_events * 1000000 div sum(n_events)"
            " OVER (PARTITION BY event_type)"
        ).alias("share_e6"),
        (F.col("n_events") == F.max("n_events").over(wt)).alias(
            "is_peak_day"
        ),
    )


#: d32's integer CUSUM: deviation of day d = c_d·D − T (count scaled by
#: the series length minus the series total) — zero-mean by construction,
#: every term int64, so the running sum and its argmax are engine-exact.
_D32_ORACLE = """
WITH e AS (SELECT event_type AS t, epoch_us(ts) // 86400000000 AS d
           FROM events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00'),
cnt AS (SELECT t, d, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
b AS (SELECT t, min(d) AS d0, max(d) AS d1 FROM cnt GROUP BY t),
days AS (SELECT b.t, unnest(generate_series(b.d0, b.d1)) AS d FROM b),
g AS (SELECT days.t, days.d, coalesce(cnt.c, 0) AS c
      FROM days LEFT JOIN cnt ON cnt.t = days.t AND cnt.d = days.d),
tot AS (SELECT t, CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(c) AS BIGINT) AS tc
        FROM g GROUP BY t),
cu AS (SELECT g.t, g.d,
              CAST(sum(g.c * tot.nd - tot.tc)
                   OVER (PARTITION BY g.t ORDER BY g.d) AS BIGINT) AS s
       FROM g JOIN tot ON tot.t = g.t),
mx AS (SELECT t, d, s, abs(s) AS a,
              row_number() OVER (PARTITION BY t
                                 ORDER BY abs(s) DESC, d) AS rn
       FROM cu)
SELECT t AS event_type, CAST(d AS BIGINT) AS change_day,
       s AS cusum_at_peak, a AS max_abs_cusum
FROM mx WHERE rn = 1
"""


@_register("d32_cusum_changepoint", _D32_ORACLE)
def d32_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type (Page 1954, the
    offline single-change form): over the zero-filled daily count
    series, the running sum of integer deviations from the series mean
    peaks — in absolute value — at the most likely level-shift day.
    e23's streaming z-score flags single anomalous DAYS; d32 localizes a
    persistent LEVEL CHANGE (feed turned on/off, bot campaign started),
    which spiky z-scores smear.  Deviations are computed as c·D − T
    (count times series length minus series total) so the mean is never
    a float: every term, the running sum, and the argmax are int64 —
    bit-identical across engines.  Scale shape: one map-combinable
    (type, day) count, a calendar-bounded zero-fill (generate_series /
    sequence join — rows scale with days, not events), one running-sum
    window and one argmax window per type, both partitioned by the
    |types|-sized key."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp")
    )
    from pyspark.sql.window import Window

    cnt = (
        ev.select(
            F.col("event_type").alias("t"),
            (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    b = cnt.groupBy("t").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = b.select(
        "t", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    g = days.join(cnt, ["t", "d"], "left").select(
        "t", "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    tot = g.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("c").cast("long").alias("tc"),
    )
    w_run = Window.partitionBy("t").orderBy("d")
    cu = g.join(tot, "t").select(
        "t",
        "d",
        F.sum(F.col("c") * F.col("nd") - F.col("tc"))
        .over(w_run)
        .cast("long")
        .alias("s"),
    )
    w_max = Window.partitionBy("t").orderBy(F.desc(F.abs("s")), "d")
    return (
        cu.withColumn("rn", F.row_number().over(w_max))
        .where(F.col("rn") == 1)
        .select(
            F.col("t").alias("event_type"),
            F.col("d").cast("bigint").alias("change_day"),
            F.col("s").alias("cusum_at_peak"),
            F.abs("s").alias("max_abs_cusum"),
        )
    )
