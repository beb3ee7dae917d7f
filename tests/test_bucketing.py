"""Bucketed-table joins: the storage-layout half of the 100 TB join story.

At scale, the fact×fact joins (orders×lineitem-shaped) should not shuffle
at query time at all: both tables are written bucketed+sorted on the join
key, so a sort-merge join reads co-located buckets directly.  These tests
pin that the engine's write path produces tables Spark's planner actually
exploits — zero Exchange when both sides bucket, one Exchange (the
unbucketed side only) for bucketed×unbucketed.
"""

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 1000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b")
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        j.write.format("noop").mode("overwrite").save()
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        assert j.count() == 500
        # values survive the bucketed scan
        row = j.where(F.col("k") == 10).first()
        assert (row.a, row.b) == (30, 70)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_vs_plain_shuffles_only_plain_side(spark, tmp_path, no_broadcast):
    big = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("a"))
    (
        big.write.bucketBy(8, "k")
        .sortBy("k")
        .option("path", str(tmp_path / "bkt_big"))
        .mode("overwrite")
        .saveAsTable("bkt_big")
    )
    try:
        plain = spark.range(0, 1000, 4).select(
            F.col("id").alias("k"), F.lit(2).alias("b")
        )
        j = spark.table("bkt_big").join(plain, "k")
        plan = _plan(j)
        # exactly one shuffle: the plain side repartitions INTO the
        # bucketed side's layout; the bucketed scan itself never moves
        assert plan.count("Exchange hashpartitioning") == 1
        assert j.count() == 250
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_big")


def test_j24_band_join_is_exchange_free(spark, no_broadcast):
    """The halo-bucketed spatial join (j24) must read both pre-bucketed
    sides with ZERO exchange — the whole point of maintaining the layout.
    Only the writes (inside the query fn, not in the returned plan) and
    the exact refine cost anything at query time."""
    from spark_ml_spatialjointransformer_spark.queries import QUERIES

    df = QUERIES["j24_bucketed_spatial"].fn(spark, "/root/testdata/sf0.001")
    try:
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert df.count() > 0
    finally:
        import hashlib

        tag = hashlib.md5(b"/root/testdata/sf0.001").hexdigest()[:8]
        spark.sql(f"DROP TABLE IF EXISTS sjt_bkt_cb_{tag}")
        spark.sql(f"DROP TABLE IF EXISTS sjt_bkt_sb_{tag}")


def test_aqe_splits_skewed_join_partition(spark, no_broadcast):
    """The engine leans on AQE for join-side skew (salting covers
    aggregation — a6): with one hot key owning ~all rows, AQE must mark
    the sort-merge join skew-handled and split the oversized partition.
    Thresholds are scaled down so local data exhibits 'skew'; on a
    cluster the defaults (256 MB) apply."""
    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    from pyspark.sql import functions as F

    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        # 200k rows on ONE key vs uniform right side
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, 7).otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        j.collect()  # execute THIS dataset so its adaptive plan finalizes
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shard_layout_partition_pruning(spark, tmp_path):
    """Reading one shard from the partitioned export touches ONE partition
    directory: the shard predicate lands in PartitionFilters (pruned at
    planning), not PushedFilters (evaluated per row group)."""
    from pyspark.sql import functions as F

    from spark_ml_spatialjointransformer_spark.operators.sink import (
        write_sharded,
    )

    src = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    out = str(tmp_path / "sharded")
    write_sharded(src, out, "k", n_shards=8)
    rd = spark.read.parquet(out).where(F.col("__shard") == 3)
    plan = _plan(rd)
    assert "PartitionFilters: [isnotnull(__shard" in plan
    assert "(__shard" in plan.split("PartitionFilters")[1][:80]
    got = rd.count()
    total = spark.read.parquet(out).count()
    assert 0 < got < total == 1000


def test_zorder_sorted_write_pushes_range_filter(spark, tmp_path):
    """The j21 write path: points sorted by the Morton key, read back with
    a zkey range predicate — the range filter reaches the parquet scan as
    PushedFilters, where the sorted layout's tight row-group min/max
    stats make it selective (the stats themselves are invisible in the
    plan string; the pushdown is the assertable half)."""
    from pyspark.sql import functions as F

    from spark_ml_spatialjointransformer_spark.functions.zorder import (
        quant16_sql,
        zorder_sql,
    )

    pts = spark.range(0, 5000).select(
        ((F.col("id") * 9973 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 7919 % 1700) / 10.0 - 85.0).alias("lat"),
    )
    qx = quant16_sql("lon", -180.0, 360.0)
    qy = quant16_sql("lat", -90.0, 180.0)
    keyed = pts.selectExpr("lon", "lat", f"{qx} AS qx", f"{qy} AS qy").selectExpr(
        "lon", "lat", f"{zorder_sql('qx', 'qy')} AS zkey"
    )
    out = str(tmp_path / "zsorted")
    keyed.repartitionByRange(4, "zkey").sortWithinPartitions(
        "zkey"
    ).write.parquet(out)

    lo, hi = 1 << 28, 1 << 29
    rd = spark.read.parquet(out).where(
        (F.col("zkey") >= lo) & (F.col("zkey") < hi)
    )
    plan = _plan(rd)
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(zkey" in pushed and "LessThan(zkey" in pushed
    # the filter is genuinely selective on this layout
    assert 0 < rd.count() < 5000
