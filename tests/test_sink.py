"""Deterministic sharded write: layout must be a pure function of the data
— same shard files and same within-file order under ANY input partitioning."""

import glob

from spark_ml_spatialjointransformer_spark.operators.sink import (
    sharded,
    write_sharded,
)

SF = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_sharded_partition_count_and_coverage(spark):
    df = _load(spark)
    out = sharded(df, "doc_id", 8)
    assert out.rdd.getNumPartitions() == 8
    # no row lost or duplicated, every shard id in range
    assert out.count() == df.count()
    shards = {r["__shard"] for r in out.select("__shard").distinct().collect()}
    assert shards <= set(range(8))


def test_write_sharded_deterministic_under_repartitioning(spark, tmp_path):
    df = _load(spark)
    write_sharded(df, str(tmp_path / "a"), "doc_id", 8)
    # adversarial input layout: same data, scrambled partitioning
    write_sharded(df.repartition(13, "text"), str(tmp_path / "b"), "doc_id", 8)

    def snapshot(d):
        dirs = sorted(glob.glob(str(tmp_path / d / "__shard=*")))
        out = {}
        for sd in dirs:
            files = glob.glob(sd + "/part-*.parquet")
            assert len(files) == 1, f"{sd}: expected one file per shard"
            # parquet row order IS the written order
            out[sd.rsplit("=", 1)[1]] = [
                tuple(r) for r in spark.read.parquet(files[0]).collect()
            ]
        return out

    a, b = snapshot("a"), snapshot("b")
    assert len(a) == 8  # 500 docs cover all 8 shards
    assert set(a) == set(b)
    for s in a:
        assert a[s] == b[s], f"shard {s} differs"


def test_stream_to_sharded_ingests_exactly_once(spark, tmp_path):
    """The streaming ingestion path must land every source row exactly once
    under its content-stable shard, matching the batch shard assignment."""
    import glob

    from pyspark.sql import functions as F

    from spark_ml_spatialjointransformer_spark.functions.hashing import h60_col
    from spark_ml_spatialjointransformer_spark.streaming.ingest import (
        stream_to_sharded,
    )
    from spark_ml_spatialjointransformer_spark.streaming.windowed import (
        events_stream,
    )

    out = str(tmp_path / "bronze")
    src = f"{SF}/events.parquet"
    q = stream_to_sharded(
        events_stream(spark, src).select("event_id", "user_id"),
        out, "event_id", 4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    batch = spark.read.parquet(src).select("event_id", "user_id")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()
    # shard assignment matches the batch formula for every row
    mismatch = got.where(
        (h60_col(F.col("event_id").cast("string")) % 4).cast("int")
        != F.col("__shard")
    ).count()
    assert mismatch == 0
    assert len(glob.glob(out + "/__shard=*")) == 4


def test_stream_resume_from_checkpoint_never_reingests(spark, tmp_path):
    """Operational contract at scale: a stopped ingest restarted with the
    same checkpoint resumes from the first unprocessed file — rows already
    delivered are NEVER re-ingested, new files are picked up, and an idle
    restart changes nothing."""
    from pyspark.sql import functions as F

    from spark_ml_spatialjointransformer_spark.streaming.ingest import (
        stream_to_sharded,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    base = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id")
        .limit(200)
    )
    schema = base.schema
    file1 = base.where(F.col("event_id") % 2 == 0)
    file2 = base.where(F.col("event_id") % 2 == 1)
    file1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_to_sharded(stream, out, "event_id", 4, checkpoint=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # phase 1: only file1
    n1 = spark.read.parquet(out).count()
    assert n1 == file1.count()

    file2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # phase 2: restart -> must ingest ONLY the new file
    got = spark.read.parquet(out)
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == base.count()

    run_once()  # phase 3: idle restart -> exactly nothing happens
    assert spark.read.parquet(out).count() == base.count()
