"""One-off t62 sub-stage profile (guide §1): signature build+barrier,
hot-bucket stats collect, final capped self-join — each timed with the
noop sink after an sf0.001 warmup, best of 3 reps."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from bench import clear_session_state
from spark_ml_spatialjointransformer_spark.queries import QUERIES
from spark_ml_spatialjointransformer_spark.operators.dedup import (
    minhash_signatures,
    minhash_lsh_pairs,
)
from spark_ml_spatialjointransformer_spark.operators._compat import barrier
from spark_ml_spatialjointransformer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("t62-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    noop(QUERIES["t62_capped_lsh_pairs"].fn(spark, "/root/testdata/sf0.001"))

    docs = load_table(spark, SF_DIR, "documents")
    rows = []

    def stage(name, thunk, reps=3):
        best = None
        for _ in range(reps):
            clear_session_state(spark)
            t0 = time.perf_counter()
            thunk()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        rows.append({"stage": name, "sec": round(best, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # stage A: signature kernel + barrier (the localCheckpoint job)
    def sig_barrier():
        barrier(minhash_signatures(docs, "doc_id", "text", 64, 3))

    stage("sig_kernel+barrier", sig_barrier)

    # stage B: barrier + the hot-stats agg collect (cost of the agg is B - A)
    bands, rows_per = 16, 4
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "_", *[F.col("__sig")[i * rows_per + j] for j in range(rows_per)]
                ).alias("key"),
            )
            for i in range(bands)
        ]
    )

    def hot_stats():
        sig = barrier(minhash_signatures(docs, "doc_id", "text", 64, 3))
        banded = sig.select(
            "__id", "__sig", "__sz", F.explode(band_structs).alias("b")
        ).select("__id", "__sig", "__sz", "b.band", "b.key")
        (
            banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 2)
            .agg(F.count(F.lit(1)), F.coalesce(F.sum("__n"), F.lit(0)))
            .collect()
        )

    stage("barrier+hot_stats_collect", hot_stats)

    # stage C: full query end to end (current working-tree code)
    stage("full_query", lambda: noop(QUERIES["t62_capped_lsh_pairs"].fn(spark, SF_DIR)))

    # stage D: uncapped t6 for reference
    stage("t6_uncapped", lambda: noop(minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2)))

    print(json.dumps({"profile": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
