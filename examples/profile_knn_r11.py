"""Fine-grained partitioned-kNN profile: run j18/f2 at sf0.1 with
SJT_KNN_DEBUG per-stage timers and report rep totals + scheduled job
count (bench.py session config, sf0.001 warmup, noop sink).

Usage: python examples/profile_knn_r11.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["SJT_KNN_DEBUG"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_ml_spatialjointransformer_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sjt-profile-knn")
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
    from bench import clear_session_state

    for q in ("j18_knn3_partitioned", "f2_transformer_knn_partitioned"):
        noop(QUERIES[q].fn(spark, WARM_DIR))
    for q in ("j18_knn3_partitioned", "f2_transformer_knn_partitioned"):
        for i in range(reps):
            clear_session_state(spark)
            sc = spark.sparkContext
            group = f"{q}:{i}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            noop(QUERIES[q].fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            print(f"== {q} rep{i}: {dt:.2f}s jobs={njobs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
