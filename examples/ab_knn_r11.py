"""Interleaved A/B for partitioned-kNN experiments: alternate variants in
one session, min per variant (bench.py config, sf0.001 warmup, noop sink).

Usage: python examples/ab_knn_r11.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_ml_spatialjointransformer_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Variants are env-gated experiment flags read by operators/knn.py; the
# lazy-final experiment this script decided (j18 10.2->7.2s mins over 4
# interleaved rounds) is landed unconditionally, so the dict is back to
# the single base entry until the next experiment.
VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sjt-ab-knn")
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

    queries = ["j18_knn3_partitioned", "f2_transformer_knn_partitioned",
               "j17_nearest_cond_partitioned", "j12_nearest_partitioned"]
    for q in queries:
        noop(QUERIES[q].fn(spark, WARM_DIR))

    best: dict[tuple[str, str], float] = {}
    for i in range(rounds):
        for vname, env in VARIANTS.items():
            os.environ.update(env)
            for q in queries:
                clear_session_state(spark)
                t0 = time.perf_counter()
                noop(QUERIES[q].fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                key = (vname, q)
                best[key] = min(best.get(key, 9e9), dt)
                print(f"round{i} {vname:12s} {q}: {dt:.2f}s", flush=True)
    print("\n== mins ==")
    for (vname, q), s in sorted(best.items(), key=lambda kv: kv[0][1]):
        print(f"{vname:12s} {q}: {s:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
