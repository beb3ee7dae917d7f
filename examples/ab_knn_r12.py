"""Interleaved A/B: does forcing the kNN round-1 state to materialize as
its own job (the SJT_KNN_DEBUG side effect) change j18/f2 wall time vs
the fully-lazy chain?  A = production (lazy), B = debug count on round 1.

Usage: python examples/ab_knn_r12.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_ml_spatialjointransformer_spark.queries import QUERIES
from spark_ml_spatialjointransformer_spark.operators import knn

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TARGETS = ["j18_knn3_partitioned", "f2_transformer_knn_partitioned"]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sjt-ab-knn-r12")
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

    for q in TARGETS:
        noop(QUERIES[q].fn(spark, WARM_DIR))

    import io
    import contextlib

    res: dict[tuple[str, str], list[float]] = {}
    for i in range(rounds):
        for q in TARGETS:
            for variant in ("A_lazy", "B_r1count"):
                knn._DEBUG = variant == "B_r1count"
                clear_session_state(spark)
                t0 = time.perf_counter()
                with contextlib.redirect_stdout(io.StringIO()):
                    noop(QUERIES[q].fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                res.setdefault((q, variant), []).append(round(dt, 2))
                print(f"round {i} {q} {variant}: {dt:.2f}s", flush=True)
    knn._DEBUG = False
    print("== mins ==")
    for (q, v), rr in sorted(res.items()):
        print(f"{q} {v}: min={min(rr):.2f} reps={rr}")
    spark.stop()


if __name__ == "__main__":
    main()
