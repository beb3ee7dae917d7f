"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is executed to completion with the noop sink (full plan runs,
nothing collected to the driver).  A warmup pass on sf0.001 triggers JVM/
Arrow initialization so timings measure the queries, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from spark_ml_spatialjointransformer_spark.queries import QUERIES

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def reps_converged(rr: "list[float]", tol: float = 1.2, cap: int = 4) -> bool:
    """Stop repeating once the two BEST readings agree within ``tol`` (or
    at ``cap`` reps).  Requiring two independent agreeing readings is what
    distinguishes steady state from a load spike that tainted consecutive
    reps — two slow readings that agree do NOT stop the loop unless a
    faster one never appears within the cap."""
    if len(rr) >= cap:
        return True
    if len(rr) < 2:
        return False
    best, second = sorted(rr)[:2]
    return second <= best * tol


def clear_session_state(spark) -> None:
    """Unpersist everything between timed runs: the checkpointing operators
    (LSH self-joins, the kNN loop, packing) leave localCheckpoint RDDs
    behind, and letting them pile up across 38 independent queries turns
    the bench into a memory-pressure measurement instead of a query one."""
    import gc

    spark.catalog.clearCache()
    try:
        # unload every loaded streaming state-store provider (HDFS-backed
        # stores keep their full version maps on-heap per (operator,
        # partition) — 19 streaming queries × reps pile up hundreds of
        # providers; r6 showed e2/e12 drifting 2-2.6× across the growing
        # session).  StateStore lazily restarts on next streaming use.
        jvm = spark.sparkContext._jvm
        jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().valuesIterator()
        while it.hasNext():
            # blocking: a non-blocking unpersist can leave the blocks of 100+
            # queries' localCheckpoints (kNN loop, LSH closure, packing) alive
            # into the next timed region — r5 showed a broad ~1.5x drift across
            # untouched queries consistent with exactly that pressure
            it.next().unpersist(True)
    except Exception:
        pass
    gc.collect()  # drop Python-side DataFrame refs first...
    try:
        # ...then collect the JVM: Spark's ContextCleaner only releases
        # shuffle files, broadcasts, and RDD blocks when their JVM handles
        # are garbage-collected, which a long driver session rarely does on
        # its own between queries
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    load_start = round(os.getloadavg()[0], 1)  # external-load evidence

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sjt-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # 32g, NOT the box's full 128g: on a 96g heap the checkpoint-loop
        # queries (partitioned kNN, closure) ran 2-8x slower with wild
        # variance (13-43s for a 5.4s query) — G1 defers collection on a
        # huge heap until mixed cycles land mid-query; at 24-32g the same
        # queries are stable.  Measured r6: j18 96g=13-43s, 24g=5.4s warm.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one full pass at sf0.001 — spawns the python worker pool,
    # compiles every query's generated code (the 64-aggregate minhash
    # stage alone costs seconds of janino time on first run), and JITs the
    # hot paths, so the timed pass measures steady-state query execution
    for qd in QUERIES.values():
        try:
            run(qd.fn(spark, WARMUP_SF_DIR))
        except Exception:
            pass

    # Rep policy: repeat each query until its two BEST readings agree
    # within 20% (cap 4 reps), report the min.  Rationale, measured across
    # rounds: (a) the first sf-scale execution of a plan pays
    # scale-specific codegen/JIT — an r8 full-bench replication showed 28
    # of 209 queries with rep1 > 1.5x rep2 and only 3 the other way, so a
    # fixed 2-rep min systematically reads ~steady-state but a SINGLE rep
    # never does; (b) this box carries unrelated load, and a load spike
    # that hits BOTH of two fixed reps looks like a stable slow reading
    # (r7's j18 recorded 8.30 s in-bench vs 3.3-4.3 s in an idle-box
    # replication of the identical code) — requiring two INDEPENDENT
    # agreeing readings forces a third look exactly when a spike could be
    # hiding.  Stable queries still cost 2 reps; only JIT-first-rep and
    # spike-hit queries pay more.
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    failed: list[str] = []
    for name, qd in QUERIES.items():
        try:
            rr: list[float] = []
            while not reps_converged(rr):
                clear_session_state(spark)  # outside the timed region
                t0 = time.perf_counter()
                run(qd.fn(spark, sf_dir))
                rr.append(time.perf_counter() - t0)
            reps[name] = rr
            timings[name] = round(min(rr), 3)
        except Exception as e:  # one broken query must not void the record
            failed.append(name)
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "failed": failed,
                # 1-min load average at start/end: the bench shares a box
                # with unrelated work, and a load-tainted round (r7's
                # uniform 1.14x drift) is otherwise indistinguishable from
                # a broad plan regression
                "load_avg": [load_start, round(os.getloadavg()[0], 1)],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
