"""Full-registry correctness sweep → machine-readable artifact.

Runs EVERY registered query against its DuckDB oracle at the driver's
scale factor (sf0.01 by default) and writes one row per query —
rows/schema/value-hash match, in the driver's comparison style — to
``CORRECTNESS_FULL_r{N}.json`` at the repo root.  The driver's own
CORRECTNESS gate samples ~50 queries per round; this is the committed
full record the round-close checklist requires.

Usage:
    python examples/full_sweep.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_FULL_r10.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(map(str, t)))
    return sorted(cols), out


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(map(str, r)).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_FULL_r10.json")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from spark_ml_spatialjointransformer_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("full-sweep")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_pass = 0
    n_ran_only = 0
    t_start = time.time()
    for i, (name, qd) in enumerate(sorted(QUERIES.items()), 1):
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = qd.fn(spark, args.sf_dir)
            s_cols, s_rows = normalize(
                df.columns, [tuple(r) for r in df.collect()]
            )
            row["spark_rows"] = len(s_rows)
            if qd.oracle:
                cur = con.execute(qd.oracle)
                d_cols_raw = [d[0] for d in cur.description]
                d_cols, d_rows = normalize(d_cols_raw, cur.fetchall())
                row["oracle_rows"] = len(d_rows)
                row["rows_match"] = len(s_rows) == len(d_rows)
                row["schema_match"] = s_cols == d_cols
                row["hash_match"] = value_hash(s_rows) == value_hash(d_rows)
                ok = bool(
                    row["rows_match"] and row["schema_match"] and row["hash_match"]
                )
            else:
                # no oracle: the only thing a sweep can assert is "the
                # query ran" — record that under a DISTINCT status and do
                # NOT count it as a pass, so n_pass never overstates
                # verified coverage (all current registry entries carry an
                # oracle, so this branch is normally dead)
                row["ran"] = True
                ok = None
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            ok = False
        if ok is None:
            n_ran_only += 1
            status = "RAN (no oracle)"
        else:
            n_pass += ok
            status = "PASS" if ok else "FAIL"
        results[name] = row
        print(
            f"[{i}/{len(QUERIES)}] {name}: {status}"
            f" ({time.time() - t_start:.0f}s elapsed)",
            flush=True,
        )

    artifact = {
        "sf_dir": args.sf_dir,
        "n_queries": len(QUERIES),
        "n_pass": n_pass,
        "n_ran_only": n_ran_only,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"{n_pass}/{len(QUERIES)} oracle-pass"
        + (f" + {n_ran_only} ran-only" if n_ran_only else "")
        + f" → {args.out}",
        flush=True,
    )
    return 0 if n_pass + n_ran_only == len(QUERIES) else 1


if __name__ == "__main__":
    raise SystemExit(main())
