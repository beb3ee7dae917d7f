"""Merge a clean bench record into BENCH_BASELINE.json (round-close step).

Policy (r11, closing the r10 advice on one-sided resampling):

- the record must be CLEAN: ``load_avg[0] < 2`` and ``failed == []`` —
  a load-tainted record cannot set baselines;
- the per-query value merged is the PRIMARY-pass min: for queries the
  end-of-run retry pass re-measured, ``retried_primary_min[name]`` (the
  min BEFORE retries) is used instead of ``queries[name]`` — the retry
  pass exists to un-flag interference victims in the round's headline,
  but letting its extra draws into the baseline is one-sided resampling
  that only ever pushes the recorded floor down;
- merge is per-query min against the existing baseline, same sf only.

Usage: python examples/merge_baseline.py BENCH_LOCAL_r11.json [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH_BASELINE.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("record")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.record) as fh:
        rec = json.load(fh)
    load0 = (rec.get("load_avg") or [99])[0]
    if load0 >= 2 or rec.get("failed"):
        print(
            f"refusing: record not clean (load_start={load0}, "
            f"failed={rec.get('failed')})",
            file=sys.stderr,
        )
        return 1

    primary = dict(rec.get("queries", {}))
    for name, v in (rec.get("retried_primary_min") or {}).items():
        primary[name] = v  # retry-pass draws never enter the baseline

    try:
        with open(BASELINE) as fh:
            base = json.load(fh)
    except (OSError, ValueError):
        base = {"queries": {}, "sf": rec.get("sf")}
    if str(base.get("sf")) != str(rec.get("sf")):
        print(
            f"refusing: sf mismatch baseline={base.get('sf')} "
            f"record={rec.get('sf')}",
            file=sys.stderr,
        )
        return 1

    out = dict(base.get("queries", {}))
    n_new, n_lower = 0, 0
    for name, v in primary.items():
        if name not in out:
            out[name] = v
            n_new += 1
        elif v < out[name]:
            out[name] = v
            n_lower += 1
    print(f"merge: {n_new} new queries, {n_lower} lowered, {len(out)} total")
    if not args.dry_run:
        with open(BASELINE, "w") as fh:
            json.dump(
                {"sf": base.get("sf", rec.get("sf")), "queries": out},
                fh,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"wrote {BASELINE}")
    return 0


if __name__ == "__main__":
    main()
