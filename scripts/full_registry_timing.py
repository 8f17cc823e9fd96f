"""Time EVERY registered query at one SF — the round-13 optimization
round's coverage measurement (guide §1: measure first, for every
operator, not just the 26 bench headline rows).

Methodology matches bench.py's headline block (build + .count(), cache
cleared between queries) so numbers are comparable with BENCH_r*.json;
min of N reps (default 2). Writes JSON {name: {reps: [...], min: s}}
to --out and prints a sorted-by-cost table.

Usage: python scripts/full_registry_timing.py [--sf /root/testdata/sf0.1]
       [--reps 2] [--only a,b] [--skip a,b] [--out /tmp/registry_timing.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vspace_spark.queries import QUERIES, load_all
from vspace_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default="/tmp/registry_timing.json")
    args = ap.parse_args()

    load_all()
    only = {n for n in args.only.split(",") if n}
    skip = {n for n in args.skip.split(",") if n}
    names = [n for n in sorted(QUERIES) if (not only or n in only) and n not in skip]

    spark = get_spark("full_registry_timing")
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        reps: list[float] = []
        try:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, args.sf).count()
                reps.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"
            spark.catalog.clearCache()
            print(f"{name:45s} ERROR {errors[name][:120]}", flush=True)
            continue
        results[name] = {"reps": reps, "min": min(reps)}
        print(f"{name:45s} min={min(reps):8.3f}  reps={reps}", flush=True)
        with open(args.out, "w") as fh:
            json.dump({"sf": args.sf, "results": results, "errors": errors}, fh)
    spark.stop()

    print("\n=== sorted by min (desc) ===")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["min"]):
        print(f"{name:45s} {r['min']:8.3f}")
    if errors:
        print(f"\nERRORS: {list(errors)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
