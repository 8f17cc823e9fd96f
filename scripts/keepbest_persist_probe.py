"""dedup_keep_best solo-rep degradation probe (round 12).

Quiet-host solo reps of dedup_keep_best at the 100x replica ASCENDED
74.3 -> 104.5 -> 199.9 s (loads 2-6), while the same query inside the
block state ran flat [57.2, 61.7]. The one mechanism this repo has
measured producing within-JVM rep degradation is heap-resident
persist buffers coupling to old-gen aging (q21, PERF.md round 8);
keep_best's path holds several below-floor MEMORY_AND_DISK persists
(collapse members, shingle relation, CC labels).

A/B: variant=diskonly monkeypatches scale.persist_shared to force
DISK_ONLY for EVERY persist in the query's path (the late function-
level imports re-bind at call time, so patching the module attribute
is sufficient); variant=registered runs the shipped policy. If the
ascending curve flattens under diskonly, the mechanism is heap
residency; if it persists, it is something else (GC aging from
transient allocation, codegen cache, host state).

Each variant in its OWN process:
  python scripts/keepbest_persist_probe.py --variant diskonly --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["diskonly", "registered", "floor128",
                             "floor512all"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/bench_scaled_sf0.1_x100")
    ap.add_argument("--query", default="dedup_keep_best")
    args = ap.parse_args()

    from bench import _warm_page_cache
    from vspace_spark.queries import QUERIES, load_all
    from vspace_spark.session import get_spark

    load_all()
    spark = get_spark("keepbest-persist-probe")
    spark.range(1000).count()
    _warm_page_cache(args.dir)

    if args.variant != "registered":
        import vspace_spark.operators.scale as scale

        real = scale.persist_shared
        if args.variant == "diskonly":

            def patched(df, est_bytes=None, floor_bytes=0, eager=False):
                return real(df, est_bytes=1 << 60, floor_bytes=1,
                            eager=eager)
        elif args.variant == "floor128":  # the slim-floor candidate

            def patched(df, est_bytes=None, floor_bytes=0, eager=False):
                return real(df, est_bytes=est_bytes,
                            floor_bytes=128 << 20, eager=eager)
        else:  # floor512all: pre-r12 behavior — IGNORE caller floors

            def patched(df, est_bytes=None, floor_bytes=0, eager=False):
                return real(df, est_bytes=est_bytes,
                            floor_bytes=512 << 20, eager=eager)

        scale.persist_shared = patched

    fn = QUERIES[args.query]
    reps, loads = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fn(spark, args.dir).count()
        reps.append(round(time.perf_counter() - t0, 1))
        loads.append(round(os.getloadavg()[0], 1))
        spark.catalog.clearCache()
    print(json.dumps({"variant": args.variant, "reps": reps,
                      "load_1m": loads}))
    spark.stop()


if __name__ == "__main__":
    main()
