"""pagerank persist policy: storage-strategy x JVM-state A/B
(VERDICT r9 #1 — the q21_persist_bench harness applied to the 100x
block's dominant query).

pagerank_purchase_graph persists its symmetrized edge list across all
iterations; until round 10 that persist was hardcoded
MEMORY_AND_DISK — in PySpark the SERIALIZED level, but its byte
buffers are HEAP-RESIDENT, the exact aged-JVM coupling q21 measured
at 3-6x (PERF.md round 8). Round 10 routes it through
operators/scale.py:persist_shared (DISK_ONLY once the footer-probe
estimate crosses 512 MB decompressed). This A/B isolates that swap:

- variant=memdisk:    force MEMORY_AND_DISK (the r9 level)
- variant=registered: whatever pagerank ships (r10+: persist_shared)

- mode=fresh: warm page cache, then reps of pagerank at the given dir
- mode=aged:  run tfidf_top3_per_doc twice at the same dir first (the
  suite's token-explode GC driver), then reps — reproducing the
  in-suite heap state without the rest of the suite

Each (variant, mode) should run in its OWN process (fresh JVM).

Usage:
  python scripts/pagerank_persist_bench.py --variant registered \
      --mode aged [--dir /tmp/bench_scaled_sf0.1_x100] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["memdisk", "registered"])
    ap.add_argument("--mode", required=True, choices=["fresh", "aged"])
    ap.add_argument("--dir", default="/tmp/bench_scaled_sf0.1_x100")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from vspace_spark.session import get_spark

    spark = get_spark("pagerank-persist-bench")
    spark.range(1000).count()

    if args.variant == "memdisk":
        # pin the pre-r10 behavior: est below the floor -> the policy
        # helper returns MEMORY_AND_DISK for every persist in pagerank
        import vspace_spark.operators.graph as g

        real = g.est_relation_bytes
        g.est_relation_bytes = lambda df, **kw: 0  # < floor => memdisk

    from vspace_spark.queries import QUERIES, load_all

    load_all()

    if args.mode == "aged":
        for _ in range(2):
            QUERIES["tfidf_top3_per_doc"](spark, args.dir).count()
            spark.catalog.clearCache()

    fn = QUERIES["pagerank_purchase_graph"]
    reps = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fn(spark, args.dir).count()
        reps.append(round(time.perf_counter() - t0, 1))
        spark.catalog.clearCache()
    print(
        {
            "variant": args.variant,
            "mode": args.mode,
            "reps_sec": reps,
            "load_1m": round(os.getloadavg()[0], 1),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
