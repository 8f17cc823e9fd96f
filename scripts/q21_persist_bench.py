"""q21 shared-relation persist: storage-strategy x JVM-state A/B
(PERF.md round 8, VERDICT r7 #3).

The r7 artifact recorded q21 at 109.8 s in-suite vs a 14.1 s
standalone steady state, and PERF.md's footnote suspected the
MEMORY_AND_DISK persist of the shared ``lo`` relation interacting
with long-JVM GC state (deserialized cache = millions of heap
objects that old-gen collections must trace). Variants:

- registered: whatever _q21_plan ships (r5-r7: MEMORY_AND_DISK —
  in PySpark the SERIALIZED level, byte buffers on heap; r8+:
  DISK_ONLY, chosen by this A/B)
- memdisk: StorageLevel.MEMORY_AND_DISK inline (the r5-r7 level)
- memdisk_deser: MEMORY_AND_DISK_DESER (the JVM-default deserialized
  level: object graph on heap, worst case for old-gen GC tracing)
- disk_only: DISK_ONLY (cache lives in local files; reads ride the
  warm page cache, zero heap residency)
- localckpt: eager localCheckpoint (truncates lineage too — AQE sees
  honest sizes AND the three consumers re-plan from materialized
  blocks)
- none: recompute plan (the below-floor shape)

Modes:
- fresh: warm page cache, 3 reps of q21
- aged:  run pagerank_purchase_graph at 100x first (the suite's
  biggest long-JVM GC driver), then 3 reps of q21 — the in-suite
  heap state, reproduced without the 400 s of unrelated suite

Each (variant, mode) runs in its OWN process.

Usage:
  python scripts/q21_persist_bench.py --variant memdisk --mode fresh \
      [--dir /tmp/bench_scaled_sf0.1_x100] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark import StorageLevel
from pyspark.sql import functions as F


def build_q21(spark, sf_dir: str, variant: str):
    from vspace_spark.io.tables import load_table
    from vspace_spark.queries.relational3 import _q21_plan

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    if variant == "registered":
        # the registered plan: _q21_plan persists when above the floor
        return _q21_plan(li, orders, supp)
    # re-create the plan with the lo strategy swapped: copy of
    # _q21_plan's body with the persist line replaced (kept in sync
    # by the shared-output assertion in main())
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS"))
        .alias("late"),
        "o_orderstatus",
    )
    if variant == "memdisk":
        lo = lo.persist(StorageLevel.MEMORY_AND_DISK)
        lo.count()
    elif variant == "memdisk_deser":
        lo = lo.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        lo.count()
    elif variant == "disk_only":
        lo = lo.persist(StorageLevel.DISK_ONLY)
        lo.count()
    elif variant == "localckpt":
        lo = lo.localCheckpoint(eager=True)
    elif variant == "none":
        pass
    else:
        raise SystemExit(f"unknown variant {variant}")
    l1 = lo.filter((F.col("o_orderstatus") == "F") & F.col("late"))
    others = lo.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    late_others = lo.filter("late").select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    sole_late = l1.join(
        others,
        (l1.l_orderkey == F.col("_ok2")) & (l1.l_suppkey != F.col("_sk2")),
        "left_semi",
    ).join(
        late_others,
        (l1.l_orderkey == F.col("_ok3")) & (l1.l_suppkey != F.col("_sk3")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant",
        choices=["registered", "memdisk", "memdisk_deser", "disk_only", "localckpt", "none"],
        required=True,
    )
    ap.add_argument("--mode", choices=["fresh", "aged"], default="fresh")
    ap.add_argument("--dir", default="/tmp/bench_scaled_sf0.1_x100")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _warm_page_cache
    from vspace_spark.queries import QUERIES, load_all
    from vspace_spark.session import get_spark

    load_all()
    spark = get_spark(f"q21-{args.variant}-{args.mode}")
    spark.range(1000).count()
    _warm_page_cache(args.dir)
    if args.mode == "aged":
        t0 = time.perf_counter()
        QUERIES["pagerank_purchase_graph"](spark, args.dir).count()
        print(
            f"aged preamble pagerank sec={time.perf_counter() - t0:.1f}",
            flush=True,
        )
        spark.catalog.clearCache()
    rows = None
    for rep in range(args.reps):
        t0 = time.perf_counter()
        df = build_q21(spark, args.dir, args.variant)
        got = df.collect()
        dt = time.perf_counter() - t0
        sig = tuple((r.s_name, r.numwait) for r in got)
        if rows is None:
            rows = sig
        assert sig == rows, "variant output drifted between reps"
        print(
            f"variant={args.variant} mode={args.mode} rep={rep}"
            f" sec={dt:.1f} rows={len(got)}"
            f" load_1m={os.getloadavg()[0]:.1f}",
            flush=True,
        )
        spark.catalog.clearCache()
    # cross-variant check: print the top row so outputs can be eyeballed
    print("top:", rows[0] if rows else None, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
