"""Measured Z-order layout benchmark: does Morton clustering actually
prune at the parquet row-group level, and on BOTH dimensions?

Fixture: the sf events table replicated ``reps``× with shifted ids
(same shape as bench.py's scaled pass), written three ways under
identical file counts:

1. **ts-sorted** — the natural ingest order (range-partition by ts):
   min/max stats prune time predicates perfectly, user predicates not
   at all (every file spans the full user range);
2. **user-sorted** — the opposite single-column layout;
3. **z-ordered** — ``operators/scale.py:write_zordered`` on
   (user bucket, minute bucket).

Probes: a selective single-user scan, a narrow time-window scan, and
the combined point query. Each probe runs on all three layouts
(min-of-``reps_timed``); row counts are cross-checked so timings
compare equal work. The expectation worth measuring: single-column
layouts win their own dimension and lose the other; z-order is close
to best on BOTH — that, not absolute speed, is the 100 TB story
(row-group pruning scales with data size; compute does not).

Prints one JSON line; PERF.md records the numbers.

Usage: python scripts/zorder_bench.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.scale import morton_key, write_zordered
from vspace_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_files = 64
    spark = get_spark()
    base = load_table(spark, sf_dir, "events")
    n_users = base.agg(F.countDistinct("user_id")).first()[0]
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    events = (
        base.crossJoin(F.broadcast(rep))
        .select(
            (F.col("event_id") * reps + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * n_users).alias("user_id"),
            "event_type",
            "value",
        )
        .withColumn("minute", F.expr("unix_millis(ts) div 60000"))
    )

    root = tempfile.mkdtemp(prefix="zorder_bench_")
    layouts = {}
    t0 = time.time()
    events.repartitionByRange(n_files, "ts").sortWithinPartitions(
        "ts"
    ).write.mode("overwrite").parquet(f"{root}/by_ts")
    layouts["by_ts"] = time.time() - t0
    t0 = time.time()
    events.repartitionByRange(n_files, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(f"{root}/by_user")
    layouts["by_user"] = time.time() - t0
    t0 = time.time()
    write_zordered(
        events, f"{root}/zorder", "user_id", "minute", target_files=n_files
    )
    layouts["zorder"] = time.time() - t0

    # probe predicates: one hot-ish user, one 6-hour window, and both
    some = base.select(
        F.min("user_id").alias("u"), F.min("ts").alias("t0")
    ).first()
    probe_user = int(some["u"]) + (reps // 2) * n_users
    t_lo = some["t0"]
    probes = {
        "point_user": lambda df: df.filter(F.col("user_id") == probe_user),
        "time_window": lambda df: df.filter(
            (F.col("ts") >= F.lit(t_lo))
            & (F.col("ts") < F.lit(t_lo) + F.expr("INTERVAL 6 HOURS"))
        ),
        "user_and_time": lambda df: df.filter(
            (F.col("user_id") == probe_user)
            & (F.col("ts") >= F.lit(t_lo))
            & (
                F.col("ts")
                < F.lit(t_lo) + F.expr("INTERVAL 7 DAYS")
            )
        ),
    }

    def scan_metrics(df) -> tuple[int, int]:
        """(files read, rows surviving row-group pruning) from the
        executed plan's parquet scan node — the pruning metric itself,
        immune to page-cache noise that drowns wall-clock at bench
        scale."""
        agg = df.select(F.count("*"))
        agg.collect()
        found = []

        def walk(node):
            name = node.nodeName()
            try:
                ms, it, vals = node.metrics(), None, {}
                it = ms.iterator()
                while it.hasNext():
                    kv = it.next()
                    vals[kv._1()] = kv._2().value()
                if "numFiles" in vals:
                    found.append(
                        (vals["numFiles"], vals.get("numOutputRows", -1))
                    )
            except Exception:
                pass
            if name.startswith("AdaptiveSparkPlan"):
                walk(node.executedPlan())
                return
            if "QueryStage" in name:
                walk(node.plan())
                return
            for i in range(node.children().size()):
                walk(node.children().apply(i))

        walk(agg._jdf.queryExecution().executedPlan())
        assert len(found) == 1, found
        return found[0]

    results: dict[str, dict[str, dict]] = {}
    counts: dict[str, set[int]] = {p: set() for p in probes}
    for layout in ("by_ts", "by_user", "zorder"):
        df = spark.read.parquet(f"{root}/{layout}")
        results[layout] = {}
        for pname, pred in probes.items():
            c = pred(df).count()
            counts[pname].add(c)
            files, scanned = scan_metrics(pred(df))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                pred(df).count()
                best = min(best, time.time() - t0)
            results[layout][pname] = {
                "files": files,
                "rows_scanned": scanned,
                "sec": round(best, 3),
            }
    for pname, cs in counts.items():
        assert len(cs) == 1, f"{pname}: layouts disagree on rows {cs}"

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "zorder_probe_pruning",
                "reps": reps,
                "n_files": n_files,
                "write_sec": {k: round(v, 1) for k, v in layouts.items()},
                "probes": results,
                "result_rows": {p: next(iter(c)) for p, c in counts.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
