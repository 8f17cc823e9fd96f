"""Dump .explain("formatted") for every registered query to
plans/r13/<query>_<tag>.txt (tag = before/after), plus a one-line
summary per query (Exchange count, join strategies, Python eval nodes,
scan pruning) to stdout — the round-13 optimization round's measurement
substrate (guide §1: capture the plan shape for every declared query
before changing anything).

Usage: python scripts/dump_plans.py [--tag before] [--sf /root/testdata/sf0.1]
       [--only name1,name2]

Query callables may run small eager jobs during construction (clone
probes, two-phase numbering counts) — that is part of their plan-build
cost and does not execute the main plan. Streaming queries build their
result through foreachBatch replay (a real execution), so their dump is
the final batch DataFrame's plan as usual — the callable returns a
DataFrame either way.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vspace_spark.plans.explain import formatted_plan
from vspace_spark.queries import QUERIES, load_all
from vspace_spark.session import get_spark


def summarize(plan: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_reused = len(re.findall(r"\bReusedExchange\b", plan))
    joins = sorted(
        set(
            re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        )
    )
    pyeval = sorted(
        set(
            re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                r"MapInPandas|FlatMapGroupsInPandas|"
                r"FlatMapGroupsInArrow|PythonMapInArrow)\b",
                plan,
            )
        )
    )
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    scans = len(re.findall(r"Scan parquet", plan))
    return (
        f"exch={n_exchange - n_reused}+{n_reused}r joins={','.join(joins) or '-'} "
        f"py={','.join(pyeval) or '-'} scans={scans} pushed={pushed}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    load_all()
    only = {n for n in args.only.split(",") if n}
    names = sorted(only or QUERIES)

    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dump_plans")
    failures: list[str] = []
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name:45s} MISSING")
            failures.append(name)
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = fn(spark, args.sf)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name:45s} ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            spark.catalog.clearCache()
            continue
        with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name:45s} {summarize(plan)}")
        spark.catalog.clearCache()
    spark.stop()
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
