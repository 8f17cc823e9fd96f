"""VERDICT r4 #6: prove (or reject) q21 headroom from a bucketed
layout at the 100×-replica scale.

q21's plan is three shuffles of the lineitem-sized ``lo`` relation on
orderkey (the orders join + the EXISTS semi + the NOT-EXISTS anti) —
at 100× it was the heaviest TPC-H shape (104 s in the r4 sweep). With
lineitem AND orders written BUCKETED by their orderkey (the classic
pre-paid-shuffle layout for a repeatedly-self-joined fact table), all
three joins should plan without an Exchange on the fact side: the
orders join becomes a bucket-aligned SMJ, and its output partitioning
(orderkey) flows through the semi/anti joins, whose derived sides
carry the same attribute.

Metrics: wall-clock (min of ``reps``) plain parquet vs bucketed
tables on the SAME query plan (`_q21_plan` — layout only), plus the
Exchange count in each physical plan. One-time bucketed-write cost is
reported separately (at 100 TB it amortizes across every orderkey
join, not just q21). Results → PERF.md.

Run: python scripts/q21_bucket_bench.py [replicas] [buckets] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize_scaled_sf
from vspace_spark.io.tables import load_table
from vspace_spark.operators.scale import write_bucketed
from vspace_spark.queries.relational3 import _q21_plan
from vspace_spark.session import get_spark


def n_exchanges(df) -> str:
    """Count SHUFFLE exchanges vs broadcasts separately — broadcasts
    are dimension-sized and fine; shuffle exchanges of the fact side
    are what bucketing exists to remove."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count tree nodes only: the tree prints "Exchange (34)", the
    # detail section "(34) Exchange" — counting the bare substring
    # doubles every node, and naively subtracting ReusedExchange
    # misattributed reused BROADCASTS to the shuffle tally
    bcast = len(re.findall(r"BroadcastExchange \(\d+\)", plan))
    shuffle = len(
        re.findall(r"(?<![A-Za-z])Exchange \(\d+\)", plan)
    )
    return f"{shuffle} shuffle / {bcast} broadcast"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("q21-bucket-bench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = materialize_scaled_sf(spark, sf_dir, replicas)

    li = load_table(spark, scaled, "lineitem")
    orders = load_table(spark, scaled, "orders")
    supp = load_table(spark, scaled, "supplier")

    def timed(frame_fn):
        """Every rep COLD: _q21_plan may persist+materialize its
        shared relation during plan CONSTRUCTION, so the cache is
        cleared before each rep and the plan is constructed inside
        the timed region — building a plan outside timing (e.g. for
        explain) would leave a warm cache that lets rep 1 skip the
        dominant, layout-sensitive join."""
        best, result = float("inf"), None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            result = frame_fn().count()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        return best, result

    t_plain, n_plain = timed(lambda: _q21_plan(li, orders, supp))
    # explain AFTER timing — constructing the plan materializes caches
    plain_exchanges = n_exchanges(_q21_plan(li, orders, supp))
    spark.catalog.clearCache()
    print(
        f"plain parquet: {t_plain:.1f} s, rows={n_plain}, "
        f"exchanges={plain_exchanges}",
        flush=True,
    )

    # the default (non-Hive) catalog is session-scoped but the
    # warehouse files persist — clear both or the write errors with
    # LOCATION_ALREADY_EXISTS on a re-run
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("q21_li_bucketed", "q21_orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    t0 = time.perf_counter()
    write_bucketed(li, "q21_li_bucketed", "l_orderkey", buckets)
    write_bucketed(orders, "q21_orders_bucketed", "o_orderkey", buckets)
    t_write = time.perf_counter() - t0
    li_b = spark.table("q21_li_bucketed")
    orders_b = spark.table("q21_orders_bucketed")
    t_buck, n_buck = timed(lambda: _q21_plan(li_b, orders_b, supp))
    buck_exchanges = n_exchanges(_q21_plan(li_b, orders_b, supp))
    spark.catalog.clearCache()
    print(
        f"bucketed({buckets}): {t_buck:.1f} s, rows={n_buck}, "
        f"exchanges={buck_exchanges}, one-time write {t_write:.1f} s",
        flush=True,
    )
    assert n_plain == n_buck, "layout changed the answer"
    print(
        f"speedup {t_plain / t_buck:.2f}x "
        f"(break-even after {t_write / max(t_plain - t_buck, 1e-9):.1f} runs)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
