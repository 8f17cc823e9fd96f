"""Measured skew benchmark: hot-key fixture, plain vs salted vs AQE
(VERDICT r1 item 10 — the skew tooling needs numbers, not just a unit
test).

Two workloads on a Zipf-extreme fixture (one key owns ``hot_frac`` of
all fact rows — the "one token in half the corpus" shape):

1. **Aggregation** — ``groupBy(key).agg(sum,count)`` plain vs
   ``salted_aggregate``. Expectation worth *measuring*: Spark's
   map-side partial aggregation already collapses a hot key to one
   partial row per map task, so plain ≈ salted here. Salting earns its
   keep only for non-combinable aggregates; the honest number belongs
   in PERF.md either way.

2. **Join** — facts ⋈ dims on the hot key with broadcast disabled
   (dims sized past any realistic autoBroadcast threshold stand-in):
   a) plain sort-merge, AQE skew handling OFF — the naive plan where
      ONE task performs hot_frac of all row-joins;
   b) ``salted_broadcast_left_join``'s explode-replicate path (salt
      the fact side, replicate each dim row across the salt range,
      equi-join on (key, salt)) — the static fix;
   c) plain join with AQE ``skewJoin`` ON — the runtime fix that
      splits oversized partitions.

Every variant's row count is cross-checked so the timings compare
equal work. Prints one JSON line; PERF.md records the numbers.

Usage: python scripts/skew_bench.py [fact_rows_millions] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from vspace_spark.operators.scale import (
    salted_aggregate,
    salted_broadcast_left_join,
)
from vspace_spark.session import get_spark


def timed(fn, reps: int = 2):
    """min over ``reps`` runs — the first execution of each plan shape
    pays whole-stage-codegen JIT; min isolates steady-state cost."""
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, round(best, 2)


def main() -> None:
    fact_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    n_facts = int(fact_m * 1e6)
    n_keys = 1 << 20

    spark = get_spark("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )

    # Hot-key fixture: hot_frac of rows on key 0, rest uniform.
    # Materialized once (persist) so generation cost is outside every
    # timed region and all variants read identical data.
    facts = (
        spark.range(n_facts)
        .select(
            F.when(
                (F.hash("id") % 1000 + 1000) % 1000 < hot_frac * 1000, 0
            )
            .otherwise((F.abs(F.hash("id", F.lit(1))) % (n_keys - 1)) + 1)
            .alias("key"),
            (F.col("id") % 97).alias("v"),
        )
        .persist()
    )
    dims = (
        spark.range(n_keys)
        .select(
            F.col("id").alias("key"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        .persist()
    )
    n = facts.count()
    dims.count()
    hot_share = facts.filter(F.col("key") == 0).count() / n

    results: dict[str, object] = {
        "fact_rows": n,
        "hot_key_share": round(hot_share, 3),
        "dim_rows": n_keys,
    }

    # -- 1. aggregation ------------------------------------------------
    agg_plain, t_agg_plain = timed(
        lambda: facts.groupBy("key")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .count()
    )
    agg_salted, t_agg_salted = timed(
        lambda: salted_aggregate(
            facts, ["key"], {"s": ("v", "sum"), "c": ("v", "count")}
        ).count()
    )
    assert agg_plain == agg_salted, (agg_plain, agg_salted)
    results["agg_plain_sec"] = t_agg_plain
    results["agg_salted_sec"] = t_agg_salted

    # -- 2. join -------------------------------------------------------
    def plain_join():
        return facts.join(dims, "key", "left").count()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    j_plain, t_join_plain = timed(plain_join)

    j_salted, t_join_salted = timed(
        lambda: salted_broadcast_left_join(
            facts, dims, "key", salt_buckets=32
        ).count()
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    j_aqe, t_join_aqe = timed(plain_join)

    assert j_plain == j_salted == j_aqe == n, (j_plain, j_salted, j_aqe)
    results["join_plain_noaqe_sec"] = t_join_plain
    results["join_salted_sec"] = t_join_salted
    results["join_aqe_skew_sec"] = t_join_aqe

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
