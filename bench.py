"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced with a count() after a write-free full execution
(collect of an agg'd result would hide exchange costs; count() runs the
whole plan). Timings include plan + execution, excluding session start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vspace_spark.queries import QUERIES, load_all
from vspace_spark.session import get_spark

# Headline set: the flagship text pipeline + the heaviest relational /
# dedup / similarity representatives. Kept stable across rounds so
# BENCH_r{N}.json files are comparable.
HEADLINE = [
    "term_stats_ngram",
    "term_stats_by_source",
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_revenue",
    "q19_disjunctive_predicates",
    "tfidf_top3_per_doc",
    "user_sessions",
    "cohort_daily_retention",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "ann_bruteforce_top5",
    "doc_quality",
    "stream_hourly_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    load_all()
    spark = get_spark("vspace-bench")
    # JIT/IO warmup on a trivial action so q1 doesn't pay session costs.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
