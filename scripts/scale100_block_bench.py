"""100x block steady-state re-derivation + outlier mechanism probe
(VERDICT r11 #3 — make the 100x block a signal again).

The r11 100x block recorded 466 s vs r10's 268 s with zero plan
changes, dominated by one-rep outliers (pagerank 207.7 s vs its
44-61 s standalone steady; dedup_keep_best 82.1 s at 1.67x steady,
under the old 2x re-rep trigger). Two questions this harness answers:

1. What ARE the steady states of the ten heavy_100x queries in the
   state the block actually runs them (one long-lived JVM, block
   order, page cache warmed once at block start)? -> mode=block,
   reps>=2 per query; the per-query MIN is the new bench.py
   steady_100x reference.
2. WHICH mechanism makes an in-suite number diverge from the same
   query's solo number: page-cache eviction by earlier queries' IO,
   JVM aging (heap/GC state accumulated over the block), or the plan
   itself? -> compare
     - mode=solo  : fresh JVM, warm cache, the one query alone;
     - mode=block : the full block in order (in-suite state);
     - mode=block --rewarm-before Q : identical, but the page cache
       is re-warmed immediately before Q — if that alone restores Q
       to its solo time, the mechanism is page-cache eviction; if it
       doesn't, the residual is JVM aging (the plan is ruled out by
       the solo number itself).

Each mode should run in its OWN process (fresh JVM). Quiet host
required — record load with every rep, as everywhere else.

Usage:
  python scripts/scale100_block_bench.py --mode block --reps 2
  python scripts/scale100_block_bench.py --mode solo \
      --query pagerank_purchase_graph --reps 3
  python scripts/scale100_block_bench.py --mode block --reps 2 \
      --rewarm-before pagerank_purchase_graph
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _load_1m() -> float:
    try:
        return os.getloadavg()[0]
    except (AttributeError, OSError):
        return 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["block", "solo"])
    ap.add_argument("--query", help="required for --mode solo")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--rewarm-before",
        help="block mode: re-warm the page cache right before this "
        "query (mechanism split: cache eviction vs JVM aging)",
    )
    args = ap.parse_args()

    from bench import HEADLINE  # noqa: F401  (path side effect only)
    from bench import _warm_page_cache, materialize_scaled_sf
    from vspace_spark.queries import QUERIES, load_all
    from vspace_spark.session import get_spark

    load_all()
    spark = get_spark("scale100-block-bench")
    spark.range(1000).count()
    dir_100x = materialize_scaled_sf(spark, args.sf_dir, 100)
    _warm_page_cache(dir_100x)

    # bench.py's heavy_100x, kept in ONE place there would be nicer,
    # but importing bench.main's local list isn't possible — mirror it
    # and let the block assert the mirror is current.
    block_order = [
        "user_sessions",
        "q3_top_unshipped_orders",
        "term_stats_ngram",
        "q21_waiting_suppliers",
        "tfidf_top3_per_doc",
        "user_rfm_segments",
        "dedup_jaccard_pairs",
        "dedup_keep_best",
        "ann_bruteforce_top5",
        "pagerank_purchase_graph",
    ]
    missing = [q for q in block_order if QUERIES.get(q) is None]
    assert not missing, f"block mirror out of date: {missing}"

    targets = block_order if args.mode == "block" else [args.query]
    out: dict[str, dict] = {}
    for name in targets:
        if args.mode == "block" and args.rewarm_before == name:
            t0 = time.perf_counter()
            _warm_page_cache(dir_100x)
            out["_rewarm_sec"] = {  # untimed in bench; recorded here
                "reps": [round(time.perf_counter() - t0, 1)]
            }
        fn = QUERIES[name]
        reps, loads = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, dir_100x).count()
            reps.append(round(time.perf_counter() - t0, 1))
            loads.append(round(_load_1m(), 1))
            spark.catalog.clearCache()
        out[name] = {"reps": reps, "load_1m": loads}
    print(json.dumps({"mode": args.mode,
                      "rewarm_before": args.rewarm_before,
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
