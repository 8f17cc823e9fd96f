"""Driver-comparison sweep: run registered queries against their
DuckDB oracles at a chosen SF, exactly the way the driver's
correctness gate does (row count + sorted-column schema + order-
insensitive values via tests/test_oracle_parity.py's canonicalizer).

Usage:
    python scripts/driver_sweep.py [--sf /root/testdata/sf0.01]
        [--queries name1,name2 | --window | --all]

--window sweeps the 50 driver slots (the default), --all the whole
registry (rows-only entries get a rows>=0 check only). Prints one
status line per query and a final JSON summary; exit 1 on any FAIL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb
import pandas as pd

from test_oracle_parity import _canon  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--window", action="store_true")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import vspace_spark.queries as Q
    from vspace_spark.queries import ORACLES, QUERIES, load_all
    from vspace_spark.session import get_spark

    load_all()
    if args.queries:
        names = args.queries.split(",")
    elif args.all:
        names = list(QUERIES)
    else:
        names = list(Q._WINDOW)

    spark = get_spark("driver-sweep")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    results: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            got = _canon(QUERIES[name](spark, args.sf).toPandas())
            if name in ORACLES:
                want = _canon(con.execute(ORACLES[name]).df())
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True
                )
                status = "MATCH"
            else:
                status = f"ROWS_ONLY({len(got)})"
        except Exception as e:  # noqa: BLE001 — report, don't die
            status = "FAIL"
            traceback.print_exc()
            print(f"--- {name}: {type(e).__name__}", flush=True)
        results[name] = status
        print(
            f"{name}: {status} [{time.perf_counter() - t0:.1f}s]",
            flush=True,
        )
        spark.catalog.clearCache()
    n_fail = sum(1 for v in results.values() if v == "FAIL")
    print(
        json.dumps(
            {
                "sf": args.sf,
                "n": len(results),
                "match": sum(
                    1 for v in results.values() if v == "MATCH"
                ),
                "rows_only": sum(
                    1
                    for v in results.values()
                    if v.startswith("ROWS_ONLY")
                ),
                "fail": n_fail,
                "failed": [
                    k for k, v in results.items() if v == "FAIL"
                ],
            }
        )
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
