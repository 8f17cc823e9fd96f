"""Runtime bloom-filter join pruning, measured (the 100 TB lever for
selective fact⋈dim joins the optimizer can't prune statically).

Shape: a wide fact table shuffle-joined to a dim filtered down to
``dim_sel`` of its rows by a predicate on a NON-key column — so static
partition pruning and predicate pushdown cannot touch the fact side.
With ``spark.sql.optimizer.runtime.bloomFilter.enabled`` Spark builds
a bloom filter from the filtered dim keys and applies it to the fact
scan, discarding ~(1 − dim_sel) of fact rows BEFORE the shuffle. At
100 TB the saved shuffle is the difference between a job that runs and
one that doesn't.

Broadcast is disabled: with a broadcastable dim the join itself prunes
at probe time and bloom adds nothing — the measurement targets the
shuffle-join regime. Facts are read from PARQUET (not an in-memory
range) so the bloom filter has a real scan to push into.

Prints one JSON line; PERF.md records it.

Usage: python scripts/runtime_filter_bench.py [fact_rows_millions] [dim_sel]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from vspace_spark.session import get_spark


def main() -> None:
    fact_m = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    dim_sel = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    n_facts, n_keys = int(fact_m * 1e6), 1 << 20
    work = "/tmp/runtime_filter_bench"

    spark = get_spark("runtime-filter-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # Spark only injects the bloom filter when the application-side
    # scan is ≥ 10 GB (applicationSideScanSizeThreshold) — true at
    # production scale, never at bench scale. Zero the threshold so
    # the local measurement exercises the same plan a 100 TB scan
    # gets by default. (Verified: with the default threshold the
    # optimized plan contains no BloomFilter and on/off times differ
    # only by noise.)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )

    fact_path = os.path.join(work, f"facts_{n_facts}.parquet")
    if not os.path.exists(fact_path):
        shutil.rmtree(work, ignore_errors=True)
        # ~96-byte INCOMPRESSIBLE payload per row (md5 hex ×3): the
        # shuffle bytes bloom pruning avoids. A constant-ish payload
        # compresses away in the shuffle codec and a narrow (key, v)
        # fact shuffles too cheaply for pruning to register.
        spark.range(n_facts).select(
            (F.abs(F.hash("id")) % n_keys).alias("key"),
            (F.col("id") % 1000).alias("v"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("payload"),
        ).repartition(64).write.parquet(fact_path)
    facts = spark.read.parquet(fact_path)
    # dim_sel of dim rows survive a filter on a non-key attribute.
    # The dim is MATERIALIZED to parquet: with an in-memory
    # `attr = f(key)` expression Catalyst's constraint inference
    # pushes the attr predicate through the join ONTO THE FACT KEY
    # (verified in the plan), pre-pruning the facts with no runtime
    # filter at all — real dim attributes are data, not derivable,
    # so the bench must hide the functional dependency behind a scan.
    dim_path = os.path.join(work, f"dims_{n_keys}.parquet")
    if not os.path.exists(dim_path):
        spark.range(n_keys).select(
            F.col("id").alias("key"),
            (F.abs(F.hash("id", F.lit(3))) % 1000).alias("attr"),
        ).write.parquet(dim_path)
    dims = spark.read.parquet(dim_path)
    sel_attr = int(dim_sel * 1000)

    def run() -> int:
        # the payload must survive to the probe side (min keeps it
        # cheap to aggregate) so the shuffle actually carries the bytes
        return (
            facts.join(dims.filter(F.col("attr") < sel_attr), "key")
            .agg(F.sum("v"), F.min("payload"))
            .collect()[0][0]
        )

    def shuffle_write_bytes() -> int:
        """Total shuffle write across all completed stages (UI REST).
        Local-mode wall-clock under-prices shuffle (it's a memory
        copy); bytes-not-shuffled is the metric that transfers to a
        real cluster, where shuffle = network + serialization."""
        import json as _json
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = _json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    results = {"fact_rows": n_facts, "dim_rows": n_keys, "dim_sel": dim_sel}
    for flag in ("false", "true"):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", flag
        )
        best, out = float("inf"), None
        sw0 = shuffle_write_bytes()
        for i in range(2):  # min-of-2: first run pays codegen JIT
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
            if i == 0:
                results[f"join_bloom_{flag}_shuffle_mb"] = round(
                    (shuffle_write_bytes() - sw0) / 1e6, 1
                )
        results[f"join_bloom_{flag}_sec"] = round(best, 2)
        results[f"join_bloom_{flag}_sum"] = out
    assert results["join_bloom_false_sum"] == results["join_bloom_true_sum"]
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
