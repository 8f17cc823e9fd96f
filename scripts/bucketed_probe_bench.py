"""Measure the data-layout lever SCALE.md claims for the LSH index:
a signature index stored as a BUCKETED table lets every probe join
without shuffling the index side.

Shape: the growing-index / ANN probe pattern — a small batch of
arriving documents joins a large persistent (band, bucket) signature
index. Plain parquet: the join hash-shuffles BOTH sides, so every
probe re-shuffles the whole index (index-sized wire cost per probe —
the thing that cannot scale when the index is the 100 TB corpus).
Bucketed by the join key: Spark plans a one-sided shuffle — only the
probe batch moves, the index reads already-co-located (the physical
plan shows a single Exchange, on the probe side).

Metrics: shuffle-write bytes from the UI REST API (the
cluster-transferable cost; local-mode wall-clock under-prices
shuffle), plus the Exchange count on the index side of the plan.
Results → PERF.md.

Run: python scripts/bucketed_probe_bench.py [n_docs] [n_probe]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from vspace_spark.session import get_spark  # noqa: E402


def shuffle_write_bytes(spark) -> int:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("bucketed-probe-bench", shuffle_partitions=32)
    spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed")
    # a previously-aborted run can leave the managed location behind
    # with no catalog entry — Spark then refuses the name outright
    import shutil

    shutil.rmtree(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        + "/lsh_index_bucketed",
        ignore_errors=True,
    )

    # synthetic banded signature index: (band, bucket, doc_id, sig
    # payload). Bucket cardinality ~ n_docs/4 per band — realistic
    # near-dup bucketing (most buckets tiny, occasional clusters).
    idx = (
        spark.range(n_docs)
        .select(
            F.explode(F.array(*[F.lit(b) for b in range(8)])).alias("band"),
            F.col("id").alias("doc_id"),
        )
        .select(
            "band",
            "doc_id",
            F.concat_ws(
                ",",
                (F.xxhash64("doc_id", "band") % (n_docs // 4)).cast("string"),
            ).alias("bucket"),
            F.sha2(F.concat_ws(":", "doc_id", "band"), 256).alias("sig"),
        )
    )
    t0 = time.perf_counter()
    idx.write.mode("overwrite").parquet("/tmp/probe_idx_plain")
    t_plain_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    (
        idx.write.mode("overwrite")
        .bucketBy(32, "band", "bucket")
        .sortBy("band", "bucket")
        .format("parquet")
        .saveAsTable("lsh_index_bucketed")
    )
    t_bucket_write = time.perf_counter() - t0

    probe = (
        spark.range(n_probe)
        .select(
            F.explode(F.array(*[F.lit(b) for b in range(8)])).alias("band"),
            (F.col("id") * 97 % n_docs).alias("pid"),
        )
        .select(
            "band",
            "pid",
            F.concat_ws(
                ",",
                (F.xxhash64(F.col("pid"), F.col("band")) % (n_docs // 4))
                .cast("string"),
            ).alias("bucket"),
        )
    )

    results = {"index_rows": n_docs * 8, "probe_rows": n_probe * 8,
               "write_plain_sec": round(t_plain_write, 2),
               "write_bucketed_sec": round(t_bucket_write, 2)}
    # Regime check (first finding of this bench): a broadcast-sized
    # probe batch never shuffles ANY index layout — Spark broadcasts
    # the batch into the index scan, and bucketing is moot. The lever
    # under test is the LARGE-batch regime (hourly ingest beyond the
    # broadcast threshold), emulated by disabling auto-broadcast so
    # the join plans as shuffle-on-both-sides vs shuffle-probe-only.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plain = spark.read.parquet("/tmp/probe_idx_plain")
    bucketed = spark.table("lsh_index_bucketed")
    for label, index_df in (("plain", plain), ("bucketed", bucketed)):
        joined = probe.join(index_df, ["band", "bucket"]).agg(
            F.count("*").alias("n"), F.min("sig").alias("m")
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # each ShuffleExchange prints once in the numbered tree and
        # once in the details section of the formatted plan
        results[f"probe_{label}_exchanges"] = plan.count("Exchange") // 2
        sw0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        out = joined.collect()[0][0]  # bounded-collect: 1-row agg
        cold = time.perf_counter() - t0
        results[f"probe_{label}_shuffle_mb"] = round(
            (shuffle_write_bytes(spark) - sw0) / 1e6, 1
        )
        # a second collect() on the same lineage reuses the shuffle
        # map outputs — report it separately, never as the probe cost
        t0 = time.perf_counter()
        joined.collect()
        results[f"probe_{label}_sec"] = round(cold, 2)
        results[f"probe_{label}_warm_sec"] = round(
            time.perf_counter() - t0, 2
        )
        results[f"probe_{label}_matches"] = out
    assert results["probe_plain_matches"] == results["probe_bucketed_matches"]
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
