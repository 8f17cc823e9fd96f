"""tfidf_top3_per_doc persist-strategy A/B at scale (PERF.md round 8,
VERDICT r7 #2).

Two plans for the twice-consumed exploded corpus:

- perdoc: persist the token-exploded relation (O(corpus tokens) —
  tens of GB decompressed at 100×; the r7 plan, and the most
  plausible mechanism for the driver-recorded 299 s outlier)
- df:     persist only the token→df aggregate (vocabulary-sized) and
  tokenize twice — explode + hash-agg is cheap JVM work, and the
  aggregate is the relation the scoring join actually needs

Run each variant in its OWN process (fresh JVM) so persist/GC state
from one cannot bleed into the other; the page cache is warmed
untimed first, matching bench.py's 100× protocol.

Usage:
  python scripts/tfidf_persist_bench.py --variant {perdoc,df} \
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
from pyspark.sql.window import Window


def build(spark, sf_dir: str, variant: str):
    from vspace_spark.io.tables import load_table
    from vspace_spark.operators.stats import tokenized_documents

    docs = load_table(spark, sf_dir, "documents")
    perdoc = tokenized_documents(docs)
    if variant == "perdoc":
        perdoc = perdoc.persist(StorageLevel.MEMORY_AND_DISK)
        df = perdoc.groupBy("token").agg(F.count("*").alias("df"))
    else:
        df = (
            perdoc.groupBy("token")
            .agg(F.count("*").alias("df"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    n_docs = docs.count()
    scored = perdoc.join(df, "token").select(
        "doc_id",
        "token",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "rank")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["perdoc", "df"], required=True)
    ap.add_argument("--dir", default="/tmp/bench_scaled_sf0.1_x100")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _warm_page_cache
    from vspace_spark.session import get_spark

    spark = get_spark(f"tfidf-persist-{args.variant}")
    spark.range(1000).count()
    _warm_page_cache(args.dir)
    for rep in range(args.reps):
        t0 = time.perf_counter()
        n = build(spark, args.dir, args.variant).count()
        dt = time.perf_counter() - t0
        load = os.getloadavg()[0]
        print(
            f"variant={args.variant} rep={rep} sec={dt:.1f} rows={n}"
            f" load_1m={load:.1f}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
