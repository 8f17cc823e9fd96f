"""Training-shard writer: the last step of a curation pipeline —
materialize the corpus as token-bounded shards a trainer's data
loader can stream independently.

Shard assignment derives from the same two-phase exclusive prefix sum
as sequence packing (``operators/packing.py`` — range-partition,
per-partition window sums, broadcast per-partition offsets; no
single-reducer window): a document belongs to the shard its FIRST
token lands in, so documents are never split across shards and each
shard holds ~``tokens_per_shard`` tokens (± one document). The write
is ``partitionBy(shard)`` so each shard is an independent directory —
the layout data loaders shard-shuffle over.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vspace_spark.operators.packing import pack_plan


def plan_token_shards(
    docs: DataFrame,
    wc: Column,
    tokens_per_shard: int = 1_000_000,
    order_col: str = "doc_id",
    est_bytes: int | None = None,
    floor_bytes: int | None = None,
) -> DataFrame:
    """Input rows + ``shard`` (BIGINT) — exact integer arithmetic on
    the two-phase prefix sum; rows with ``wc`` <= 0 are dropped (an
    empty document occupies no shard). ``est_bytes``/``floor_bytes``
    forward to the prefix-sum persist — ``docs`` here usually carries
    the FULL row (it gets written partitioned by shard), so the wide
    512 MB floor is the right one."""
    planned = pack_plan(
        docs.withColumn("_wc", wc).filter(F.col("_wc") > 0),
        wc_col="_wc",
        order_col=order_col,
        budget=tokens_per_shard,
        est_bytes=est_bytes,
        floor_bytes=floor_bytes,
    )
    return planned.withColumnRenamed("first_seq", "shard").drop(
        "start_offset", "n_seqs"
    )


def write_token_shards(
    docs: DataFrame,
    path: str,
    wc: Column,
    tokens_per_shard: int = 1_000_000,
    order_col: str = "doc_id",
    est_bytes: int | None = None,
) -> DataFrame:
    """Write ``docs`` under ``path`` partitioned by shard and return
    the manifest (one row per shard: doc/token counts and the doc-id
    span — what a loader reads to plan epochs). The manifest is
    shard-count-sized; the corpus is written once, shuffled only by
    the ``partitionBy`` file commit (the prefix sum's range partition
    already clusters consecutive doc ids, so each task writes few
    shard directories). ``est_bytes`` sizes the prefix-sum persist
    (the planned relation carries the full document row, so it is
    corpus-sized — a None estimate heap-parks it at scale; wide
    512 MB floor)."""
    planned = plan_token_shards(
        docs, wc, tokens_per_shard, order_col, est_bytes=est_bytes
    )
    planned.write.mode("overwrite").partitionBy("shard").parquet(path)
    return (
        planned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_wc").cast("long").alias("n_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
        .orderBy("shard")
    )
