"""Sequence packing for LLM pretraining: the concat-then-chunk plan.

Pretraining pipelines concatenate every document's tokens in a fixed
order and slice the stream into ``budget``-sized training sequences
(GPT-style packing). The *plan* for that is pure arithmetic on an
exclusive prefix sum of per-document token counts: a document starting
at global token offset ``s`` occupies sequences ``s // B`` through
``(s + wc - 1) // B``.

The prefix sum is the scale hazard: a bare ``Window.orderBy`` computes
it in ONE task (the vocabulary-id lesson, VERDICT r1). This module uses
the same two-phase shape as ``operators.stats.build_vocabulary``:
range-partition on the order key, per-partition running sums in
parallel, then a driver-side roll-up of per-partition totals (one row
per partition) broadcast back as offsets — the DataFrame analog of
``zipWithIndex``'s two passes. No task ever holds more than one range
partition of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_plan(
    df: DataFrame,
    wc_col: str = "wc",
    order_col: str = "doc_id",
    budget: int = 512,
    est_bytes: int | None = None,
    floor_bytes: int | None = None,
) -> DataFrame:
    """Packing plan: one row per input row with its global token
    ``start_offset`` (exclusive prefix sum of ``wc_col`` in
    ``order_col`` order), ``first_seq`` (the training sequence its
    first token lands in), and ``n_seqs`` (how many sequences it
    spans — >1 when a document crosses a chunk boundary).

    Rows with ``wc_col`` <= 0 must be filtered by the caller (an empty
    document occupies no sequence). ``budget`` is the trainer's
    sequence length (512 here for test visibility; 2k-8k in practice).
    Integral ``div`` keeps every output column exact BIGINT arithmetic.

    ``est_bytes`` = caller's size estimate of ``df`` for the prefix-sum
    persist's level (None falls back heap-resident). ``floor_bytes``
    defaults to the SLIM floor — right when ``df`` is the usual
    (id, wc) projection; callers passing a WIDE row (e.g. the full
    text for a partitioned shard write) should pass the default
    512 MB floor instead, the shape-split the r12 A/B measured
    (+38% for a wide relation pushed to disk early).
    """
    from vspace_spark.operators.scale import (
        _SLIM_DISK_FLOOR,
        persist_shared,
    )

    part = df.repartitionByRange(order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if floor_bytes is None:
        floor_bytes = _SLIM_DISK_FLOOR
    local = persist_shared(
        part.withColumn("_cum", F.sum(wc_col).over(w).cast("long")),
        est_bytes,
        floor_bytes=floor_bytes,
    )
    counts = (
        local.groupBy("_pid")
        .agg(F.sum(wc_col).alias("_tot"))
        .collect()  # bounded-collect: one row per partition (prefix sum)
    )
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_tot"]
    off_df = local.sparkSession.createDataFrame(
        offsets, schema="_pid int, _off long"
    )
    start: Column = F.col("_cum") - F.col(wc_col) + F.col("_off")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("start_offset", start)
        .withColumn(
            "first_seq", F.expr(f"start_offset div {int(budget)}")
        )
        .withColumn(
            "n_seqs",
            F.expr(
                f"(start_offset + {wc_col} - 1) div {int(budget)}"
            )
            - F.col("first_seq")
            + F.lit(1).cast("long"),
        )
        .drop("_pid", "_cum", "_off")
    )
    return out
