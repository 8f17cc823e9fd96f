"""Deterministic global ordering without a global-sort bottleneck.

Trainer pipelines need a REPRODUCIBLE total order over the corpus —
the epoch shuffle that decides which documents co-occur in a batch.
``orderBy(rand(seed))`` is partitioning-dependent and a bare
``row_number() OVER (ORDER BY ...)`` funnels the whole corpus through
one reducer (the scale-killer the vocabulary pipeline also avoids,
operators/stats.py:build_vocabulary). This module does it the
scale-safe way:

1. order key = md5 of a salted stable id — content-addressed, so the
   order is identical on any engine/partitioning, and a different
   salt ("epoch") draws an independent permutation;
2. ``repartitionByRange`` on the key gives a cross-partition global
   order (hash keys are uniform, so ranges are balanced with no
   sampling skew); ``row_number`` windows BY PARTITION, in parallel;
3. one count per partition rolls into broadcast offsets — the
   DataFrame analog of ``zipWithIndex``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_global_positions(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "position",
    est_bytes: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 0-based global rank under ``ORDER BY
    order_cols``, identical to a global ``row_number() - 1`` but with
    no single-partition window: range-repartition on the order key,
    number locally per partition, then shift by broadcast cumulative
    offsets (one count row per partition). The numbering pass is
    persisted so partition ids stay stable between the count and the
    final join — level by the shared policy at the SLIM floor (the
    numbered relation is usually an (id, order-key) projection;
    ``est_bytes`` is the caller's size estimate of ``df`` — callers
    on corpus-sized inputs must pass one or the persist silently
    falls back heap-resident, the r12 keep_best hazard)."""
    from vspace_spark.operators.scale import (
        _SLIM_DISK_FLOOR,
        persist_shared,
    )

    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = persist_shared(
        part.withColumn("_rn", F.row_number().over(w)),
        est_bytes,
        floor_bytes=_SLIM_DISK_FLOOR,
    )
    # bounded-collect: one row per partition (two-phase numbering)
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_cnt"]
    off_df = local.sparkSession.createDataFrame(
        offsets, schema="_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col, (F.col("_rn") - 1 + F.col("_off")).cast("long")
        )
        .drop("_pid", "_rn", "_off")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    epoch: int = 0,
    out_col: str = "position",
    est_bytes: int | None = None,
) -> DataFrame:
    """Deterministic training-epoch shuffle: global position under
    ``ORDER BY md5('order:<epoch>:' || key), key``. Content-addressed
    (same corpus → same order anywhere), epoch-salted (each epoch is
    an independent permutation), and scale-safe via
    :func:`assign_global_positions` (``est_bytes`` forwarded to its
    numbering persist — the md5 key adds ~32 B/row to ``df``'s
    width)."""
    keyed = df.withColumn(
        "_h",
        F.md5(
            F.concat(
                F.lit(f"order:{epoch}:"), F.col(key).cast("string")
            )
        ),
    )
    return assign_global_positions(
        keyed, ["_h", key], out_col, est_bytes=est_bytes
    ).drop("_h")


def _ntile_bucket(n: int, k: int) -> F.Column:
    """The exact SQL-standard ntile bucket of a 0-based global rank
    ``_ntpos`` in integer arithmetic — the first ``n mod k`` buckets
    take ``ceil(n/k)`` rows, the rest ``floor(n/k)``."""
    q, rem = divmod(n, k)
    big, small, cut = q + 1, max(q, 1), rem * (q + 1)
    r = F.col("_ntpos") + 1  # 1-based rank
    return (
        F.when(r <= cut, F.expr(f"(_ntpos + {big}) div {big}"))
        .otherwise(rem + F.expr(f"(_ntpos - {cut} + {small}) div {small}"))
        .cast("int")
    )


def ntile_scalable(
    df: DataFrame,
    k: int,
    order_cols: list[str],
    out_col: str,
    est_bytes: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order_cols)`` without the
    single-partition global window: two-phase global numbering
    (:func:`assign_global_positions`), then the exact ntile bucket
    formula (:func:`_ntile_bucket`), identical to the SQL-standard
    definition on every engine. ``order_cols`` must be a total order
    (include a unique tie-break) or bucket boundaries are
    nondeterministic. ``est_bytes`` = caller's size estimate of
    ``df``, forwarded to the numbering persist."""
    pos = assign_global_positions(
        df, order_cols, "_ntpos", est_bytes=est_bytes
    )
    n = pos.count()  # bounded-collect: one scalar
    return pos.withColumn(out_col, _ntile_bucket(n, k)).drop("_ntpos")


def ntile_scalable_multi(
    df: DataFrame,
    k: int,
    specs: list[tuple[list[str], str]],
    id_col: str,
    est_bytes: int | None = None,
) -> DataFrame:
    """Several ``ntile(k)`` assignments over DIFFERENT orderings of
    the SAME relation, fused (VERDICT r11 #7): chaining
    :func:`ntile_scalable` per dimension recomputes the row count
    per pass and drags the progressively wider row through every
    range shuffle. Here the input is persisted and counted ONCE,
    each dimension numbers a SLIM (id + order-key) projection, and
    the quartile columns join back on ``id_col`` — the joins hash on
    one shared key, so AQE reuses the base exchange across them.
    ``id_col`` must be unique per row and each spec's order_cols a
    total order, or assignments are nondeterministic. ``est_bytes``
    = caller's size estimate of ``df``, applied to the shared base
    persist AND each dimension's slim numbering persist (an upper
    bound there — the slim projection is narrower than the base)."""
    from vspace_spark.operators.scale import persist_shared

    base = persist_shared(df, est_bytes)
    n = base.count()  # bounded-collect: one scalar, shared by all dims
    out = base
    for order_cols, out_col in specs:
        slim = base.select(
            *dict.fromkeys([id_col, *order_cols])  # dedup, keep order
        )
        pos = assign_global_positions(
            slim, order_cols, "_ntpos", est_bytes=est_bytes
        )
        res = pos.select(
            id_col, _ntile_bucket(n, k).alias(out_col)
        )
        out = out.join(res, id_col)
    return out
