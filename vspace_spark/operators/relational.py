"""General relational operators the reference lacks (SURVEY.md §2.12).

All compositions of built-in DataFrame ops — no custom Catalyst work.
Each helper is DataFrame-in/DataFrame-out and shuffle-conscious:
the as-of join is ONE shuffle (union + window over the key), not a
per-row correlated probe; sessionization is one window pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tie_break: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), per ``on`` key.

    Spark has no native as-of join; the scalable shape is the union
    trick — tag both sides, ONE shuffle on the key, and a running
    ``last(..., ignorenulls)`` window. Equivalent to a per-key
    ``merge_asof`` but distributed: no driver collect, no cross join,
    skew handled by AQE. Right rows at identical timestamps are resolved
    by ``tie_break`` ascending (the largest wins), deterministically.

    Returns the left rows plus ``right_cols`` (nullable — null when no
    prior right row exists).
    """
    lcols = left.columns
    tb = tie_break or right_ts
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right sorts AFTER left at equal ts when strict
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
        F.col(tb).alias("_tb"),
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0 if strict else 2).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_left"),
    )
    unioned = tagged_l.unionByName(
        tagged_r.withColumn("_left", F.lit(None).cast(tagged_l.schema["_left"].dataType)),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).filter(F.col("_left").isNotNull())
    out = matched.select(
        *[F.col(f"_left.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )
    return out


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tie: str | None = None,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``.

    One shuffle (window by key); session ids are per-key ordinals so
    they're deterministic and join-stable. The streaming twin is
    ``F.session_window`` (streaming/events.py).
    """
    order = [F.col(ts)] + ([F.col(order_tie)] if order_tie else [])
    w = Window.partitionBy(key).orderBy(*order)
    # microsecond-exact gap via timestamp_diff: matches the oracle's
    # date_diff('microsecond', ...) semantics bit-for-bit, and works on
    # both TIMESTAMP and TIMESTAMP_NTZ (Spark ≥4.1 reads the NANOS
    # events column as NTZ, which no longer casts to bigint)
    gap_us = F.timestamp_diff("MICROSECOND", F.lag(F.col(ts)).over(w), F.col(ts))
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic top-k per group via row_number (callers include a
    unique tie-break column in ``order``)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def dec(col: Column | str, scale: int = 4) -> Column:
    """Money-exact operand: cast to decimal so SUMs are exact and the
    DuckDB oracle hashes identically (see queries/__init__ float
    discipline)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def money(col: Column, digits: int = 2) -> Column:
    """Final presentation of an exact decimal aggregate as double."""
    return F.round(col, digits).cast("double")
