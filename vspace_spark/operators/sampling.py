"""Deterministic, content-addressed sampling for training-data
pipelines: train/test splits and downsampling that are REPRODUCIBLE
across runs, engines, and cluster sizes.

``rand(seed)``-based sampling is seed-stable only for a fixed
partitioning — repartition the input (or move engines) and membership
changes. Hashing a stable key instead gives every row a permanent
position in [0, 1): the same document lands in the same split on any
engine that computes the same digest (md5 here — portable to the
DuckDB oracle, unlike xxhash64/rand).

Scale: a pure column expression — no shuffle, no state; the filter
pushes into the scan stage and composes with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# basis points of the hash space: 32 hash bits → bucket in [0, 10000)
_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from md5 of the key (+ optional
    salt, for drawing independent samples from the same keys)."""
    c = F.col(key) if isinstance(key, str) else key
    digest = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % _BUCKETS
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided solely by
    md5(key, salt) — reproducible anywhere, stable under repartition."""
    return df.filter(hash_bucket(key, salt) < int(fraction * _BUCKETS))


def stratified_sample_to_uniform(
    df: DataFrame, key: str, group: str, size_col: str
) -> DataFrame:
    """Deterministic stratified downsampling toward a UNIFORM group
    mixture: each group's keep-rate is ``total_size / (k × group_size)``
    (the ``weight_uniform`` of ``domain_mixture_weights``, capped at 1),
    and membership is content-addressed — a row is kept iff its 20-bit
    md5 bucket falls under the group's rate. Over-represented domains
    shrink toward the per-group average; under-represented ones pass
    through whole. Same draw on any engine, any partitioning.

    The rate comparison is EXACT integer arithmetic (no float rate):
    ``bucket × k × group_size < total × 2^20``, computed in
    DECIMAL(38,0) so it cannot overflow or round at any corpus size —
    the DuckDB oracle mirrors it in HUGEINT.

    Scale: one group-sized aggregation (tiny), broadcast back onto the
    scan; the filter itself is a pure column expression — no
    data-sized shuffle anywhere."""
    s = df.groupBy(group).agg(
        F.sum(size_col).cast("long").alias("_n_grp")
    )
    t = s.agg(
        F.sum("_n_grp").cast("long").alias("_tot"),
        F.count("*").cast("long").alias("_k"),
    )
    rates = s.crossJoin(F.broadcast(t))
    bucket = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 5), 16, 10
    ).cast("bigint")

    def d(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    return (
        df.join(F.broadcast(rates), group)
        .filter(
            d(bucket) * d(F.col("_k")) * d(F.col("_n_grp"))
            < d(F.col("_tot")) * d(F.lit(1 << 20))
        )
        .drop("_n_grp", "_tot", "_k")
    )


def train_test_split_col(
    key: Column | str,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "",
) -> Column:
    """Split label ('train' | 'val' | 'test') from the hash bucket —
    disjoint, exhaustive, and stable: adding documents never moves an
    existing one between splits."""
    b = hash_bucket(key, salt)
    t_hi = int(train * _BUCKETS)
    v_hi = t_hi + int(val * _BUCKETS)
    return (
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test")
    )


def temperature_sample(
    df: DataFrame, key: str, group: str, size_col: str
) -> DataFrame:
    """Deterministic temperature resampling (τ = 1/2) of a grouped
    corpus: post-sample group mass becomes ∝ sqrt(original mass), the
    standard flattening used to up-weight small domains in training
    mixtures (uniform mixture is the τ→0 limit,
    ``stratified_sample_to_uniform``).

    Keep-rate per group is ``sqrt(W_min / W_g)`` (the smallest group
    passes through whole; larger groups shrink sqrt-proportionally),
    and membership is content-addressed off a 20-bit md5 bucket.
    The sqrt NEVER materializes: ``b / 2²⁰ < sqrt(W_min/W_g)`` is
    squared into ``b² · W_g < W_min · 2⁴⁰`` — exact integer
    arithmetic in DECIMAL(38,0) (oracle: HUGEINT), so membership is
    bit-stable across engines at any corpus size (b² ≤ 2⁴⁰ times a
    100 TB token count stays < 10²⁶ ≪ 10³⁸).

    Scale: one group-sized aggregation broadcast onto the scan; the
    keep filter is a pure column expression — nothing data-sized
    shuffles."""
    s = df.groupBy(group).agg(
        F.sum(size_col).cast("long").alias("_w_grp")
    )
    t = s.agg(F.min("_w_grp").cast("long").alias("_w_min"))
    rates = s.crossJoin(F.broadcast(t))
    bucket = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 5), 16, 10
    ).cast("bigint")

    def d(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    return (
        df.join(F.broadcast(rates), group)
        .filter(
            d(bucket) * d(bucket) * d(F.col("_w_grp"))
            < d(F.col("_w_min")) * F.lit(1 << 40).cast("decimal(38,0)")
        )
        .drop("_w_grp", "_w_min")
    )
