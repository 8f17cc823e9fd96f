"""Loaders for the driver-generated parquet test tables (TESTDATA.md).

Parquet scans get column pruning + predicate pushdown from Catalyst for
free — downstream operators therefore select narrowly and filter early
so the scan itself shrinks (visible as ``PushedFilters``/``ReadSchema``
in ``df.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# fixes region=5 / nation=25 rows; the others grow with SF).
BROADCASTABLE = frozenset({"region", "nation"})


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); normalize to a
    microsecond TIMESTAMP (LTZ) whose epoch equals the naive value
    read as UTC — matching the DuckDB oracle's ``CAST(ts AS
    TIMESTAMP)`` under the engine's UTC session.

    Spark ≥4.1 reads NANOS natively as TIMESTAMP_NTZ; streaming event
    time (watermarks) REQUIRES plain TIMESTAMP, so convert via
    ``timestamp_diff`` from the NTZ epoch → epoch µs →
    ``timestamp_micros`` — every step timezone-independent (verified:
    identical under UTC and Asia/Kolkata sessions), unlike a direct
    NTZ→LTZ cast or ``to_utc_timestamp``, which both consult the
    session timezone. Older Spark cannot read NANOS; there
    ``nanosAsLong`` yields raw int64 nanos, floored to µs with
    INTEGRAL division (double division would round-to-nearest where
    the oracle's cast truncates).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        epoch_us = F.timestamp_diff(
            "MICROSECOND",
            F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
            F.col("ts"),
        )
        return df.withColumn("ts", F.timestamp_micros(epoch_us))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # harmless no-op on Spark ≥4.1 (native NANOS read); enables the
        # raw-nanos fallback on older versions
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
