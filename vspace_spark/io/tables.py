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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
        # natively; read the raw int64 nanos and floor to microseconds.
        # The DuckDB oracle mirrors this with CAST(ts AS TIMESTAMP),
        # which also truncates ns → µs.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integral division — double division would round-to-nearest
        # where the oracle's ns→µs cast truncates
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
