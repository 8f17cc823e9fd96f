"""Sinks — reference parity (CSV/text) plus parquet-native defaults.

The reference wrote tab-CSV and text only (reference:
vspace/pipelines/base.py:356-358, 394, 425-427, 435-437). The rebuild
defaults to parquet (columnar, splittable, stats for pushdown) and keeps
CSV writers for compat. Partitioned writes use Hive-style directory
partitioning exactly like the reference's per-source stats sink (K3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame, path: str, sep: str = "\t", partition_by: list[str] | None = None
) -> None:
    """K1/K3/K4 — tab-CSV, overwrite, no header; optional Hive-style
    directory partitioning (reference: vspace/pipelines/base.py:425-427)."""
    writer = df.write.mode("overwrite").option("sep", sep)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Parquet-native sink; partition columns become directory keys so
    downstream scans get partition pruning."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_text(df: DataFrame, path: str) -> None:
    """K2 — normalized-corpus text sink
    (reference: vspace/pipelines/base.py:394). Expects a single string
    column named ``value``."""
    df.write.mode("overwrite").text(path)
