"""Table maintenance: small-file compaction.

Streaming ingest (foreachBatch parquet appends, the growing dedup
index) and fine-grained partitionBy writes accumulate small files;
at warehouse scale a table of 4 KB part-files makes every scan pay
per-file open/footer costs and starves the scheduler with
sliver-tasks. Compaction is the standing fix: rewrite a directory to
~``target_mb`` files, optionally re-sorted so range predicates prune
file-level statistics after the rewrite (the OPTIMIZE / rewriteData
operation of Delta/Iceberg, expressed as a plain Spark job).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path``, ignoring _SUCCESS/
    metadata droppings."""
    n, total = 0, 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            n += 1
            total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 256,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_mb`` per output file; returns before/after file counts
    and bytes. With ``sort_cols``, rows are range-repartitioned and
    sorted within files so min/max footer statistics become selective
    again (scan-level pruning on those columns after compaction).

    The file-count decision reads only directory metadata on the
    driver (no data pass); the rewrite itself is the unavoidable one
    read + one write. On a real warehouse this runs per-partition on
    the partitions a freshness policy marks cold."""
    n_before, bytes_total = _dir_stats(src)
    n_out = max(1, -(-bytes_total // (target_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    n_after, bytes_after = _dir_stats(dst)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_total,
        "bytes_after": bytes_after,
    }
