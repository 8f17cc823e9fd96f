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


def keyed_tmp_dir(prefix: str, sf_dir: str) -> str:
    """Fixed OVERWRITTEN temp directory keyed by corpus identity — the
    leak-free form for queries that materialize fixtures/exports
    (ADVICE r3/r4: a fresh mkdtemp/uuid dir per call accumulated
    corpus-sized directories across every bench/correctness run).
    Key = sf basename (human-readable) + md5(abspath)[:8] (two corpora
    sharing a basename, or concurrent sessions on different sf dirs,
    never collide). Repeated runs on the same corpus reuse ONE dir;
    callers must write with overwrite semantics, never append.

    HAZARD (ADVICE r5): two CONCURRENT processes over the SAME sf dir
    share the dir and clobber each other's staged fixtures mid-read —
    the deliberate trade for leak-freedom under the single-runner
    harness (the old per-call uuid dirs isolated them but accumulated
    corpus-sized litter). Multi-process callers set
    ``SPARK_GRAFT_CONCURRENT=1`` to mix a per-process token into the
    key, restoring isolation at the cost of per-process dirs (cleaned
    only by /tmp policy)."""
    import hashlib
    import os
    import tempfile

    pid_part = (
        f"_p{os.getpid()}"
        if os.environ.get("SPARK_GRAFT_CONCURRENT") == "1"
        else ""
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{os.path.basename(os.path.normpath(sf_dir))}_"
        f"{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}"
        f"{pid_part}",
    )
    os.makedirs(path, exist_ok=True)
    return path


def write_single_text_file(df: DataFrame, path: str) -> None:
    """Write a one-column (``value``) DataFrame as ONE plain text file
    at ``path``, preserving the DataFrame's partition-0 row order.

    For fixtures/exports whose consumers need a bare file (not a
    part-file directory) with deterministic line order — e.g. the
    sentinel-delimited corpus whose record POSITION is the document id.
    The caller repartition(1)+sortWithinPartitions first; data streams
    through one executor task (bounded by one partition's worth of
    work, fine at fixture scale), never through driver memory — unlike
    a ``collect()`` loop. The driver side only renames the part file.
    """
    import glob
    import os
    import shutil

    tmp = path + ".spark-tmp"
    df.write.mode("overwrite").text(tmp)
    parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
    if len(parts) != 1:
        raise ValueError(
            f"expected exactly one part file (repartition(1) upstream), "
            f"got {len(parts)} in {tmp}"
        )
    os.replace(parts[0], path)
    shutil.rmtree(tmp, ignore_errors=True)
