"""Lakehouse/external connectors — gated behind import/classpath
probes (the jars are not in this container; SURVEY-level parity needs
the engine to EXPOSE the surface and fail with a clear action, not at
a random depth of a Py4J stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """Raised when a connector's jars/packages are not on the
    classpath; message says exactly what to add."""


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake scan (time travel/MERGE live upstream of this call).
    Requires ``io.delta:delta-spark`` on the classpath."""
    if not _has_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta Lake jars missing - launch with "
            "--packages io.delta:delta-spark_2.13:<version> and set "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table scan. Requires ``org.apache.iceberg`` runtime."""
    if not _has_class(
        spark, "org.apache.iceberg.spark.source.SparkTable"
    ):
        raise ConnectorUnavailable(
            "Iceberg runtime missing - launch with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-<spark>_2.13:<version>"
        )
    return spark.read.format("iceberg").load(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan with explicit partitioning (without it a JDBC read is
    ONE task — the classic accidental single-thread scan). The driver
    jar for the target database must be on the classpath."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need lower_bound/upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
