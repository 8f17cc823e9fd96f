"""Reference-parity sources, re-expressed as DataFrame scans.

The reference read everything through RDDs (Hadoop TextInputFormat with
a custom record delimiter, binary scans with per-line Python decode —
reference: vspace/pipelines/base.py:56-73, 253-266). Here every source
is a DataFrame scan so Catalyst can prune/push down, with one sanctioned
escape hatch for the oversized record delimiter (S1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Sentinel between corpus documents (reference: vspace/pipelines/base.py:36).
RECORD_DELIMITER = ("nferstopword " * 15).strip()

# Fixed 10-column index schema (reference: vspace/pipelines/base.py:38-51).
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("document_index", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("subsource", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("meta1", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("meta2", T.StringType()),
        T.StructField("meta3", T.StringType()),
        T.StructField("meta4", T.StringType()),
    ]
)


def load_raw_corpus(
    spark: SparkSession, path: str, record_delimiter: str = RECORD_DELIMITER
) -> DataFrame:
    """S1 — corpus scan with a custom record delimiter.

    Returns ``[document_index: bigint, text: string]``.

    Spark's text source caps ``lineSep`` at 128 bytes and the sentinel is
    239 bytes, so we read line-wise (splittable, scales with file size),
    re-split on the sentinel inside each line, and explode. Documents are
    numbered with a deterministic global order: ``zipWithIndex`` over the
    line RDD is the reference's approach
    (reference: vspace/pipelines/base.py:56-73); we avoid the RDD and use
    a window-free two-level id: stable within Spark's input order is not
    guaranteed across scans, so callers needing stable ids should persist
    the numbered corpus once (the pipeline does).
    """
    lines = spark.read.text(path)
    docs = lines.select(
        F.posexplode(F.split(F.col("value"), F.lit(record_delimiter))).alias(
            "pos", "text"
        )
    )
    docs = docs.select(F.trim("text").alias("text")).filter(F.length("text") > 0)
    return docs.select(
        F.monotonically_increasing_id().alias("document_index"), "text"
    )


def load_index(
    spark: SparkSession, path: str, delimiter: str = "\t"
) -> DataFrame:
    """S2 — TSV metadata scan, explicit schema, no inference
    (reference: vspace/pipelines/base.py:76-91)."""
    return spark.read.csv(path, sep=delimiter, schema=INDEX_SCHEMA, header=False)


def load_sources(
    spark: SparkSession, path: str, delimiter: str = " "
) -> DataFrame:
    """S3 — source→subsources mapping.

    Input rows are ``source<delim>sub1,sub2,...``; output is
    ``[subsource: string, sources: array<string>]`` via
    split → explode → collect_list
    (reference: vspace/pipelines/base.py:94-118). ``sort_array`` makes
    the array deterministic (collect_list order is not).
    """
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("subsources", T.StringType()),
        ]
    )
    raw = spark.read.csv(path, sep=delimiter, schema=schema, header=False)
    exploded = raw.select(
        "source", F.explode(F.split("subsources", ",")).alias("subsource")
    )
    return exploded.groupBy("subsource").agg(
        F.sort_array(F.collect_list("source")).alias("sources")
    )


def sources_from_pairs(pairs: DataFrame) -> DataFrame:
    """S3 (table form) — same mapping from a ``[source, subsource]`` DF."""
    return pairs.groupBy("subsource").agg(
        F.sort_array(F.collect_list("source")).alias("sources")
    )


def load_and_decode(spark: SparkSession, path: str) -> DataFrame:
    """S4 — lenient text scan.

    The reference decoded bytes per-line in Python, silently dropping
    undecodable lines and stripping ``\\x00``/``\\x01``/tab
    (reference: vspace/pipelines/base.py:234-266). Spark 3's text source
    already replaces malformed UTF-8, so only the strip remains — one
    JVM-side ``regexp_replace``, no Python.
    """
    return spark.read.text(path).select(
        F.regexp_replace("value", "[\\x00\\x01\\t]", "").alias("line")
    )


def load_phrases(spark: SparkSession, path: str) -> DataFrame:
    """S5 — phrase vocabulary: first space-separated field, ``_``→space
    (reference: vspace/pipelines/base.py:278-289)."""
    return load_and_decode(spark, path).select(
        F.translate(F.split("line", " ").getItem(0), "_", " ").alias("token")
    )


def load_collections(spark: SparkSession, path: str) -> DataFrame:
    """S6 — collection vocabulary: whole line, ``_``→space
    (reference: vspace/pipelines/base.py:292-303)."""
    return load_and_decode(spark, path).select(
        F.translate("line", "_", " ").alias("token")
    )
