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
    spark: SparkSession,
    path: str,
    record_delimiter: str = RECORD_DELIMITER,
    hadoop_conf: dict[str, str] | None = None,
) -> DataFrame:
    """S1 — corpus scan with the sentinel as the Hadoop record delimiter.

    Returns ``[document_index: bigint, text: string]`` with POSITIONAL
    ids: document i in file order gets index i, exactly aligning with
    the index2doc TSV's ``document_index`` column that ``run_job``
    inner-joins on.

    This is the faithful compat path and the repo's ONE sanctioned RDD
    touchpoint (SURVEY.md §7): Spark's DataFrame text source caps
    ``lineSep`` at 128 bytes while the sentinel is 239 bytes, and
    documents may span newlines, so splitting lines on the sentinel
    fragments multi-line documents (the round-1 bug). Hadoop
    ``TextInputFormat`` with ``textinputformat.record.delimiter`` splits
    records in the JVM regardless of newlines — files stay splittable,
    records are reassembled across input-split boundaries — and
    ``zipWithIndex`` assigns the positional ids
    (reference: vspace/pipelines/base.py:56-73). ``zipWithIndex``
    triggers one extra job to count per-partition records, the same
    cost the reference paid. Record text is kept verbatim (no trim, no
    empty-record filter) so ids stay aligned even for empty documents.
    """
    conf = {"textinputformat.record.delimiter": record_delimiter}
    if hadoop_conf:
        # e.g. mapreduce.input.fileinputformat.split.maxsize — tests
        # force multiple input splits to exercise cross-split record
        # reassembly; production tunes scan parallelism the same way
        conf.update(hadoop_conf)
    raw = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    )
    numbered = raw.values().zipWithIndex().map(lambda kv: (kv[1], kv[0]))
    return spark.createDataFrame(
        numbered, schema="document_index long, text string"
    )


def load_raw_corpus_lines(
    spark: SparkSession, path: str, record_delimiter: str = RECORD_DELIMITER
) -> DataFrame:
    """S1 fast path — pure-DataFrame sentinel split, for corpora known
    to keep each document on a single line.

    Reads line-wise and splits each line on the sentinel. LIMITATIONS
    (why ``load_raw_corpus`` is the default): a document containing a
    newline fragments into multiple rows, empty documents are dropped,
    and ``monotonically_increasing_id`` is NOT positional (ids jump at
    partition boundaries) — do not join these ids against index2doc.
    Use for ad-hoc scans where ids only need to be distinct.
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
        # bounded-list: one entry per parent source (dimension-sized)
        F.sort_array(F.collect_list("source")).alias("sources")
    )


def sources_from_pairs(pairs: DataFrame) -> DataFrame:
    """S3 (table form) — same mapping from a ``[source, subsource]`` DF."""
    return pairs.groupBy("subsource").agg(
        # bounded-list: one entry per parent source (dimension-sized)
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
