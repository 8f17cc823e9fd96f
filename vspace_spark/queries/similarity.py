"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.similarity import brute_force_topk, lsh_topk
from vspace_spark.queries import query

_COS = """
list_sum(list_transform(range(1, len({a}) + 1),
         i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
/ (sqrt(list_sum(list_transform({a}, v -> v::DOUBLE * v::DOUBLE)))
   * sqrt(list_sum(list_transform({b}, v -> v::DOUBLE * v::DOUBLE))))
"""


@query(
    "ann_bruteforce_top5",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {_COS.format(a="q.embedding", b="e.embedding")} AS cos
  FROM embeddings e, q
  WHERE e.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         (row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT
             AS rank
  FROM scored
) WHERE rank <= 5
""",
)
def ann_bruteforce_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors: broadcast queries ×
    linear corpus scan, window rank (operators/similarity.py). The
    correctness baseline for every ANN variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@query(
    "ann_lsh_top5",
    oracle=f"""
WITH p AS (
  SELECT b.b AS bit,
         list_transform(range(0, 64),
           i -> ('0x' || substr(md5(b.b::VARCHAR || ':' || i::VARCHAR),
                 1, 13))::BIGINT / 2251799813685248.0 - 1) AS plane
  FROM (SELECT unnest(range(32)) AS b) b
),
sigs AS (
  SELECT e.vec_id, p.bit // 4 AS tbl,
         sum(CASE WHEN list_sum(list_transform(
                    range(1, len(e.embedding) + 1),
                    i -> e.embedding[i]::DOUBLE * p.plane[i])) > 0
             THEN 1 << (p.bit % 4) ELSE 0 END)::BIGINT AS bucket
  FROM embeddings e CROSS JOIN p
  GROUP BY e.vec_id, p.bit // 4
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_COS.format(a="qe.embedding", b="ce.embedding")} AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         (row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT
             AS rank
  FROM scored
) WHERE rank <= 5
""",
)
def ann_lsh_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via OR-amplified random-hyperplane LSH
    (8 tables × 4 bits) — the scale path: each query scores only its
    buckets (~8·N/16). PORTABLE md5-derived hyperplanes (exact in
    IEEE double on every engine) put bucket assignment, candidate
    set, and ranking all under the DuckDB oracle gate; the xxhash64
    plane table remains as ``ann_lsh_top5_fast``. Recall vs brute
    force asserted in tests/test_similarity.py."""
    from vspace_spark.operators.similarity import portable_hyperplanes

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        spark,
        k=5,
        bits=4,
        tables=8,
        planes=portable_hyperplanes(64, 32),
    )


@query(
    "embedding_norms",
    oracle="""
SELECT vec_id, label,
       round(sqrt(list_sum(list_transform(embedding,
             v -> v::DOUBLE * v::DOUBLE))), 6) AS l2_norm
FROM embeddings
""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array math shape check: per-vector L2 norm
    (functions/vectors.py — zip_with/aggregate fold, bit-exact vs the
    oracle's list_sum fold)."""
    from vspace_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.round(l2_norm(F.col("embedding")), 6).alias("l2_norm")
    )


@query("ann_ivf_top5")  # k-means centroids — engine-specific, rows-only
def ann_ivf_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: trained k-means cells (16, hierarchical-Lloyd trainer —
    operators/dedup.py:hierarchical_codebook) with 4-cell probing — the
    vector-DB index structure relationally
    (operators/similarity.py:ivf_topk). Recall vs brute force asserted
    in tests/test_similarity.py."""
    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@query("ml_tfidf_features")  # hashed feature vectors — engine-specific
def ml_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-ML HashingTF + IDF over the corpus (SURVEY.md §2.12 parity
    hook): the ML-pipeline route to the same TF-IDF statistics the
    engine computes exactly via term_stats. Rows-only (hashed vector
    contents are engine-specific); tests/test_similarity.py checks IDF
    agreement against the exact document frequencies."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokenized = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    tf = HashingTF(
        inputCol="words", outputCol="rawFeatures", numFeatures=4096
    ).transform(tokenized)
    idf_model = IDF(inputCol="rawFeatures", outputCol="features").fit(tf)
    out = idf_model.transform(tf)
    return out.select(
        "doc_id",
        F.expr("size(words)").alias("n_words"),
    )
