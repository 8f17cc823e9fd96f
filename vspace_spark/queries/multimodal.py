"""Multimodal queries: binary-column pipelines whose (stubbed,
deterministic) decode is mirrored exactly by the oracle — so the Arrow
batch plumbing itself is under the correctness gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.multimodal import (
    audio_chunk_plan,
    decode_image_meta,
    extract_features_fake,
    resize_plan,
    sample_frames,
    with_binary_payload,
)
from vspace_spark.queries import query


@query(
    "multimodal_image_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))::INT AS n_bytes,
       (64 + octet_length(encode(text)) % 512)::INT AS width,
       (64 + (7 * octet_length(encode(text))) % 512)::INT AS height,
       'RGB' AS mode
FROM documents
""",
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → image metadata through mapInPandas (Arrow batches);
    decode stubbed deterministically (operators/multimodal.py)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_image_meta(docs)


@query(
    "multimodal_resize_plan",
    oracle="""
WITH m AS (
  SELECT doc_id,
         (64 + octet_length(encode(text)) % 512) AS width,
         (64 + (7 * octet_length(encode(text))) % 512) AS height
  FROM documents
),
s AS (
  SELECT *, least(floor(224000000.0 / width),
                  floor(224000000.0 / height),
                  1000000) AS ppm
  FROM m
)
SELECT doc_id, width::INT AS width, height::INT AS height,
       floor(width * ppm / 1000000.0)::INT AS out_w,
       floor(height * ppm / 1000000.0)::INT AS out_h,
       (width > 224 OR height > 224) AS needs_resize
FROM s
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over decoded metadata —
    fixed-point integer arithmetic so the oracle mirrors it exactly;
    the pixel resample itself stays in the (stubbed) decode worker
    (operators/multimodal.py:resize_plan)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return resize_plan(docs)


@query(
    "multimodal_audio_chunks",
    oracle="""
WITH a AS (
  SELECT doc_id, octet_length(encode(text)) * 4 AS duration_ms
  FROM documents
),
c AS (
  SELECT doc_id, duration_ms,
         ceil(duration_ms / 30000.0)::INT AS n_chunks
  FROM a
)
SELECT doc_id, duration_ms,
       unnest(range(n_chunks))::INT AS chunk_idx,
       (unnest(range(n_chunks)) * 30000)::BIGINT AS start_ms,
       least(duration_ms, unnest(range(n_chunks)) * 30000 + 30000)::BIGINT
           AS end_ms
FROM c WHERE n_chunks > 0
""",
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plan (fixed 30 s windows from fake-decoded
    duration) — JVM-side explode(sequence) fan-out, no Python
    (operators/multimodal.py:audio_chunk_plan)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return audio_chunk_plan(docs)


@query(
    "multimodal_features",
    oracle="""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
i AS (SELECT doc_id, hx, unnest(range(8))::INT AS feature_idx FROM h)
SELECT doc_id, feature_idx,
       ((strpos('0123456789abcdef',
                substr(hx, feature_idx * 2 + 1, 1)) - 1) * 16
        + strpos('0123456789abcdef',
                 substr(hx, feature_idx * 2 + 2, 1)) - 1)::INT
           AS feature_byte
FROM i
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-inference batch shape with a deterministic fake model
    (md5-derived float32 vectors, operators/multimodal.py:
    extract_features_fake — the REAL Arrow mapInPandas inference
    plumbing). The raw ``array<float>`` column crashed the driver's
    hash comparator in r3 ("unhashable type: 'list'"), so the query
    now projects each vector to its exact byte decomposition: feature
    f = byte/255 in float32, so round(f·255) recovers the md5 byte
    EXACTLY (float32 relative error ≤ 2⁻²⁴ ⇒ |f·255 − byte| < 10⁻⁵)
    — making the whole inference path fully ORACLED: DuckDB rebuilds
    the same bytes from md5(text) hex (the payload is UTF-8 of text).
    Exact float vectors stay unit-tested in tests/test_multimodal.py."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_features_fake(docs)
    return feats.select(
        "doc_id", F.posexplode("features").alias("feature_idx", "f")
    ).select(
        "doc_id",
        "feature_idx",
        F.round(F.col("f").cast("double") * 255)
        .cast("int")
        .alias("feature_byte"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       unnest(range(n % 7 + 1))::INT AS frame_idx,
       (unnest(range(n % 7 + 1)) * n // (n % 7 + 1))::INT AS frame_off
FROM b
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out mapInPandas (UDTF shape): deterministic frame sampling
    from the binary payload."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs)


@query(
    "multimodal_phash_dedup",
    oracle="""
WITH g AS (
  SELECT doc_id,
         list_transform(range(0, 64),
           i -> ('0x' || substr(md5(substr(text, 1, 32) || ':'
                                 || (i // 16)::VARCHAR),
                                (i % 16) * 2 + 1, 2))::BIGINT) AS gray
  FROM documents
),
h AS (
  SELECT doc_id,
         -- ::BIGINT: list_sum over BIGINT returns HUGEINT (INT128) in
         -- DuckDB; the 60-bit value fits BIGINT exactly, and the cast
         -- keeps the oracle's column type identical to Spark's long
         -- (the driver's value-hash canonicalizes HUGEINT differently
         -- even when values match — round-6 red-row root cause).
         list_sum(list_transform(range(0, 60),
           i -> CASE WHEN gray[i + 1] * 64 > list_sum(gray)
                THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS phash
  FROM g
),
k AS (SELECT phash, min(doc_id) AS keeper_id FROM h GROUP BY phash)
SELECT h.doc_id, h.phash, k.keeper_id,
       (h.doc_id = k.keeper_id) AS is_keeper
FROM h JOIN k ON h.phash = k.phash
""",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: fake-decode each binary payload to
    an 8×8 thumbnail, aHash it (operators/multimodal.py:
    perceptual_hash — Arrow-batched mapInPandas, 60-bit positive
    signature), then canonicalize by exact hash — one hash
    aggregation + an equi-join on the hash key, the same 100 TB shape
    as exact text dedup. The md5-derived thumbnail keeps every bit
    reproducible in ANSI SQL, so the full pipeline (worker included)
    sits under the value-hash gate; 24 of 500 fixture docs share a
    32-char prefix, so keeper groups are non-trivial at every sf."""
    from vspace_spark.operators.multimodal import perceptual_hash

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    hashes = perceptual_hash(docs)
    keepers = hashes.groupBy("phash").agg(
        F.min("doc_id").alias("keeper_id")
    )
    return hashes.join(keepers, "phash").select(
        "doc_id",
        "phash",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper"),
    )
