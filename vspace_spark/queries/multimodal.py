"""Multimodal queries: binary-column pipelines whose (stubbed,
deterministic) decode is mirrored exactly by the oracle — so the Arrow
batch plumbing itself is under the correctness gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vspace_spark.io.tables import load_table
from vspace_spark.operators.multimodal import (
    decode_image_meta,
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
