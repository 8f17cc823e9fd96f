"""Multimodal plumbing tests: Arrow batch contract, fan-out shape,
stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.multimodal import (
    decode_image_meta,
    extract_features_stub,
    sample_frames,
    with_binary_payload,
)


def test_payload_is_binary(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    assert dict(docs.dtypes)["payload"] == "binary"


def test_image_meta_one_row_per_doc(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    meta = decode_image_meta(docs)
    assert meta.count() == docs.count()
    row = meta.first()
    assert row.n_bytes > 0 and 64 <= row.width < 576 and row.mode == "RGB"


def test_frame_sample_fan_out(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).limit(20)
    frames = sample_frames(docs)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("mx")
    )
    bad = per_doc.filter(F.col("n") != F.col("mx") + 1).count()
    assert bad == 0  # frame_idx is dense 0..n-1
    assert frames.count() >= 20  # ≥1 frame per doc


def test_feature_stub_raises_cleanly(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).limit(2)
    out = extract_features_stub(docs)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,features:array<float>>"
    )
    with pytest.raises(Exception, match="NotImplementedError|model runtime"):
        out.collect()
