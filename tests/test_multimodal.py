"""Multimodal plumbing tests: Arrow batch contract, fan-out shape,
stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.multimodal import (
    decode_image_meta,
    extract_features_fake,
    extract_features_stub,
    resize_plan,
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


def test_fake_features_exact_and_deterministic(spark):
    """The fake model's output is exactly md5-derived: verify against
    an independently computed digest, and that dim caps at 16."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.features
        for r in extract_features_fake(
            with_binary_payload(docs), dim=8
        ).collect()
    }
    for doc_id, text in [(1, "hello"), (2, "")]:
        want = [
            b / 255.0
            for b in hashlib.md5(text.encode()).digest()[:8]
        ]
        assert out[doc_id] == pytest.approx(want, abs=1e-7)
    with pytest.raises(ValueError, match="at most 16"):
        extract_features_fake(with_binary_payload(docs), dim=17)


def test_resize_plan_aspect_and_bounds(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    plan = resize_plan(docs)
    rows = plan.collect()
    for r in rows:
        assert 0 < r.out_w <= 224 and 0 < r.out_h <= 224
        if not r.needs_resize:
            assert (r.out_w, r.out_h) == (r.width, r.height)
        else:
            # exact fixed-point contract, recomputed independently
            ppm = min(
                224_000_000 // r.width, 224_000_000 // r.height, 1_000_000
            )
            assert r.out_w == r.width * ppm // 1_000_000
            assert r.out_h == r.height * ppm // 1_000_000


def test_audio_chunks_cover_duration_exactly(spark):
    from vspace_spark.operators.multimodal import audio_chunk_plan

    docs = spark.createDataFrame(
        [(0, "x" * 20000), (1, "y" * 100), (2, "")],
        "doc_id long, text string",
    )
    chunks = audio_chunk_plan(with_binary_payload(docs))
    rows = sorted(chunks.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 80000 ms → 3 chunks, last one partial
    assert [(r.start_ms, r.end_ms) for r in by_doc[0]] == [
        (0, 30000), (30000, 60000), (60000, 80000)
    ]
    # doc 1: 400 ms → one partial chunk
    assert [(r.start_ms, r.end_ms) for r in by_doc[1]] == [(0, 400)]
    # doc 2: empty payload → no chunks (sequence guard)
    assert 2 not in by_doc
    # chunks tile the duration: contiguous, gap-free
    for rs in by_doc.values():
        for a, b in zip(rs, rs[1:]):
            assert a.end_ms == b.start_ms
        assert rs[-1].end_ms == rs[0].duration_ms


def test_feature_stub_raises_cleanly(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).limit(2)
    out = extract_features_stub(docs)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,features:array<float>>"
    )
    with pytest.raises(Exception, match="NotImplementedError|model runtime"):
        out.collect()


def test_real_decode_requires_pillow_or_raises(spark, sf_dir):
    """Without Pillow the real-decode opt-in must fail loudly at plan
    time (not silently fall back — a silent fake behind a real_decode
    flag would be a lie)."""
    import pytest as _pytest

    from vspace_spark.operators.multimodal import (
        _HAVE_PIL,
        decode_image_meta,
        with_binary_payload,
    )
    from vspace_spark.io.tables import load_table

    if _HAVE_PIL:
        _pytest.skip("Pillow installed; covered by the real-decode test")
    docs = with_binary_payload(
        load_table(spark, sf_dir, "documents").limit(2)
    )
    with _pytest.raises(ImportError, match="Pillow"):
        decode_image_meta(docs, real_decode=True)


def test_real_decode_reads_actual_image_dims(spark):
    """Skipped unless Pillow is available: synthesize real PNGs, run
    the SAME mapInPandas plumbing with real_decode=True, and check the
    decoded dims are the true pixel dims (not the length-derived
    fake)."""
    import pytest as _pytest

    from vspace_spark.operators.multimodal import _HAVE_PIL, decode_image_meta

    if not _HAVE_PIL:
        _pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image

    rows = []
    for i, (w, h) in enumerate([(3, 5), (17, 2), (128, 64)]):
        buf = io.BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        rows.append((i, buf.getvalue()))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in decode_image_meta(df, real_decode=True).collect()
    }
    assert got == {0: (3, 5, "RGB"), 1: (17, 2, "RGB"), 2: (128, 64, "RGB")}


def test_perceptual_hash_prefix_invariance(spark):
    """aHash on the fake decode is invariant to suffix edits (the
    stand-in for a real pHash's invariance to small pixel changes)
    and sensitive to prefix changes; bits are integer-exact
    (gray[i]*64 > sum) and the signature stays a positive 60-bit
    BIGINT."""
    from pyspark.sql import functions as F

    from vspace_spark.operators.multimodal import perceptual_hash

    prefix = "the same thirty-two char prefix!"  # exactly 32 chars
    assert len(prefix) == 32
    rows = [
        (1, prefix + " tail one"),
        (2, prefix + " completely different ending"),
        (3, "another prefix entirely here ok " + "tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.phash
        for r in perceptual_hash(
            docs.withColumn("payload", F.encode("text", "UTF-8"))
        ).collect()
    }
    assert got[1] == got[2]
    assert got[1] != got[3]
    for v in got.values():
        assert 0 <= v < 1 << 60
