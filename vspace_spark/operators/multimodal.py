"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no image/audio codecs):
``_decode_bytes_meta`` tries Pillow and falls back to a clearly-marked
DETERMINISTIC FAKE derived from the byte content. Everything around the
stub — binary column handling, Arrow batch iteration, output schemas,
multi-row-per-input fan-out (frame sampling) — is real Spark plumbing
and is what these operators test.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); binary payloads stay in the executor — at 100 TB the decode
stage is a narrow map over the blob column with column pruning keeping
other columns out of the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, mode string"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int"

try:  # real decoder if the environment has it
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_image_meta(payload: bytes) -> tuple[int, int, str]:
    """DETERMINISTIC FAKE decode: metadata derived from byte length so
    the DuckDB oracle can mirror it (width = 64 + n % 512,
    height = 64 + 7n % 512). Replaced by a real codec in production."""
    n = len(payload)
    return 64 + n % 512, 64 + (7 * n) % 512, "RGB"


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    real_decode: bool = False,
) -> DataFrame:
    """binary column → typed image metadata via mapInPandas.

    One output row per input row; Arrow batches in/out. With
    ``real_decode=True`` (requires Pillow) each payload is opened as an
    actual image and real (width, height, mode) come out; the default
    stays the DETERMINISTIC FAKE, which is the oracle target — the
    registered query keeps the fake so the DuckDB twin can mirror the
    arithmetic, and the real path swaps in per-call without touching
    the plumbing (same schema, same batch shape).
    """
    if real_decode and not _HAVE_PIL:
        raise ImportError(
            "real_decode=True requires Pillow (pip install Pillow); "
            "the deterministic-fake default needs no codecs"
        )

    # NOTE: the closure must be SELF-CONTAINED (no references to
    # vspace_spark module globals): cloudpickle serializes module-level
    # helpers by reference, and executor Python workers do not have
    # this repo on sys.path when the driver runs from elsewhere.
    # ``real_decode`` (a bool) is captured BY VALUE, so the branch
    # survives pickling.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if real_decode:
            import io as _io

            from PIL import Image as _Image

            def meta_of(payload: bytes) -> tuple[int, int, str]:
                with _Image.open(_io.BytesIO(payload)) as im:
                    return im.width, im.height, im.mode

        else:

            def meta_of(payload: bytes) -> tuple[int, int, str]:
                n = len(payload)
                return 64 + n % 512, 64 + (7 * n) % 512, "RGB"

        for pdf in batches:
            payloads = pdf[bin_col]
            meta = [meta_of(p) for p in payloads]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "mode": [m[2] for m in meta],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    max_frames: int = 7,
) -> DataFrame:
    """'Video' frame sampling: FAN-OUT mapInPandas (multiple output rows
    per input). Frame count/offsets derive deterministically from the
    payload size (fake); the real implementation seeks the container
    index. Demonstrates the UDTF-shaped batch contract."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, offs = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                n = len(payload)
                n_frames = n % max_frames + 1
                for i in range(n_frames):
                    ids.append(doc_id)
                    frames.append(i)
                    offs.append((i * n) // n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(frames, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(sample, FRAME_SCHEMA)


def audio_chunk_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    ms_per_byte: int = 4,
    chunk_ms: int = 30_000,
) -> DataFrame:
    """'Audio' chunking plan: split each track into fixed-duration
    windows (the ASR/embedding pre-step). Duration derives
    deterministically from payload size (fake decode: ``ms_per_byte``
    stands in for the container's sample-rate header).

    Unlike frame sampling (mapInPandas fan-out, the Python-worker
    shape), this is PURE column algebra — ``explode(sequence(...))``
    fans out JVM-side at scan speed with whole-stage codegen, the
    right tier when the per-item computation is arithmetic, not a
    codec. The decode worker then processes (doc, chunk) rows in
    parallel, which is the point: chunking BEFORE decode spreads one
    long track across many tasks."""
    n = F.octet_length(F.col(bin_col))
    dur = n * ms_per_byte
    n_chunks = F.ceil(dur / F.lit(chunk_ms)).cast("int")
    # sequence(0, -1) would yield a DESCENDING [0, -1] for empty
    # payloads; guard so zero-length tracks produce no chunks
    idxs = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    ex = df.select(
        id_col,
        dur.alias("duration_ms"),
        F.explode(idxs).alias("chunk_idx"),
    )
    start = ex.chunk_idx.cast("long") * chunk_ms
    return ex.select(
        id_col,
        "duration_ms",
        "chunk_idx",
        start.alias("start_ms"),
        F.least(ex.duration_ms, start + chunk_ms).alias("end_ms"),
    )


def extract_features_fake(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Feature extraction with a DETERMINISTIC FAKE model: the feature
    vector is the first ``dim`` bytes of md5(payload), scaled to
    [0, 1] float32. Content-derived (not just length-derived), stable
    across runs/engines, and exercises the REAL model-inference batch
    shape — Arrow batches in, one fixed-dim vector row out per input,
    float32 columns — so swapping in an ONNX/torch session changes only
    the body of ``featurize``. Like the MinHash/SimHash signatures,
    the output is hash-derived, so the driver's check is rows-only
    (no portable SQL twin); exact vectors are unit-tested."""
    if dim > 16:
        raise ValueError("md5 fake provides at most 16 feature bytes")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            feats = [
                (
                    _np.frombuffer(
                        hashlib.md5(p).digest()[:dim], dtype=_np.uint8
                    ).astype(_np.float32)
                    / 255.0
                )
                for p in pdf[bin_col]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        extract, "doc_id long, features array<float>"
    )


def resize_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    max_w: int = 224,
    max_h: int = 224,
    real_decode: bool = False,
) -> DataFrame:
    """Aspect-preserving resize PLAN: (width, height) → target box,
    computed from the (fake) decoded metadata entirely in column
    expressions — integer arithmetic, so the DuckDB oracle mirrors it
    exactly (``real_decode=True`` plans from Pillow-decoded dims
    instead). The actual pixel resample belongs in the decode worker
    (Pillow's ``thumbnail``); planning the target dims relationally
    means the expensive Python stage only runs on images that NEED
    resizing (``needs_resize`` pushes down as a filter)."""
    meta = decode_image_meta(
        df, id_col=id_col, bin_col=bin_col, real_decode=real_decode
    )
    # fixed-point: scale ppm = floor(min(max_w/w, max_h/h, 1) * 1e6).
    # floor() (not cast) on both engines — CAST(double AS BIGINT)
    # truncates in Spark but ROUNDS in DuckDB; explicit floor is the
    # portable form. Products stay < 2^53, exact in doubles.
    scale_ppm = F.least(
        F.floor(F.lit(max_w * 1000000) / F.col("width")),
        F.floor(F.lit(max_h * 1000000) / F.col("height")),
        F.lit(1000000).cast("bigint"),
    )
    return meta.select(
        id_col,
        "width",
        "height",
        F.floor(F.col("width") * scale_ppm / 1000000).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale_ppm / 1000000).cast("int").alias("out_h"),
        ((F.col("width") > max_w) | (F.col("height") > max_h)).alias(
            "needs_resize"
        ),
    )


def extract_features_stub(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Feature-extraction stub: binary → fixed-dim float vector. Raises
    NotImplementedError without a model runtime — the SIGNATURE and
    schema are the contract tested here."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "feature extraction requires a model runtime (none in this "
            "container); wire an ONNX/torch session here"
        )
        yield  # pragma: no cover

    return df.select(id_col, bin_col).mapInPandas(
        extract, f"doc_id long, features array<float>"
    )


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary column from text (UTF-8 bytes) —
    the fixtures carry no real blobs; the byte column is what matters
    to the plumbing."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def perceptual_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    prefix_chars: int = 32,
) -> DataFrame:
    """Perceptual (average) hash over the DETERMINISTIC FAKE decode:
    the binary payload "decodes" to an 8×8 grayscale thumbnail whose
    64 pixel bytes are md5(prefix ':' j) for j in 0..3 — derived from
    the payload's first ``prefix_chars`` characters, standing in for
    the downsample step that makes a real pHash invariant to small
    pixel edits (here: invariant to suffix changes). The aHash math on
    top is the real algorithm: bit i set iff pixel i exceeds the
    thumbnail mean, compared integer-exactly as
    ``gray[i]*64 > sum(gray)``; 60 bits used so the hash stays a
    positive BIGINT on every engine (same policy as the md5-portable
    MinHash/SimHash signatures). Arrow-batched mapInPandas, one
    (id, phash) row per input — swapping in a real decoder+resampler
    changes only the thumbnail construction."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        import pandas as _pd

        weights = _np.left_shift(
            _np.ones(60, dtype=_np.int64), _np.arange(60, dtype=_np.int64)
        )
        out_ids: list[int]
        for pdf in batches:
            hashes = []
            for p in pdf[bin_col]:
                prefix = bytes(p).decode("utf-8")[:prefix_chars]
                gray = _np.frombuffer(
                    b"".join(
                        hashlib.md5(
                            f"{prefix}:{j}".encode()
                        ).digest()
                        for j in range(4)
                    ),
                    dtype=_np.uint8,
                ).astype(_np.int64)
                total = int(gray.sum())
                bits = (gray[:60] * 64) > total
                hashes.append(int((bits * weights).sum()))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": _np.array(hashes, dtype=_np.int64),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        compute, "doc_id long, phash long"
    )
