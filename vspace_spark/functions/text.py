"""Text column expressions — the reference's Python string pipeline as
Catalyst-visible built-ins.

The reference normalized/tokenized/n-grammed inside row-at-a-time RDD
lambdas with NLTK (reference: vspace/pipelines/base.py:121-152,
vspace/utils/text.py:8-17), which is opaque to the optimizer and runs
scalar Python. Everything here is a column expression (whole-stage
codegen, no Python workers) except the one operation Spark SQL lacks:
Unicode NFC normalization, provided as an Arrow-vectorized pandas UDF.

n-gram bounds are exact and inclusive — the reference emitted n-grams
one longer than configured (``max_len + 1`` at
vspace/pipelines/base.py:143, SURVEY.md §1.4); the rebuild fixes this.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Synthetic per-document counter tokens are always dropped
# (reference: vspace/pipelines/base.py:378, 386).
DOCID_PATTERN = r"^nferdoccount_[0-9]+$"

# ASCII equivalent of Python's unicode-aware \w+ runs; the driver corpus
# is ASCII so the JVM regex path and the reference's Python regex agree.
_WORD_RUN = "[a-zA-Z0-9_]+"


def normalize_col(col: Column | str) -> Column:
    """P1 (ASCII fast path) — lowercase, extract word runs, space-join.

    Mirrors ``normalize`` (reference: vspace/utils/text.py:8-17) minus
    NFC, which is a no-op on ASCII. Pure built-ins → codegen'd.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.regexp_extract_all(F.lower(c), F.lit(_WORD_RUN), 0), " "
    )


def _make_normalize_nfc_udf():
    # Nested so cloudpickle serializes the UDF BY VALUE: a module-level
    # function pickles as a reference to vspace_spark, which executor
    # Python workers cannot import when the driver runs from another
    # cwd. All imports live inside the function for the same reason.
    @F.pandas_udf(T.StringType())
    def normalize_nfc(s: pd.Series) -> pd.Series:
        """P1 (full parity) — NFC → lower → ``\\w+`` runs → space-join,
        exactly the reference semantics (vspace/utils/text.py:8-17),
        Arrow-vectorized. Only needed for non-ASCII corpora."""
        import re
        import unicodedata as ud

        word = re.compile(r"\w+")

        def norm(x: str | None) -> str | None:
            if x is None:
                return None
            return " ".join(word.findall(ud.normalize("NFC", x).lower()))

        return s.map(norm)

    return normalize_nfc


normalize_nfc_udf = _make_normalize_nfc_udf()


def tokenize_col(col: Column | str) -> Column:
    """P2 — whitespace split (reference: vspace/pipelines/base.py:121-125),
    dropping empty tokens so ``split("")`` doesn't yield ``[""]``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def ngrams_col(tokens: Column, n: int) -> Column:
    """All n-grams of length exactly ``n`` as space-joined strings.

    Built by chaining ``zip_with(grams, tokens[k:], concat_ws)`` — one
    linear pass per extra gram word. The obvious alternative
    (``transform`` over an index ``sequence`` with per-position
    ``slice`` + ``array_join``) is O(n²) per row AND interpreted
    (higher-order functions are CodegenFallback); measured 6× slower on
    the bench corpus. zip_with pads the shorter side with nulls, which
    ``concat_ws`` silently skips, so the padded tail holds short grams —
    the final ``slice`` drops them. Empty array when the document is
    shorter than ``n``.
    """
    if n == 1:
        return tokens
    g = tokens
    for k in range(1, n):
        shifted = F.slice(
            tokens, k + 1, F.greatest(F.size(tokens) - k, F.lit(0))
        )
        g = F.zip_with(g, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        F.size(tokens) >= n, F.slice(g, 1, F.size(tokens) - n + 1)
    ).otherwise(F.array().cast("array<string>"))


def everygrams_col(tokens: Column, min_n: int = 1, max_n: int = 3) -> Column:
    """F1 — all n-grams for n in [min_n, max_n], concatenated.

    Bounds are inclusive and exact (fixes the reference's off-by-one,
    SURVEY.md §1.4). One flat ``array<string>`` per document.
    """
    if min_n < 1 or max_n < min_n:
        raise ValueError(f"bad n-gram bounds [{min_n}, {max_n}]")
    return F.flatten(
        F.array(*[ngrams_col(tokens, n) for n in range(min_n, max_n + 1)])
    )


def histogram(tokens: Column) -> Column:
    """A2 — per-document term-frequency histogram WITHOUT a shuffle.

    Returns ``array<struct<token: string, tf: int>>`` computed entirely
    inside the row via ``array_distinct`` + ``filter``/``size`` — the
    map-side pre-aggregation the reference did with a Python ``Counter``
    (reference: vspace/pipelines/base.py:144-152). Eliminating the
    per-(doc, token) groupBy halves the shuffles in the stats pipeline:
    at 100 TB the exploded (doc, token) stream never hits the wire.

    O(distinct × length) comparisons per row, JVM-side; right for
    documents up to a few thousand tokens (our corpus). For very long
    documents prefer explode + two-level groupBy.
    """
    return F.transform(
        F.array_distinct(tokens),
        lambda t: F.struct(
            t.alias("token"),
            F.size(F.filter(tokens, lambda x: x == t)).alias("tf"),
        ),
    )
