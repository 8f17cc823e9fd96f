"""Term-statistics operators — the reference's flagship capability.

The reference pipeline (reference: vspace/pipelines/base.py:380-437):
corpus → normalize → tokenize → n-gram histogram (Python Counter inside
RDD lambdas) → vocabulary gate (broadcast DAWG probed in Python) →
explode → groupBy → {document_frequency, term_frequency, tdsum}.

Rebuild shape (all DataFrame, Catalyst-visible):

  scan → column expressions (normalize/tokenize/everygrams, zero
  shuffles) → explode → [broadcast semi-join vocab gate] → hash
  aggregation (doc, token) for per-doc tf → hash aggregation per
  grouping. Both aggregations partial-combine map-side; the heavy
  exploded stream is reduced before it hits the wire wherever documents
  repeat tokens.

Semantics (reference: vspace/pipelines/base.py:192-208):
- document_frequency = number of (doc[, source]) rows containing token
- term_frequency     = Σ tf
- tdsum              = Σ wc over docs CONTAINING the token (not corpus
  total — SURVEY.md §1.4 quirk 5, preserved)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vspace_spark.functions.text import (
    DOCID_PATTERN,
    everygrams_col,
    normalize_col,
    tokenize_col,
)


def tokenized_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: Sequence[str] = (),
    min_n: int = 1,
    max_n: int = 1,
    normalize: bool = False,
) -> DataFrame:
    """Corpus → one row per (doc, n-gram) with per-doc tf and wc.

    Output: ``[<id_col>, *extra_cols, wc: int, token: string, tf: int]``.
    ``wc`` counts unigrams (the reference's word count,
    vspace/pipelines/base.py:141-142).

    Shape: explode the flat n-gram array, then ONE hash aggregation on
    (doc, token) for per-doc tf. Spark's partial aggregation combines
    map-side; the alternative per-row histogram (functions.text.
    histogram) avoids that shuffle but costs O(distinct × grams) string
    compares per row in interpreted HOF evaluation — measured 2× slower
    end-to-end on the bench corpus, and quadratic in document length.
    """
    text = normalize_col(text_col) if normalize else F.col(text_col)
    tokens = tokenize_col(text)
    ex = docs.select(
        id_col,
        *extra_cols,
        F.size(tokens).alias("wc"),
        F.explode(everygrams_col(tokens, min_n, max_n)).alias("token"),
    )
    # P5 — drop synthetic doc-counter tokens (reference: base.py:378,386).
    ex = ex.filter(~F.col("token").rlike(DOCID_PATTERN))
    return ex.groupBy(id_col, *extra_cols, "wc", "token").agg(
        F.count("*").alias("tf")
    )


def compute_stats(doc_tokens: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """A1 — hash aggregation over (token[, *group_cols])
    (reference: vspace/pipelines/base.py:192-208).

    Input is ``tokenized_documents`` output (or anything with
    token/tf/wc). One shuffle; partial aggregation map-side.
    """
    return doc_tokens.groupBy("token", *group_cols).agg(
        F.count("*").alias("document_frequency"),
        F.sum("tf").alias("term_frequency"),
        F.sum("wc").alias("tdsum"),
    )


def term_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: Sequence[str] = (),
    min_n: int = 1,
    max_n: int = 1,
    vocabulary: DataFrame | None = None,
) -> DataFrame:
    """End-to-end: corpus → [vocab-gated] n-gram term statistics.

    ``vocabulary`` (a ``[token]`` DF) replaces the reference's broadcast
    DAWG with a broadcast LEFT SEMI join (J3): same gate — multi-grams
    must be in vocabulary, unigrams always pass
    (reference: vspace/pipelines/base.py:385-389) — but distributed by
    Catalyst instead of collected to the driver. This removes the
    reference's 64 GB driver.maxResultSize requirement
    (reference: conf/spark-defaults.conf:38).
    """
    toks = tokenized_documents(
        docs, text_col, id_col, group_cols, min_n=min_n, max_n=max_n
    )
    if vocabulary is not None:
        unigrams = toks.filter(~F.col("token").contains(" "))
        multigrams = toks.filter(F.col("token").contains(" ")).join(
            F.broadcast(vocabulary.select("token")), "token", "left_semi"
        )
        toks = unigrams.unionByName(multigrams)
    return compute_stats(toks, group_cols)


def doc_term_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_n: int = 1,
    max_n: int = 1,
) -> DataFrame:
    """Exploded per-document n-gram counts (FIXTURES.md `tokenized`
    shape): ``[doc_id, token, tf]``."""
    return tokenized_documents(docs, text_col, id_col, min_n=min_n, max_n=max_n).select(
        id_col, "token", "tf"
    )


def corpus_histograms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_n: int = 1,
    max_n: int = 1,
) -> DataFrame:
    """The reference's tokenized-corpus shape: one row per document with
    the n-gram histogram as a MapType column
    ``[<id_col>, wc: int, token_counts: map<string,int>]``
    (reference: vspace/pipelines/base.py:163-189). Kept as the internal/
    interchange form (FIXTURES.md §5 keeps the exploded form for oracle
    checks — map columns don't hash portably)."""
    toks = tokenized_documents(docs, text_col, id_col, min_n=min_n, max_n=max_n)
    return toks.groupBy(id_col, "wc").agg(
        F.map_from_entries(
            F.collect_list(F.struct("token", "tf"))
        ).alias("token_counts")
    )


def build_vocabulary(*token_dfs: DataFrame) -> DataFrame:
    """Vocabulary pipeline: union → trim/empty-filter → distinct → id
    (reference: vspace/pipelines/base.py:343-355; filters from
    vspace/lookups/dawg.py:100-103).

    Deterministic ``tokenid`` via rank over token order instead of the
    reference's ``monotonically_increasing_id`` (SURVEY.md §7 risks) —
    computed with a zero-skew global ordering: distinct tokens are tiny
    relative to the corpus, and the sort is one range-partitioned pass.
    """
    from pyspark.sql import Window

    df = token_dfs[0].select("token")
    for other in token_dfs[1:]:
        df = df.unionByName(other.select("token"))
    df = (
        df.na.drop()
        .select(F.trim("token").alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    return df.select(
        "token",
        (F.row_number().over(Window.orderBy("token")) - 1).alias("tokenid"),
    )
