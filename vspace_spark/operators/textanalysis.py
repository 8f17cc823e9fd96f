"""Text-analysis operators for training-data pipelines (BASELINE.json
north star): language-ID heuristic, quality scoring, token counting,
document fingerprinting.

All pure column expressions — one narrow pass over the corpus, no
shuffle, no Python. At 100 TB these run at scan speed and their outputs
(scores, fingerprints) are the join/filter keys for downstream
curation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vspace_spark.functions.text import normalize_col, tokenize_col

# Tiny embedded stopword list (language-ID + quality features). A real
# deployment swaps in per-language lists; the operator shape is the same.
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
)

# BPE-ish pre-tokenization: letter runs, digit runs, single other
# non-space chars — a regex approximation of byte-pair pre-splitting.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokenize_col(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def stopword_count(tokens: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """Quality-scoring feature set: lengths, ratios, lexical diversity.
    Ratios are rounded to 6 places (single division of exact integer
    counts → deterministic across engines)."""
    tokens = tokenize_col(text_col)
    wc = F.size(tokens)
    distinct_wc = F.size(F.array_distinct(tokens))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    n_chars = F.length(F.col(text_col))
    stop = stopword_count(tokens)
    return {
        "n_chars": n_chars,
        "wc": wc,
        "distinct_wc": distinct_wc,
        "mean_word_len": F.round(alpha_chars.cast("double") / wc, 6),
        "stopword_ratio": F.round(stop.cast("double") / wc, 6),
        "type_token_ratio": F.round(distinct_wc.cast("double") / wc, 6),
        "alpha_ratio": F.round(alpha_chars.cast("double") / n_chars, 6),
    }


def repetition_features(text_col: str = "text") -> dict[str, Column]:
    """Repetition filters (Gopher/RefinedWeb-style): the fraction of
    duplicated n-grams and the share of the single most frequent token
    — high values flag boilerplate/spam documents a training pipeline
    drops.

    ``dup_{2,3}gram_frac`` = 1 − distinct/total n-grams, pure codegen'd
    array ops over the ``zip_with``-built gram arrays (functions/
    text.py:ngrams_col) — scan speed. ``top_token_share`` scans the
    distinct-token histogram (O(distinct × length) per row, JVM-side —
    same tradeoff as functions.text.histogram, fine for documents up to
    a few thousand tokens). All ratios are single divisions of exact
    integer counts rounded to 6 places → deterministic across engines.
    """
    from vspace_spark.functions.text import ngrams_col

    tokens = tokenize_col(text_col)
    wc = F.size(tokens)
    out: dict[str, Column] = {}
    for n in (2, 3):
        grams = ngrams_col(tokens, n)
        total = F.size(grams)
        out[f"dup_{n}gram_frac"] = F.when(
            total > 0,
            F.round(
                1 - F.size(F.array_distinct(grams)).cast("double") / total, 6
            ),
        ).otherwise(F.lit(0.0))
    tf_max = F.array_max(
        F.transform(
            F.array_distinct(tokens),
            lambda t: F.size(F.filter(tokens, lambda x: x == t)),
        )
    )
    out["top_token_share"] = F.when(
        wc > 0, F.round(tf_max.cast("double") / wc, 6)
    ).otherwise(F.lit(0.0))
    return out


def quality_score(text_col: str = "text") -> Column:
    """Composite quality score in [0, 1]: weighted blend of bounded
    features (Gopher/C4-style heuristics, simplified). Deterministic
    arithmetic on exact counts."""
    f = quality_features(text_col)
    wc_ok = F.when((f["wc"] >= 10) & (f["wc"] <= 100000), 1.0).otherwise(0.0)
    diversity = F.least(f["type_token_ratio"] * 2, F.lit(1.0))
    stop_ok = F.when(f["stopword_ratio"] >= 0.05, 1.0).otherwise(
        f["stopword_ratio"] * 20
    )
    return F.round(0.4 * wc_ok + 0.3 * diversity + 0.3 * stop_ok, 6)


def language_id(text_col: str = "text") -> Column:
    """n-gram/stopword language heuristic: score each candidate
    language by marker-token hits per token, pick the argmax (ties →
    lexicographic, deterministic). Marker lists are embedded and tiny;
    the real-world swap-in is per-language frequency tables — the
    operator stays a single narrow projection."""
    markers = {
        "en": ("the", "and", "of", "is", "to"),
        "de": ("der", "die", "und", "ist", "das"),
        "es": ("el", "la", "de", "es", "que"),
        "fr": ("le", "la", "et", "est", "que"),
    }
    tokens = tokenize_col(text_col)
    scores = F.array(
        *[
            F.struct(
                stopword_count(tokens, words).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(markers.items())
        ]
    )
    # desc by hits, asc by lang (lexicographic tie-break, deterministic)
    ranked = F.array_sort(
        scores,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )
    top = F.element_at(ranked, 1)
    return F.when(top["hits"] > 0, top["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: str = "text", normalized: bool = True) -> Column:
    """Document fingerprint: md5 of the normalized text — the exact-dup
    key. md5 is content-defined and engine-portable (the DuckDB oracle
    computes the identical digest)."""
    c = normalize_col(text_col) if normalized else F.col(text_col)
    return F.md5(c)


# PII patterns — deliberately restricted to RE2-compatible syntax
# (char classes, bounded repeats, alternation; no lookaround or
# backreferences) so the DuckDB oracle's RE2 engine and Spark's Java
# regex engine match the exact same spans. Scrub order is part of the
# operator contract: email → phone → IP, applied left-to-right.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def scrub_pii(text: Column | str) -> Column:
    """Redact every PII pattern, in declaration order. Pure column
    expression (JVM regexp_replace chain) — scan-speed, no Python
    worker, safe in streaming and batch alike."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts over the RAW text (detection census,
    independent of scrub order)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{kind}s": F.regexp_count(c, F.lit(pat)).cast("int")
        for kind, pat, _ in PII_PATTERNS
    }
