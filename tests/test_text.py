"""Unit tests for the text column expressions — including the
reference-semantics quirks SURVEY.md §1.4 says to get right."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vspace_spark.functions.text import (
    everygrams_col,
    histogram,
    ngrams_col,
    normalize_col,
    normalize_nfc_udf,
    tokenize_col,
)


def _one(spark, text: str, col):
    return spark.createDataFrame([Row(t=text)]).select(col.alias("out")).first().out


def test_ngram_bounds_exact_inclusive(spark):
    """The reference emitted n-grams one LONGER than configured
    (max_len+1, vspace/pipelines/base.py:143); ours are exact."""
    toks = tokenize_col(F.col("t"))
    grams = _one(spark, "a b c d", everygrams_col(toks, 1, 3))
    assert max(g.count(" ") for g in grams) == 2  # trigrams, nothing longer
    assert set(grams) == {
        "a", "b", "c", "d",
        "a b", "b c", "c d",
        "a b c", "b c d",
    }


@pytest.mark.parametrize(
    "text,n,expected",
    [
        ("a b c", 2, ["a b", "b c"]),
        ("a b", 3, []),          # shorter than n → empty, no descending-seq error
        ("a", 1, ["a"]),
        ("", 2, []),
        ("a b c d", 4, ["a b c d"]),
    ],
)
def test_ngrams_edge_cases(spark, text, n, expected):
    toks = tokenize_col(F.col("t"))
    assert _one(spark, text, ngrams_col(toks, n)) == expected


def test_tokenize_drops_empty_tokens(spark):
    assert _one(spark, "", tokenize_col(F.col("t"))) == []
    assert _one(spark, "  a   b  ", tokenize_col(F.col("t"))) == ["a", "b"]


def test_normalize_ascii_fast_path(spark):
    out = _one(spark, "Hello, World! 123_abc", normalize_col(F.col("t")))
    assert out == "hello world 123_abc"


def test_normalize_nfc_udf_full_parity(spark):
    """NFC + unicode-aware \\w — the case the ASCII fast path can't do
    (reference: vspace/utils/text.py:8-17). é as e+combining-accent NFC-
    composes to a single \\w-matching char."""
    decomposed = "Café ÜBER straße"
    out = _one(spark, decomposed, normalize_nfc_udf(F.col("t")))
    assert out == "café über straße"


def test_histogram_counts_within_row(spark):
    toks = tokenize_col(F.col("t"))
    h = _one(spark, "a b a c a b", histogram(toks))
    assert {(r.token, r.tf) for r in h} == {("a", 3), ("b", 2), ("c", 1)}


def test_everygram_rejects_bad_bounds():
    with pytest.raises(ValueError):
        everygrams_col(F.col("x"), 2, 1)


def test_corpus_histograms_map_shape(spark):
    from pyspark.sql import Row

    from vspace_spark.operators.stats import corpus_histograms

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="a b a"), Row(doc_id=1, text="c c c c")]
    )
    rows = {r.doc_id: r for r in corpus_histograms(docs).collect()}
    assert rows[0].token_counts == {"a": 2, "b": 1} and rows[0].wc == 3
    assert rows[1].token_counts == {"c": 4} and rows[1].wc == 4
    out = corpus_histograms(docs)
    assert dict(out.dtypes)["token_counts"] == "map<string,bigint>"


def test_repetition_features_hand_computed(spark):
    """dup-n-gram fractions and top-token share against hand counts."""
    from vspace_spark.operators.textanalysis import repetition_features

    docs = spark.createDataFrame(
        [
            # bigrams: [a b, b a, a b] → 3 total, 2 distinct → 1/3
            # trigrams: [a b a, b a b] → 2 total, 2 distinct → 0
            # top token: a ×2 of 4 → 0.5
            (0, "a b a b"),
            # all unique → 0, 0; top share 1/3
            (1, "x y z"),
            # shorter than 2 → both 0; top share 1.0
            (2, "solo"),
            # spam: [buy buy ×4] → 4 total 1 distinct → 0.75;
            # trigrams 3 total 1 distinct → 2/3; top share 1.0
            (3, "buy buy buy buy buy"),
        ],
        "doc_id long, text string",
    )
    feats = repetition_features("text")
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", *[c.alias(k) for k, c in feats.items()]
        ).collect()
    }
    assert rows[0].dup_2gram_frac == round(1 - 2 / 3, 6)
    assert rows[0].dup_3gram_frac == 0.0
    assert rows[0].top_token_share == 0.5
    assert rows[1].dup_2gram_frac == 0.0 and rows[1].top_token_share == round(1 / 3, 6)
    assert rows[2].dup_2gram_frac == 0.0 and rows[2].top_token_share == 1.0
    assert rows[3].dup_2gram_frac == 0.75
    assert rows[3].dup_3gram_frac == round(1 - 1 / 3, 6)
    assert rows[3].top_token_share == 1.0


def test_injectable_normalizer_end_to_end(spark):
    """EP2 parity (reference: vspace/pipelines/base.py:155-157): a
    custom normalizer threads through term_stats. The NFC pandas-UDF
    path folds composed/decomposed Unicode that the ASCII default
    would mangle — proving the injected stage actually runs."""
    from vspace_spark.functions.text import normalize_nfc_udf
    from vspace_spark.operators.stats import term_stats

    docs = spark.createDataFrame(
        [(0, "Café CAFÉ"), (1, "naïve café")],
        "doc_id long, text string",
    )
    stats = term_stats(docs, normalizer=normalize_nfc_udf)
    got = {r.token: (r.document_frequency, r.term_frequency) for r in stats.collect()}
    # NFC unifies e+combining-acute with precomposed é; lower folds case:
    # doc 0 has café twice, doc 1 once
    assert got["café"] == (2, 3)
    assert got["naïve"] == (1, 1)


def test_injectable_tokenizer_end_to_end(spark):
    """The tokenizer parameter the reference declared but silently
    ignored (SURVEY.md §1.4 quirk 2) is honored here."""
    from pyspark.sql import functions as F
    from vspace_spark.operators.stats import term_stats

    docs = spark.createDataFrame([(0, "a,b,a")], "doc_id long, text string")
    stats = term_stats(docs, tokenizer=lambda c: F.split(c, ","))
    got = {r.token: r.term_frequency for r in stats.collect()}
    assert got == {"a": 2, "b": 1}


def test_process_corpus_ep2_composition(spark):
    """load_raw_corpus → process_corpus → compute_stats composes like
    the reference's library API (EP2, SURVEY.md §3)."""
    from vspace_spark.operators.stats import compute_stats, process_corpus

    corpus = spark.createDataFrame(
        [(0, "The quick FOX"), (1, "quick fox runs")],
        "document_index long, text string",
    )
    toks = process_corpus(corpus, min_n=1, max_n=2)
    stats = {r.token: r.document_frequency for r in compute_stats(toks).collect()}
    assert stats["quick"] == 2 and stats["quick fox"] == 2 and stats["the"] == 1


class TestPiiScrub:
    """scrub_pii / pii_counts: planted PII must be found and redacted;
    clean text must be a fixed point."""

    def _run(self, spark, texts):
        from vspace_spark.operators.textanalysis import pii_counts, scrub_pii

        from pyspark.sql import functions as F

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        counts = pii_counts("text")
        return df.select(
            scrub_pii("text").alias("clean"),
            *[c.alias(k) for k, c in counts.items()],
        ).collect()

    def test_planted_pii_found_and_redacted(self, spark):
        rows = self._run(
            spark,
            [
                "mail a.b-c_9@sub.example.co.uk or x@y.io now",
                "call +1-800-5550 wait no: +91-123-4567 done",
                "hosts 192.168.0.1 and 10.0.0.255, port 80",
                "clean text with no personal data at all",
            ],
        )
        emails, phones, ips, clean = rows[0], rows[1], rows[2], rows[3]
        assert emails.n_emails == 2 and "<EMAIL>" in emails.clean
        assert "a.b-c_9@sub.example.co.uk" not in emails.clean
        assert phones.n_phones == 2  # both +C-NNN-NNNN forms match
        assert "+91-123-4567" not in phones.clean
        assert ips.n_ips == 2 and ips.clean.count("<IP>") == 2
        assert clean.n_emails == clean.n_phones == clean.n_ips == 0
        assert clean.clean == "clean text with no personal data at all"

    def test_scrub_is_fixed_point(self, spark):
        import string

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from vspace_spark.operators.textanalysis import PII_PATTERNS

        # property at the PATTERN level (pure Python re, no Spark round
        # trip per example): scrubbing replaces every match and the
        # replacement tokens contain no scrubbable text
        import re

        words = st.lists(
            st.text(string.ascii_lowercase, min_size=1, max_size=8),
            min_size=0,
            max_size=6,
        )

        @given(
            words,
            st.integers(0, 10**6),
            st.sampled_from(["%d.%d.%d.%d", "+%d-555-%04d h@x.io", "w%d"]),
        )
        @settings(max_examples=200, deadline=None)
        def prop(ws, n, shape):
            if shape.startswith("%d."):
                planted = shape % (n % 256, n % 256, n % 256, n % 256)
            elif shape.startswith("+"):
                planted = shape % (n % 100, n % 10000)
            else:
                planted = shape % n
            text = " ".join(ws + [planted])
            clean = text
            for _, pat, rep in PII_PATTERNS:
                clean = re.sub(pat, rep, clean)
            for _, pat, _ in PII_PATTERNS:
                assert re.search(pat, clean) is None

        prop()
