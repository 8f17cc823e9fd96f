"""Text-analysis queries over the documents table: token counting,
quality scoring, language ID, fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.textanalysis import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    quality_score,
    repetition_features,
    whitespace_token_count,
)
from vspace_spark.queries import query


@query(
    "doc_token_counts",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' '))::INT AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::INT
           AS bpe_tokens
FROM documents
""",
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and BPE-ish regex pre-
    tokenization (operators/textanalysis.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


@query(
    "doc_repetition",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
g AS (
  SELECT doc_id, tok,
         list_transform(range(1, len(tok)),
                        i -> tok[i] || ' ' || tok[i + 1]) AS g2,
         list_transform(range(1, len(tok) - 1),
                        i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])
             AS g3
  FROM t
)
SELECT doc_id,
       CASE WHEN len(g2) > 0
            THEN round(1 - len(list_distinct(g2)) / len(g2), 6)
            ELSE 0.0 END AS dup_2gram_frac,
       CASE WHEN len(g3) > 0
            THEN round(1 - len(list_distinct(g3)) / len(g3), 6)
            ELSE 0.0 END AS dup_3gram_frac,
       CASE WHEN len(tok) > 0
            THEN round(list_max(list_transform(list_distinct(tok),
                       x -> len(list_filter(tok, y -> y = x))))
                       / len(tok), 6)
            ELSE 0.0 END AS top_token_share
FROM g
""",
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters (duplicated n-gram fractions + top-token
    share) — the boilerplate/spam signal a training-data pipeline
    filters on (operators/textanalysis.py:repetition_features)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = repetition_features("text")
    return docs.select("doc_id", *[c.alias(k) for k, c in feats.items()])


@query(
    "doc_oov_rate",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (SELECT doc_id, len(t) AS wc, unnest(t) AS token FROM toks),
perdoc AS (SELECT doc_id, wc, token, count(*) AS tf
           FROM flat GROUP BY ALL),
stats AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token)
SELECT p.doc_id,
       any_value(p.wc)::INT AS wc,
       sum(CASE WHEN s.df <= 2 THEN p.tf ELSE 0 END)::BIGINT
           AS rare_tokens,
       round(sum(CASE WHEN s.df <= 2 THEN p.tf ELSE 0 END)
             / any_value(p.wc), 6) AS oov_rate
FROM perdoc p JOIN stats s USING (token)
GROUP BY p.doc_id
""",
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-as-model composite: the flagship term statistics serve as
    the vocabulary model, and each document is scored by the fraction
    of its token instances that are corpus-rare (document_frequency ≤
    2) — gibberish/OCR-noise detection for training-data curation.
    Integer counts + one division + round → deterministic across
    engines (no log-likelihood float folds). The stats side is
    vocabulary-sized → broadcast join; per-doc tf comes from the
    exploded histogram, so the corpus passes the wire once."""
    from vspace_spark.operators.stats import term_stats, tokenized_documents

    docs = load_table(spark, sf_dir, "documents")
    stats = term_stats(docs).select("token", "document_frequency")
    perdoc = tokenized_documents(docs)
    joined = perdoc.join(F.broadcast(stats), "token")
    return joined.groupBy("doc_id").agg(
        F.first("wc").alias("wc"),
        F.sum(
            F.when(F.col("document_frequency") <= 2, F.col("tf")).otherwise(0)
        ).alias("rare_tokens"),
        F.round(
            F.sum(
                F.when(F.col("document_frequency") <= 2, F.col("tf")).otherwise(0)
            ).cast("double")
            / F.first("wc"),
            6,
        ).alias("oov_rate"),
    )


@query(
    "doc_train_test_split",
    oracle="""
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS bkt
  FROM documents
)
SELECT doc_id,
       CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
)
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed 80/10/10 split: membership from
    md5(doc_id), reproducible across engines/partitionings — the
    training-pipeline splitter (operators/sampling.py). rand(seed) is
    NOT stable under repartition; hashes are."""
    from vspace_spark.operators.sampling import train_test_split_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", train_test_split_col("doc_id").alias("split")
    )


@query(
    "doc_quality",
    oracle="""
WITH f AS (
  SELECT doc_id,
         len(text) AS n_chars,
         len(string_split(text, ' ')) AS wc,
         len(list_distinct(string_split(text, ' '))) AS distinct_wc,
         len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','an','of','and','to','in','is','it','that')))
             AS stop
  FROM documents
)
SELECT doc_id, n_chars::BIGINT AS n_chars, wc::INT AS wc,
       distinct_wc::INT AS distinct_wc,
       round(alpha / wc, 6) AS mean_word_len,
       round(stop / wc, 6) AS stopword_ratio,
       round(distinct_wc / wc, 6) AS type_token_ratio,
       round(alpha / n_chars, 6) AS alpha_ratio,
       round(0.4 * (CASE WHEN wc BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.3 * least(round(distinct_wc / wc, 6) * 2, 1.0)
           + 0.3 * (CASE WHEN round(stop / wc, 6) >= 0.05 THEN 1.0
                         ELSE round(stop / wc, 6) * 20 END), 6) AS quality
FROM f
""",
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score (Gopher/C4-style heuristics
    on exact counts — one narrow projection, scan-speed at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].cast("bigint").alias("n_chars"),
        f["wc"].alias("wc"),
        f["distinct_wc"].alias("distinct_wc"),
        f["mean_word_len"].alias("mean_word_len"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["type_token_ratio"].alias("type_token_ratio"),
        f["alpha_ratio"].alias("alpha_ratio"),
        quality_score("text").alias("quality"),
    )


@query(
    "doc_language_id",
    oracle="""
WITH h AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
hits AS (
  SELECT doc_id,
    len(list_filter(t, x -> x IN ('der','die','und','ist','das'))) AS h_de,
    len(list_filter(t, x -> x IN ('the','and','of','is','to')))    AS h_en,
    len(list_filter(t, x -> x IN ('el','la','de','es','que')))     AS h_es,
    len(list_filter(t, x -> x IN ('le','la','et','est','que')))    AS h_fr
  FROM h
)
SELECT doc_id,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
       ELSE 'fr' END AS pred_lang
FROM hits
""",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic with deterministic
    (lexicographic) tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id("text").alias("pred_lang"))


@query(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' '))
           AS fp
FROM documents
""",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined document fingerprint (md5 of normalized text) —
    engine-portable digests, the join key for exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "doc_boilerplate_share",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g0 AS (
  SELECT doc_id, unnest(range(len(t) - 4)) AS i, t
  FROM toks WHERE len(t) >= 5
),
g AS (
  SELECT DISTINCT doc_id,
         list_aggregate(t[i + 1:i + 5], 'string_agg', ' ') AS gram
  FROM g0
),
c AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
per AS (
  SELECT doc_id, count(*) AS n_grams,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS shared_grams
  FROM g JOIN c USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.n_grams, 0)::BIGINT AS n_grams,
       coalesce(per.shared_grams, 0)::BIGINT AS shared_grams,
       round(coalesce(per.shared_grams / per.n_grams, 0), 6)::DOUBLE
           AS boilerplate_share
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
""",
)
def doc_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate signal: the fraction of a document's
    DISTINCT 5-grams that also appear in at least one other document —
    the standard curation metric for template/navigation/licence text
    (high share = the document is mostly corpus-repeated spans, the
    RefinedWeb/Gopher-style line-dedup signal lifted to n-grams).

    Scale shape (v2 — same decomposition as ``doc_span_novelty`` v2):
    a gram is shared iff its document frequency ≥ 2, so
    ``shared = n_grams − n_unique`` where a UNIQUE gram has exactly
    one owner. ``n_grams`` is row-local (``size(array_distinct(...))``,
    scan speed, zero shuffle); uniques come from the one gram-keyed
    count (map-side combined, Zipf-bounded key space) filtered to
    df = 1 and re-grouped by owner into a ≤ #docs-row table that joins
    back doc-keyed. The corpus-sized (doc, gram) stream shuffles ONCE
    and never joins — v1 shuffled it twice and joined it against the
    gram counts. Deterministic: integer counts, one division, round(6).
    """
    from vspace_spark.functions.text import ngrams_col, tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(
            F.array_distinct(ngrams_col(tokenize_col("text"), 5))
        ).cast("long").alias("n_grams"),
    )
    g = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(ngrams_col(tokenize_col("text"), 5))
        ).alias("gram"),
    )
    uniques = (
        g.groupBy("gram")
        .agg(F.count("*").alias("nd"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("nd") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique"))
    )
    shared = F.col("n_grams") - F.coalesce(F.col("n_unique"), F.lit(0))
    return base.join(uniques, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        shared.cast("long").alias("shared_grams"),
        F.round(
            F.coalesce(
                shared.cast("double") / F.col("n_grams"), F.lit(0.0)
            ),
            6,
        ).alias("boilerplate_share"),
    )


@query(
    "doc_pii_scrub",
    oracle=r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com'
         || CASE WHEN doc_id % 3 = 0
                 THEN ' cc admin' || doc_id || '@corp.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ''
                 ELSE ' call +1-555-'
                      || lpad((doc_id % 10000)::VARCHAR, 4, '0') END
         || ' from host 10.' || (doc_id % 256) || '.0.'
         || ((doc_id * 7) % 256) AS raw
  FROM documents
),
scrub AS (
  SELECT doc_id, raw,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
         AS clean
  FROM aug
)
SELECT doc_id,
       len(regexp_extract_all(raw,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT
           AS n_emails,
       len(regexp_extract_all(raw,
           '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}'))::INT AS n_phones,
       len(regexp_extract_all(raw,
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::INT
           AS n_ips,
       length(clean)::INT AS clean_len,
       md5(clean) AS clean_md5
FROM scrub
""",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction census: detect and scrub emails / phone numbers /
    IPv4 addresses, returning per-document match counts plus the md5
    of the scrubbed text (the digest makes the oracle verify the exact
    post-scrub BYTES, not just the counts). The fixture corpus carries
    no PII, so the query first plants a deterministic, doc_id-derived
    contact block (1-2 emails, 0-1 phones, 1 IP — counts vary by
    doc_id residue, keeping every output column non-constant); a real
    pipeline applies ``scrub_pii`` to the raw text column directly.

    Scale shape: augmentation, detection, and scrub are all pure
    column expressions (JVM regexp chain inside whole-stage codegen) —
    one corpus scan, zero shuffles, zero Python workers; identical
    per-row cost at 100 TB. Patterns are RE2-safe so the DuckDB
    oracle matches span-for-span (operators/textanalysis.PII_PATTERNS).
    """
    from vspace_spark.operators.textanalysis import pii_counts, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" cc admin"), did.cast("string"),
                F.lit("@corp.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            )
        ),
        F.lit(" from host 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        ((did * 7) % 256).cast("string"),
    )
    aug = docs.select("doc_id", raw.alias("raw"))
    counts = pii_counts(F.col("raw"))
    clean = scrub_pii(F.col("raw"))
    return aug.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        F.length(clean).cast("int").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


@query(
    "source_wc_profile",
    oracle=r"""
WITH w AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\s+'),
             t -> t != ''))::BIGINT AS wc
  FROM documents
),
h AS (SELECT source, wc, count(*)::BIGINT AS cnt FROM w GROUP BY 1, 2),
c AS (
  SELECT source, wc, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY wc
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM h
),
t AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(wc)::BIGINT AS sum_wc,
         min(wc)::BIGINT AS min_wc, max(wc)::BIGINT AS max_wc
  FROM w GROUP BY 1
)
SELECT t.source, t.n_docs,
       round(t.sum_wc / t.n_docs, 6) AS mean_wc,
       t.min_wc, t.max_wc,
       min(CASE WHEN 2 * c.cum >= t.n_docs THEN c.wc END)::BIGINT
           AS p50_wc,
       min(CASE WHEN 20 * c.cum >= 19 * t.n_docs THEN c.wc END)::BIGINT
           AS p95_wc
FROM c JOIN t USING (source)
GROUP BY t.source, t.n_docs, t.sum_wc, t.min_wc, t.max_wc
""",
)
def source_wc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-count profile with EXACT percentiles — the
    data-profiling pass a curation pipeline runs before setting length
    filters: docs, mean/min/max token count, and exact p50/p95.

    Scale shape — exact percentiles WITHOUT sorting the corpus: the
    corpus aggregates into a (source × distinct wc) HISTOGRAM (one
    hash agg, map-side combined — token counts are few-hundred-valued,
    so the histogram is tiny at any corpus size); the cumulative sum
    and quantile picks run over that histogram, so the only window in
    the plan spans #distinct-wc rows per source, never documents. The
    quantile rule is integer-exact (`2·cum ≥ n`, `20·cum ≥ 19·n` —
    the smallest value whose cumulative frequency reaches ⌈q·n⌉, no
    float thresholds), identical in both engines; mean is one division
    then round(6). This sidesteps both the global-sort percentile and
    approx_percentile's engine-specific sketches (the rows-only
    `price_percentiles` path)."""
    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.size(tokenize_col("text")).cast("long").alias("wc")
    )
    h = w.groupBy("source", "wc").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("source")
        .orderBy("wc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.withColumn("cum", F.sum("cnt").over(win))
    t = w.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("wc").cast("long").alias("sum_wc"),
        F.min("wc").alias("min_wc"),
        F.max("wc").alias("max_wc"),
    )
    return (
        c.join(t, "source")
        .groupBy("source", "n_docs", "sum_wc", "min_wc", "max_wc")
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("n_docs"), F.col("wc"))
            ).alias("p50_wc"),
            F.min(
                F.when(
                    20 * F.col("cum") >= 19 * F.col("n_docs"), F.col("wc")
                )
            ).alias("p95_wc"),
        )
        .select(
            "source",
            "n_docs",
            F.round(
                F.col("sum_wc").cast("double") / F.col("n_docs"), 6
            ).alias("mean_wc"),
            "min_wc",
            "max_wc",
            "p50_wc",
            "p95_wc",
        )
    )


@query(
    "doc_length_outliers",
    oracle=r"""
WITH w AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\s+'),
             t -> t != ''))::BIGINT AS wc
  FROM documents
),
h AS (SELECT source, wc, count(*)::BIGINT AS cnt FROM w GROUP BY 1, 2),
c AS (
  SELECT source, wc, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY wc
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM h
),
t AS (SELECT source, count(*)::BIGINT AS n_docs FROM w GROUP BY 1),
p AS (
  SELECT t.source,
         min(CASE WHEN 20 * c.cum >= 19 * t.n_docs THEN c.wc END)::BIGINT
             AS p95_wc
  FROM c JOIN t USING (source) GROUP BY t.source
)
SELECT w.doc_id, w.source, w.wc, p.p95_wc
FROM w JOIN p USING (source)
WHERE w.wc > p.p95_wc
""",
)
def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-driven outlier removal: documents longer than their OWN
    source's exact p95 token count — the per-domain length filter a
    curation pipeline derives from `source_wc_profile` rather than a
    global constant (a 95th-percentile news article and a
    95th-percentile tweet are different lengths). Strictly-greater
    semantics: at most ~5% of each source flagged, zero for sources
    whose p95 equals their max.

    Scale shape: identical to `source_wc_profile` (histogram-cumsum
    exact percentile — the only window spans distinct token counts),
    plus one broadcast of the #sources-row threshold table back onto
    the scan. Integer comparisons throughout."""
    from pyspark.sql import Window

    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        F.size(tokenize_col("text")).cast("long").alias("wc"),
    )
    h = w.groupBy("source", "wc").agg(F.count("*").alias("cnt"))
    win = (
        Window.partitionBy("source")
        .orderBy("wc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.withColumn("cum", F.sum("cnt").over(win))
    t = w.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    p = (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.min(
                F.when(
                    20 * F.col("cum") >= 19 * F.col("n_docs"), F.col("wc")
                )
            ).alias("p95_wc")
        )
    )
    return w.join(F.broadcast(p), "source").filter(
        F.col("wc") > F.col("p95_wc")
    ).select("doc_id", "source", "wc", "p95_wc")


@query(
    "corpus_report",
    oracle="""
WITH f AS (
  SELECT doc_id, source, lang,
         len(string_split(text, ' ')) AS wc,
         string_split(text, ' ') AS toks,
         len(list_distinct(string_split(text, ' '))) AS distinct_wc,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','an','of','and','to','in','is','it',
                        'that'))) AS stop
  FROM documents
),
q AS (
  SELECT source, lang, wc, toks,
         CAST(round(
           0.4 * (CASE WHEN wc BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.3 * least(round(distinct_wc / wc, 6) * 2, 1.0)
           + 0.3 * (CASE WHEN round(stop / wc, 6) >= 0.05 THEN 1.0
                         ELSE round(stop / wc, 6) * 20 END), 6)
           AS DECIMAL(10,6)) AS quality
  FROM f
),
tok AS (
  SELECT source, count(DISTINCT t.tok)::BIGINT AS distinct_tokens
  FROM (SELECT source, unnest(toks) AS tok FROM q) t
  GROUP BY source
)
SELECT q.source,
       count(*)::BIGINT AS n_docs,
       sum(q.wc)::BIGINT AS n_tokens,
       any_value(tok.distinct_tokens) AS distinct_tokens,
       count(DISTINCT q.lang)::BIGINT AS n_langs,
       round(sum(q.quality)::DOUBLE / count(*), 6) AS mean_quality,
       sum(CASE WHEN q.quality < 0.5 THEN 1 ELSE 0 END)::BIGINT
           AS n_low_quality,
       max(q.wc)::BIGINT AS max_wc
FROM q JOIN tok USING (source)
GROUP BY q.source
""",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATA CARD: per-source health metrics a pipeline
    publishes with every snapshot — document/token volumes, lexical
    breadth (distinct tokens), language spread, quality distribution
    (exact-decimal mean + low-quality count), longest document. One
    query a reference user runs daily, composed from the engine's own
    quality machinery so the numbers match the per-doc queries
    row-for-row.

    Float discipline: each doc's round(6) quality is cast to
    DECIMAL(10,6) — exact, so the per-source SUM is order-free — and
    the mean is one double division then round(6) (a double mean of
    the raw scores would be summation-order-dependent across engines).

    Scale shape: one corpus scan feeding two aggregations (per-source
    metrics; per-source distinct tokens via explode + count_distinct,
    both map-side combined) joined on the #sources key. Nothing
    data-sized shuffles twice."""
    from vspace_spark.functions.text import tokenize_col

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        "lang",
        F.size(tokenize_col("text")).alias("wc"),
        quality_score("text").cast("decimal(10,6)").alias("quality"),
    )
    tok = (
        docs.select(
            "source", F.explode(tokenize_col("text")).alias("tok")
        )
        .groupBy("source")
        .agg(F.count_distinct("tok").alias("distinct_tokens"))
    )
    return (
        q.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("wc").cast("long").alias("n_tokens"),
            F.count_distinct("lang").alias("n_langs"),
            F.round(
                F.sum("quality").cast("double") / F.count("*"), 6
            ).alias("mean_quality"),
            F.sum(F.when(F.col("quality") < 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_low_quality"),
            F.max("wc").cast("long").alias("max_wc"),
        )
        .join(tok, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "distinct_tokens",
            "n_langs",
            "mean_quality",
            "n_low_quality",
            "max_wc",
        )
    )
