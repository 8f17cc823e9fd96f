"""Training-data curation queries: benchmark decontamination,
sequence packing, and domain-mixture reweighting — the operations a
pretraining pipeline runs between raw corpus and trainer input,
expressed over the same ``documents`` table as the flagship stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.functions.text import ngrams_col, tokenize_col
from vspace_spark.io.tables import load_table
from vspace_spark.operators.sampling import train_test_split_col
from vspace_spark.queries import query

# Contamination gram width. Real pipelines use ~13-gram collision
# (GPT-3/PaLM decontamination); 8 keeps the check non-vacuous on the
# short synthetic fixture docs while exercising the identical plan.
_DECON_N = 8


@query(
    "doc_decontamination",
    oracle=f"""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
             AS bkt
  FROM documents
),
g AS (
  SELECT doc_id, bkt, unnest(range(len(t) - {_DECON_N} + 1)) AS i, t
  FROM s WHERE len(t) >= {_DECON_N}
),
ng AS (
  SELECT doc_id, bkt,
         list_aggregate(t[i + 1:i + {_DECON_N}], 'string_agg', ' ')
             AS gram
  FROM g
),
ev AS (SELECT DISTINCT gram FROM ng WHERE bkt >= 9000)
SELECT ng.doc_id, count(DISTINCT ng.gram)::BIGINT AS contaminated_ngrams
FROM ng JOIN ev USING (gram)
WHERE ng.bkt < 8000
GROUP BY ng.doc_id
""",
)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training-split documents that
    share any 8-gram with the held-out test split (the same
    content-addressed md5 split as ``doc_train_test_split``), with the
    count of distinct colliding grams. Train docs with no collision
    are absent (nothing to scrub).

    Scale shape: the eval side is benchmark-sized (a test suite, not a
    corpus) — its distinct grams broadcast, so the training corpus is
    scanned once with a map-side semi filter and the only shuffle is
    the per-doc count aggregation. The train side's grams come from
    the same linear zip_with pass as the flagship n-gram stats.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        train_test_split_col("doc_id").alias("split"),
        tokenize_col("text").alias("t"),
    ).filter(F.size("t") >= _DECON_N)
    grams = toks.select(
        "doc_id",
        "split",
        F.explode(ngrams_col(F.col("t"), _DECON_N)).alias("gram"),
    )
    ev = (
        grams.filter(F.col("split") == "test").select("gram").distinct()
    )
    hits = grams.filter(F.col("split") == "train").join(
        F.broadcast(ev), "gram"
    )
    return hits.groupBy("doc_id").agg(
        F.count_distinct("gram").alias("contaminated_ngrams")
    )


@query(
    "doc_pack_sequences",
    oracle="""
WITH w AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
             t -> t != '')) AS wc
  FROM documents
),
c AS (
  SELECT doc_id, wc,
         (sum(wc) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - wc)::BIGINT AS start_offset
  FROM w WHERE wc > 0
)
SELECT doc_id, wc::INT AS wc, start_offset,
       (start_offset // 512)::BIGINT AS first_seq,
       ((start_offset + wc - 1) // 512 - start_offset // 512
        + 1)::BIGINT AS n_seqs
FROM c
""",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing plan (budget 512 tokens): each
    document's global token offset in doc_id order, the training
    sequence its first token lands in, and how many sequences it spans.
    The prefix sum is TWO-PHASE (``operators.packing.pack_plan``) — a
    bare ``Window.orderBy`` would funnel the whole corpus through one
    task, the exact single-reducer shape VERDICT r1 flagged on
    vocabulary ids. All-BIGINT arithmetic (``div`` here, ``//`` in the
    oracle — CAST would round vs truncate differently, NOTES.md)."""
    from vspace_spark.operators.packing import pack_plan
    from vspace_spark.operators.scale import est_relation_bytes

    docs = load_table(spark, sf_dir, "documents")
    wc = docs.select(
        "doc_id", F.size(tokenize_col("text")).alias("wc")
    ).filter(F.col("wc") > 0)
    # slim (doc_id, wc) rows sized by exact footer count (docs is a
    # bare scan) — slim floor inside pack_plan
    return pack_plan(
        wc,
        wc_col="wc",
        order_col="doc_id",
        budget=512,
        est_bytes=est_relation_bytes(docs, row_bytes=32),
    )


@query(
    "curated_corpus",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x != '')
             AS toks,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
             AS bkt
  FROM documents
),
f AS (
  SELECT doc_id, len(toks) AS wc, bkt
  FROM t
  WHERE len(toks) >= 20
    AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.3
),
keeper AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
g AS (
  SELECT doc_id, bkt, unnest(range(len(toks) - {_DECON_N} + 1)) AS i,
         toks
  FROM t WHERE len(toks) >= {_DECON_N}
),
ng AS (
  SELECT doc_id, bkt,
         list_aggregate(toks[i + 1:i + {_DECON_N}], 'string_agg', ' ')
             AS gram
  FROM g
),
ev AS (SELECT DISTINCT gram FROM ng WHERE bkt >= 9000),
contaminated AS (
  SELECT DISTINCT ng.doc_id FROM ng JOIN ev USING (gram)
  WHERE ng.bkt < 8000
),
surv AS (
  SELECT f.doc_id, f.wc
  FROM f JOIN keeper USING (doc_id)
  WHERE f.bkt < 8000
    AND f.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
packed AS (
  SELECT doc_id, wc,
         (sum(wc) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - wc)::BIGINT AS start_offset
  FROM surv
)
SELECT doc_id, wc::INT AS wc, start_offset,
       (start_offset // 512)::BIGINT AS first_seq
FROM packed
""",
)
def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline as one declarative plan:
    length + lexical-diversity quality gate → exact-dedup keeper
    (min-id per text) → train split (content-addressed md5 buckets) →
    benchmark decontamination (drop any train doc sharing an 8-gram
    with the test split) → concat-then-chunk pack offsets over the
    survivors. What a pretraining data pipeline actually runs between
    raw corpus and trainer input, composed from this repo's operators
    with every stage under the same value-hash oracle.

    Scale shape: the corpus is tokenized ONCE (shared subplan for the
    quality gate and the gram explode); the dedup keeper is one hash
    agg; eval grams broadcast; the anti-join is broadcast-sized (the
    contaminated-id list); packing's prefix sum is the two-phase
    shape. No stage reads the text twice.
    """
    from vspace_spark.operators.packing import pack_plan
    from vspace_spark.operators.sampling import hash_bucket
    from vspace_spark.operators.scale import est_relation_bytes

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "text",
        tokenize_col("text").alias("toks"),
        hash_bucket("doc_id").alias("bkt"),
    )
    f = toks.withColumn("wc", F.size("toks")).filter(
        (F.col("wc") >= 20)
        & (
            F.size(F.array_distinct("toks")).cast("double") / F.col("wc")
            >= 0.3
        )
    )
    keeper = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    grams = toks.filter(F.size("toks") >= _DECON_N).select(
        "doc_id",
        "bkt",
        F.explode(ngrams_col(F.col("toks"), _DECON_N)).alias("gram"),
    )
    ev = grams.filter(F.col("bkt") >= 9000).select("gram").distinct()
    contaminated = (
        grams.filter(F.col("bkt") < 8000)
        .join(F.broadcast(ev), "gram")
        .select("doc_id")
        .distinct()
    )
    surv = (
        f.join(keeper.select("doc_id"), "doc_id", "left_semi")
        .filter(F.col("bkt") < 8000)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "wc")
    )
    # survivors ⊆ corpus rows and the packed row is slim (doc_id, wc)
    # — upper bound by exact footer rows of the bare docs scan
    return pack_plan(
        surv,
        wc_col="wc",
        order_col="doc_id",
        est_bytes=est_relation_bytes(docs, row_bytes=32),
    ).select("doc_id", "wc", "start_offset", "first_seq")


@query(
    "domain_mixture_weights",
    oracle="""
WITH s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(list_filter(string_split_regex(text, '\\s+'),
             t -> t != '')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_tokens)::BIGINT AS tot, count(*)::BIGINT AS k FROM s)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 6) AS token_share,
       round(tot / (k * n_tokens), 6) AS weight_uniform
FROM s, t
""",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture accounting: per-source document/token counts,
    each source's share of the token stream, and the resampling weight
    that would flatten the mixture to uniform (weight > 1 ⇒ upsample).
    The mixture table is #sources-sized, so the corpus-total scalar
    rides a broadcast nested-loop join onto it (the asserted-correct
    shape for scalar joins, tests/test_plans.py) — the corpus itself
    is touched once, by the groupBy scan. Single exact-int division
    then round(6) on each float column (cross-engine float
    discipline, NOTES.md)."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokenize_col("text"))).cast("long").alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_tokens").cast("long").alias("_tot"),
        F.count("*").cast("long").alias("_k"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_tot"), 6).alias("token_share"),
        F.round(
            F.col("_tot") / (F.col("_k") * F.col("n_tokens")), 6
        ).alias("weight_uniform"),
    )


# Span width for intra-corpus novelty. 8 matches the decontamination
# gram so the two checks share their scan/gram machinery at scale.
_SPAN_N = 8


@query(
    "doc_span_novelty",
    oracle=f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, unnest(range(len(t) - {_SPAN_N} + 1)) AS i, t
  FROM s WHERE len(t) >= {_SPAN_N}
),
ng AS (
  SELECT DISTINCT doc_id,
         list_aggregate(t[i + 1:i + {_SPAN_N}], 'string_agg', ' ')
             AS gram
  FROM g
),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM ng GROUP BY gram)
SELECT ng.doc_id,
       count(*)::BIGINT AS n_spans,
       count(*) FILTER (first_doc < ng.doc_id)::BIGINT AS n_dup_spans,
       round(count(*) FILTER (first_doc < ng.doc_id) * 1.0 / count(*),
             6) AS dup_share
FROM ng JOIN firsts USING (gram)
GROUP BY ng.doc_id
""",
)
def doc_span_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus span novelty — the C4-style "drop repeated spans"
    signal adapted to the fixture's single-line documents: for each
    document, how many of its distinct 8-token spans first occurred in
    an EARLIER document (first-writer-wins by doc_id, the same
    keep-first convention as ``dedup_exact``). ``dup_share`` near 1
    marks a document that is almost entirely recycled text — the
    span-level complement of the whole-doc MinHash dedup.

    Scale shape (v2 — the v1 join shape was the bench's slowest row,
    13 s at sf0.1): ``n_dup_spans = n_spans − n_first_spans``, so the
    corpus-sized (doc, gram) pair stream never joins anything.
    ``n_spans`` is ROW-LOCAL (``size(array_distinct(ngrams))`` — scan
    speed, zero shuffle); first-occurrence is the one gram-keyed hash
    aggregation (min doc_id, partial-combined map-side), immediately
    re-grouped by winner doc into a ≤ #docs-row table that joins back
    doc-keyed. Net: ONE data-sized shuffle (by gram) instead of v1's
    two shuffles + corpus-sized join — min-of-2 at sf0.1: 3.4 s → 1.2 s
    clean (13 s → 1.2 s as benched under concurrent load). No
    all-pairs comparison anywhere; the gram key space is
    distinct-span-sized, like `doc_decontamination` (same gram width).
    dup_share is a single exact-integer division then round(6)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize_col("text").alias("t")).filter(
        F.size("t") >= _SPAN_N
    )
    base = toks.select(
        "doc_id",
        F.size(F.array_distinct(ngrams_col(F.col("t"), _SPAN_N)))
        .cast("long")
        .alias("n_spans"),
    )
    ng = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(ngrams_col(F.col("t"), _SPAN_N))
        ).alias("gram"),
    )
    n_first = (
        ng.groupBy("gram")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_first"))
    )
    return base.join(n_first, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        (F.col("n_spans") - F.coalesce(F.col("n_first"), F.lit(0)))
        .cast("long")
        .alias("n_dup_spans"),
        F.round(
            (
                F.col("n_spans") - F.coalesce(F.col("n_first"), F.lit(0))
            ).cast("double")
            / F.col("n_spans"),
            6,
        ).alias("dup_share"),
    )


@query(
    "stratified_sample_uniform",
    oracle=r"""
WITH w AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\s+'),
             t -> t != ''))::BIGINT AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 5))::BIGINT AS b
  FROM documents
),
s AS (SELECT source, sum(n_tokens)::BIGINT AS n_src FROM w GROUP BY source),
t AS (SELECT sum(n_src)::BIGINT AS tot, count(*)::BIGINT AS k FROM s)
SELECT w.doc_id, w.source, w.n_tokens
FROM w JOIN s USING (source), t
WHERE w.b::HUGEINT * t.k * s.n_src < t.tot::HUGEINT * 1048576
""",
)
def stratified_sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic downsampling toward a uniform domain
    mixture (operators/sampling.py:stratified_sample_to_uniform) — the
    executable counterpart of ``domain_mixture_weights``: instead of
    REPORTING the resampling weights, actually draw the subset. Keeps
    every document of under-represented sources and a content-addressed
    ``total/(k × source_tokens)`` fraction of over-represented ones.
    The keep decision is exact integer arithmetic on a 20-bit md5
    bucket (DECIMAL(38,0) vs the oracle's HUGEINT — no float rate, no
    cast-rounding divergence), so membership is bit-stable across
    engines, runs, and repartitioning.

    Scale shape: one #sources-row aggregation broadcast back onto the
    scan; the filter is a pure column expression that pushes to the
    scan stage. The corpus is touched once; nothing data-sized
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        F.size(tokenize_col("text")).cast("long").alias("n_tokens"),
    )
    from vspace_spark.operators.sampling import stratified_sample_to_uniform

    return stratified_sample_to_uniform(
        w, key="doc_id", group="source", size_col="n_tokens"
    ).select("doc_id", "source", "n_tokens")


@query(
    "doc_span_scrub",
    oracle=f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, unnest(range(len(t) - {_SPAN_N} + 1)) AS i, t
  FROM s WHERE len(t) >= {_SPAN_N}
),
ng AS (
  SELECT doc_id, i,
         list_aggregate(t[i + 1:i + {_SPAN_N}], 'string_agg', ' ')
             AS gram
  FROM g
),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM ng GROUP BY gram),
dup AS (
  SELECT ng.doc_id, ng.i FROM ng JOIN firsts USING (gram)
  WHERE first_doc < ng.doc_id
),
covg AS (SELECT doc_id, unnest(range(i, i + {_SPAN_N})) AS j FROM dup),
cov AS (SELECT DISTINCT doc_id, j FROM covg),
tp AS (SELECT doc_id, unnest(range(len(t))) AS j, t FROM s),
tok AS (SELECT doc_id, j, t[j + 1] AS tok FROM tp),
kept AS (
  SELECT tok.doc_id, tok.j, tok.tok FROM tok
  ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(tok, ' ' ORDER BY j) AS scrub
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       len(s.t)::BIGINT AS n_tokens,
       (len(s.t) - coalesce(agg.n_kept, 0))::BIGINT AS n_removed,
       md5(coalesce(agg.scrub, '')) AS scrub_md5
FROM s LEFT JOIN agg USING (doc_id)
""",
)
def doc_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring scrubbing — the REMOVAL counterpart of
    ``doc_span_novelty``'s signal, after Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"):
    every 8-token span first seen in an EARLIER document
    (first-writer-wins by doc_id) is cut from the later document,
    overlapping cuts merged, and the survivors rejoined in order. The
    first writer keeps its text intact; later documents lose exactly
    the recycled token ranges. Output is one row per document with the
    original/removed token counts and the md5 of the scrubbed text —
    byte-level evidence that both engines rebuilt the identical string.

    Scale shape: span extraction is the flagship's linear zip_with
    n-gram pass with positions (`posexplode`); first-occurrence is one
    gram-keyed hash aggregation (map-side partial min); the duplicate
    verdict is a gram-keyed equi-join between two children already
    partitioned on gram. Covered-position fan-out is bounded by
    8 x (duplicate span starts) — proportional to the duplicated text,
    not the corpus — and the anti-join + reconstruction are keyed by
    (doc_id, position) / doc_id, both high-cardinality. The in-doc
    reorder (`array_sort` over (position, token) structs) is per-doc
    bounded work, never a global sort. No all-pairs stage anywhere;
    degenerate corpora (one span shared by every doc) fan out to
    8 spans per doc, not quadratic pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize_col("text").alias("t"))
    pos_grams = toks.filter(F.size("t") >= _SPAN_N).select(
        "doc_id",
        F.posexplode(ngrams_col(F.col("t"), _SPAN_N)).alias("i", "gram"),
    )
    firsts = pos_grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    dup = (
        pos_grams.join(firsts, "gram")
        .filter(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id", "i")
    )
    cov = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("i"), F.col("i") + F.lit(_SPAN_N - 1))
        ).alias("j"),
    ).distinct()
    tokpos = toks.select("doc_id", F.posexplode("t").alias("j", "tok"))
    kept = tokpos.join(cov, ["doc_id", "j"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                # bounded-list: per-doc token positions (doc-length bounded)
                F.array_sort(F.collect_list(F.struct("j", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("scrub"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.md5(F.coalesce(F.col("scrub"), F.lit(""))).alias("scrub_md5"),
        )
    )


# Trainer shard budget. 4096 tokens ⇒ 7 shards at the smallest
# fixture scale — small enough to eyeball, non-degenerate everywhere.
_SHARD_TOKENS = 4096


@query(
    "shard_manifest",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
             t -> t != '')) AS wc
  FROM documents
),
c AS (
  SELECT doc_id, wc,
         (sum(wc) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - wc)::BIGINT AS so
  FROM w WHERE wc > 0
)
SELECT (so // {_SHARD_TOKENS})::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       sum(wc)::BIGINT AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c GROUP BY 1
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bounded training shards, end-to-end: assign every document
    to the shard its first token lands in (documents never split;
    ~4096 tokens per shard ± one document), WRITE the corpus
    partitioned by shard, and return the manifest a data loader plans
    epochs from (per-shard doc/token counts + doc-id span). The shard
    assignment is the same two-phase prefix sum as ``pack_sequences``
    — no single-reducer window — and the write is one pass,
    partitioned by the shard column (`io/shards.py`).

    The oracle reproduces the prefix-sum arithmetic exactly (integer
    division on exclusive running sums), so the driver checks the
    actual shard boundaries, not just counts."""
    from vspace_spark.io.shards import write_token_shards
    from vspace_spark.io.sinks import keyed_tmp_dir

    docs = load_table(spark, sf_dir, "documents")
    # fixed overwritten keyed path (leak class from ADVICE r3/r4);
    # write_token_shards uses static overwrite, so the whole root is
    # replaced each run — no stale shard dirs survive
    out = keyed_tmp_dir("vspace_shards", sf_dir)
    from vspace_spark.operators.scale import est_relation_bytes

    return write_token_shards(
        docs,
        out,
        wc=F.size(tokenize_col("text")),
        tokens_per_shard=_SHARD_TOKENS,
        # the planned relation carries the full document text (it is
        # written partitioned by shard) → decoded corpus bytes is the
        # honest estimate; wide shape keeps the 512 MB floor
        est_bytes=est_relation_bytes(docs),
    )


@query(
    "doc_training_order",
    oracle="""
SELECT doc_id,
       (row_number() OVER (
          ORDER BY md5('order:0:' || doc_id::VARCHAR), doc_id)
        - 1)::BIGINT AS position
FROM documents
""",
)
def doc_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle
    (operators/ordering.py:epoch_shuffle): every document's global
    position for epoch 0, ordered by a salted content hash — the
    reproducible corpus permutation a trainer consumes (and the order
    ``shard_manifest`` packs by). Same order on any engine or
    partitioning; a different epoch salt draws an independent
    permutation.

    Scale shape: the oracle's one-line global ``row_number`` would be
    a single-reducer window in Spark — instead the position comes from
    two-phase numbering (range-repartition on the uniform hash key →
    per-partition row_number in parallel → broadcast cumulative
    offsets, one count row per partition), the same plan the
    vocabulary id assignment uses, with NO data-sized single-task
    stage. Plan-asserted in tests/test_plans.py."""
    from vspace_spark.operators.ordering import epoch_shuffle
    from vspace_spark.operators.scale import est_relation_bytes

    docs = load_table(spark, sf_dir, "documents")
    # the numbered relation is (doc_id + 32-B md5 key + ints) — sized
    # by exact footer rows so the corpus-row-scaled persist inside the
    # two-phase numbering crosses the disk floor at scale instead of
    # heap-parking (VERDICT r12 #5)
    return epoch_shuffle(
        docs.select("doc_id"),
        key="doc_id",
        epoch=0,
        est_bytes=est_relation_bytes(docs, row_bytes=64),
    ).select("doc_id", "position")


@query(
    "temperature_resample",
    oracle=r"""
WITH w AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\s+'),
             t -> t != ''))::BIGINT AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 5))::BIGINT AS b
  FROM documents
),
s AS (SELECT source, sum(n_tokens)::BIGINT AS w_src FROM w GROUP BY source),
t AS (SELECT min(w_src)::BIGINT AS w_min FROM s)
SELECT w.doc_id, w.source, w.n_tokens
FROM w JOIN s USING (source), t
WHERE w.b::HUGEINT * w.b * s.w_src < t.w_min::HUGEINT * 1099511627776
""",
)
def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixture (τ = 1/2,
    operators/sampling.py:temperature_sample): draw the training
    subset whose per-source token mass is ∝ sqrt(original mass) —
    the standard compromise between natural and uniform mixtures
    (sibling of ``stratified_sample_uniform``, which is the τ→0
    limit). The sqrt keep-rate is enforced by SQUARED integer
    arithmetic on the 20-bit md5 bucket (b²·W_src < W_min·2⁴⁰) —
    no float rate exists anywhere, so membership is bit-identical
    on both engines at any scale.

    Scale shape: one #sources-row aggregation broadcast back; the
    keep decision is a pure column predicate on the single corpus
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        F.size(tokenize_col("text")).cast("long").alias("n_tokens"),
    )
    from vspace_spark.operators.sampling import temperature_sample

    return temperature_sample(
        w, key="doc_id", group="source", size_col="n_tokens"
    ).select("doc_id", "source", "n_tokens")
