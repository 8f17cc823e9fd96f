"""Query registry — the declared operator surface.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline additions)
lands here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
paired (when SQL-expressible) with an ANSI-SQL oracle that DuckDB runs
over the same parquet tables. The driver's correctness harness compares
row-count + schema + order-insensitive value hash, with columns sorted
by name — so BOTH sides alias every computed column identically.

Float discipline (so value hashes match deterministically):
- money aggregates: cast operands to DECIMAL before SUM (exact), round
  the final value, cast back to DOUBLE;
- similarity scores: return membership/ranks, not raw floats, or round
  aggressively and order with deterministic tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 queries in
# registration order each round. This explicit window (not import-order
# side effects) decides who gets this round's hard driver signal; the
# rotation policy and the per-round coverage ledger live in NOTES.md.
#
# Round-7 window composition (re-prove-what-changed + oldest evidence,
# VERDICT r6 #3):
#   - the queries changed or added in round 7: multimodal_phash_dedup
#     (the oracle's HUGEINT->BIGINT cast — the r6 red row, values were
#     already proven identical), dedup_semantic (codebook now sized
#     K = greatest(16, N/512) in query AND oracle), and the new
#     dedup_fuzzy_pairs_qgram (positional qgram inverted-index
#     candidate generation);
#   - monthly_revenue — the only r1-latest row left (yielded its r6
#     slot to a late addition);
#   - ALL 26 r3-latest rows, the stalest remaining evidence (the
#     relational3 batch, the events consumer suite, tfidf pair,
#     text-stats rows, stream dedup pair, as-of join, fixed-codebook
#     IVF, audio chunks);
#   - 15 of the 32 r4-latest rows (sketch family, curation/
#     textanalysis suites, multimodal features, events analytics) —
#     the rest rotate in r8;
#   - flagship §2.11 continuity rows.
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast) — their evidence is the
# recall/rank-agreement property tests against their oracled portable
# twins, so window slots go to oracled queries only.
_WINDOW = [
    # --- r7 changes/additions
    "multimodal_phash_dedup",
    "dedup_semantic",
    "dedup_fuzzy_pairs_qgram",
    # --- last r1-latest row
    "monthly_revenue",
    # --- all 26 r3-latest rows (stalest evidence in the ledger)
    "ann_ivf_fixed_top5",
    "asof_purchase_prior_view",
    "cohort_daily_retention",
    "daily_event_pivot",
    "distinct_users_per_type",
    "doc_oov_rate",
    "doc_term_frequencies",
    "doc_wordcount",
    "events_json_stats",
    "funnel_view_click_purchase",
    "multimodal_audio_chunks",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_quantity_orders",
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q8_market_share",
    "source_language_map",
    "stream_dedup_docs",
    "stream_dedup_embeddings",
    "tfidf_search",
    "tfidf_top3_per_doc",
    "user_sessions",
    "vocab_gated_stats",
    # --- 15 of 32 r4-latest rows (sketches, curation, multimodal)
    "token_cms_estimates",
    "user_hll_distinct",
    "vocab_bloom_membership",
    "doc_boilerplate_share",
    "doc_pii_scrub",
    "doc_span_novelty",
    "doc_span_scrub",
    "doc_training_order",
    "source_wc_profile",
    "stratified_sample_uniform",
    "multimodal_features",
    "events_anomaly_zscore",
    "events_rollup_cascade",
    "funnel_conversion_window",
    "user_rfm_segments",
    # --- flagship §2.11 continuity
    "term_stats_ngram",
    "normalize_corpus",
    "vocabulary",
    "stream_term_stats",
    "stream_term_stats_ngram",
]


def load_all() -> None:
    """Import every query module (side effect: registration), then
    reorder the registry so ``_WINDOW`` occupies the first 50 slots."""
    from vspace_spark.queries import (  # noqa: F401
        vspace,
        streaming,
        textanalysis,
        curation,
        udfshapes,
        similarity,
        dedup,
        multimodal,
        analytics,
        relational,
        relational2,
        relational3,
        extras,
    )

    ordered: dict[str, QueryFn] = {}
    for name in _WINDOW:
        ordered[name] = QUERIES[name]  # KeyError = window out of sync
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
