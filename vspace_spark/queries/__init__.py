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
# Round-3 window composition:
#   - the 15 queries that had never earned a driver row in r1/r2
#     (VERDICT r2 "missing" #1) — relational3's TPC-H shapes, the
#     xxhash64 *_fast twins, ann_ivf_fixed_top5 (the oracled IVF twin,
#     swapped in for rows-only ann_ivf_top5 per VERDICT #4),
#     stream_dedup_embeddings, multimodal audio/features;
#   - every query whose code or input type changed this round
#     (corpus_job_ini de-collect, tfidf_search df-after-filter,
#     µs-exact sessionize, and all events consumers — Spark 4.1 now
#     reads the NANOS events column as TIMESTAMP_NTZ);
#   - the flagship corpus/streaming rows kept green every round.
# Rotated out: long-green dedup/similarity/text-analysis/UDF rows
# (two rounds of green evidence) and the two rows-only entries
# (ann_ivf_top5, ml_tfidf_features) whose families are covered by
# oracled twins inside the window.
_WINDOW = [
    # never driver-checked before round 3
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_quantity_orders",
    "dedup_minhash_lsh_fast",
    "ann_lsh_top5_fast",
    "dedup_simhash_fast",
    "ann_ivf_fixed_top5",
    "stream_dedup_embeddings",
    "multimodal_audio_chunks",
    "multimodal_features",
    # changed this round
    "corpus_job_ini",
    "tfidf_search",
    "user_sessions",
    # events consumers (input type changed to TIMESTAMP_NTZ)
    "stream_hourly_counts",
    "stream_sliding_counts",
    "stream_user_sessions",
    "stream_dedup_events",
    "stream_stateful_user_totals",
    "stream_purchase_view_join",
    "stream_purchase_view_left_join",
    "stream_category_counts",
    "funnel_view_click_purchase",
    "cohort_daily_retention",
    "events_json_stats",
    "daily_event_pivot",
    "distinct_users_per_type",
    "asof_purchase_prior_view",
    # flagship continuity
    "term_stats_unigram",
    "term_stats_ngram",
    "term_stats_by_source",
    "doc_term_frequencies",
    "doc_wordcount",
    "normalize_corpus",
    "vocabulary",
    "vocab_gated_stats",
    "source_language_map",
    "tfidf_top3_per_doc",
    "stream_term_stats",
    "stream_term_stats_ngram",
    "stream_dedup_docs",
    # family representatives — every remaining consumer of an operator
    # changed this round (tokenized_documents / signature builders
    # gained the conditional rebalance): their r2 evidence predates the
    # change, so they re-prove here
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_jaccard_pairs",
    "dedup_clusters",
    "doc_oov_rate",
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
