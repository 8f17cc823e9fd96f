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
# Round-11 window composition (re-prove-what-changed + oldest
# evidence, VERDICT r10 #1/#3):
#   - the 2 queries through round 11's incremental.py changes
#     (raw-cosine threshold filter, ADVICE r10 medium; attempted-
#     before-append replay ledger, ADVICE r10 low);
#   - the 4 NEW oracled agreement gates for the never-driver-checked
#     fast twins (queries/agreement.py, VERDICT r10 #3);
#   - ALL 17 deferred r7-latest rows (the stalest oracled evidence,
#     named in the r10 window comment);
#   - 27 of the 41 r8-latest rows, alphabetical-first (deferred to
#     r12, staying r8-latest: stream_hourly_counts,
#     stream_purchase_view_full_join, stream_purchase_view_join,
#     stream_purchase_view_left_join, stream_sliding_counts,
#     stream_stateful_user_totals, stream_term_stats_ngram,
#     stream_transition_matrix, stream_user_sessions,
#     temperature_resample, term_stats_by_source,
#     term_stats_incremental_merge, term_stats_unigram,
#     user_value_ewma — 14 rows, all r8-green, operators unchanged
#     since; tests/test_registry.py's staleness guard tracks them).
# (r10's window: 14 r10-changed/new + all 12 r6-latest + 24 of 41
# r7-latest, alphabetical — 50/50 green, CORRECTNESS_r10.json; its
# comment's "26 of 41"/"15 rows" were miscounts for 24/17, ADVICE
# r10 low.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their float outputs stay rows-only, but as of round 11 each is
# pinned by an oracled agree_* gate in the window below.
_WINDOW = [
    # --- r11 changes + the four new agreement gates
    "stream_dedup_embeddings_incremental",
    "stream_dedup_docs_incremental",
    "agree_ann_bruteforce_fast",
    "agree_ann_ivf_pq_fast",
    "agree_dedup_semantic_fast",
    "agree_dedup_semantic_trained",
    # --- all 17 deferred r7-latest rows (stalest evidence)
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_quantity_orders",
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q8_market_share",
    "source_language_map",
    "source_wc_profile",
    "stratified_sample_uniform",
    "stream_dedup_docs",
    "stream_dedup_embeddings",
    "tfidf_search",
    "token_cms_estimates",
    "user_hll_distinct",
    "user_rfm_segments",
    "user_sessions",
    "vocab_bloom_membership",
    # --- 27 of 41 r8-latest rows (oldest-first fill, alphabetical)
    "ann_bruteforce_top5",
    "ann_ivf_pq_top5",
    "ann_lsh_top5",
    "corpus_report",
    "curated_corpus",
    "daily_revenue_interpolated",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_fuzzy_pairs_global",
    "doc_decontamination",
    "doc_fingerprints",
    "doc_language_id",
    "doc_length_outliers",
    "doc_pack_sequences",
    "doc_quality",
    "doc_repetition",
    "event_transition_matrix",
    "events_zorder_keys",
    "multimodal_image_meta",
    "q11_important_stock",
    "q12_late_priority_counts",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    "q22_lapsed_customer_balance",
    "q9_product_profit",
    "stream_category_counts",
    "stream_dedup_events",
]

# Named deferrals: oracled queries deliberately left OUT of this
# round's window whose driver evidence is older than the staleness
# bound tests/test_registry.py enforces (every oracled query must be
# in _WINDOW, have evidence within the last 3 completed rounds, or be
# named here with evidence within the last 4). Keeping this list
# machine-readable is what keeps the rotation honest as the registry
# grows (VERDICT r10 #8) — a row going stale silently now fails CI.
_DEFERRED = [
    "stream_hourly_counts",
    "stream_purchase_view_full_join",
    "stream_purchase_view_join",
    "stream_purchase_view_left_join",
    "stream_sliding_counts",
    "stream_stateful_user_totals",
    "stream_term_stats_ngram",
    "stream_transition_matrix",
    "stream_user_sessions",
    "temperature_resample",
    "term_stats_by_source",
    "term_stats_incremental_merge",
    "term_stats_unigram",
    "user_value_ewma",
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
        agreement,
    )

    ordered: dict[str, QueryFn] = {}
    for name in _WINDOW:
        ordered[name] = QUERIES[name]  # KeyError = window out of sync
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
