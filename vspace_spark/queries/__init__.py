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
# Round-13 window composition (re-prove-what-changed + oldest
# evidence, the standing rotation policy):
#   - ALL 11 deferred r9-latest rows — at their 4-round bound, they
#     MUST enter per their own guard (VERDICT r12 #1);
#   - 39 of the 49 r10-latest rows, alphabetical-first (the remaining
#     10 defer to r14 in _DEFERRED below). The alphabetical fill
#     happens to cover every query whose plan round 13 touches
#     (dedup_keep_best / dedup_clusters / dedup_semantic /
#     pagerank_purchase_graph via the persist-floor census), so no
#     swap-ins were needed.
# (r12's window: 7 r12-changed/new gates + all 14 r8-latest + 29 of
# 40 r9-latest — 50/50 green, CORRECTNESS_r12.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their float outputs stay rows-only, but each is pinned by an
# oracled agree_* gate; since round 12 the two streaming ingest fast
# lanes (hash_engine="xxhash64", sig_engine="arrow") are too.
_WINDOW = [
    # --- all 11 deferred r9-latest rows (at their bound)
    "repeat_customers_both_years",
    "rollup_order_totals",
    "shard_manifest",
    "stream_dedup_docs_minhash",
    "stream_term_stats",
    "term_stats_ngram",
    "tfidf_top3_per_doc",
    "token_positions",
    "top3_orders_per_customer",
    "udtf_token_chunks",
    "vocabulary",
    # --- 39 of 49 r10-latest rows (oldest-first fill, alphabetical)
    "ann_ivf_fixed_top5",
    "asof_purchase_prior_view",
    "churned_customers_1995",
    "cohort_daily_retention",
    "customer_running_spend",
    "customers_with_high_value_order",
    "customers_without_orders",
    "daily_event_pivot",
    "dedup_clusters",
    "dedup_fuzzy_pairs",
    "dedup_fuzzy_pairs_auto",
    "dedup_fuzzy_pairs_passjoin",
    "dedup_fuzzy_pairs_qgram",
    "dedup_jaccard_pairs",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_semantic",
    "dedup_simhash",
    "distinct_users_per_type",
    "doc_boilerplate_share",
    "doc_oov_rate",
    "doc_pii_scrub",
    "doc_span_novelty",
    "doc_span_scrub",
    "doc_term_frequencies",
    "doc_training_order",
    "doc_wordcount",
    "events_anomaly_zscore",
    "events_json_stats",
    "events_rollup_cascade",
    "funnel_conversion_window",
    "funnel_view_click_purchase",
    "math_functions_suite",
    "monthly_revenue",
    "multimodal_audio_chunks",
    "multimodal_features",
    "multimodal_phash_dedup",
    "order_rank_suite",
    "pagerank_purchase_graph",
]

# Named deferrals: oracled queries deliberately left OUT of this
# round's window whose driver evidence is older than the staleness
# bound tests/test_registry.py enforces (every oracled query must be
# in _WINDOW, have GREEN evidence within the last 3 completed rounds,
# or be named here with green evidence within the last 4). Keeping
# this list machine-readable is what keeps the rotation honest as the
# registry grows (VERDICT r10 #8) — a row going stale silently now
# fails CI. These 10 are the r10-latest remainder after the r13
# alphabetical fill; they MUST enter the r14 window.
_DEFERRED = [
    "part_brand_except_all",
    "part_brand_intersect_all",
    "part_price_bands",
    "price_percentiles",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "stream_dedup_docs_passjoin",
    "string_functions_suite",
    "trailing_30d_spend",
    "vocab_gated_stats",
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
