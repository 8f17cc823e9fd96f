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
# Round-10 window composition (re-prove-what-changed + oldest evidence,
# VERDICT r9 #3):
#   - the queries whose code changed in round 10 plus the new one:
#     dedup_fuzzy_pairs_auto (NEW — occupancy-probe router, VERDICT r9
#     #4); the persist_shared policy swap (VERDICT r9 #1) re-proves
#     every query through the swapped sites: pagerank_purchase_graph
#     (graph.py sym), dedup_clusters / dedup_keep_best (CC labels +
#     collapse), dedup_jaccard_pairs (shingle stream, token-expansion
#     est), dedup_minhash_lsh / dedup_simhash (signature persists),
#     dedup_semantic (core/assigned persists), dedup_fuzzy_pairs /
#     _qgram / _passjoin (collapse-prepass members persist),
#     vocab_gated_stats (token-expansion est — ADVICE r9);
#   - ALL 12 deferred r6-latest rows (the stalest oracled evidence:
#     r1/r2-era function-suite/window shapes named in the r9 window
#     comment);
#   - 24 of the 41 r7-latest rows, alphabetical-first (deferred to
#     r11: q15_top_supplier, q17_small_quantity_revenue,
#     q18_large_quantity_orders, q4_priority_late_orders,
#     q6_forecast_revenue, q8_market_share, source_language_map,
#     source_wc_profile, stratified_sample_uniform, stream_dedup_docs,
#     stream_dedup_embeddings, tfidf_search, token_cms_estimates,
#     user_hll_distinct, user_rfm_segments, user_sessions,
#     vocab_bloom_membership — 15 rows, all r7-green, operators
#     unchanged since).
# (r9's window: 7 r9-changed + all 10 r5-latest + 30 oldest r6-latest
# + flagship — 50/50 green, CORRECTNESS_r09.json.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their evidence is the recall/rank-agreement property tests against
# their oracled portable twins, so window slots go to oracled queries
# only.
_WINDOW = [
    # --- r10 changes + the three new queries
    "dedup_fuzzy_pairs_auto",
    "stream_dedup_docs_passjoin",
    "stream_dedup_embeddings_incremental",
    "pagerank_purchase_graph",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semantic",
    "dedup_fuzzy_pairs",
    "dedup_fuzzy_pairs_qgram",
    "dedup_fuzzy_pairs_passjoin",
    "vocab_gated_stats",
    # --- all 12 deferred r6-latest rows (stalest evidence)
    "churned_customers_1995",
    "customer_running_spend",
    "customers_with_high_value_order",
    "customers_without_orders",
    "math_functions_suite",
    "order_rank_suite",
    "part_brand_except_all",
    "part_brand_intersect_all",
    "part_price_bands",
    "price_percentiles",
    "string_functions_suite",
    "trailing_30d_spend",
    # --- 26 of 41 r7-latest rows (oldest-first fill, alphabetical)
    "ann_ivf_fixed_top5",
    "asof_purchase_prior_view",
    "cohort_daily_retention",
    "daily_event_pivot",
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
    "monthly_revenue",
    "multimodal_audio_chunks",
    "multimodal_features",
    "multimodal_phash_dedup",
    "q10_returned_revenue",
    "q13_customer_distribution",
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
