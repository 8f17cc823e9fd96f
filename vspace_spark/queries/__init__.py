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
# Round-14 window composition (re-prove-what-changed + oldest
# evidence, the standing rotation policy):
#   - ALL 10 deferred r10-latest rows — at their bound, they MUST
#     enter per their own guard (VERDICT r13 #10);
#   - 4 r12-latest rows whose code round 14 TOUCHES (the incremental
#     replay engine and its agreement gates):
#     stream_dedup_embeddings_incremental, agree_incr_embedding_arrow,
#     agree_incr_minhash_xxhash64, agree_dedup_semantic_fast;
#   - 36 of the 45 r11-latest rows: the r14-touched
#     stream_dedup_docs_incremental (incremental engine) +
#     ann_ivf_pq_top5 (encode rewrite) — the latter already in the
#     alphabetical prefix — plus the alphabetical-first fill; the
#     9 remaining r11 rows defer to r15 in _DEFERRED below.
# (r13's window: 11 at-bound r9 rows + 39 r10 rows — 50/50 green,
# CORRECTNESS_r13.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their float outputs stay rows-only, but each is pinned by an
# oracled agree_* gate; since round 12 the two streaming ingest fast
# lanes (hash_engine="xxhash64", sig_engine="arrow") are too.
_WINDOW = [
    # --- all 10 deferred r10-latest rows (at their bound)
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
    # --- 4 r12-latest rows re-proved because round 14 touches their
    #     code (incremental replay engine + agreement gates)
    "stream_dedup_embeddings_incremental",
    "agree_incr_embedding_arrow",
    "agree_incr_minhash_xxhash64",
    "agree_dedup_semantic_fast",
    # --- 36 of 45 r11-latest rows (oldest-first fill, alphabetical,
    #     plus the r14-touched stream_dedup_docs_incremental swapped
    #     in for the alphabetically-last stream_category_counts)
    "agree_dedup_semantic_trained",
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
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_quantity_orders",
    "q20_dominant_suppliers",
    "q22_lapsed_customer_balance",
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "source_language_map",
    "source_wc_profile",
    "stratified_sample_uniform",
    "stream_dedup_docs_incremental",
]

# Named deferrals: oracled queries deliberately left OUT of this
# round's window whose driver evidence is older than the staleness
# bound tests/test_registry.py enforces (every oracled query must be
# in _WINDOW, have GREEN evidence within the last 3 completed rounds,
# or be named here with green evidence within the last 4). Keeping
# this list machine-readable is what keeps the rotation honest as the
# registry grows (VERDICT r10 #8) — a row going stale silently now
# fails CI. These 9 are the r11-latest remainder after the r14 fill;
# they MUST enter the r15 window.
_DEFERRED = [
    "stream_category_counts",
    "stream_dedup_docs",
    "stream_dedup_embeddings",
    "stream_dedup_events",
    "tfidf_search",
    "token_cms_estimates",
    "user_hll_distinct",
    "user_sessions",
    "vocab_bloom_membership",
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
