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
# Round-6 window composition (re-prove-what-changed + oldest evidence):
#   - the five queries ADDED in round 6 (dedup_semantic,
#     multimodal_phash_dedup, events_variant_stats,
#     dedup_fuzzy_pairs, corpus_pmi_bigrams);
#   - every query whose implementation changed in round 6: the
#     incremental growing-index dedup (localCheckpoint'ed result +
#     per-writer dynamic partition overwrite in the accreting-index
#     contract), the exact-collapse family (the clone-density probe is
#     now memoized per plan — cost-only by construction, but the code
#     under these rows changed), and the three keyed-temp-dir queries
#     (SPARK_GRAFT_CONCURRENT key path added);
#   - 29 of the 30 r1-latest rows — the stalest evidence in the
#     ledger (the relational/window/set-op suites last driver-proven
#     in round 1; monthly_revenue yielded its slot to the late-added
#     corpus_pmi_bigrams and rotates in r7 with the as-of join);
#   - flagship §2.11 continuity rows.
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast) — their evidence is the recall/rank-agreement
# property tests against their oracled portable twins, so window
# slots go to oracled queries only (zero no_oracle rows by design).
_WINDOW = [
    # --- new in r6
    "dedup_semantic",
    "multimodal_phash_dedup",
    "events_variant_stats",
    "dedup_fuzzy_pairs",
    "corpus_pmi_bigrams",
    # --- r6 code changes: incremental dedup + accreting index
    "stream_dedup_docs_incremental",
    # --- r6 code changes: collapse family (memoized clone probe)
    "dedup_keep_best",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "stream_dedup_docs_minhash",
    # --- r6 code changes: keyed temp dirs (concurrency key path)
    "corpus_job_ini",
    "corpus_jsonl_roundtrip",
    "shard_manifest",
    # --- r1-latest rows (29 of 30): stalest driver evidence
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_revenue",
    "q7_nation_volume",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "min_cost_supplier_per_part",
    "merge_upsert_orders",
    "daily_revenue_gapfilled",
    "top3_orders_per_customer",
    "customer_running_spend",
    "trailing_30d_spend",
    "rollup_order_totals",
    "cube_lineitem_counts",
    "grouping_sets_revenue",
    "customers_without_orders",
    "customers_with_high_value_order",
    "part_price_bands",
    "repeat_customers_both_years",
    "churned_customers_1995",
    "customer_order_full_outer",
    "order_rank_suite",
    "part_brand_intersect_all",
    "part_brand_except_all",
    "price_percentiles",
    "string_functions_suite",
    "math_functions_suite",
    "orders_above_segment_avg",
    "multimodal_frame_sample",
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
