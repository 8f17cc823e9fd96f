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
# Round-9 window composition (re-prove-what-changed + oldest evidence,
# VERDICT r8 #2):
#   - the queries whose code changed in round 9 plus the new one:
#     dedup_fuzzy_pairs_passjoin (NEW — PassJoin segment generator,
#     exact at all key lengths), tfidf_top3_per_doc (small-scale plan
#     gate), vocab_gated_stats / q21_waiting_suppliers / vocabulary
#     (persist_shared policy swap), dedup_semantic (hoisted
#     engine/coarse validation), stream_dedup_docs_incremental
#     (index_layout branch added; registered query runs the default
#     partitioned lane);
#   - ALL 10 r5-latest rows (the stalest evidence: the UDF-shape
#     suite, curation split/mixture, resize plan, token arrays);
#   - 30 of the 42 remaining r6-latest rows — the dedup family,
#     corpus pipelines, TPC-H shapes, streaming-dedup twins (the 12
#     deferred to r10: churned_customers_1995, customer_running_spend,
#     customers_with_high_value_order, customers_without_orders,
#     math_functions_suite, order_rank_suite, part_brand_except_all,
#     part_brand_intersect_all, part_price_bands, price_percentiles,
#     string_functions_suite, trailing_30d_spend — all r1/r2-era
#     function-suite/window shapes whose operators are unchanged);
#   - flagship §2.11 continuity rows (vocabulary doubles as an
#     r9-changed row).
# (r8's window: 4 r8-changed + all 17 r4-latest + 24 r5-latest +
# flagship — 50/50 green, CORRECTNESS_r08.json.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their evidence is the recall/rank-agreement property tests against
# their oracled portable twins, so window slots go to oracled queries
# only.
_WINDOW = [
    # --- r9 changes + the new PassJoin generator
    "dedup_fuzzy_pairs_passjoin",
    "tfidf_top3_per_doc",
    "vocab_gated_stats",
    "q21_waiting_suppliers",
    "vocabulary",
    "dedup_semantic",
    "stream_dedup_docs_incremental",
    # --- all 10 r5-latest rows (stalest evidence)
    "doc_token_arrays",
    "doc_token_counts",
    "doc_train_test_split",
    "domain_mixture_weights",
    "embedding_norms",
    "grouped_map_source_ranks",
    "map_functions_suite",
    "multimodal_resize_plan",
    "token_positions",
    "udtf_token_chunks",
    # --- 30 of 42 remaining r6-latest rows (oldest-first fill)
    "corpus_job_ini",
    "corpus_jsonl_roundtrip",
    "corpus_pmi_bigrams",
    "cube_lineitem_counts",
    "customer_order_full_outer",
    "daily_revenue_gapfilled",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_fuzzy_pairs",
    "dedup_jaccard_pairs",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_variant_stats",
    "grouping_sets_revenue",
    "merge_upsert_orders",
    "min_cost_supplier_per_part",
    "multimodal_frame_sample",
    "orders_above_segment_avg",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_revenue",
    "q7_nation_volume",
    "repeat_customers_both_years",
    "rollup_order_totals",
    "shard_manifest",
    "stream_dedup_docs_minhash",
    "top3_orders_per_customer",
    # --- flagship §2.11 continuity
    "term_stats_ngram",
    "normalize_corpus",
    "stream_term_stats",
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
