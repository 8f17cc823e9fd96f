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
# Round-12 window composition (re-prove-what-changed + oldest
# evidence, the standing rotation policy):
#   - the 7 queries through round 12's changes: the 2 NEW oracled
#     agreement gates for the r11 ingest fast lanes
#     (agree_incr_minhash_xxhash64 / agree_incr_embedding_arrow,
#     VERDICT r11 #2), the 3 agreement gates reworked margin-aware
#     (VERDICT r11 #6 / ADVICE r11), stream_dedup_embeddings_
#     incremental (through incremental.py's _auto_lsh_layout change,
#     VERDICT r11 #5), and user_rfm_segments (fused
#     ntile_scalable_multi plan, VERDICT r11 #7);
#   - ALL 14 deferred r8-latest rows — at their 4-round bound, they
#     MUST enter per their own guard (VERDICT r11 #1);
#   - 29 of the 40 r9-latest rows, alphabetical-first (the remaining
#     11 defer to r13 in _DEFERRED below).
# (r11's window: 2 r11-changed + 4 new agree gates + all 17
# r7-latest + 27 of 41 r8-latest — 50/50 green, CORRECTNESS_r11.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast, dedup_semantic_trained)
# — their float outputs stay rows-only, but each is pinned by an
# oracled agree_* gate; since round 12 the two streaming ingest fast
# lanes (hash_engine="xxhash64", sig_engine="arrow") are too.
_WINDOW = [
    # --- r12 changes + the two new ingest-lane agreement gates
    "agree_incr_minhash_xxhash64",
    "agree_incr_embedding_arrow",
    "agree_ann_bruteforce_fast",
    "agree_ann_ivf_pq_fast",
    "agree_dedup_semantic_fast",
    "stream_dedup_embeddings_incremental",
    "user_rfm_segments",
    # --- all 14 deferred r8-latest rows (at their bound)
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
    # --- 29 of 40 r9-latest rows (oldest-first fill, alphabetical)
    "corpus_job_ini",
    "corpus_jsonl_roundtrip",
    "corpus_pmi_bigrams",
    "cube_lineitem_counts",
    "customer_order_full_outer",
    "daily_revenue_gapfilled",
    "dedup_embedding_cosine",
    "doc_token_arrays",
    "doc_token_counts",
    "doc_train_test_split",
    "domain_mixture_weights",
    "embedding_norms",
    "events_variant_stats",
    "grouped_map_source_ranks",
    "grouping_sets_revenue",
    "map_functions_suite",
    "merge_upsert_orders",
    "min_cost_supplier_per_part",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "normalize_corpus",
    "orders_above_segment_avg",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q21_waiting_suppliers",
    "q3_top_unshipped_orders",
    "q5_nation_revenue",
    "q7_nation_volume",
]

# Named deferrals: oracled queries deliberately left OUT of this
# round's window whose driver evidence is older than the staleness
# bound tests/test_registry.py enforces (every oracled query must be
# in _WINDOW, have GREEN evidence within the last 3 completed rounds,
# or be named here with green evidence within the last 4). Keeping
# this list machine-readable is what keeps the rotation honest as the
# registry grows (VERDICT r10 #8) — a row going stale silently now
# fails CI. These 11 are the r9-latest remainder after the r12
# alphabetical fill; they MUST enter the r13 window.
_DEFERRED = [
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
