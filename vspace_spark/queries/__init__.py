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
# Round-8 window composition (re-prove-what-changed + oldest evidence,
# VERDICT r7 #5):
#   - the four queries whose code changed in round 8: tfidf_top3
#     (df-aggregate persist), dedup_semantic (footer-count K sizing),
#     dedup_fuzzy_pairs_qgram (collapse-domain fix) and its global
#     variant (shares the fixed operator; registered late in r7, so
#     this is also its first window slot);
#   - ALL 17 remaining r4-latest rows (the stalest evidence:
#     relational stragglers q9/q11/q12/q16/q20/q22, IVF-PQ,
#     corpus_report, stream full-join/transition, resample,
#     incremental merge, EWMA, z-order keys, outliers, interpolation,
#     transition matrix);
#   - 24 r5-latest rows (streaming consumer suite and friends) —
#     after r8 no oracled query's latest driver evidence is older
#     than 4 rounds;
#   - flagship §2.11 continuity rows.
# (r7's window: the 3 r7-changed rows + last r1-latest + all 26
# r3-latest + 15 r4-latest — 50/50 green, CORRECTNESS_r07.json.)
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast, dedup_semantic_fast) — their evidence is the
# recall/rank-agreement property tests against their oracled portable
# twins, so window slots go to oracled queries only.
_WINDOW = [
    # --- r8 changes (re-prove changed code: tfidf persist shape,
    # footer-count K sizing, qgram collapse-domain fix — the global
    # variant shares the fixed operator and registered late in r7)
    "tfidf_top3_per_doc",
    "dedup_semantic",
    "dedup_fuzzy_pairs_qgram",
    "dedup_fuzzy_pairs_global",
    # --- all 17 remaining r4-latest rows (stalest evidence)
    "ann_ivf_pq_top5",
    "corpus_report",
    "daily_revenue_interpolated",
    "doc_length_outliers",
    "event_transition_matrix",
    "events_zorder_keys",
    "q9_product_profit",
    "q11_important_stock",
    "q12_late_priority_counts",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    "q22_lapsed_customer_balance",
    "stream_purchase_view_full_join",
    "stream_transition_matrix",
    "temperature_resample",
    "term_stats_incremental_merge",
    "user_value_ewma",
    # --- 24 of 34 r5-latest rows: all 8 streaming consumers + the two
    # r5-plan-change heavies + family reps (the 10 deferred to r9:
    # doc_train_test_split, domain_mixture_weights, embedding_norms,
    # grouped_map_source_ranks, map_functions_suite,
    # multimodal_resize_plan, udtf_token_chunks, doc_token_arrays,
    # token_positions, doc_token_counts)
    "stream_hourly_counts",
    "stream_sliding_counts",
    "stream_user_sessions",
    "stream_stateful_user_totals",
    "stream_dedup_events",
    "stream_purchase_view_join",
    "stream_purchase_view_left_join",
    "stream_category_counts",
    "pagerank_purchase_graph",
    "q21_waiting_suppliers",
    "term_stats_unigram",
    "term_stats_by_source",
    "ann_bruteforce_top5",
    "ann_lsh_top5",
    "curated_corpus",
    "dedup_exact",
    "dedup_exact_normalized",
    "doc_decontamination",
    "doc_fingerprints",
    "doc_language_id",
    "doc_pack_sequences",
    "doc_quality",
    "doc_repetition",
    "multimodal_image_meta",
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
