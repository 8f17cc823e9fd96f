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
# Round-4 window composition (VERDICT r3 "Next round" #1/#2/#8):
#   - ALL 37 oracled queries that have never earned a driver row
#     (every round-3 addition): TPC-H q9/q12/q16/q20/q21/q22,
#     pagerank, EWMA/transition/funnel/RFM/z-score analytics, the
#     portable sketch suite (CMS/HLL/Bloom), rollup cascade, revenue
#     interpolation, keep-best canonicalization, IVF-PQ ANN, the
#     span/PII/boilerplate/length/report curation ops, shard manifest
#     + training order + sampling, the streaming additions, the
#     incremental stats merge, the JSONL round-trip, and z-order keys;
#   - multimodal_features, now FULLY ORACLED (r3's driver crash on its
#     raw array<float> column is fixed by the exact byte projection);
#   - the dedup/term-stats family representatives whose input path
#     changed this round (rebalance_for_compute gained the min-bytes
#     floor — results invariant, but the evidence should postdate the
#     change);
#   - flagship §2.11 continuity rows.
# Permanently OUT of future windows per VERDICT #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast) — their evidence is the recall/rank-agreement
# property tests against their oracled portable twins, so window
# slots go to oracled queries only (zero no_oracle rows by design).
_WINDOW = [
    # never driver-checked before round 4 (all oracled)
    "q9_product_profit",
    "q12_late_priority_counts",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_lapsed_customer_balance",
    "pagerank_purchase_graph",
    "user_value_ewma",
    "event_transition_matrix",
    "funnel_conversion_window",
    "user_rfm_segments",
    "events_anomaly_zscore",
    "token_cms_estimates",
    "user_hll_distinct",
    "vocab_bloom_membership",
    "events_rollup_cascade",
    "daily_revenue_interpolated",
    "dedup_keep_best",
    "ann_ivf_pq_top5",
    "doc_span_novelty",
    "doc_span_scrub",
    "doc_pii_scrub",
    "doc_boilerplate_share",
    "doc_length_outliers",
    "corpus_report",
    "source_wc_profile",
    "shard_manifest",
    "doc_training_order",
    "temperature_resample",
    "stratified_sample_uniform",
    "stream_dedup_docs_minhash",
    "stream_dedup_docs_incremental",
    "stream_purchase_view_full_join",
    "stream_transition_matrix",
    "term_stats_incremental_merge",
    "corpus_jsonl_roundtrip",
    "events_zorder_keys",
    # crashed the r3 harness; now oracled (exact md5-byte projection)
    "multimodal_features",
    # added this round (TPC-H Q11 shape) — never checked, so it takes
    # a slot ahead of a third-time flagship re-proof
    "q11_important_stock",
    # operator code changed this round (exact-collapse prepass +
    # rebalance floor) — re-prove one consumer per affected family;
    # embedding_cosine and clusters inherit the collapse through the
    # shared operator, so their pre-change green rows (r2/r3) predate
    # the code now running
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "term_stats_ngram",
    # flagship §2.11 continuity (unigram/by_source rotate out this
    # round: r2+r3 green, unchanged semantics, and the changed
    # term-stats input path re-proves through term_stats_ngram)
    "normalize_corpus",
    "vocabulary",
    "corpus_job_ini",
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
