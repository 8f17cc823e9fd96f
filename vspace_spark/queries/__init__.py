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
# Round-5 window composition (VERDICT r4 "Next round" #3 + re-prove-
# what-changed):
#   - every query whose implementation changed in round 5: the whole
#     exact-collapse family now behind the clone-density probe
#     (jaccard/minhash/simhash/embedding/clusters/keep_best), the
#     keep_best shared-collapse fix (ADVICE r4 high), and the four
#     keyed-temp-dir queries (corpus_job_ini, corpus_jsonl_roundtrip,
#     shard_manifest, stream_dedup_docs_incremental);
#   - the eight streaming consumers refactored in r4
#     (streaming/events.py: chunk-concat stateful fix + shared stream
#     reader) whose last driver rows predate that refactor (r3);
#   - term_stats_unigram / term_stats_by_source rotated back in
#     (NOTES r4: swapped out at round close for the collapse-affected
#     dedup rows);
#   - every r2-latest row (20: the ANN/LSH pair, exact dedup pair,
#     curation/quality/text family, multimodal meta/resize, UDF
#     shapes) — oldest evidence most exposed to drift from the r3/r4
#     text-path changes (rebalance floor, tokenizer reuse);
#   - four r1-latest rows on the same argument (text arrays/positions
#     + two window-function suites);
#   - flagship §2.11 continuity rows.
# Permanently OUT of future windows per VERDICT r3 #8: the rows-only
# xxhash64/matmul *_fast twins (dedup_minhash_lsh_fast,
# ann_lsh_top5_fast, dedup_simhash_fast, ann_bruteforce_top5_fast,
# ann_ivf_pq_top5_fast) — their evidence is the recall/rank-agreement
# property tests against their oracled portable twins, so window
# slots go to oracled queries only (zero no_oracle rows by design).
_WINDOW = [
    # --- r5 code changes (probe + shared collapse + keyed temp dirs)
    "dedup_keep_best",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "stream_dedup_docs_minhash",
    "stream_dedup_docs_incremental",
    "corpus_job_ini",
    "corpus_jsonl_roundtrip",
    "shard_manifest",
    # --- streaming/events.py consumers refactored in r4, last green r3
    "stream_hourly_counts",
    "stream_sliding_counts",
    "stream_user_sessions",
    "stream_stateful_user_totals",
    "stream_dedup_events",
    "stream_purchase_view_join",
    "stream_purchase_view_left_join",
    "stream_category_counts",
    # --- rotated back in per NOTES r4 round-close swap
    "term_stats_unigram",
    "term_stats_by_source",
    # --- r2-latest rows (oldest evidence; text/ANN/curation families
    #     touched by later rebalance/tokenizer changes)
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
    "doc_token_counts",
    "doc_train_test_split",
    "domain_mixture_weights",
    "embedding_norms",
    "grouped_map_source_ranks",
    "map_functions_suite",
    "multimodal_image_meta",
    "multimodal_resize_plan",
    "udtf_token_chunks",
    # --- r1-latest rows: text-path suites
    "doc_token_arrays",
    "token_positions",
    # --- r5 plan changes late in the session (pagerank edge
    #     repartition; q21 refactored into _q21_plan) — re-prove over
    #     the stale-but-unchanged r1 window rows (trailing_30d_spend /
    #     top3_orders_per_customer keep their r1 evidence + the local
    #     oracle-parity re-run)
    "pagerank_purchase_graph",
    "q21_waiting_suppliers",
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
