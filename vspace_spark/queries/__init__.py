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


def load_all() -> None:
    """Import every query module (side effect: registration).

    Import order is deliberate: the driver's correctness harness checks
    the first 50 queries in registration order, so the flagship corpus
    queries (``vspace``), streaming, text analysis, UDF shapes,
    similarity, dedup, and multimodal register before the TPC-H-style
    relational suites (which have the longest green history and can
    rotate out of the checked window).
    """
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
