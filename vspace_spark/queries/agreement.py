"""Driver-visible agreement gates for the rows-only Arrow/trained
twins (VERDICT r10 #3): each query runs BOTH lanes of a twin pair and
returns the exact disagreement count as one row, with a trivially
portable ``SELECT 0`` oracle — converting the local property-test
evidence ("the fast twin agrees with the oracled portable twin") into
a hard driver-green row without violating the r3 rows-only ruling
(the fast twins' own float outputs never face a cross-engine hash).

Measured before registration (scripts/agree_probe.py at sf0.01 and
sf0.001): output disagreement is exactly 0 for the three portable-vs-
arrow pairs. The TRAINED two-level lane is different — its router
agrees with the flat argmin over the same trained centers on ~98%
(60/500 cell flips at sf0.01, real data being less clustered than
the planted fixture), so ``SELECT 0`` on output diff would be a
flaky gate; its query instead counts violations of the invariants
that ARE exact by construction (one row per vector, kept ⇔
duplicate_of IS NULL, duplicate_of strictly smaller than the dup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.queries import query

_ZERO_ORACLE = "SELECT CAST(0 AS BIGINT) AS disagreements"


def _diff_count(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact bag-semantics symmetric difference, as one bigint row."""
    return (
        a.exceptAll(b)
        .unionByName(b.exceptAll(a))
        .agg(F.count(F.lit(1)).alias("disagreements"))
    )


@query("agree_ann_bruteforce_fast", oracle=_ZERO_ORACLE)
def agree_ann_bruteforce_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ann_bruteforce_top5_fast` (numpy-matmul mapInPandas scoring,
    operators/similarity.py:brute_force_topk_arrow) must emit the
    exact (query_id, neighbor_id, rank) set of the oracle-checked
    fold twin (brute_force_topk). Ties are broken by neighbor_id on
    both lanes, so parity is deterministic wherever margins exceed
    BLAS-vs-fold summation noise — which the probe confirmed at the
    driver's SF."""
    from vspace_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return _diff_count(
        brute_force_topk(q, emb, k=5),
        brute_force_topk_arrow(q, emb, k=5),
    )


@query("agree_ann_ivf_pq_fast", oracle=_ZERO_ORACLE)
def agree_ann_ivf_pq_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ann_ivf_pq_top5_fast` (matmul encode + ADC probe) vs the
    relational IVF-PQ (`ivf_pq_topk`, which carries the family's SQL
    oracle): codes, ADC sums, and ranks must line up row-for-row —
    the PQ distance is a 16-term fixed-order chain on both lanes."""
    from vspace_spark.operators.similarity import (
        ivf_pq_encode_arrow,
        ivf_pq_probe_arrow,
        ivf_pq_topk,
        pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    pc_rows = [
        (r["sub"], r["cid"], list(r["pv"]))
        for r in pq_codebook(emb).collect()
        # bounded-collect: m*ksub codebook rows
    ]
    index = ivf_pq_encode_arrow(emb, pc_rows=pc_rows)
    return _diff_count(
        ivf_pq_topk(q, emb, k=5),
        ivf_pq_probe_arrow(q, index, pc_rows, k=5),
    )


@query("agree_dedup_semantic_fast", oracle=_ZERO_ORACLE)
def agree_dedup_semantic_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_semantic_fast` (engine='arrow': matmul cell assignment +
    per-cell Gram scoring) vs the oracle-checked interpreted fold
    lane, over the SAME portable md5 codebook and K ∝ N sizing — the
    [vec_id, cell, kept, duplicate_of] outputs must be identical."""
    from vspace_spark.operators.dedup import semantic_dedup
    from vspace_spark.operators.scale import footer_row_count
    from vspace_spark.operators.similarity import portable_hyperplanes

    emb = load_table(spark, sf_dir, "embeddings")
    n = footer_row_count(emb)
    if n is None:
        n = emb.count()  # bounded-collect: one scalar, sizes the codebook
    centers = portable_hyperplanes(64, max(16, n // 512), salt="s")
    return _diff_count(
        semantic_dedup(emb, centers, threshold=0.4, engine="fold"),
        semantic_dedup(emb, centers, threshold=0.4, engine="arrow"),
    )


@query(
    "agree_dedup_semantic_trained",
    oracle="SELECT CAST(0 AS BIGINT) AS invariant_violations, "
    "CAST(0 AS BIGINT) AS id_mismatches",
)
def agree_dedup_semantic_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`dedup_semantic_trained`'s exact structural contract, as a
    driver row: every input vector appears exactly once and only
    there (id_mismatches: full-outer anti count vs the input id set),
    kept ⇔ duplicate_of IS NULL, and a duplicate always points at a
    strictly smaller id (the greedy first-writer-wins rule). Output-
    level diff vs the flat argmin is deliberately NOT the gate — the
    two-level router's ≥98% agreement property is real but inexact
    (~12% of sf0.01 vectors sit near trained-cell boundaries), and
    lives in tests/test_dedup.py where a tolerance is expressible."""
    from vspace_spark.operators.dedup import semantic_dedup_two_level
    from vspace_spark.operators.scale import footer_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    n = footer_row_count(emb)
    if n is None:
        n = emb.count()  # bounded-collect: one scalar, sizes the codebook
    out = semantic_dedup_two_level(emb, k=max(16, n // 512), threshold=0.4)
    viol = out.filter(
        (F.col("kept") != F.col("duplicate_of").isNull())
        | (F.col("duplicate_of") >= F.col("vec_id"))
    ).agg(F.count(F.lit(1)).alias("invariant_violations"))
    # bag-semantics symmetric difference on the id column: catches
    # missing ids, foreign ids, AND duplicated output rows
    mism = (
        out.select("vec_id")
        .exceptAll(emb.select("vec_id"))
        .unionByName(emb.select("vec_id").exceptAll(out.select("vec_id")))
        .agg(F.count(F.lit(1)).alias("id_mismatches"))
    )
    return viol.crossJoin(mism)  # broadcast-scalar join: 1x1 rows
