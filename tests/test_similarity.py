"""Behavioral tests for ANN: LSH top-k recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    random_hyperplanes,
)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).collect()
    approx = lsh_topk(q, emb, spark, k=5, bits=4, tables=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4-bit LSH on random 64-d gaussians is coarse; near-neighbors
    # still land in the same half-spaces far above chance
    assert recall >= 0.3, f"LSH recall {recall}"


def test_lsh_planes_deterministic(spark):
    p1 = random_hyperplanes(8, 4, spark).orderBy("bit").collect()
    p2 = random_hyperplanes(8, 4, spark).orderBy("bit").collect()
    assert [r.plane for r in p1] == [r.plane for r in p2]


def test_portable_planes_bit_exact_across_engines():
    """The ann_lsh_top5 oracle rests on every plane component being
    the SAME 64 bits in Python, the JVM, and DuckDB: 13 md5 hex chars
    (52 bits) divided by 2^51 minus 1 — each step exact in IEEE
    double. Compare Python hashlib against DuckDB verbatim (==, no
    tolerance); the JVM side is covered transitively by the oracle
    parity test."""
    import duckdb

    from vspace_spark.operators.similarity import portable_hyperplanes

    py = portable_hyperplanes(8, 4)
    rows = duckdb.sql(
        """
        SELECT b.b, list_transform(range(0, 8),
          i -> ('0x' || substr(md5(b.b::VARCHAR || ':' || i::VARCHAR),
                1, 13))::BIGINT / 2251799813685248.0 - 1) AS plane
        FROM (SELECT unnest(range(4)) AS b) b ORDER BY b.b
        """
    ).fetchall()
    duck = [list(r[1]) for r in rows]
    assert py == duck


def test_portable_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Same recall bar for the oracle-checked md5-plane variant."""
    from vspace_spark.operators.similarity import portable_hyperplanes

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).collect()
    approx = lsh_topk(
        q, emb, spark, k=5, bits=4, tables=8,
        planes=portable_hyperplanes(64, 32),
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"portable LSH recall {recall}"


def test_bruteforce_self_excluded_and_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(q, emb, k=5)
    rows = out.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).collect()
    approx = ivf_topk(q, emb, k=5, n_cells=16, n_probe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 1/4 of cells on near-uniform data still concentrates
    # true neighbors far above the 25% chance floor
    assert recall >= 0.4, f"IVF recall {recall}"


def test_pq_encode_arrow_matches_relational(spark, sf_dir):
    """The matmul encoder must emit the identical (cell, codes) row
    per vector as the oracle-checked relational encode (the fixture
    has no exact distance ties)."""
    from vspace_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_encode_arrow,
        pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pc = pq_codebook(emb)
    exact = sorted(map(tuple, ivf_pq_encode(emb, pc).collect()))
    pc_rows = [(r["sub"], r["cid"], list(r["pv"])) for r in pc.collect()]
    fast = sorted(
        map(tuple, ivf_pq_encode_arrow(emb, pc_rows=pc_rows).collect())
    )
    assert exact == fast


def test_pq_probe_arrow_matches_relational(spark, sf_dir):
    """The matmul ADC probe must reproduce the relational probe's
    ranks exactly on the tie-free fixture."""
    from vspace_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_probe,
        ivf_pq_probe_arrow,
        pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    pc = pq_codebook(emb)
    index = ivf_pq_encode(emb, pc)
    pc_rows = [(r["sub"], r["cid"], list(r["pv"])) for r in pc.collect()]
    exact = sorted(map(tuple, ivf_pq_probe(q, index, pc, k=5).collect()))
    fast = sorted(
        map(tuple, ivf_pq_probe_arrow(q, index, pc_rows, k=5).collect())
    )
    assert exact == fast


def test_bruteforce_arrow_matches_exact_path(spark, sf_dir):
    """The matmul fast path must reproduce the exact fold path's top-5
    sets (rank-for-rank on the fixture — ties are broken by id in both
    and the fixture has no exact cosine ties)."""
    from vspace_spark.operators.similarity import brute_force_topk_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = sorted(map(tuple, brute_force_topk(q, emb, k=5).collect()))
    fast = sorted(map(tuple, brute_force_topk_arrow(q, emb, k=5).collect()))
    assert exact == fast


def test_ivf_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ compresses each vector to 4 codes — recall vs exact top-5
    must still clear the same bar as the uncompressed IVF probe."""
    from vspace_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).collect()
    approx = ivf_pq_topk(q, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # same probe budget as test_ivf_recall_vs_bruteforce; quantization
    # noise costs some overlap but must stay far above the chance floor
    assert recall >= 0.3, f"IVF-PQ recall {recall}"


def test_ivf_deterministic_across_runs(spark, sf_dir):
    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    r1 = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    r2 = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    assert r1 == r2


def test_ml_idf_agrees_with_exact_df(spark, sf_dir):
    """Spark-ML IDF vs the engine's exact document frequencies: for
    single-bucket tokens, ML's idf = ln((N+1)/(df+1)) must match the
    df from term_stats."""
    import math

    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    from vspace_spark.operators.stats import term_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    stats = {
        r.token: r.document_frequency
        for r in term_stats(docs).collect()
    }

    tokenized = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    htf = HashingTF(inputCol="words", outputCol="raw", numFeatures=1 << 18)
    tf = htf.transform(tokenized)
    model = IDF(inputCol="raw", outputCol="feat").fit(tf)
    idf = model.idf.toArray()

    # map each known token to its hash bucket; with 2^18 buckets and a
    # tiny vocabulary, collisions are unlikely — check agreement on
    # tokens whose bucket holds exactly that token's df
    checked = 0
    for token, df in stats.items():
        bucket = htf.indexOf(token)
        expect = math.log((n_docs + 1) / (df + 1))
        if abs(idf[bucket] - expect) < 1e-9:
            checked += 1
    assert checked >= len(stats) * 0.9, (checked, len(stats))


def test_ivf_arrow_assign_matches_fold_on_fixed_centers(spark, sf_dir):
    """With the SAME codebook and no coarse tier, the arrow matmul
    assigner and the fold struct-argmin must produce identical top-k
    output (both argmin the same distances; ties — absent in the
    fixture — would break to the lowest cell in both)."""
    from vspace_spark.operators.dedup import hierarchical_codebook
    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    fine, _, _ = hierarchical_codebook(emb, 16)
    fold = sorted(
        map(tuple, ivf_topk(q, emb, k=5, centers=fine).collect())
    )
    arrow = sorted(
        map(
            tuple,
            ivf_topk(
                q, emb, k=5, centers=fine, assign_engine="arrow"
            ).collect(),
        )
    )
    assert fold == arrow


def test_ivf_trained_arrow_two_level_recall(spark, sf_dir):
    """The trained-codebook + two-level arrow assignment path (the
    K>=2048 scale lane) must clear the same recall floor as the fold
    path — coarse routing may move borderline vectors between cells
    but cannot wreck neighbor co-location."""
    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).collect()
    approx = ivf_topk(
        q, emb, k=5, n_cells=16, n_probe=4, assign_engine="arrow"
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"trained+arrow IVF recall {recall}"


def test_ivf_assign_engine_validation(spark, sf_dir):
    import pytest

    from vspace_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="unknown assign_engine"):
        ivf_topk(q, emb, assign_engine="numpy").collect()
    strid = emb.select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    with pytest.raises(TypeError, match="integral"):
        ivf_topk(
            strid.filter(F.col("vec_id") < "3"),
            strid,
            assign_engine="arrow",
        )


def test_refine_codebook_improves_centers_and_keeps_contract(spark):
    """Distributed full-corpus Lloyd refinement must (a) reduce
    k-means inertia (each step is an exact Lloyd step — assignment
    then exact per-cell means), (b) preserve the codebook contract
    (center count, coarse ownership with every coarse cell owning
    >= 1 fine center, coarse centers = mean of their fine centers).
    Fixture: 4 planted clusters trained from a deliberately tiny
    sample, so there is real imbalance for refinement to fix."""
    import numpy as np

    from vspace_spark.operators.dedup import hierarchical_codebook
    from vspace_spark.operators.similarity import refine_codebook

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for g in range(4):
        base = np.zeros(6)
        base[g] = 8.0
        for _ in range(300):
            rows.append(
                (vid, [float(x) for x in base + rng.normal(0, 0.3, 6)])
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    X = np.asarray([r[1] for r in rows])

    def inertia(C):
        C = np.asarray(C)
        d = (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        return float((d.min(1) + (X * X).sum(1)).sum())

    fine0, coarse0, owner0 = hierarchical_codebook(
        df, 4, sample_rows=48, iters=2
    )
    fine1, coarse1 = refine_codebook(
        df, fine0, (coarse0, owner0), steps=2
    )
    assert len(fine1) == len(fine0)
    assert coarse1[1] == [int(o) for o in owner0]  # ownership preserved
    assert set(coarse1[1]) == set(range(len(coarse1[0])))
    # coarse centers are the means of their fine centers
    CF = np.asarray(fine1)
    own = np.asarray(coarse1[1])
    for c, cc in enumerate(coarse1[0]):
        np.testing.assert_allclose(cc, CF[own == c].mean(0), atol=1e-9)
    assert inertia(fine1) < inertia(fine0) * 0.999, (
        inertia(fine0),
        inertia(fine1),
    )
