"""Similarity search over embedding columns (BASELINE.json north star).

Two paths, same contract:
- brute-force top-k: exact, one broadcast of the (small) query set
  against the full corpus — linear scan, embarrassingly parallel, the
  correctness baseline and often the right answer when queries are few.
- LSH-bucketed top-k: random-hyperplane signatures bucket the corpus;
  each query probes only its bucket(s). Sub-linear per query; recall
  traded via bands/bits. The 100 TB path (the corpus side is hashed
  once and can be written out partitioned by bucket).

No Python in either path — cosine is zip_with/aggregate (JVM), ranking
is a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vspace_spark.functions.vectors import cosine_similarity, dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Broadcast the queries (small side) against the corpus scan; rank
    with a window partitioned by query. Ties broken by neighbor id so
    the result is deterministic. Self-matches excluded.

    Returns ``[query_id, neighbor_id, rank]``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def random_hyperplanes(dim: int, bits: int, spark) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: component (b, i) is
    derived from xxhash64(b, i) scaled to [-1, 1]. Computed ONCE as a
    tiny broadcastable table — reproducible across runs and engines
    (no RNG state)."""
    rows = spark.range(bits).select(
        F.col("id").cast("int").alias("bit"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.xxhash64(F.col("id"), i).cast("double") / F.lit(float(2**63))
            ),
        ).alias("plane"),
    )
    return rows


def portable_hyperplanes(
    dim: int, bits: int, salt: str = ""
) -> list[list[float]]:
    """Deterministic hyperplanes an ANSI-SQL engine can reproduce:
    component (b, i) = md5("b:i") first 13 hex chars → 52-bit int,
    scaled to [-1, 1). Every step is EXACT in IEEE double (52-bit
    mantissa, division by 2^51 is an exponent shift, the final -1
    cannot round), so Python, the JVM, and DuckDB all hold the same
    64 bits — the whole LSH bucket assignment becomes oracle-checkable.
    Tiny (bits × dim floats), computed driver-side, embedded as
    literals. ``salt`` draws an independent set from the same scheme
    (e.g. "c" for the fixed-codebook IVF centroids)."""
    import hashlib

    return [
        [
            int(
                hashlib.md5(f"{salt}{b}:{i}".encode()).hexdigest()[:13],
                16,
            )
            / float(2**51)
            - 1.0
            for i in range(dim)
        ]
        for b in range(bits)
    ]


def lsh_signature(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-of-dot-product signature as a bigint bucket id (≤ 63 bits)."""
    sig = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(v) for v in plane]))
        sig = sig + F.when(d > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0))
    return sig


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centers: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into cells; each query
    scores only its ``n_probe`` nearest cells. The inverted-file
    structure every vector database uses, expressed relationally:
    assign = broadcast-centroid argmin, probe = equi-join on cell id.

    ``centers=None`` trains a KMeans codebook (the quality path —
    engine-specific, rows-only under the driver gate); passing fixed
    ``centers`` (e.g. ``portable_hyperplanes(dim, n_cells, salt="c")``)
    makes assignment + probing + ranking fully deterministic and
    SQL-reproducible — the oracle-checked path. Both use the same
    argmin/probe/score plan.

    At 100 TB: training samples a fraction, assignment is a narrow map,
    and the cell-partitioned corpus can be written out bucketed by cell
    so probes become partition-pruned scans.
    """
    if centers is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        with_vec = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            array_to_vector(F.col(vec_col)).alias("_features"),
        )
        km = KMeans(k=n_cells, seed=seed, featuresCol="_features")
        model = km.fit(with_vec.select("_features"))
        assigned = model.transform(with_vec).select(
            "neighbor_id", "_cv", F.col("prediction").alias("cell")
        )
        centers = [c.tolist() for c in model.clusterCenters()]
    else:
        assigned = None  # built below once cell_dists exists

    def cell_dists(vec: F.Column) -> F.Column:
        # squared L2 to each centroid, as (dist, cell) structs
        return F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(float(x)) for x in c]),
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("dist"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centers)
            ]
        )

    if assigned is None:
        # fixed codebook: corpus assignment = argmin over the same
        # (dist, cell) structs — array_sort's (dist, cell) field order
        # gives the deterministic lowest-cell tie-break the oracle's
        # ORDER BY dist, cell mirrors
        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            F.array_sort(cell_dists(F.col(vec_col)))[0]["cell"].alias(
                "cell"
            ),
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.slice(F.array_sort(cell_dists(F.col(vec_col))), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "_qv", F.col("probe.cell").alias("cell"))

    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    spark,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k with OR-amplified LSH: ``tables`` independent
    ``bits``-bit signatures; a corpus vector is a candidate if it shares
    ANY table's bucket with the query (P ≈ 1-(1-p^bits)^tables for
    per-hyperplane agreement p). Candidates per query ≈
    tables × N / 2^bits, still ≪ N.

    ``planes`` overrides the hyperplane source (pass
    :func:`portable_hyperplanes` for the md5-derived oracle-checkable
    set); the default stays the xxhash64-derived table.

    At 100 TB the corpus side is hashed once (narrow projection) and the
    exploded (table, bucket) index can be persisted/partitioned; only
    candidate buckets are ever scored.

    Returns ``[query_id, neighbor_id, rank]`` (rank within candidates).
    """
    if planes is None:
        planes = [
            r["plane"]
            for r in random_hyperplanes(dim, bits * tables, spark)
            .orderBy("bit")
            .collect()  # bounded-collect: bits*tables hyperplane rows
        ]

    def signatures(vec: F.Column) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_signature(
                        vec, planes[t * bits : (t + 1) * bits]
                    ).alias("bucket"),
                )
                for t in range(tables)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.explode(signatures(F.col(vec_col))).alias("sig"),
    ).select("neighbor_id", "_cv", "sig.table", "sig.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(signatures(F.col(vec_col))).alias("sig"),
    ).select("query_id", "_qv", "sig.table", "sig.bucket")
    candidates = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
