"""Measure what PQ buys at PROBE time, with index builds amortized
for BOTH probe paths (the honest comparison a vector store cares
about): brute force scans raw vectors; the raw-IVF probe joins its
prebuilt (cell, raw vector) table; the PQ probe joins its prebuilt
(cell, 16 codes) table. All three re-read their input from parquet.

The corpus is replicated N× with shifted ids AND per-replica
component jitter — plain replication makes every query's true top-k
its own exact copies, which any quantizer finds trivially (measured
recall 1.0); jitter restores a non-degenerate neighbor structure.

Metrics: on-disk bytes of each probe's input, logical row widths,
min-of-2 probe wall-clock, and recall vs brute force for both
approximate paths. Results → PERF.md.

Run: python scripts/pq_probe_bench.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from vspace_spark.functions.vectors import cosine_similarity  # noqa: E402
from vspace_spark.io.tables import load_table  # noqa: E402
from vspace_spark.operators.similarity import (  # noqa: E402
    _cell_dist_structs,
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_pq_encode_arrow,
    ivf_pq_probe,
    ivf_pq_probe_arrow,
    portable_hyperplanes,
    pq_codebook,
)
from vspace_spark.session import get_spark  # noqa: E402


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def probe_cells(queries: DataFrame, centers, n_probe: int):
    return queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qv"),
        F.explode(
            F.slice(
                F.array_sort(
                    _cell_dist_structs(F.col("embedding"), centers)
                ),
                1,
                n_probe,
            )
        ).alias("probe"),
    ).select("query_id", "_qv", F.col("probe.cell").alias("cell"))


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pq-probe-bench")
    work = f"/tmp/pq_probe_bench2_x{replicas}"

    emb = load_table(spark, sf_dir, "embeddings")
    n_base = emb.count()
    rep = F.broadcast(spark.range(replicas).select(F.col("id").alias("_r")))
    raw_path = os.path.join(work, "vectors.parquet")
    if not os.path.exists(raw_path):
        # deterministic per-(replica, component) jitter so replicas are
        # near but not identical neighbors
        emb.crossJoin(rep).select(
            (F.col("vec_id") * replicas + F.col("_r")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                + ((F.col("_r") * 37 + i) % 7 - 3).cast("double") * 0.02,
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(raw_path)
    corpus = spark.read.parquet(raw_path)
    queries = corpus.filter(
        (F.col("vec_id") % replicas == 0)
        & (F.col("vec_id") < 10 * replicas)
    )

    centers = portable_hyperplanes(64, 16, salt="c")
    # one-time index builds, untimed (amortized over every probe)
    assigned_path = os.path.join(work, "ivf_assigned.parquet")
    if not os.path.exists(assigned_path):
        corpus.select(
            "vec_id",
            "embedding",
            F.array_sort(
                _cell_dist_structs(F.col("embedding"), centers)
            )[0]["cell"].alias("cell"),
        ).write.mode("overwrite").parquet(assigned_path)
    assigned = spark.read.parquet(assigned_path)

    pc = pq_codebook(corpus)
    codes_path = os.path.join(work, "pq_codes.parquet")
    if not os.path.exists(codes_path):
        # production build path: the matmul encoder emits codes
        # bit-identical to the relational ivf_pq_encode on tie-free
        # data (tests/test_similarity.py) at scan speed — the
        # relational encode's 4096x fan-out took >25 min at 200k
        # vectors in local mode
        pc_rows = [
            (r["sub"], r["cid"], list(r["pv"]))
            for r in pc.collect()  # bounded-collect: m*ksub rows
        ]
        ivf_pq_encode_arrow(corpus, pc_rows=pc_rows).write.mode(
            "overwrite"
        ).parquet(codes_path)
    index = spark.read.parquet(codes_path)

    _pc_rows = []

    def pc_rows_cached():
        if not _pc_rows:
            _pc_rows.extend(
                (r["sub"], r["cid"], list(r["pv"]))
                for r in pc.collect()  # bounded-collect: m*ksub rows
            )
        return _pc_rows

    def raw_ivf_probe():
        cands = (
            assigned.join(F.broadcast(probe_cells(queries, centers, 4)), "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_similarity(
                    F.col("_qv"), F.col("embedding")
                ).alias("_cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_cos"), F.asc("neighbor_id")
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "rank")
        )

    runners = {
        "brute_force_raw": lambda: brute_force_topk(queries, corpus, k=5),
        "brute_force_arrow": lambda: brute_force_topk_arrow(
            queries, corpus, k=5
        ),
        "ivf_probe_raw": raw_ivf_probe,
        "ivf_pq_probe_codes": lambda: ivf_pq_probe(
            queries, index, pc, k=5
        ),
        "ivf_pq_probe_arrow": lambda: ivf_pq_probe_arrow(
            queries, index, pc_rows_cached(), k=5
        ),
    }
    t = {}
    for name, fn in runners.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().count()
            best = min(best, time.perf_counter() - t0)
        t[name] = round(best, 2)

    # ground truth via the arrow path (rank-identical to the fold on
    # tie-free data, tests/test_similarity.py; the fold is quadratic
    # interpreted work at large replica counts)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk_arrow(queries, corpus, k=5).collect()
    }
    raw = {
        (r.query_id, r.neighbor_id) for r in raw_ivf_probe().collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_probe(queries, index, pc, k=5).collect()
    }
    print(
        {
            "replicas": replicas,
            "corpus_vectors": n_base * replicas,
            "raw_vectors_mb": round(dir_bytes(raw_path) / 1e6, 1),
            "ivf_assigned_mb": round(dir_bytes(assigned_path) / 1e6, 1),
            "pq_codes_mb": round(dir_bytes(codes_path) / 1e6, 1),
            "probe_seconds_min_of_2": t,
            "recall_vs_brute": {
                "ivf_raw": round(len(exact & raw) / len(exact), 3),
                "ivf_pq": round(len(exact & pq) / len(exact), 3),
            },
        }
    )


if __name__ == "__main__":
    main()
