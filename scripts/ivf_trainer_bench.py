"""IVF trainer bench: hierarchical-Lloyd vs pyspark.ml KMeans
(VERDICT r8 #1 — the last scale-weak lane).

`ivf_topk(centers=None)` used to fit a pyspark.ml KMeans codebook:
correct, but the trainer is an ITERATIVE sequence of Spark jobs —
each Lloyd step is a full corpus pass (assignment shuffle + centroid
agg), so at real codebook sizes (K >= 2048, the scale the K ∝ N rule
demands at corpus scale) training costs minutes before the first
probe runs. `hierarchical_codebook` (operators/dedup.py) trains the
same-quality codebook driver-side on a deterministic hash-chosen
sample — one bounded collect + numpy Lloyd — in seconds, and returns
the coarse tier that makes ASSIGNMENT two-level
(N·(Kc + K/Kc)·D instead of N·K·D flops).

This script measures, on N distinct deterministic vectors (dim 64):
  - train_lloyd:  hierarchical_codebook wall time
  - train_ml:     pyspark.ml KMeans fit wall time (same K; skippable —
                  it is the slow lane being replaced)
  - e2e_arrow:    ivf_topk probe end-to-end with the trained codebook,
                  two-level arrow assignment (n_queries queries)
  - recall@5 of each trainer's codebook vs the exact arrow brute force

Run:  python scripts/ivf_trainer_bench.py --n 200000 --k 2048 [--ml]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F


def synth(spark, n: int, dim: int = 64):
    vecs = (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast(
                    "float"
                )
                / 500.0,
            ).alias("embedding"),
        )
        .persist()
    )
    vecs.count()
    return vecs


def synth_structured(
    spark, n: int, dim: int = 64, n_clusters: int = 4096,
    spread: float = 0.08,
):
    """Planted-cluster corpus (VERDICT r9 #6): n vectors in
    ``n_clusters`` true Gaussian-ish blobs — cluster centers on the
    same [-2,2] lattice as :func:`synth`, each vector = its cluster
    center + uniform noise of half-width ``spread``·4. Unlike the
    hash-uniform corpus (structure-free: recall differences are
    noise-bound, PERF.md round 9) this gives a trainer real cell
    structure to find, so trained-vs-ml recall deltas are signal."""
    cid = (F.xxhash64(F.col("id")) % n_clusters + n_clusters) % n_clusters
    vecs = (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("vec_id"),
            cid.alias("_cid"),
        )
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    (F.xxhash64(F.col("_cid"), i) % 1000).cast("float")
                    / 500.0
                    + (F.xxhash64(F.col("vec_id"), i, F.lit(7)) % 1000)
                    .cast("float")
                    / 500.0
                    * F.lit(spread)
                ),
            ).alias("embedding"),
        )
        .persist()
    )
    vecs.count()
    return vecs


def recall_at_5(spark, queries, corpus, out) -> float:
    from vspace_spark.operators.similarity import brute_force_topk_arrow

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk_arrow(queries, corpus, k=5).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    return len(exact & got) / len(exact)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, nargs="+", default=[2048])
    ap.add_argument("--n-probe", type=int, default=64)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument(
        "--ml",
        action="store_true",
        help="also time the pyspark.ml KMeans trainer (the replaced "
        "slow lane — minutes at K>=2048)",
    )
    ap.add_argument(
        "--refine",
        type=int,
        default=0,
        metavar="STEPS",
        help="also run STEPS distributed full-corpus Lloyd refinement "
        "passes on the trained codebook (refine_codebook) and report "
        "the recall recovery vs the sample-only trainer",
    )
    ap.add_argument(
        "--structured",
        type=int,
        default=0,
        metavar="N_CLUSTERS",
        help="use the planted-cluster corpus (VERDICT r9 #6) with this "
        "many true clusters instead of the hash-uniform one",
    )
    ap.add_argument(
        "--spread",
        type=float,
        default=0.08,
        help="structured-corpus noise half-width relative to the "
        "center lattice (0.08 = well-separated, ~0.5+ = overlapping)",
    )
    ap.add_argument(
        "--probe-sweep",
        type=int,
        nargs="*",
        default=[],
        help="extra n_probe values to re-probe the TRAINED codebook "
        "with (the +n_probe recall buy-back curve)",
    )
    args = ap.parse_args()

    from vspace_spark.operators.dedup import hierarchical_codebook
    from vspace_spark.operators.similarity import ivf_topk
    from vspace_spark.session import get_spark

    spark = get_spark("ivf-trainer-bench")
    if args.structured:
        vecs = synth_structured(
            spark, args.n, args.dim, n_clusters=args.structured,
            spread=args.spread,
        )
    else:
        vecs = synth(spark, args.n, args.dim)
    q = vecs.filter(F.col("vec_id") < args.n_queries)

    for k in args.k:
        t0 = time.perf_counter()
        fine, coarse, owner = hierarchical_codebook(vecs, k)
        t_lloyd = time.perf_counter() - t0
        print(
            f"n={args.n} K={k}: train_lloyd {t_lloyd:.1f} s "
            f"({len(fine)} fine / {len(coarse)} coarse centers)",
            flush=True,
        )

        t0 = time.perf_counter()
        out = ivf_topk(
            q,
            vecs,
            k=5,
            n_cells=k,
            n_probe=args.n_probe,
            centers=fine,
            assign_engine="arrow",
        )
        # force via count of the (already final) projection
        n_out = out.count()
        t_e2e = time.perf_counter() - t0
        r = recall_at_5(spark, q, vecs, out)
        print(
            f"n={args.n} K={k}: e2e_arrow(flat assign) {t_e2e:.1f} s "
            f"rows={n_out} recall@5={r:.3f}",
            flush=True,
        )

        # trained path exactly as ivf_topk(centers=None) wires it:
        # two-level routing through the coarse tier
        from vspace_spark.operators.similarity import _assign_cells_arrow

        t0 = time.perf_counter()
        assigned = _assign_cells_arrow(
            vecs, fine, "vec_id", "embedding", (coarse, owner)
        )
        assigned.count()
        t_2l = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = ivf_topk(
            q,
            vecs,
            k=5,
            n_cells=k,
            n_probe=args.n_probe,
            assign_engine="arrow",
        )
        n2 = out2.count()
        t_full = time.perf_counter() - t0
        r2 = recall_at_5(spark, q, vecs, out2)
        print(
            f"n={args.n} K={k}: assign_2level {t_2l:.1f} s | "
            f"train+assign+probe e2e {t_full:.1f} s rows={n2} "
            f"recall@5={r2:.3f}",
            flush=True,
        )

        if args.refine:
            from vspace_spark.operators.similarity import refine_codebook

            t0 = time.perf_counter()
            rc, rcoarse = refine_codebook(
                vecs,
                fine,
                (coarse, owner),
                steps=args.refine,
                id_col="vec_id",
                vec_col="embedding",
            )
            t_ref = time.perf_counter() - t0
            out4 = ivf_topk(
                q,
                vecs,
                k=5,
                n_cells=k,
                n_probe=args.n_probe,
                centers=rc,
                assign_engine="arrow",
            )
            r4 = recall_at_5(spark, q, vecs, out4)
            print(
                f"n={args.n} K={k}: refine x{args.refine} "
                f"{t_ref:.1f} s ({t_ref / args.refine:.1f} s/step) "
                f"recall@5={r4:.3f}",
                flush=True,
            )
            for np_ in args.probe_sweep:
                out5 = ivf_topk(
                    q, vecs, k=5, n_cells=k, n_probe=np_,
                    centers=rc, assign_engine="arrow",
                )
                r5 = recall_at_5(spark, q, vecs, out5)
                print(
                    f"n={args.n} K={k}: refined n_probe={np_} "
                    f"recall@5={r5:.3f}",
                    flush=True,
                )

        for np_ in args.probe_sweep:
            out5 = ivf_topk(
                q, vecs, k=5, n_cells=k, n_probe=np_,
                centers=fine, assign_engine="arrow",
            )
            r5 = recall_at_5(spark, q, vecs, out5)
            print(
                f"n={args.n} K={k}: sample-trained n_probe={np_} "
                f"recall@5={r5:.3f}",
                flush=True,
            )

        if args.ml:
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            feats = vecs.select(
                array_to_vector(F.col("embedding")).alias("_features")
            )
            t0 = time.perf_counter()
            km = KMeans(k=k, seed=42, featuresCol="_features")
            model = km.fit(feats)
            t_ml = time.perf_counter() - t0
            ml_centers = [c.tolist() for c in model.clusterCenters()]
            out3 = ivf_topk(
                q,
                vecs,
                k=5,
                n_cells=k,
                n_probe=args.n_probe,
                centers=ml_centers,
                assign_engine="arrow",
            )
            r3 = recall_at_5(spark, q, vecs, out3)
            print(
                f"n={args.n} K={k}: train_ml {t_ml:.1f} s "
                f"({t_ml / max(t_lloyd, 1e-9):.1f}x lloyd) "
                f"recall@5={r3:.3f}",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
