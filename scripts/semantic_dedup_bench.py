"""Semantic-dedup scale bench (PERF.md round 6).

Measures `semantic_dedup` over the embeddings table at native sf and
the key-shifted 10×/100× replica sets (bench.py:materialize_scaled_sf)
across three variants:

- fold engine, collapse_exact=False  (the raw oracle-shape plan —
  DNFs at 100×: interpreted argmin over every row + clone-quadratic
  in-cell join)
- fold engine, collapse_exact=True   (the oracle-checked default)
- arrow engine                       (production: matmul assignment +
  per-cell Gram matmul, shares the collapse prepass)

Forcing note (recorded in PERF.md): a bare count() on this operator's
output measures NOTHING — Catalyst eliminates the final left join
(unique right keys, no right columns referenced). Force with an
aggregate that references the output columns.

Usage:
  python scripts/semantic_dedup_bench.py [--raw] [--dirs DIR ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F


def force(df):
    """Full-plan forcing: hash every output column (decimal sum so the
    aggregate cannot overflow under ANSI mode)."""
    return df.agg(
        F.sum(
            F.xxhash64("vec_id", "cell", "kept", "duplicate_of").cast(
                "decimal(38,0)"
            )
        )
    ).collect()[0][0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        nargs="+",
        default=[
            "/root/testdata/sf0.1",
            "/tmp/bench_scaled_sf0.1_x10",
            "/tmp/bench_scaled_sf0.1_x100",
        ],
    )
    ap.add_argument(
        "--raw",
        action="store_true",
        help="also run the collapse-free fold path (DNF risk at 100x)",
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--nprobe", type=int, default=2,
        help="coarse_nprobe for the trained two-level lane (the "
        "router recall knob, PERF.md round 13)",
    )
    ap.add_argument(
        "--phase-split",
        type=str,
        default=None,
        metavar="N1,N2,...",
        help="decompose the arrow path at K = N/512 into its "
        "assignment matmul (N x K x D flops) vs the full operator "
        "(assignment + shuffle + per-cell Gram + expand) on distinct "
        "synthetic vectors — the measurement VERDICT r7 #7 asks for "
        "before a trained coarse quantizer is worth implementing",
    )
    ap.add_argument(
        "--scaled-k",
        action="store_true",
        help="size the codebook K = max(16, N/512) per dir (the "
        "registered query's K prop N contract) instead of pinning "
        "K=16 — holds mean cell size constant so Sigma|cell|^2 stays "
        "linear in N; fixed K makes it quadratic (VERDICT r6 #4)",
    )
    ap.add_argument(
        "--trained",
        type=str,
        default=None,
        metavar="N1,N2,...",
        help="TRAINED-LANE-ONLY linearity curve (VERDICT r8 #3): N "
        "distinct synthetic vectors, K = N/512, hierarchical_codebook "
        "training + the two-level arrow operator end-to-end — skips "
        "the flat-assignment twin, which is already intractable at "
        "these N (110.6 s assignment alone at 2M; the lane exists "
        "precisely because of that).",
    )
    ap.add_argument(
        "--synthetic",
        type=str,
        default=None,
        metavar="N1,N2,...",
        help="bench on N DISTINCT deterministic vectors instead of the "
        "parquet dirs (the replica sets are verbatim clones, which the "
        "collapse prepass absorbs — distinct vectors are what exercise "
        "the in-cell quadratic term the K prop N contract bounds). "
        "Runs the arrow engine with K prop N vs fixed K=16; fixed-K "
        "is skipped where its per-cell Gram matrix would not fit "
        "(8*(N/16)^2 bytes), which is itself the point.",
    )
    args = ap.parse_args()

    from vspace_spark.io.tables import load_table
    from vspace_spark.operators.dedup import semantic_dedup
    from vspace_spark.operators.similarity import portable_hyperplanes
    from vspace_spark.session import get_spark

    spark = get_spark("semantic-dedup-bench")

    if args.phase_split:
        dim = 64
        for n in [int(s) for s in args.phase_split.split(",")]:
            k = max(16, n // 512)
            vecs = (
                spark.range(n)
                .repartition(64)
                .select(
                    F.col("id").alias("vec_id"),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: (
                            F.xxhash64(F.col("id"), i) % 1000
                        ).cast("float")
                        / 500.0,
                    ).alias("embedding"),
                )
                .persist()
            )
            vecs.count()
            centers = portable_hyperplanes(dim, k, salt="s")

            # assignment-only: the same ||v-c||^2 argmin matmul as
            # _semantic_dedup_arrow_raw's assign stage, self-contained
            centers_rows = [list(map(float, c)) for c in centers]

            def assign_only(batches):
                import numpy as _np
                import pandas as _pd

                C = _np.asarray(centers_rows, dtype=_np.float64)
                c2 = (C * C).sum(1)[None, :]
                for pdf in batches:
                    if not len(pdf):
                        continue
                    V = _np.stack(
                        [
                            _np.asarray(v, dtype=_np.float64)
                            for v in pdf["embedding"]
                        ]
                    )
                    d = c2 - 2.0 * (V @ C.T)
                    yield _pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].astype("int64"),
                            "cell": d.argmin(1).astype("int32"),
                        }
                    )

            def run_phase(label, thunk):
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    thunk()
                    times.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
                    vecs.persist().count()
                print(
                    f"phase-split n={n} K={k} {label}: "
                    f"min {min(times):.1f}s "
                    f"reps {[round(t, 1) for t in times]}",
                    flush=True,
                )
                return min(times)

            t_assign = run_phase(
                "assign-only",
                lambda: vecs.mapInPandas(
                    assign_only, "vec_id long, cell int"
                )
                .agg(
                    F.sum(
                        F.xxhash64("vec_id", "cell").cast("decimal(38,0)")
                    )
                )
                .collect(),
            )
            t_full = run_phase(
                "full arrow",
                lambda: force(
                    semantic_dedup(
                        vecs, centers, threshold=0.95, engine="arrow"
                    )
                ),
            )
            print(
                f"phase-split n={n} K={k}: assignment share "
                f"{t_assign / t_full:.0%} of full",
                flush=True,
            )
            # trained two-level lane (VERDICT r7 #7): one-time
            # hierarchical k-means training + the Kc+K/Kc assignment
            from vspace_spark.operators.dedup import (
                hierarchical_codebook,
                semantic_dedup_two_level,
            )

            t0 = time.perf_counter()
            fine, coarse, owner = hierarchical_codebook(vecs, k)
            t_train = time.perf_counter() - t0
            print(
                f"phase-split n={n} K={k} two-level train: "
                f"{t_train:.1f}s (Kc={len(coarse)}, "
                f"fine={len(fine)})",
                flush=True,
            )
            run_phase(
                "full two-level (excl. training)",
                lambda: force(
                    semantic_dedup(
                        vecs,
                        fine,
                        threshold=0.95,
                        engine="arrow",
                        coarse=(coarse, owner),
                        coarse_nprobe=args.nprobe,
                    )
                ),
            )
            vecs.unpersist()
        spark.stop()
        return

    if args.trained:
        from vspace_spark.operators.dedup import (
            hierarchical_codebook,
            semantic_dedup,
        )

        dim = 64
        for n in [int(s) for s in args.trained.split(",")]:
            k = max(16, n // 512)
            vecs = (
                spark.range(n)
                .repartition(64)
                .select(
                    F.col("id").alias("vec_id"),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: (
                            F.xxhash64(F.col("id"), i) % 1000
                        ).cast("float")
                        / 500.0,
                    ).alias("embedding"),
                )
                .persist()
            )
            vecs.count()
            t0 = time.perf_counter()
            # K > 8192 needs the sample cap raised CONSCIOUSLY (the
            # operator docstring's rule: >= 32 points per fine center
            # or cells degenerate and the pairwise stage goes
            # quadratic — first 8M run with the default 262k cap:
            # 16.8 pts/center, operator 102 s vs ~25 s healthy)
            fine, coarse, owner = hierarchical_codebook(
                vecs, k, sample_rows=max(32 * k, 32768)
            )
            t_train = time.perf_counter() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                force(
                    semantic_dedup(
                        vecs,
                        fine,
                        threshold=0.95,
                        engine="arrow",
                        coarse=(coarse, owner),
                        coarse_nprobe=args.nprobe,
                    )
                )
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                vecs.persist().count()
            print(
                f"trained n={n} K={k} (Kc={len(coarse)}): "
                f"train {t_train:.1f}s, operator min {min(times):.1f}s "
                f"reps {[round(t, 1) for t in times]}",
                flush=True,
            )
            vecs.unpersist()
        spark.stop()
        return

    if args.synthetic:
        dim = 64
        for n in [int(s) for s in args.synthetic.split(",")]:
            vecs = (
                spark.range(n)
                .repartition(64)
                .select(
                    F.col("id").alias("vec_id"),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: (
                            F.xxhash64(F.col("id"), i) % 1000
                        ).cast("float")
                        / 500.0,
                    ).alias("embedding"),
                )
                .persist()
            )
            vecs.count()
            for mode, k in [("K=N/512", max(16, n // 512)), ("K=16", 16)]:
                gram_gb = 8 * (n / k) ** 2 / 1e9
                if gram_gb > 8:
                    print(
                        f"synthetic n={n} arrow {mode} (K={k}): SKIP — "
                        f"per-cell Gram would be {gram_gb:.0f} GB "
                        f"(the fixed-K quadratic term itself)",
                        flush=True,
                    )
                    continue
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    force(
                        semantic_dedup(
                            vecs,
                            portable_hyperplanes(dim, k, salt="s"),
                            threshold=0.95,
                            engine="arrow",
                        )
                    )
                    times.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
                    vecs.persist().count()
                print(
                    f"synthetic n={n} arrow {mode} (K={k}): "
                    f"min {min(times):.1f}s "
                    f"reps {[round(t, 1) for t in times]}",
                    flush=True,
                )
            vecs.unpersist()
        spark.stop()
        return
    variants = [("fold+collapse", dict(engine="fold"))]
    if args.raw:
        variants.insert(
            0, ("fold raw", dict(engine="fold", collapse_exact=False))
        )
    variants.append(("arrow", dict(engine="arrow")))

    for d in args.dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        k = max(16, n // 512) if args.scaled_k else 16
        centers = portable_hyperplanes(64, k, salt="s")
        for label, kw in variants:
            label = f"{label} K={k}"
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                force(semantic_dedup(emb, centers, threshold=0.4, **kw))
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(
                f"{d} ({n} vecs) {label}: "
                f"min {min(times):.1f}s reps {[round(t,1) for t in times]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
