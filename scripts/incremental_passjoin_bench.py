"""VERDICT r9 #8: persisted PassJoin segment index — probe-only vs
rebuild-per-batch marginal cost.

Both modes ingest the same replicated near-dup corpus in constant-size
micro-batches and emit the identical cross-batch pair set:

- probe_only: ``incremental_passjoin_dedup`` — each batch probes the
  PERSISTED segment rows of all earlier batches (build once, probe
  many), then appends its own segments/keys.
- rebuild: the naive alternative — each batch re-derives the FULL
  segment index of everything ingested so far (probe rows from the
  new batch only, index rows recomputed from all history), i.e. the
  per-batch cost carries an O(history) re-hash the persisted artifact
  exists to remove.

Reports per-batch duration curves (first/last quartile, slope) like
scripts/incremental_dedup_bench.py. Results -> PERF.md.

Run: python scripts/incremental_passjoin_bench.py [replicas] [n_batches] [mode]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.session import get_spark


def replicated_docs(spark, sf_dir: str, replicas: int):
    """Near-dup replicas: each replica perturbs ONE char of the 16-char
    prefix so replicas are genuine edit-distance-1 partners of their
    source, and cross-batch probes do real verify work.

    CLONE-STRESS corpus: every replica r > 0 of a base doc carries the
    SAME perturbed key, so each micro-batch's TRUE pair output grows
    linearly with the accreted index (batch i's docs pair with every
    earlier clone of their base) — the per-batch curve then measures
    inherent output growth, not probe cost. Round 11 measured it so:
    k=2 at 500k docs emitted 50.9M pairs with slope +2476 ms/batch,
    ~all of it unavoidable cross-batch clone pairs. Use
    :func:`distinct_docs` for the marginal-INGEST-cost question."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    span = base.agg(F.max("doc_id")).first()[0] + 1
    return base.crossJoin(
        F.broadcast(spark.range(replicas).select(F.col("id").alias("_r")))
    ).select(
        (F.col("doc_id") + F.col("_r") * span).alias("doc_id"),
        F.when(F.col("_r") == 0, F.col("text")).otherwise(
            F.concat(
                F.substring("text", 1, 7),
                F.lit("#"),
                F.substring("text", 9, 2147483647),
            )
        ).alias("text"),
    )


def distinct_docs(spark, n: int, plant_every: int = 100):
    """Marginal-cost corpus (VERDICT r10 #6): n DISTINCT 16-char
    base-36 keys (xxhash-derived, deterministic) plus one 1-char-edit
    partner per ``plant_every`` keys — true pair output is ~n/100
    TOTAL and roughly constant per batch, so the per-batch duration
    curve isolates what the question asks: probe + index-accretion
    cost as the segment index grows, with verify work bounded by the
    candidate set instead of a quadratic clone term."""
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            *[
                F.element_at(
                    F.array(*[F.lit(c) for c in alpha]),
                    (
                        F.pmod(
                            F.xxhash64(F.col("id"), F.lit(i)),
                            F.lit(len(alpha)),
                        )
                        + 1
                    ).cast("int"),
                )
                for i in range(16)
            ],
        ).alias("text"),
    )
    edits = base.filter(F.col("doc_id") % plant_every == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 7),
            F.lit("#"),
            F.substring("text", 9, 8),
        ).alias("text"),
    )
    return base.unionByName(edits)


def run_rebuild(spark, docs, n_batches: int, key_len: int, k: int):
    """Naive lane: materialize the same replay files, then per batch
    run the BATCH passjoin generator over (history + new), keeping
    pairs that touch the new batch — per-batch cost re-derives the
    full history index every round."""
    from vspace_spark.operators.dedup import passjoin_edit_pairs

    work = "/tmp/vspace_pj_rebuild"
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    docs.select(
        "doc_id", F.substring("text", 1, key_len).alias("_k")
    ).repartitionByRange(n_batches, "doc_id").write.mode(
        "overwrite"
    ).parquet(work)
    files = sorted(
        os.path.join(work, f)
        for f in os.listdir(work)
        if f.endswith(".parquet")
    )
    durs, total_pairs = [], 0
    seen = None
    for i, f in enumerate(files):
        t0 = time.perf_counter()
        new = spark.read.parquet(f)
        hist = spark.read.parquet(*files[: i + 1])
        pairs = passjoin_edit_pairs(
            hist.withColumnRenamed("_k", "text"),
            F.col("text"),
            block=[],
            max_dist=k,
            collapse_exact=False,
        )
        new_ids = new.select(F.col("doc_id").alias("_nid"))
        touched = pairs.join(
            F.broadcast(new_ids),
            (F.col("a") == F.col("_nid")) | (F.col("b") == F.col("_nid")),
            "left_semi",
        )
        total_pairs += touched.count()
        durs.append((time.perf_counter() - t0) * 1000)
        _ = seen
    return durs, total_pairs


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    mode = sys.argv[3] if len(sys.argv) > 3 else "probe_only"
    # k as argv[4] (VERDICT r10 #6: the k=3 fan-out point — PassJoin's
    # per-key probe rows grow as (2k+1)(k+1): 15 at k=2, 28 at k=3)
    key_len = 16
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    # corpus = clone (near-dup replicas of the fixture corpus — the
    # clone-stress regime) | distinct (distinct keys + planted pairs —
    # the marginal-ingest-cost regime). argv[1] is replicas for clone,
    # TOTAL DOC COUNT for distinct.
    corpus = sys.argv[5] if len(sys.argv) > 5 else "clone"
    spark = get_spark(
        "incremental-passjoin-bench",
        extra_conf={
            "spark.sql.streaming.numRecentProgressUpdates": str(
                max(1000, 2 * n_batches)
            )
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if corpus == "distinct":
        docs = distinct_docs(spark, replicas)
    else:
        docs = replicated_docs(spark, sf_dir, replicas)
    n_docs = docs.count()

    t0 = time.perf_counter()
    if mode == "probe_only":
        from vspace_spark.streaming.incremental import (
            incremental_passjoin_dedup,
        )

        progress: list = []
        work = f"/tmp/vspace_pj_probe_x{replicas}_{n_batches}"
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        pairs = incremental_passjoin_dedup(
            spark,
            docs,
            key_len=key_len,
            max_dist=k,
            work_dir=work,
            n_input_files=n_batches,
            progress_out=progress,
        )
        n_pairs = pairs.count()
        progress.sort(key=lambda p: p["batch_id"])
        durs = [p["duration_ms"] for p in progress]
    else:
        durs, n_pairs = run_rebuild(spark, docs, n_batches, key_len, k)
    elapsed = time.perf_counter() - t0

    q = max(1, len(durs) // 4)
    n = len(durs)
    xbar = (n - 1) / 2
    ybar = sum(durs) / n
    slope = sum(
        (i - xbar) * (d - ybar) for i, d in enumerate(durs)
    ) / max(sum((i - xbar) ** 2 for i in range(n)), 1e-9)
    print(
        {
            "mode": mode,
            "k": k,
            "corpus": corpus,
            "n_docs": n_docs,
            "n_batches": n,
            "n_pairs": n_pairs,
            "total_sec": round(elapsed, 1),
            "batch_ms_first_quartile": round(sum(durs[:q]) / q),
            "batch_ms_last_quartile": round(sum(durs[-q:]) / q),
            "slope_ms_per_batch": round(slope, 1),
            "load_1m": round(os.getloadavg()[0], 1),
        },
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
