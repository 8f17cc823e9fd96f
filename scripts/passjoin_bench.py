"""PassJoin segment generator vs q-gram count filter (VERDICT r8 #5).

Two planted regimes over N keys, both with verified-identical outputs:

- dense-gram: 16-char keys over a 4-letter alphabet (DNA-like /
  heavily templated ids). EVERY q-gram bucket holds ~N/4^q keys
  (4^3 = 64 distinct grams at q=3), so the count-filter join's
  candidate volume is Σ occ² ≈ N²/64 — quadratic with no skew guard
  able to help (there ARE no cold grams). PassJoin's segment keys
  (length ~L/(k+1) = 5 chars here) carry far more entropy, so its
  candidate set stays near the true-pair set.
- text: 16-char natural-language-like prefixes (the fixture corpus's
  regime) where gram buckets are Zipf-sparse and the count filter's
  cheaper index wins.

Pairs must be byte-identical between generators in both regimes
(asserted; they are both exact on keys >= q*(k+1) chars).

Run:  python scripts/passjoin_bench.py [--n 50000] [--k 2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F


def dense_gram_corpus(spark, n: int):
    """16-char keys, alphabet {a,c,g,t}: xxhash-derived, deterministic.
    ~n/100 planted near-pairs (1-char edits of earlier keys)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            *[
                F.element_at(
                    F.array(*[F.lit(c) for c in "acgt"]),
                    (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(4)) + 1)
                    .cast("int"),
                )
                for i in range(16)
            ],
        ).alias("text"),
    )
    edits = (
        base.filter(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 7),
                F.lit("x"),
                F.substring("text", 9, 8),
            ).alias("text"),
        )
    )
    return base.unionByName(edits)


def base36_corpus(spark, n: int):
    """16-char keys over the 36-char alphanumeric alphabet — the
    tunable MID-OCCUPANCY regime (VERDICT r10 #7): gram buckets are
    uniform with Poisson occupancy lambda = n*14/36^3, so the probe's
    size-biased mean_occ ~ lambda + 1 lands wherever n puts it
    (n=35k -> ~11, n=100k -> ~31, n=155k -> ~47) — exactly the 10-50
    band the chunk-pool fixtures could not synthesize. ~n/100 planted
    1-char edits, as in the dense regime."""
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
    edits = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 7),
            F.lit("x"),
            F.substring("text", 9, 8),
        ).alias("text"),
    )
    return base.unionByName(edits)


def text_corpus(spark, n: int):
    """16-char keys assembled from a Zipf-ish word pool — the natural
    regime where gram buckets are sparse."""
    words = [
        "the", "of", "and", "to", "in", "data", "spark", "query",
        "table", "join", "scan", "hash", "sort", "group", "agg",
        "plan", "cost", "rows", "byte", "disk", "core", "node",
    ]
    pool = F.array(*[F.lit(w) for w in words])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.substring(
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        pool,
                        (
                            F.pmod(
                                F.xxhash64(F.col("id"), F.lit(i)),
                                F.lit(len(words)),
                            )
                            + 1
                        ).cast("int"),
                    )
                    for i in range(6)
                ],
            ),
            1,
            16,
        ).alias("text"),
    )


def run(name, docs, q, k, reps):
    from vspace_spark.operators.dedup import (
        gram_occupancy_probe,
        passjoin_edit_pairs,
        qgram_edit_pairs,
    )

    key = F.col("text")
    probe = gram_occupancy_probe(docs, key, block=[], q=q)
    print(
        f"{name}: probe mean_occ={probe['mean_occ']:.1f} "
        f"rows={probe['rows']} work={probe['work']}",
        flush=True,
    )
    outs = {}
    for gen, fn in [
        (
            "qgram",
            lambda: qgram_edit_pairs(
                docs, key, block=[], q=q, max_dist=k, collapse_exact=False
            ),
        ),
        (
            "passjoin",
            lambda: passjoin_edit_pairs(
                docs, key, block=[], max_dist=k, collapse_exact=False
            ),
        ),
    ]:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cnt = fn().count()
            ts.append(time.perf_counter() - t0)
        outs[gen] = cnt
        print(
            f"{name}: {gen} pairs={cnt} "
            f"best={min(ts):.1f}s reps={[round(t, 1) for t in ts]}",
            flush=True,
        )
    assert outs["qgram"] == outs["passjoin"], outs
    # exact identity, not just counts
    a = {
        tuple(r)
        for r in passjoin_edit_pairs(
            docs, key, block=[], max_dist=k, collapse_exact=False
        ).collect()
    }
    b = {
        tuple(r)
        for r in qgram_edit_pairs(
            docs, key, block=[], q=q, max_dist=k, collapse_exact=False
        ).collect()
    }
    assert a == b, f"{name}: outputs differ: {len(a ^ b)} rows"
    print(f"{name}: outputs byte-identical ({len(a)} pairs)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--q", type=int, default=3)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--regime",
        choices=["dense", "text", "mid", "both"],
        default="both",
    )
    args = ap.parse_args()

    from vspace_spark.session import get_spark

    spark = get_spark("passjoin-bench")
    if args.regime in ("dense", "both"):
        docs = dense_gram_corpus(spark, args.n).persist()
        docs.count()
        run("dense-gram", docs, args.q, args.k, args.reps)
        docs.unpersist()
    if args.regime == "mid":
        docs = base36_corpus(spark, args.n).persist()
        docs.count()
        run(f"mid-base36-n{args.n}", docs, args.q, args.k, args.reps)
        docs.unpersist()
    if args.regime in ("text", "both"):
        docs = text_corpus(spark, args.n).persist()
        docs.count()
        run("text", docs, args.q, args.k, args.reps)
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
