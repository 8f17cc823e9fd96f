"""Zipfian hot-gram skew: candidate blow-up + the hot_gram_cap guard
(PERF.md round 8, VERDICT r7 "What's missing #3").

The registered fuzzy-pair bench keys are 16-char prefixes of synthetic
uniform text — per-gram occupancy is flat, so the (block, gram)
inverted-index join never sees the skew real text produces, where a
handful of grams ("th", "he", "in"...) cover a large key fraction and
their buckets go occupancy². This fixture draws keys as concatenations
of Zipf-distributed words (s configurable) over a small vocabulary, so
gram frequencies follow a real-text-like power law, then plants known
near-dup pairs (one random in-budget edit of an existing key).

Measured per run:
- join-work proxy: sum over (block, gram) buckets of occ², guard-off
  vs guard-on (over-cap buckets excised) — the shuffle-side job size
  the index join actually faces, computed from one cheap occupancy agg
- hot fraction: share of keys containing an over-cap gram (the
  exhaustive lane's |H|; its cost is |H|²·banded-DP within block)
- wall time guard-off vs guard-on, same session, cache cleared
- output identity: count + checksum of (a, b, dist) must agree
  (recall safety measured, not just proved)

Usage:
  python scripts/qgram_skew_bench.py [--n 120000] [--zipf 1.4]
      [--cap 4000] [--q 2] [--k 2] [--seed 7]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
from pyspark.sql import functions as F

VOCAB = [
    "the", "of", "and", "to", "in", "is", "it", "for", "on", "as",
    "with", "be", "at", "by", "this", "had", "not", "are", "but",
    "from", "or", "have", "an", "they", "which", "one", "you", "were",
    "her", "all", "she", "there", "would", "their", "we", "him",
    "been", "has", "when", "who", "will", "more", "no", "if", "out",
    "so", "said", "what", "up", "its", "about", "into", "than",
    "them", "can", "only", "other", "new", "some", "could", "time",
    "these", "two", "may", "then", "do", "first", "any", "my", "now",
    "such", "like", "our", "over", "man", "me", "even", "most",
    "made", "after", "also", "did", "many", "before", "must",
    "through", "back", "years", "where", "much", "your", "way",
    "well", "down", "should", "because", "each", "just", "those",
    "people", "how",
]


def make_corpus(n: int, zipf_s: float, seed: int, key_words: int = 4):
    """Keys = key_words Zipf-drawn words joined by spaces; ~10% of
    keys are a planted near-dup (one substitution) of an earlier key."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
    p = ranks ** (-zipf_s)
    p /= p.sum()
    words = rng.choice(len(VOCAB), size=(n, key_words), p=p)
    keys = [" ".join(VOCAB[w] for w in row) for row in words]
    n_plant = n // 10
    victims = rng.integers(0, n, size=n_plant)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for i, v in enumerate(victims):
        k = list(keys[v])
        pos = int(rng.integers(0, len(k)))
        k[pos] = alpha[int(rng.integers(0, 26))]
        keys[n - n_plant + i] = "".join(k)
    return keys


def make_corpus_boilerplate(
    n: int, frac: float, seed: int, key_len: int = 24
):
    """The intended guard regime: keys are random lowercase strings
    (flat gram occupancy ~ n*23/26^2), but ``frac`` of them carry a
    fixed 10-char boilerplate token at a random offset — its grams go
    over-cap while the rest of the distribution stays flat, so the
    hot-key fraction is ~frac, not ~1 (contrast the zipf fixture,
    where the language core itself is hot and EVERY key contains a
    hot gram). ~10% planted near-dups as in make_corpus."""
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    boiler = "thelicense"
    raw = alpha[rng.integers(0, 26, size=(n, key_len))]
    keys = ["".join(map(chr, row)) for row in raw]
    n_hot = int(n * frac)
    hot_rows = rng.choice(n, size=n_hot, replace=False)
    for v in hot_rows:
        pos = int(rng.integers(0, key_len - len(boiler) + 1))
        k = keys[v]
        keys[v] = k[:pos] + boiler + k[pos + len(boiler):]
    n_plant = n // 10
    victims = rng.integers(0, n - n_plant, size=n_plant)
    for i, v in enumerate(victims):
        k = list(keys[v])
        pos = int(rng.integers(0, len(k)))
        k[pos] = chr(alpha[int(rng.integers(0, 26))])
        keys[n - n_plant + i] = "".join(k)
    return keys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120000)
    ap.add_argument("--zipf", type=float, default=1.4)
    ap.add_argument(
        "--fixture", choices=["zipf", "boilerplate"], default="zipf"
    )
    ap.add_argument("--frac", type=float, default=0.25)
    ap.add_argument("--cap", type=int, default=4000)
    ap.add_argument("--q", type=int, default=2)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from vspace_spark.operators.dedup import qgram_edit_pairs
    from vspace_spark.session import get_spark

    spark = get_spark("qgram-skew-bench")
    spark.range(1000).count()

    if args.fixture == "boilerplate":
        keys = make_corpus_boilerplate(args.n, args.frac, args.seed)
    else:
        keys = make_corpus(args.n, args.zipf, args.seed)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(keys)], "doc_id long, text string"
    ).persist()
    docs.count()

    q, k, cap = args.q, args.k, args.cap
    # occupancy profile + join-work proxy from ONE agg (block = none)
    grams = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {q} + 1), "
                f"i -> substring(text, i, {q}))"
            )
        ).alias("g")
    )
    occ = (
        grams.groupBy("g")
        .count()
        .agg(
            F.sum(F.col("count") * F.col("count")).alias("work_all"),
            F.sum(
                F.when(
                    F.col("count") <= cap,
                    F.col("count") * F.col("count"),
                ).otherwise(F.lit(0))
            ).alias("work_capped"),
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("count") > cap, 1).otherwise(0)).alias(
                "n_hot_grams"
            ),
            F.max("count").alias("max_occ"),
        )
        .collect()[0]
    )
    print(
        f"n={args.n} fixture={args.fixture} zipf={args.zipf} "
        f"frac={args.frac} q={q} k={k} cap={cap}: "
        f"grams={occ.n_grams} hot_grams={occ.n_hot_grams} "
        f"max_occ={occ.max_occ} "
        f"join_work_all={occ.work_all:.3e} "
        f"join_work_capped={occ.work_capped:.3e} "
        f"(x{occ.work_all / max(occ.work_capped, 1):.1f} reduction)",
        flush=True,
    )

    def run(label: str, hot_cap):
        t0 = time.perf_counter()
        out = qgram_edit_pairs(
            docs,
            F.col("text"),
            block=[],
            q=q,
            max_dist=k,
            hot_gram_cap=hot_cap,
        )
        row = out.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                F.xxhash64("a", "b", "dist").bitwiseAND(F.lit((1 << 40) - 1))
            ).alias("checksum"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        print(
            f"{label}: pairs={row.pairs} checksum={row.checksum}"
            f" sec={dt:.1f}",
            flush=True,
        )
        spark.catalog.clearCache()
        docs.persist()
        docs.count()
        return row.pairs, row.checksum, dt

    # guard-off first (cold-ish), then guard-on, then guard-off again
    # so ordering/JIT can't flatter the guard
    p1 = run("unguarded#1", None)
    p2 = run(f"guarded(cap={cap})", cap)
    p3 = run("unguarded#2", None)
    assert p1[:2] == p2[:2] == p3[:2], (p1, p2, p3)
    print("IDENTICAL OUTPUTS", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
