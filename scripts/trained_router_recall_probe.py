"""Router-vs-flat RECALL bound for the trained semantic-dedup lane
(VERDICT r12 #7).

The two-level router (coarse argmin → fine argmin within the owning
coarse cluster's fine centers) can assign a vector to a different
fine cell than the flat argmin over the SAME trained centers when the
vector sits near a trained-cell boundary (~12% of sf0.01 vectors, the
cell-flip number in tests/test_dedup.py). A cell flip only matters if
it changes the DEDUP OUTCOME: a near-duplicate pair split across two
cells is never compared, so the router can MISS duplicates the flat
assignment finds (and vice versa). This probe measures that outcome
delta on the real embeddings tables at two SFs:

  - cell_flip_rate: fraction of vectors whose fine cell differs;
  - dup_flat / dup_router / dup_both: duplicate (id, duplicate_of)
    edges found by each lane and their intersection;
  - recall_vs_flat: |edges_router ∩ edges_flat| / |edges_flat| —
    the bound the verdict asked for (how much of the flat lane's
    duplicate set the fast router retains);
  - kept_flip: rows whose kept bit differs.

Both lanes run the SAME trained codebook (one training call), same
threshold as the registered query (0.4), collapse_exact=False so
exact clones don't mask routing effects.

  python scripts/trained_router_recall_probe.py \
      --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--threshold", type=float, default=0.4)
    args = ap.parse_args()

    from vspace_spark.io.tables import load_table
    from vspace_spark.operators.dedup import (
        hierarchical_codebook,
        semantic_dedup,
    )
    from vspace_spark.operators.scale import footer_row_count
    from vspace_spark.session import get_spark

    spark = get_spark("trained-router-recall-probe")
    emb = load_table(spark, args.sf, "embeddings")
    n = footer_row_count(emb) or emb.count()
    k = max(16, n // 512)

    t0 = time.perf_counter()
    fine, coarse_centers, owner = hierarchical_codebook(emb, k)
    t_train = time.perf_counter() - t0

    def run(coarse, nprobe=2):
        return (
            semantic_dedup(
                emb,
                fine,
                threshold=args.threshold,
                collapse_exact=False,
                engine="arrow",
                coarse=coarse,
                coarse_nprobe=nprobe,
            )
            .select("vec_id", "cell", "kept", "duplicate_of")
            .toPandas()
            .set_index("vec_id")
            .sort_index()
        )

    def edges(df):
        d = df[df["duplicate_of"].notna()]
        return set(zip(d.index, d["duplicate_of"].astype("int64")))

    flat = run(None)
    ef = edges(flat)
    out = {
        "sf": args.sf,
        "n": int(n),
        "k": int(k),
        "threshold": args.threshold,
        "train_sec": round(t_train, 1),
        "dup_flat": len(ef),
        "arms": {},
    }
    for nprobe in (1, 2, 3):
        routed = run((coarse_centers, owner), nprobe)
        assert len(flat) == len(routed) == n
        er = edges(routed)
        both = ef & er
        out["arms"][f"nprobe{nprobe}"] = {
            "cell_flip_rate": round(
                int((flat["cell"] != routed["cell"]).sum()) / n, 4
            ),
            "dup_router": len(er),
            "dup_both": len(both),
            "recall_vs_flat": (
                round(len(both) / len(ef), 4) if ef else 1.0
            ),
            "extra_vs_flat": len(er - ef),
            "kept_flip_rate": round(
                int((flat["kept"] != routed["kept"]).sum()) / n, 5
            ),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
