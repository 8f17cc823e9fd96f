"""Round-14: decompose `agree_dedup_semantic_fast`'s wall clock.

VERDICT r13 #3: the gate measured ~20.9 s at sf0.1 while its two
lanes solo cost 2.9 + 0.9 s — ~17 s unexplained beyond the component
sum. This probe times each phase of the gate's own construction
(lane builds — which run eager jobs inside semantic_dedup — then the
diff materialization, then the final count) so the residual is
attributed before anything is changed (guide §1).

Run: python scripts/semantic_gate_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vspace_spark.io.tables import load_table  # noqa: E402
from vspace_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("semantic-gate-decompose")

    from vspace_spark.operators.dedup import semantic_dedup
    from vspace_spark.operators.scale import (
        KNOWN_SMALL,
        footer_row_count,
        persist_shared,
    )
    from vspace_spark.operators.similarity import portable_hyperplanes
    from vspace_spark.queries.agreement import (
        _bag_diff,
        agree_dedup_semantic_fast,
    )

    for rep in range(reps):
        spark.catalog.clearCache()
        from vspace_spark.operators.dedup import clear_clone_probe_memo

        clear_clone_probe_memo()
        emb = load_table(spark, sf_dir, "embeddings")
        n = footer_row_count(emb) or emb.count()
        centers = portable_hyperplanes(64, max(16, n // 512), salt="s")
        phases = {}

        t = time.perf_counter()
        fold_out = persist_shared(
            semantic_dedup(emb, centers, threshold=0.4, engine="fold"),
            KNOWN_SMALL,
        )
        phases["build_fold_lane"] = time.perf_counter() - t

        t = time.perf_counter()
        arrow_out = persist_shared(
            semantic_dedup(emb, centers, threshold=0.4, engine="arrow"),
            KNOWN_SMALL,
        )
        phases["build_arrow_lane"] = time.perf_counter() - t

        t = time.perf_counter()
        fold_out.count()
        phases["materialize_fold"] = time.perf_counter() - t

        t = time.perf_counter()
        arrow_out.count()
        phases["materialize_arrow"] = time.perf_counter() - t

        t = time.perf_counter()
        diff = persist_shared(_bag_diff(fold_out, arrow_out), KNOWN_SMALL)
        empty = diff.isEmpty()
        phases["diff_isEmpty"] = time.perf_counter() - t

        t = time.perf_counter()
        got = diff.agg(F.count(F.lit(1)).alias("d")).first()[0]
        phases["final_agg"] = time.perf_counter() - t

        # end-to-end, the real query path (fresh caches)
        spark.catalog.clearCache()
        clear_clone_probe_memo()
        t = time.perf_counter()
        full = agree_dedup_semantic_fast(spark, sf_dir).first()[0]
        phases["gate_end_to_end"] = time.perf_counter() - t

        print(
            json.dumps(
                {
                    "rep": rep,
                    "empty": empty,
                    "count": got,
                    "gate_value": full,
                    "phases": {k: round(v, 2) for k, v in phases.items()},
                    "sum_phases_minus_e2e": round(
                        sum(v for k, v in phases.items()
                            if k != "gate_end_to_end"),
                        2,
                    ),
                    "load_1m": round(os.getloadavg()[0], 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
