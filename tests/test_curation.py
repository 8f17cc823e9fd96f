"""Curation operators: two-phase packing prefix sum, decontamination
plan shape. Oracle parity for the registered queries lives in
test_oracle_parity.py; these tests pin semantics and physical plans."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vspace_spark.operators.packing import pack_plan
from vspace_spark.plans.explain import formatted_plan
from vspace_spark.queries import QUERIES


def test_pack_plan_matches_naive_global_window(spark):
    """Two-phase prefix sum == bare Window.orderBy cumsum (the naive
    single-reducer formulation), on enough rows to spread across many
    range partitions."""
    rows = [(i, (i * 37) % 23 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, wc int")
    got = {
        r.doc_id: (r.start_offset, r.first_seq, r.n_seqs)
        for r in pack_plan(df, budget=64).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = df.withColumn(
        "start", (F.sum("wc").over(w) - F.col("wc")).cast("long")
    ).collect()
    assert len(got) == 1000
    for r in naive:
        first = r.start // 64
        last = (r.start + r.wc - 1) // 64
        assert got[r.doc_id] == (r.start, first, last - first + 1)


def test_pack_plan_boundary_spans(spark):
    """A document crossing a chunk boundary spans multiple sequences."""
    df = spark.createDataFrame(
        [(0, 4), (1, 5), (2, 3), (3, 25), (4, 1)], "doc_id long, wc int"
    )
    got = {
        r.doc_id: (r.start_offset, r.first_seq, r.n_seqs)
        for r in pack_plan(df, budget=10).collect()
    }
    assert got == {
        0: (0, 0, 1),
        1: (4, 0, 1),
        2: (9, 0, 2),   # tokens 9..11 cross the seq-0/seq-1 boundary
        3: (12, 1, 3),  # 25 tokens starting at 12 touch seqs 1,2,3
        4: (37, 3, 1),
    }


def test_pack_plan_has_no_single_partition_window(spark, sf_dir):
    """Same invariant as the vocabulary-id plan: every window carries a
    non-empty partition spec (no global-order single-reducer)."""
    df = QUERIES["doc_pack_sequences"](spark, sf_dir)
    plan = formatted_plan(df)
    offenders = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line and "], [], [" in line
    ]
    assert not offenders, offenders


def test_decontamination_eval_side_broadcasts(spark, sf_dir):
    """The benchmark-gram side must broadcast — the training corpus
    never shuffles on gram for the collision check."""
    df = QUERIES["doc_decontamination"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


class TestTokenShards:
    def test_layout_roundtrip_and_bounds(self, spark, sf_dir, tmp_path):
        import os

        from pyspark.sql import functions as F

        from vspace_spark.functions.text import tokenize_col
        from vspace_spark.io.shards import write_token_shards
        from vspace_spark.io.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = str(tmp_path / "shards")
        manifest = write_token_shards(
            docs, out, wc=F.size(tokenize_col("text")),
            tokens_per_shard=4096,
        ).collect()
        # one directory per manifest shard
        dirs = {
            e for e in os.listdir(out) if e.startswith("shard=")
        }
        assert dirs == {f"shard={r.shard}" for r in manifest}
        # docs never split: total docs/tokens conserved
        back = spark.read.parquet(out)
        n_docs = docs.filter(
            F.size(tokenize_col("text")) > 0
        ).count()
        assert back.count() == n_docs == sum(r.n_docs for r in manifest)
        # every shard is budget-bounded ± one document (the last doc
        # may overhang; a shard can only exceed 4096 via its final doc)
        max_wc = (
            docs.select(F.max(F.size(tokenize_col("text"))).alias("m"))
            .collect()[0]  # bounded-collect: 1-row agg
            .m
        )
        for r in manifest:
            assert r.n_tokens <= 4096 + max_wc
        # shards cover consecutive doc-id ranges in order
        spans = sorted((r.shard, r.first_doc, r.last_doc) for r in manifest)
        for (s1, _, l1), (s2, f2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + 1 and f2 > l1
