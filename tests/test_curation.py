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


def test_epoch_shuffle_is_permutation_and_repartition_stable(spark):
    """Positions are exactly 0..n-1; the assignment is identical under
    a different input partitioning (content-addressed order, not
    partition luck); distinct epochs give distinct permutations."""
    from vspace_spark.operators.ordering import epoch_shuffle

    df = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    p0 = epoch_shuffle(df, "doc_id", epoch=0)
    rows = {r["doc_id"]: r["position"] for r in p0.collect()}
    assert sorted(rows.values()) == list(range(97))

    p0b = epoch_shuffle(df.repartition(7), "doc_id", epoch=0)
    assert rows == {r["doc_id"]: r["position"] for r in p0b.collect()}

    p1 = epoch_shuffle(df, "doc_id", epoch=1)
    rows1 = {r["doc_id"]: r["position"] for r in p1.collect()}
    assert rows != rows1 and sorted(rows1.values()) == list(range(97))


def test_stratified_sample_keeps_small_groups_whole(spark):
    """A group at/below the per-group average survives intact; a
    dominant group shrinks toward the average; membership is stable
    under repartitioning."""
    from vspace_spark.operators.sampling import stratified_sample_to_uniform

    rows = [(f"a{i}", "small", 10) for i in range(5)] + [
        (f"b{i}", "big", 10) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id string, src string, wc long")
    kept = stratified_sample_to_uniform(
        df, key="doc_id", group="src", size_col="wc"
    )
    by_src = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("small") == 5  # rate > 1 → keep everything
    # big group's target rate = total/(2 × group) ≈ 0.505 → roughly half
    assert 150 < by_src.get("big", 0) < 400

    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    kept_ids_re = {
        r["doc_id"]
        for r in stratified_sample_to_uniform(
            df.repartition(13), key="doc_id", group="src", size_col="wc"
        ).select("doc_id").collect()
    }
    assert kept_ids == kept_ids_re


def test_span_scrub_removes_planted_duplicate_span(spark, sf_dir):
    """A later doc that embeds a verbatim 8-token span from an earlier
    doc loses exactly that span (plus overlap-merged neighbors), while
    the first writer keeps every token."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    rows = [
        (1, " ".join(base + ["india", "juliett"])),
        (2, " ".join(["kilo", "lima"] + base + ["mike"])),
        (3, "november oscar papa quebec romeo sierra tango uniform victor"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from vspace_spark.queries.curation import doc_span_scrub

    # the registered query reads {sf_dir}/documents.parquet — point it
    # at a temp dir holding the planted fixture
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in doc_span_scrub(spark, d).collect()
        }
    assert out[1]["n_removed"] == 0
    # doc 2: spans starting at kilo/lima/base... every base token is
    # covered by some duplicated 8-gram window; kilo/lima/mike survive
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0


def test_ntile_scalable_matches_window_ntile(spark):
    """ntile_scalable must reproduce the SQL-standard ntile exactly,
    including the uneven-bucket case (n not divisible by k) and a
    repartitioned input."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vspace_spark.operators.ordering import ntile_scalable

    df = spark.range(103).select(
        F.col("id"), (F.col("id") * 37 % 11).alias("v")
    )
    want = df.select(
        "id",
        F.ntile(7).over(Window.orderBy("v", "id")).alias("b"),
    )
    got = ntile_scalable(df.repartition(5), 7, ["v", "id"], "b").select(
        "id", "b"
    )
    w = {r["id"]: r["b"] for r in want.collect()}
    g = {r["id"]: r["b"] for r in got.collect()}
    assert g == w


def test_ntile_scalable_multi_matches_chained(spark):
    """ntile_scalable_multi (one shared persist/count, slim
    per-dimension numbering, join-back on the id — the fused
    user_rfm_segments plan, VERDICT r11 #7) must emit exactly the
    per-dimension window ntiles, including a descending dimension
    expressed as a negated key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vspace_spark.operators.ordering import ntile_scalable_multi

    df = spark.range(103).select(
        F.col("id"),
        (F.col("id") * 37 % 11).alias("v"),
        (-(F.col("id") * 13 % 7)).alias("w"),
    )
    want = df.select(
        "id",
        F.ntile(4).over(Window.orderBy("v", "id")).alias("bv"),
        F.ntile(4).over(Window.orderBy("w", "id")).alias("bw"),
    )
    got = ntile_scalable_multi(
        df.repartition(5),
        4,
        [(["v", "id"], "bv"), (["w", "id"], "bw")],
        "id",
    ).select("id", "bv", "bw")
    w = {r["id"]: (r["bv"], r["bw"]) for r in want.collect()}
    g = {r["id"]: (r["bv"], r["bw"]) for r in got.collect()}
    assert g == w
