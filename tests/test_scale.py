"""Scale-operator tests: salting preserves results; bucketed joins
drop the exchange from the plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.operators.scale import (
    salted_aggregate,
    salted_broadcast_left_join,
    write_bucketed,
)
from vspace_spark.plans.explain import formatted_plan


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, r.qty)
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, r.qty)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": ("l_quantity", "count"), "qty": ("l_quantity", "sum")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey", "left")
    salted = salted_broadcast_left_join(orders, cust, "o_custkey")
    assert salted.count() == plain.count()
    a = {(r.o_orderkey, r.c_mktsegment) for r in plain.collect()}
    b = {(r.o_orderkey, r.c_mktsegment) for r in salted.collect()}
    assert a == b


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey"
        )
        write_bucketed(
            li.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
            "b_lineitem",
            "o_orderkey",
        )
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:3000]
        # and it still computes the right thing
        expected = orders.join(
            li.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
            "o_orderkey",
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_max_records_per_file_controls_layout(spark, sf_dir, tmp_path):
    """Writer file-size control: maxRecordsPerFile splits output so no
    file exceeds the bound — the knob that keeps 100 TB outputs from
    producing unreadable multi-GB files."""
    import os

    out = str(tmp_path / "bounded")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    n = li.count()
    (
        li.coalesce(1)
        .write.option("maxRecordsPerFile", 1000)
        .mode("overwrite")
        .parquet(out)
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= n // 1000, files
    assert spark.read.parquet(out).count() == n


def test_deterministic_sample_stable_under_repartition(spark, sf_dir):
    """The property rand(seed) lacks: membership is content-addressed,
    so repartitioning (or a different cluster size) yields the SAME
    sample. Splits are disjoint+exhaustive and roughly sized."""
    from vspace_spark.operators.sampling import (
        deterministic_sample,
        train_test_split_col,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    s1 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    s2 = {
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(17), "doc_id", 0.2
        ).collect()
    }
    assert s1 == s2 and 0 < len(s1) < docs.count()
    # independent draw under a different salt
    s3 = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.2, salt="v2").collect()
    }
    assert s3 != s1

    split = docs.select(
        "doc_id", train_test_split_col("doc_id").alias("split")
    )
    counts = {r.split: r.n for r in split.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_footer_row_count_exact_and_safe(spark, sf_dir):
    """footer_row_count reads the exact row count from parquet footers
    (no Spark job) for plain scans, and refuses (None) once a filter
    sits above the scan — the domain the K ∝ N codebook sizing needs."""
    from vspace_spark.operators.scale import footer_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    n = footer_row_count(emb)
    assert n is not None and n == emb.count()
    # in-memory input: no files -> None (callers fall back to count())
    mem = spark.range(10)
    assert footer_row_count(mem) is None
    # filtered scan: inputFiles() still lists files, but the footer
    # count would overcount -> must refuse
    assert footer_row_count(emb.filter(F.col("vec_id") > 10)) is None


def test_input_bytes_sees_through_dictionary_encoding(spark, tmp_path):
    """_uncompressed_input_bytes must estimate DECODED size: a
    replicated text corpus dictionary-encodes so its row-group
    total_byte_size stays near one copy's bytes no matter how many
    clones the scan carries (the round-12 keep_best probe: the 100x
    bench corpus read 51.7 MB 'uncompressed' vs ~160 MB decoded,
    parking the x8-expanded shingle persist at 413 MB — just under
    the 512 MB DISK_ONLY floor). The estimate must scale with the
    replica count; a
    high-entropy corpus of the same decoded size must estimate the
    same ballpark (the non-dictionary path is unchanged)."""
    import random

    from vspace_spark.operators.scale import _uncompressed_input_bytes

    text = "the quick brown fox jumps over the lazy dog " * 20  # 900 B
    n = 20_000
    dict_path = str(tmp_path / "dict.parquet")
    spark.createDataFrame(
        [(i, text) for i in range(n)], "id long, text string"
    ).coalesce(1).write.parquet(dict_path)
    rng = random.Random(7)
    plain_path = str(tmp_path / "plain.parquet")
    spark.createDataFrame(
        [
            (i, "".join(rng.choice("abcdefgh ") for _ in range(len(text))))
            for i in range(n)
        ],
        "id long, text string",
    ).coalesce(1).write.parquet(plain_path)

    decoded = n * len(text)
    est_dict = _uncompressed_input_bytes(spark.read.parquet(dict_path))
    est_plain = _uncompressed_input_bytes(spark.read.parquet(plain_path))
    assert est_dict is not None and est_plain is not None
    # within 2x of the true decoded text bytes, both layouts — the
    # old encoded-bytes estimate sat ~100x under for the dict layout
    assert decoded / 2 <= est_dict <= decoded * 2
    assert decoded / 2 <= est_plain <= decoded * 2


def test_input_bytes_footer_sampling_bounded(spark, tmp_path):
    """Above _EST_MAX_FOOTERS input files the estimator reads an
    evenly-spaced footer sample and scales by the file count — a
    100 TB table has tens of thousands of files and a persist
    decision must not pay a per-file driver-side metadata read. The
    scaled estimate must land within 2x of the exact per-file sweep
    on a uniform many-file layout."""
    from vspace_spark.operators import scale as sc

    many = str(tmp_path / "many.parquet")
    spark.range(20_000).selectExpr(
        "id", "repeat('x', 100) as text"
    ).repartition(200).write.parquet(many)
    df = spark.read.parquet(many)
    assert len(df.inputFiles()) > sc._EST_MAX_FOOTERS

    sampled = sc._uncompressed_input_bytes(df)
    orig_max = sc._EST_MAX_FOOTERS
    try:
        sc._EST_MAX_FOOTERS = 10_000  # force the exact sweep
        exact = sc._uncompressed_input_bytes(df)
    finally:
        sc._EST_MAX_FOOTERS = orig_max
    assert sampled is not None and exact is not None
    assert exact / 2 <= sampled <= exact * 2


def test_input_bytes_survives_exotic_nested_leaf(spark, tmp_path, monkeypatch):
    """One unresolvable nested leaf must degrade to ITS chunk's
    encoded-bytes fallback, not kill the whole-file estimate
    (ADVICE r12): _leaf_avg_decoded_bytes guards the entire Arrow
    walk, so an exception on one exotic column leaves the other
    columns' decoded-size arithmetic intact."""
    import pyarrow.compute as pc

    from vspace_spark.operators import scale as sc

    # map-typed leaf (path m.key_value.key) + a plain text column;
    # repeated values force dictionary encoding on every string leaf
    path = str(tmp_path / "nested.parquet")
    spark.createDataFrame(
        [(i, {"k": "v"}, "the same sentence again " * 10)
         for i in range(5_000)],
        "id long, m map<string,string>, text string",
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    base = sc._uncompressed_input_bytes(df)
    assert base is not None and base > 0

    # force an Arrow failure inside the leaf walk: every sampled leaf
    # now raises, so ALL dictionary string leaves fall back to encoded
    # bytes — the estimate must survive (not None), just smaller
    def boom(*a, **k):
        raise RuntimeError("exotic leaf")

    monkeypatch.setattr(pc, "list_flatten", boom)
    monkeypatch.setattr(pc, "struct_field", boom)
    monkeypatch.setattr(pc, "binary_length", boom)
    degraded = sc._uncompressed_input_bytes(df)
    assert degraded is not None and 0 < degraded <= base


@pytest.mark.slow  # >20 s (measured r14): driver verify-window budget
def test_no_unresolved_est_in_scale_paths(spark):
    """VERDICT r12 #5: every persist_shared site reached by the bench's
    heavy queries (the 100x block + the corpus-sized curation writes)
    must resolve a size estimate — est=None silently falls back to the
    heap-resident MEMORY_AND_DISK level, the exact class of bug the
    r12 keep_best probe chased for two rounds. KNOWN_SMALL (an
    explicit reviewed claim) passes; None fails. The audit hook
    records at query-construction time, so this runs the cheap
    sf0.001 fixtures."""
    import bench
    from vspace_spark.operators import scale as sc
    from vspace_spark.queries import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    names = sorted(
        set(bench.HEADLINE)
        | {
            "shard_manifest",
            "doc_pack_sequences",
            "curated_corpus",
            "doc_training_order",
            "vocabulary",
        }
    )
    gaps = []
    sc._PERSIST_AUDIT = audit = []
    try:
        for name in names:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            before = len(audit)
            df = fn(spark, sf)
            df.count()
            for rec in audit[before:]:
                if rec["est_bytes"] is None:
                    gaps.append({"query": name, **rec})
            spark.catalog.clearCache()
    finally:
        sc._PERSIST_AUDIT = None
        spark.catalog.clearCache()
    assert audit, "audit hook recorded nothing — wiring broken?"
    assert not gaps, (
        "persist_shared sites with unresolved (None) size estimates "
        f"in scale paths: {gaps}"
    )
