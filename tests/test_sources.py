"""S1 reader contract: the sentinel is a RECORD delimiter, not a
line-level token. Documents may span newlines, ids are positional
(aligned with index2doc's document_index), empty records keep their
slot. Reference: vspace/pipelines/base.py:36, 56-73."""

from __future__ import annotations

from vspace_spark.io.sources import (
    RECORD_DELIMITER,
    load_raw_corpus,
    load_raw_corpus_lines,
)


def test_multiline_documents_do_not_fragment(spark, tmp_path):
    docs = [
        "first doc\nspans two lines",
        "second doc on one line",
        "third\nhas\nthree newlines\n",
    ]
    p = tmp_path / "corpus.txt"
    p.write_text(RECORD_DELIMITER.join(docs))
    got = {
        r.document_index: r.text
        for r in load_raw_corpus(spark, str(p)).collect()
    }
    assert len(got) == 3
    # positional ids in file order, text verbatim (modulo the trailing
    # record's final newline, which TextInputFormat treats as line end)
    assert got[0] == docs[0]
    assert got[1] == docs[1]
    assert got[2].rstrip("\n") == docs[2].rstrip("\n")


def test_empty_records_keep_positional_slots(spark, tmp_path):
    """An empty document must still consume an index so later documents
    stay aligned with the external index2doc TSV."""
    docs = ["doc zero", "", "doc two"]
    p = tmp_path / "corpus.txt"
    p.write_text(RECORD_DELIMITER.join(docs))
    got = {
        r.document_index: r.text
        for r in load_raw_corpus(spark, str(p)).collect()
    }
    assert sorted(got) == [0, 1, 2]
    assert got[1] == ""
    assert got[2] == "doc two"


def test_cross_split_reassembly_and_positional_ids(spark, tmp_path):
    """The hard case behind the round-1 bug (ADVICE r1, high): records
    spanning INPUT-SPLIT boundaries. With split.maxsize forced to 8 KB
    a ~400 KB corpus reads as ~50 splits, so dozens of documents (and
    239-byte sentinels) straddle split boundaries. TextInputFormat must
    reassemble each record in the split that owns its start, and
    zipWithIndex must number partitions in file-offset order — ids
    positional, text intact, for every document."""
    docs = [f"document {i} " + ("x" * (50 + i % 97)) + f"\nline2 of {i}" for i in range(2000)]
    p = tmp_path / "corpus.txt"
    p.write_text(RECORD_DELIMITER.join(docs))
    got = {
        r.document_index: r.text
        for r in load_raw_corpus(
            spark,
            str(p),
            hadoop_conf={
                "mapreduce.input.fileinputformat.split.maxsize": "8192"
            },
        ).collect()
    }
    assert len(got) == len(docs)
    assert got == dict(enumerate(docs))


def test_lines_fast_path_fragments_multiline_by_design(spark, tmp_path):
    """The documented limitation that makes load_raw_corpus the default:
    the pure-DataFrame fast path splits a multi-line document."""
    docs = ["one\ntwo", "three"]
    p = tmp_path / "corpus.txt"
    p.write_text(RECORD_DELIMITER.join(docs))
    n_fast = load_raw_corpus_lines(spark, str(p)).count()
    n_faithful = load_raw_corpus(spark, str(p)).count()
    assert n_faithful == 2
    assert n_fast == 3  # "one", "two", "three"


class TestCompaction:
    def test_small_files_compact_and_preserve_rows(
        self, spark, sf_dir, tmp_path
    ):
        from pyspark.sql import functions as F

        from vspace_spark.io.maintenance import compact_parquet
        from vspace_spark.io.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "fragmented")
        dst = str(tmp_path / "compacted")
        docs.repartition(64).write.parquet(src)  # simulate ingest slivers
        stats = compact_parquet(spark, src, dst, target_mb=256)
        assert stats["files_before"] >= 64
        assert stats["files_after"] < stats["files_before"] // 8
        back = spark.read.parquet(dst)
        assert back.count() == docs.count()
        assert set(back.columns) == set(docs.columns)

    def test_sorted_compaction_restores_pruning_stats(
        self, spark, sf_dir, tmp_path
    ):
        from pyspark.sql import functions as F

        from vspace_spark.io.maintenance import compact_parquet
        from vspace_spark.io.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "frag2")
        dst = str(tmp_path / "sorted")
        docs.repartition(16).write.parquet(src)
        compact_parquet(
            spark, src, dst, target_mb=1, sort_cols=["doc_id"]
        )
        back = spark.read.parquet(dst)
        # row-group/file stats now cluster doc_id: a point lookup must
        # still return exactly its row (correctness of the re-sort)
        lo = back.agg(F.min("doc_id")).collect()[0][0]  # bounded-collect: 1-row agg
        assert back.filter(F.col("doc_id") == lo).count() == 1
