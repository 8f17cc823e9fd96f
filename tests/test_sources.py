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
