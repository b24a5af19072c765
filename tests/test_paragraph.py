"""Segment-level exact dedup (``data/paragraph.py``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.data.paragraph import (  # noqa: E402
    dedup_segments,
    segment_documents,
)

PARA_DOCS = [
    (0, "alpha beta\n\nshared passage one\n\ngamma delta"),
    (1, "shared passage one\n\nunique to doc one"),
    (2, "shared passage one\n\nshared passage one\n\nepsilon"),
    (3, "shared passage one"),  # loses everything -> empty
    (4, "   \n\n  "),           # no segments at all
]


def _para(spark):
    return spark.createDataFrame(PARA_DOCS, "doc_id long, text string")


def test_segment_para_positions(spark):
    segs = {(r.doc_id, r.pos): r.seg
            for r in segment_documents(_para(spark)).collect()}
    assert segs[(0, 1)] == "shared passage one"
    assert segs[(2, 0)] == segs[(2, 1)] == "shared passage one"
    assert not any(d == 4 for d, _ in segs)  # whitespace-only dropped


def test_dedup_segments_keep_first_global(spark):
    out = {r.doc_id: r for r in dedup_segments(_para(spark)).collect()}
    # doc0 holds the globally-first occurrence (doc_id order), keeps all
    assert out[0].clean_text == PARA_DOCS[0][1]
    assert (out[0].n_segs, out[0].n_kept) == (3, 3)
    # later occurrences lose, including the intra-doc repeat in doc2
    assert out[1].clean_text == "unique to doc one"
    assert out[2].clean_text == "epsilon"
    assert (out[2].n_segs, out[2].n_kept) == (3, 1)
    # a document can lose every segment but stays a row
    assert out[3].clean_text == "" and out[3].n_kept == 0
    assert out[4].clean_text == "" and out[4].n_segs == 0
    assert set(out) == {0, 1, 2, 3, 4}


def test_dedup_segments_key_modes_identical(spark):
    d = _para(spark)
    a = sorted(map(tuple, dedup_segments(d, key="md5").collect()))
    b = sorted(map(tuple, dedup_segments(d, key="text").collect()))
    assert a == b


def test_words_mode_windows_and_dedup(spark):
    rows = [(0, "a b c d e f g"),   # k=3 -> "a b c" "d e f" "g"
            (1, "d e f x y z"),     # k=3 -> "d e f" (dup) "x y z"
            (2, "g")]               # single short window, dup of doc0's
    d = spark.createDataFrame(rows, "doc_id long, text string")
    segs = {(r.doc_id, r.pos): r.seg for r in
            segment_documents(d, mode="words", k=3).collect()}
    assert segs[(0, 0)] == "a b c" and segs[(0, 2)] == "g"
    out = {r.doc_id: r for r in
           dedup_segments(d, mode="words", k=3).collect()}
    assert out[0].clean_text == "a b c d e f g"
    assert out[1].clean_text == "x y z"
    assert out[2].clean_text == "" and out[2].n_segs == 1
