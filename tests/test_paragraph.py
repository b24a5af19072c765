"""Segment-level exact dedup (``data/paragraph.py``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.data.paragraph import (  # noqa: E402
    dedup_segments,
    dedup_substrings,
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


# --- ExactSubstr span excision ------------------------------------------


def _brute_substr(docs: list[tuple[int, str]], k: int):
    """Reference implementation of the dedup_substrings contract."""
    words = {d: t.split() for d, t in docs}
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(words):
        ws = words[d]
        for p in range(len(ws) - k + 1):
            first.setdefault(" ".join(ws[p:p + k]), (d, p))
    out = {}
    for d, _ in docs:
        ws = words[d]
        covered: set[int] = set()
        for p in range(len(ws) - k + 1):
            if first[" ".join(ws[p:p + k])] != (d, p):
                covered.update(range(p, p + k))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def test_substr_excision_basics(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog but differently"),
        (3, "a short doc"),               # < k words -> intact
        (4, ""),                          # empty -> 0 words
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_substrings(d, k=5).collect()}
    # doc1 (global first) keeps everything
    assert out[1].clean_text == rows[0][1] and out[1].n_removed == 0
    # doc2 loses exactly the 9-word shared run
    assert out[2].clean_text == "but differently"
    assert out[2].n_removed == 9 and out[2].n_words == 11
    # short / empty docs pass through
    assert out[3].clean_text == "a short doc" and out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_words == 0
    # exact duplicate of doc1 is fully excised
    assert out[5].clean_text == "" and out[5].n_removed == 12


def test_substr_plan_no_window(spark):
    """Scale invariant: the winner election is a hash aggregate, never
    a window over the (hot) gram key — a boilerplate passage occurring
    10^9 times must collapse map-side."""
    d = spark.createDataFrame(
        [(i, "w " * 40) for i in range(4)], "doc_id long, text string")
    plan = dedup_substrings(d, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_substr_matches_bruteforce(spark):
    # deterministic corpus with heavy cross-doc and intra-doc repeats
    vocab = ["red", "blue", "green", "ox", "hen", "sky", "mud", "fir"]
    docs = []
    for d in range(12):
        ws = [vocab[(d * 7 + i * i) % len(vocab)] for i in range(30)]
        if d % 3 == 1:      # splice in a shared run
            ws[5:13] = ["shared"] * 4 + ["run", "of", "words", "here"]
        if d % 4 == 2:      # intra-doc repeat
            ws.extend(ws[:10])
        docs.append((d, " ".join(ws)))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    for k in (4, 7):
        got = {r.doc_id: (r.clean_text, r.n_words, r.n_removed)
               for r in dedup_substrings(sdf, k=k).collect()}
        assert got == _brute_substr(docs, k), f"k={k}"
