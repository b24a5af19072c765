"""Bigram-LM perplexity scoring (``jena_spark/data/lm.py``) — CCNet-style
data selection. The integer micro-bit columns must match a pure-Python
reference bit-for-bit (the same exactness contract as
``data/selection.py::importance_weights``)."""

from __future__ import annotations

import math
from collections import Counter

from jena_spark.data.lm import bigram_lm_scores

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat"),
    ("d3", "a dog barked at the cat"),
    ("d4", "one"),          # single word: no bigrams, omitted
    ("d5", "   "),          # blank: omitted
    ("d6", "the cat sat on the mat"),  # exact dup of d1: same score
]


def _py_scores(docs, lm):
    big, ctx, vocab = Counter(), Counter(), set()
    for _i, t in lm:
        ws = t.split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab)
    out = {}
    for i, t in docs:
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        s = 0
        for a, b in pairs:
            pr = (big.get((a, b), 0) + 1) / (ctx.get(a, 0) + v)
            s += math.floor(-math.log2(pr) * 1e6 + 0.5)
        out[i] = (len(pairs), s)
    return out


def _spark_scores(spark, docs, lm_docs=None):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    lm = (spark.createDataFrame(lm_docs, "doc_id string, text string")
          if lm_docs is not None else None)
    rows = bigram_lm_scores(df, lm).collect()
    return {r["doc_id"]: (r["n_bigrams"], r["nll_ubits"]) for r in rows}


def test_self_perplexity_matches_python(spark):
    got = _spark_scores(spark, DOCS)
    assert got == _py_scores(DOCS, DOCS)
    assert "d4" not in got and "d5" not in got
    assert got["d1"] == got["d6"]  # content-deterministic


def test_separate_reference_corpus(spark):
    lm = [("r1", "the cat sat"), ("r2", "a cat ran")]
    got = _spark_scores(spark, DOCS, lm)
    assert got == _py_scores(DOCS, lm)
    # fully OOV context: P = 1/V for every pair, V = 5
    oov = [("x1", "zzz qqq www")]
    got_oov = _spark_scores(spark, oov, lm)
    q = math.floor(-math.log2(1 / 5) * 1e6 + 0.5)
    assert got_oov == {"x1": (2, 2 * q)}


def test_ccnet_buckets_terciles(spark):
    from jena_spark.data.lm import ccnet_buckets

    # 6 docs per lang with clearly ordered predictability: the more
    # repetitive, the lower the bits/bigram
    rows = []
    for lang in ("en", "de"):
        for i in range(6):
            base = "aa bb" if lang == "en" else "xx yy"
            uniq = " ".join(f"{lang}{i}w{j}" for j in range(i * 2))
            rows.append((f"{lang}{i}", lang, (base + " ") * 6 + uniq))
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = {r.doc_id: r.bucket for r in ccnet_buckets(df).collect()}
    assert len(out) == 12
    for lang in ("en", "de"):
        buckets = [out[f"{lang}{i}"] for i in range(6)]
        # monotone score => first two head, middle two middle, rest tail
        assert buckets == ["head", "head", "middle", "middle",
                           "tail", "tail"], (lang, buckets)
    # approx path returns the same schema and a full assignment
    approx = ccnet_buckets(df, exact=False)
    assert approx.columns == ["doc_id", "lang", "avg_logprob", "bucket"]
    assert approx.count() == 12


def test_conversation_dedup_keep_first(spark):
    from jena_spark.data.transcripts import dedup_conversations

    turns = []
    for cid in ("c1", "c3", "c2"):   # c1/c2 identical, c3 differs
        seq = [("user", "hello"), ("assistant", "hi"),
               ("tool", "run" if cid == "c3" else "exec")]
        for i, (role, text) in enumerate(seq):
            turns.append((cid, i, role, text))
    # same text arriving with shuffled turn order must fingerprint
    # identically (array_sort by turn_idx)
    df = spark.createDataFrame(
        turns[::-1], "conv_id string, turn_idx int, role string, text string")
    out = {r.conv_id: r for r in dedup_conversations(df).collect()}
    assert out["c1"].fp == out["c2"].fp != out["c3"].fp
    assert (out["c1"].keep, out["c2"].keep, out["c3"].keep) == (1, 0, 1)
    assert all(r.n_turns == 3 for r in out.values())


def test_derived_float_columns(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    r = {x["doc_id"]: x for x in bigram_lm_scores(df).collect()}
    row = r["d1"]
    avg = row["nll_ubits"] / (1e6 * row["n_bigrams"])
    assert row["avg_logprob"] == round(avg, 6)
    assert abs(row["perplexity"] - 2 ** avg) < 1e-3
    # repeated text is more predictable than one-off text
    assert r["d1"]["avg_logprob"] < r["d3"]["avg_logprob"]


def test_mink_prob_scores(spark):
    """Min-K% selection arithmetic on a hand-computable corpus."""
    import math

    import pytest

    from jena_spark.data.lm import mink_prob_scores

    d = spark.createDataFrame([(1, "a a a b")], "doc_id bigint, text string")
    # self-LM: c2(a,a)=2 c2(a,b)=1 c1(a)=3 V=2
    q_ab = math.floor(-math.log2(2 / 5) * 1e6 + 0.5)   # least likely
    q_aa = math.floor(-math.log2(3 / 5) * 1e6 + 0.5)
    r50 = mink_prob_scores(d, k_pct=50).collect()[0]
    # n=3 bigram occurrences, c = max(1, 3*50 DIV 100) = 1 -> the one
    # (a,b) occurrence
    assert (r50["n_bigrams"], r50["n_sel"], r50["mink_ubits"]) \
        == (3, 1, q_ab)
    r100 = mink_prob_scores(d, k_pct=100).collect()[0]
    assert r100["mink_ubits"] == (q_ab + 2 * q_aa) // 3
    # partial take from a multiplicity-2 boundary bigram
    d2 = spark.createDataFrame([(1, "x y x y x")],
                               "doc_id bigint, text string")
    r = mink_prob_scores(d2, k_pct=25).collect()[0]
    assert (r["n_bigrams"], r["n_sel"]) == (4, 1)
    with pytest.raises(ValueError):
        mink_prob_scores(d, k_pct=0)
