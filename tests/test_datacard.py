"""Corpus release manifest: composed rollup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark.data.datacard import corpus_manifest

DOCS = [
    # source A: 3 docs, one exact-dup pair, mixed langs
    (1, "A", "en", "one two three"),
    (2, "A", "en", "one two three"),          # dup of 1
    (3, "A", "fr", "quatre cinq"),
    # source B: 2 docs, no dups
    (4, "B", "en", "a b c d"),
    (5, "B", "de", "ein zwei drei vier funf"),
]


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, lang string, text string")


def test_manifest_rollup(spark):
    # min_words=1: every doc passes the length rule; the battery's
    # other rules pass trivially on these tiny clean docs except the
    # stopword floor -- set 0 so the pass column is all-1 and the
    # test pins the COMPOSITION arithmetic, not the battery itself
    got = {r["source"]: r for r in corpus_manifest(
        _df(spark), min_words=1, min_required_stops=0).collect()}
    a = got["A"]
    assert (a["n_docs"], a["n_tokens"]) == (3, 8)
    assert a["mean_doc_tokens"] == 2                 # floor(8/3)
    assert a["en_ppm"] == 666_666
    assert a["dup_doc_ppm"] == 666_666               # docs 1 and 2
    b = got["B"]
    assert (b["n_docs"], b["n_tokens"]) == (2, 9)
    assert b["dup_doc_ppm"] == 0
    assert b["en_ppm"] == 500_000
    for r in got.values():
        assert 0 <= r["gopher_pass_ppm"] <= 1_000_000
