"""WIMBD corpus censuses — top n-grams, duplicate share, domains."""

from __future__ import annotations

import duckdb

from jena_spark.data.wimbd import (
    domain_summary, duplicate_ngram_stats, ngram_cte, top_ngrams)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")


_ROWS = [
    (1, "the cat sat. The cat sat!", "web"),     # "the cat sat" twice
    (2, "the cat ran", "web"),
    (3, "a dog sat", "books"),
    (4, "xy", "books"),                          # < n words: no grams
]


def test_top_ngrams_counts_occurrences(spark):
    out = [(r["gram"], r["n_occ"])
           for r in top_ngrams(_docs(spark, _ROWS), n=3, k=3).collect()]
    # "the cat sat" occurs twice IN ONE DOC — positional counting
    assert out[0] == ("the cat sat", 2)
    assert len(out) == 3 and out[1][1] == 1
    # deterministic tie-break: count desc then gram asc
    assert out[1][0] < out[2][0]


def test_duplicate_ngram_stats(spark):
    row = duplicate_ngram_stats(_docs(spark, _ROWS), n=3).collect()[0]
    # grams: doc1 -> [the cat sat, cat sat the, sat the cat, the cat
    # sat], doc2 -> [the cat ran], doc3 -> [a dog sat]  = 6 occ,
    # 5 distinct, 2 occurrences duplicated
    assert (row["n_grams"], row["n_distinct"], row["n_dup_occ"]) == (6, 5, 2)
    assert row["dup_pm"] == 2 * 1_000_000 // 6


def test_domain_summary(spark):
    out = {r["source"]: r for r in
           domain_summary(_docs(spark, _ROWS)).collect()}
    assert out["web"]["n_docs"] == 2 and out["books"]["n_docs"] == 2
    assert out["web"]["n_tokens"] == 6 + 3
    assert out["web"]["doc_pm"] == 500_000


def test_ngram_cte_matches_spark(spark):
    from jena_spark.data.decontaminate import _raw_ngrams

    got = sorted(map(tuple,
                     _raw_ngrams(_docs(spark, _ROWS), "doc_id", "text", 3)
                     .collect()))
    vals = ", ".join(f"({i}, '{t}')" for i, t, _ in _ROWS)
    duckdb.sql("CREATE OR REPLACE VIEW documents AS SELECT * FROM (VALUES "
               + vals + ") AS v(doc_id, text)")
    want = sorted(map(tuple, duckdb.sql(ngram_cte(3)).fetchall()))
    duckdb.sql("DROP VIEW documents")
    assert got == want
