"""Readability scoring (jena_spark.data.readability)."""

import pytest

from jena_spark.data.readability import (readability_census,
                                         readability_census_sql,
                                         readability_scores,
                                         readability_sql)

DOCS = [
    # "the cat sat." -> W=3 S=1 Y=3 (e, a, a)
    (1, "the cat sat."),
    # two sentences, polysyllabic words
    (2, "Considerable deliberation preceded it. Nobody objected loudly!"),
    # no terminal punctuation: S floors to 1
    (3, "headline fragment without any stop"),
    # all-consonant token contributes 0 syllables
    (4, "hmm why try"),
    (5, "   "),   # whitespace-only: dropped
    (6, ""),      # empty: dropped
]
SCHEMA = "doc_id long, text string"


def _py_counts(text):
    import re
    w = len(text.strip().split())
    s = max(1, len(re.findall(r"[.!?]+", text)))
    y = len(re.findall(r"[aeiouy]+", text.lower()))
    return w, s, y


def test_exact_integer_formulas(spark):
    d = spark.createDataFrame(DOCS, SCHEMA)
    got = {r.doc_id: r for r in readability_scores(d).collect()}
    assert set(got) == {1, 2, 3, 4}
    for doc_id, text in DOCS[:4]:
        w, s, y = _py_counts(text)
        r = got[doc_id]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
        assert r.fre_milli == 206835 - (1015 * w) // s - (84600 * y) // w
        assert r.fkg_milli == (390 * w) // s + (11800 * y) // w - 15590
    # sanity: simple monosyllabic text is EASIER (higher FRE) than the
    # polysyllabic document
    assert got[1].fre_milli > got[2].fre_milli
    assert got[1].fkg_milli < got[2].fkg_milli


def test_census_buckets_clamp(spark):
    d = spark.createDataFrame(DOCS, SCHEMA)
    rows = readability_census(d).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == 4
    assert all(0 <= r.grade_bucket <= 12 for r in rows)
    # doc 1: W=3 S=1 Y=3 -> fkg = 1170 + 11800 - 15590 = -2620 -> bucket 0
    assert any(r.grade_bucket == 0 for r in rows)


def test_duckdb_parity(spark):
    import duckdb

    d = spark.createDataFrame(DOCS, SCHEMA)
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    got = sorted(map(tuple, readability_scores(d).collect()))
    want = sorted(map(tuple, con.sql(readability_sql()).fetchall()))
    assert got == want
    gotc = sorted(map(tuple, readability_census(d).collect()))
    wantc = sorted(map(tuple, con.sql(readability_census_sql()).fetchall()))
    assert gotc == wantc
