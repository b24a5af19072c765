"""Distinct-n diversity census: counts, ratios, parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.diversity import distinct_ngrams, distinct_ngrams_sql

DOCS = [
    (1, "web", "the cat the cat"),
    (2, "web", "the dog"),
    (3, "gen", "a a a a"),
    (4, "gen", ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string,"
                                       " text string")


def test_counts(spark):
    got = {(r["slice"], r["n"]): r for r in
           distinct_ngrams(_df(spark), (1, 2)).collect()}
    # web 1-grams: occurrences 6 (the cat the cat the dog),
    # types {the, cat, dog} = 3
    assert (got[("web", 1)]["n_occurrences"],
            got[("web", 1)]["n_types"]) == (6, 3)
    assert got[("web", 1)]["distinct_ppm"] == 500_000
    # web 2-grams: doc1 has 3 ("the cat","cat the","the cat"),
    # doc2 has 1 -> occ 4, types {the cat, cat the, the dog} = 3
    assert (got[("web", 2)]["n_occurrences"],
            got[("web", 2)]["n_types"]) == (4, 3)
    # gen 1-grams: 4 occurrences of one type (mode collapse signal)
    assert got[("gen", 1)]["distinct_ppm"] == 250_000
    # gen 2-grams: 3 occurrences, 1 type
    assert (got[("gen", 2)]["n_occurrences"],
            got[("gen", 2)]["n_types"]) == (3, 1)


def test_validation(spark):
    with pytest.raises(ValueError):
        distinct_ngrams(_df(spark), ())


def test_duckdb_parity(spark):
    got = sorted(tuple(r) for r in
                 distinct_ngrams(_df(spark), (1, 2, 3)).collect())
    vals = ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in DOCS)
    cte = (f"SELECT * FROM (VALUES {vals})"
           " AS v(doc_id, source, text)")
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(
        distinct_ngrams_sql(cte, (1, 2, 3))).fetchall())
    assert got == want
