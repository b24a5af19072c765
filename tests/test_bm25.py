"""BM25 ranked retrieval (jena_spark.data.bm25)."""

import math

import pytest

from jena_spark.data.bm25 import bm25_sql, bm25_topk

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick quick brown foxes are quick and brown"),
    (3, "a lazy dog sleeps all day the dog dreams"),
    (4, "completely unrelated text about spark dataframes"),
    (5, "brown dog and brown fox play in the brown field"),
]
QUERIES = [(100, "quick brown fox"), (101, "lazy dog"),
           (102, "zzz nothing here")]


def _float_bm25_order(query, k=3):
    """Ranking under textbook float BM25 (k1=1.2, b=0.75, Lucene idf)."""
    import re
    from collections import Counter

    def toks(t):
        return [w for w in
                re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    tfm = {d: Counter(toks(t)) for d, t in CORPUS}
    dl = {d: sum(c.values()) for d, c in tfm.items()}
    n = sum(1 for d in dl if dl[d] > 0)
    avg = sum(dl.values()) / n
    df = Counter(t for d in tfm for t in set(tfm[d]))

    def score(d):
        s = 0.0
        for t in set(toks(query)):
            tf = tfm[d].get(t, 0)
            if tf:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[d] / avg))
        return s

    ranked = sorted(((score(d), -d) for d, _ in CORPUS if score(d) > 0),
                    reverse=True)
    return [-x[1] for x in ranked][:k]


def test_bm25_matches_float_reference_ranking(spark):
    c = spark.createDataFrame(CORPUS, "did bigint, text string")
    q = spark.createDataFrame(QUERIES, "qid bigint, text string")
    rows = bm25_topk(q, c, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, qtext in QUERIES:
        got = [r.did for r in
               sorted(by_q.get(qid, []), key=lambda r: r.rank)]
        assert got == _float_bm25_order(qtext), (qid, got)
    # rarer terms outweigh hotter ones: for q100, doc 1 (all 3 terms,
    # short) beats doc 2 (tf-heavy on hot terms)
    assert by_q[100][0].hits == 3 or by_q[100][0].did == 1
    # zero-match query emits no rows
    assert 102 not in by_q


def test_bm25_duckdb_parity(spark):
    import duckdb

    c = spark.createDataFrame(CORPUS, "did bigint, text string")
    q = spark.createDataFrame(QUERIES, "qid bigint, text string")
    got = sorted(map(tuple, bm25_topk(q, c, k=4).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE c(did BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", CORPUS)
    con.sql("CREATE TABLE q(qid BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?)", QUERIES)
    want = sorted(map(tuple, con.sql(
        bm25_sql("SELECT qid, text FROM q",
                 "SELECT did, text FROM c", k=4)).fetchall()))
    assert got == want


def test_bm25_df_cap_drops_hot_terms(spark):
    # "brown" appears in 3/5 docs; cap at 2 removes it from scoring
    c = spark.createDataFrame(CORPUS, "did bigint, text string")
    q = spark.createDataFrame([(7, "brown")], "qid bigint, text string")
    assert bm25_topk(q, c, k=5, max_df=2).count() == 0
    assert bm25_topk(q, c, k=5).count() == 3
    # parity holds under the cap too
    import duckdb

    q2 = spark.createDataFrame([(8, "quick brown dog")],
                               "qid bigint, text string")
    got = sorted(map(tuple, bm25_topk(q2, c, k=5, max_df=2).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE c(did BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", CORPUS)
    con.sql("CREATE TABLE q(qid BIGINT, text VARCHAR)")
    con.sql("INSERT INTO q VALUES (8, 'quick brown dog')")
    want = sorted(map(tuple, con.sql(
        bm25_sql("SELECT qid, text FROM q",
                 "SELECT did, text FROM c", k=5, max_df=2)).fetchall()))
    assert got == want


def test_bm25_rejects_bad_k(spark):
    c = spark.createDataFrame(CORPUS, "did bigint, text string")
    q = spark.createDataFrame(QUERIES, "qid bigint, text string")
    with pytest.raises(ValueError):
        bm25_topk(q, c, k=0)
