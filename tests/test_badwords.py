"""C4 blocklist filter (jena_spark.data.filters.badwords_filter)."""

import pytest

from jena_spark.data.filters import (DEFAULT_BADWORDS, badwords_filter,
                                     badwords_regex, badwords_sql)

DOCS = [
    (1, "a perfectly clean document."),
    (2, "this DAMN thing sucks"),              # 2 hits, 2 distinct
    (3, "my scrapbook of handicrap art"),      # substrings never fire
    (4, "damn damn damn"),                     # 3 hits, 1 distinct
    (5, "please shut up now"),                 # space-joined phrase
    (6, ""),
]
SCHEMA = "doc_id long, text string"


def test_hits_and_verdicts(spark):
    d = spark.createDataFrame(DOCS, SCHEMA)
    out = {r.doc_id: r for r in badwords_filter(d).collect()}
    assert (out[1].n_bad_hits, out[1].bw_ok) == (0, 1)
    assert (out[2].n_bad_hits, out[2].n_bad_distinct, out[2].bw_ok) == \
        (2, 2, 0)
    assert (out[3].n_bad_hits, out[3].bw_ok) == (0, 1)
    assert (out[4].n_bad_hits, out[4].n_bad_distinct) == (3, 1)
    assert out[5].n_bad_hits == 1
    assert out[6].bw_ok == 1
    # hit budget loosens the verdict
    loose = {r.doc_id: r.bw_ok
             for r in badwords_filter(d, max_hits=2).collect()}
    assert (loose[2], loose[4]) == (1, 0)


def test_blocklist_validation():
    with pytest.raises(ValueError):
        badwords_regex(())
    with pytest.raises(ValueError):
        badwords_regex(("ok", "In|ject"))
    with pytest.raises(ValueError):
        badwords_regex(("Upper",))


def test_duckdb_parity(spark):
    import duckdb

    d = spark.createDataFrame(DOCS, SCHEMA)
    got = sorted(map(tuple, badwords_filter(d).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = sorted(map(tuple, con.sql(badwords_sql()).fetchall()))
    assert got == want
