"""Length-sorted batching: assignment, waste arithmetic, parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.batching import (batch_by_length, batch_stats,
                                      batch_stats_sql)

ROWS = [
    (1, "a"),                    # 1 token
    (2, "b b"),                  # 2
    (3, "c c c"),                # 3
    (4, "d d d d"),              # 4
    (5, "e e e e e"),            # 5
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_assignment_sorted_by_length(spark):
    got = {r["doc_id"]: r for r in
           batch_by_length(_df(spark), batch_size=2).collect()}
    assert [got[i]["batch_id"] for i in (1, 2, 3, 4, 5)] == \
        [0, 0, 1, 1, 2]
    assert [got[i]["pos_in_batch"] for i in (1, 2, 3, 4, 5)] == \
        [0, 1, 0, 1, 0]


def test_waste_ppm(spark):
    got = {r["batch_id"]: r for r in
           batch_stats(_df(spark), batch_size=2).collect()}
    # batch 0: lens (1,2) -> rect 4, sum 3 -> waste 250000 ppm
    assert got[0]["waste_ppm"] == 250_000
    # batch 1: lens (3,4) -> rect 8, sum 7 -> 125000
    assert got[1]["waste_ppm"] == 125_000
    # batch 2: single doc -> zero padding
    assert got[2]["waste_ppm"] == 0


def test_validation(spark):
    with pytest.raises(ValueError):
        batch_by_length(_df(spark), batch_size=0)


def test_duckdb_parity(spark):
    got = sorted(tuple(r) for r in
                 batch_stats(_df(spark), 2).collect())
    vals = ", ".join(f"({i}, '{t}')" for i, t in ROWS)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in
                  con.sql(batch_stats_sql(cte, 2)).fetchall())
    assert got == want
