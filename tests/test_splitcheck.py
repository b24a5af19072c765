"""Split-leakage validation: exact/near counts, clean rows, parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.splitcheck import split_leakage, split_leakage_sql

DOCS = [
    (1, "train", "alpha beta gamma delta"),
    (2, "test", "alpha beta gamma delta"),       # exact leak vs 1
    (3, "train", "epsilon zeta eta theta iota"),
    (4, "valid", "epsilon zeta eta theta kappa"),  # 4/6 = 666pm near
    (5, "valid", "unrelated words entirely here"),
    (6, "test", "totally different text again"),
]


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, split string, text string")


def test_leakage_counts(spark):
    got = {(r["split_a"], r["split_b"]): (r["n_exact"], r["n_near"])
           for r in split_leakage(_df(spark), threshold_pm=600).collect()}
    # stable shape: all three unordered pairs present
    assert set(got) == {("test", "train"), ("test", "valid"),
                        ("train", "valid")}
    # docs 1(train)/2(test) identical -> exact leak (also near: 1000pm)
    assert got[("test", "train")] == (1, 1)
    # docs 3(train)/4(valid): inter 4, union 6 -> 666pm >= 600
    assert got[("train", "valid")] == (0, 1)
    assert got[("test", "valid")] == (0, 0)


def test_threshold_gates_near(spark):
    got = {(r["split_a"], r["split_b"]): r["n_near"]
           for r in split_leakage(_df(spark), threshold_pm=700).collect()}
    assert got[("train", "valid")] == 0   # 666 < 700
    assert got[("test", "train")] == 1    # the identical pair survives


def test_validation(spark):
    with pytest.raises(ValueError):
        split_leakage(_df(spark), threshold_pm=1001)
    with pytest.raises(ValueError):
        split_leakage(_df(spark), max_df=0)


def test_duckdb_parity(spark):
    got = sorted(tuple(r) for r in
                 split_leakage(_df(spark), 500).collect())
    vals = ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in DOCS)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(doc_id, split, text)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(
        split_leakage_sql(cte, 500)).fetchall())
    assert got == want
