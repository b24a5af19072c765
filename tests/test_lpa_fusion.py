"""Label propagation communities + reciprocal-rank fusion."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.fusion import RRF_SCALE, rrf_fuse, rrf_fuse_sql
from jena_spark.queries.graphalgo import (label_propagation,
                                          label_propagation_sql)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_lpa_disjoint_triangles(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                       ("x", "y"), ("y", "z"), ("z", "x")])
    got = {r["node"]: r["community"]
           for r in label_propagation(e, iters=3).collect()}
    # each triangle converges to its min label
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x"}


def test_lpa_validation(spark):
    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [("a", "b")]), iters=0)


def test_lpa_duckdb_parity_bridged(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"),
            ("x", "y"), ("y", "z"), ("z", "x"),
            ("c", "x"),              # bridge
            ("p", "q"),              # pendant pair
            ("b", "a")]              # reversed duplicate
    got = sorted(tuple(r) for r in
                 label_propagation(_edges(spark, rows), 3).collect())
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(src, dst)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in
                  con.sql(label_propagation_sql(cte, 3)).fetchall())
    assert got == want


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "qid long, did long, rank int")


def test_rrf_hand_computed(spark):
    lex = _ranking(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    dense = _ranking(spark, [(1, 20, 1), (1, 40, 2), (1, 10, 3)])
    got = {r["did"]: r for r in
           rrf_fuse({"lex": lex, "dense": dense}, k=4).collect()}
    c = lambda r: RRF_SCALE // (60 + r)
    assert got[20]["rrf_u"] == c(2) + c(1)     # both systems, best
    assert got[10]["rrf_u"] == c(1) + c(3)
    assert got[30]["rrf_u"] == c(3)
    assert got[30]["n_systems"] == 1
    # 20 beats 10: 16129+16393 > 16393+15873
    assert got[20]["rank"] == 1 and got[10]["rank"] == 2


def test_rrf_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse({}, k=4)
    with pytest.raises(ValueError):
        rrf_fuse({"a": _ranking(spark, [(1, 1, 1)])}, k=0)


def test_rrf_duckdb_parity(spark):
    lex = [(1, 10, 1), (1, 20, 2), (2, 30, 1)]
    dense = [(1, 20, 1), (1, 30, 2), (2, 30, 1), (2, 10, 2)]
    got = sorted(tuple(r) for r in rrf_fuse(
        {"lex": _ranking(spark, lex),
         "dense": _ranking(spark, dense)}, k=3).collect())
    mk = lambda rows: ("SELECT * FROM (VALUES "
                       + ", ".join(f"({q}, {d}, {r})" for q, d, r in rows)
                       + ") AS v(qid, did, rank)")
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(
        rrf_fuse_sql({"lex": mk(lex), "dense": mk(dense)},
                     k=3)).fetchall())
    assert got == want
