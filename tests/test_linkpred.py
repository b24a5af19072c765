"""Link prediction: wedge candidates, adjacency exclusion, parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.queries.graphalgo import link_prediction, link_prediction_sql

# square a-b-c-d-a plus chord hub e connected to a and c
EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
         ("e", "a"), ("e", "c")]


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_candidates_and_scores(spark):
    got = {(r["u"], r["v"]): r for r in
           link_prediction(_df(spark), top_m=10).collect()}
    # a and c are non-adjacent with common neighbors {b, d, e}
    ac = got[("a", "c")]
    assert ac["common_neighbors"] == 3
    # deg(a)=3, deg(c)=3 -> jaccard 3/(3+3-3)=1.0
    assert ac["jaccard_ppm"] == 1_000_000
    # b and d: commons {a, c}; deg(b)=deg(d)=2 -> 2/(2+2-2)=1.0
    assert got[("b", "d")]["common_neighbors"] == 2
    # existing edges never appear
    assert ("a", "b") not in got and ("a", "d") not in got
    # b-e: common {a, c} -> present with 2
    assert got[("b", "e")]["common_neighbors"] == 2


def test_validation(spark):
    with pytest.raises(ValueError):
        link_prediction(_df(spark), top_m=0)


def test_hub_cap_drops_wedges(spark):
    # cap below e's degree: wedges centered at a/c/e (deg>cap) vanish
    out = link_prediction(_df(spark), top_m=10, max_center_degree=2)
    got = {(r["u"], r["v"]): r["common_neighbors"] for r in out.collect()}
    # centers b, d, e (deg 2) remain; a and c (deg 3) are dropped, so
    # the pairs they centered (b,d), (b,e), (d,e) vanish
    assert got == {("a", "c"): 3}


def test_duckdb_parity(spark):
    got = [tuple(r) for r in
           link_prediction(_df(spark), top_m=6).collect()]
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(src, dst)"
    con = duckdb.connect()
    want = [tuple(r) for r in
            con.sql(link_prediction_sql(cte, top_m=6)).fetchall()]
    assert got == want  # ORDER-sensitive: total ordering is the contract
