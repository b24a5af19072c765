"""Triangle counting: known graphs, orientation invariance, parity."""

from __future__ import annotations

import duckdb

from jena_spark.queries.graphalgo import triangle_count, triangle_count_sql

# K4 on {a,b,c,d} (4 triangles, 3 per node) + pendant e-a + a self
# loop and duplicate/reversed edges that normalization must absorb
EDGES = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
         ("b", "c"), ("c", "d"), ("b", "d"),
         ("e", "a"), ("c", "c"), ("a", "b")]


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_k4_plus_pendant(spark):
    got = {r["node"]: r["n_triangles"]
           for r in triangle_count(_df(spark)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_free(spark):
    path = spark.createDataFrame(
        [("p", "q"), ("q", "r")], "src string, dst string")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_count(path).collect()}
    assert got == {"p": 0, "q": 0, "r": 0}


def test_duckdb_parity(spark):
    got = sorted(tuple(r) for r in triangle_count(_df(spark)).collect())
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(src, dst)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in
                  con.sql(triangle_count_sql(cte)).fetchall())
    assert got == want


def test_clustering_coefficient(spark):
    from jena_spark.queries.graphalgo import clustering_coefficient

    got = {r["node"]: r for r in
           clustering_coefficient(_df(spark)).collect()}
    # K4 members that also touch e: a has deg 4 (b,c,d,e), 3 triangles
    # -> 2*3/(4*3) = 0.5
    assert (got["a"]["deg"], got["a"]["lcc_ppm"]) == (4, 500_000)
    # b,c,d: deg 3, 3 triangles -> 2*3/(3*2) = 1.0
    for n in ("b", "c", "d"):
        assert (got[n]["deg"], got[n]["lcc_ppm"]) == (3, 1_000_000)
    # pendant e: deg 1 -> 0 by convention
    assert (got["e"]["deg"], got["e"]["lcc_ppm"]) == (1, 0)


def test_clustering_duckdb_parity(spark):
    from jena_spark.queries.graphalgo import (clustering_coefficient,
                                              clustering_coefficient_sql)

    got = sorted(tuple(r) for r in
                 clustering_coefficient(_df(spark)).collect())
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(src, dst)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in
                  con.sql(clustering_coefficient_sql(cte)).fetchall())
    assert got == want


def test_degree_census(spark):
    from jena_spark.queries.graphalgo import (degree_census,
                                              degree_census_sql)

    got = {r["deg"]: (r["n_nodes"], r["share_ppm"]) for r in
           degree_census(_df(spark)).collect()}
    # K4+pendant: a has deg 4, b/c/d deg 3, e deg 1
    assert got == {4: (1, 200_000), 3: (3, 600_000), 1: (1, 200_000)}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(src, dst)"
    con = duckdb.connect()
    want = {r[0]: (r[1], r[2]) for r in
            con.sql(degree_census_sql(cte)).fetchall()}
    assert got == want
