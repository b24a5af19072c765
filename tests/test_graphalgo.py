"""Integer PageRank / HITS (jena_spark.queries.graphalgo)."""

import pytest

from jena_spark.queries.graphalgo import (D_DEN, D_NUM, TOTAL_MASS, hits,
                                          hits_sql, pagerank, pagerank_sql)

# star into "hub" plus a 2-cycle and a dangling sink
EDGES = [("a", "hub"), ("b", "hub"), ("c", "hub"),
         ("hub", "a"),
         ("x", "y"), ("y", "x"),
         ("hub", "sink")]


def _py_pagerank(edges, iters):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    p = {v: TOTAL_MASS // n for v in nodes}
    base = (TOTAL_MASS // n) * (D_DEN - D_NUM) // D_DEN
    for _ in range(iters):
        inmass = {v: 0 for v in nodes}
        for s, d in edges:
            inmass[d] += p[s] // outdeg[s]
        p = {v: base + D_NUM * inmass[v] // D_DEN for v in nodes}
    return p


def test_pagerank_exact_integer_values(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank_u for r in pagerank(e, iters=3).collect()}
    assert got == _py_pagerank(EDGES, 3)
    # the hub out-ranks its spokes; the 2-cycle nodes tie exactly
    assert got["hub"] > got["a"] > got["b"] == got["c"]
    assert got["x"] == got["y"]


def test_pagerank_duckdb_parity(spark):
    import duckdb

    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(map(tuple, pagerank(e, iters=4).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    want = sorted(map(tuple, con.sql(
        pagerank_sql("SELECT src, dst FROM e", iters=4)).fetchall()))
    assert got == want


def test_pagerank_mass_bounded(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    total = sum(r.rank_u for r in pagerank(e, iters=3).collect())
    # dangling mass is dropped, floors only shrink: never exceeds the
    # budget, never collapses
    assert TOTAL_MASS // 2 < total <= TOTAL_MASS


def test_pagerank_bad_iters(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
    with pytest.raises(ValueError):
        pagerank_sql("SELECT 1 AS src, 2 AS dst", iters=0)


def _py_hits(edges, iters):
    nodes = sorted({n for e in edges for n in e})
    h = {v: TOTAL_MASS // len(nodes) for v in nodes}
    a = {}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += h[s]
        tot = sum(raw.values())
        a = {v: raw[v] * TOTAL_MASS // tot for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += a[d]
        tot = sum(raw.values())
        h = {v: raw[v] * TOTAL_MASS // tot for v in nodes}
    return h, a


def test_hits_exact_integer_values(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: (r.hub_u, r.auth_u) for r in hits(e, iters=3).collect()}
    ph, pa = _py_hits(EDGES, 3)
    assert got == {v: (ph[v], pa[v]) for v in ph}
    # the star target is the top authority; its spokes are hubs
    assert got["hub"][1] == max(v[1] for v in got.values())
    assert got["sink"][0] == 0          # no out-edges -> zero hub


def test_hits_duckdb_parity(spark):
    import duckdb

    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(map(tuple, hits(e, iters=4).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    want = sorted(map(tuple, con.sql(
        hits_sql("SELECT src, dst FROM e", iters=4)).fetchall()))
    assert got == want


def test_hits_bad_iters(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        hits(e, iters=0)
    with pytest.raises(ValueError):
        hits_sql("SELECT 1 AS src, 2 AS dst", iters=0)
