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


# --- k-core + connected components (round 5) ---


def test_k_core_known_graph(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle;
    the chain peels away layer by layer (convergence needs >1 round)."""
    from jena_spark.queries.graphalgo import k_core

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),       # triangle
         ("c", "d"), ("d", "e"), ("e", "f")],      # pendant chain
        "src string, dst string")
    core = {(r["node"], r["degree"])
            for r in k_core(edges, k=2, rounds=5).collect()}
    assert core == {("a", 2), ("b", 2), ("c", 2)}
    # k=3: no 3-core in this graph
    assert k_core(edges, k=3, rounds=5).count() == 0


def test_k_core_convergence_and_oracle(spark):
    from jena_spark.queries.graphalgo import k_core, k_core_sql

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
         ("d", "e"), ("e", "f"), ("f", "g"), ("g", "e")],
        "src string, dst string")
    # fixed-unroll == fixpoint here (R-1 vs R identical)
    import duckdb

    duck = duckdb.connect()
    r4 = sorted(map(tuple, k_core(edges, 2, rounds=4).collect()))
    r5 = sorted(map(tuple, k_core(edges, 2, rounds=5).collect()))
    assert r4 == r5
    duck.execute("CREATE OR REPLACE VIEW gedges AS SELECT * FROM "
                 "(VALUES ('a','b'),('b','c'),('c','a'),('c','d'),"
                 "('d','a'),('d','e'),('e','f'),('f','g'),('g','e'))"
                 " t(src, dst)")
    want = sorted(map(tuple, duck.sql(
        k_core_sql("SELECT src, dst FROM gedges", 2, rounds=5))
        .fetchall()))
    assert r5 == want


def test_components_census_fixpoint(spark):
    """Two components incl. a 5-path (diameter forces >2 rounds);
    Spark fixpoint == recursive-SQL closure."""
    from jena_spark.queries.graphalgo import (
        components_census, components_census_sql)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),   # path of 5
         ("x", "y"), ("y", "z"), ("z", "x")],              # triangle
        "src string, dst string")
    import duckdb

    duck = duckdb.connect()
    got = sorted(map(tuple, components_census(edges).collect()))
    assert got == [("a", 5), ("x", 3)]
    duck.execute("CREATE OR REPLACE VIEW cedges AS SELECT * FROM "
                 "(VALUES ('a','b'),('b','c'),('c','d'),('d','e'),"
                 "('x','y'),('y','z'),('z','x')) t(src, dst)")
    want = sorted(map(tuple, duck.sql(
        components_census_sql("SELECT src, dst FROM cedges"))
        .fetchall()))
    assert got == want
