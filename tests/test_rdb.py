"""Relational → RDF direct mapping (``sources/rdb.py``; the jena-csv
PropertyTable posture generalised to keyed/FK tables per the W3C
Direct Mapping profile) and the fork's benchmark-workload shapes
evaluated over the direct-mapped graph."""

import datetime

from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.sources.rdb import DEFAULT_BASE, direct_map, row_node


def _by(rows):
    return {(r.s_val, r.p_val): r for r in rows}


def test_keyed_table_mapping(spark):
    df = spark.createDataFrame(
        [(1, "alice", 2095.5, True, datetime.date(2024, 1, 2),
          datetime.datetime(2024, 1, 2, 3, 4, 5)),
         (2, None, None, None, None, None)],
        "id int, name string, bal double, ok boolean, d date, ts timestamp",
    )
    out = direct_map(df, "acct", key="id").collect()
    by = _by(out)
    s1 = DEFAULT_BASE + "acct/id=1"

    # class triple for every row, IRI row nodes
    assert by[(s1, TM.RDF_TYPE)].o_val == DEFAULT_BASE + "acct"
    assert by[(s1, TM.RDF_TYPE)].s_kind == "iri"
    # datatypes per the Spark-type map, canonical lexicals
    assert by[(s1, DEFAULT_BASE + "acct#id")].o_datatype == TM.XSD_INTEGER
    assert by[(s1, DEFAULT_BASE + "acct#bal")].o_val == "2095.5"
    assert by[(s1, DEFAULT_BASE + "acct#bal")].o_datatype == TM.XSD + "double"
    assert by[(s1, DEFAULT_BASE + "acct#ok")].o_val == "true"
    assert by[(s1, DEFAULT_BASE + "acct#d")].o_val == "2024-01-02"
    assert by[(s1, DEFAULT_BASE + "acct#ts")].o_val == "2024-01-02T03:04:05Z"
    assert by[(s1, DEFAULT_BASE + "acct#name")].o_datatype is None
    # NULL cells emit nothing: row 2 has only id + class
    s2 = DEFAULT_BASE + "acct/id=2"
    assert sorted(p for (s, p) in by if s == s2) == sorted(
        [TM.RDF_TYPE, DEFAULT_BASE + "acct#id"]
    )


def test_reference_triples_and_composite_key(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 20, 5)], "a int, b int, fk int"
    )
    out = direct_map(
        df, "t", key=["a", "b"], refs={"fk": ("dim", "k")}
    ).collect()
    by = _by(out)
    s = DEFAULT_BASE + "t/a=1;b=10"
    ref = by[(s, DEFAULT_BASE + "t#ref-fk")]
    assert ref.o_kind == "iri" and ref.o_val == DEFAULT_BASE + "dim/k=5"
    # the FK literal triple is ALSO emitted (the spec keeps both)
    assert by[(s, DEFAULT_BASE + "t#fk")].o_val == "5"


def test_keyless_table_content_bnodes(spark):
    df = spark.createDataFrame([("x", 1), ("x", 1), ("y", 2)], "c string, n int")
    out = direct_map(df, "t", key=None)
    subs = [r.s_val for r in out.select("s_kind", "s_val").distinct().collect()]
    # duplicate rows collapse to ONE content-addressed bnode (documented)
    assert len(subs) == 2
    assert all(s.startswith("_:") for s in subs)
    kinds = {r.s_kind for r in out.collect()}
    assert kinds == {"bnode"}


def test_single_scan_no_shuffle_plan(spark):
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.lit("v").alias("v")
    )
    plan = direct_map(df, "t", key="k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: explode + filter, no shuffle


def test_row_node_expression(spark):
    df = spark.createDataFrame([(7, "x")], "k int, v string")
    got = df.select(row_node("tab", ["k"]).alias("n")).first()["n"]
    assert got == DEFAULT_BASE + "tab/k=7"


def test_workload_shapes_reference_templates(spark):
    """The merged (variable-``?p1``) evaluation returns exactly the
    tuple set the generator's retry loop could ever emit: cross-check
    one family against a hand-built micro graph. Tr2 over
    customer→nation with the nation-key literal shared via
    c_nationkey is the guaranteed-nonempty witness
    (``Find_Tr2.java`` queryStr2)."""
    from jena_spark.queries.registry import (
        _WL_SEED_REF, _WORKLOAD_SHAPES, _wl_sparql,
    )
    from jena_spark.queries.sparql import sparql_query
    from jena_spark.sources.rdb import direct_map as dm

    nation = spark.createDataFrame([(5, "N5", 1)], "n_nationkey int, n_name string, n_regionkey int")
    cust = spark.createDataFrame(
        [(1, "c1", 5, 10.0, "B")],
        "c_custkey int, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    g = dm(cust, "customer", key="c_custkey",
           refs={"c_nationkey": ("nation", "n_nationkey")}).unionByName(
        dm(nation, "nation", key="n_nationkey",
           refs={"n_regionkey": ("region", "r_regionkey")}))
    tr2 = next(p for s, _seed, p in _WORKLOAD_SHAPES if s == "Tr2")
    rows = sparql_query(g, _wl_sparql(_WL_SEED_REF, tr2)).collect()
    got = {(r.p1, r.p2) for r in rows}
    # customer --ref--> nation --n_nationkey--> "5" <--c_nationkey-- customer
    assert (DEFAULT_BASE + "nation#n_nationkey",
            DEFAULT_BASE + "customer#c_nationkey") in got
    # no tuple may use the seed predicate or repeat a predicate
    assert all(
        _WL_SEED_REF not in t and t[0] != t[1] for t in got
    )
