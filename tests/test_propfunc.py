"""Property-function library tests (sparql/pfunction/library/ parity):
16 of 21 built-ins (triple/* RDF-star functions are a declared
non-goal) + registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_spark.queries import propfunc as PF


@pytest.fixture(scope="module")
def b(spark):
    return spark.createDataFrame(
        [(["x", "y", "z"], "http://e/ns#local",
          ("bnode", "_:b7", None, None))],
        "arr array<string>, iri string, "
        "term struct<kind:string,val:string,datatype:string,lang:string>",
    )


def test_list_functions(spark, b):
    assert {r["m"] for r in PF.list_member(b, F.col("arr"), "m").collect()} == {"x", "y", "z"}
    idx = {(r["i"], r["m"]) for r in PF.list_index(b, F.col("arr"), "i", "m").collect()}
    assert idx == {(0, "x"), (1, "y"), (2, "z")}
    assert PF.list_length(b, F.col("arr"), "n").collect()[0]["n"] == 3


def test_containers(spark, b):
    sq = {(r["i"], r["m"]) for r in PF.seq(b, F.col("arr"), "i", "m").collect()}
    assert sq == {(1, "x"), (2, "y"), (3, "z")}  # rdf:_n is 1-based
    bag = {r["m"] for r in PF.bag(b, F.col("arr"), "m").collect()}
    alt = {r["m"] for r in PF.alt(b, F.col("arr"), "m").collect()}
    assert bag == alt == {"x", "y", "z"}
    cont = {(r["p"], r["m"]) for r in PF.container(b, F.col("arr"), "p", "m").collect()}
    assert (PF.RDF_NS + "_1", "x") in cont and (PF.RDF_NS + "_3", "z") in cont


def test_scalar_like_pfs(spark, b):
    row = PF.assign(b, "v", F.lit(42)).collect()[0]
    assert row["v"] == 42
    assert PF.split_uri(b, F.col("iri"), "ns", "loc").collect()[0]["loc"] == "local"
    assert PF.str_pf(b, F.col("term"), "s").collect()[0]["s"] == "_:b7"
    assert PF.bnode_pf(b, F.col("term"), "lab").collect()[0]["lab"] == "_:b7"
    # non-bnode terms are filtered out by apf:bnode
    iri_term = spark.createDataFrame(
        [(("iri", "http://e/x", None, None),)],
        "term struct<kind:string,val:string,datatype:string,lang:string>")
    assert PF.bnode_pf(iri_term, F.col("term"), "lab").count() == 0
    assert PF.version(b, "v").collect()[0]["v"] == PF.ENGINE_VERSION


def test_registry(spark, b):
    assert len(PF.PROPERTY_FUNCTIONS) >= 16
    fn = PF.PROPERTY_FUNCTIONS[PF.LISTF + "length"]
    assert fn(b, F.col("arr"), "n").collect()[0]["n"] == 3
    PF.register("http://ex/custom", lambda df, out: df.withColumn(out, F.lit(1)))
    assert PF.PROPERTY_FUNCTIONS["http://ex/custom"](b, "one").collect()[0]["one"] == 1


def test_triple_term_find(spark):
    """apf:find (pfunction/library/triple/TripleTermFind.java,
    IRI http://arq/find): binds component vars + ?t as the
    quoted-triple term for every asserted triple."""
    from jena_spark import terms as TM
    from jena_spark.queries.propfunc import (
        PROPERTY_FUNCTIONS, triple_term_find,
    )

    assert PROPERTY_FUNCTIONS["http://arq/find"] is triple_term_find
    rows = [
        ("iri", "http://e/a", "http://e/p", "literal", "x", None, None),
        ("bnode", "_:b", "http://e/q", "iri", "http://e/o", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string,"
        "o_val string, o_datatype string, o_lang string",
    )
    out = {(r["s"]["val"], r["t"]["kind"], r["t"]["val"])
           for r in triple_term_find(df, "s", "p", "o", "t").collect()}
    assert out == {
        ("http://e/a", "triple",
         TM.quote("iri", "http://e/a", "http://e/p", "literal", "x")),
        ("_:b", "triple",
         TM.quote("bnode", "_:b", "http://e/q", "iri", "http://e/o")),
    }
