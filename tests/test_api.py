"""RDFConnection-analog tests (``jena-rdfconnection/.../RDFConnection.java:67``
verb parity: fetch/put/delete/load + query/update)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark import terms as TM  # noqa: E402
from jena_spark.pipeline.api import Connection  # noqa: E402
from jena_spark.queries import graph as G  # noqa: E402
from jena_spark.queries.algebra import Var  # noqa: E402

E = "http://e/"


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, ", ".join(f"{c} string" for c in TM.TERM_COLS)
    )


def test_connection_verbs(spark, tmp_path):
    t = _triples(spark, [
        ("iri", E + "a", E + "knows", "iri", E + "b", None, None),
        ("iri", E + "b", E + "knows", "iri", E + "c", None, None),
        ("iri", E + "a", E + "name", "literal", "Alice", None, None),
    ])
    conn = Connection(spark).load(t)                 # default graph
    assert conn.default_graph().count() == 3
    assert conn.query_ask(p=E + "knows")
    assert not conn.query_ask(p=E + "hates")

    sel = conn.query_select([(Var("x"), E + "knows", Var("y"))])
    assert sel.count() == 2

    desc = conn.query_describe(E + "b")
    assert desc.count() == 2  # b as subject + b as object

    built = conn.query_construct(
        [(Var("y"), E + "knownBy", Var("x"))],
        [(Var("x"), E + "knows", Var("y"))],
    )
    got = {(r["s_val"], r["o_val"]) for r in built.collect()}
    assert got == {(E + "b", E + "a"), (E + "c", E + "b")}

    # named graph put/fetch/delete + union view
    g2 = _triples(spark, [("iri", E + "x", E + "p", "literal", "v", None, None)])
    conn2 = conn.put(g2, graph=E + "g2")
    assert conn2.fetch(E + "g2").count() == 1
    assert conn2.fetch(G.UNION_GRAPH).count() == 1   # named graphs only
    assert conn2.delete(E + "g2").fetch(E + "g2").count() == 0
    assert conn2.delete(E + "g2").default_graph().count() == 3

    # update verbs: insert is set-semantic, delete_where pattern-scoped
    conn3 = conn.update_insert(t)                    # duplicate load
    assert conn3.default_graph().count() == 3
    conn4 = conn3.update_delete_where(p=E + "knows")
    assert conn4.default_graph().count() == 1

    # load from FILE through the language dispatch
    from jena_spark.sources.languages import write_rdf

    path = str(tmp_path / "g.ttl")
    write_rdf(t, path)
    conn5 = Connection(spark).load(path, graph=E + "fromfile")
    assert conn5.fetch(E + "fromfile").count() == 3


def test_connection_string_verbs(spark):
    """RDFConnection.query(String) / update(String) through the parsers."""
    conn = Connection(spark).update("""
        PREFIX ex: <http://e/>
        INSERT DATA {
          ex:a ex:knows ex:b . ex:b ex:knows ex:c .
          GRAPH ex:g { ex:a ex:note "hi" }
        }""")
    out = conn.query("""
        PREFIX ex: <http://e/>
        SELECT ?z WHERE { ex:a ex:knows/ex:knows ?z }""")
    assert [r["z"] for r in out.collect()] == ["http://e/c"]
    g = conn.query("""
        PREFIX ex: <http://e/>
        SELECT ?n WHERE { GRAPH ex:g { ?s ex:note ?n } }""")
    assert [r["n"] for r in g.collect()] == ["hi"]
    conn2 = conn.update("PREFIX ex: <http://e/> DELETE WHERE { ?s ex:knows ?o }")
    assert conn2.query(
        "PREFIX ex: <http://e/> ASK { ?s ex:knows ?o }"
    ).collect()[0]["ask"] is False
