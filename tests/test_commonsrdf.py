"""Commons RDF bridge (``jena_spark/commonsrdf.py`` —
jena-commonsrdf ``JenaRDF`` / ``JenaCommonsRDF`` analog)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.commonsrdf import (  # noqa: E402
    IRI,
    JenaRDF,
    Literal,
    Quad,
    Triple,
    from_frame,
    to_frame,
)

EX = "http://ex.org/"


@pytest.fixture()
def rdf():
    return JenaRDF()


def test_factory_and_term_equality(rdf):
    # value equality across factory calls (Commons RDF contract)
    assert rdf.create_iri(EX + "a") == rdf.create_iri(EX + "a")
    assert rdf.create_literal("x") == rdf.create_literal("x")
    assert rdf.create_literal("x", language="en") == \
        rdf.create_literal("x", language="en")
    assert rdf.create_literal("x") != rdf.create_literal("x", language="en")
    # ntriples forms
    assert rdf.create_iri(EX).ntriples_string() == f"<{EX}>"
    assert rdf.create_literal("hi").ntriples_string() == '"hi"'
    assert rdf.create_literal("hi", language="en").ntriples_string() == \
        '"hi"@en'
    int_iri = rdf.create_iri("http://www.w3.org/2001/XMLSchema#integer")
    assert rdf.create_literal("5", datatype=int_iri).ntriples_string() == \
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'
    # fresh blank nodes are distinct; named ones equal by label
    assert rdf.create_blank_node() != rdf.create_blank_node()
    assert rdf.create_blank_node("b") == rdf.create_blank_node("b")
    # JenaRDF.validateIRI / validateLang
    with pytest.raises(ValueError):
        rdf.create_iri("http://ex.org/has space")
    with pytest.raises(ValueError):
        rdf.create_literal("x", language="not a tag")


def test_mem_graph_verbs(rdf):
    g = rdf.create_graph()
    a, name = rdf.create_iri(EX + "a"), rdf.create_iri(EX + "name")
    t = rdf.create_triple(a, name, rdf.create_literal("alice"))
    g.add(t)
    g.add(t)  # set semantics
    assert g.size() == 1 and g.contains(t)
    g.add(rdf.create_triple(a, name, rdf.create_literal("al")))
    assert len(list(g.stream(s=a))) == 2
    assert len(list(g.stream(o=rdf.create_literal("alice")))) == 1
    g.remove(t)
    assert g.size() == 1 and not g.contains(t)
    g.clear()
    assert g.size() == 0


def test_dataset_and_graph_projection(rdf):
    d = rdf.create_dataset()
    a, p = rdf.create_iri(EX + "a"), rdf.create_iri(EX + "p")
    d.add(rdf.create_quad(None, a, p, rdf.create_literal("dft")))
    d.add(rdf.create_quad(rdf.create_iri(EX + "g"), a, p,
                          rdf.create_literal("named")))
    assert d.size() == 2
    assert [q.object.lexical_form for q in
            d.stream(g=rdf.create_iri(EX + "g"))] == ["named"]
    assert [t.object.lexical_form
            for t in d.get_graph().iterate()] == ["dft"]
    assert [t.object.lexical_form for t in
            d.get_graph(rdf.create_iri(EX + "g")).iterate()] == ["named"]


def test_to_frame_round_trip(spark, rdf):
    g = rdf.create_graph()
    a = rdf.create_iri(EX + "a")
    b = rdf.create_blank_node("bn1")
    p = rdf.create_iri(EX + "p")
    terms = [rdf.create_literal("plain"),
             rdf.create_literal("tagged", language="en"),
             rdf.create_literal(
                 "5", datatype=rdf.create_iri(
                     "http://www.w3.org/2001/XMLSchema#integer")),
             rdf.create_iri(EX + "o"), b]
    for o in terms:
        g.add(rdf.create_triple(a, p, o))
    g.add(rdf.create_triple(b, p, rdf.create_literal("from bnode")))

    df = to_frame(spark, g)
    assert df.count() == 6
    view = from_frame(df)
    assert view.size() == 6
    # stream with pushed-down pattern reconstructs value-equal terms
    got = {t.object for t in view.stream(s=a, p=p)}
    assert got == set(terms)
    # contains pushes all term facets (datatype + lang null-safe)
    assert view.contains(Triple(a, p, rdf.create_literal(
        "tagged", language="en")))
    assert not view.contains(Triple(a, p, rdf.create_literal("tagged")))
    assert view.contains(Triple(b, p, rdf.create_literal("from bnode")))


def test_dataset_to_frame(spark, rdf):
    d = rdf.create_dataset()
    a, p = rdf.create_iri(EX + "a"), rdf.create_iri(EX + "p")
    d.add(rdf.create_quad(None, a, p, rdf.create_literal("dft")))
    d.add(rdf.create_quad(rdf.create_iri(EX + "g"), a, p,
                          rdf.create_literal("named")))
    df = to_frame(spark, d)
    assert "graph" in df.columns
    rows = {(r.o_val, r.graph) for r in df.collect()}
    assert rows == {("dft", None), ("named", EX + "g")}
