"""Ontology API (jena-core OntModel/OntClass/OntTools analog):
listings, direct vs entailed hierarchy walks, instance enumeration
through the subclass closure, and the distributed shortest-path BFS."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.queries import ontology as O  # noqa: E402

EX = "http://ex.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _t(s, p, o, o_kind="iri"):
    o_val = o if o_kind != "iri" or o.startswith("http") else EX + o
    return ("iri", EX + s, p, o_kind, o_val, None, None)


@pytest.fixture()
def zoo(spark):
    rows = [
        _t("Animal", RDF_TYPE, O.OWL_CLASS),
        _t("Dog", RDF_TYPE, O.OWL_CLASS),
        _t("Puppy", RDF_TYPE, O.OWL_CLASS),
        _t("Cat", RDF_TYPE, O.OWL_CLASS),
        _t("Dog", O.RDFS_SUBCLASS, "Animal"),
        _t("Puppy", O.RDFS_SUBCLASS, "Dog"),
        _t("Cat", O.RDFS_SUBCLASS, "Animal"),
        _t("rex", RDF_TYPE, "Dog"),
        _t("spot", RDF_TYPE, "Puppy"),
        _t("tom", RDF_TYPE, "Cat"),
        _t("hasOwner", RDF_TYPE, O._PROP_TYPES["object"]),
        _t("name", RDF_TYPE, O._PROP_TYPES["datatype"]),
        _t("hasOwner", O.RDFS_DOMAIN, "Animal"),
        # a little social graph for the path search
        _t("a", "http://ex.org/knows", "b"),
        _t("b", "http://ex.org/knows", "c"),
        _t("c", "http://ex.org/knows", "d"),
        _t("a", "http://ex.org/knows", "c"),   # shortcut: a->c->d
        _t("a", "http://ex.org/other", "d"),   # wrong predicate
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_listings(zoo):
    assert {r["iri"] for r in O.list_classes(zoo).collect()} == {
        EX + c for c in ("Animal", "Dog", "Puppy", "Cat")}
    assert {r["iri"] for r in O.list_properties(zoo, "object").collect()} == {
        EX + "hasOwner"}
    assert {r["iri"] for r in O.list_properties(zoo).collect()} == {
        EX + "hasOwner", EX + "name"}
    with pytest.raises(ValueError, match="unknown property kind"):
        O.list_properties(zoo, "quantum")
    assert {r["iri"] for r in O.properties_of_class(zoo, EX + "Animal")
            .collect()} == {EX + "hasOwner"}


def test_hierarchy_direct_vs_entailed(zoo):
    assert {r["iri"] for r in O.sub_classes(zoo, EX + "Animal", direct=True)
            .collect()} == {EX + "Dog", EX + "Cat"}
    assert {r["iri"] for r in O.sub_classes(zoo, EX + "Animal").collect()} == {
        EX + "Dog", EX + "Cat", EX + "Puppy"}
    assert {r["iri"] for r in O.super_classes(zoo, EX + "Puppy").collect()} == {
        EX + "Dog", EX + "Animal"}


def test_individuals(zoo):
    assert {r["iri"] for r in O.list_individuals(zoo, EX + "Dog", direct=True)
            .collect()} == {EX + "rex"}
    assert {r["iri"] for r in O.list_individuals(zoo, EX + "Dog", direct=False)
            .collect()} == {EX + "rex", EX + "spot"}
    assert {r["iri"] for r in O.list_individuals(zoo, EX + "Animal",
            direct=False).collect()} == {EX + "rex", EX + "spot", EX + "tom"}
    # all individuals = instances of any declared class
    assert {r["iri"] for r in O.list_individuals(zoo).collect()} == {
        EX + "rex", EX + "spot", EX + "tom"}


def test_shortest_path(zoo):
    knows = "http://ex.org/knows"
    assert O.shortest_path(zoo, EX + "a", EX + "d", knows) == [
        EX + "a", EX + "c", EX + "d"]
    assert O.shortest_path(zoo, EX + "a", EX + "a", knows) == [EX + "a"]
    assert O.shortest_path(zoo, EX + "d", EX + "a", knows) is None
    # no predicate filter: the ex:other edge wins (1 hop)
    assert O.shortest_path(zoo, EX + "a", EX + "d") == [EX + "a", EX + "d"]


def test_list_restrictions(spark):
    """owl:Restriction listing: onProperty + facet per restriction."""
    OWL = O.OWL
    rows = [
        ("bnode", "r1", RDF_TYPE, "iri", OWL + "Restriction", None, None),
        ("bnode", "r1", OWL + "onProperty", "iri", EX + "hasOwner", None, None),
        ("bnode", "r1", OWL + "someValuesFrom", "iri", EX + "Person", None, None),
        ("bnode", "r2", RDF_TYPE, "iri", OWL + "Restriction", None, None),
        ("bnode", "r2", OWL + "onProperty", "iri", EX + "name", None, None),
        ("bnode", "r2", OWL + "maxCardinality", "literal", "1",
         "http://www.w3.org/2001/XMLSchema#nonNegativeInteger", None),
        # typed Restriction without onProperty: listed by Jena's
        # listRestrictions but unusable — we require the property
        ("bnode", "r3", RDF_TYPE, "iri", OWL + "Restriction", None, None),
    ]
    t = spark.createDataFrame(rows, _SCHEMA)
    got = {(r["restriction"], r["on_property"], r["kind"], r["value"])
           for r in O.list_restrictions(t).collect()}
    assert got == {
        ("r1", EX + "hasOwner", "someValuesFrom", EX + "Person"),
        ("r2", EX + "name", "maxCardinality", "1"),
    }
