"""RDFS forward-chaining tests (rdfs2/3/5/7/9/11 — rule reasoner
parity, ``jena-core/.../etc/rdfs.rules``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.pipeline.inference import (
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_closure,
)

SCHEMA = ("s_kind string, s_val string, p_val string, o_kind string, "
          "o_val string, o_datatype string, o_lang string")


def _rows(df):
    return {tuple(r) for r in df.select(*TM.TERM_COLS).collect()}


def test_rdfs_rules_end_to_end(spark):
    E = "http://e/"
    triples = [
        # TBox: worksFor ⊑ affiliatedWith ⊑ relatedTo (rdfs5 chain)
        ("iri", E + "worksFor", RDFS_SUBPROP, "iri", E + "affiliatedWith", None, None),
        ("iri", E + "affiliatedWith", RDFS_SUBPROP, "iri", E + "relatedTo", None, None),
        ("iri", E + "worksFor", RDFS_DOMAIN, "iri", E + "Person", None, None),
        ("iri", E + "worksFor", RDFS_RANGE, "iri", E + "Org", None, None),
        ("iri", E + "Person", RDFS_SUBCLASS, "iri", E + "Agent", None, None),
        ("iri", E + "Agent", RDFS_SUBCLASS, "iri", E + "Thing", None, None),
        # ABox
        ("iri", E + "ada", E + "worksFor", "iri", E + "acme", None, None),
        ("iri", E + "bob", TM.RDF_TYPE, "iri", E + "Person", None, None),
        # literal object: range rule must NOT type it
        ("iri", E + "ada", E + "worksFor2", "literal", "x", None, None),
    ]
    df = spark.createDataFrame(triples, SCHEMA)
    out = _rows(rdfs_closure(df))

    def t(s, p, o):
        return ("iri", E + s, p if p.startswith("http") else E + p, "iri", E + o, None, None)

    # rdfs7 through the CLOSED chain (incl. rdfs5-derived worksFor⊑relatedTo)
    assert t("ada", "affiliatedWith", "acme") in out
    assert t("ada", "relatedTo", "acme") in out
    # rdfs5 / rdfs11 schema closure
    assert t("worksFor", RDFS_SUBPROP, "relatedTo") in out
    assert t("Person", RDFS_SUBCLASS, "Thing") in out
    # rdfs2 / rdfs3
    assert t("ada", TM.RDF_TYPE, "Person") in out
    assert t("acme", TM.RDF_TYPE, "Org") in out
    # rdfs9 on BOTH asserted and derived type triples, through the chain
    for who in ("ada", "bob"):
        assert t(who, TM.RDF_TYPE, "Agent") in out
        assert t(who, TM.RDF_TYPE, "Thing") in out
    # input preserved, literals never typed
    assert _rows(df) <= out
    assert not any(r[1] == "x" and r[2] == TM.RDF_TYPE for r in out)
    # idempotent: closure(closure(G)) == closure(G)
    assert _rows(rdfs_closure(rdfs_closure(df))) == out


def test_rdfs_guard_type_in_subproperty(spark):
    bad = [("iri", TM.RDF_TYPE, RDFS_SUBPROP, "iri", "http://e/q", None, None)]
    df = spark.createDataFrame(bad, SCHEMA)
    with pytest.raises(ValueError, match="rdf:type"):
        rdfs_closure(df)


def test_rdfs_no_schema_is_identity(spark):
    triples = [("iri", "http://e/a", "http://e/p", "literal", "v", None, None)]
    df = spark.createDataFrame(triples, SCHEMA)
    assert _rows(rdfs_closure(df)) == _rows(df)


def test_owl_property_rules(spark):
    """inverseOf / SymmetricProperty / TransitiveProperty
    (owl-fb.rules parity), incl. symmetric+transitive composition and
    inverse feeding the transitive closure."""
    from jena_spark.pipeline.inference import (
        OWL,
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_property_closure,
    )

    E = "http://e/"
    triples = [
        ("iri", E + "hasPart", OWL_INVERSE, "iri", E + "partOf", None, None),
        ("iri", E + "near", TM.RDF_TYPE, "iri", OWL_SYMMETRIC, None, None),
        ("iri", E + "ancestorOf", TM.RDF_TYPE, "iri", OWL_TRANSITIVE, None, None),
        ("iri", E + "box", E + "hasPart", "iri", E + "lid", None, None),
        ("iri", E + "bolt", E + "partOf", "iri", E + "lid", None, None),
        ("iri", E + "a", E + "near", "iri", E + "b", None, None),
        ("iri", E + "x", E + "ancestorOf", "iri", E + "y", None, None),
        ("iri", E + "y", E + "ancestorOf", "iri", E + "z", None, None),
        ("iri", E + "z", E + "ancestorOf", "iri", E + "w", None, None),
    ]
    df = spark.createDataFrame(triples, SCHEMA)
    out = _rows(owl_property_closure(df))

    def t(s, p, o):
        return ("iri", E + s, E + p, "iri", E + o, None, None)

    # inverseOf, both directions
    assert t("lid", "partOf", "box") in out
    assert t("lid", "hasPart", "bolt") in out
    # symmetric
    assert t("b", "near", "a") in out
    # transitive closure (length-2 and length-3 paths)
    assert t("x", "ancestorOf", "z") in out
    assert t("x", "ancestorOf", "w") in out
    assert t("y", "ancestorOf", "w") in out
    # input preserved; no spurious reverse of non-symmetric props
    assert _rows(df) <= out
    assert t("y", "ancestorOf", "x") not in out
    # idempotent
    assert _rows(owl_property_closure(
        spark.createDataFrame(sorted(out), SCHEMA))) == out
