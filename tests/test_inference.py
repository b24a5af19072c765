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


def test_owl_inverse_of_transitive_derivations(spark):
    """Fixpoint regression (r2 advice): with (anc owl:inverseOf desc)
    and anc transitive, the inverse entailments of transitively-DERIVED
    edges must appear — (x anc y), (y anc z) ⊢ (x anc z) ⊢ (z desc x).
    Jena's owl-fb engine iterates to fixpoint; so do we now."""
    from jena_spark.pipeline.inference import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_property_closure,
    )

    E = "http://e/"
    triples = [
        ("iri", E + "anc", OWL_INVERSE, "iri", E + "desc", None, None),
        ("iri", E + "anc", TM.RDF_TYPE, "iri", OWL_TRANSITIVE, None, None),
        ("iri", E + "x", E + "anc", "iri", E + "y", None, None),
        ("iri", E + "y", E + "anc", "iri", E + "z", None, None),
    ]
    df = spark.createDataFrame(triples, SCHEMA)
    out = _rows(owl_property_closure(df))

    def t(s, p, o):
        return ("iri", E + s, E + p, "iri", E + o, None, None)

    assert t("x", "anc", "z") in out
    assert t("z", "desc", "x") in out          # the r2 missing entailment
    assert t("y", "desc", "x") in out and t("z", "desc", "y") in out
    # desc is not declared transitive, but its edges mirror closed anc —
    # the fixpoint must not invent (x desc z)'s forward twin's inverse gap:
    # inverse of every closed anc edge, nothing more
    desc_edges = {(r[1], r[4]) for r in out if r[2] == E + "desc"}
    anc_edges = {(r[1], r[4]) for r in out if r[2] == E + "anc"}
    assert desc_edges == {(b, a) for a, b in anc_edges}


def test_owl_symmetric_inverse_of_transitive_fixpoint(spark):
    """Pathological schema: q symmetric AND q owl:inverseOf p with p
    transitive — a one-shot re-application under-derives; the fixpoint
    loop must make p's closed edges appear under q in BOTH directions
    (and feed back into p via the inverse rule)."""
    from jena_spark.pipeline.inference import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_property_closure,
    )

    E = "http://e/"
    triples = [
        ("iri", E + "p", OWL_INVERSE, "iri", E + "q", None, None),
        ("iri", E + "q", TM.RDF_TYPE, "iri", OWL_SYMMETRIC, None, None),
        ("iri", E + "p", TM.RDF_TYPE, "iri", OWL_TRANSITIVE, None, None),
        ("iri", E + "a", E + "p", "iri", E + "b", None, None),
        ("iri", E + "b", E + "p", "iri", E + "c", None, None),
    ]
    df = spark.createDataFrame(triples, SCHEMA)
    out = _rows(owl_property_closure(df))
    q_edges = {(r[1], r[4]) for r in out if r[2] == E + "q"}
    p_edges = {(r[1], r[4]) for r in out if r[2] == E + "p"}
    # q = inverse(p) ∪ symmetric image ⇒ q holds both directions of p
    for a, b in [("a", "b"), ("b", "c"), ("a", "c")]:
        assert (E + b, E + a) in q_edges and (E + a, E + b) in q_edges
    # feedback: symmetric q edges invert back into p both ways, and p
    # re-closes transitively over them
    assert (E + "c", E + "a") in p_edges
    # idempotent at the fixpoint
    assert _rows(owl_property_closure(
        spark.createDataFrame(sorted(out), SCHEMA))) == out


def _pairwise_sameas_closure(groups: list[set[tuple[str, str]]]) -> set:
    """Tiny reference twin of fp1/ifp1: pairwise emission per witness
    group + symmetric-transitive closure (what the reference's rule
    engine reaches at fixpoint), as a set of frozenset clusters."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g in groups:
        members = sorted(g)
        for m in members[1:]:
            parent[find(m)] = find(members[0])
    clusters: dict = {}
    for x in list(parent):
        clusters.setdefault(find(x), set()).add(x)
    return {frozenset(c) for c in clusters.values() if len(c) > 1}


def test_owl_functional_sameas_rules(spark):
    """fp1 / ifp1 forward instance-equality rules
    (owl-fb.rules:458-475) incl. fpEarlyProp subPropertyOf
    propagation: the emitted star's closure equals the reference's
    pairwise-emission closure, literal witnesses count for ifp1 only,
    and bnodes participate."""
    from jena_spark.pipeline.canonicalize import connected_components
    from jena_spark.pipeline.inference import (
        OWL_FUNCTIONAL,
        OWL_INVERSE_FUNCTIONAL,
        owl_functional_sameas,
    )

    E = "http://e/"
    triples = [
        # ifp: email key shared by three accounts (one a bnode)
        ("iri", E + "email", TM.RDF_TYPE, "iri", OWL_INVERSE_FUNCTIONAL, None, None),
        ("iri", E + "acct1", E + "email", "literal", "x@e.org", None, None),
        ("iri", E + "acct2", E + "email", "literal", "x@e.org", None, None),
        ("bnode", "b9", E + "email", "literal", "x@e.org", None, None),
        ("iri", E + "acct3", E + "email", "literal", "y@e.org", None, None),
        # same lexical under a DIFFERENT datatype is a different witness
        ("iri", E + "acct4", E + "email", "literal", "x@e.org",
         "http://e/dt", None),
        # fp: one subject, two non-literal objects -> objects sameAs
        ("iri", E + "homePort", TM.RDF_TYPE, "iri", OWL_FUNCTIONAL, None, None),
        ("iri", E + "ship", E + "homePort", "iri", E + "oslo", None, None),
        ("iri", E + "ship", E + "homePort", "iri", E + "osloHavn", None, None),
        # fp with literal objects derives NOTHING (notLiteral guard)
        ("iri", E + "age", TM.RDF_TYPE, "iri", OWL_FUNCTIONAL, None, None),
        ("iri", E + "ship", E + "age", "literal", "4", None, None),
        ("iri", E + "ship", E + "age", "literal", "5", None, None),
        # fpEarlyProp: subPropertyOf an IFP is an IFP
        ("iri", E + "workEmail", "http://www.w3.org/2000/01/rdf-schema#subPropertyOf",
         "iri", E + "email", None, None),
        ("iri", E + "acct5", E + "workEmail", "literal", "y@e.org", None, None),
    ]
    t = spark.createDataFrame(triples, SCHEMA)
    got = owl_functional_sameas(t)
    rows = {(r["s_kind"], r["s_val"], r["o_kind"], r["o_val"])
            for r in got.collect()}
    # every emitted row is a star edge member -> group-min rep
    assert rows == {
        ("iri", E + "acct1", "bnode", "b9"),   # struct order: bnode < iri
        ("iri", E + "acct2", "bnode", "b9"),
        ("iri", E + "osloHavn", "iri", E + "oslo"),
        ("iri", E + "acct5", "iri", E + "acct3"),  # via subPropertyOf lift
    }
    # closure equality with the reference's pairwise emission
    edges = got.select(
        F.concat("s_kind", F.lit("|"), "s_val").alias("src"),
        F.concat("o_kind", F.lit("|"), "o_val").alias("dst"))
    cc = connected_components(edges)
    comp: dict = {}
    for r in cc.collect():
        comp.setdefault(r["component"], set()).add(r["node"])
    got_clusters = {frozenset(v) for v in comp.values() if len(v) > 1}
    want = _pairwise_sameas_closure([
        {("iri", E + "acct1"), ("iri", E + "acct2"), ("bnode", "b9")},
        {("iri", E + "oslo"), ("iri", E + "osloHavn")},
        {("iri", E + "acct3"), ("iri", E + "acct5")},
    ])
    want = {frozenset(f"{k}|{v}" for k, v in c) for c in want}
    assert got_clusters == want
    # acct4 (different datatype) is in no cluster
    assert not any("acct4" in m for c in got_clusters for m in c)
