"""Graph-contract tests — mini fixtures per FIXTURES.md §5, mirroring
Jena's AbstractTestGraph cases (find with ANY everywhere, set
semantics, union/intersection/difference by term equality, bnode
scoping)."""

from __future__ import annotations

import pytest

from jena_spark import terms as TM
from jena_spark.queries import graph as G

EX = "http://ex.org/"


def _mk(spark, rows):
    """rows: (s_kind, s_val, p, o_kind, o_val, o_datatype, o_lang)"""
    full = [r + (None, None) for r in rows]  # graph, conv_id
    return spark.createDataFrame(
        full,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string, graph string, conv_id string",
    )


@pytest.fixture(scope="module")
def mini(spark):
    rows = [
        ("iri", EX + "a", EX + "p", "iri", EX + "b", None, None),
        ("iri", EX + "a", EX + "p", "literal", "1", TM.XSD_INTEGER, None),
        ("iri", EX + "b", EX + "q", "literal", "chat", None, "fr"),
        ("bnode", TM.skolem("s1", "x"), EX + "p", "iri", EX + "a", None, None),
        ("iri", EX + "c", EX + "p", "literal", "chat", None, None),
    ]
    return _mk(spark, rows)


def test_find_combinations(spark, mini):
    assert G.find(mini).count() == 5
    assert G.find(mini, s=EX + "a").count() == 2
    assert G.find(mini, p=EX + "p").count() == 4
    assert G.find(mini, o=("literal", "1", TM.XSD_INTEGER)).count() == 1
    # lang-tagged vs plain literal are different terms
    assert G.find(mini, o=("literal", "chat", None, "fr")).count() == 1
    assert G.find(mini, o=("literal", "chat")).count() == 1
    assert G.find(mini, s=("bnode", TM.skolem("s1", "x"))).count() == 1
    assert G.find(mini, s=EX + "zzz").count() == 0


def test_contains_and_size(spark, mini):
    assert G.contains(mini, EX + "a", EX + "p", EX + "b")
    assert not G.contains(mini, EX + "b", EX + "p", EX + "a")
    # duplicate insert is a no-op (set semantics, Graph.java:84)
    doubled = mini.unionByName(mini)
    assert G.size(doubled) == 5


def test_enumerations(spark, mini):
    assert G.subjects(mini).count() == 4
    assert {r["val"] for r in G.predicates(mini).collect()} == {EX + "p", EX + "q"}
    assert G.objects(mini).count() == 5


def test_set_algebra(spark, mini):
    a = mini
    b_rows = [
        ("iri", EX + "a", EX + "p", "iri", EX + "b", None, None),  # shared
        ("iri", EX + "d", EX + "p", "iri", EX + "e", None, None),  # only in B
        # bnode from a DIFFERENT scope: same local label, must NOT merge
        ("bnode", TM.skolem("s2", "x"), EX + "p", "iri", EX + "a", None, None),
    ]
    b = _mk(spark, b_rows)
    assert G.union(a, b).count() == 5 + 3 - 1
    inter = G.intersection(a, b)
    assert inter.count() == 1
    assert inter.collect()[0]["s_val"] == EX + "a"
    diff = G.difference(a, b)
    assert diff.count() == 4
    # the scope-1 bnode triple survives difference (term equality)
    assert diff.where(diff.s_val == TM.skolem("s1", "x")).count() == 1


def test_union_idempotent(spark, mini):
    assert G.union(mini, mini).count() == 5


def test_cbd_bnode_chain(spark):
    """CBD follows bnode OBJECTS recursively (depth 2 here) and stops
    at IRIs/literals; unrelated resources stay out."""
    from jena_spark.queries.graph import cbd

    EX = "http://ex.org/"
    rows = [
        ("iri", EX + "r", EX + "p", "bnode", "_:b1", None, None),
        ("bnode", "_:b1", EX + "q", "bnode", "_:b2", None, None),
        ("bnode", "_:b2", EX + "s", "literal", "leaf", None, None),
        ("bnode", "_:b2", EX + "t", "iri", EX + "other", None, None),
        # reachable IRI's own triples are NOT part of the description
        ("iri", EX + "other", EX + "u", "literal", "nope", None, None),
        # unrelated bnode
        ("bnode", "_:zz", EX + "q", "literal", "nope", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string,"
        "o_val string, o_datatype string, o_lang string",
    )
    seeds = spark.createDataFrame([("iri", EX + "r")], "kind string, val string")
    got = {(r["s_val"], r["p_val"], r["o_val"]) for r in cbd(t, seeds).collect()}
    assert got == {
        (EX + "r", EX + "p", "_:b1"),
        ("_:b1", EX + "q", "_:b2"),
        ("_:b2", EX + "s", "leaf"),
        ("_:b2", EX + "t", EX + "other"),
    }


def test_cbd_empty_seed(spark):
    from jena_spark.queries.graph import cbd

    t = spark.createDataFrame(
        [("iri", "http://e/a", "http://e/p", "literal", "x", None, None)],
        "s_kind string, s_val string, p_val string, o_kind string,"
        "o_val string, o_datatype string, o_lang string",
    )
    seeds = spark.createDataFrame([], "kind string, val string")
    assert cbd(t, seeds).count() == 0
