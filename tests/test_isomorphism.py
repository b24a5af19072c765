"""Graph isomorphism (Model.isIsomorphicWith / GraphMatcher analog):
bnode-renaming invariance, ground mismatch detection, multiset
semantics for automorphic twins, and the strict-ambiguity contract."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.queries.isomorphism import (  # noqa: E402
    canonical_colors,
    isomorphic,
)

EX = "http://ex.org/"
_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _g(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _chain(b1, b2, name):
    """_:b1 knows _:b2 ; _:b1 name <name> ; _:b2 age 30."""
    return [
        ("bnode", b1, EX + "knows", "bnode", b2, None, None),
        ("bnode", b1, EX + "name", "literal", name, None, None),
        ("bnode", b2, EX + "age", "literal", "30",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]


def test_bnode_renaming_is_isomorphic(spark):
    g1 = _g(spark, _chain("x", "y", "Ada"))
    g2 = _g(spark, _chain("p", "q", "Ada"))
    assert isomorphic(g1, g2)
    # ground difference -> not isomorphic
    g3 = _g(spark, _chain("p", "q", "Bob"))
    assert not isomorphic(g1, g3)
    # structural difference (edge direction flipped) -> not isomorphic
    g4rows = _chain("x", "y", "Ada")
    g4rows[0] = ("bnode", "y", EX + "knows", "bnode", "x", None, None)
    assert not isomorphic(g1, _g(spark, g4rows))


def test_multiset_semantics_for_twins(spark):
    # two automorphic twin bnodes vs one bnode: same canonical SET,
    # different multiset -> correctly not isomorphic
    twins = _g(spark, [
        ("bnode", "a", EX + "p", "literal", "1", None, None),
        ("bnode", "b", EX + "p", "literal", "1", None, None),
    ])
    single = _g(spark, [
        ("bnode", "c", EX + "p", "literal", "1", None, None),
    ])
    assert not isomorphic(twins, single, strict=False)
    # twins vs twins: refinement cannot separate them (ambiguous);
    # strict raises, strict=False accepts refinement-equivalence
    twins2 = _g(spark, [
        ("bnode", "u", EX + "p", "literal", "1", None, None),
        ("bnode", "v", EX + "p", "literal", "1", None, None),
    ])
    with pytest.raises(ValueError, match="indistinguishable"):
        isomorphic(twins, twins2)
    assert isomorphic(twins, twins2, strict=False)


def test_refinement_separates_distinguishable_bnodes(spark):
    g = _g(spark, _chain("x", "y", "Ada"))
    colors = canonical_colors(g).collect()
    assert len({r["color"] for r in colors}) == 2
    assert not any(r["ambiguous"] for r in colors)


def test_ground_graphs_and_empty(spark):
    g1 = _g(spark, [("iri", EX + "a", EX + "p", "literal", "1", None, None)])
    g2 = _g(spark, [("iri", EX + "a", EX + "p", "literal", "1", None, None)])
    assert isomorphic(g1, g2)
    assert isomorphic(_g(spark, []), _g(spark, []))
    assert not isomorphic(g1, _g(spark, []))
