"""GraphFrames-style motif finding (``g.find`` analog) compiled onto
the BGP layer — positive edges, typed edges, anonymous elements,
negated edges (anti-join)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.queries.motif import find_motif, parse_motif  # noqa: E402

EX = "http://ex.org/"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def graph(spark):
    follows, likes = EX + "follows", EX + "likes"
    rows = [
        ("iri", EX + "a", follows, "iri", EX + "b", None, None),
        ("iri", EX + "b", follows, "iri", EX + "c", None, None),
        ("iri", EX + "c", follows, "iri", EX + "a", None, None),
        ("iri", EX + "a", likes, "iri", EX + "c", None, None),
        ("iri", EX + "d", follows, "iri", EX + "a", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def vals(df, *names):
    return {tuple(r[n]["val"] for n in names) for r in df.collect()}


ET = {"follows": EX + "follows", "likes": EX + "likes"}


def test_two_hop(graph):
    out = find_motif(graph, "(a)-[:follows]->(b); (b)-[:follows]->(c)",
                     edge_types=ET)
    assert vals(out, "a", "b", "c") == {
        (EX + "a", EX + "b", EX + "c"),
        (EX + "b", EX + "c", EX + "a"),
        (EX + "c", EX + "a", EX + "b"),
        (EX + "d", EX + "a", EX + "b"),
    }


def test_edge_variable_binds_predicate(graph):
    out = find_motif(graph, "(a)-[e]->(c)")
    assert (EX + "a", EX + "likes", EX + "c") in vals(out, "a", "e", "c")


def test_negated_edge(spark):
    # pairs where a follows b but b does NOT follow a back
    follows = EX + "follows"
    g = spark.createDataFrame([
        ("iri", EX + "a", follows, "iri", EX + "b", None, None),
        ("iri", EX + "b", follows, "iri", EX + "a", None, None),  # mutual
        ("iri", EX + "a", follows, "iri", EX + "c", None, None),  # one-way
    ], _SCHEMA)
    out = find_motif(
        g, "(a)-[:follows]->(b); !(b)-[:follows]->(a)", edge_types=ET)
    assert vals(out, "a", "b") == {(EX + "a", EX + "c")}


def test_anonymous_vertex_and_edge(graph):
    # vertices with any outgoing edge to anywhere
    out = find_motif(graph, "(a)-[]->()")
    assert vals(out, "a") == {
        (EX + "a",), (EX + "b",), (EX + "c",), (EX + "d",)}


def test_mutual_follow_triangle(graph):
    out = find_motif(
        graph,
        "(a)-[:follows]->(b); (b)-[:follows]->(c); (c)-[:follows]->(a)",
        edge_types=ET)
    assert len(vals(out, "a", "b", "c")) == 3  # the rotations of a-b-c


def test_parse_errors(graph):
    with pytest.raises(ValueError, match="cannot parse"):
        parse_motif("(a)->[e]-(b)")
    with pytest.raises(ValueError, match="negated edges cannot"):
        parse_motif("!(a)-[e]->(b)")
    with pytest.raises(ValueError, match="unknown edge type"):
        parse_motif("(a)-[:nope]->(b)", edge_types={})
    with pytest.raises(ValueError, match="at least one positive"):
        parse_motif("!(a)-[]->(b)")
    with pytest.raises(ValueError, match="mutually exclusive"):
        parse_motif("(a)-[e:follows]->(b)", edge_types=ET)
    with pytest.raises(ValueError, match="binds no named"):
        find_motif(graph, "()-[]->()")


def test_matches_manual_join(graph):
    out = find_motif(graph, "(a)-[:follows]->(b); (b)-[:likes]->(c)",
                     edge_types=ET)
    f = graph.where(F.col("p_val") == ET["follows"]).select(
        F.col("s_val").alias("a"), F.col("o_val").alias("b"))
    l = graph.where(F.col("p_val") == ET["likes"]).select(
        F.col("s_val").alias("b"), F.col("o_val").alias("c"))
    want = {tuple(r) for r in f.join(l, "b").select("a", "b", "c").collect()}
    assert vals(out, "a", "b", "c") == want


def test_reserved_names_rejected(graph):
    with pytest.raises(ValueError, match="reserved"):
        parse_motif("(__a)-[]->(b)")
    with pytest.raises(ValueError, match="reserved"):
        parse_motif("(a)-[__e]->(b)")
