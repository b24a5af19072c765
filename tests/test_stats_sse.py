"""tdbstats / stats.opt surface: the ``StatsCollector`` census, the
SSE document writer/parser pair, and the ``((VAR rdf:type <T>) n)``
class-count refinement of the stats-fed reorder.

Reference: ``jena-tdb/.../solver/stats/Stats.java`` (format),
``StatsCollectorBase.java`` (census), ``jena-arq/.../engine/optimizer/
StatsMatcher.java:106-160`` (reader + type patterns),
``jena-cmds/.../tdb/tdbstats.java`` (CLI).
"""

from __future__ import annotations

import pytest

from jena_spark.pipeline.stats import (
    StatsResults,
    gather_stats,
    parse_stats_sse,
    write_stats_sse,
)

V = "http://ex/v#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

TERM_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, "
    "o_val string, o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def census(spark):
    g = spark.createDataFrame([
        ("iri", "a", RDF + "type", "iri", V + "Person", None, None),
        ("iri", "b", RDF + "type", "iri", V + "Person", None, None),
        ("iri", "c", RDF + "type", "iri", V + "Place", None, None),
        ("iri", "a", V + "knows", "iri", "b", None, None),
        ("iri", "a", V + "name", "literal", "x", None, None),
        # rdf:type with a literal object does NOT join the class census
        ("iri", "z", RDF + "type", "literal", "odd", None, None),
        # container membership predicates are skipped by the writer
        ("iri", "s", RDF + "_1", "literal", "first", None, None),
    ], TERM_SCHEMA)
    return gather_stats(g)


def test_gather_stats(census):
    assert census.count == 7
    assert census.predicates[RDF + "type"] == 4
    assert census.predicates[V + "knows"] == 1
    assert census.types == {V + "Person": 2, V + "Place": 1}


def test_write_parse_roundtrip(census):
    text = write_stats_sse(census)
    back = parse_stats_sse(text)
    preds = dict(census.predicates)
    preds.pop(RDF + "_1")  # Stats.java:118 skips container memberships
    assert back.predicates == preds
    assert back.types == census.types
    assert back.count == census.count and back.other == 0
    # deterministic: no timestamp unless supplied, stable ordering
    assert text == write_stats_sse(census)
    assert "timestamp" not in text
    stamped = write_stats_sse(census, timestamp="2026-01-01T00:00:00Z")
    assert '(timestamp "2026-01-01T00:00:00Z"' in stamped
    assert '(run@ "2026-01-01T00:00:00Z")' in stamped
    assert parse_stats_sse(stamped).predicates == preds


def test_parse_reference_spelling():
    # the reference writes rdf:type prefixed and meta pairs first
    text = """(stats
      (meta (timestamp "2010-06-13T19:58:00+01:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>)
            (run@ "someday") (count 42))
      ((VAR rdf:type <http://ex/v#T>) 7)
      ((VAR <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/v#U>) 3)
      (<http://ex/v#p> 12)
      (other 1))"""
    s = parse_stats_sse(text)
    assert s.count == 42 and s.other == 1
    assert s.predicates == {V + "p": 12}
    assert s.types == {V + "T": 7, V + "U": 3}


def test_parse_rejects_non_stats():
    with pytest.raises(ValueError, match="stats"):
        parse_stats_sse("(prefix ((: <http://e/>)) (bgp))")
    with pytest.raises(ValueError, match="rdf:type"):
        parse_stats_sse("(stats ((VAR <http://e/other> <http://e/T>) 1))")


def test_type_counts_refine_reorder():
    """StatsMatcher registers (VAR rdf:type T) patterns: with class
    counts, a selective-type scan beats a common predicate even though
    the rdf:type predicate count is corpus-dominating."""
    from jena_spark.queries.algebra import Var, reorder_patterns_stats

    iri = lambda u: ("iri", u, None, None)  # noqa: E731
    type_pat = (Var("s"), iri(RDF + "type"), iri(V + "RareClass"))
    knows_pat = (Var("s"), iri(V + "knows"), Var("o"))
    preds = {RDF + "type": 10_000, V + "knows": 500}
    # without class counts: rdf:type's census dominates, knows leads
    plain = reorder_patterns_stats([type_pat, knows_pat], preds)
    assert plain[0] == knows_pat
    # with class counts: the rare class is the selective entry point
    typed = reorder_patterns_stats(
        [type_pat, knows_pat], preds, type_counts={V + "RareClass": 3})
    assert typed[0] == type_pat
    # an UNKNOWN class estimates 1, like an unseen predicate
    typed2 = reorder_patterns_stats(
        [(Var("s"), iri(RDF + "type"), iri(V + "Unseen")), knows_pat],
        preds, type_counts={V + "RareClass": 3})
    assert typed2[0][2] == iri(V + "Unseen")
    # a VARIABLE class falls back to the full rdf:type census
    var_pat = (Var("s"), iri(RDF + "type"), Var("c"))
    typed3 = reorder_patterns_stats(
        [var_pat, knows_pat], preds, type_counts={V + "RareClass": 3})
    assert typed3[0] == knows_pat


def test_elephas_transform_oneliners(spark):
    """SURVEY §2.13 filter/split/transform rows — explicit surface."""
    from jena_spark.pipeline.stats import (
        filter_by_predicate,
        ground_triples,
        quads_to_triples,
        split_to_nodes,
        triples_to_quads,
        valid_triples,
    )

    t = spark.createDataFrame(
        [("iri", "http://x/s", "http://x/p", "iri", "http://x/o", None, None),
         ("bnode", "b0", "http://x/p", "literal", "5",
          "http://www.w3.org/2001/XMLSchema#integer", None),
         ("iri", "http://x/s2", "http://x/q", "bnode", "b1", None, None)],
        "s_kind string, s_val string, p_val string, o_kind string, "
        "o_val string, o_datatype string, o_lang string")
    assert valid_triples(t).count() == 3
    assert {r["s_val"] for r in ground_triples(t).collect()} == \
        {"http://x/s"}
    assert filter_by_predicate(t, ["http://x/q"]).count() == 1
    nodes = split_to_nodes(t).collect()
    assert len(nodes) == 9
    assert {(r["pos"], r["kind"]) for r in nodes} >= \
        {("s", "iri"), ("s", "bnode"), ("p", "iri"),
         ("o", "literal"), ("o", "bnode")}
    dts = {r["datatype"] for r in nodes if r["pos"] == "o"}
    assert "http://www.w3.org/2001/XMLSchema#integer" in dts
    q = triples_to_quads(t, "urn:g")
    assert q.where("graph = 'urn:g'").count() == 3
    assert quads_to_triples(q).columns == t.columns
