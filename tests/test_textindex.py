"""Inverted text index tests (jena-text parity, TextIndexLucene)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.queries import textindex as TI

SCHEMA = ("s_kind string, s_val string, p_val string, o_kind string, "
          "o_val string, o_datatype string, o_lang string")


def _g(spark):
    rows = [
        ("iri", "e1", TM.RDFS_LABEL, "literal", "Alan Turing", None, None),
        ("iri", "e1", TM.RDFS_LABEL, "literal", "Turing", None, None),
        ("iri", "e2", TM.RDFS_LABEL, "literal", "Grace Hopper", None, None),
        ("bnode", "t1", TM.P_TEXT, "literal", "we discussed Turing today", None, None),
        ("bnode", "t2", TM.P_TEXT, "literal", "nothing relevant here", None, None),
        # non-indexed property must not enter the index
        ("bnode", "t1", TM.P_ROLE, "literal", "turing", None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_build_and_query_any(spark):
    idx = TI.build_text_index(_g(spark))
    posting = {(r["token"], r["s_val"], r["tf"], r["doc_len"])
               for r in idx.collect()}
    # e1 has two labels -> field length 3 (alan,turing + turing), tf(turing)=2
    assert ("turing", "e1", 2, 3) in posting
    assert not any(s == "t1" and t == "role" for (t, s, *_ ) in posting)

    hits = {r["s_val"]: r["score_bp"] for r in
            TI.query_index(idx, ["Turing"]).collect()}
    assert set(hits) == {"e1", "t1"}
    assert hits["e1"] == 2 * 10000 // 3
    assert hits["t1"] == 10000 // 4  # "we discussed turing today"


def test_query_all_mode(spark):
    idx = TI.build_text_index(_g(spark))
    both = {r["s_val"] for r in
            TI.query_index(idx, ["discussed", "turing"], mode="all").collect()}
    assert both == {"t1"}  # only the turn text contains both terms
    either = {r["s_val"] for r in
              TI.query_index(idx, ["discussed", "turing"], mode="any").collect()}
    assert either == {"e1", "t1"}


def test_query_property_scoped_and_limit(spark):
    idx = TI.build_text_index(_g(spark))
    only_labels = {r["s_val"] for r in
                   TI.query_index(idx, ["turing"], property=TM.RDFS_LABEL).collect()}
    assert only_labels == {"e1"}
    top1 = TI.query_index(idx, ["turing"], limit=1).collect()
    assert len(top1) == 1 and top1[0]["s_val"] == "e1"  # highest score first


def test_incremental_update_equals_rebuild(spark):
    """update_text_index(build(T), A, R) == build(T') — the Lucene
    delete+re-add contract at (subject, property) granularity."""
    from jena_spark.queries.textindex import build_text_index, update_text_index

    SCHEMA = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string")
    LBL = "http://www.w3.org/2000/01/rdf-schema#label"
    base = [
        ("iri", "http://e/s1", LBL, "literal", "alpha beta", None, None),
        ("iri", "http://e/s1", LBL, "literal", "gamma", None, None),
        ("iri", "http://e/s2", LBL, "literal", "delta delta", None, None),
        ("iri", "http://e/s3", LBL, "literal", "epsilon", None, None),
        # non-indexed property must never enter the index
        ("iri", "http://e/s1", "http://e/other", "literal", "zeta", None, None),
    ]
    t = spark.createDataFrame(base, SCHEMA)
    idx = build_text_index(t)

    # change: drop one of s1's labels; s2 gets a NEW label (full
    # post-change doc for s2 = old + new); s3 fully deleted
    removed = spark.createDataFrame(
        [base[1], base[3]], SCHEMA
    )
    added = spark.createDataFrame(
        [base[0],  # s1's remaining doc
         base[2],  # s2 keeps its old label...
         ("iri", "http://e/s2", LBL, "literal", "eta", None, None)],  # ...plus new
        SCHEMA,
    )
    updated = update_text_index(idx, added=added, removed=removed)

    final_corpus = spark.createDataFrame(
        [base[0], base[2], base[4],
         ("iri", "http://e/s2", LBL, "literal", "eta", None, None)],
        SCHEMA,
    )
    def _h(rows):
        return {tuple(tuple(x) if isinstance(x, list) else x for x in r)
                for r in rows}

    want = _h(build_text_index(final_corpus).collect())
    got = _h(updated.collect())
    assert got == want
    # s3 gone, eta present, zeta never indexed
    assert not any(r[3] == "http://e/s3" for r in got)
    assert any(r[0] == "eta" for r in got)
    assert not any(r[0] == "zeta" for r in got)

    # pure-removal path (no added docs remain for the key)
    only_removed = update_text_index(idx, removed=spark.createDataFrame(
        [base[3]], SCHEMA))
    assert not any(r[3] == "http://e/s3"
                   for r in only_removed.collect())


def test_parse_lucene_query_clauses():
    cs = TI.parse_lucene_query('+alan tur* -kay "alan turing" lbl:grace')
    assert [c["occur"] for c in cs] == [
        "MUST", "SHOULD", "MUST_NOT", "SHOULD", "SHOULD"]
    assert [c["kind"] for c in cs] == [
        "term", "prefix", "term", "phrase", "term"]
    assert cs[4]["field"] == "lbl" and cs[4]["value"] == "grace"
    # AND promotes both neighbours to MUST (classic-parser behavior)
    cs = TI.parse_lucene_query("alan AND kay")
    assert [c["occur"] for c in cs] == ["MUST", "MUST"]
    # rejected syntax errors, not silent mis-parses
    import pytest as _p
    for bad in ("*lead", "fu~zzy", "a^2", "NOT x", "-only -neg"):
        with _p.raises(ValueError):
            TI.parse_lucene_query(bad)


def test_query_text_phrase_and_occurs(spark):
    idx = TI.build_text_index(_g(spark))
    # phrase matches only where tokens are ADJACENT within one literal
    got = [r["s_val"] for r in TI.query_text(idx, '"alan turing"').collect()]
    assert got == ["e1"]
    # 'discussed turing' is adjacent in t1's text
    got = [r["s_val"] for r in TI.query_text(idx, '"discussed turing"').collect()]
    assert got == ["t1"]
    # reversed order is NOT a phrase hit
    assert TI.query_text(idx, '"turing discussed"').count() == 0
    # MUST + MUST_NOT + prefix
    got = {r["s_val"] for r in TI.query_text(idx, "+turing disc*").collect()}
    assert got == {"e1", "t1"}
    got = {r["s_val"] for r in TI.query_text(idx, "+turing -discussed").collect()}
    assert got == {"e1"}
    # field restriction via the caller's field map
    got = {r["s_val"] for r in TI.query_text(
        idx, "lbl:turing", prop_map={"lbl": TM.RDFS_LABEL}).collect()}
    assert got == {"e1"}


def test_phrase_never_crosses_literal_boundary(spark):
    # e1 has literals "Alan Turing" and "Turing": the last token of one
    # literal and the first of another must not form a phrase
    idx = TI.build_text_index(_g(spark))
    assert TI.query_text(idx, '"turing turing"').count() == 0
    # ... even when literals are adjacent in sort order with the right
    # tokens at the seam
    rows = [
        ("iri", "x", TM.RDFS_LABEL, "literal", "aaa bbb", None, None),
        ("iri", "x", TM.RDFS_LABEL, "literal", "ccc ddd", None, None),
    ]
    idx2 = TI.build_text_index(spark.createDataFrame(rows, SCHEMA))
    assert TI.query_text(idx2, '"bbb ccc"').count() == 0
    assert TI.query_text(idx2, '"ccc ddd"').count() == 1


def test_text_query_pf_from_sparql_string(spark):
    from jena_spark.queries.sparql import sparql_query

    t = _g(spark)
    q = ('SELECT ?s WHERE { ?s <http://jena.apache.org/text#query> '
         '("\\"alan turing\\"" 5) }')
    assert [r["s"] for r in sparql_query(t, q).collect()] == ["e1"]
    # property-restricted form: only the text field is searched
    q2 = ('SELECT ?s WHERE { ?s <http://jena.apache.org/text#query> '
          f'(<{TM.P_TEXT}> "turing") }}')
    assert [r["s"] for r in sparql_query(t, q2).collect()] == ["t1"]
    # PF output joins with ordinary patterns (entity-keyed hits)
    q3 = ('SELECT ?lbl WHERE { ?s <http://jena.apache.org/text#query> '
          '("grace") . ?s <' + TM.RDFS_LABEL + '> ?lbl }')
    assert [r["lbl"] for r in sparql_query(t, q3).collect()] == ["Grace Hopper"]


# --- external text-index binding (jena-text-es seam) ---------------------


def test_remote_binding_matches_local(spark):
    """The TextIndexES contract: the same documents pushed through the
    external HTTP binding answer every query row-identically to the
    local posting-table path."""
    from jena_spark.queries.textremote import (
        TextIndexRemote, TextIndexService)

    g = _g(spark)
    local_idx = TI.build_text_index(g)
    with TextIndexService(spark) as base:
        remote = TextIndexRemote(spark, base, batch_size=2)
        n = remote.add_entities(g)
        assert n == 5  # the five indexed-property literals

        for q in ("turing", "grace OR discussed", "+turing -alan",
                  '"alan turing"'):
            want = sorted(
                tuple(r) for r in
                TI.query_text(local_idx, q)
                .select("s_kind", "s_val", "property", "score_bp")
                .collect())
            got = sorted(tuple(r) for r in remote.query(q).collect())
            assert got == want, q

        # property-scoped + limited query
        got = remote.query("turing", property=TM.RDFS_LABEL, limit=1)
        assert [r["s_val"] for r in got.collect()] == ["e1"]


def test_remote_binding_entity_lifecycle(spark):
    """get / deleteEntity analogs: stored-field fetch and per-entity
    deletion re-index on the service side."""
    from jena_spark.queries.textremote import (
        TextIndexRemote, TextIndexService)

    g = _g(spark)
    with TextIndexService(spark) as base:
        remote = TextIndexRemote(spark, base)
        remote.add_entities(g)
        fields = remote.get("e1")
        assert sorted(f["text"] for f in fields) == ["Alan Turing", "Turing"]

        assert remote.delete_entity("e1") == 2
        assert remote.get("e1") == []
        # e1 no longer matches; t1's text doc still does
        got = {r["s_val"] for r in remote.query("turing").collect()}
        assert got == {"t1"}
