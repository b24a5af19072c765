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
