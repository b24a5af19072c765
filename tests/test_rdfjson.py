"""RDF/JSON reader/writer tests (LangRDFJSON parity)."""

from __future__ import annotations

import pytest

from jena_spark.sources.rdfjson import (
    format_rdfjson,
    parse_rdfjson,
    read_rdfjson,
    write_rdfjson,
)

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def test_parse_rdfjson():
    doc = """{
      "http://e/s": {
        "http://e/p": [
          {"type": "literal", "value": "plain"},
          {"type": "literal", "value": "5", "datatype": "%s"},
          {"type": "literal", "value": "chat", "lang": "fr"},
          {"type": "uri", "value": "http://e/o"},
          {"type": "bnode", "value": "_:b1"}
        ]
      },
      "_:b1": {"http://e/q": [{"type": "uri", "value": "http://e/z"}]}
    }""" % XSD_INT
    rows = set(parse_rdfjson(doc))
    assert ("iri", "http://e/s", "http://e/p", "literal", "plain", None, None) in rows
    assert ("iri", "http://e/s", "http://e/p", "literal", "5", XSD_INT, None) in rows
    assert ("iri", "http://e/s", "http://e/p", "literal", "chat", None, "fr") in rows
    assert ("iri", "http://e/s", "http://e/p", "iri", "http://e/o", None, None) in rows
    assert ("iri", "http://e/s", "http://e/p", "bnode", "_:b1", None, None) in rows
    assert ("bnode", "_:b1", "http://e/q", "iri", "http://e/z", None, None) in rows
    assert len(rows) == 6


def test_parse_errors():
    with pytest.raises(ValueError, match="type"):
        parse_rdfjson('{"http://e/s": {"http://e/p": [{"value": "x"}]}}')
    with pytest.raises(ValueError, match="not one of"):
        parse_rdfjson('{"s": {"p": [{"type": "weird", "value": "x"}]}}')


def test_format_parse_roundtrip_pure():
    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", 'u "q" \n nl', None, None),
        ("bnode", "_:x", "http://e/p", "literal", "v", None, "en"),
        ("iri", "http://e/s", "http://e/q", "literal", "5", XSD_INT, None),
        ("iri", "http://e/s", "http://e/q", "iri", "http://e/o", None, None),
    ]
    assert set(parse_rdfjson(format_rdfjson(rows))) == set(rows)


def test_rdfjson_distributed_equals_ntriples(spark, transcripts_df, tmp_path):
    from jena_spark import terms as TM
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples

    triples = raw_triples(transcripts_df).select(*TM.TERM_COLS).limit(200)
    nt, rj = str(tmp_path / "g.nt"), str(tmp_path / "g.rj")
    write_ntriples(triples, nt)
    write_rdfjson(triples, rj)
    from_nt = {tuple(r) for r in
               read_ntriples(spark, nt).select(*TM.TERM_COLS).collect()}
    from_rj = {tuple(r) for r in
               read_rdfjson(spark, rj + "/part-*").select(*TM.TERM_COLS).collect()}
    assert from_rj == from_nt and len(from_rj) == 200
