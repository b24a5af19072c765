"""RDF/XML reader/writer tests (riot/lang/rdfxml parity, principal
striped-syntax subset)."""

from __future__ import annotations

import pytest

from jena_spark.sources.rdfxml import (
    RDF_NS,
    format_rdfxml,
    parse_rdfxml,
    read_rdfxml,
    write_rdfxml,
)

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def test_parse_striped_and_typed():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="http://e/" xml:base="http://b/">
      <ex:Person rdf:about="alice" ex:nick="Al">
        <ex:age rdf:datatype="{XSD_INT}">30</ex:age>
        <ex:label xml:lang="en">Alice</ex:label>
        <ex:knows rdf:resource="http://e/bob"/>
        <ex:friend>
          <rdf:Description rdf:nodeID="b1">
            <ex:name>Bob</ex:name>
          </rdf:Description>
        </ex:friend>
      </ex:Person>
    </rdf:RDF>"""
    rows = set(parse_rdfxml(doc))
    A = "http://b/alice"
    assert ("iri", A, RDF_NS + "type", "iri", "http://e/Person", None, None) in rows
    assert ("iri", A, "http://e/nick", "literal", "Al", None, None) in rows
    assert ("iri", A, "http://e/age", "literal", "30", XSD_INT, None) in rows
    assert ("iri", A, "http://e/label", "literal", "Alice", None, "en") in rows
    assert ("iri", A, "http://e/knows", "iri", "http://e/bob", None, None) in rows
    assert ("iri", A, "http://e/friend", "bnode", "_:b1", None, None) in rows
    assert ("bnode", "_:b1", "http://e/name", "literal", "Bob", None, None) in rows
    assert len(rows) == 7


def test_parse_parsetype_li_collection():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://e/s">
        <ex:addr rdf:parseType="Resource">
          <ex:city>Berlin</ex:city>
        </ex:addr>
        <ex:bag>
          <rdf:Description>
            <rdf:li>x</rdf:li>
            <rdf:li>y</rdf:li>
          </rdf:Description>
        </ex:bag>
        <ex:list rdf:parseType="Collection">
          <rdf:Description rdf:about="http://e/a"/>
          <rdf:Description rdf:about="http://e/b"/>
        </ex:list>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(doc)
    preds = [r[2] for r in rows]
    assert RDF_NS + "_1" in preds and RDF_NS + "_2" in preds
    assert ("literal", "Berlin") in {(r[3], r[4]) for r in rows if r[2] == "http://e/city"}
    firsts = {r[4] for r in rows if r[2] == RDF_NS + "first"}
    assert firsts == {"http://e/a", "http://e/b"}
    assert any(r[4] == RDF_NS + "nil" for r in rows if r[2] == RDF_NS + "rest")
    # anonymous bnodes are deterministic per document
    assert rows == parse_rdfxml(doc)


def test_parse_multi_child_property_raises():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://e/s">
        <ex:p><rdf:Description/><rdf:Description/></ex:p>
      </rdf:Description>
    </rdf:RDF>"""
    with pytest.raises(ValueError, match="node element"):
        parse_rdfxml(doc)


def test_format_parse_roundtrip_pure():
    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", 'x <&> "q"', None, None),
        ("iri", "http://e/s", "http://e/q", "literal", "5", XSD_INT, None),
        ("iri", "http://e/s", "http://e/q", "literal", "hi", None, "en"),
        ("bnode", "_:b0", "http://e/r", "iri", "http://e/o", None, None),
        ("iri", "http://e/s", "http://e/r", "bnode", "_:b0", None, None),
    ]
    assert set(parse_rdfxml(format_rdfxml(rows))) == set(rows)


def test_rdfxml_distributed_equals_ntriples(spark, transcripts_df, tmp_path):
    from jena_spark import terms as TM
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples

    triples = raw_triples(transcripts_df).select(*TM.TERM_COLS).limit(200)
    nt, rx = str(tmp_path / "g.nt"), str(tmp_path / "g.rdf")
    write_ntriples(triples, nt)
    write_rdfxml(triples, rx)
    from_nt = {tuple(r) for r in
               read_ntriples(spark, nt).select(*TM.TERM_COLS).collect()}
    from_rx = {tuple(r) for r in
               read_rdfxml(spark, rx + "/part-*").select(*TM.TERM_COLS).collect()}
    assert from_rx == from_nt and len(from_rx) == 200


def test_writer_qname_split_edge_cases():
    """r2 advice: predicates without a '#'/'/' namespace split must not
    crash, and non-NCName local parts must not corrupt the document —
    split at the longest NCName suffix or raise a clear ValueError."""
    import pytest

    from jena_spark.sources.rdfxml import _split_qname, format_rdfxml, parse_rdfxml

    assert _split_qname("http://e/ns#name") == ("http://e/ns#", "name")
    assert _split_qname("urn:isbn:x123") == ("urn:isbn:", "x123")
    # digits first: namespace absorbs them, local is the NCName tail
    assert _split_qname("http://e/123abc") == ("http://e/123", "abc")
    for bad in ("urn:isbn:123", "http://e/123", "http://e/a#"):
        with pytest.raises(ValueError, match="NCName"):
            _split_qname(bad)

    # round-trip through the writer for the awkward-but-legal cases
    rows = [
        ("iri", "http://e/s", "urn:isbn:x123", "literal", "v", None, None),
        ("iri", "http://e/s", "http://e/123abc", "iri", "http://e/o", None, None),
    ]
    doc = format_rdfxml(rows)
    assert sorted(parse_rdfxml(doc)) == sorted(rows)

    with pytest.raises(ValueError, match="NCName"):
        format_rdfxml([("iri", "http://e/s", "http://e/123", "literal", "v", None, None)])


def test_parsetype_literal_and_reification():
    """Round-3 grammar extensions: parseType="Literal" -> rdf:XMLLiteral,
    rdf:ID reification sugar, RFC3986 base resolution."""
    from jena_spark.sources.rdfxml import RDF_NS, format_rdfxml, parse_rdfxml

    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        xmlns:ex="http://e/ns#" xml:base="http://e/doc">
      <rdf:Description rdf:about="s">
        <ex:body rdf:parseType="Literal">pre <b>bold</b> post</ex:body>
        <ex:knows rdf:ID="st1" rdf:resource="o"/>
      </rdf:Description>
    </rdf:RDF>"""
    rows = set(parse_rdfxml(doc))
    # RFC3986: base http://e/doc + "s" -> http://e/s (not http://e/docs)
    assert ("iri", "http://e/s", "http://e/ns#body", "literal",
            "pre <b>bold</b> post", RDF_NS + "XMLLiteral", None) in rows
    stmt = "http://e/doc#st1"
    assert ("iri", "http://e/s", "http://e/ns#knows", "iri", "http://e/o",
            None, None) in rows
    assert ("iri", stmt, RDF_NS + "type", "iri", RDF_NS + "Statement",
            None, None) in rows
    assert ("iri", stmt, RDF_NS + "subject", "iri", "http://e/s", None, None) in rows
    assert ("iri", stmt, RDF_NS + "predicate", "iri", "http://e/ns#knows",
            None, None) in rows
    assert ("iri", stmt, RDF_NS + "object", "iri", "http://e/o", None, None) in rows
    assert len(rows) == 6

    # writer round-trip for XMLLiteral
    lit_rows = [("iri", "http://e/s", "http://e/ns#body", "literal",
                 "pre <b>bold</b> post", RDF_NS + "XMLLiteral", None)]
    assert parse_rdfxml(format_rdfxml(lit_rows)) == lit_rows

    import pytest

    with pytest.raises(ValueError, match="well-formed"):
        format_rdfxml([("iri", "http://e/s", "http://e/ns#body", "literal",
                        "<unclosed", RDF_NS + "XMLLiteral", None)])
