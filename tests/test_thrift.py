"""RDF-Thrift (RDF Binary) tests — compact-protocol codec round-trips,
Spark distributed read/write, cross-format graph equality
(``riot/thrift/`` parity; wire structs ``BinaryRDF.thrift``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from jena_spark.sources.thrift import (  # noqa: E402
    decode_stream,
    encode_rows,
    read_thrift,
    write_thrift,
)

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def test_codec_roundtrip_triples():
    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", "hello ü \n\t\"x\"",
         None, None),
        ("bnode", "_:b0", "http://e/n", "literal", "5", XSD_INT, None),
        ("iri", "http://e/a", "http://e/p", "literal", "bonjour", None, "fr"),
        ("iri", "http://e/a", "http://e/q", "iri", "http://e/b", None, None),
        ("bnode", "_:x", "http://e/r", "bnode", "_:y", None, None),
    ]
    back = decode_stream(encode_rows(rows))
    assert [r[:7] for r in back] == rows
    assert all(r[7] is None for r in back)


def test_codec_roundtrip_quads():
    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", "v", None, None,
         "http://e/g1"),
        ("iri", "http://e/s", "http://e/p", "literal", "v", None, None, None),
    ]
    back = decode_stream(encode_rows(rows, quads=True))
    assert back == rows  # named-graph quad + default-graph triple


def test_codec_value_forms_and_prefixes():
    """Reader-side coverage for streams other writers may emit:
    prefix declarations, prefixName terms, valInteger/valDouble/
    valDecimal literals (ThriftConvert value mode)."""
    from jena_spark.sources.thrift import (
        _CT_DOUBLE,
        _CT_I32,
        _CT_I64,
        _CT_STRUCT,
        _Writer,
    )

    w = _Writer()
    # RDF_StreamRow{1: prefixDecl{prefix:"ex", uri:"http://e/"}}
    w.struct_begin()
    w.field(1, _CT_STRUCT)
    w.struct_begin()
    w.string(1, "ex")
    w.string(2, "http://e/")
    w.struct_end()
    w.struct_end()
    # triple with prefixName subject + valInteger object
    w.struct_begin()
    w.field(2, _CT_STRUCT)
    w.struct_begin()
    w.field(1, _CT_STRUCT)  # S
    w.struct_begin()
    w.field(4, _CT_STRUCT)  # prefixName
    w.struct_begin()
    w.string(1, "ex")
    w.string(2, "s")
    w.struct_end()
    w.struct_end()
    w.field(2, _CT_STRUCT)  # P = iri
    w.struct_begin()
    w.field(1, _CT_STRUCT)
    w.struct_begin()
    w.string(1, "http://e/p")
    w.struct_end()
    w.struct_end()
    w.field(3, _CT_STRUCT)  # O = valInteger -42
    w.struct_begin()
    w.i64(10, -42)
    w.struct_end()
    w.struct_end()
    w.struct_end()
    # triple with valDecimal object: 314 scale 2 -> "3.14"
    w.struct_begin()
    w.field(2, _CT_STRUCT)
    w.struct_begin()
    w.field(1, _CT_STRUCT)
    w.struct_begin()
    w.field(1, _CT_STRUCT)
    w.struct_begin()
    w.string(1, "http://e/s2")
    w.struct_end()
    w.struct_end()
    w.field(2, _CT_STRUCT)
    w.struct_begin()
    w.field(1, _CT_STRUCT)
    w.struct_begin()
    w.string(1, "http://e/p")
    w.struct_end()
    w.struct_end()
    w.field(3, _CT_STRUCT)
    w.struct_begin()
    w.field(12, _CT_STRUCT)
    w.struct_begin()
    w.i64(1, 314)
    w.i32(2, 2)
    w.struct_end()
    w.struct_end()
    w.struct_end()
    w.struct_end()

    rows = decode_stream(bytes(w.buf))
    assert rows[0][:5] == ("iri", "http://e/s", "http://e/p", "literal", "-42")
    assert rows[0][5].endswith("#integer")
    assert rows[1][:5] == ("iri", "http://e/s2", "http://e/p", "literal", "3.14")
    assert rows[1][5].endswith("#decimal")


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["iri", "bnode"]),
            st.text(
                st.characters(min_codepoint=33, max_codepoint=0x2FF), min_size=1
            ),
            st.sampled_from(["http://e/p", "http://e/q"]),
            st.sampled_from(["iri", "bnode", "literal"]),
            st.text(st.characters(blacklist_categories=("Cs",)), max_size=40),
            st.sampled_from([None, XSD_INT]),
            st.sampled_from([None, "en", "fr-BE"]),
        ),
        max_size=12,
    )
)
def test_codec_property_roundtrip(raw):
    rows = []
    for k, sv, p, ok, ov, dt, lg in raw:
        sv = ("_:" + sv) if k == "bnode" else ("http://e/" + sv)
        if ok != "literal":
            ov = ("_:" + (ov or "b")) if ok == "bnode" else ("http://e/" + ov)
            dt = lg = None
        elif lg is not None:
            dt = None  # langtag and datatype are exclusive
        rows.append((k, sv, p, ok, ov, dt, lg))
    assert [r[:7] for r in decode_stream(encode_rows(rows))] == rows


def test_spark_distributed_roundtrip(spark, tmp_path):
    """write_thrift -> read_thrift over the KG subgraph; per-partition
    part files; set equality with the source."""
    import pyspark.sql.functions as F

    from jena_spark import terms as TM
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples

    t = canonicalize_triples(raw_triples(spark_transcripts(spark))).select(
        *TM.TERM_COLS
    )
    path = str(tmp_path / "trdf")
    write_thrift(t, path)
    back = read_thrift(spark, path)
    a = {tuple(r) for r in t.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b and len(a) > 100
    # quads variant through named graphs
    q = t.withColumn("graph", F.lit("http://e/g"))
    qpath = str(tmp_path / "trdf_q")
    write_thrift(q, qpath, quads=True)
    backq = read_thrift(spark, qpath, quads=True)
    assert {tuple(r) for r in backq.collect()} == {tuple(r) for r in q.collect()}


def test_cross_format_equality(spark, tmp_path):
    """Same graph through .nt, .ttl and .trdf readers — identical
    triple sets (the RIOT language-family contract)."""
    from jena_spark import terms as TM
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples
    from jena_spark.sources.turtle import read_turtle, write_turtle

    t = canonicalize_triples(raw_triples(spark_transcripts(spark))).select(
        *TM.TERM_COLS
    )
    p_nt, p_ttl, p_trdf = (str(tmp_path / x) for x in ("nt", "ttl", "trdf"))
    write_ntriples(t, p_nt)
    write_turtle(t, p_ttl)
    write_thrift(t, p_trdf)
    via_nt = {tuple(r) for r in read_ntriples(spark, p_nt).select(*TM.TERM_COLS).collect()}
    via_ttl = {tuple(r) for r in read_turtle(spark, p_ttl).select(*TM.TERM_COLS).collect()}
    via_trdf = {tuple(r) for r in read_thrift(spark, p_trdf).collect()}
    assert via_nt == via_trdf == via_ttl


def spark_transcripts(spark):
    from fixtures import gen_transcripts

    from jena_spark.schemas import TRANSCRIPTS_SCHEMA

    tdf, _ = gen_transcripts(n_convs=30, seed=7)
    return spark.createDataFrame(tdf, TRANSCRIPTS_SCHEMA)


def test_codec_roundtrip_rdfstar():
    from jena_spark import terms as TM

    base = ("iri", "http://e/s", "http://e/p", "literal", "42", XSD_INT, None)
    qt = TM.quote(*base)
    nested = TM.quote("triple", qt, "http://e/meta", "iri", "http://e/x",
                      None, None)
    rows = [
        base,
        ("triple", qt, "http://e/saidBy", "iri", "http://e/alice", None, None),
        ("iri", "http://e/d", "http://e/refs", "triple", qt, None, None),
        ("triple", nested, "http://e/conf", "literal", "0.9", None, None),
    ]
    back = decode_stream(encode_rows(rows))
    assert [r[:7] for r in back] == rows
