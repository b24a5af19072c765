"""Round-trip tests: triples → N-Triples text → parse → identical set
(the RiotEvalTest analog; deterministic skolemization makes
isomorphism ≡ term equality)."""

from __future__ import annotations

from jena_spark import terms as TM
from jena_spark.pipeline.extract import raw_triples
from jena_spark.pipeline.materialize import triple_set
from jena_spark.sources.ntriples import read_ntriples, write_ntriples


def _mk(spark, rows):
    full = [r + (None, None) for r in rows]
    return spark.createDataFrame(
        full,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string, graph string, conv_id string",
    )


NASTY = [
    ("iri", "http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b", None, None),
    ("bnode", "_:abc123", "http://ex.org/p", "bnode", "_:def456", None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "plain text", None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "chat", None, "fr"),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "42", TM.XSD_INTEGER, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", 'he said "hi"', None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "line1\nline2\ttab", None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "back\\slash \\n not-nl", None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "naïve café ⚡", None, None),
    ("iri", "http://ex.org/a", "http://ex.org/q", "literal", "", None, None),
]


def test_roundtrip_nasty_literals(spark, tmp_path):
    df = _mk(spark, NASTY)
    path = str(tmp_path / "nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert back.count() == len(NASTY)
    assert triple_set(back) == triple_set(df)


def test_roundtrip_pipeline_output(spark, transcripts_df, tmp_path):
    df = raw_triples(transcripts_df)
    path = str(tmp_path / "nt2")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert triple_set(back) == triple_set(df)


def test_nquads_roundtrip(spark, tmp_path):
    rows = [
        ("iri", "http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b",
         None, None, "http://ex.org/g1", None),
        ("iri", "http://ex.org/a", "http://ex.org/p", "literal", "x", None, None,
         None, None),  # default graph
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string, graph string, conv_id string",
    )
    path = str(tmp_path / "nq")
    write_ntriples(df, path, quads=True)
    back = read_ntriples(spark, path, quads=True)
    got = {(r["s_val"], r["o_val"], r["graph"]) for r in back.collect()}
    assert got == {("http://ex.org/a", "http://ex.org/b", "http://ex.org/g1"),
                   ("http://ex.org/a", "x", None)}


def test_parser_skips_comments_and_blanks(spark, tmp_path):
    p = tmp_path / "manual"
    p.mkdir()
    (p / "part-0.nt").write_text(
        "# a comment\n"
        "\n"
        "<http://ex.org/a> <http://ex.org/p> \"v\" .\n"
        "   <http://ex.org/b> <http://ex.org/p> <http://ex.org/c> .  \n"
    )
    back = read_ntriples(spark, str(p))
    assert back.count() == 2


def test_read_uchar_escapes(spark, tmp_path):
    """RDF 1.1 UCHAR decoding (foreign-file escapes): \\uXXXX and
    \\UXXXXXXXX in IRIs and literals decode when requested; the
    default path leaves them as-is (documented)."""
    from jena_spark.sources.ntriples import read_ntriples

    p = str(tmp_path / "u.nt")
    with open(p, "w") as f:
        f.write('<http://e/caf\\u00E9> <http://e/p> "sm\\U0001F600ile" .\n')
        f.write('<http://e/plain> <http://e/p> "no escapes" .\n')
    rows = {(r["s_val"], r["o_val"]) for r in
            read_ntriples(spark, p, decode_uchar=True).collect()}
    assert ("http://e/café", "sm\U0001F600ile") in rows
    assert ("http://e/plain", "no escapes") in rows
    raw = {r["s_val"] for r in read_ntriples(spark, p).collect()}
    assert "http://e/caf\\u00E9" in raw


def test_uchar_single_pass_and_graph(spark, tmp_path):
    """Review regressions: (1) an ESCAPED backslash followed by uXXXX
    must NOT double-decode ('\\\\u0041' means backslash + text);
    (2) the graph IRI of an N-Quads line decodes too; (3) surrogate
    pairs combine; (4) matches the Turtle reader on the same content."""
    from jena_spark.sources.ntriples import read_ntriples
    from jena_spark.sources.turtle import read_turtle

    p = str(tmp_path / "u2.nq")
    with open(p, "w") as f:
        f.write('<http://e/s> <http://e/p> "back\\\\u0041slash" <http://e/caf\\u00E9> .\n')
        f.write('<http://e/s> <http://e/p> "pair\\uD83D\\uDE00" .\n')
    got = {(r["o_val"], r["graph"]) for r in
           read_ntriples(spark, p, quads=True, decode_uchar=True).collect()}
    assert ("back\\u0041slash", "http://e/café") in got   # no double decode
    assert ("pair\U0001F600", None) in got                 # surrogate pair
    # cross-reader agreement on the literal content (turtle, no graph)
    p2 = str(tmp_path / "u2.nt")
    with open(p2, "w") as f:
        f.write('<http://e/s> <http://e/p> "back\\\\u0041slash" .\n')
    t = {r["o_val"] for r in read_turtle(spark, p2).collect()}
    assert t == {"back\\u0041slash"}


def test_uchar_lone_surrogate_raises(spark, tmp_path):
    from jena_spark.sources.ntriples import read_ntriples

    p = str(tmp_path / "u3.nt")
    with open(p, "w") as f:
        f.write('<http://e/s> <http://e/p> "bad\\uD83Dend" .\n')
    import pytest as _pt

    with _pt.raises(Exception, match="lone surrogate"):
        read_ntriples(spark, p, decode_uchar=True).collect()
