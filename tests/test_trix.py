"""TriX reader/writer tests (ReaderTriX/StreamWriterTriX parity,
tag set ``riot/lang/TriX.java:64-74``)."""

from __future__ import annotations

from jena_spark.sources.trix import format_trix, parse_trix, read_trix, write_trix

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

DOC = f"""<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <triple>
      <uri>http://e/s</uri>
      <uri>http://e/p</uri>
      <plainLiteral>hello &amp; &lt;world&gt;</plainLiteral>
    </triple>
    <triple>
      <id>b0</id>
      <uri>http://e/n</uri>
      <typedLiteral datatype="{XSD_INT}">5</typedLiteral>
    </triple>
  </graph>
  <graph>
    <uri>http://e/g1</uri>
    <triple>
      <uri>http://e/a</uri>
      <uri>http://e/p</uri>
      <plainLiteral xml:lang="fr">bonjour</plainLiteral>
    </triple>
  </graph>
</TriX>
"""


def test_parse_trix_document():
    rows = set(parse_trix(DOC))
    assert ("iri", "http://e/s", "http://e/p", "literal", "hello & <world>",
            None, None, None) in rows
    assert ("bnode", "_:b0", "http://e/n", "literal", "5", XSD_INT, None,
            None) in rows
    assert ("iri", "http://e/a", "http://e/p", "literal", "bonjour", None,
            "fr", "http://e/g1") in rows
    assert len(rows) == 3


def test_format_parse_roundtrip_pure():
    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", 'esc "<&>" \n txt',
         None, None, None),
        ("bnode", "_:x1", "http://e/q", "iri", "http://e/o", None, None,
         "http://e/g"),
        ("iri", "http://e/s", "http://e/r", "literal", "tag", None, "en-GB",
         "http://e/g"),
    ]
    assert set(parse_trix(format_trix(rows))) == set(rows)


def test_trix_distributed_roundtrip(spark, tmp_path):
    from jena_spark.sources.turtle import parse_trig

    rows = [
        ("iri", "http://e/a", "http://e/p", "literal", "x", None, None, None),
        ("iri", "http://e/b", "http://e/p", "iri", "http://e/c", None, None,
         "http://e/g"),
        ("bnode", "_:t", "http://e/p", "literal", "7", XSD_INT, None,
         "http://e/g"),
    ]
    df = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string, graph string")
    p = str(tmp_path / "g.trix")
    write_trix(df, p)
    back = {tuple(r) for r in read_trix(spark, p + "/part-*")
            .select("s_kind", "s_val", "p_val", "o_kind", "o_val",
                    "o_datatype", "o_lang", "graph").collect()}
    assert back == set(rows)
