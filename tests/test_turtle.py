"""Turtle reader/writer tests (LangTurtle parity,
``riot/lang/LangTurtle.java:33``): prefixes, 'a', ';'/',' lists, typed
and lang literals, bnode labels and [] property lists, collections,
numeric shorthand, and cross-format equality with N-Triples."""

from __future__ import annotations

from jena_spark import terms as TM
from jena_spark.sources.turtle import format_turtle, parse_turtle, read_turtle

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_parse_basic_directives_and_lists():
    doc = """
    @prefix ex: <http://ex.org/> .
    @base <http://base.org/> .
    PREFIX foo: <http://foo.org#>
    # a comment
    ex:s a ex:Type ;
         ex:p "plain", "typed"^^ex:dt, "tagged"@en-GB ;
         foo:q <rel/iri> .
    """
    rows = set(parse_turtle(doc))
    assert ("iri", "http://ex.org/s", RDF + "type", "iri", "http://ex.org/Type",
            None, None) in rows
    assert ("iri", "http://ex.org/s", "http://ex.org/p", "literal", "plain",
            None, None) in rows
    assert ("iri", "http://ex.org/s", "http://ex.org/p", "literal", "typed",
            "http://ex.org/dt", None) in rows
    assert ("iri", "http://ex.org/s", "http://ex.org/p", "literal", "tagged",
            None, "en-GB") in rows
    assert ("iri", "http://ex.org/s", "http://foo.org#q", "iri",
            "http://base.org/rel/iri", None, None) in rows
    assert len(rows) == 5


def test_parse_numeric_boolean_shorthand():
    doc = '@prefix ex: <http://e/> . ex:s ex:i 42 ; ex:d 3.14 ; ex:e 1e3 ; ex:b true .'
    rows = {r[2].split("/")[-1]: r for r in parse_turtle(doc)}
    assert rows["i"][4:] == ("42", TM.XSD_INTEGER, None)
    assert rows["d"][4:] == ("3.14", TM.XSD_DECIMAL, None)
    assert rows["e"][4:] == ("1e3", TM.XSD + "double", None)
    assert rows["b"][4:] == ("true", TM.XSD_BOOLEAN, None)


def test_parse_bnodes_and_property_lists():
    doc = """@prefix ex: <http://e/> .
    _:x ex:p ex:o .
    ex:s ex:knows [ ex:name "Ann" ; ex:age 7 ] .
    """
    rows = parse_turtle(doc, scope="t")
    assert ("bnode", "_:x", "http://e/p", "iri", "http://e/o", None, None) in rows
    anon = [r for r in rows if r[2] == "http://e/knows"]
    assert len(anon) == 1 and anon[0][3] == "bnode"
    label = anon[0][4]
    inner = {(r[2], r[4]) for r in rows if r[1] == label and r[0] == "bnode"}
    assert ("http://e/name", "Ann") in inner and ("http://e/age", "7") in inner
    # deterministic skolem labels: same doc+scope -> same labels
    assert rows == parse_turtle(doc, scope="t")


def test_parse_collections():
    doc = '@prefix ex: <http://e/> . ex:s ex:list ("a" "b") . ex:t ex:list () .'
    rows = parse_turtle(doc, scope="c")
    firsts = [r for r in rows if r[2] == RDF + "first"]
    rests = [r for r in rows if r[2] == RDF + "rest"]
    assert {r[4] for r in firsts} == {"a", "b"}
    assert len(rests) == 2
    assert any(r[4] == RDF + "nil" for r in rests)
    empty = [r for r in rows if r[1] == "http://e/t"]
    assert empty[0][4] == RDF + "nil"


def test_parse_string_escapes_and_long_strings():
    doc = r'''@prefix ex: <http://e/> .
    ex:s ex:p "tab\there \"q\" A" ; ex:q """multi
line 'quote' ok""" .'''
    rows = {r[2].split("/")[-1]: r[4] for r in parse_turtle(doc)}
    assert rows["p"] == 'tab\there "q" A'
    assert rows["q"] == "multi\nline 'quote' ok"


def test_format_parse_roundtrip_pure():
    rows = [
        ("iri", TM.NS_ENTITY + "alan_turing", TM.RDFS_LABEL, "literal",
         "A. Turing", None, None),
        ("bnode", "_:abc1", TM.P_TURN_INDEX, "literal", "5", TM.XSD_INTEGER, None),
        ("bnode", "_:abc1", TM.P_ROLE, "literal", "user", None, None),
        ("iri", TM.NS_ENTITY + "x", TM.NS_VOCAB + "note", "literal",
         'esc "q" \t nl\n', None, None),
        ("iri", TM.NS_ENTITY + "x", TM.NS_VOCAB + "lang", "literal",
         "hi", None, "en"),
    ]
    doc = format_turtle(rows)
    assert "@prefix" in doc and ";" in doc
    back = parse_turtle(doc)
    assert set(back) == set(rows)


def test_read_turtle_distributed_equals_ntriples(spark, transcripts_df, tmp_path):
    """Cross-format: the same graph written as .ttl and .nt parses to
    the identical triple set (RiotEvalTest-style equality)."""
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples
    from jena_spark.sources.turtle import write_turtle

    triples = raw_triples(transcripts_df).select(*TM.TERM_COLS).limit(300)
    nt_path = str(tmp_path / "g.nt")
    ttl_path = str(tmp_path / "g.ttl")
    write_ntriples(triples, nt_path)
    write_turtle(triples, ttl_path)

    from_nt = {tuple(r) for r in
               read_ntriples(spark, nt_path).select(*TM.TERM_COLS).collect()}
    from_ttl = {tuple(r) for r in
                read_turtle(spark, ttl_path).select(*TM.TERM_COLS).collect()}
    assert from_ttl == from_nt
    assert len(from_ttl) == 300


def test_parse_trig_blocks():
    from jena_spark.sources.turtle import parse_trig

    doc = """@prefix ex: <http://e/> .
    ex:s0 ex:p "default" .
    GRAPH ex:g1 { ex:a ex:p ex:b . ex:c ex:p "v" }
    ex:g2 { ex:d ex:p 5 . }
    { ex:e ex:p "also-default" . }
    """
    rows = parse_trig(doc)
    by_graph = {}
    for r in rows:
        by_graph.setdefault(r[7], set()).add(r[:7])
    assert ("iri", "http://e/s0", "http://e/p", "literal", "default", None, None) in by_graph[None]
    assert ("iri", "http://e/e", "http://e/p", "literal", "also-default", None, None) in by_graph[None]
    assert len(by_graph["http://e/g1"]) == 2
    assert ("iri", "http://e/d", "http://e/p", "literal", "5",
            "http://www.w3.org/2001/XMLSchema#integer", None) in by_graph["http://e/g2"]


def test_format_parse_trig_roundtrip_pure():
    from jena_spark.sources.turtle import format_trig, parse_trig

    rows = [
        ("iri", TM.NS_ENTITY + "a", TM.RDFS_LABEL, "literal", "A", None, None, None),
        ("bnode", "_:t1", TM.P_ROLE, "literal", "user", None, None, TM.NS + "graph/g1"),
        ("bnode", "_:t2", TM.P_TURN_INDEX, "literal", "3", TM.XSD_INTEGER, None,
         TM.NS + "graph/g1"),
        ("iri", TM.NS_ENTITY + "b", TM.P_MENTIONS, "iri", TM.NS_ENTITY + "a",
         None, None, TM.NS + "graph/g2"),
    ]
    doc = format_trig(rows)
    back = parse_trig(doc)
    assert set(back) == set(rows)


def test_read_trig_distributed(spark, tmp_path):
    from jena_spark.sources.turtle import format_trig, read_trig

    rows = [
        ("iri", "http://e/a", "http://e/p", "literal", "x", None, None, None),
        ("iri", "http://e/b", "http://e/p", "iri", "http://e/c", None, None,
         "http://e/g"),
    ]
    p = str(tmp_path / "g.trig")
    with open(p, "w") as f:
        f.write(format_trig(rows))
    back = {tuple(r) for r in read_trig(spark, p)
            .select("s_kind", "s_val", "p_val", "o_kind", "o_val",
                    "o_datatype", "o_lang", "graph").collect()}
    assert back == set(rows)


def test_uchar_in_all_iri_positions(spark, tmp_path):
    """Review regression: UCHAR decodes in EVERY IRIREF position —
    predicate, datatype, @prefix and @base included — so one IRI has
    one spelling in the graph."""
    from jena_spark.sources.turtle import read_turtle

    p = str(tmp_path / "u.ttl")
    with open(p, "w") as f:
        f.write('@prefix ex: <http://e/caf\\u00E9#> .\n')
        f.write('@base <http://base/\\u00FC/> .\n')
        f.write('<http://e/caf\\u00E9> <http://e/caf\\u00E9> '
                '"x"^^<http://e/caf\\u00E9> .\n')
        f.write('ex:a <http://e/p> <rel> .\n')
    rows = {(r["s_val"], r["p_val"], r["o_kind"], r["o_val"], r["o_datatype"])
            for r in read_turtle(spark, p).collect()}
    assert ("http://e/café", "http://e/café", "literal", "x",
            "http://e/café") in rows
    assert ("http://e/café#a", "http://e/p", "iri", "http://base/ü/rel",
            None) in rows
