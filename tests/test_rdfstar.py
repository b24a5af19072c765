"""RDF-star: quoted-triple terms, Turtle-star / N-Triples-star IO,
afn: triple-term functions, standard-reification bridge.

Reference: ``jena-core/.../graph/Node_Triple.java:27`` (term type),
``jena-arq/src/test/.../expr/TestTripleTermFunctions.java`` (afn:
function semantics), ``jena-core/.../rdf/model/impl/ReifierStd.java``
(reification completeness rule), RDF-star test suite
``jena-arq/testing`` (round-trip posture mirrors our write->read
equality checks)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.queries import rdfstar as RS

XSD_INT = TM.XSD_INTEGER

T_SIMPLE = ("iri", "http://e/s", "http://e/p", "literal", "plain", None, None)
T_ESCAPED = ("bnode", "_:b1", "http://e/p", "literal", 'say "hi"\n\tok\\', None, None)
T_TYPED = ("iri", "http://e/s", "http://e/n", "literal", "42", XSD_INT, None)
T_LANG = ("iri", "http://e/s", "http://e/l", "literal", "bonjour", None, "fr")
T_IRI_O = ("iri", "http://e/s", "http://e/q", "iri", "http://e/o", None, None)


def _lex(row):
    return TM.quote(*row)


# === pure layer ==============================================================

def test_quote_parse_roundtrip_pure():
    for row in (T_SIMPLE, T_ESCAPED, T_TYPED, T_LANG, T_IRI_O):
        lex = _lex(row)
        s, p, o = RS.parse_quoted(lex)
        assert (s[0], s[1]) == (row[0], row[1])
        assert p == row[2]
        assert o == (row[3], row[4], row[5], row[6])
        # re-quoting the parsed parts reproduces the lexical (canonical)
        assert TM.quote(s[0], s[1], p, *o) == lex


def test_nested_quote_parse():
    inner = _lex(T_ESCAPED)
    outer = TM.quote("triple", inner, "http://e/meta", "literal", "1", XSD_INT, None)
    deep = TM.quote("triple", outer, "http://e/meta2", "iri", "http://e/x", None, None)
    s, p, o = RS.parse_quoted(deep)
    assert s == ("triple", outer, None, None)
    s2, _, o2 = RS.parse_quoted(s[1])
    assert s2 == ("triple", inner, None, None)
    assert o2 == ("literal", "1", XSD_INT, None)


_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=20,
)


@st.composite
def _terms(draw, depth=0):
    kind = draw(st.sampled_from(
        ["iri", "bnode", "literal"] + (["triple"] if depth < 2 else [])))
    if kind == "iri":
        return ("iri", "http://e/" + draw(st.text("abcxyz09", max_size=8)), None, None)
    if kind == "bnode":
        return ("bnode", "_:" + draw(st.text("abcdef09", min_size=1, max_size=8)),
                None, None)
    if kind == "triple":
        s = draw(_terms(depth=depth + 1).filter(lambda t: t[0] != "literal"))
        o = draw(_terms(depth=depth + 1))
        p = "http://e/p" + draw(st.text("ab09", max_size=4))
        return ("triple", TM.quote(s[0], s[1], p, *o), None, None)
    variant = draw(st.integers(0, 2))
    lex = draw(_text)
    if variant == 1:
        return ("literal", lex, XSD_INT, None)
    if variant == 2:
        return ("literal", lex, None, "en-GB")
    return ("literal", lex, None, None)


@settings(max_examples=120, deadline=None)
@given(_terms().filter(lambda t: t[0] != "literal"), _terms())
def test_property_quote_parse_roundtrip(s, o):
    lex = TM.quote(s[0], s[1], "http://e/p", *o)
    ps, pp, po = RS.parse_quoted(lex)
    assert ps == s and pp == "http://e/p" and po == o


# === Column layer ============================================================

ROWS = [T_SIMPLE, T_ESCAPED, T_TYPED, T_LANG, T_IRI_O]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        ROWS, "s_kind string, s_val string, p_val string, o_kind string, "
        "o_val string, o_datatype string, o_lang string")


def test_quote_col_matches_pure(spark, triples):
    got = triples.select(RS.quoted_of_row().alias("lex")).collect()
    want = [_lex(r) for r in ROWS]
    assert sorted(r["lex"] for r in got) == sorted(want)


def test_unquote_cols_roundtrip(spark, triples):
    q = triples.select(RS.quoted_of_row().alias("lex"))
    s, p, o = RS.unquote_cols(F.col("lex"))
    got = q.select(s.alias("s"), p.alias("p"), o.alias("o")).collect()
    back = sorted(
        (r["s"]["kind"], r["s"]["val"], r["p"], r["o"]["kind"], r["o"]["val"],
         r["o"]["datatype"], r["o"]["lang"])
        for r in got
    )
    assert back == sorted(ROWS)


def test_unquote_cols_depth2_and_null_beyond(spark):
    inner = _lex(T_TYPED)
    outer = TM.quote("triple", inner, "http://e/m", "literal", "1", XSD_INT, None)
    deep = TM.quote("triple", outer, "http://e/m2", "iri", "http://e/x", None, None)
    df = spark.createDataFrame([(outer,), (deep,)], "lex string")
    s, p, _o = RS.unquote_cols(F.col("lex"))
    rows = {r["lex"]: r for r in df.select("lex", s.alias("s"), p.alias("p")).collect()}
    assert rows[outer]["s"]["kind"] == "triple"
    assert rows[outer]["s"]["val"] == inner
    # beyond MAX_REGEX_DEPTH the JVM path yields NULLs (documented)
    assert rows[deep]["p"] is None
    # ... and the deep path handles it
    got = RS.unquote_deep(df.where(F.col("lex") == deep), "lex").collect()[0]
    assert got["q_s_kind"] == "triple" and got["q_s_val"] == outer
    assert got["q_p_val"] == "http://e/m2"


def test_afn_triple_functions(spark, triples):
    from jena_spark.functions import scalar as SC

    t = triples.select(
        SC._term(F.col("s_kind"), F.col("s_val")).alias("s"),
        SC._term(F.lit("iri"), F.col("p_val")).alias("p"),
        SC._term(F.col("o_kind"), F.col("o_val"),
                 F.col("o_datatype"), F.col("o_lang")).alias("o"),
    ).select(SC.SPARQL_FUNCTIONS["triple"](
        F.col("s"), F.col("p"), F.col("o")).alias("qt"), "s", "p", "o")
    out = t.select(
        SC.SPARQL_FUNCTIONS["istriple"](F.col("qt")).alias("is_t"),
        SC.SPARQL_FUNCTIONS["subject"](F.col("qt")).alias("qs"),
        SC.SPARQL_FUNCTIONS["object"](F.col("qt")).alias("qo"),
        SC.SPARQL_FUNCTIONS["predicate"](F.col("qt")).alias("qp"),
        "s", "o", "p",
    ).collect()
    for r in out:
        assert r["is_t"] is True
        assert r["qs"] == r["s"]
        assert r["qo"] == r["o"]
        assert r["qp"] == r["p"]
    # literal subject -> NULL (ExprEvalException analog)
    bad = triples.select(SC.SPARQL_FUNCTIONS["triple"](
        SC._term(F.lit("literal"), F.lit("x")),
        SC._term(F.lit("iri"), F.lit("http://e/p")),
        SC._term(F.lit("iri"), F.lit("http://e/o")),
    ).alias("qt")).collect()
    assert all(r["qt"] is None for r in bad)


# === annotation ==============================================================

def test_annotate_and_query(spark, triples):
    ann = RS.annotate(triples, "http://e/conf", "literal",
                      F.lit("9"), XSD_INT)
    assert ann.count() == len(ROWS)
    got = ann.where(F.col("s_val") == _lex(T_SIMPLE)).collect()
    assert len(got) == 1
    assert got[0]["s_kind"] == "triple"
    assert got[0]["o_val"] == "9"


# === IO round-trips ==========================================================

def _star_graph(spark, triples):
    ann = RS.annotate(triples, "http://e/conf", "literal", F.lit("9"), XSD_INT)
    nested = RS.annotate(ann, "http://e/meta", "iri", F.lit("http://e/prov"))
    return triples.unionByName(ann).unionByName(nested)


def test_ntriples_star_roundtrip(spark, triples, tmp_path):
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples

    g = _star_graph(spark, triples)
    path = str(tmp_path / "star_nt")
    write_ntriples(g, path)
    back = read_ntriples(spark, path).select(*TM.TERM_COLS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, g.collect()))


def test_turtle_star_roundtrip(spark, triples, tmp_path):
    from jena_spark.sources.turtle import read_turtle, write_turtle

    g = _star_graph(spark, triples)
    path = str(tmp_path / "star_ttl")
    write_turtle(g, path)
    back = read_turtle(spark, path).select(*TM.TERM_COLS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, g.collect()))


def test_turtle_star_annotation_syntax():
    from jena_spark.sources.turtle import parse_turtle

    doc = """@prefix e: <http://e/> .
    e:s e:p "x" {| e:conf 9 ; e:src e:prov {| e:meta "m" |} |} , "y" .
    << e:s e:p "x" >> e:extra e:z .
    """
    rows = set(parse_turtle(doc))
    qt = TM.quote("iri", "http://e/s", "http://e/p", "literal", "x", None, None)
    assert ("iri", "http://e/s", "http://e/p", "literal", "x", None, None) in rows
    assert ("iri", "http://e/s", "http://e/p", "literal", "y", None, None) in rows
    assert ("triple", qt, "http://e/conf", "literal", "9", TM.XSD_INTEGER, None) in rows
    assert ("triple", qt, "http://e/src", "iri", "http://e/prov", None, None) in rows
    assert ("triple", qt, "http://e/extra", "iri", "http://e/z", None, None) in rows
    qt2 = TM.quote("triple", qt, "http://e/src", "iri", "http://e/prov", None, None)
    assert ("triple", qt2, "http://e/meta", "literal", "m", None, None) in rows


# === reification bridge ======================================================

def test_reification_roundtrip(spark, triples):
    g = _star_graph(spark, triples)
    reified = RS.to_reification(g)
    # no quoted terms remain
    assert reified.where(
        (F.col("s_kind") == "triple") | (F.col("o_kind") == "triple")).count() == 0
    # complete reification quads present (ReifierStd completeness rule)
    n_q = g.where(F.col("s_kind") == "triple").select("s_val").distinct().count()
    n_q2 = (
        g.where(F.col("s_kind") == "triple").select(F.col("s_val").alias("lex"))
        .unionByName(g.where(F.col("o_kind") == "triple")
                     .select(F.col("o_val").alias("lex")))
        .distinct().count()
    )
    assert n_q2 >= n_q
    stmt_types = reified.where(
        (F.col("p_val") == TM.RDF_TYPE) & (F.col("o_val") == RS.RDF_STATEMENT))
    assert stmt_types.count() == n_q2
    back = RS.from_reification(reified)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, g.select(*TM.TERM_COLS).collect()))


def test_from_reification_ignores_incomplete(spark):
    # missing rdf:object -> NOT a reified statement; rows pass through
    rows = [
        ("bnode", "_:st", TM.RDF_TYPE, "iri", RS.RDF_STATEMENT, None, None),
        ("bnode", "_:st", RS.RDF_SUBJECT, "iri", "http://e/s", None, None),
        ("bnode", "_:st", RS.RDF_PREDICATE, "iri", "http://e/p", None, None),
        ("iri", "http://e/a", "http://e/b", "bnode", "_:st", None, None),
    ]
    df = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string, "
        "o_val string, o_datatype string, o_lang string")
    back = RS.from_reification(df)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


# === SPARQL-star string front-end ===========================================

V = "http://v/"


@pytest.fixture(scope="module")
def star_sparql_df(spark):
    rows = [
        ("iri", "http://e/s1", V + "p", "iri", "http://e/o1", None, None),
        ("iri", "http://e/s2", V + "p", "literal", "42", XSD_INT, None),
    ]
    qt1 = TM.quote(*rows[0])
    qt2 = TM.quote(*rows[1])
    rows += [
        ("triple", qt1, V + "saidBy", "iri", "http://e/alice", None, None),
        ("triple", qt2, V + "saidBy", "iri", "http://e/bob", None, None),
        ("triple", qt2, V + "conf", "literal", "0.9", TM.XSD + "decimal", None),
    ]
    return spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string, "
        "o_val string, o_datatype string, o_lang string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sparql_star_quoted_pattern_vars(spark, star_sparql_df):
    from jena_spark.queries.sparql import sparql_query

    out = sparql_query(star_sparql_df, f"""PREFIX v: <{V}>
        SELECT ?s ?o ?who WHERE {{ << ?s v:p ?o >> v:saidBy ?who . }}""")
    assert _rows(out) == [
        ("http://e/s1", "http://e/o1", "http://e/alice"),
        ("http://e/s2", "42", "http://e/bob"),
    ]


def test_sparql_star_ground_quoted_term(spark, star_sparql_df):
    from jena_spark.queries.sparql import sparql_query

    out = sparql_query(star_sparql_df, f"""PREFIX v: <{V}>
        SELECT ?who WHERE {{
          << <http://e/s2> v:p "42"^^<{XSD_INT}> >> v:saidBy ?who . }}""")
    assert _rows(out) == [("http://e/bob",)]


def test_sparql_star_annotation_shorthand(spark, star_sparql_df):
    from jena_spark.queries.sparql import sparql_query

    # requires asserted AND annotated: both hold in the fixture graph
    out = sparql_query(star_sparql_df, f"""PREFIX v: <{V}>
        SELECT ?s ?who ?c WHERE {{
          ?s v:p ?o {{| v:saidBy ?who ; v:conf ?c |}} . }}""")
    assert _rows(out) == [("http://e/s2", "http://e/bob", "0.9")]


def test_sparql_star_functions(spark, star_sparql_df):
    from jena_spark.queries.sparql import sparql_query

    out = sparql_query(star_sparql_df, f"""PREFIX v: <{V}>
        SELECT ?subj ?pred ?obj WHERE {{
          ?t v:saidBy ?w . FILTER(isTRIPLE(?t))
          FILTER(?w = <http://e/bob>)
          BIND(SUBJECT(?t) AS ?subj) BIND(PREDICATE(?t) AS ?pred)
          BIND(OBJECT(?t) AS ?obj) }}""")
    assert _rows(out) == [("http://e/s2", V + "p", "42")]


def test_sparql_star_triple_constructor_join(spark, star_sparql_df):
    from jena_spark.queries.sparql import sparql_query

    # TRIPLE(...) builds the canonical lexical, so the constructed term
    # joins back against stored quoted terms
    out = sparql_query(star_sparql_df, f"""PREFIX v: <{V}>
        SELECT ?s ?w WHERE {{
          ?s v:p ?o . BIND(TRIPLE(?s, v:p, ?o) AS ?t) . ?t v:saidBy ?w . }}""")
    assert _rows(out) == [
        ("http://e/s1", "http://e/alice"),
        ("http://e/s2", "http://e/bob"),
    ]


def test_sparql_star_nested_pattern(spark):
    from jena_spark.queries.sparql import sparql_query

    base = ("iri", "http://e/s", V + "p", "iri", "http://e/o", None, None)
    q1 = TM.quote(*base)
    ann = ("triple", q1, V + "saidBy", "iri", "http://e/alice", None, None)
    q2 = TM.quote(*ann)
    meta = ("triple", q2, V + "certainty", "literal", "0.5", None, None)
    df = spark.createDataFrame(
        [base, ann, meta],
        "s_kind string, s_val string, p_val string, o_kind string, "
        "o_val string, o_datatype string, o_lang string")
    out = sparql_query(df, f"""PREFIX v: <{V}>
        SELECT ?s ?who ?c WHERE {{
          << << ?s v:p ?o >> v:saidBy ?who >> v:certainty ?c . }}""")
    assert _rows(out) == [("http://e/s", "http://e/alice", "0.5")]
