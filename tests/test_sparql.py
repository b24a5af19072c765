"""SPARQL string front-end tests — parse + compile vs hand-built
algebra / DuckDB-style expectations (``ParserSPARQL11`` →
``AlgebraGenerator`` parity on the supported profile)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark import terms as TM  # noqa: E402
from jena_spark.queries.sparql import Parser, sparql_query  # noqa: E402

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def people(spark):
    rows = []
    data = {
        "alice": (30, "paris", ["bob", "carol"]),
        "bob": (25, "lyon", ["carol"]),
        "carol": (35, "paris", []),
        "dave": (28, None, ["alice"]),
    }
    for who, (age, city, knows) in data.items():
        s = EX + who
        rows.append(("iri", s, EX + "name", "literal", who, None, None))
        rows.append(("iri", s, EX + "age", "literal", str(age),
                     TM.XSD_INTEGER, None))
        if city:
            rows.append(("iri", s, EX + "city", "iri", EX + city, None, None))
        for k in knows:
            rows.append(("iri", s, EX + "knows", "iri", EX + k, None, None))
    return spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string",
    )


def rows(df, *names):
    return {tuple(r[n] for n in names) for r in df.collect()}


def test_select_bgp_filter(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?a WHERE {{
          ?x ex:name ?n ; ex:age ?a .
          FILTER(?a > 27 && ?n != "carol")
        }}""")
    assert rows(out, "n", "a") == {("alice", "30"), ("dave", "28")}


def test_select_star_and_distinct(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?c WHERE {{ ?x ex:city ?c }}""")
    assert rows(out, "c") == {(EX + "paris",), (EX + "lyon",)}


def test_optional_and_bound(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?c WHERE {{
          ?x ex:name ?n .
          OPTIONAL {{ ?x ex:city ?c }}
          FILTER(!BOUND(?c))
        }}""")
    assert rows(out, "n") == {("dave",)}


def test_union_minus_exists(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{
          {{ ?x ex:city <{EX}paris> }} UNION {{ ?x ex:city <{EX}lyon> }}
          MINUS {{ ?x ex:name "carol" }}
        }}""")
    assert rows(out, "x") == {(EX + "alice",), (EX + "bob",)}

    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?x ex:name ?n .
          FILTER NOT EXISTS {{ ?x ex:knows ?y }}
        }}""")
    assert rows(out2, "n") == {("carol",)}


def test_property_paths(people):
    # seq: knows/name ; plus-closure: knows+
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ <{EX}dave> ex:knows/ex:name ?n }}""")
    assert rows(out, "n") == {("alice",)}

    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?y WHERE {{ <{EX}dave> ex:knows+ ?y }}""")
    assert rows(out2, "y") == {(EX + "alice",), (EX + "bob",), (EX + "carol",)}

    # inverse
    out3 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}carol> ^ex:knows ?x }}""")
    assert rows(out3, "x") == {(EX + "alice",), (EX + "bob",)}

    # negated property set: everything but name/age/knows = city
    out4 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?o WHERE {{ <{EX}alice> !(ex:name|ex:age|ex:knows) ?o }}""")
    assert rows(out4, "o") == {(EX + "paris",)}


def test_aggregates_group_having_order(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?c (COUNT(?x) AS ?n) WHERE {{ ?x ex:city ?c }}
        GROUP BY ?c HAVING (?n > 1) ORDER BY DESC(?n)""")
    got = [(r["c"], r["n"]) for r in out.collect()]
    assert got == [(EX + "paris", 2)]

    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT (AVG(?a) AS ?avg_age) (MAX(?a) AS ?max_age)
        WHERE {{ ?x ex:age ?a }}""")
    r = out2.collect()[0]
    assert float(r["avg_age"]) == 29.5 and float(r["max_age"]) == 35


def test_bind_values_expr_projection(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?u WHERE {{
          ?x ex:name ?n .
          BIND(UCASE(?n) AS ?u)
          VALUES ?x {{ <{EX}alice> <{EX}bob> }}
        }}""")
    assert rows(out, "n", "u") == {("alice", "ALICE"), ("bob", "BOB")}

    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT (STRLEN(?n) AS ?len) WHERE {{ ?x ex:name ?n }} ORDER BY ?len""")
    assert [r["len"] for r in out2.collect()] == ["3", "4", "5", "5"]


def test_ask_construct_describe(people):
    assert sparql_query(people, f"""
        PREFIX ex: <{EX}> ASK {{ ?x ex:age "30"^^<{TM.XSD_INTEGER}> }}
    """).collect()[0]["ask"] is True
    assert sparql_query(people, f"""
        PREFIX ex: <{EX}> ASK {{ ?x ex:age "99"^^<{TM.XSD_INTEGER}> }}
    """).collect()[0]["ask"] is False

    built = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        CONSTRUCT {{ ?y ex:knownBy ?x }} WHERE {{ ?x ex:knows ?y }}""")
    got = {(r["s_val"], r["o_val"]) for r in built.collect()}
    assert (EX + "carol", EX + "alice") in got and len(got) == 4

    desc = sparql_query(people, f"PREFIX ex: <{EX}> DESCRIBE <{EX}carol>")
    # carol as subject (name, age, city) + as object (knows: alice, bob)
    assert desc.count() == 5


def test_slice_offset_and_term_equality(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ ?x ex:name ?n }} ORDER BY ?n LIMIT 2 OFFSET 1""")
    assert [r["n"] for r in out.collect()] == ["bob", "carol"]

    # term equality: typed literal must not equal its plain twin
    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ ?x ex:age ?a . FILTER(?a = "30") }}""")
    assert out2.count() == 0  # "30" plain != "30"^^xsd:integer (term eq)
    out3 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ ?x ex:age ?a . FILTER(?a = 30) }}""")
    assert rows(out3, "x") == {(EX + "alice",)}


def test_errors_out_of_profile(people):
    for bad in [
        f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ GRAPH ?g {{ ?x ?p ?o }} }}",
        "SELECT ?x WHERE { ?x unknown:p ?o }",
    ]:
        with pytest.raises(ValueError):
            sparql_query(people, bad).collect()
    # an unregistered http IRI is only out-of-profile when the real
    # SPARQL-protocol client is switched off (HTTP_ENABLED=False
    # restores the pure-registry posture); with it on, the engine
    # would genuinely dial the endpoint
    from jena_spark.queries import service as SVC

    old = SVC.HTTP_ENABLED
    SVC.HTTP_ENABLED = False
    try:
        with pytest.raises(ValueError):
            sparql_query(
                people,
                "SELECT ?x WHERE { SERVICE <http://remote/> { ?x ?p ?o } }",
            ).collect()
    finally:
        SVC.HTTP_ENABLED = old


def test_sparql_on_kg(spark, transcripts_df):
    """End-to-end over the constructed KG: the co-mention query written
    as a SPARQL string equals the hand-built algebra version."""
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.queries import algebra as A
    from jena_spark.queries.algebra import Var

    t = canonicalize_triples(raw_triples(transcripts_df)).select(*TM.TERM_COLS)
    got = sparql_query(t, f"""
        PREFIX v: <{TM.NS_VOCAB}>
        SELECT ?e1 ?e2 WHERE {{
          ?t v:mentions ?e1 .
          ?t v:mentions ?e2 .
          FILTER(STR(?e1) < STR(?e2))
        }}""")
    pats = [(Var("t"), TM.P_MENTIONS, Var("e1")),
            (Var("t"), TM.P_MENTIONS, Var("e2"))]
    want = A.flatten(
        A.filter_(A.bgp(t, pats), A.v("e1") < A.v("e2")).select("e1", "e2"),
        ["e1", "e2"],
    )
    assert rows(got, "e1", "e2") == rows(want, "e1", "e2")
    assert got.count() > 0


def test_graph_blocks_over_quads(spark, people):
    """GRAPH <iri> and GRAPH ?g over a quad frame; default-graph
    patterns see only the null-graph slice (dataset semantics)."""
    from pyspark.sql import functions as F

    quads = (
        people.withColumn(
            "graph",
            F.when(F.col("p_val") == EX + "knows", F.lit(EX + "social"))
            .when(F.col("p_val") == EX + "city", F.lit(EX + "geo")),
        )
    )
    # named graph by IRI
    out = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?x ?y WHERE {{ GRAPH ex:social {{ ?x ex:knows ?y }} }}""")
    assert out.count() == 4

    # graph variable binding
    out2 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?g WHERE {{ GRAPH ?g {{ ?s ?p ?o }} }}""")
    assert rows(out2, "g") == {(EX + "social",), (EX + "geo",)}

    # default graph excludes the named-graph triples
    out3 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?p WHERE {{ ?x ?p ?o }}""")
    assert rows(out3, "p") == {(EX + "name",), (EX + "age",)}

    # join across default graph and a GRAPH ?g block
    out4 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?g ?y WHERE {{
          ?x ex:name ?n .
          GRAPH ?g {{ ?x ex:knows ?y }}
        }}""")
    got = rows(out4, "n", "g")
    assert got == {("alice", EX + "social"), ("bob", EX + "social"),
                   ("dave", EX + "social")}


def test_subselect(people):
    """Sub-SELECT: aggregate in an inner scope joined to the outer
    group (the top-k-join idiom), whole-term join semantics."""
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?cnt WHERE {{
          ?x ex:name ?n .
          {{ SELECT ?x (COUNT(?y) AS ?cnt) WHERE {{ ?x ex:knows ?y }}
             GROUP BY ?x }}
        }}""")
    assert rows(out, "n", "cnt") == {("alice", "2"), ("bob", "1"), ("dave", "1")}

    # outer value-space filter over the inner aggregate
    out2 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?x ex:name ?n .
          {{ SELECT ?x (COUNT(?y) AS ?cnt) WHERE {{ ?x ex:knows ?y }}
             GROUP BY ?x }}
          FILTER(?cnt > 1)
        }}""")
    assert rows(out2, "n") == {("alice",)}

    # inner DISTINCT + LIMIT sub-select without aggregates
    out3 = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?x ex:name ?n .
          {{ SELECT DISTINCT ?x WHERE {{ ?x ex:city <{EX}paris> }} }}
        }}""")
    assert rows(out3, "n") == {("alice",), ("carol",)}


def test_describe_var(people):
    """DESCRIBE ?x WHERE {...}: bound terms described via a distributed
    semi-join (no collect)."""
    desc = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        DESCRIBE ?x WHERE {{ ?x ex:city <{EX}lyon> }}""")
    # bob: subject of name/age/city/knows(carol) + object of alice's knows
    got = {(r["s_val"], r["p_val"], r["o_val"]) for r in desc.collect()}
    assert (EX + "bob", EX + "name", "bob") in got
    assert (EX + "alice", EX + "knows", EX + "bob") in got
    assert len(got) == 5


def test_from_and_from_named(spark, people):
    """FROM / FROM NAMED dataset clauses (SPARQL 13.2; ARQ
    DynamicDatasets): FROM graphs union into the default graph (with
    dedup — GraphUnionRead semantics), FROM NAMED restricts GRAPH
    matching, and each family absent leaves that side empty."""
    from pyspark.sql import functions as F

    quads = people.withColumn(
        "graph",
        F.when(F.col("p_val") == EX + "knows", F.lit(EX + "social"))
        .when(F.col("p_val") == EX + "city", F.lit(EX + "geo"))
        .when(F.col("p_val") == EX + "age", F.lit(EX + "demo")),
    )

    # FROM only: default graph = union of the listed graphs; GRAPH has
    # no named graphs to match
    out = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?p FROM ex:social FROM ex:geo WHERE {{ ?x ?p ?o }}""")
    assert rows(out, "p") == {(EX + "knows",), (EX + "city",)}
    empty = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?g FROM ex:social WHERE {{ GRAPH ?g {{ ?s ?p ?o }} }}""")
    assert empty.count() == 0

    # FROM NAMED only: default graph empty, GRAPH sees only the listed
    # graph
    out2 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?g ?p FROM NAMED ex:geo WHERE {{ GRAPH ?g {{ ?x ?p ?o }} }}""")
    assert rows(out2, "g", "p") == {(EX + "geo", EX + "city")}
    empty2 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?p FROM NAMED ex:geo WHERE {{ ?x ?p ?o }}""")
    assert empty2.count() == 0

    # both: join across the described default graph and named graphs
    out3 = sparql_query(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?y ?g FROM ex:social FROM NAMED ex:geo WHERE {{
          ?x ex:knows ?y .
          GRAPH ?g {{ ?x ex:city ?c }}
        }}""")
    # dave has no city, so his knows-edge to alice drops out
    assert rows(out3, "y", "g") == {
        (EX + "bob", EX + "geo"), (EX + "carol", EX + "geo"),
    }

    # FROM dedups across graphs (union, not bag-concat): same triple
    # asserted in two FROM graphs appears once
    dup = quads.unionByName(
        quads.where(F.col("p_val") == EX + "knows")
        .withColumn("graph", F.lit(EX + "social2"))
    )
    out4 = sparql_query(dup, f"""
        PREFIX ex: <{EX}>
        SELECT ?x ?y FROM ex:social FROM ex:social2
        WHERE {{ ?x ex:knows ?y }}""")
    assert out4.count() == 4

    # plain triple frame: loud error
    import pytest as _pt
    with _pt.raises(ValueError, match="quad frame"):
        sparql_query(people, "SELECT ?s FROM <http://e/g> WHERE { ?s ?p ?o }")


def test_construct_where_shorthand(spark, people):
    """CONSTRUCT WHERE { ... } (SPARQL 1.1 10.2.3): the template is the
    pattern; equivalent to the long form with both spelled out."""
    short = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        CONSTRUCT WHERE {{ ?x ex:knows ?y }}""")
    long_ = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        CONSTRUCT {{ ?x ex:knows ?y }} WHERE {{ ?x ex:knows ?y }}""")
    assert {tuple(r) for r in short.collect()} == {tuple(r) for r in long_.collect()}
    assert short.count() == 4

    import pytest as _pt
    with _pt.raises(ValueError, match="CONSTRUCT WHERE"):
        sparql_query(people, f"""
            PREFIX ex: <{EX}>
            CONSTRUCT WHERE {{ ?x ex:knows+ ?y }}""")


def test_aggregate_distinct_variants(people):
    out = sparql_query(people, f"""
        PREFIX ex: <{EX}>
        SELECT (COUNT(DISTINCT ?c) AS ?nc) (SUM(DISTINCT ?a) AS ?sa)
               (GROUP_CONCAT(DISTINCT ?c; SEPARATOR=",") AS ?cs)
        WHERE {{ ?x ex:age ?a . OPTIONAL {{ ?x ex:city ?c }} }}""")
    r = out.collect()[0]
    assert str(r["nc"]) == "2"                   # paris, lyon
    assert float(r["sa"]) == 118.0               # 30+25+35+28, all distinct
    assert r["cs"] == f"{EX}lyon,{EX}paris"      # sorted distinct concat


def test_avg_distinct_raises(people):
    import pytest as _pt
    with _pt.raises(ValueError, match="AVG.DISTINCT"):
        sparql_query(people, f"""
            PREFIX ex: <{EX}>
            SELECT (AVG(DISTINCT ?a) AS ?m) WHERE {{ ?x ex:age ?a }}""")


def test_signed_numeric_literal_in_additive_expr(people):
    """Grammar rule [116]: the lexer eats the sign into the numeric
    token, so ``?age+2`` / ``?age-5`` / ``1+2*3`` must still parse as
    additive expressions (ARQ's AdditiveExpression special-cases
    NumericLiteralPositive/Negative the same way)."""
    out = sparql_query(
        people,
        "SELECT ?n WHERE { ?s <http://ex.org/age> ?age . "
        "BIND(?age+2 AS ?n) FILTER(?age = 30) }",
    ).collect()
    assert [r["n"].rstrip("0").rstrip(".") for r in out] == ["32"]
    # signed literal followed by the grammar's ('*' Unary)* tail
    out = sparql_query(
        people,
        "SELECT ?n WHERE { ?s <http://ex.org/age> ?age . "
        "BIND(?age+2*3 AS ?n) FILTER(?age = 30) }",
    ).collect()
    assert [r["n"].rstrip("0").rstrip(".") for r in out] == ["36"]


def test_division_by_zero_is_expression_error(people):
    """E_Divide: x/0 is a SPARQL expression ERROR (row filtered /
    unbound), not a query abort — Spark 4 ANSI `/` would throw
    DIVIDE_BY_ZERO mid-query without the try_divide mapping."""
    out = sparql_query(
        people,
        "SELECT ?s WHERE { ?s <http://ex.org/age> ?age . "
        "FILTER(1/(?age - 30) > 0) }",
    ).collect()
    # alice (age 30) divides by zero -> error -> filtered, not thrown;
    # ages > 30 (carol, 35) pass, ages < 30 give negative
    assert [r["s"] for r in out] == ["http://ex.org/carol"]
