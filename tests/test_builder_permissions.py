"""QueryBuilder fluent API (jena-querybuilder analog) and the
jena-permissions SecuredGraph: builder output must be byte-level legal
SPARQL for our own front-end and row-identical to the hand-written
string; secured views must hide exactly the filtered slice and deny
writes at both levels."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark import terms as TM  # noqa: E402
from jena_spark.queries import builder as B  # noqa: E402
from jena_spark.queries.permissions import (  # noqa: E402
    CREATE,
    DELETE,
    READ,
    PermissionDeniedError,
    PolicyEvaluator,
    SecuredGraph,
)
from jena_spark.queries.sparql import sparql_query  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def canonical_triples(spark, transcripts_df):
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples

    return canonicalize_triples(raw_triples(transcripts_df)).localCheckpoint()


# --- term coercion (Converters.makeNode analog) ------------------------------

def test_term_coercion():
    assert B.term("?x") == "?x"
    assert B.term("a") == "a"
    assert B.term("http://ex.org/p") == "<http://ex.org/p>"
    assert B.term(B.iri("urn:isbn:123")) == "<urn:isbn:123>"
    assert B.term("hello world") == '"hello world"'
    assert B.term('say "hi"\n') == '"say \\"hi\\"\\n"'
    assert B.term(42) == "42"
    assert B.term(1.5) == "1.5"
    assert B.term(True) == "true"
    assert B.term(B.literal("chat", lang="en")) == '"chat"@en'
    assert B.term(B.literal("5", datatype=TM.XSD_INTEGER)) == f'"5"^^<{TM.XSD_INTEGER}>'
    with pytest.raises(ValueError):
        B.literal("x", lang="en", datatype=TM.XSD_INTEGER)
    with pytest.raises(TypeError):
        B.term(object())


# --- builders vs hand-written strings ----------------------------------------

def test_select_builder_equals_string(spark, canonical_triples):
    q = (
        B.SelectBuilder()
        .add_var("doc").add_var("count(?ent)", as_var="n")
        .add_where("?doc", TM.P_MENTIONS, "?ent")
        .add_group_by("doc")
        .add_having("?n > 1")
        .add_order_by("n", "DESC")
        .set_limit(5)
    )
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?doc (count(?ent) AS ?n)
        WHERE {{ ?doc <{TM.P_MENTIONS}> ?ent }}
        GROUP BY ?doc HAVING (?n > 1)
        ORDER BY DESC(?n) LIMIT 5""")
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_optional_filter_bind_values(spark, canonical_triples):
    sub = B.WhereBuilder().add_where("?s", TM.P_TOOL, "?tool")
    q = (
        B.SelectBuilder()
        .add_var("s").add_var("role").add_var("tool").add_var("up")
        .add_where("?s", TM.P_ROLE, "?role")
        .add_optional(sub)
        .add_filter('?role != "tool"')
        .add_bind("ucase(?role)", "up")
        .add_values("role", ["user", "assistant"])
    )
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?s ?role ?tool ?up WHERE {{
          ?s <{TM.P_ROLE}> ?role .
          OPTIONAL {{ ?s <{TM.P_TOOL}> ?tool . }}
          FILTER (?role != "tool")
          BIND ((ucase(?role)) AS ?up)
          VALUES ?role {{ "user" "assistant" }}
        }}""")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_union_minus_builders(spark, canonical_triples):
    left = B.WhereBuilder().add_where("?s", TM.P_ROLE, "user")
    right = B.WhereBuilder().add_where("?s", TM.P_ROLE, "assistant")
    q = (
        B.SelectBuilder().add_var("s")
        .add_union(left, right)
        .add_minus((("?s"), TM.P_TOOL, "search"))
    )
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?s WHERE {{
          {{ ?s <{TM.P_ROLE}> "user" . }} UNION {{ ?s <{TM.P_ROLE}> "assistant" . }}
          MINUS {{ ?s <{TM.P_TOOL}> "search" . }}
        }}""")
    assert _rows(got) == _rows(want)


def test_ask_construct_describe_builders(spark, canonical_triples):
    ask = B.AskBuilder().add_where("?s", TM.P_MENTIONS, B.iri(TM.entity_iri("Apache Spark")))
    assert ask.execute(canonical_triples).collect()[0]["ask"] is True

    con = (
        B.ConstructBuilder()
        .add_construct("?ent", B.iri(TM.NS_VOCAB + "mentionedWith"), "?other")
        .add_where("?doc", TM.P_MENTIONS, "?ent")
        .add_where("?doc", TM.P_MENTIONS, "?other")
        .add_filter("?ent != ?other")
    )
    got = con.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        CONSTRUCT {{ ?ent <{TM.NS_VOCAB}mentionedWith> ?other }}
        WHERE {{ ?doc <{TM.P_MENTIONS}> ?ent . ?doc <{TM.P_MENTIONS}> ?other .
                 FILTER (?ent != ?other) }}""")
    assert _rows(got) == _rows(want) and got.count() > 0

    desc = B.DescribeBuilder().add_describe(B.iri(TM.entity_iri("Apache Spark")))
    assert desc.execute(canonical_triples).count() > 0


def test_subquery_builder(spark, canonical_triples):
    inner = (
        B.SelectBuilder().add_var("ent")
        .add_where("?d", TM.P_MENTIONS, "?ent")
        .add_var("count(?d)", as_var="nd")
        .add_group_by("ent").add_having("?nd > 2")
    )
    q = (
        B.SelectBuilder().add_var("ent").add_var("doc")
        .add_sub_query(inner)
        .add_where("?doc", TM.P_MENTIONS, "?ent")
    )
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?ent ?doc WHERE {{
          {{ SELECT ?ent (count(?d) AS ?nd) WHERE {{ ?d <{TM.P_MENTIONS}> ?ent }}
             GROUP BY ?ent HAVING (?nd > 2) }}
          ?doc <{TM.P_MENTIONS}> ?ent .
        }}""")
    assert _rows(got) == _rows(want) and got.count() > 0


def test_prose_with_colon_is_a_literal():
    """A colon alone must not promote prose to an IRI: 'note: call Bob'
    contains whitespace, which no IRI may."""
    assert B.term("note: call Bob") == '"note: call Bob"'
    assert B.term("TODO: fix parser") == '"TODO: fix parser"'
    assert B.term("mailto:bob@example.org") == "<mailto:bob@example.org>"


def test_multiple_having_renders_one_clause(spark, canonical_triples):
    q = (
        B.SelectBuilder()
        .add_var("doc").add_var("count(?ent)", as_var="n")
        .add_where("?doc", TM.P_MENTIONS, "?ent")
        .add_group_by("doc")
        .add_having("?n > 1").add_having("?n < 4")
    )
    assert q.build().count("HAVING") == 1
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?doc (count(?ent) AS ?n)
        WHERE {{ ?doc <{TM.P_MENTIONS}> ?ent }}
        GROUP BY ?doc HAVING ((?n > 1) && (?n < 4))""")
    assert _rows(got) == _rows(want) and got.count() > 0


def test_order_by_expression_passthrough(spark, canonical_triples):
    q = (
        B.SelectBuilder().add_var("s").add_var("role")
        .add_where("?s", TM.P_ROLE, "?role")
        .add_order_by("strlen(?role)", "DESC")
        .add_order_by("s")
        .set_limit(3)
    )
    assert "DESC(strlen(?role))" in q.build()
    got = q.execute(canonical_triples)
    want = sparql_query(canonical_triples, f"""
        SELECT ?s ?role WHERE {{ ?s <{TM.P_ROLE}> ?role }}
        ORDER BY DESC(strlen(?role)) ASC(?s) LIMIT 3""")
    assert _rows(got) == _rows(want)


def test_update_builder(spark, canonical_triples):
    from jena_spark.pipeline.sparql_update import update_sparql

    ex = "http://ex.org/"
    # INSERT DATA / DELETE DATA (ground)
    u = (
        B.UpdateBuilder()
        .add_insert(B.iri(ex + "d1"), B.iri(ex + "tag"), "new")
        .add_delete(B.iri(ex + "d1"), B.iri(ex + "tag"), "old")
    )
    want = update_sparql(canonical_triples, f"""
        DELETE DATA {{ <{ex}d1> <{ex}tag> "old" . }} ;
        INSERT DATA {{ <{ex}d1> <{ex}tag> "new" . }}""")
    got = u.execute(canonical_triples)
    assert _rows(got) == _rows(want)
    assert got.where(
        (F.col("s_val") == ex + "d1") & (F.col("o_val") == "new")).count() == 1

    # template form: retag every role triple
    u2 = (
        B.UpdateBuilder()
        .add_delete("?s", TM.P_ROLE, "?r")
        .add_insert("?s", B.iri(ex + "hadRole"), "?r")
        .add_where("?s", TM.P_ROLE, "?r")
    )
    got2 = u2.execute(canonical_triples)
    assert got2.where(F.col("p_val") == TM.P_ROLE).count() == 0
    assert got2.where(F.col("p_val") == ex + "hadRole").count() == \
        canonical_triples.where(F.col("p_val") == TM.P_ROLE).count()

    # DELETE WHERE
    u3 = B.UpdateBuilder().delete_where("?s", TM.P_TOOL, "?t")
    got3 = u3.execute(canonical_triples)
    assert got3.where(F.col("p_val") == TM.P_TOOL).count() == 0
    with pytest.raises(ValueError, match="cannot mix"):
        B.UpdateBuilder().delete_where("?s", "?p", "?o").add_insert(
            B.iri(ex + "x"), B.iri(ex + "y"), "z").build()
    with pytest.raises(ValueError, match="empty update"):
        B.UpdateBuilder().build()


# --- permissions --------------------------------------------------------------

@pytest.fixture()
def evaluator(spark):
    return PolicyEvaluator(
        grants={
            "admin": {CREATE, READ, "Update", DELETE},
            "analyst": {READ},
            "loader": {READ, CREATE},
        },
        filters={
            # analysts must not see raw message text
            ("analyst", READ): lambda: F.col("p_val") != TM.P_TEXT,
            # loaders may only create mention edges
            ("loader", CREATE): lambda: F.col("p_val") == TM.P_MENTIONS,
        },
    )


def test_secured_read_hides_slice(spark, canonical_triples, evaluator):
    admin = SecuredGraph(canonical_triples, evaluator, "admin")
    analyst = SecuredGraph(canonical_triples, evaluator, "analyst")
    total = admin.frame().count()
    visible = analyst.frame().count()
    hidden = canonical_triples.where(F.col("p_val") == TM.P_TEXT).count()
    assert total == canonical_triples.count()
    assert hidden > 0 and visible == total - hidden
    assert analyst.find(p=TM.P_TEXT).count() == 0
    assert admin.find(p=TM.P_TEXT).count() == hidden
    # the secured view flows through the SPARQL front-end too
    df = analyst.query(f"SELECT ?s ?o WHERE {{ ?s <{TM.P_TEXT}> ?o }}")
    assert df.count() == 0


def test_graph_level_denial(spark, canonical_triples, evaluator):
    nobody = SecuredGraph(canonical_triples, evaluator, "intruder")
    with pytest.raises(PermissionDeniedError, match="Read denied"):
        nobody.frame()
    analyst = SecuredGraph(canonical_triples, evaluator, "analyst")
    with pytest.raises(PermissionDeniedError, match="Create denied"):
        analyst.add(canonical_triples.limit(1))
    with pytest.raises(PermissionDeniedError, match="Delete denied"):
        analyst.delete_where(F.col("p_val") == TM.P_TEXT)


def test_triple_level_create_policy(spark, canonical_triples, evaluator):
    loader = SecuredGraph(canonical_triples, evaluator, "loader")
    mention = canonical_triples.where(F.col("p_val") == TM.P_MENTIONS).limit(1)
    text = canonical_triples.where(F.col("p_val") == TM.P_TEXT).limit(1)
    before = canonical_triples.count()
    # allowed: mention edges (already present -> dedup keeps count)
    assert loader.add(mention).count() == before
    with pytest.raises(PermissionDeniedError, match="Create denied for 1"):
        loader.add(text)


def test_admin_delete(spark, canonical_triples, evaluator):
    admin = SecuredGraph(canonical_triples, evaluator, "admin")
    out = admin.delete_where(F.col("p_val") == TM.P_TEXT)
    assert out.where(F.col("p_val") == TM.P_TEXT).count() == 0
    assert out.count() == canonical_triples.where(F.col("p_val") != TM.P_TEXT).count()
