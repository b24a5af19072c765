"""Algebra SSE printer (arq.qparse --print=op analog): the printed
tree must reflect the same compilation rules the engine executes —
filter placement at group end, leftjoin for OPTIONAL, syntactic-order
joins, path/propfunc/table forms, query-level modifier nesting."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.queries.sse import query_to_sse  # noqa: E402


def flat(q: str) -> str:
    return query_to_sse(q, pretty=False)


def test_modifier_nesting_and_filter_placement():
    out = flat("""PREFIX v: <http://v/>
        SELECT DISTINCT ?s (COUNT(?o) AS ?n)
        WHERE { ?s v:p ?o . OPTIONAL { ?s v:q ?x } FILTER (?o > 3) }
        GROUP BY ?s HAVING (?n > 1) ORDER BY DESC(?n) LIMIT 5 OFFSET 2""")
    assert out == (
        "(slice 2 5 (distinct (project (?s ?n) (order ((desc ?n)) "
        "(filter (> ?n 1) (group (?s) ((?n (count ?o))) "
        "(filter (> ?o 3) (leftjoin (bgp (triple ?s <http://v/p> ?o)) "
        "(bgp (triple ?s <http://v/q> ?x))))))))))")


def test_union_path_bind_values_minus():
    out = flat("""SELECT ?a WHERE {
        { ?a <http://v/p> ?b } UNION { ?a <http://v/q>+ ?b }
        BIND (?b AS ?c)
        MINUS { ?a <http://v/r> ?b } }""")
    assert out == (
        "(project (?a) (minus (extend ((?c ?b)) "
        "(union (bgp (triple ?a <http://v/p> ?b)) "
        "(path ?a (path+ <http://v/q>) ?b))) "
        "(bgp (triple ?a <http://v/r> ?b))))")


def test_graph_service_exists_table():
    out = flat("""ASK { GRAPH <http://g/1> { ?s ?p ?o }
        FILTER NOT EXISTS { ?s <http://v/x> ?y }
        VALUES (?p) { (<http://v/p>) (UNDEF) } }""")
    assert "(graph <http://g/1> (bgp (triple ?s ?p ?o)))" in out
    assert "(filter (notexists (bgp (triple ?s <http://v/x> ?y)))" in out
    assert "(table (vars ?p) (row <http://v/p>) (row UNDEF))" in out


def test_terms_literals_and_propfunc():
    out = flat("""PREFIX spatial: <http://jena.apache.org/spatial#>
        SELECT ?s WHERE { ?s spatial:nearby (1.5 2.0 10) ;
                             <http://v/name> "J\\"o"@en . }""")
    assert ("(propfunc <http://jena.apache.org/spatial#nearby> ?s "
            "(1.5 2.0 10))") in out
    assert '"J\\"o"@en' in out
    # numeric literals print bare, lang literals tagged
    out2 = flat('SELECT ?s WHERE { ?s <http://v/p> 42 . '
                '?s <http://v/q> "x"^^<http://v/dt> }')
    assert "(triple ?s <http://v/p> 42)" in out2
    assert '(triple ?s <http://v/q> "x"^^<http://v/dt>)' in out2


def test_subselect_and_pretty():
    q = """SELECT ?s WHERE { { SELECT ?s WHERE { ?s ?p ?o } LIMIT 3 } }"""
    assert flat(q) == (
        "(project (?s) (slice _ 3 (project (?s) "
        "(bgp (triple ?s ?p ?o)))))")
    pretty = query_to_sse(q)
    assert pretty.startswith("(project")  # short trees stay inline
    long_pretty = query_to_sse("""PREFIX v: <http://v/>
        SELECT DISTINCT ?s (COUNT(?o) AS ?n)
        WHERE { ?s v:p ?o . OPTIONAL { ?s v:q ?x } FILTER (?o > 3) }
        GROUP BY ?s HAVING (?n > 1) ORDER BY DESC(?n) LIMIT 5""")
    assert "\n" in long_pretty  # multi-line layout for big trees
    # round-trips through the tokenizer: escaped quotes/backslashes and
    # parens inside IRIs never desynchronize the pretty printer
    tricky = query_to_sse(r'''SELECT ?s WHERE {
        ?s <http://v/f(1)> "end\\" . ?s <http://v/g> "a\"b" . }''')
    assert '<http://v/f(1)>' in tricky


def test_connection_explain(spark):
    """Connection.explain: SSE algebra, plus the Catalyst physical plan
    with physical=True (the ARQ explain-log analog)."""
    from jena_spark.pipeline.api import Connection

    t = spark.createDataFrame(
        [("iri", "http://v/a", "http://v/p", "literal", "1", None, None)],
        "s_kind string, s_val string, p_val string, o_kind string,"
        " o_val string, o_datatype string, o_lang string")
    conn = Connection(spark, t)
    sse = conn.explain("SELECT ?s WHERE { ?s <http://v/p> ?o }")
    assert sse.startswith("(project (?s)")
    both = conn.explain("SELECT ?s WHERE { ?s <http://v/p> ?o }",
                        physical=True)
    assert "Physical Plan" in both and both.startswith("(project")
    trees = conn.explain("SELECT ?s WHERE { ?s <http://v/p> ?o }",
                         join_trees=True)
    assert "--- join trees ---" in trees
    assert '["VAR_URI_VARᶲhttp://v/p"]' in trees
