"""DB-API 2.0 (PEP 249) surface tests — the jena-jdbc analog
(``jena-jdbc/jena-jdbc-core/.../jdbc/statements/JenaStatement.java``,
``JenaPreparedStatement.java``, ``connections/JenaConnection.java``)."""

from __future__ import annotations

import pytest

from jena_spark import terms as TM
from jena_spark.pipeline import dbapi

EX = "http://ex.org/"

TERM_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, "
    "o_val string, o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def conn(spark):
    rows = [
        ("iri", EX + "alice", EX + "name", "literal", "alice", None, None),
        ("iri", EX + "alice", EX + "age", "literal", "30", TM.XSD_INTEGER, None),
        ("iri", EX + "bob", EX + "name", "literal", "bob", None, None),
        ("iri", EX + "bob", EX + "age", "literal", "25", TM.XSD_INTEGER, None),
        ("iri", EX + "alice", EX + "knows", "iri", EX + "bob", None, None),
    ]
    g = spark.createDataFrame(rows, TERM_SCHEMA)
    c = dbapi.connect(spark, g)
    yield c
    c.close()


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "qmark"
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)
    assert issubclass(dbapi.InterfaceError, dbapi.Error)


def test_select_fetch_and_description(conn):
    cur = conn.cursor()
    cur.execute(f"PREFIX ex: <{EX}> SELECT ?n ?a WHERE {{ "
                "?x ex:name ?n ; ex:age ?a . } ORDER BY ?n")
    assert [d[0] for d in cur.description] == ["n", "a"]
    assert cur.fetchone() == ("alice", "30")
    assert cur.fetchmany(10) == [("bob", "25")]
    assert cur.fetchone() is None
    cur.execute(f"PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?x ex:name ?n }} ORDER BY ?n")
    assert cur.fetchall() == [("alice",), ("bob",)]
    cur.execute(f"PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?x ex:name ?n }} ORDER BY ?n")
    assert list(cur) == [("alice",), ("bob",)]


def test_ask_and_construct_shapes(conn):
    cur = conn.cursor()
    cur.execute(f"ASK {{ <{EX}alice> <{EX}knows> <{EX}bob> }}")
    assert cur.fetchall() == [(True,)]
    # CONSTRUCT surfaces as a triple-column result set
    # (TripleResultsMetadata.java)
    cur.execute(f"CONSTRUCT {{ ?a <{EX}friendOf> ?b }} "
                f"WHERE {{ ?a <{EX}knows> ?b }}")
    cols = [d[0] for d in cur.description]
    assert cols == list(TM.TERM_COLS)
    (row,) = cur.fetchall()
    assert (row[1], row[2], row[4]) == (EX + "alice", EX + "friendOf", EX + "bob")


def test_parameter_rendering(conn):
    cur = conn.cursor()
    # string, int, IRI parameters; SPARQL ?vars are NOT placeholders
    cur.execute(
        f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x ex:name ? . ?x ex:age ?a . "
        "FILTER(?a > ?) }",
        ["alice", 20],
    )
    assert cur.fetchall() == [(EX + "alice",)]
    cur.execute("SELECT ?p WHERE { ? ?p ?o }", [dbapi.IRI(EX + "bob")])
    assert {r[0] for r in cur.fetchall()} == {EX + "name", EX + "age"}
    # typed literal parameter
    cur.execute(
        f"SELECT ?x WHERE {{ ?x <{EX}age> ? }}",
        [dbapi.TypedLiteral("25", TM.XSD_INTEGER)],
    )
    assert cur.fetchall() == [(EX + "bob",)]


def test_parameter_escaping_and_count_errors(conn):
    cur = conn.cursor()
    # quote/newline escaping survives the round trip into the string
    assert dbapi._render_param('a"b\nc') == '"a\\"b\\nc"'
    assert dbapi._render_param(True) == "true"
    assert dbapi._render_param(2.5) == "2.5"
    with pytest.raises(dbapi.DataError):
        dbapi._render_param(object())
    with pytest.raises(dbapi.ProgrammingError, match="parameters"):
        cur.execute("SELECT ?x WHERE { ?x ?p ? }", ["a", "b"])
    with pytest.raises(dbapi.ProgrammingError, match="parameters"):
        cur.execute("SELECT ?x WHERE { ?x ?p ? . ?x ?q ? }", ["a"])
    # a ? inside a quoted literal or IRI is NOT a placeholder
    cur.execute(f"SELECT ?x WHERE {{ ?x <{EX}name> \"who?\" }}")
    assert cur.fetchall() == []


def test_substitution_disambiguation():
    """The three SPARQL '?'/'<' ambiguities (JenaPreparedStatement's
    ParameterizedSparqlString has the same contract): a less-than
    operator is not an IRI opener; a path zero-or-one modifier directly
    attached to its operand is not a placeholder."""
    sub = dbapi._substitute
    assert sub("FILTER(?a < ?)", [30]) == "FILTER(?a < 30)"
    assert sub("FILTER(? < ?a)", [30]) == "FILTER(30 < ?a)"
    out = sub("{ ?x <http://e/p>? ?y . ?y <http://e/q> ? }", ["v"])
    assert out == '{ ?x <http://e/p>? ?y . ?y <http://e/q> "v" }'
    assert sub("{ ?x (ex:p)? ?y }", []) == "{ ?x (ex:p)? ?y }"
    assert sub("{ ?x ex:p? ?y }", []) == "{ ?x ex:p? ?y }"


def test_update_transactions(spark):
    g = spark.createDataFrame(
        [("iri", EX + "a", EX + "p", "iri", EX + "b", None, None)], TERM_SCHEMA)
    conn = dbapi.connect(spark, g, autocommit=False)
    cur = conn.cursor()
    cur.execute(f"INSERT DATA {{ <{EX}c> <{EX}p> <{EX}d> }}")
    assert cur.rowcount == 0  # SPARQL updates report no count
    cur.execute(f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }}")
    assert len(cur.fetchall()) == 2  # uncommitted change visible in-connection
    conn.rollback()
    cur.execute(f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }}")
    assert len(cur.fetchall()) == 1
    cur.execute(f"INSERT DATA {{ <{EX}c> <{EX}p> <{EX}d> }}")
    conn.commit()
    conn.rollback()  # no-op after commit
    cur.execute(f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }}")
    assert len(cur.fetchall()) == 2
    # DELETE WHERE through the same path
    cur.execute(f"DELETE WHERE {{ <{EX}c> <{EX}p> ?o }}")
    conn.commit()
    cur.execute(f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }}")
    assert len(cur.fetchall()) == 1
    conn.close()


def test_executemany_and_context_managers(spark):
    with dbapi.connect(spark) as conn:
        with conn.cursor() as cur:
            cur.executemany(
                f"INSERT DATA {{ <{EX}doc> <{EX}tag> ? }}",
                [["red"], ["green"], ["blue"]],
            )
            cur.execute(f"SELECT ?t WHERE {{ <{EX}doc> <{EX}tag> ?t }}")
            assert {r[0] for r in cur.fetchall()} == {"red", "green", "blue"}


def test_context_manager_rolls_back_on_error(spark):
    conn = dbapi.connect(spark, autocommit=False)
    with pytest.raises(RuntimeError):
        with conn as c:
            cur = c.cursor()
            cur.execute(f"INSERT DATA {{ <{EX}x> <{EX}p> 1 }}")
            raise RuntimeError("boom")
    # connection closed by the context manager; changes rolled back
    with pytest.raises(dbapi.InterfaceError):
        conn.cursor()


def test_closed_and_error_states(spark):
    conn = dbapi.connect(spark)
    cur = conn.cursor()
    with pytest.raises(dbapi.ProgrammingError, match="no result set"):
        cur.fetchall()
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELEKT ?x WHERE { ?x ?p ?o }")
    cur.close()
    with pytest.raises(dbapi.InterfaceError):
        cur.execute("SELECT ?x WHERE { ?x ?p ?o }")
    conn.close()
    with pytest.raises(dbapi.InterfaceError):
        conn.cursor()
    with pytest.raises(dbapi.InterfaceError):
        conn.commit()
