"""SPARQL Update string front-end tests (``UpdateFactory.create`` /
``UpdateEngineWorker`` parity on the documented profile)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark import terms as TM  # noqa: E402
from jena_spark.pipeline.sparql_update import update_sparql  # noqa: E402

EX = "http://e/"


@pytest.fixture()
def store(spark):
    rows = [
        ("iri", EX + "a", EX + "p", "literal", "1", TM.XSD_INTEGER, None, None),
        ("iri", EX + "a", EX + "q", "iri", EX + "b", None, None, None),
        ("iri", EX + "b", EX + "p", "literal", "2", TM.XSD_INTEGER, None, None),
        ("iri", EX + "g1s", EX + "p", "literal", "g1", None, None, EX + "g1"),
    ]
    return spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string, graph string",
    )


def quads(df):
    return {tuple(r) for r in df.collect()}


def test_insert_delete_data(store):
    out = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        INSERT DATA {{
          ex:c ex:p "3"^^<{TM.XSD_INTEGER}> .
          GRAPH ex:g2 {{ ex:d ex:p "in-g2" }}
        }} ;
        DELETE DATA {{ ex:a ex:q ex:b }}""")
    got = quads(out)
    assert ("iri", EX + "c", EX + "p", "literal", "3", TM.XSD_INTEGER,
            None, None) in got
    assert ("iri", EX + "d", EX + "p", "literal", "in-g2", None, None,
            EX + "g2") in got
    assert not any(r[2] == EX + "q" for r in got)
    assert len(got) == 5  # 4 - 1 deleted + 2 inserted

    # duplicate INSERT DATA is a no-op (set semantics)
    again = update_sparql(out, f"PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:p "
                               f'"3"^^<{TM.XSD_INTEGER}> }}')
    assert quads(again) == got


def test_insert_data_rejects_variables(store):
    with pytest.raises(ValueError, match="ground"):
        update_sparql(store, "INSERT DATA { ?x <http://e/p> 1 }")


def test_delete_where_pattern(store):
    out = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        DELETE WHERE {{ ?s ex:p ?o }}""")
    got = quads(out)
    # default-graph ex:p triples gone; named-graph row untouched
    assert {r[2] for r in got if r[7] is None} == {EX + "q"}
    assert ("iri", EX + "g1s", EX + "p", "literal", "g1", None, None,
            EX + "g1") in got

    out2 = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        DELETE WHERE {{ GRAPH ex:g1 {{ ?s ?p ?o }} }}""")
    assert all(r[7] != EX + "g1" for r in quads(out2))


def test_modify_delete_insert_where(store):
    """Rename predicate p -> p2 for integer-valued triples: bindings
    once, delete before insert."""
    out = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        DELETE {{ ?s ex:p ?o }}
        INSERT {{ ?s ex:p2 ?o }}
        WHERE {{ ?s ex:p ?o . FILTER(DATATYPE(?o) = <{TM.XSD_INTEGER}>) }}""")
    got = quads(out)
    assert ("iri", EX + "a", EX + "p2", "literal", "1", TM.XSD_INTEGER,
            None, None) in got
    assert ("iri", EX + "b", EX + "p2", "literal", "2", TM.XSD_INTEGER,
            None, None) in got
    assert not any(r[2] == EX + "p" and r[7] is None for r in got)
    # named-graph plain-literal row keeps its ex:p (filter excluded it)
    assert ("iri", EX + "g1s", EX + "p", "literal", "g1", None, None,
            EX + "g1") in got


def test_with_scopes_templates_and_where(store):
    out = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        WITH ex:g1 INSERT {{ ?s ex:seen "yes" }} WHERE {{ ?s ex:p ?o }}""")
    got = quads(out)
    assert ("iri", EX + "g1s", EX + "seen", "literal", "yes", None, None,
            EX + "g1") in got
    # default-graph subjects did NOT match (WHERE scoped to g1)
    assert not any(r[2] == EX + "seen" and r[1] == EX + "a" for r in got)


def test_clear_drop_and_graph_ops(store):
    assert quads(update_sparql(store, "CLEAR ALL")) == set()
    only_named = quads(update_sparql(store, "CLEAR DEFAULT"))
    assert {r[7] for r in only_named} == {EX + "g1"}
    only_default = quads(update_sparql(store, "CLEAR NAMED"))
    assert {r[7] for r in only_default} == {None}
    no_g1 = quads(update_sparql(store, f"DROP GRAPH <{EX}g1>"))
    assert all(r[7] != EX + "g1" for r in no_g1)

    moved = quads(update_sparql(store, f"MOVE DEFAULT TO GRAPH <{EX}dst>"))
    assert all(r[7] is not None for r in moved)
    assert sum(1 for r in moved if r[7] == EX + "dst") == 3

    copied = quads(update_sparql(store, f"COPY GRAPH <{EX}g1> TO GRAPH <{EX}c>"))
    assert sum(1 for r in copied if r[7] == EX + "c") == 1
    assert sum(1 for r in copied if r[7] == EX + "g1") == 1

    added = quads(update_sparql(store, f"ADD GRAPH <{EX}g1> TO DEFAULT"))
    assert ("iri", EX + "g1s", EX + "p", "literal", "g1", None, None,
            None) in added


def test_load_into_graph(spark, store, tmp_path):
    from jena_spark.sources.languages import write_rdf

    doc = spark.createDataFrame(
        [("iri", EX + "ld", EX + "p", "literal", "loaded", None, None)],
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string",
    )
    path = str(tmp_path / "doc.ttl")
    write_rdf(doc, path)
    out = update_sparql(store, f"LOAD <file://{path}> INTO GRAPH <{EX}ld>")
    assert ("iri", EX + "ld", EX + "p", "literal", "loaded", None, None,
            EX + "ld") in quads(out)


def test_out_of_profile(store):
    with pytest.raises(ValueError, match="USING needs an IRI"):
        update_sparql(store, f"""
            DELETE {{ ?s <{EX}p> ?o }} USING ?g
            WHERE {{ ?s <{EX}p> ?o }}""")
    with pytest.raises(ValueError, match="unknown operation"):
        update_sparql(store, "FROBNICATE ALL")


def test_insert_data_ground_quoted_triple(store):
    qt = TM.quote("iri", EX + "a", EX + "p", "literal", "1",
                  TM.XSD_INTEGER, None)
    out = update_sparql(store, f"""PREFIX ex: <{EX}>
        INSERT DATA {{
          << ex:a ex:p "1"^^<{TM.XSD_INTEGER}> >> ex:saidBy ex:alice .
        }}""")
    assert ("triple", qt, EX + "saidBy", "iri", EX + "alice",
            None, None, None) in quads(out)


def test_insert_data_rejects_quoted_pattern_with_vars(store):
    with pytest.raises(ValueError, match="ground"):
        update_sparql(store, f"""PREFIX ex: <{EX}>
            INSERT DATA {{ << ?s ex:p ?o >> ex:saidBy ex:alice . }}""")


def test_star_insert_template(store):
    # annotate every ex:p triple with its provenance — the SPARQL-star
    # INSERT template builds quoted terms from bindings
    out = update_sparql(store, f"""PREFIX ex: <{EX}>
        INSERT {{ << ?s ex:p ?o >> ex:src ex:etl . }}
        WHERE {{ ?s ex:p ?o }}""")
    got = quads(out)
    for s, o, dt in ((EX + "a", "1", TM.XSD_INTEGER),
                     (EX + "b", "2", TM.XSD_INTEGER)):
        qt = TM.quote("iri", s, EX + "p", "literal", o, dt, None)
        assert ("triple", qt, EX + "src", "iri", EX + "etl",
                None, None, None) in got


def test_star_delete_where_quoted_pattern(store):
    qt = TM.quote("iri", EX + "a", EX + "p", "literal", "1",
                  TM.XSD_INTEGER, None)
    seeded = update_sparql(store, f"""PREFIX ex: <{EX}>
        INSERT DATA {{
          << ex:a ex:p "1"^^<{TM.XSD_INTEGER}> >> ex:saidBy ex:alice .
        }}""")
    out = update_sparql(seeded, f"""PREFIX ex: <{EX}>
        DELETE WHERE {{ << ?s ex:p ?o >> ex:saidBy ?w . }}""")
    assert not any(r[0] == "triple" for r in quads(out))
    assert ("triple", qt, EX + "saidBy", "iri", EX + "alice",
            None, None, None) in quads(seeded)


def test_using_dataset_clauses(store):
    """USING / USING NAMED scope the WHERE evaluation only (SPARQL 1.1
    Update 3.1.3; ARQ UpdateModify usingDataset): templates still hit
    the full store, and WITH+USING together is a request error."""
    # USING <g1>: WHERE's default graph = g1's triples only, so the
    # default-graph p-triples (a,b) do NOT match; the rewrite fires
    # for g1s alone, and the INSERT lands in the default graph
    out = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        DELETE {{ ?s ex:p ?o }} INSERT {{ ?s ex:seen ?o }}
        USING ex:g1 WHERE {{ ?s ex:p ?o }}""")
    got = quads(out)
    # g1's quad is untouched (DELETE template is default-graph scoped)
    assert ("iri", EX + "g1s", EX + "p", "literal", "g1", None, None,
            EX + "g1") in got
    assert ("iri", EX + "g1s", EX + "seen", "literal", "g1", None, None,
            None) in got
    # default-graph p-triples survive: WHERE never saw them
    assert ("iri", EX + "a", EX + "p", "literal", "1", TM.XSD_INTEGER,
            None, None) in got
    assert not any(q[2] == EX + "seen" and q[1] != EX + "g1s" for q in got)

    # USING NAMED ex:g1: GRAPH ?g matches only g1; delete inside it
    out2 = update_sparql(store, f"""
        PREFIX ex: <{EX}>
        DELETE {{ GRAPH ?g {{ ?s ex:p ?o }} }}
        USING NAMED ex:g1
        WHERE {{ GRAPH ?g {{ ?s ex:p ?o }} }}""")
    got2 = quads(out2)
    assert not any(q[7] == EX + "g1" for q in got2)
    assert ("iri", EX + "a", EX + "p", "literal", "1", TM.XSD_INTEGER,
            None, None) in got2

    with pytest.raises(ValueError, match="mutually exclusive"):
        update_sparql(store, f"""
            PREFIX ex: <{EX}>
            WITH ex:g1 DELETE {{ ?s ?p ?o }} USING ex:g1
            WHERE {{ ?s ?p ?o }}""")
