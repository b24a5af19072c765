"""SERVICE (federated query) tests — OpService over the registered
dataset registry (``OpExecutor.java:311``, ``QueryIterService.java:
36-55``, ``ServiceExecutorRegistry.java``): evaluation against the
endpoint's frame, compatible-binding join back, SILENT unit-table
semantics."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark import terms as TM  # noqa: E402
from jena_spark.queries.service import (  # noqa: E402
    register_service,
    unregister_service,
)
from jena_spark.queries.sparql import sparql_query  # noqa: E402

EX = "http://ex.org/"
EP = "http://ex.org/service/ages"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def local(spark):
    rows = [
        ("iri", EX + "alice", EX + "name", "literal", "alice", None, None),
        ("iri", EX + "bob", EX + "name", "literal", "bob", None, None),
        ("iri", EX + "carol", EX + "name", "literal", "carol", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture(scope="module")
def remote(spark):
    # a DISJOINT dataset held by the "endpoint" — ages exist only here
    rows = [
        ("iri", EX + "alice", EX + "age", "literal", "30",
         TM.XSD_INTEGER, None),
        ("iri", EX + "bob", EX + "age", "literal", "25",
         TM.XSD_INTEGER, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def rows(df, *names):
    return {tuple(r[n] for n in names) for r in df.collect()}


def test_service_join(local, remote):
    register_service(EP, remote)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n ?a WHERE {{
              ?x ex:name ?n .
              SERVICE <{EP}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n", "a") == {("alice", "30"), ("bob", "25")}
    finally:
        unregister_service(EP)


def test_service_only_group(local, remote):
    register_service(EP, remote)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?a WHERE {{ SERVICE <{EP}> {{ ?x ex:age ?a }} }}""")
        assert rows(out, "a") == {("30",), ("25",)}
    finally:
        unregister_service(EP)


def test_service_callable_endpoint(local, remote):
    # custom-executor form: a thunk resolved per use
    register_service(EP, lambda: remote)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n WHERE {{
              ?x ex:name ?n . SERVICE <{EP}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n") == {("alice",), ("bob",)}
    finally:
        unregister_service(EP)


def test_service_silent_unknown_is_unit(local):
    out = sparql_query(local, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?x ex:name ?n .
          SERVICE SILENT <http://nowhere.example/> {{ ?x ex:age ?a }}
        }}""")
    # unit table joined in: local bindings unchanged
    assert rows(out, "n") == {("alice",), ("bob",), ("carol",)}


def test_service_silent_only_group_is_unit_table(local):
    out = sparql_query(local, f"""
        SELECT ?a WHERE {{
          SERVICE SILENT <http://nowhere.example/> {{ ?x <{EX}age> ?a }}
        }}""", flat=False)
    # one solution with no bindings -> one row, ?a column absent/empty
    assert out.count() == 1


def test_service_unknown_raises(local):
    with pytest.raises(ValueError, match="no dataset registered"):
        sparql_query(local, f"""
            SELECT ?a WHERE {{
              SERVICE <http://nowhere.example/> {{ ?x <{EX}age> ?a }}
            }}""")


def test_service_var_endpoint_out_of_profile(local):
    with pytest.raises(ValueError, match="variable endpoint"):
        sparql_query(local, f"""
            SELECT ?a WHERE {{
              SERVICE ?ep {{ ?x <{EX}age> ?a }}
            }}""")


def test_service_silent_callable_failure_is_unit(local):
    def boom():
        raise RuntimeError("endpoint down")

    register_service(EP, boom)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n WHERE {{
              ?x ex:name ?n .
              SERVICE SILENT <{EP}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n") == {("alice",), ("bob",), ("carol",)}
        with pytest.raises(RuntimeError):
            sparql_query(local, f"""
                PREFIX ex: <{EX}>
                SELECT ?n WHERE {{
                  ?x ex:name ?n . SERVICE <{EP}> {{ ?x ex:age ?a }}
                }}""")
    finally:
        unregister_service(EP)


def test_service_silent_swallows_evaluation_failure(local, remote):
    # GRAPH inside a service whose frame has no graph column raises
    # during compilation — SILENT must yield the unit table instead
    register_service(EP, remote)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n WHERE {{
              ?x ex:name ?n .
              SERVICE SILENT <{EP}> {{ GRAPH ?g {{ ?x ex:age ?a }} }}
            }}""")
        assert rows(out, "n") == {("alice",), ("bob",), ("carol",)}
        with pytest.raises(ValueError, match="GRAPH needs a quad frame"):
            sparql_query(local, f"""
                PREFIX ex: <{EX}>
                SELECT ?n WHERE {{
                  ?x ex:name ?n .
                  SERVICE <{EP}> {{ GRAPH ?g {{ ?x ex:age ?a }} }}
                }}""")
    finally:
        unregister_service(EP)
