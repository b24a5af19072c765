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


def test_service_silent_unknown_is_unit(local, monkeypatch):
    # offline mode (HTTP_ENABLED False): unknown endpoint = registry
    # miss, never a network attempt
    import jena_spark.queries.service as SVC
    monkeypatch.setattr(SVC, "HTTP_ENABLED", False)
    out = sparql_query(local, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?x ex:name ?n .
          SERVICE SILENT <http://nowhere.example/> {{ ?x ex:age ?a }}
        }}""")
    # unit table joined in: local bindings unchanged
    assert rows(out, "n") == {("alice",), ("bob",), ("carol",)}


def test_service_silent_only_group_is_unit_table(local, monkeypatch):
    import jena_spark.queries.service as SVC
    monkeypatch.setattr(SVC, "HTTP_ENABLED", False)
    out = sparql_query(local, f"""
        SELECT ?a WHERE {{
          SERVICE SILENT <http://nowhere.example/> {{ ?x <{EX}age> ?a }}
        }}""", flat=False)
    # one solution with no bindings -> one row, ?a column absent/empty
    assert out.count() == 1


def test_service_unknown_raises(local, monkeypatch):
    import jena_spark.queries.service as SVC
    monkeypatch.setattr(SVC, "HTTP_ENABLED", False)
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


# --- real HTTP SPARQL-protocol client (QueryIterService.java:36-55) ---------

def _srj(vars_, bindings):
    return {"head": {"vars": vars_}, "results": {"bindings": bindings}}


def _spin_endpoint(respond):
    """A localhost SPARQL endpoint: `respond(query_text)` -> SRJ dict
    (raise to send a 500). Returns (base_url, received_queries, srv)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    received: list[str] = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            q = self.rfile.read(n).decode("utf-8")
            received.append(q)
            assert self.headers.get("Content-Type") == \
                "application/sparql-query"
            try:
                doc = respond(q)
            except Exception:  # noqa: BLE001
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps(doc).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/sparql-results+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}/sparql", received, srv


def test_http_service_join(local):
    """SERVICE <http://localhost…>: the group source text is forwarded
    with the prologue; SRJ bindings join the local pattern."""
    def respond(q):
        assert f"PREFIX ex: <{EX}>" in q
        assert "SELECT * WHERE" in q and "ex:age" in q
        return _srj(["x", "a"], [
            {"x": {"type": "uri", "value": EX + "alice"},
             "a": {"type": "literal", "value": "30",
                   "datatype": TM.XSD_INTEGER}},
            {"x": {"type": "uri", "value": EX + "bob"},
             "a": {"type": "literal", "value": "25",
                   "datatype": TM.XSD_INTEGER}},
        ])

    url, received, srv = _spin_endpoint(respond)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n ?a WHERE {{
              ?x ex:name ?n .
              SERVICE <{url}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n", "a") == {("alice", "30"), ("bob", "25")}
        assert len(received) == 1
    finally:
        srv.shutdown()


def test_http_service_silent_500_is_unit(local):
    def respond(q):
        raise RuntimeError("boom")

    url, received, srv = _spin_endpoint(respond)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n WHERE {{
              ?x ex:name ?n .
              SERVICE SILENT <{url}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n") == {("alice",), ("bob",), ("carol",)}
        # non-SILENT propagates the protocol error
        with pytest.raises(Exception):
            sparql_query(local, f"""
                SELECT ?n WHERE {{
                  SERVICE <{url}> {{ ?x <{EX}age> ?a }}
                }}""")
    finally:
        srv.shutdown()


def test_http_registered_frame_wins(local, remote):
    """A registered frame under an http IRI is the offline default —
    the network is never touched."""
    def respond(q):
        raise AssertionError("HTTP path must not be used")

    url, received, srv = _spin_endpoint(respond)
    register_service(url, remote)
    try:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?n ?a WHERE {{
              ?x ex:name ?n .
              SERVICE <{url}> {{ ?x ex:age ?a }}
            }}""")
        assert rows(out, "n", "a") == {("alice", "30"), ("bob", "25")}
        assert received == []
    finally:
        unregister_service(url)
        srv.shutdown()


def test_srj_bindings_frame_terms(spark):
    """SRJ term typing: uri/literal/typed-literal/bnode/lang, unbound
    -> NULL struct."""
    from jena_spark.queries.service import bindings_frame

    doc = _srj(["t"], [
        {"t": {"type": "uri", "value": EX + "x"}},
        {"t": {"type": "literal", "value": "hi", "xml:lang": "en"}},
        {"t": {"type": "typed-literal", "value": "5",
               "datatype": TM.XSD_INTEGER}},
        {"t": {"type": "bnode", "value": "b0"}},
        {},
    ])
    got = [tuple(r["t"]) if r["t"] is not None else None
           for r in bindings_frame(spark, doc).collect()]
    assert got == [
        ("iri", EX + "x", "", ""),
        ("literal", "hi", "", "en"),
        ("literal", "5", TM.XSD_INTEGER, ""),
        ("bnode", "b0", "", ""),
        None,
    ]
