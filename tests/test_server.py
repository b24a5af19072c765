"""Fuseki-lite SPARQL protocol endpoint (``pipeline/server.py`` —
``SPARQLQueryProcessor.java`` / ``SPARQL_Update.java`` analog): query
verbs over HTTP, update swap, and self-federation (this engine's own
SERVICE client against this engine's own server)."""

from __future__ import annotations

import json
import sys
import urllib.parse
import urllib.request
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.pipeline.server import FusekiLite  # noqa: E402
from jena_spark.queries.sparql import sparql_query  # noqa: E402

EX = "http://ex.org/"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        ("iri", EX + "alice", EX + "name", "literal", "alice", None, None),
        ("iri", EX + "bob", EX + "name", "literal", "bob", None, None),
        ("iri", EX + "alice", EX + "age", "literal", "30",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _get(url: str) -> tuple[int, str, str]:
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.headers.get("Content-Type", ""), \
                r.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        return e.code, "", e.read().decode("utf-8")


def _post(url: str, body: str, ct: str) -> tuple[int, str]:
    req = urllib.request.Request(url, data=body.encode("utf-8"),
                                 headers={"Content-Type": ct})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode("utf-8")


def test_select_get_and_post(data):
    with FusekiLite({"ds": data}) as base:
        q = f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }}"
        # GET ?query=
        st, ct, body = _get(f"{base}/ds/sparql?query="
                            + urllib.parse.quote(q))
        assert st == 200 and ct.startswith(
            "application/sparql-results+json")
        doc = json.loads(body)
        assert doc["head"]["vars"] == ["n"]
        got = {b["n"]["value"] for b in doc["results"]["bindings"]}
        assert got == {"alice", "bob"}
        # POST application/sparql-query
        st, body = _post(f"{base}/ds/sparql", q,
                         "application/sparql-query")
        assert st == 200 and json.loads(body)["results"]["bindings"]
        # POST form-urlencoded
        st, body = _post(f"{base}/ds/sparql",
                         "query=" + urllib.parse.quote(q),
                         "application/x-www-form-urlencoded")
        assert st == 200 and json.loads(body)["results"]["bindings"]


def test_ask_construct_and_errors(data):
    with FusekiLite({"ds": data}) as base:
        st, _, body = _get(f"{base}/ds/sparql?query=" + urllib.parse.quote(
            f"ASK {{ ?x <{EX}age> ?a }}"))
        assert st == 200 and json.loads(body)["boolean"] is True
        st, ct, body = _get(f"{base}/ds/sparql?query=" + urllib.parse.quote(
            f"CONSTRUCT {{ ?x <{EX}p> ?n }} WHERE {{ ?x <{EX}name> ?n }}"))
        assert st == 200 and ct.startswith("application/n-triples")
        lines = [ln for ln in body.splitlines() if ln]
        assert len(lines) == 2 and all(ln.endswith(" .") for ln in lines)
        # protocol errors
        assert _get(f"{base}/nope/sparql?query=ASK%20%7B%7D")[0] == 404
        assert _get(f"{base}/ds/sparql")[0] == 400  # missing ?query=
        assert _post(f"{base}/ds/sparql", "x", "text/plain")[0] == 415
        assert _post(f"{base}/ds/sparql", "NOT SPARQL(",
                     "application/sparql-query")[0] == 400


def test_update_swap(data):
    with FusekiLite({"ds": data}, enable_update=True) as base:
        upd = (f"INSERT DATA {{ <{EX}carol> <{EX}name> \"carol\" }}")
        st, _ = _post(f"{base}/ds/update", upd,
                      "application/sparql-update")
        assert st == 204
        st, _, body = _get(f"{base}/ds/sparql?query=" + urllib.parse.quote(
            f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }}"))
        got = {b["n"]["value"]
               for b in json.loads(body)["results"]["bindings"]}
        assert got == {"alice", "bob", "carol"}
    # disabled by default
    with FusekiLite({"ds": data}) as base:
        assert _post(f"{base}/ds/update", upd,
                     "application/sparql-update")[0] == 405


def test_self_federation(spark, data):
    """The engine's own SERVICE HTTP client joins against the engine's
    own protocol server — both halves of QueryIterService round-trip
    through real sockets."""
    local = spark.createDataFrame(
        [("iri", EX + "alice", EX + "likes", "iri", EX + "tea",
          None, None)], _SCHEMA)
    with FusekiLite({"ages": data}) as base:
        out = sparql_query(local, f"""
            PREFIX ex: <{EX}>
            SELECT ?thing ?a WHERE {{
              ?x ex:likes ?thing .
              SERVICE <{base}/ages/sparql> {{ ?x ex:age ?a }}
            }}""")
        assert [(r["thing"], r["a"]) for r in out.collect()] == [
            (EX + "tea", "30")]


def test_cli_fuseki(tmp_path, spark):
    """`python -m jena_spark fuseki` (fuseki-server analog): serve a
    ttl file on a fixed free port, query it over HTTP, exit cleanly."""
    import socket
    import threading
    import time

    from jena_spark.cli import main

    ttl = tmp_path / "d.ttl"
    ttl.write_text(f"<{EX}a> <{EX}name> \"ada\" .\n")
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    results = {}

    def probe():
        q = urllib.parse.quote(f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }}")
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                st, _, body = _get(
                    f"http://127.0.0.1:{port}/kb/sparql?query={q}")
                results["st"], results["body"] = st, body
                return
            except OSError:
                time.sleep(0.3)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    rc = main(["--cores", "2", "--shuffle-partitions", "2",
               "fuseki", "--data", str(ttl), "--name", "kb",
               "--port", str(port), "--exit-after-seconds", "8"])
    t.join(timeout=5)
    assert rc == 0 and results.get("st") == 200
    doc = json.loads(results["body"])
    assert [b["n"]["value"] for b in doc["results"]["bindings"]] == ["ada"]


def test_content_negotiation(data):
    """Accept-driven SELECT/ASK renderers (the reference's ConNeg over
    Fuseki's four result writers): CSV plain lexical values, TSV
    NT-style terms, XML results document, SRJ default."""
    with FusekiLite({"ds": data}) as base:
        q = f"SELECT ?x ?n WHERE {{ ?x <{EX}name> ?n }} ORDER BY ?n"

        def fetch(accept):
            req = urllib.request.Request(
                f"{base}/ds/sparql", data=q.encode("utf-8"),
                headers={"Content-Type": "application/sparql-query",
                         "Accept": accept})
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.headers.get("Content-Type", ""), \
                    r.read().decode("utf-8")

        ct, body = fetch("text/csv")
        assert ct.startswith("text/csv")
        lines = body.strip().splitlines()
        assert lines[0] == "x,n" and lines[1].endswith(",alice")

        ct, body = fetch("text/tab-separated-values")
        assert ct.startswith("text/tab-separated-values")
        lines = body.strip().splitlines()
        assert lines[0] == "?x\t?n"
        assert f"<{EX}alice>\t\"alice\"" in lines

        ct, body = fetch("application/sparql-results+xml")
        assert ct.startswith("application/sparql-results+xml")
        assert '<variable name="n"/>' in body
        assert "<literal>alice</literal>" in body
        assert body.rstrip().endswith("</sparql>")

        # unrecognized Accept falls back to SRJ
        ct, body = fetch("application/wat")
        assert ct.startswith("application/sparql-results+json")
        assert json.loads(body)["head"]["vars"] == ["x", "n"]

        # ASK as an XML boolean document
        req = urllib.request.Request(
            f"{base}/ds/sparql",
            data=f'ASK {{ ?x <{EX}name> "alice" }}'.encode(),
            headers={"Content-Type": "application/sparql-query",
                     "Accept": "application/sparql-results+xml"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert "<boolean>true</boolean>" in r.read().decode("utf-8")


def _delete(url: str) -> int:
    req = urllib.request.Request(url, method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_admin_protocol(data):
    """Administration area (``ActionPing`` / ``ActionServerStatus`` /
    ``ActionDatasets`` / ``ActionStats``): ping liveness, server and
    dataset descriptions (ServerConst key spellings), request counters
    incremented by real traffic, and mem-dataset lifecycle."""
    with FusekiLite({"ds": data}, enable_update=True) as base:
        # $/ping — plain text timestamp
        st, ct, body = _get(f"{base}/$/ping")
        assert st == 200 and ct.startswith("text/plain")
        assert body.strip()[:4].isdigit()  # ISO year

        # $/server — version/uptime + dataset array
        st, ct, body = _get(f"{base}/$/server")
        assert st == 200 and ct.startswith("application/json")
        srv = json.loads(body)
        assert {"version", "built", "startDateTime", "uptime",
                "datasets"} <= set(srv)
        assert srv["datasets"][0]["ds.name"] == "/ds"

        # $/datasets — JsonDescription shape, item + container
        st, _, body = _get(f"{base}/$/datasets")
        desc = json.loads(body)["datasets"][0]
        assert desc["ds.state"] is True
        svc_types = {s["srv.type"] for s in desc["ds.services"]}
        assert svc_types == {"query", "update", "gsp-rw"}
        st, _, body = _get(f"{base}/$/datasets/ds")
        assert st == 200 and json.loads(body)["ds.name"] == "/ds"
        assert _get(f"{base}/$/datasets/nope")[0] == 404

        # counters: one good query, one bad query
        q = urllib.parse.quote(f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }}")
        assert _get(f"{base}/ds/sparql?query=" + q)[0] == 200
        assert _get(f"{base}/ds/sparql?query=NOT(")[0] == 400
        st, _, body = _get(f"{base}/$/stats")
        stats = json.loads(body)["datasets"]["/ds"]
        assert stats["Requests"] == 2
        assert stats["RequestsGood"] == 1 and stats["RequestsBad"] == 1
        ep = stats["endpoints"]["sparql"]
        assert ep["operation"] == "query"
        assert ep["description"] == "SPARQL Query"
        assert ep["Requests"] == 2
        # item form
        st, _, body = _get(f"{base}/$/stats/ds")
        assert json.loads(body)["datasets"]["/ds"]["Requests"] == 2

        # dataset lifecycle: POST creates an empty mem dataset
        st, _ = _post(f"{base}/$/datasets?dbName=fresh&dbType=mem", "",
                      "application/x-www-form-urlencoded")
        assert st == 200
        st, _, body = _get(f"{base}/$/datasets/fresh")
        assert st == 200
        st, _, body = _get(
            f"{base}/fresh/sparql?query=" + urllib.parse.quote(
                "SELECT ?s WHERE { ?s ?p ?o }"))
        assert st == 200
        assert json.loads(body)["results"]["bindings"] == []
        # duplicate name -> 409
        assert _post(f"{base}/$/datasets?dbName=fresh", "",
                     "application/x-www-form-urlencoded")[0] == 409
        assert _delete(f"{base}/$/datasets/fresh") == 200
        assert _get(f"{base}/$/datasets/fresh")[0] == 404

        # unknown admin op
        assert _get(f"{base}/$/wat")[0] == 404

    # writes gated behind enable_update (admin-area security split)
    with FusekiLite({"ds": data}) as base:
        assert _post(f"{base}/$/datasets?dbName=x", "",
                     "application/x-www-form-urlencoded")[0] == 405
        st, _, body = _get(f"{base}/$/datasets")
        svc_types = {s["srv.type"]
                     for s in json.loads(body)["datasets"][0]["ds.services"]}
        assert svc_types == {"query", "gsp-r"}


# --- dataset access control (jena-fuseki-access analog) -----------------


@pytest.fixture(scope="module")
def quad_data(spark):
    """Default graph + two named graphs."""
    rows = [
        ("iri", EX + "d1", EX + "name", "literal", "dft", None, None, None),
        ("iri", EX + "a1", EX + "name", "literal", "in-g1", None, None,
         EX + "g1"),
        ("iri", EX + "a2", EX + "name", "literal", "also-g1", None, None,
         EX + "g1"),
        ("iri", EX + "b1", EX + "name", "literal", "in-g2", None, None,
         EX + "g2"),
    ]
    return spark.createDataFrame(rows, _SCHEMA + ", graph string")


def _select_names(base, user=None):
    # plain BGP = default graph only; the GRAPH branch covers the
    # named graphs, so together the query sees the whole visible view
    q = urllib.parse.quote(
        "SELECT ?o WHERE { { ?s <" + EX + "name> ?o } UNION "
        "{ GRAPH ?g { ?s <" + EX + "name> ?o } } }")
    url = f"{base}/ds/sparql?query={q}"
    if user:
        url += f"&user={user}"
    st, _, body = _get(url)
    assert st == 200
    return sorted(b["o"]["value"]
                  for b in json.loads(body)["results"]["bindings"])


def test_access_control_query_filtering(quad_data):
    from jena_spark.queries.permissions import (
        ALL_NAMED_GRAPHS, SecurityContextView, SecurityRegistry)

    reg = SecurityRegistry({
        "alice": SecurityContextView([EX + "g1"], default_graph=True),
        "bob": SecurityContextView([EX + "g2"]),
        "carol": SecurityContextView([ALL_NAMED_GRAPHS]),
    })
    with FusekiLite({"ds": quad_data}, enable_update=True,
                    access={"ds": reg}) as base:
        # alice: default graph + g1
        assert _select_names(base, "alice") == ["also-g1", "dft", "in-g1"]
        # bob: only g2
        assert _select_names(base, "bob") == ["in-g2"]
        # carol: all named graphs, no default
        assert _select_names(base, "carol") == [
            "also-g1", "in-g1", "in-g2"]
        # unknown / anonymous actor -> SecurityContext.NONE -> empty
        # view, 200 (SecurityRegistry.get)
        assert _select_names(base, "mallory") == []
        assert _select_names(base, None) == []

        # X-User header form (requestUserServlet analog)
        q = urllib.parse.quote(
            "SELECT ?o WHERE { GRAPH ?g { ?s <" + EX + "name> ?o } }")
        req = urllib.request.Request(f"{base}/ds/sparql?query={q}",
                                     headers={"X-User": "bob"})
        with urllib.request.urlopen(req, timeout=30) as r:
            got = json.loads(r.read().decode("utf-8"))
        assert [b["o"]["value"]
                for b in got["results"]["bindings"]] == ["in-g2"]

        # GSP GET is filtered the same way (AccessCtl_GSP_R); the GSP
        # query string only admits ?default/?graph, so the actor rides
        # the X-User header here
        def _gsp_as(user, graph):
            req = urllib.request.Request(
                f"{base}/ds/data?graph={graph}",
                headers={"X-User": user})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, r.read().decode("utf-8")
            except urllib.error.HTTPError as e:
                return e.code, e.read().decode("utf-8")

        st, body = _gsp_as("bob", EX + "g2")
        assert st == 200 and "in-g2" in body
        # bob cannot see g1: the filtered view has no such graph -> 404
        assert _gsp_as("bob", EX + "g1")[0] == 404

        # every write verb is rejected on a controlled dataset even
        # with enable_update=True (AccessCtl_DenyUpdate -> 400)
        st, _ = _post(f"{base}/ds/update",
                      "INSERT DATA { <urn:x> <urn:p> 1 }",
                      "application/sparql-update")
        assert st == 400
        req = urllib.request.Request(
            f"{base}/ds/data?default",
            data=b"<urn:x> <urn:p> \"v\" .\n",
            headers={"Content-Type": "application/n-triples"},
            method="PUT")
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                st = r.status
        except urllib.error.HTTPError as e:
            st = e.code
        assert st == 400
        assert _delete(f"{base}/ds/data?default") == 400

        # services listing shows the dataset as read-only
        st, _, body = _get(f"{base}/$/datasets/ds")
        svc_types = {s["srv.type"]
                     for s in json.loads(body)["ds.services"]}
        assert svc_types == {"query", "gsp-r"}


def test_access_control_remote_connection(spark, quad_data):
    from jena_spark.pipeline.remote import RemoteConnection
    from jena_spark.queries.permissions import (
        SecurityContextView, SecurityRegistry)

    reg = SecurityRegistry({
        "alice": SecurityContextView([EX + "g1"], default_graph=True)})
    with FusekiLite({"ds": quad_data}, access={"ds": reg}) as base:
        got = RemoteConnection(spark, f"{base}/ds", user="alice") \
            .query_select(
                "SELECT ?o WHERE { { ?s <" + EX + "name> ?o } UNION "
                "{ GRAPH ?g { ?s <" + EX + "name> ?o } } }")
        assert sorted(r["o"] for r in got.collect()) == [
            "also-g1", "dft", "in-g1"]
        got = RemoteConnection(spark, f"{base}/ds", user="nobody") \
            .query_select(
                "SELECT ?o WHERE { { ?s ?p ?o } UNION "
                "{ GRAPH ?g { ?s ?p ?o } } }")
        assert got.count() == 0


def test_secured_dataset_frame_triples_only(spark, data):
    """A triple-only frame IS the default graph: all-or-nothing."""
    from jena_spark.queries.permissions import (
        CTX_ALL, CTX_NONE, SecurityContextView, secured_dataset_frame)

    assert secured_dataset_frame(data, CTX_ALL).count() == data.count()
    assert secured_dataset_frame(data, CTX_NONE).count() == 0
    only_named = SecurityContextView([EX + "g1"])
    assert secured_dataset_frame(data, only_named).count() == 0
