"""Graph Store Protocol + RDFConnectionRemote analog.

Server side: ``pipeline/server.py``'s ``/<ds>/data`` service
(``jena-fuseki2/.../servlets/GSP_R.java`` / ``GSP_RW.java`` /
``GSP_Base.java`` semantics: ``?default`` / ``?graph=`` targets, no
query string = quads mode, missing named graph = 404). Client side:
``pipeline/remote.py`` (``RDFConnectionRemote.java``) and the SOH
``s-*`` CLI verbs (``apache-jena-fuseki/bin/soh``)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.pipeline.remote import (  # noqa: E402
    RemoteConnection,
    RemoteHTTPError,
)
from jena_spark.pipeline.server import FusekiLite  # noqa: E402

EX = "http://ex.org/"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _triples(spark, names):
    rows = [("iri", EX + n, EX + "name", "literal", n, None, None)
            for n in names]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def served(spark):
    srv = FusekiLite({"ds": _triples(spark, ["alice", "bob"])},
                     enable_update=True)
    base = srv.start()
    yield RemoteConnection(spark, base + "/ds"), srv
    srv.stop()


def test_gsp_fetch_put_post_delete(spark, served):
    conn, _ = served
    # GET ?default
    assert {r.o_val for r in conn.fetch().collect()} == {"alice", "bob"}
    # PUT a named graph, then GET it
    conn.put(_triples(spark, ["carol"]), graph=EX + "g1")
    assert {r.o_val for r in conn.fetch(EX + "g1").collect()} == {"carol"}
    # POST merges (set semantics: re-posting carol adds nothing)
    conn.load(_triples(spark, ["carol", "dave"]), graph=EX + "g1")
    assert {r.o_val for r in conn.fetch(EX + "g1").collect()} == \
        {"carol", "dave"}
    # the default graph is untouched by named-graph writes
    assert conn.fetch().count() == 2
    # DELETE the named graph -> fetch is 404 (GSP_R.java:111)
    conn.delete(EX + "g1")
    with pytest.raises(RemoteHTTPError) as e:
        conn.fetch(EX + "g1")
    assert e.value.status == 404
    # DELETE of a missing named graph is 404 (GSP_RW.java:101)
    with pytest.raises(RemoteHTTPError) as e:
        conn.delete(EX + "missing")
    assert e.value.status == 404
    # the default graph always exists: DELETE clears, GET stays 200
    conn.delete()
    assert conn.fetch().count() == 0


def test_gsp_quads_mode_and_replace(spark, served):
    conn, _ = served
    conn.put(_triples(spark, ["carol"]), graph=EX + "g1")
    # no ?default/?graph = whole-dataset quads operation (GSP_Base.isQuads)
    ds = conn.fetch_dataset()
    assert ds.count() == 3 and "graph" in ds.columns
    # PUT ?default replaces only the default graph
    conn.put(_triples(spark, ["zoe"]))
    assert {r.o_val for r in conn.fetch().collect()} == {"zoe"}
    assert conn.fetch(EX + "g1").count() == 1
    # dataset PUT replaces everything
    g = ds.limit(1)
    conn.put_dataset(g)
    assert conn.fetch_dataset().count() == 1
    # dataset DELETE empties it
    conn.delete_dataset()
    assert conn.fetch_dataset().count() == 0


def test_gsp_protocol_errors(spark, served):
    conn, srv = served
    import urllib.request

    base = conn.svc_gsp
    # both ?default and ?graph -> 400 (GSP_Base.validateGSP)
    with pytest.raises(RemoteHTTPError) as e:
        conn._http("GET", base + "?default&graph=" + EX)
    assert e.value.status == 400
    # unknown parameter -> 400
    with pytest.raises(RemoteHTTPError) as e:
        conn._http("GET", base + "?bogus=1")
    assert e.value.status == 400
    # write with an unsupported Content-Type -> 415
    with pytest.raises(RemoteHTTPError) as e:
        conn._http("PUT", base + "?default", b"x,y\n1,2",
                   ct="application/octet-stream")
    assert e.value.status == 415
    # reads stay open when updates are disabled; writes are 405
    ro = FusekiLite({"ds": _triples(spark, ["alice"])})
    ro_base = ro.start()
    try:
        ro_conn = RemoteConnection(spark, ro_base + "/ds")
        assert ro_conn.fetch().count() == 1
        with pytest.raises(RemoteHTTPError) as e:
            ro_conn.delete()
        assert e.value.status == 405
        with pytest.raises(RemoteHTTPError) as e:
            ro_conn.put(_triples(spark, ["x"]))
        assert e.value.status == 405
    finally:
        ro.stop()


def test_remote_connection_query_update(spark, served):
    conn, _ = served
    # SELECT over the wire == local evaluation shape
    out = conn.query(f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }} ORDER BY ?n")
    assert [r.n for r in out.collect()] == ["alice", "bob"]
    # ASK
    assert conn.query_ask(f'ASK {{ ?x <{EX}name> "alice" }}') is True
    # CONSTRUCT comes back as a triple frame through the NT reader
    g = conn.query_construct(
        f"CONSTRUCT {{ ?x <{EX}label> ?n }} WHERE {{ ?x <{EX}name> ?n }}")
    assert g.count() == 2 and set(g.columns) >= {"s_val", "p_val", "o_val"}
    assert {r.p_val for r in g.collect()} == {EX + "label"}
    # update round-trips through the protocol
    conn.update(f'INSERT DATA {{ <{EX}carol> <{EX}name> "carol" }}')
    assert conn.query_ask(f'ASK {{ <{EX}carol> ?p "carol" }}') is True


def test_remote_turtle_body(spark, served):
    """Non-NT request bodies go through the RDFLanguages dispatch."""
    conn, _ = served
    import urllib.request

    ttl = f'@prefix ex: <{EX}> . ex:eve ex:name "eve" .'
    conn._http("PUT", conn._graph_url(EX + "ttl"),
               ttl.encode("utf-8"), ct="text/turtle")
    assert {r.o_val for r in conn.fetch(EX + "ttl").collect()} == {"eve"}


def test_soh_cli(spark, tmp_path):
    srv = FusekiLite({"ds": _triples(spark, ["alice"])}, enable_update=True)
    base = srv.start()
    run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, "-m", "jena_spark", *a],
        capture_output=True, text=True, timeout=120)
    try:
        data = f"{base}/ds/data"
        r = run("s-get", data, "default")
        assert r.returncode == 0 and '"alice"' in r.stdout
        f = tmp_path / "g.nt"
        f.write_text(f'<{EX}carol> <{EX}name> "carol" .\n')
        assert run("s-put", data, EX + "g1", str(f)).returncode == 0
        r = run("s-get", data, EX + "g1")
        assert r.returncode == 0 and '"carol"' in r.stdout
        r = run("s-query", "--service", f"{base}/ds/sparql",
                f"SELECT ?n WHERE {{ ?x <{EX}name> ?n }}")
        assert r.returncode == 0 and '"alice"' in r.stdout
        assert run("s-update", "--service", f"{base}/ds/update",
                   f'INSERT DATA {{ <{EX}d> <{EX}name> "dan" }}'
                   ).returncode == 0
        assert run("s-head", data, EX + "g1").returncode == 0
        assert run("s-delete", data, EX + "g1").returncode == 0
        r = run("s-get", data, EX + "g1")
        assert r.returncode == 1 and "404" in r.stderr
        # s-head is the existence probe: 404 -> exit 1, no body
        r = run("s-head", data, EX + "g1")
        assert r.returncode == 1 and r.stdout == ""
        assert run("s-head", data, "default").returncode == 0
    finally:
        srv.stop()
