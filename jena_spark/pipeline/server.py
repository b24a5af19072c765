"""Fuseki-lite — a minimal SPARQL 1.1 Protocol endpoint over this
engine.

Reference: ``jena-fuseki2/jena-fuseki-core/.../servlets/
SPARQLQueryProcessor.java`` (query protocol: GET ``?query=`` and POST
as ``application/sparql-query`` or form-urlencoded) and
``SPARQL_Update.java`` (update protocol: POST
``application/sparql-update``), with Fuseki's per-dataset URL layout
(``/<dataset>/sparql`` query service, ``/<dataset>/update`` update
service — ``DataService.java``). The reference is a servlet stack on
Jetty; here a ``ThreadingHTTPServer`` fronts the engine:

* SELECT -> ``application/sparql-results+json`` (the engine's SRJ
  renderer, binding objects rendered JVM-side and STREAMED through
  ``toLocalIterator`` — the server thread never materializes the
  result set);
* ASK -> SRJ boolean document;
* CONSTRUCT / DESCRIBE -> ``application/n-triples`` (streamed the same
  way);
* UPDATE (opt-in ``enable_update=True``) -> the request body runs
  through :func:`jena_spark.pipeline.sparql_update.update_sparql` and
  the dataset's frame is REPLACED (Fuseki's transactional dataset swap
  analog; last write wins, one update at a time under a lock);
* Administration protocol under ``$/`` (``jena-fuseki2/
  jena-fuseki-core/.../ctl/ActionPing.java``, ``ActionStats.java``,
  ``jena-fuseki-webapp/.../mgt/ActionServerStatus.java``,
  ``ActionDatasets.java``): ``GET $/ping`` (plain-text liveness
  timestamp), ``GET $/server`` (version/uptime + dataset
  descriptions), ``GET $/datasets[/name]`` (``JsonDescription``'s
  ``ds.name``/``ds.state``/``ds.services`` shape), ``GET
  $/stats[/name]`` (per-dataset and per-endpoint
  Requests/RequestsGood/RequestsBad counters — ``CounterName.java``
  key spellings), plus dataset lifecycle ``POST $/datasets?dbName=``
  / ``DELETE $/datasets/name`` (writes gated behind
  ``enable_update``, the admin-area security split), and ``GET
  $/metrics`` (``ActionMetrics.java`` + ``PrometheusMetricsProvider``:
  the request counters as Prometheus text exposition, gauges named
  ``fuseki_requests[_good|_bad]`` tagged dataset/endpoint/operation/
  description per ``FusekiRequestsMetrics.bindTo``);
* Dataset access control (``jena-fuseki2/jena-fuseki-access``,
  ``DataAccessCtl.java`` / ``AccessCtl_SPARQL_QueryDataset.java``):
  pass ``access={name: SecurityRegistry}`` — those datasets are
  access-controlled: each read request resolves its actor
  (Basic-auth username / ``X-User`` header / ``?user=`` param — the
  ``requestUserServlet`` + ``paramUserServlet`` determinations) to a
  per-user visible-graph view (unknown user -> empty dataset, 200),
  and every write verb is rejected with 400
  (``AccessCtl_DenyUpdate``: controlled datasets are read-only);
* Graph Store Protocol on ``/<dataset>/data`` (``GSP_R.java`` /
  ``GSP_RW.java``): ``?default`` / ``?graph=<iri>`` select the target
  graph, no query string is the whole-dataset quads mode
  (``GSP_Base.isQuads``); GET serializes (N-Triples / N-Quads), PUT
  replaces, POST merges, DELETE drops — writes gated behind
  ``enable_update`` (the reference's GSP_R vs GSP_RW service split),
  request bodies parsed by Content-Type through the RDFLanguages
  dispatch.

Driver-side by design: the HTTP listener is protocol plumbing; every
query still executes distributed on the cluster. This is a test/dev
surface (the reference ships Fuseki for the same role) — a production
deployment would put the driver behind a real ASGI front, but the
protocol contract exercised here is the same one
:mod:`jena_spark.queries.service`'s HTTP client speaks, so the two
sides federate against each other (round-trip tested).
"""

from __future__ import annotations

import json
import threading
import time
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUERY_CT = "application/sparql-query"
UPDATE_CT = "application/sparql-update"
SRJ_CT = "application/sparql-results+json"
XML_RS_CT = "application/sparql-results+xml"
CSV_CT = "text/csv"
TSV_CT = "text/tab-separated-values"
NT_CT = "application/n-triples"
NQ_CT = "application/n-quads"

#: request-body Content-Type -> RDFLanguages name (GSP parse dispatch;
#: ``WebContent.java`` constants -> ``RDFLanguages`` in the reference).
_CT_LANG = {
    "application/n-triples": "ntriples",
    "text/plain": "ntriples",
    "application/n-quads": "nquads",
    "text/turtle": "turtle",
    "application/trig": "trig",
    "application/rdf+xml": "rdfxml",
    "application/ld+json": "jsonld",
    "application/rdf+thrift": "thrift",
    "application/trix+xml": "trix",
}

_TERM_COLS = ["s_kind", "s_val", "p_val", "o_kind", "o_val",
              "o_datatype", "o_lang"]


class FusekiLite:
    """``fuseki-server --mem /name`` analog over registered frames.

    ``datasets``: name -> triple/quad DataFrame. Each dataset serves
    ``/<name>/sparql`` (query) and, when ``enable_update``,
    ``/<name>/update``. ``start()`` binds an ephemeral port and
    returns the base URL; ``stop()`` shuts the listener down.
    """

    def __init__(self, datasets: dict[str, DataFrame],
                 enable_update: bool = False,
                 host: str = "127.0.0.1", port: int = 0,
                 access: dict[str, "object"] | None = None):
        self.datasets = dict(datasets)
        self.enable_update = enable_update
        #: dataset name -> SecurityRegistry (jena-fuseki-access:
        #: a dataset with an entry here is access-controlled —
        #: ``DataAccessCtl.isAccessControlled`` — reads are filtered
        #: per-user and every write verb is rejected,
        #: ``AccessCtl_DenyUpdate``).
        self.access = dict(access or {})
        self._host, self._port = host, port
        self._srv: ThreadingHTTPServer | None = None
        self._lock = threading.Lock()
        #: name -> endpoint -> [Requests, RequestsGood, RequestsBad]
        #: (``CounterName.java:43-49`` key spellings).
        self._counters: dict[str, dict[str, list[int]]] = {}
        self._started: float | None = None

    # --- engine calls ---------------------------------------------------

    def _dataset_view(self, name: str, user: str | None) -> DataFrame:
        """The request's dataset view (``DataAccessLib.decideDataset``):
        the raw frame for uncontrolled datasets, else the per-user
        graph-filtered view — unknown/anonymous users resolve to
        ``SecurityContext.NONE`` and see an empty dataset (200, not
        403, matching ``SecurityRegistry.get``)."""
        df = self.datasets[name]
        reg = self.access.get(name)
        if reg is None:
            return df
        from jena_spark.queries.permissions import secured_dataset_frame

        return secured_dataset_frame(df, reg.get(user))

    @staticmethod
    def _negotiate(accept: str) -> str:
        """First-match content negotiation over the Accept header (the
        reference runs full conneg via ``ConNeg.java``; the protocol
        contract exercised — one of Fuseki's four SELECT renderers by
        requested type — is the same). No recognized type -> SRJ."""
        for ct in (SRJ_CT, XML_RS_CT, CSV_CT, TSV_CT):
            if ct in (accept or ""):
                return ct
        return SRJ_CT

    def _run_query(self, name: str, query: str,
                   accept: str = "",
                   user: str | None = None) -> tuple[str, "object"]:
        """-> (content_type, line_iterator) — lines stream from the
        cluster; the envelope is O(#vars) driver-side."""
        from jena_spark.queries.sparql import Parser, sparql_query

        df = self._dataset_view(name, user)
        form = Parser(query).parse().form
        if form in ("construct", "describe"):
            from jena_spark.sources.ntriples import format_ntriples

            lines = format_ntriples(sparql_query(df, query))
            return NT_CT, (r[0] + "\n" for r in lines.toLocalIterator())
        out = sparql_query(df, query, flat=False)
        ct = self._negotiate(accept)
        if form == "ask":
            val = bool(out.collect()[0]["ask"])
            if ct == XML_RS_CT:
                doc = ('<?xml version="1.0"?>\n<sparql xmlns="http://www.'
                       'w3.org/2005/sparql-results#">\n<head/>\n'
                       f"<boolean>{str(val).lower()}</boolean>\n</sparql>\n")
                return XML_RS_CT, iter([doc])
            return SRJ_CT, iter([json.dumps({"head": {}, "boolean": val})])
        names = out.columns
        if ct == CSV_CT:
            # SPARQL results CSV: header of var names, plain lexical
            # values (CSVOutput.java), csv-quoted by the JVM renderer
            vals = [
                (F.col(n).getField("val") if d.startswith("struct")
                 else F.col(n).cast("string")).alias(n)
                for n, d in out.dtypes]
            rows = out.select(F.to_csv(F.struct(*vals)).alias("line"))

            def gen_csv():
                yield ",".join(names) + "\r\n"
                for r in rows.toLocalIterator():
                    yield r["line"] + "\r\n"

            return CSV_CT, gen_csv()
        if ct == TSV_CT:
            from jena_spark.sources.resultsets import tsv_cols

            rows = out.select(F.concat_ws(
                "\t", *tsv_cols(out)).alias("line"))

            def gen_tsv():
                yield "\t".join("?" + n for n in names) + "\n"
                for r in rows.toLocalIterator():
                    yield r["line"] + "\n"

            return TSV_CT, gen_tsv()
        if ct == XML_RS_CT:
            from jena_spark.sources.resultsets import _xml_head, to_xml_rows

            def gen_xml():
                yield _xml_head(names)
                for r in to_xml_rows(out).toLocalIterator():
                    yield r["xml"] + "\n"
                yield "</results>\n</sparql>\n"

            return XML_RS_CT, gen_xml()
        from jena_spark.sources.resultsets import _srj_binding_json

        def gen():
            yield '{ "head": { "vars": %s },' % json.dumps(names)
            yield ' "results": { "bindings": ['
            first = True
            for r in _srj_binding_json(out).toLocalIterator():
                yield (" " if first else ", ") + r["json"]
                first = False
            yield " ] } }"

        return SRJ_CT, gen()

    def _run_update(self, name: str, body: str) -> None:
        from jena_spark.pipeline.sparql_update import update_sparql

        with self._lock:  # one update at a time; frame swap is atomic
            self.datasets[name] = update_sparql(self.datasets[name], body)

    # --- Graph Store Protocol engine ops --------------------------------
    #
    # ``/<ds>/data`` is Fuseki's GSP service: ``?default`` or
    # ``?graph=<iri>`` selects the target graph; NO query string is the
    # "quads operation on the dataset" mode (``GSP_Base.isQuads``).
    # Verb mapping (``GSP_R.java`` read, ``GSP_RW.java`` write): GET
    # serializes the target, PUT replaces it, POST merges into it,
    # DELETE drops it; a missing NAMED graph is 404 for GET/DELETE
    # (``GSP_R.java:111``, ``GSP_RW.java:101``), the default graph
    # always exists.

    @staticmethod
    def _quads(df: DataFrame) -> DataFrame:
        if "graph" not in df.columns:
            df = df.select(*_TERM_COLS).withColumn(
                "graph", F.lit(None).cast("string"))
        return df.select(*_TERM_COLS, "graph")

    @staticmethod
    def _gsp_cond(mode: str, iri: str | None):
        return (F.col("graph").isNull() if mode == "default"
                else F.col("graph") == iri)

    @staticmethod
    def gsp_target(qs: str | None) -> tuple[str, str | None]:
        """``GSP_Base.validate`` analog: the request query string ->
        ``('default'|'graph'|'quads', target_iri)``; protocol errors
        raise ``ValueError`` (the servlet's 400 responses)."""
        if not qs:
            return "quads", None
        params = parse_qs(qs, keep_blank_values=True)
        has_d, has_g = "default" in params, "graph" in params
        if has_d and has_g:
            raise ValueError("Both ?default and ?graph in the request")
        if not has_d and not has_g:
            raise ValueError("Neither ?default nor ?graph in the request")
        for k, v in params.items():
            if k not in ("default", "graph"):
                raise ValueError(f"Unknown parameter {k!r}")
            if len(v) != 1:
                raise ValueError(f"Multiple parameters {k!r}")
        return ("default", None) if has_d else ("graph", params["graph"][0])

    def _parse_body(self, name: str, body: bytes, ct: str) -> DataFrame:
        """Request body -> triple/quad frame through the RDFLanguages
        dispatch (the reference streams the servlet body into a RIOT
        parser — ``GSP_RW.java`` via ``system/Upload.java``). The
        parsed frame is ``localCheckpoint``-ed (bounded: one HTTP
        body) so the temp file can be removed immediately."""
        lang = _CT_LANG.get(ct)
        if lang is None:
            raise ValueError(f"unsupported RDF Content-Type {ct!r}")
        from jena_spark.sources.languages import read_rdf_bytes

        return read_rdf_bytes(self.datasets[name].sparkSession, body, lang)

    def _gsp_get(self, name: str, mode: str, iri: str | None,
                 user: str | None = None):
        from jena_spark.sources.ntriples import format_ntriples

        q = self._quads(self._dataset_view(name, user))
        if mode == "quads":
            lines = format_ntriples(q, quads=True)
            return NQ_CT, (r[0] + "\n" for r in lines.toLocalIterator())
        tgt = q.where(self._gsp_cond(mode, iri))
        if mode == "graph" and not tgt.take(1):
            raise KeyError(f"No such graph: <{iri}>")
        lines = format_ntriples(tgt.select(*_TERM_COLS))
        return NT_CT, (r[0] + "\n" for r in lines.toLocalIterator())

    def _gsp_write(self, name: str, mode: str, iri: str | None,
                   body: bytes, ct: str, replace: bool) -> None:
        doc = self._parse_body(name, body, ct)
        with self._lock:
            q = self._quads(self.datasets[name])
            if mode == "quads":
                new = self._quads(doc)
                self.datasets[name] = (
                    new.distinct() if replace
                    else q.unionByName(new).distinct())
                return
            cond = self._gsp_cond(mode, iri)
            doc_t = doc.select(*_TERM_COLS).withColumn(
                "graph", F.lit(iri).cast("string"))
            keep = q.where(~F.coalesce(cond, F.lit(False)))
            merged = doc_t if replace else q.where(cond).unionByName(doc_t)
            self.datasets[name] = keep.unionByName(merged.distinct())

    def _gsp_delete(self, name: str, mode: str, iri: str | None) -> None:
        with self._lock:
            q = self._quads(self.datasets[name])
            if mode == "quads":
                self.datasets[name] = q.limit(0)
                return
            cond = self._gsp_cond(mode, iri)
            if mode == "graph" and not q.where(cond).take(1):
                raise KeyError(f"No such graph: <{iri}>")
            self.datasets[name] = q.where(~F.coalesce(cond, F.lit(False)))

    # --- administration protocol -----------------------------------------
    #
    # ``$/ping``, ``$/server``, ``$/datasets[/name]``, ``$/stats[/name]``
    # (``ActionPing.java`` / ``ActionServerStatus.java`` /
    # ``ActionDatasets.java`` / ``ActionStats.java``). JSON key names
    # follow ``ServerConst.java`` (``ds.name``/``ds.state``/
    # ``ds.services``/``srv.type``/``srv.description``/
    # ``srv.endpoints``) and ``ServerMgtConst.java``
    # (``version``/``built``/``startDateTime``/``uptime``).

    VERSION = "jena-spark-lite"

    def _count(self, name: str, endpoint: str, good: bool) -> None:
        with self._lock:
            c = self._counters.setdefault(name, {}).setdefault(
                endpoint, [0, 0, 0])
            c[0] += 1
            c[1 if good else 2] += 1

    def _services(self, name: str) -> list[tuple[str, str, str]]:
        """(operation json-name, description, endpoint) per
        ``Operation.java:85-89`` registrations."""
        svcs = [("query", "SPARQL Query", "sparql")]
        # access-controlled datasets only support read — query and GSP
        # GET (AccessCtl_DenyUpdate class javadoc) — whatever
        # enable_update says
        if self.enable_update and name not in self.access:
            svcs.append(("update", "SPARQL Update", "update"))
            svcs.append(("gsp-rw", "Graph Store Protocol", "data"))
        else:
            svcs.append(("gsp-r", "Graph Store Protocol (Read)", "data"))
        return svcs

    def describe_dataset(self, name: str) -> dict:
        """``JsonDescription.describe`` shape."""
        if name not in self.datasets:
            raise KeyError(name)
        return {
            "ds.name": "/" + name,
            "ds.state": True,
            "ds.services": [
                {"srv.type": op, "srv.description": desc,
                 "srv.endpoints": [ep]}
                for op, desc, ep in self._services(name)],
        }

    def admin_server(self) -> dict:
        started = self._started or time.time()
        return {
            "version": self.VERSION,
            "built": "Unknown",
            "startDateTime": datetime.fromtimestamp(
                started, tz=timezone.utc).isoformat(
                timespec="milliseconds"),
            "uptime": int(time.time() - started),
            "datasets": [self.describe_dataset(n)
                         for n in sorted(self.datasets)],
        }

    def admin_stats(self, name: str | None = None) -> dict:
        """``ActionStats.generateStats`` shape: dataset-level request
        counters plus per-endpoint counters tagged with the operation
        name/description."""
        names = [name] if name is not None else sorted(self.datasets)
        out: dict[str, dict] = {}
        for n in names:
            if n not in self.datasets:
                raise KeyError(n)
            eps = {}
            tot = [0, 0, 0]
            with self._lock:
                snap = {ep: list(c) for ep, c in
                        self._counters.get(n, {}).items()}
            for op, desc, ep in self._services(n):
                c = snap.get(ep, [0, 0, 0])
                tot = [a + b for a, b in zip(tot, c)]
                eps[ep] = {"Requests": c[0], "RequestsGood": c[1],
                           "RequestsBad": c[2], "operation": op,
                           "description": desc}
            out["/" + n] = {"Requests": tot[0], "RequestsGood": tot[1],
                            "RequestsBad": tot[2], "endpoints": eps}
        return {"datasets": out}

    #: Prometheus exposition families, in FusekiRequestsMetrics'
    #: counter order (``CounterName`` full names "requests"/
    #: "requests.good"/"requests.bad", dots sanitized the way
    #: micrometer's Prometheus naming convention does).
    _METRIC_FAMILIES = ("fuseki_requests", "fuseki_requests_good",
                        "fuseki_requests_bad")

    def admin_metrics(self) -> str:
        """``GET $/metrics`` body (``ActionMetrics.java`` +
        ``PrometheusMetricsProvider``/``FusekiRequestsMetrics.java``):
        one gauge sample per (dataset, endpoint) counter, tagged
        ``dataset``/``endpoint``/``operation``/``description`` exactly
        as ``FusekiRequestsMetrics.bindTo`` registers them; samples
        grouped under one ``# HELP``/``# TYPE`` header per family,
        values rendered as floats (micrometer gauges)."""
        samples: dict[str, list[str]] = {f: [] for f in
                                         self._METRIC_FAMILIES}
        for n in sorted(self.datasets):
            with self._lock:
                snap = {ep: list(c) for ep, c in
                        self._counters.get(n, {}).items()}
            for op, desc, ep in self._services(n):
                c = snap.get(ep, [0, 0, 0])
                tags = (f'dataset="/{n}",description="{desc}",'
                        f'endpoint="{ep}",operation="{op}",')
                for fam, val in zip(self._METRIC_FAMILIES, c):
                    samples[fam].append(
                        "%s{%s} %s" % (fam, tags.rstrip(","), float(val)))
        lines = []
        for fam in self._METRIC_FAMILIES:
            lines.append(f"# HELP {fam}  ")
            lines.append(f"# TYPE {fam} gauge")
            lines.extend(samples[fam])
        return "\n".join(lines) + "\n"

    def add_dataset(self, name: str) -> None:
        """``POST $/datasets?dbName=&dbType=mem`` analog: register an
        empty in-memory dataset (``ActionDatasets.execPostContainer``;
        only the mem flavor exists here — there is no TDB directory)."""
        if name in self.datasets:
            raise ValueError(f"dataset {name!r} already registered")
        spark = next(iter(self.datasets.values())).sparkSession \
            if self.datasets else None
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        empty = spark.createDataFrame(
            [], ", ".join(f"{c} string" for c in _TERM_COLS))
        with self._lock:
            self.datasets[name] = empty

    def remove_dataset(self, name: str) -> None:
        if name not in self.datasets:
            raise KeyError(name)
        with self._lock:
            del self.datasets[name]
            self._counters.pop(name, None)

    # --- HTTP listener ----------------------------------------------------

    def start(self) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 — quiet
                pass

            def _send(self, code: int, ct: str, chunks) -> None:
                body = "".join(chunks).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ct)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _error(self, code: int, msg: str) -> None:
                self._send(code, "text/plain; charset=utf-8", [msg])

            def _user(self) -> str | None:
                """Request actor (``DataAccessCtl.requestUserServlet``
                = the servlet's authenticated remote user; the
                ``paramUserServlet`` ``?user=`` variant is the
                reference's own test hook). Order: Basic-auth
                username, ``X-User`` header, ``?user=`` param."""
                auth = self.headers.get("Authorization") or ""
                if auth.startswith("Basic "):
                    import base64
                    try:
                        cred = base64.b64decode(auth[6:]).decode("utf-8")
                        return cred.split(":", 1)[0] or None
                    except Exception:  # noqa: BLE001 — malformed header
                        return None
                xu = self.headers.get("X-User")
                if xu:
                    return xu
                qs = parse_qs(urlparse(self.path).query)
                return (qs.get("user") or [None])[0]

            def _deny_write(self, name: str) -> bool:
                """AccessCtl_DenyUpdate: every write verb on an
                access-controlled dataset is rejected with 400
                (``ServletOps.errorBadRequest``), for every user."""
                if name in outer.access:
                    self._error(
                        400, "SPARQL update / GSP write : not supported")
                    return True
                return False

            def _route(self) -> tuple[str, str] | None:
                parts = urlparse(self.path)
                seg = [p for p in parts.path.split("/") if p]
                if len(seg) != 2 or seg[0] not in outer.datasets:
                    self._error(404, f"no such service {parts.path!r}")
                    return None
                return seg[0], seg[1]

            def _json(self, obj) -> None:
                self._send(200, "application/json; charset=utf-8",
                           [json.dumps(obj), "\n"])

            def _admin(self) -> bool:
                """Administration area (``$/…``); True if the path was
                an admin path (response already sent)."""
                parts = urlparse(self.path)
                seg = [p for p in parts.path.split("/") if p]
                if not seg or seg[0] != "$":
                    return False
                verb = self.command
                op = seg[1] if len(seg) > 1 else ""
                item = "/".join(seg[2:]) if len(seg) > 2 else None
                if op == "ping" and item is None:
                    # ActionPing: GET/POST/HEAD, plain-text timestamp
                    ts = datetime.now(timezone.utc).isoformat(
                        timespec="milliseconds") + "\n"
                    if verb == "HEAD":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type", "text/plain; charset=utf-8")
                        self.end_headers()
                    elif verb in ("GET", "POST"):
                        self._send(200, "text/plain; charset=utf-8", [ts])
                    else:
                        self._error(405, "ping is GET/POST/HEAD")
                    return True
                if op == "server" and item is None and verb in (
                        "GET", "POST"):
                    self._json(outer.admin_server())
                    return True
                if op == "datasets":
                    if verb == "GET":
                        try:
                            self._json(
                                {"datasets": [outer.describe_dataset(n)
                                              for n in sorted(
                                                  outer.datasets)]}
                                if item is None
                                else outer.describe_dataset(item))
                        except KeyError:
                            self._error(404, f"no dataset {item!r}")
                        return True
                    if not outer.enable_update:
                        self._error(405, "dataset administration disabled")
                        return True
                    if verb == "POST" and item is None:
                        qs = parse_qs(parts.query)
                        dbname = (qs.get("dbName") or [""])[0].strip("/")
                        if not dbname:
                            self._error(400, "missing ?dbName=")
                            return True
                        try:
                            outer.add_dataset(dbname)
                        except ValueError as e:
                            self._error(409, str(e))
                            return True
                        self._send(200, "text/plain", [])
                        return True
                    if verb == "DELETE" and item is not None:
                        try:
                            outer.remove_dataset(item)
                        except KeyError:
                            self._error(404, f"no dataset {item!r}")
                            return True
                        self._send(200, "text/plain", [])
                        return True
                if op == "stats" and verb in ("GET", "POST"):
                    try:
                        self._json(outer.admin_stats(item))
                    except KeyError:
                        self._error(404, f"no dataset {item!r}")
                    return True
                if op == "metrics" and item is None and verb == "GET":
                    # ActionMetrics: Prometheus text exposition
                    self._send(
                        200,
                        "text/plain; version=0.0.4; charset=utf-8",
                        [outer.admin_metrics()])
                    return True
                self._error(404, f"no admin action {parts.path!r}")
                return True

            def _gsp_route(self, name: str):
                """Validated GSP target or None (error already sent)."""
                try:
                    return outer.gsp_target(urlparse(self.path).query)
                except ValueError as e:
                    self._error(400, str(e))
                    return None

            def do_GET(self):  # noqa: N802
                if self._admin():
                    return
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc == "data":
                    tgt = self._gsp_route(name)
                    if tgt is None:
                        outer._count(name, "data", good=False)
                        return
                    try:
                        ct, chunks = outer._gsp_get(
                            name, *tgt, user=self._user())
                    except KeyError as e:
                        outer._count(name, "data", good=False)
                        return self._error(404, str(e.args[0]))
                    outer._count(name, "data", good=True)
                    return self._send(200, ct, chunks)
                if svc != "sparql":
                    return self._error(404, "GET serves /<ds>/sparql or /<ds>/data")
                qs = parse_qs(urlparse(self.path).query)
                if "query" not in qs:
                    return self._error(400, "missing ?query=")
                self._dispatch_query(name, qs["query"][0])

            def _read_body(self) -> bytes:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n)

            def _ct(self) -> str:
                return (self.headers.get("Content-Type") or "").split(";")[0]

            def _dispatch_gsp_write(self, name: str, replace: bool) -> None:
                if self._deny_write(name):
                    return
                if not outer.enable_update:
                    return self._error(405, "graph store write disabled")
                tgt = self._gsp_route(name)
                if tgt is None:
                    outer._count(name, "data", good=False)
                    return
                try:
                    outer._gsp_write(name, *tgt, self._read_body(),
                                     self._ct(), replace)
                except ValueError as e:
                    outer._count(name, "data", good=False)
                    return self._error(415, str(e))
                except Exception as e:  # noqa: BLE001 — parse error -> 400
                    outer._count(name, "data", good=False)
                    return self._error(400, f"body parse failed: {e}")
                outer._count(name, "data", good=True)
                self._send(200, "text/plain", [])

            def do_HEAD(self):  # noqa: N802
                """GSP HEAD (soh s-head): existence probe, no body."""
                if self._admin():
                    return
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc != "data":
                    return self._error(404, "HEAD serves /<ds>/data")
                tgt = self._gsp_route(name)
                if tgt is None:
                    return
                mode, iri = tgt
                q = outer._quads(outer._dataset_view(name, self._user()))
                if mode == "graph" and not q.where(
                        outer._gsp_cond(mode, iri)).take(1):
                    return self._error(404, f"No such graph: <{iri}>")
                ct = NQ_CT if mode == "quads" else NT_CT
                self.send_response(200)
                self.send_header("Content-Type", ct)
                self.end_headers()

            def do_PUT(self):  # noqa: N802
                if self._admin():
                    return
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc != "data":
                    return self._error(404, "PUT serves /<ds>/data")
                self._dispatch_gsp_write(name, replace=True)

            def do_DELETE(self):  # noqa: N802
                if self._admin():
                    return
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc != "data":
                    return self._error(404, "DELETE serves /<ds>/data")
                if self._deny_write(name):
                    return
                if not outer.enable_update:
                    return self._error(405, "graph store write disabled")
                tgt = self._gsp_route(name)
                if tgt is None:
                    outer._count(name, "data", good=False)
                    return
                try:
                    outer._gsp_delete(name, *tgt)
                except KeyError as e:
                    outer._count(name, "data", good=False)
                    return self._error(404, str(e.args[0]))
                outer._count(name, "data", good=True)
                self._send(204, "text/plain", [])

            def do_POST(self):  # noqa: N802
                if self._admin():
                    return
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc == "data":
                    return self._dispatch_gsp_write(name, replace=False)
                body = self._read_body().decode("utf-8")
                ct = self._ct()
                if svc == "sparql":
                    if ct == QUERY_CT:
                        return self._dispatch_query(name, body)
                    if ct == "application/x-www-form-urlencoded":
                        qs = parse_qs(body)
                        if "query" not in qs:
                            return self._error(400, "missing query=")
                        return self._dispatch_query(name, qs["query"][0])
                    return self._error(415, f"unsupported {ct!r}")
                if svc == "update":
                    if self._deny_write(name):
                        return
                    if not outer.enable_update:
                        return self._error(405, "update service disabled")
                    if ct == "application/x-www-form-urlencoded":
                        qs = parse_qs(body)
                        body = qs.get("update", [""])[0]
                    elif ct != UPDATE_CT:
                        return self._error(415, f"unsupported {ct!r}")
                    try:
                        outer._run_update(name, body)
                    except Exception as e:  # noqa: BLE001 — protocol 400
                        outer._count(name, "update", good=False)
                        return self._error(400, f"update failed: {e}")
                    outer._count(name, "update", good=True)
                    return self._send(204, "text/plain", [])
                return self._error(404, f"unknown service {svc!r}")

            def _dispatch_query(self, name: str, query: str) -> None:
                try:
                    ct, chunks = outer._run_query(
                        name, query, self.headers.get("Accept") or "",
                        user=self._user())
                except Exception as e:  # noqa: BLE001 — protocol 400
                    outer._count(name, "sparql", good=False)
                    return self._error(400, f"query failed: {e}")
                outer._count(name, "sparql", good=True)
                self._send(200, ct, chunks)

        self._srv = ThreadingHTTPServer((self._host, self._port), Handler)
        self._started = time.time()
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv = None

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
