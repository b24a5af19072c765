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
  analog; last write wins, one update at a time under a lock).

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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame

QUERY_CT = "application/sparql-query"
UPDATE_CT = "application/sparql-update"
SRJ_CT = "application/sparql-results+json"
NT_CT = "application/n-triples"


class FusekiLite:
    """``fuseki-server --mem /name`` analog over registered frames.

    ``datasets``: name -> triple/quad DataFrame. Each dataset serves
    ``/<name>/sparql`` (query) and, when ``enable_update``,
    ``/<name>/update``. ``start()`` binds an ephemeral port and
    returns the base URL; ``stop()`` shuts the listener down.
    """

    def __init__(self, datasets: dict[str, DataFrame],
                 enable_update: bool = False,
                 host: str = "127.0.0.1", port: int = 0):
        self.datasets = dict(datasets)
        self.enable_update = enable_update
        self._host, self._port = host, port
        self._srv: ThreadingHTTPServer | None = None
        self._lock = threading.Lock()

    # --- engine calls ---------------------------------------------------

    def _run_query(self, name: str, query: str) -> tuple[str, "object"]:
        """-> (content_type, line_iterator) — lines stream from the
        cluster; the envelope is O(#vars) driver-side."""
        from jena_spark.queries.sparql import Parser, sparql_query

        df = self.datasets[name]
        form = Parser(query).parse().form
        if form in ("construct", "describe"):
            from jena_spark.sources.ntriples import format_ntriples

            lines = format_ntriples(sparql_query(df, query))
            return NT_CT, (r[0] + "\n" for r in lines.toLocalIterator())
        out = sparql_query(df, query, flat=False)
        if form == "ask":
            val = bool(out.collect()[0]["ask"])
            doc = json.dumps({"head": {}, "boolean": val})
            return SRJ_CT, iter([doc])
        from jena_spark.sources.resultsets import _srj_binding_json

        names = out.columns

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

            def _route(self) -> tuple[str, str] | None:
                parts = urlparse(self.path)
                seg = [p for p in parts.path.split("/") if p]
                if len(seg) != 2 or seg[0] not in outer.datasets:
                    self._error(404, f"no such service {parts.path!r}")
                    return None
                return seg[0], seg[1]

            def do_GET(self):  # noqa: N802
                route = self._route()
                if route is None:
                    return
                name, svc = route
                if svc != "sparql":
                    return self._error(404, "GET serves /<ds>/sparql")
                qs = parse_qs(urlparse(self.path).query)
                if "query" not in qs:
                    return self._error(400, "missing ?query=")
                self._dispatch_query(name, qs["query"][0])

            def do_POST(self):  # noqa: N802
                route = self._route()
                if route is None:
                    return
                name, svc = route
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8")
                ct = (self.headers.get("Content-Type") or "").split(";")[0]
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
                        return self._error(400, f"update failed: {e}")
                    return self._send(204, "text/plain", [])
                return self._error(404, f"unknown service {svc!r}")

            def _dispatch_query(self, name: str, query: str) -> None:
                try:
                    ct, chunks = outer._run_query(name, query)
                except Exception as e:  # noqa: BLE001 — protocol 400
                    return self._error(400, f"query failed: {e}")
                self._send(200, ct, chunks)

        self._srv = ThreadingHTTPServer((self._host, self._port), Handler)
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
