"""RDFConnectionRemote analog — the HTTP client twin of
:class:`jena_spark.pipeline.api.Connection`.

Reference: ``jena-rdfconnection/.../RDFConnectionRemote.java:60`` — a
connection bound to a remote dataset URL with three services
(``svcQuery``/``svcUpdate``/``svcGraphStore``, ``:69-71``), speaking
the SPARQL 1.1 Protocol for query/update and the SPARQL 1.1 Graph
Store Protocol for ``fetch``/``load``/``put``/``delete``
(``urlForGraph`` ``:330,406``). This module speaks the same two
protocols with ``urllib`` against any endpoint —
:class:`jena_spark.pipeline.server.FusekiLite` in tests, a real
Fuseki in deployment.

The HTTP boundary is inherently a driver-side serialization point
(the reference marshals a ``Model`` through the same socket);
responses are re-parsed into DataFrames by the distributed readers
via :func:`jena_spark.sources.languages.read_rdf_bytes`, and SELECT
bindings arrive through the same SRJ decoder the SERVICE client uses
(:func:`jena_spark.queries.service.bindings_frame`), so everything
downstream of the socket is a plan again.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession

from jena_spark import terms as TM

NT_CT = "application/n-triples"
NQ_CT = "application/n-quads"


class RemoteHTTPError(RuntimeError):
    """Non-2xx protocol response (``HttpException`` analog)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class RemoteConnection:
    """``RDFConnectionRemote`` twin: verbs over a remote dataset URL.

    ``destination`` is the dataset base (e.g. ``http://host:port/ds``);
    the three service names default to Fuseki's conventional layout
    (``RDFConnectionRemoteBuilder``'s ``sparql``/``update``/``data``).
    """

    def __init__(self, spark: SparkSession, destination: str,
                 query_service: str = "sparql",
                 update_service: str = "update",
                 gsp_service: str = "data",
                 timeout: float = 30.0,
                 user: str | None = None):
        self.spark = spark
        base = destination.rstrip("/")
        self.svc_query = f"{base}/{query_service}"
        self.svc_update = f"{base}/{update_service}"
        self.svc_gsp = f"{base}/{gsp_service}"
        self.timeout = timeout
        #: actor sent as ``X-User`` on every request — the client
        #: half of the server's fuseki-access user determination
        #: (the reference authenticates via ``HttpClient`` on
        #: ``RDFConnectionRemoteBuilder.httpClient``).
        self.user = user

    # --- plumbing -------------------------------------------------------

    def _http(self, method: str, url: str, body: bytes | None = None,
              ct: str | None = None, accept: str | None = None) -> bytes:
        headers = {}
        if ct:
            headers["Content-Type"] = ct
        if accept:
            headers["Accept"] = accept
        if self.user:
            headers["X-User"] = self.user
        req = urllib.request.Request(url, data=body, headers=headers,
                                     method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            raise RemoteHTTPError(
                e.code, e.read().decode("utf-8", "replace")) from None

    def _graph_url(self, graph: str | None) -> str:
        # LibRDFConn.urlForGraph: default graph -> ?default, named ->
        # ?graph=<encoded iri>
        if graph is None:
            return f"{self.svc_gsp}?default"
        return f"{self.svc_gsp}?graph=" + quote(graph, safe="")

    @staticmethod
    def _nt_body(triples: DataFrame, quads: bool = False) -> bytes:
        """Serialize a triple/quad frame for the request body, streamed
        off the cluster line by line (never a collect of the frame)."""
        from jena_spark.sources.ntriples import format_ntriples

        lines = format_ntriples(triples, quads=quads)
        return "".join(
            r[0] + "\n" for r in lines.toLocalIterator()).encode("utf-8")

    # --- SPARQL protocol: query / update --------------------------------

    def query(self, sparql: str, flat: bool = True):
        """``query()`` (``RDFConnectionRemote.java:228``): dispatches on
        the parsed form exactly as the reference's ``QueryExecution``
        does client-side — SELECT -> bindings DataFrame (``flat=True``
        gives lexical-value columns, the engine's result-set shape),
        ASK -> bool, CONSTRUCT/DESCRIBE -> triple DataFrame."""
        import json

        from jena_spark.queries.sparql import Parser

        form = Parser(sparql).parse().form
        if form in ("construct", "describe"):
            body = self._http(
                "POST", self.svc_query, sparql.encode("utf-8"),
                ct="application/sparql-query", accept=NT_CT)
            from jena_spark.sources.languages import read_rdf_bytes

            return read_rdf_bytes(self.spark, body, "ntriples")
        doc = json.loads(self._http(
            "POST", self.svc_query, sparql.encode("utf-8"),
            ct="application/sparql-query",
            accept="application/sparql-results+json").decode("utf-8"))
        if form == "ask":
            return bool(doc["boolean"])
        from jena_spark.queries import algebra as A
        from jena_spark.queries.service import bindings_frame

        out = bindings_frame(self.spark, doc)
        return A.flatten(out) if flat else out

    def query_select(self, sparql: str, flat: bool = True) -> DataFrame:
        return self.query(sparql, flat=flat)

    def query_ask(self, sparql: str) -> bool:
        return self.query(sparql)

    def query_construct(self, sparql: str) -> DataFrame:
        return self.query(sparql)

    def query_describe(self, sparql: str) -> DataFrame:
        return self.query(sparql)

    def update(self, request: str) -> None:
        """``update()`` (``:303``): POST ``application/sparql-update``."""
        self._http("POST", self.svc_update, request.encode("utf-8"),
                   ct="application/sparql-update")

    # --- Graph Store Protocol: fetch / load / put / delete --------------

    def fetch(self, graph: str | None = None) -> DataFrame:
        """``fetch([graph])`` (``:328-336``): GET the target graph."""
        body = self._http("GET", self._graph_url(graph), accept=NT_CT)
        from jena_spark.sources.languages import read_rdf_bytes

        return read_rdf_bytes(self.spark, body, "ntriples").select(
            *TM.TERM_COLS)

    def load(self, triples: DataFrame, graph: str | None = None) -> None:
        """``load([graph], model)`` (``:360-365``): POST = merge."""
        self._http("POST", self._graph_url(graph),
                   self._nt_body(triples.select(*TM.TERM_COLS)), ct=NT_CT)

    def put(self, triples: DataFrame, graph: str | None = None) -> None:
        """``put([graph], model)`` (``:382-388``): PUT = replace."""
        self._http("PUT", self._graph_url(graph),
                   self._nt_body(triples.select(*TM.TERM_COLS)), ct=NT_CT)

    def delete(self, graph: str | None = None) -> None:
        """``delete([graph])`` (``:406``): DELETE the target graph."""
        self._http("DELETE", self._graph_url(graph))

    # --- whole-dataset verbs (RDFConnection's Dataset overloads) --------

    def fetch_dataset(self) -> DataFrame:
        """GET the dataset (quads mode — no ``?default``/``?graph``)."""
        body = self._http("GET", self.svc_gsp, accept=NQ_CT)
        from jena_spark.sources.languages import read_rdf_bytes

        return read_rdf_bytes(self.spark, body, "nquads").select(
            *TM.TERM_COLS, "graph")

    def load_dataset(self, quads: DataFrame) -> None:
        self._http("POST", self.svc_gsp,
                   self._nt_body(quads, quads=True), ct=NQ_CT)

    def put_dataset(self, quads: DataFrame) -> None:
        self._http("PUT", self.svc_gsp,
                   self._nt_body(quads, quads=True), ct=NQ_CT)

    def delete_dataset(self) -> None:
        self._http("DELETE", self.svc_gsp)

    # --- context manager (RDFConnection is AutoCloseable) ---------------

    def __enter__(self) -> "RemoteConnection":
        return self

    def __exit__(self, *exc) -> None:
        pass
