"""External text-index binding — the jena-text-es seam.

Reference: the reference ships TWO backends behind one ``TextIndex``
contract — embedded Lucene (``jena-text/.../TextIndexLucene.java``)
and a REMOTE search service (``jena-text-es/.../TextIndexES.java``:
an Elasticsearch ``Client`` receives entity documents —
``addEntity :234`` / ``updateEntity :219`` / ``deleteEntity :292`` —
and answers analyzed queries ``query(property, qs, ...) :374-443``
returning ``TextHit`` lists; ``commit :191`` is a no-op because the
service indexes on ingest). The contract seam is the point: the graph
engine never knows which backend answers.

Spark-native analog:

* :class:`TextIndexService` — the external service stub: an HTTP
  listener (same stdlib plumbing as ``pipeline/server.py``) that OWNS
  the index. Clients POST entity documents in batches
  (``/index``, JSON lines — the ES bulk-ingest posture), DELETE by
  entity URI, GET stored fields by URI, and GET ranked hits for a
  Lucene query string (``/query``). Internally the service builds the
  SAME posting table and evaluates the SAME deterministic
  integer-scored query engine as the local path
  (:func:`jena_spark.queries.textindex.build_text_index` /
  ``query_text``), so the two bindings are row-identical BY
  CONSTRUCTION — what the seam proves is the protocol abstraction,
  exactly what ``TextIndexES`` proves over Lucene parity.
* :class:`TextIndexRemote` — the client half (the ``TextIndexES``
  role): pushes documents from a DataFrame in bounded driver-side
  batches (the ES client also ships docs through the driver's HTTP
  connection) and materializes query hits back as a DataFrame.

The posting-table path stays the default everywhere; this binding is
opt-in (the reference's text:es assembler posture). At 100 TB the
division of labor is the ES deployment's: the corpus-sized index
build runs distributed where the data lives, while the per-query hit
list is small (top-k) — only documents-to-index and hits cross HTTP.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: stored-document schema (the entity document ``TextIndexES``
#: ships: entity key, field/property, analyzed text).
DOC_SCHEMA = "s_kind string, s_val string, property string, text string"

#: hit schema (``TextHit``: node + score; property kept so multi-field
#: queries stay auditable).
HIT_SCHEMA = "s_kind string, s_val string, property string, score_bp bigint"


class TextIndexService:
    """External search service stub owning the text index.

    ``start()`` binds an ephemeral port and returns the base URL.
    Documents accumulate across POST batches; the posting table is
    (re)built lazily on the first query after a change — the
    near-real-time refresh posture (``TextIndexES.commit`` is a
    no-op for the same reason).
    """

    def __init__(self, spark: SparkSession,
                 host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self._host, self._port = host, port
        self._docs: list[tuple[str, str, str, str]] = []
        self._index: DataFrame | None = None
        self._lock = threading.Lock()
        self._srv: ThreadingHTTPServer | None = None

    # --- engine ---------------------------------------------------------

    def _add(self, rows: list[dict]) -> int:
        with self._lock:
            for r in rows:
                self._docs.append((r["s_kind"], r["s_val"],
                                   r["property"], r["text"]))
            self._index = None
        return len(rows)

    def _delete(self, uri: str) -> int:
        """``deleteEntity`` analog: drop every document of the entity."""
        with self._lock:
            before = len(self._docs)
            self._docs = [d for d in self._docs if d[1] != uri]
            self._index = None
            return before - len(self._docs)

    def _get(self, uri: str) -> list[dict]:
        """``get(uri)`` analog: the entity's stored fields."""
        with self._lock:
            return [{"property": p, "text": t}
                    for (_, s, p, t) in self._docs if s == uri]

    def _ensure_index(self) -> DataFrame | None:
        from jena_spark.queries.textindex import build_text_index

        with self._lock:
            if self._index is None and self._docs:
                lits = self.spark.createDataFrame(
                    [(k, s, p, "literal", t) for (k, s, p, t) in self._docs],
                    "s_kind string, s_val string, p_val string,"
                    " o_kind string, o_val string")
                props = sorted({p for (_, _, p, _) in self._docs})
                self._index = build_text_index(
                    lits, properties=props).localCheckpoint()
            return self._index

    def _query(self, q: str, prop: str | None,
               limit: int | None) -> list[dict]:
        from jena_spark.queries.textindex import query_text

        idx = self._ensure_index()
        if idx is None:
            return []
        if prop is not None:
            idx = idx.where(F.col("property") == prop)
        hits = query_text(idx, q, limit=limit)
        return [{"s_kind": r["s_kind"], "s_val": r["s_val"],
                 "property": r["property"], "score_bp": r["score_bp"]}
                for r in hits.collect()]

    # --- HTTP listener --------------------------------------------------

    def start(self) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 — quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802
                path = urllib.parse.urlparse(self.path).path
                if path != "/index":
                    return self._send(404, {"error": "POST /index"})
                n = int(self.headers.get("Content-Length", 0))
                try:
                    rows = [json.loads(line) for line in
                            self.rfile.read(n).decode("utf-8").splitlines()
                            if line.strip()]
                    added = outer._add(rows)
                except Exception as e:  # noqa: BLE001 — protocol 400
                    return self._send(400, {"error": str(e)})
                self._send(200, {"indexed": added})

            def do_DELETE(self):  # noqa: N802
                u = urllib.parse.urlparse(self.path)
                if u.path != "/doc":
                    return self._send(404, {"error": "DELETE /doc"})
                qs = urllib.parse.parse_qs(u.query)
                uri = (qs.get("uri") or [None])[0]
                if uri is None:
                    return self._send(400, {"error": "missing ?uri="})
                self._send(200, {"deleted": outer._delete(uri)})

            def do_GET(self):  # noqa: N802
                u = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(u.query)
                if u.path == "/doc":
                    uri = (qs.get("uri") or [None])[0]
                    if uri is None:
                        return self._send(400, {"error": "missing ?uri="})
                    return self._send(200, {"fields": outer._get(uri)})
                if u.path != "/query":
                    return self._send(404, {"error": "GET /query or /doc"})
                q = (qs.get("q") or [None])[0]
                if not q:
                    return self._send(400, {"error": "missing ?q="})
                prop = (qs.get("property") or [None])[0]
                lim = (qs.get("limit") or [None])[0]
                try:
                    hits = outer._query(
                        q, prop, int(lim) if lim is not None else None)
                except Exception as e:  # noqa: BLE001 — protocol 400
                    return self._send(400, {"error": str(e)})
                self._send(200, {"hits": hits})

        self._srv = ThreadingHTTPServer((self._host, self._port), Handler)
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()
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


class TextIndexRemote:
    """Client half of the external binding (the ``TextIndexES`` role,
    pointed at :class:`TextIndexService` or anything speaking the same
    shape)."""

    def __init__(self, spark: SparkSession, endpoint: str,
                 batch_size: int = 1000, timeout: float = 30.0):
        self.spark = spark
        self.endpoint = endpoint.rstrip("/")
        self.batch_size = batch_size
        self.timeout = timeout

    def _http(self, method: str, path: str,
              body: bytes | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.endpoint}{path}", data=body, method=method,
            headers={"Content-Type": "application/x-ndjson"}
            if body else {})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    def add_entities(self, triples: DataFrame,
                     properties: list[str] | None = None) -> int:
        """Push the indexed-property literals as entity documents
        (``addEntity``, bulk). Bounded driver-side batches via
        ``toLocalIterator`` — documents stream, nothing materializes
        whole. Returns documents indexed."""
        from jena_spark import terms as TM

        props = properties or [TM.RDFS_LABEL, TM.P_TEXT]
        lits = triples.where(
            F.col("p_val").isin(props) & (F.col("o_kind") == "literal")
        ).select("s_kind", "s_val", F.col("p_val").alias("property"),
                 F.col("o_val").alias("text"))
        total, batch = 0, []
        for row in lits.toLocalIterator():
            batch.append(json.dumps(row.asDict()))
            if len(batch) >= self.batch_size:
                total += self._flush(batch)
                batch = []
        if batch:
            total += self._flush(batch)
        return total

    def _flush(self, lines: list[str]) -> int:
        return self._http("POST", "/index",
                          ("\n".join(lines)).encode("utf-8"))["indexed"]

    def delete_entity(self, uri: str) -> int:
        return self._http(
            "DELETE", "/doc?uri=" + urllib.parse.quote(uri, safe="")
        )["deleted"]

    def get(self, uri: str) -> list[dict]:
        return self._http(
            "GET", "/doc?uri=" + urllib.parse.quote(uri, safe="")
        )["fields"]

    def query(self, q: str, property: str | None = None,
              limit: int | None = None) -> DataFrame:
        """Ranked hits as a DataFrame — same columns and values as the
        local ``query_text`` over the same documents."""
        path = "/query?q=" + urllib.parse.quote(q, safe="")
        if property is not None:
            path += "&property=" + urllib.parse.quote(property, safe="")
        if limit is not None:
            path += f"&limit={limit}"
        hits = self._http("GET", path)["hits"]
        rows = [(h["s_kind"], h["s_val"], h["property"], h["score_bp"])
                for h in hits]
        return self.spark.createDataFrame(rows, HIT_SCHEMA)
