"""OpService — federated SPARQL over registered datasets.

Reference: ``OpExecutor.java:311`` dispatches ``OpService`` to
``engine/main/iterator/QueryIterService.java:36-55``, which evaluates
the service sub-op against the endpoint named by the service IRI and
merges the returned bindings into the input stream (compatible-binding
join). Jena resolves WHO executes through
``sparql/service/ServiceExecutorRegistry.java`` — applications bind
service IRIs to custom executors, and the HTTP client is merely the
default registration.

Spark-native posture: in a data-lake engine the natural "endpoints"
are other registered datasets (catalog tables / views / in-memory
frames), not HTTP servers. The registry here maps a service IRI to a
triple/quad DataFrame (or a zero-arg callable producing one — the
custom-executor form). Unregistered http(s) IRIs additionally fall
through to a real SPARQL-protocol client (see the HTTP section
below). ``SERVICE <iri> {...}``
then evaluates its group against that frame and joins the bindings
back — exactly the OpService dataflow with the network hop replaced by
a catalog lookup, which is also what it should compile to at 100 TB:
the "remote" pattern is a pushed-down scan of the other table, and the
binding merge is an ordinary Catalyst join that AQE can broadcast.

SILENT semantics (``sparql_11.jj`` ServiceGraphPattern;
``Service.java`` exec wraps failures): an unregistered endpoint under
SILENT contributes the unit table (one solution, no bindings) instead
of raising — so the enclosing group is unchanged. Without SILENT an
unknown endpoint raises ``ValueError``.

Variable endpoints (``SERVICE ?ep``) are out of profile (ARQ only
executes them once ``?ep`` is bound; we document-and-raise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

SERVICE_REGISTRY: dict[str, DataFrame | Callable[[], DataFrame]] = {}


def register_service(iri: str, dataset: DataFrame | Callable[[], DataFrame]) -> None:
    """Bind a service IRI to a dataset (triple/quad frame) or to a
    zero-arg callable producing one (the custom-executor form,
    ``ServiceExecutorRegistry.addSingleLink`` analog). Re-registering
    overwrites — last registration wins, like the reference registry."""
    SERVICE_REGISTRY[iri] = dataset


def unregister_service(iri: str) -> None:
    SERVICE_REGISTRY.pop(iri, None)


def service_frame(iri: str, silent: bool = False) -> DataFrame | None:
    """Resolve a service IRI to its dataset frame.

    Returns ``None`` for an unregistered endpoint under SILENT (the
    caller contributes the unit table); raises otherwise. A callable
    registration is invoked per use — failures inside it are swallowed
    to the unit table under SILENT, mirroring ``QueryIterService``'s
    silent catch-block."""
    entry = SERVICE_REGISTRY.get(iri)
    if entry is None:
        if silent:
            return None
        raise ValueError(
            f"SPARQL SERVICE: no dataset registered for <{iri}> "
            "(register_service; unregistered http(s) IRIs are executed "
            "remotely by the compiler via http_service_group)")
    if callable(entry) and not isinstance(entry, DataFrame):
        try:
            return entry()
        except Exception:
            if silent:
                return None
            raise
    return entry


# --- HTTP SPARQL-protocol client path ---------------------------------------
#
# Reference: ``QueryIterService.java:36-55`` executes the service sub-op
# against the remote endpoint over the SPARQL protocol and merges the
# returned bindings; ``Service.java`` builds the outgoing query.
# Here: an UNREGISTERED http(s) service IRI falls through to this
# client — ``SELECT *`` over the original group text, POSTed as
# ``application/sparql-query``, SRJ response parsed into a one-struct-
# column-per-variable bindings frame that joins like any sub-group.
# The registry path stays the offline default (a registered frame
# always wins — it is also the 100 TB posture: remote data mounted as
# a catalog table beats shipping bindings through the driver).
# Remote result sets pass through the driver (exactly the reference's
# dataflow — the remote endpoint has already reduced the data); callers
# should LIMIT inside the service group for unbounded patterns.

#: module switch — set False to forbid network fetches entirely
#: (every unregistered endpoint then raises/SILENT-units as before).
HTTP_ENABLED = True

#: schemes the HTTP client path accepts.
_HTTP_SCHEMES = ("http://", "https://")


def is_http_endpoint(iri: str) -> bool:
    return HTTP_ENABLED and iri.startswith(_HTTP_SCHEMES)


def http_query(endpoint: str, query: str, timeout: float = 30.0) -> dict:
    """One SPARQL-protocol request: POST the query text
    (``Content-Type: application/sparql-query``), accept
    ``application/sparql-results+json``; returns the parsed SRJ
    document (``head``/``results``)."""
    import json
    import urllib.request

    req = urllib.request.Request(
        endpoint,
        data=query.encode("utf-8"),
        headers={
            "Content-Type": "application/sparql-query",
            "Accept": "application/sparql-results+json",
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


#: SRJ term type -> engine term kind.
_SRJ_KIND = {"uri": "iri", "literal": "literal",
             "typed-literal": "literal", "bnode": "bnode"}


def bindings_frame(spark, doc: dict) -> DataFrame:
    """SRJ document -> bindings DataFrame in the engine's internal
    shape: one ``struct<kind,val,datatype,lang>`` column per head
    variable (``algebra._var_struct_for`` field order; absent datatype/
    lang are empty strings, unbound variables NULL structs)."""
    vars_ = doc.get("head", {}).get("vars", [])
    if not vars_:
        raise ValueError("SERVICE: SRJ response has no head.vars")
    rows = []
    for b in doc.get("results", {}).get("bindings", []):
        row = []
        for v in vars_:
            t = b.get(v)
            if t is None:
                row.append(None)
            else:
                kind = _SRJ_KIND.get(t.get("type"))
                if kind is None:
                    raise ValueError(
                        f"SERVICE: unknown SRJ term type {t.get('type')!r}")
                row.append((kind, t.get("value", ""),
                            t.get("datatype") or "",
                            t.get("xml:lang") or ""))
        rows.append(tuple(row))
    schema = ", ".join(
        f"`{v}` struct<kind:string,val:string,datatype:string,lang:string>"
        for v in vars_)
    return spark.createDataFrame(rows, schema)


def http_service_group(spark, endpoint: str, group_text: str,
                       prefixes: dict[str, str],
                       timeout: float = 30.0) -> DataFrame:
    """Execute one ``SERVICE <http…> { … }`` group remotely: the
    outgoing query is the enclosing query's PREFIX prologue +
    ``SELECT * WHERE`` + the group's original source text (BASE is out
    of profile for forwarding — resolve IRIs before shipping)."""
    prologue = "".join(
        f"PREFIX {p}: <{iri}>\n" for p, iri in sorted(prefixes.items()))
    query = prologue + "SELECT * WHERE " + group_text
    return bindings_frame(spark, http_query(endpoint, query,
                                            timeout=timeout))
