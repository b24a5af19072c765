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
custom-executor form; a real HTTP fetch would live in such a callable,
out of scope in this engine and documented). ``SERVICE <iri> {...}``
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
            "(register_service; HTTP endpoints are out of scope)")
    if callable(entry) and not isinstance(entry, DataFrame):
        try:
            return entry()
        except Exception:
            if silent:
                return None
            raise
    return entry
