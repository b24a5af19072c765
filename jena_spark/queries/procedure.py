"""OpProcedure — IRI-dispatched binding-stream procedures.

Reference: ``jena-arq/.../sparql/procedure/ProcEval.java:30-56``
(``build`` looks the procedure up by IRI in a ``ProcedureRegistry``,
``eval`` is ``proc.proc(queryIterator, execCxt)`` — the procedure
consumes and REPLACES the whole binding stream, unlike a property
function which joins per-binding), ``ProcedureRegistry.java`` (global
registry + ``put``/``get``/``remove``), ``StandardProcedures.java:28``
(the one standard member, ``debug:proc``) and ``library/debug.java``
(prints its args, passes every binding through).

Spark posture: the QueryIterator is a bindings DataFrame, so a
procedure is ``(bindings, args) -> bindings`` over whole frames — the
natural Catalyst citizen (a window, an aggregation, a re-join…), not
a per-row callback. The registry is process-global like the
reference's ``ProcedureRegistry.get()``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

#: IRI -> (bindings, args) -> bindings
_REGISTRY: dict[str, Callable[[DataFrame, Sequence], DataFrame]] = {}


def register_procedure(
    iri: str, fn: Callable[[DataFrame, Sequence], DataFrame]) -> None:
    """``ProcedureRegistry.put`` analog."""
    _REGISTRY[iri] = fn


def unregister_procedure(iri: str) -> None:
    """``ProcedureRegistry.remove`` analog."""
    _REGISTRY.pop(iri, None)


def op_procedure(bindings: DataFrame, iri: str,
                 args: Sequence = ()) -> DataFrame:
    """``ProcEval.build`` + ``eval``: dispatch ``iri`` through the
    registry and hand it the whole binding frame. Unknown IRIs raise
    (the reference NPEs on a missing factory; we error loudly)."""
    fn = _REGISTRY.get(iri)
    if fn is None:
        raise ValueError(f"no registered procedure for <{iri}>")
    return fn(bindings, args)


def _debug_proc(bindings: DataFrame, args: Sequence) -> DataFrame:
    """``library/debug.java``: print the args, pass bindings through."""
    print(f"Debug: {list(args)}")
    return bindings


#: StandardProcedures.java:28 registers exactly this key.
register_procedure("debug:proc", _debug_proc)
