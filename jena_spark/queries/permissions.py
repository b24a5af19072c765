"""Graph-level + triple-level access control — the jena-permissions
surface (``jena-permissions/src/main/java/org/apache/jena/permissions/
SecurityEvaluator.java``: CRUD ``Action`` enum at ``:80-96``,
graph-level evaluate then per-triple evaluate; secured wrappers
``graph/SecuredGraph.java`` / ``model/SecuredModel.java``).

Two-level contract, exactly the reference's (``SecurityEvaluator``
javadoc "Levels of security"): first the graph-level gate — if the
principal may not perform the Action on the graph at all, the
operation is denied outright — then the triple-level restriction,
which in a vectorized engine is a *predicate*, not a per-triple
callback: ``triple_filter(principal, action)`` returns a Column the
secured view applies. Reads therefore stay fully distributed and
pushable (a secured scan is a filtered scan — hidden triples simply
don't exist, the reference's "hard read lock" posture), and no
per-row Python runs anywhere.

Mutations route through the engine's update functions with the
evaluator consulted first (``SecuredGraph.add/delete`` →
``checkCreate``/``checkDelete``); a denial raises
:class:`PermissionDeniedError` (the ``AddDeniedException`` /
``DeleteDeniedException`` analog).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CREATE, READ, UPDATE, DELETE = "Create", "Read", "Update", "Delete"
_ACTIONS = {CREATE, READ, UPDATE, DELETE}


class PermissionDeniedError(PermissionError):
    """AddDeniedException / DeleteDeniedException / ReadDeniedException
    analog (org.apache.jena.shared.*DeniedException)."""


class SecurityEvaluator:
    """Base evaluator: everything allowed, no triple restriction —
    concrete policies override (the reference ships the same pattern:
    implementations decide white/black listing).

    * ``evaluate(principal, action)`` — graph-level gate
      (``SecurityEvaluator.evaluate(principal, action, graphIRI)``).
    * ``triple_filter(principal, action)`` — Column predicate applied
      to the triple frame, or None for "no restriction"
      (the vectorized form of the per-triple
      ``evaluate(principal, action, graphIRI, triple)``).
    """

    def evaluate(self, principal: str, action: str) -> bool:
        return True

    def triple_filter(self, principal: str, action: str) -> Column | None:
        return None


class PolicyEvaluator(SecurityEvaluator):
    """Table-driven evaluator: per-principal allowed action sets plus
    optional per-principal/action Column predicates.

    ``grants``: {principal: set of Actions} — absent principal = no
    access (deny-by-default, the safe side of the reference's
    implementation-defined behavior).
    ``filters``: {(principal, action): Column-factory} — factory so the
    predicate is built lazily (Column exprs need an active session).
    """

    def __init__(
        self,
        grants: dict[str, set[str]],
        filters: dict[tuple[str, str], Callable[[], Column]] | None = None,
    ):
        for acts in grants.values():
            bad = acts - _ACTIONS
            if bad:
                raise ValueError(f"unknown actions: {bad}")
        self._grants = grants
        self._filters = filters or {}

    def evaluate(self, principal: str, action: str) -> bool:
        return action in self._grants.get(principal, set())

    def triple_filter(self, principal: str, action: str) -> Column | None:
        factory = self._filters.get((principal, action))
        return factory() if factory else None


class SecuredGraph:
    """``SecuredGraph.java`` analog over a triple/quad frame: every
    read surface sees only the principal's visible slice; mutations
    check Create/Delete first."""

    def __init__(self, triples: DataFrame, evaluator: SecurityEvaluator, principal: str):
        self._base = triples
        self._ev = evaluator
        self._principal = principal

    # -- read ------------------------------------------------------------
    def frame(self) -> DataFrame:
        """The secured view (the frame every query runs over)."""
        if not self._ev.evaluate(self._principal, READ):
            raise PermissionDeniedError(
                f"{self._principal}: Read denied at graph level")
        pred = self._ev.triple_filter(self._principal, READ)
        return self._base if pred is None else self._base.where(pred)

    def find(self, s=None, p=None, o=None) -> DataFrame:
        from jena_spark.queries import graph as G

        return G.find(self.frame(), s, p, o)  # None == G.ANY

    def query(self, sparql: str, **kw) -> DataFrame:
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(self.frame(), sparql, **kw)

    # -- write -----------------------------------------------------------
    def add(self, new_triples: DataFrame) -> DataFrame:
        """checkCreate then add (SecuredGraph.add). Returns the new
        frame; triple-level Create predicate must hold for EVERY added
        row (violations counted distributed, then denied)."""
        self._check_write(CREATE, new_triples)
        return self._base.unionByName(
            new_triples, allowMissingColumns=True).dropDuplicates()

    def delete_where(self, condition: Column) -> DataFrame:
        """checkDelete then remove matching rows (SecuredGraph.delete).
        The triple-level Delete predicate must hold for every matched
        row — rows the principal may not delete make the whole request
        fail, mirroring the reference's exception-on-denied."""
        matched = self._base.where(condition)
        self._check_write(DELETE, matched)
        return self._base.where(~condition | condition.isNull())

    def _check_write(self, action: str, rows: DataFrame) -> None:
        if not self._ev.evaluate(self._principal, action):
            raise PermissionDeniedError(
                f"{self._principal}: {action} denied at graph level")
        pred = self._ev.triple_filter(self._principal, action)
        if pred is not None:
            n_bad = rows.where(~F.coalesce(pred, F.lit(False))).count()
            if n_bad:
                raise PermissionDeniedError(
                    f"{self._principal}: {action} denied for {n_bad} triple(s)")


# --- dataset-level access control (jena-fuseki-access) -------------------
#
# The reference's server-side security layer (``jena-fuseki2/
# jena-fuseki-access``): a ``SecurityRegistry`` maps an actor (user
# name) to a ``SecurityContext`` — the set of graph names that actor
# may see plus a default-graph flag (``SecurityContext.java:39-52``,
# ``SecurityContextView.java``); an unknown/absent actor resolves to
# ``SecurityContext.NONE`` (deny — ``SecurityRegistry.get``,
# ``DataAccessLib.noSecurityPolicy -> errorForbidden``). The filter
# itself is a predicate on the quad's graph slot
# (``GraphFilter.java:41-50`` for TDB tuples) — in this engine, a
# Column predicate on the ``graph`` column, so a secured scan stays a
# pushed filtered scan.

#: ``SecurityContext.allGraphs`` / ``allNamedGraphs`` wildcard IRIs
#: (``SecurityContext.java:48-49``).
ALL_GRAPHS = "urn:jena:accessAllGraphs"
ALL_NAMED_GRAPHS = "urn:jena:accessAllNamedGraphs"


class SecurityContextView:
    """``SecurityContextView.java`` analog: visible graph names +
    default-graph visibility. ``graphs`` may contain the wildcard
    IRIs; ``ALL_GRAPHS`` implies the default graph too (the
    assembler's ``"**"`` spelling)."""

    def __init__(self, graphs: list[str] | tuple[str, ...] = (),
                 default_graph: bool = False):
        gs = set(graphs)
        self.all_graphs = ALL_GRAPHS in gs
        self.all_named = self.all_graphs or ALL_NAMED_GRAPHS in gs
        self.graphs = gs - {ALL_GRAPHS, ALL_NAMED_GRAPHS}
        self.default_graph = default_graph or self.all_graphs

    @property
    def allows_anything(self) -> bool:
        return self.default_graph or self.all_named or bool(self.graphs)

    def quad_filter(self) -> Column:
        """Visible-quad predicate over a frame with a ``graph`` column
        (NULL graph = default graph) — the ``GraphFilter.test``
        analog, vectorized."""
        g = F.col("graph")
        pred = F.lit(False)
        if self.default_graph:
            pred = pred | g.isNull()
        if self.all_named:
            pred = pred | g.isNotNull()
        elif self.graphs:
            pred = pred | g.isin(*sorted(self.graphs))
        return pred


#: ``SecurityContext.NONE`` / ``ALL`` (``SecurityContextAllowNone`` /
#: ``SecurityContextAllowAll``).
CTX_NONE = SecurityContextView()
CTX_ALL = SecurityContextView([ALL_GRAPHS], default_graph=True)


class SecurityRegistry:
    """``SecurityRegistry.java`` analog: actor -> SecurityContextView,
    deny (``CTX_NONE``) for unknown or anonymous actors."""

    def __init__(self,
                 contexts: dict[str, SecurityContextView] | None = None):
        self._map = dict(contexts or {})

    def put(self, actor: str, ctx: SecurityContextView) -> None:
        self._map[actor] = ctx

    def get(self, actor: str | None) -> SecurityContextView:
        if actor is None:
            return CTX_NONE
        return self._map.get(actor, CTX_NONE)

    def keys(self) -> list[str]:
        return sorted(self._map)

    def __repr__(self) -> str:  # SecurityRegistry.toString shape
        return f"SecurityRegistry{self.keys()}"


def secured_dataset_frame(df: DataFrame, ctx: SecurityContextView
                          ) -> DataFrame:
    """The per-request filtered dataset view
    (``DatasetGraphFiltered`` / ``SecurityContext.filterTDB``): quads
    keep only visible graphs; a triple-only frame IS the default
    graph, so it is all-or-nothing by ``default_graph``. An actor
    with no visible graphs (``SecurityContext.NONE`` — the unknown/
    anonymous-user resolution in ``SecurityRegistry.get``) sees an
    EMPTY dataset, not an error: the reference answers such queries
    with 200 over the empty view."""
    if "graph" in df.columns:
        return df.where(ctx.quad_filter())
    if not ctx.default_graph:
        return df.limit(0)
    return df
