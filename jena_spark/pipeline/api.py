"""RDFConnection analog — the client-facing session surface.

Reference: ``jena-rdfconnection/.../RDFConnection.java:67`` — one
object bundling query (``querySelect``/``queryConstruct``/``queryAsk``
/``queryDescribe``), update, and dataset load/fetch/put/delete against
a dataset. This is the Spark-native twin: a :class:`Connection` wraps
a SparkSession plus a quad DataFrame (default graph = null graph
column, ``Quad.defaultGraphIRI`` sentinel role) and exposes the same
verbs over the repo's algebra/graph/update/source modules.

Functional-core design: the underlying quad frame is immutable; every
update verb REBINDS the connection's frame to a new plan (exactly how
the repo's update module works), so a connection is also a cheap
transaction scope — ``commit`` is materializing ``conn.dataset``
wherever the caller wants it (``pipeline/materialize.py``), and
abandoning the object is rollback. No driver-side data paths anywhere:
every verb returns/holds a DataFrame plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.queries import graph as G


class Connection:
    """``RDFConnection`` twin over (SparkSession, quad frame)."""

    def __init__(self, spark: SparkSession, quads: DataFrame | None = None):
        self.spark = spark
        if quads is None:
            quads = spark.createDataFrame(
                [], ", ".join(f"{c} string" for c in [*TM.TERM_COLS, "graph"])
            )
        if "graph" not in quads.columns:
            quads = quads.select(*TM.TERM_COLS).withColumn(
                "graph", F.lit(None).cast("string")
            )
        self.quads = quads.select(*TM.TERM_COLS, "graph")

    # --- dataset access (fetch / put / delete) ------------------------------

    @property
    def dataset(self) -> DataFrame:
        return self.quads

    def default_graph(self) -> DataFrame:
        """fetch() — the default graph."""
        return self.quads.where(F.col("graph").isNull()).select(*TM.TERM_COLS)

    def fetch(self, graph: str | None = None) -> DataFrame:
        """fetch(graphName); ``G.UNION_GRAPH`` gives the union view."""
        if graph == G.UNION_GRAPH:
            return G.union_graph(self.quads)
        cond = F.col("graph").isNull() if graph is None else F.col("graph") == graph
        return self.quads.where(cond).select(*TM.TERM_COLS)

    def put(self, triples: DataFrame, graph: str | None = None) -> "Connection":
        """put(graphName, model) — replace the target graph."""
        return self.delete(graph).load(triples, graph)

    def delete(self, graph: str | None = None) -> "Connection":
        cond = F.col("graph").isNull() if graph is None else F.col("graph") == graph
        return Connection(self.spark, self.quads.where(~F.coalesce(cond, F.lit(False))))

    def load(self, triples: DataFrame | str, graph: str | None = None,
             lang: str | None = None) -> "Connection":
        """load(graphName, file-or-model) — file paths go through the
        RDFLanguages dispatch (``RDFDataMgr.read``), DataFrames are
        used as-is; set semantics via the update module's LOAD."""
        from jena_spark.pipeline.update import load as _load

        if isinstance(triples, str):
            from jena_spark.sources.languages import read_rdf

            triples = read_rdf(self.spark, triples, lang=lang)
        doc = triples.select(*TM.TERM_COLS)
        return Connection(self.spark, _load(self.quads, doc, graph=graph))

    # --- query verbs --------------------------------------------------------

    def query_select(self, patterns, graph: str | None = None) -> DataFrame:
        """querySelect — BGP over one graph (default: default graph)."""
        from jena_spark.queries.algebra import bgp

        return bgp(self.fetch(graph), patterns)

    def query_ask(self, s=G.ANY, p=G.ANY, o=G.ANY, graph: str | None = None) -> bool:
        return not self.fetch(graph).where(G.pattern_predicate(s, p, o)).isEmpty()

    def query_construct(self, templates, patterns,
                        graph: str | None = None) -> DataFrame:
        from jena_spark.queries.algebra import bgp, construct

        return construct(bgp(self.fetch(graph), patterns), templates)

    def query_describe(self, iri: str, graph: str | None = None) -> DataFrame:
        g = self.fetch(graph)
        return G.union(
            G.find(g, s=iri), G.find(g, o=("iri", iri))
        )

    def find(self, s=G.ANY, p=G.ANY, o=G.ANY, graph: str | None = None) -> DataFrame:
        return G.find(self.fetch(graph), s, p, o)

    # --- update verbs -------------------------------------------------------

    def update_insert(self, new_triples: DataFrame,
                      graph: str | None = None) -> "Connection":
        from jena_spark.pipeline.update import load as _load

        return Connection(
            self.spark, _load(self.quads, new_triples.select(*TM.TERM_COLS), graph)
        )

    def update(self, request: str) -> "Connection":
        """Execute a SPARQL Update request STRING (``RDFConnection.
        update(String)`` — the main update entry point): parse via
        :mod:`jena_spark.pipeline.sparql_update` and rebind to the next
        dataset version."""
        from jena_spark.pipeline.sparql_update import update_sparql

        return Connection(self.spark, update_sparql(self.quads, request))

    def query(self, sparql: str, flat: bool = True) -> DataFrame:
        """Execute a SPARQL query STRING over the dataset (quad-aware:
        GRAPH blocks work; unscoped patterns see the default graph)."""
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(self.quads, sparql, flat=flat)

    def explain(self, sparql: str, physical: bool = False,
                join_trees: bool = False,
                pred_counts: dict[str, int] | None = None) -> str:
        """The query's algebra in ARQ SSE form (``arq.qparse
        --print=op``); ``physical=True`` appends the Spark physical
        plan Catalyst actually chose (``QueryExecution.explainString``
        — the TDB/ARQ explain-log analog); ``join_trees=True`` appends
        the neo-optimizer fork's serialized left-deep BGP join trees
        (``tdbqueryplan --tdb_tree``) in the FIXED order ``query()``
        actually executes. Pass ``pred_counts`` (e.g. one
        ``algebra.pred_counts_of(conn.quads)`` census, computed once
        and reused across calls — the ``stats.opt`` file posture) to
        see the ``ReorderWeighted`` order instead; note ``query()``
        itself runs the fixed reorder, so a stats-fed tree is the
        what-if view, not the executed plan."""
        from jena_spark.queries.sse import query_to_sse

        out = query_to_sse(sparql)
        if join_trees:
            from jena_spark.queries.jointree import query_plan

            trees = query_plan(sparql, pred_counts)
            out += "\n--- join trees ---\n" + "\n".join(trees)
        if physical:
            df = self.query(sparql)
            out += "\n--- physical ---\n" + df._sc._jvm.PythonSQLUtils \
                .explainString(df._jdf.queryExecution(), "formatted")
        return out

    def update_delete_where(self, s=G.ANY, p=G.ANY, o=G.ANY,
                            graph: str | None = None) -> "Connection":
        cond = G.pattern_predicate(s, p, o)
        gcond = F.col("graph").isNull() if graph is None else F.col("graph") == graph
        return Connection(self.spark, self.quads.where(~(cond & gcond)))
