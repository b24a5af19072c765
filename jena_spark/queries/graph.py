"""Graph/Model-contract queries as DataFrame plans.

Reference contract (paths relative to /root/reference):

* ``find(s,p,o)`` with ANY wildcards —
  ``jena-core/.../graph/Graph.java:100-113``; ``Node.matches`` is
  equality except wildcards (``Node.java:274-275``). Here a triple
  pattern compiles to equality predicates on the term columns — all
  JVM-side, pushed down to the parquet/Iceberg scan (the Spark
  equivalent of GraphMem picking the best of its three hash indexes,
  ``mem/GraphTripleStoreBase.java:32-34``, or TDB picking an SPO/POS/OSP
  B+Tree prefix, ``jena-tdb/.../sys/Names.java:24-25``).
* ``union/intersection/difference`` — term-equality set algebra
  (``rdf/model/Model.java:872-895``; ``graph/compose/Union.java:34``,
  ``Intersection.java:34``, ``Difference.java:28``). Because blank
  nodes are skolemized per scope, term equality here IS Jena's
  semantics: bnodes from different scopes never merge.
* subject/predicate/object enumeration — the ``listSubjects`` /
  ``listNameSpaces`` style Model iterators and the elephas positional
  counts (``jena-elephas/.../count/positional/*.java``).

Term specs: ``None`` = ANY; a str = IRI shorthand; or a tuple
``(kind, val[, datatype[, lang]])``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark.terms import TERM_COLS

ANY = None

TermSpec = None | str | tuple


def _normalize(term: TermSpec) -> tuple | None:
    if term is None:
        return None
    if isinstance(term, str):
        return ("iri", term, None, None)
    kind, val, *rest = term
    datatype = rest[0] if len(rest) > 0 else None
    lang = rest[1] if len(rest) > 1 else None
    return (kind, val, datatype, lang)


def pattern_predicate(s: TermSpec = ANY, p: TermSpec = ANY, o: TermSpec = ANY) -> Column:
    """Triple pattern -> boolean Column (Node.matches per position)."""
    conds: list[Column] = []
    ns, np_, no = _normalize(s), _normalize(p), _normalize(o)
    if ns is not None:
        conds += [F.col("s_kind") == ns[0], F.col("s_val") == ns[1]]
    if np_ is not None:
        conds += [F.col("p_val") == np_[1]]
    if no is not None:
        conds += [F.col("o_kind") == no[0], F.col("o_val") == no[1]]
        conds += [F.col("o_datatype").eqNullSafe(F.lit(no[2]))]
        conds += [F.col("o_lang").eqNullSafe(F.lit(no[3]))]
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def find(triples: DataFrame, s: TermSpec = ANY, p: TermSpec = ANY, o: TermSpec = ANY) -> DataFrame:
    """``Graph.find(s,p,o)`` — a filtered scan with pushed predicates."""
    return triples.where(pattern_predicate(s, p, o)).select(*TERM_COLS)


def contains(triples: DataFrame, s: TermSpec, p: TermSpec, o: TermSpec) -> bool:
    return not find(triples, s, p, o).isEmpty()


def size(triples: DataFrame) -> int:
    """``Graph.size()`` — distinct triple count (set semantics)."""
    return triples.select(*TERM_COLS).distinct().count()


def subjects(triples: DataFrame) -> DataFrame:
    return triples.select(F.col("s_kind").alias("kind"), F.col("s_val").alias("val")).distinct()


def predicates(triples: DataFrame) -> DataFrame:
    return triples.select(F.col("p_val").alias("val")).distinct()


def objects(triples: DataFrame) -> DataFrame:
    return (
        triples.select(
            F.col("o_kind").alias("kind"), F.col("o_val").alias("val"),
            F.col("o_datatype").alias("datatype"), F.col("o_lang").alias("lang"),
        ).distinct()
    )


def _term_proj(df: DataFrame) -> DataFrame:
    return df.select(*TERM_COLS)


def union(g1: DataFrame, g2: DataFrame) -> DataFrame:
    """``Model.union`` — bag union + set dedup (one shuffle)."""
    return _term_proj(g1).unionByName(_term_proj(g2)).dropDuplicates(TERM_COLS)


def intersection(g1: DataFrame, g2: DataFrame) -> DataFrame:
    """``Model.intersection`` — semi-join on all term columns.

    left_semi instead of inner avoids duplicate blow-up and lets AQE
    pick broadcast when one side is small. Only the LEFT side needs
    set-dedup (it defines the output); right-side duplicates cannot
    multiply a semi-join, so deduping them would be a wasted shuffle.
    """
    right = _term_proj(g2)
    return (
        _term_proj(g1).dropDuplicates(TERM_COLS)
        .alias("l")
        .join(right.alias("r"),
              [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in TERM_COLS],
              "left_semi")
    )


def triples_to_quads(triples: DataFrame, graph_iri: str) -> DataFrame:
    """≙ elephas ``TriplesToQuadsConstantGraphMapper``: place every
    triple in a constant named graph (``Quad.java:32`` adds the graph
    term)."""
    return triples.select(*TERM_COLS).withColumn("graph", F.lit(graph_iri))


def quads_to_triples(quads: DataFrame) -> DataFrame:
    """≙ elephas ``QuadsToTriplesMapper``: drop the graph term; set
    semantics re-applied (two graphs may hold the same triple)."""
    return quads.select(*TERM_COLS).dropDuplicates(TERM_COLS)


UNION_GRAPH = "urn:x-arq:UnionGraph"  # Quad.unionGraph (Quad.java:45)


def union_graph(quads: DataFrame) -> DataFrame:
    """The RDF merge of all NAMED graphs (``Quad.unionGraph``,
    ``jena-arq/.../sparql/core/Quad.java:37-45``): default-graph rows
    excluded, set semantics across graphs (the same triple asserted in
    two graphs appears once). Filter-then-dedup: callers that pattern-
    filter first only shuffle the matching slice."""
    return (
        quads.where(F.col("graph").isNotNull())
        .select(*TERM_COLS)
        .dropDuplicates(TERM_COLS)
    )


def find_in_graph(
    quads: DataFrame, g: str | None,
    s: TermSpec = ANY, p: TermSpec = ANY, o: TermSpec = ANY,
) -> DataFrame:
    """``Graph.find`` scoped to one named graph (OpQuadPattern /
    OpGraph, ``OpExecutor.java:143-182``); ``g=None`` matches the
    default graph (null graph column, ``Quad.defaultGraphIRI``
    sentinel role); ``g=UNION_GRAPH`` matches the deduplicated union
    of all named graphs (``Quad.unionGraph`` — TDB's unionDefaultGraph
    query mode)."""
    if g == UNION_GRAPH:
        matched = quads.where(
            pattern_predicate(s, p, o) & F.col("graph").isNotNull()
        )
        return (
            matched.select(*TERM_COLS).dropDuplicates(TERM_COLS)
            .withColumn("graph", F.lit(UNION_GRAPH))
        )
    cond = pattern_predicate(s, p, o) & (
        F.col("graph").isNull() if g is None else (F.col("graph") == g)
    )
    return quads.where(cond).select(*TERM_COLS, "graph")


def difference(g1: DataFrame, g2: DataFrame) -> DataFrame:
    """``Model.difference`` — anti-join on all term columns."""
    right = _term_proj(g2)
    return (
        _term_proj(g1).dropDuplicates(TERM_COLS)
        .alias("l")
        .join(right.alias("r"),
              [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in TERM_COLS],
              "left_anti")
    )


def cbd(triples: DataFrame, seeds: DataFrame) -> DataFrame:
    """Concise Bounded Description — Jena's default DESCRIBE handler
    (``jena-arq/.../sparql/core/describe/DescribeBNodeClosure.java``,
    closure calc ``jena-core/.../rdf/model/impl/ModelCom`` via
    ``Closure.closure``): all triples whose subject is a seed resource,
    recursing through blank-node OBJECTS (bnodes have no global
    identity, so their description belongs to the seed's).

    ``seeds`` is a ``(kind, val)`` frame. Distributed semi-naive loop:
    each round semi-joins the triple table against the NEW frontier
    only, and only bnode objects re-enter the frontier — bnode chains
    terminate (our KG: depth 1, conv -> turn bnodes), so the loop runs
    a handful of rounds; per-round frames are localCheckpointed to cut
    the replayed-lineage blowup (CLAUDE.md union-replay note)."""
    frontier = seeds.select("kind", "val").distinct().localCheckpoint(eager=True)
    visited = frontier
    out: DataFrame | None = None
    while not frontier.isEmpty():
        step = triples.alias("t").join(
            frontier.alias("f"),
            (F.col("t.s_kind") == F.col("f.kind"))
            & (F.col("t.s_val") == F.col("f.val")),
            "left_semi",
        ).select(*TERM_COLS)
        out = step if out is None else out.unionByName(step)
        nxt = (
            step.where(F.col("o_kind") == "bnode")
            .select(F.col("o_kind").alias("kind"), F.col("o_val").alias("val"))
            .distinct()
            .join(visited, ["kind", "val"], "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    if out is None:
        return triples.limit(0).select(*TERM_COLS)
    return out.dropDuplicates(TERM_COLS)
