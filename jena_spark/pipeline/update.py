"""SPARQL Update semantics over the triple table (§2.10).

Reference: ``UpdateEngineMain`` dispatches request objects
(``jena-arq/.../sparql/modify/UpdateEngineMain.java:32``,
``UpdateEngineWorker.java:63``; request classes in
``sparql/modify/request/``): INSERT DATA / DELETE DATA
(``UpdateDataInsert``/``UpdateDataDelete``), DELETE WHERE
(``UpdateDeleteWhere``), DELETE/INSERT WHERE (``UpdateDeleteInsert``),
CLEAR (``UpdateClear``).

Spark mapping: the triple table is a DataFrame/Iceberg relation, so
updates are relational algebra producing the next table version —
INSERT = union + set-dedup (Graph.add no-op-on-duplicate semantics,
``Graph.java:84``), DELETE = null-safe anti-join, DELETE/INSERT WHERE =
one read-modify-write pass (Iceberg ``MERGE INTO`` shape; in the
sandbox, full-snapshot rewrite). All operations are pure plans — the
caller owns materialization/commit, which is what makes them
checkpoint/resume-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.queries.graph import TermSpec, pattern_predicate
from jena_spark.terms import TERM_COLS


def _norm(df: DataFrame) -> DataFrame:
    return df.select(*TERM_COLS)


def insert_data(triples: DataFrame, new_triples: DataFrame) -> DataFrame:
    """INSERT DATA — set union (duplicate add is a no-op)."""
    return _norm(triples).unionByName(_norm(new_triples)).dropDuplicates(TERM_COLS)


def delete_data(triples: DataFrame, gone: DataFrame) -> DataFrame:
    """DELETE DATA — remove exactly the given ground triples."""
    left = _norm(triples).alias("l")
    right = _norm(gone).alias("r")
    cond = None
    for c in TERM_COLS:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        cond = eq if cond is None else cond & eq
    return left.join(right, cond, "left_anti")


def delete_where(
    triples: DataFrame,
    s: TermSpec = None, p: TermSpec = None, o: TermSpec = None,
) -> DataFrame:
    """DELETE WHERE { pattern } — drop every match of one triple pattern."""
    return _norm(triples).where(~pattern_predicate(s, p, o))


def delete_insert_where(
    triples: DataFrame,
    s: TermSpec = None, p: TermSpec = None, o: TermSpec = None,
    set_object: tuple | None = None,
    set_predicate: str | None = None,
) -> DataFrame:
    """DELETE/INSERT WHERE — one-pass read-modify-write: rows matching
    the pattern are rewritten (object and/or predicate replaced), all
    other rows pass through; set semantics re-applied afterwards.

    This is the Iceberg ``MERGE INTO ... WHEN MATCHED THEN UPDATE``
    shape: a single scan, no join, fully vectorized.
    """
    # materialize the match flag BEFORE any column rewrite, so a
    # predicate rewrite cannot change what the object rewrite matches
    out = _norm(triples).withColumn("_m", pattern_predicate(s, p, o))
    m = F.col("_m")
    if set_predicate is not None:
        out = out.withColumn(
            "p_val", F.when(m, F.lit(set_predicate)).otherwise(F.col("p_val"))
        )
    if set_object is not None:
        kind, val, *rest = set_object
        datatype = rest[0] if len(rest) > 0 else None
        lang = rest[1] if len(rest) > 1 else None
        out = (
            out.withColumn("o_kind", F.when(m, F.lit(kind)).otherwise(F.col("o_kind")))
            .withColumn("o_val", F.when(m, F.lit(val)).otherwise(F.col("o_val")))
            .withColumn("o_datatype",
                        F.when(m, F.lit(datatype).cast("string")).otherwise(F.col("o_datatype")))
            .withColumn("o_lang",
                        F.when(m, F.lit(lang).cast("string")).otherwise(F.col("o_lang")))
        )
    return out.drop("_m").dropDuplicates(TERM_COLS)


def clear(triples: DataFrame) -> DataFrame:
    """CLEAR — empty graph with the same schema."""
    return _norm(triples).limit(0)


# --- graph-level update operations over quad tables -------------------------
# Reference: ``sparql/modify/request/Update{Load,Add,Copy,Move}.java``,
# executed by ``UpdateEngineWorker.visit(...)``. A quad table is a
# DataFrame with TERM_COLS + ``graph`` (NULL = default graph).

QUAD_COLS = [*TERM_COLS, "graph"]


def _norm_quads(df: DataFrame) -> DataFrame:
    return df.select(*QUAD_COLS)


def _graph_eq(col, graph: str | None):
    return F.col(col).isNull() if graph is None else F.col(col) == graph


def load(quads: DataFrame, document: DataFrame, graph: str | None = None) -> DataFrame:
    """LOAD <doc> [INTO GRAPH g] — union a parsed document's triples
    (e.g. :func:`jena_spark.sources.ntriples.read_ntriples` /
    ``read_turtle`` output) into the target graph, set semantics."""
    doc = _norm(document).withColumn("graph", F.lit(graph).cast("string"))
    return _norm_quads(quads).unionByName(doc).dropDuplicates(QUAD_COLS)


def add_graph(quads: DataFrame, src: str | None, dst: str | None) -> DataFrame:
    """ADD src TO dst — copy src's triples into dst, keep src, set
    semantics in dst (``UpdateAdd.java``)."""
    if src == dst:
        return _norm_quads(quads)
    copied = (
        _norm_quads(quads).where(_graph_eq("graph", src))
        .withColumn("graph", F.lit(dst).cast("string"))
    )
    return _norm_quads(quads).unionByName(copied).dropDuplicates(QUAD_COLS)


def copy_graph(quads: DataFrame, src: str | None, dst: str | None) -> DataFrame:
    """COPY src TO dst — dst := src exactly (old dst dropped,
    ``UpdateCopy.java``)."""
    if src == dst:
        return _norm_quads(quads)
    kept = _norm_quads(quads).where(~_graph_eq("graph", dst))
    copied = (
        _norm_quads(quads).where(_graph_eq("graph", src))
        .withColumn("graph", F.lit(dst).cast("string"))
    )
    return kept.unionByName(copied)


def move_graph(quads: DataFrame, src: str | None, dst: str | None) -> DataFrame:
    """MOVE src TO dst — COPY then DROP src (``UpdateMove.java``)."""
    if src == dst:
        return _norm_quads(quads)
    return copy_graph(quads, src, dst).where(~_graph_eq("graph", src))
