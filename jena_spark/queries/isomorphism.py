"""Graph isomorphism — ``Model.isIsomorphicWith`` (jena-core).

Reference: ``jena-core/.../graph/impl/GraphMatcher.java`` (invoked by
``ModelCom.isIsomorphicWith`` / ``Graph.isIsomorphicWith``): two graphs
are isomorphic when a bnode bijection maps one onto the other; ground
terms must match exactly. Jena matches by driver-side backtracking
over bnode candidates.

Spark-first design — iterative COLOR REFINEMENT (the 1-WL / hash-
signature algorithm that also underlies RDF dataset canonicalization):

1. every term gets an initial color — ground terms hash their own
   identity, every bnode starts with one shared color;
2. each round, a bnode's color becomes the hash of the SORTED multiset
   of its incident edge signatures ``(direction, predicate,
   neighbor-color)`` — one groupBy per round, all JVM
   (``xxhash64`` + ``sort_array``/``collect_list``);
3. at fixpoint the canonical form replaces bnode labels by colors, and
   the two graphs compare as canonical-triple MULTISETS (multiplicity
   matters: two automorphic twin bnodes yield the same canonical
   triple twice — a set compare would collapse them and wrongly match
   a single-bnode graph).

Exactness: when refinement ends with every bnode uniquely colored
(injective within its graph), multiset equality IS isomorphism — the
color map is the bijection. When colors stay shared (automorphic or
WL-indistinguishable bnodes), equal multisets certify only
refinement-equivalence; ``strict=True`` (default) raises there instead
of guessing, ``strict=False`` accepts it (sound for automorphic twins,
the overwhelmingly common cause — GraphMatcher would resolve these by
backtracking, which has no distributed analog with bounded rounds).
A multiset MISMATCH always proves non-isomorphism, ambiguity or not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM


def _edge_sigs(g: DataFrame, colors: DataFrame) -> DataFrame:
    """(bnode label, edge signature hash) — one row per incident edge
    of each bnode, neighbor colors joined in."""
    s_is_b = F.col("s_kind") == "bnode"
    o_is_b = F.col("o_kind") == "bnode"
    # outgoing edges of subject-bnodes: sig(dir=out, p, color(object))
    out_e = (
        g.where(s_is_b)
        .join(colors.withColumnRenamed("term", "o_key"),
              F.concat_ws("\x00", "o_kind", "o_val",
                          F.coalesce("o_datatype", F.lit("")),
                          F.coalesce("o_lang", F.lit(""))) == F.col("o_key"))
        .select(F.col("s_val").alias("b"),
                F.xxhash64(F.lit("out"), F.col("p_val"),
                           F.col("color")).alias("sig"))
    )
    in_e = (
        g.where(o_is_b)
        .join(colors.withColumnRenamed("term", "s_key"),
              F.concat_ws("\x00", "s_kind", "s_val", F.lit(""), F.lit(""))
              == F.col("s_key"))
        .select(F.col("o_val").alias("b"),
                F.xxhash64(F.lit("in"), F.col("p_val"),
                           F.col("color")).alias("sig"))
    )
    return out_e.unionByName(in_e)


def _term_key(kind, val, dt, lang):
    return F.concat_ws("\x00", kind, val,
                       F.coalesce(dt, F.lit("")), F.coalesce(lang, F.lit("")))


def canonical_colors(g: DataFrame, max_rounds: int = 10) -> DataFrame:
    """(bnode label, final color, ambiguous) for every bnode of ``g``.
    ``ambiguous`` is true when the color is shared by >1 bnode at
    fixpoint."""
    spark = g.sparkSession
    bnodes = (
        g.where(F.col("s_kind") == "bnode").select(F.col("s_val").alias("b"))
        .unionByName(
            g.where(F.col("o_kind") == "bnode").select(F.col("o_val").alias("b")))
        .distinct()
    )
    # subject terms have no datatype/lang — hash with the SAME arity
    # and coalesce scheme as the object side, so a ground term seen in
    # both positions keys AND colors identically (two colors for one
    # term key would defeat the distinct and double _edge_sigs rows)
    ground_s = g.where(F.col("s_kind") != "bnode").select(
        _term_key("s_kind", "s_val", F.lit(None), F.lit(None)).alias("term"),
        F.xxhash64("s_kind", "s_val", F.lit(""), F.lit("")).alias("color"))
    ground_o = g.where(F.col("o_kind") != "bnode").select(
        _term_key("o_kind", "o_val", "o_datatype", "o_lang").alias("term"),
        F.xxhash64("o_kind", "o_val",
                   F.coalesce("o_datatype", F.lit("")),
                   F.coalesce("o_lang", F.lit(""))).alias("color"))
    ground = ground_s.unionByName(ground_o).distinct()

    bcolors = bnodes.select("b", F.lit(0).cast("long").alias("color"))
    n_colors = 1 if not bnodes.isEmpty() else 0
    for _ in range(max_rounds):
        colors = ground.unionByName(
            bcolors.select(
                _term_key(F.lit("bnode"), F.col("b"),
                          F.lit(None), F.lit(None)).alias("term"), "color"))
        sigs = _edge_sigs(g, colors)
        new = (
            bcolors.join(sigs, "b", "left")
            .groupBy("b", "color")
            .agg(F.xxhash64(
                F.col("color"),
                F.concat_ws(",", F.sort_array(F.collect_list("sig")))
            ).alias("new_color"))
            .select("b", F.col("new_color").alias("color"))
            .localCheckpoint(eager=True)
        )
        n_new = new.select("color").distinct().count()
        bcolors = new
        if n_new == n_colors:
            break
        n_colors = n_new
    dup = bcolors.groupBy("color").agg(F.count(F.lit(1)).alias("n"))
    return bcolors.join(dup, "color").select(
        "b", "color", (F.col("n") > 1).alias("ambiguous"))


def canonical_form(g: DataFrame, colors: DataFrame | None = None) -> DataFrame:
    """Triples with bnode labels replaced by their canonical color
    lexical (``c<hex>``) — plus a ``_mult`` count per canonical triple
    (multiset semantics; see module docstring)."""
    if colors is None:
        colors = canonical_colors(g)
    cmap = F.broadcast(colors.select(
        "b", F.format_string("c%016x", F.col("color")).alias("c")))
    out = (
        g.join(cmap.withColumnRenamed("b", "s_val")
               .withColumnRenamed("c", "s_c"), ["s_val"], "left")
        .join(cmap.withColumnRenamed("b", "o_val")
              .withColumnRenamed("c", "o_c"), ["o_val"], "left")
        .select(
            F.col("s_kind"),
            F.when(F.col("s_kind") == "bnode", F.col("s_c"))
            .otherwise(F.col("s_val")).alias("s_val"),
            F.col("p_val"), F.col("o_kind"),
            F.when(F.col("o_kind") == "bnode", F.col("o_c"))
            .otherwise(F.col("o_val")).alias("o_val"),
            F.col("o_datatype"), F.col("o_lang"))
    )
    return out.groupBy(*TM.TERM_COLS).agg(F.count(F.lit(1)).alias("_mult"))


def isomorphic(g1: DataFrame, g2: DataFrame, strict: bool = True,
               colors1: DataFrame | None = None,
               colors2: DataFrame | None = None) -> bool:
    """``Model.isIsomorphicWith`` analog (semantics in the module
    docstring). Inputs are triple SETS (the engine's invariant);
    multiplicity arises only from canonical bnode collapse.
    ``colors1``/``colors2``: precomputed :func:`canonical_colors`
    frames — refinement is the dominant cost, so a caller comparing
    one graph against several others computes its colors once."""
    c1 = canonical_colors(g1) if colors1 is None else colors1
    c2 = canonical_colors(g2) if colors2 is None else colors2
    f1, f2 = canonical_form(g1, c1), canonical_form(g2, c2)
    mismatch = not f1.exceptAll(f2).isEmpty() or not f2.exceptAll(f1).isEmpty()
    if mismatch:
        return False
    if strict and (
        not c1.where(F.col("ambiguous")).isEmpty()
        or not c2.where(F.col("ambiguous")).isEmpty()
    ):
        raise ValueError(
            "isomorphic: color refinement left indistinguishable blank "
            "nodes (automorphic or WL-equivalent); the multiset forms "
            "match but a bijection cannot be certified without "
            "backtracking — pass strict=False to accept "
            "refinement-equivalence (GraphMatcher.java is the exact "
            "driver-side reference)")
    return True
