"""Property functions — table-generating "magic predicates" (§2.9).

Reference: registry ``jena-arq/.../sparql/pfunction/PropertyFunctionRegistry.java``,
library of 21 built-ins under ``sparql/pfunction/library/`` (e.g.
``list:member``, ``apf:strSplit``, ``apf:splitIRI``), executed via
``OpPropFunc`` (``OpExecutor.java:198``). A property function consumes
a binding row and yields 0..n rows — in Spark that is exactly
``explode`` over a generated array (or a projection for 1:1 functions),
staying fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def str_split(bindings: DataFrame, src: Column, out_var: str, sep: str = " ") -> DataFrame:
    """apf:strSplit — one output row per split part (order not
    significant, SPARQL set semantics)."""
    return bindings.withColumn(out_var, F.explode(F.split(src, sep)))


def split_iri(bindings: DataFrame, iri: Column, ns_var: str, local_var: str) -> DataFrame:
    """apf:splitIRI — namespace / local-name decomposition (1:1)."""
    return bindings.withColumn(
        ns_var, F.regexp_extract(iri, r"^(.*[#/])", 1)
    ).withColumn(local_var, F.regexp_extract(iri, r"([^#/]*)$", 1))


def list_member(bindings: DataFrame, arr: Column, out_var: str) -> DataFrame:
    """list:member — one row per element of a collection column."""
    return bindings.withColumn(out_var, F.explode(arr))


def list_index(bindings: DataFrame, arr: Column, idx_var: str, member_var: str) -> DataFrame:
    """list:index (``pfunction/library/listIndex.java``) — one row per
    (0-based position, member)."""
    return bindings.select("*", F.posexplode(arr).alias(idx_var, member_var))


def list_length(bindings: DataFrame, arr: Column, out_var: str) -> DataFrame:
    """list:length (``listLength.java``) — 1:1 length binding."""
    return bindings.withColumn(out_var, F.size(arr))


def concat(bindings: DataFrame, out_var: str, *parts: Column) -> DataFrame:
    """apf:concat (``concat.java``) — object := concat of subject list."""
    return bindings.withColumn(out_var, F.concat(*parts))


def seq(bindings: DataFrame, arr: Column, idx_var: str, member_var: str) -> DataFrame:
    """apf:seq / rdf:Seq membership (``seq.java``) — ordered container:
    one row per member with its 1-based ordinal (rdf:_n)."""
    out = bindings.select("*", F.posexplode(arr).alias("_p", member_var))
    return out.withColumn(idx_var, F.col("_p") + 1).drop("_p")


def bag(bindings: DataFrame, arr: Column, member_var: str) -> DataFrame:
    """apf:bag / rdf:Bag membership (``bag.java``) — unordered container:
    one row per member, no ordinal."""
    return bindings.select("*", F.explode(arr).alias(member_var))


def alt(bindings: DataFrame, arr: Column, member_var: str) -> DataFrame:
    """rdf:Alt membership (``alt.java``) — same row shape as bag; the
    Alt/Bag distinction is container typing, not iteration order."""
    return bindings.select("*", F.explode(arr).alias(member_var))


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def container(bindings: DataFrame, arr: Column, prop_var: str, member_var: str) -> DataFrame:
    """Generic container membership (``container.java``): one row per
    member with its ``rdf:_n`` membership property IRI."""
    out = bindings.select("*", F.posexplode(arr).alias("_p", member_var))
    return out.withColumn(
        prop_var, F.concat(F.lit(RDF_NS + "_"), (F.col("_p") + 1).cast("string"))
    ).drop("_p")


def assign(bindings: DataFrame, out_var: str, value: Column) -> DataFrame:
    """apf:assign (``assign.java``) — bind a computed value (BIND/extend
    through the property-function surface); 1:1."""
    return bindings.withColumn(out_var, value)


def bnode_pf(bindings: DataFrame, src: Column, out_var: str) -> DataFrame:
    """apf:bnode / apf:blankNode (``bnode.java``): for a bnode-kind term
    struct, bind its label as a plain literal; non-bnodes yield no row
    (filter semantics)."""
    return bindings.where(src.getField("kind") == "bnode").withColumn(
        out_var, src.getField("val")
    )


def str_pf(bindings: DataFrame, src: Column, out_var: str) -> DataFrame:
    """apf:str (``str.java``): lexical form of any term struct; 1:1."""
    return bindings.withColumn(out_var, src.getField("val"))


def split_uri(bindings: DataFrame, iri: Column, ns_var: str, local_var: str) -> DataFrame:
    """apf:splitURI (``splitURI.java``) — alias of splitIRI."""
    return split_iri(bindings, iri, ns_var, local_var)


ENGINE_VERSION = "jena-spark/0.2"


def version(bindings: DataFrame, out_var: str) -> DataFrame:
    """apf:versionARQ (``versionARQ.java``): bind the engine version
    string (deterministic constant, not a timestamp)."""
    return bindings.withColumn(out_var, F.lit(ENGINE_VERSION))


# --- registry (PropertyFunctionRegistry parity) -----------------------------
# ``sparql/pfunction/PropertyFunctionRegistry.java:40`` maps property
# IRIs to factories; same shape here — IRI -> callable. The one
# ``triple/*`` library member (``TripleTermFind``) registers at its
# reference IRI ``http://arq/find`` with the graph-level signature
# (it enumerates the graph, not a bindings column).

APF = "http://jena.apache.org/ARQ/property#"
LISTF = "http://jena.apache.org/ARQ/list#"

PROPERTY_FUNCTIONS = {
    APF + "strSplit": str_split,
    APF + "splitIRI": split_iri,
    APF + "splitURI": split_uri,
    APF + "concat": concat,
    APF + "assign": assign,
    APF + "bnode": bnode_pf,
    APF + "blankNode": bnode_pf,
    APF + "str": str_pf,
    APF + "bag": bag,
    APF + "alt": alt,
    APF + "seq": seq,
    APF + "container": container,
    APF + "versionARQ": version,
    APF + "version": version,  # version.java — same binding as versionARQ
    LISTF + "member": list_member,
    LISTF + "index": list_index,
    LISTF + "length": list_length,
}

# jena-spatial property functions (graph-level signature, like
# apf:find below): registered lazily to keep this module's import
# light — ``pfunction/library/IsNearByPF.java`` etc.
def _spatial_pfs():
    from jena_spark.queries import spatial as SP
    from jena_spark.queries import textindex as TI

    return {
        SP.SPATIAL_NS + "nearby": SP.nearby_pf,
        SP.SPATIAL_NS + "withinCircle": SP.nearby_pf,
        SP.SPATIAL_NS + "withinBox": SP.within_box_pf,
        SP.SPATIAL_NS + "intersectBox": SP.within_box_pf,
        SP.SPATIAL_NS + "north": SP.north_pf,
        SP.SPATIAL_NS + "south": SP.south_pf,
        SP.SPATIAL_NS + "east": SP.east_pf,
        SP.SPATIAL_NS + "west": SP.west_pf,
        # jena-text's query PF shares the graph-level convention
        # (``TextQueryPF.java``; registered at text:query like the
        # TextDatasetFactory wiring does)
        TI.TEXT_NS + "query": TI.text_query_pf,
    }


_SPATIAL_LOADED = False

#: IRIs whose registered callable follows the GRAPH-LEVEL calling
#: convention — ``fn(triple_table, *constant_args) -> DataFrame`` with
#: an ``ent`` binding column (optionally ``ent_kind``) — the only
#: convention the SPARQL string front-end can dispatch. The rest of
#: the library is bindings-level (``fn(bindings, Column, out_var,...)``)
#: and is reachable from the Python algebra surface only.
GRAPH_LEVEL_IRIS: set[str] = set()


def _ensure_spatial() -> None:
    """Lazy one-shot spatial registration. ``setdefault`` per key —
    never clobbers an IRI the user already ``register()``-ed
    (PropertyFunctionRegistry.put wins over the library default)."""
    global _SPATIAL_LOADED
    if _SPATIAL_LOADED:
        return
    for iri, fn in _spatial_pfs().items():
        if iri not in PROPERTY_FUNCTIONS:
            PROPERTY_FUNCTIONS[iri] = fn
            GRAPH_LEVEL_IRIS.add(iri)
        # else: the user registered this IRI first — keep BOTH their
        # function and their declared calling convention
    _SPATIAL_LOADED = True


def lookup(iri: str):
    """Registry lookup incl. the lazily-registered spatial family."""
    if iri not in PROPERTY_FUNCTIONS:
        _ensure_spatial()
    return PROPERTY_FUNCTIONS.get(iri)


def graph_level(iri: str) -> bool:
    """True iff ``iri`` is registered with the graph-level calling
    convention (dispatchable from SPARQL strings)."""
    _ensure_spatial()
    return iri in GRAPH_LEVEL_IRIS


def register(iri: str, fn, *, graph_level: bool = False) -> None:
    """PropertyFunctionRegistry.put analog. ``graph_level=True``
    declares the string-front-end calling convention (see
    :data:`GRAPH_LEVEL_IRIS`)."""
    PROPERTY_FUNCTIONS[iri] = fn
    if graph_level:
        GRAPH_LEVEL_IRIS.add(iri)
    else:
        GRAPH_LEVEL_IRIS.discard(iri)


def triple_term_find(triples: DataFrame, s_var: str, p_var: str,
                     o_var: str, t_var: str) -> DataFrame:
    """``<< ?s ?p ?o >> apf:find ?t`` (``pfunction/library/triple/
    TripleTermFind.java``, registered at ``http://arq/find``): one
    binding row per asserted triple of the graph — the component
    variables bound to (s, p, o) and ``?t`` to the quoted-triple term
    for that triple. The quoted lexical is built JVM-side
    (:func:`jena_spark.queries.rdfstar.quoted_of_row`) — a narrow
    projection of the scan, no shuffle."""
    from jena_spark.queries.rdfstar import quoted_of_row

    def var_struct(kind, val, datatype=None, lang=None):
        return F.struct(
            kind.alias("kind"), val.alias("val"),
            (datatype if datatype is not None else F.lit("")).alias("datatype"),
            (lang if lang is not None else F.lit("")).alias("lang"),
        )

    return triples.select(
        var_struct(F.col("s_kind"), F.col("s_val")).alias(s_var),
        var_struct(F.lit("iri"), F.col("p_val")).alias(p_var),
        var_struct(F.col("o_kind"), F.col("o_val"),
                   F.coalesce(F.col("o_datatype"), F.lit("")),
                   F.coalesce(F.col("o_lang"), F.lit(""))).alias(o_var),
        var_struct(F.lit("triple"), quoted_of_row()).alias(t_var),
    )


# TripleTermFind registers at its reference IRI (defined below the
# registry literal, hence the post-assignment)
PROPERTY_FUNCTIONS["http://arq/find"] = triple_term_find
