"""Ontology API — the OntModel query surface (jena-core).

Reference (paths relative to /root/reference):
``jena-core/.../ontology/OntModel.java`` (listClasses,
listObjectProperties/DatatypeProperties/AnnotationProperties,
listIndividuals), ``OntClass.java`` (listSubClasses/listSuperClasses
with the ``direct`` flag, listInstances), ``OntTools.java``
(findShortestPath). The reference walks driver-side iterators over an
in-memory graph; here every listing is a DataFrame plan over the
triple table and the hierarchy closure runs on the engine's
semi-naive encoded iteration (``queries/paths.one_or_more``) — class
hierarchies are usually TBox-small, but nothing breaks when they are
not (a loaded million-class ontology stays distributed).

Vocabulary handling matches the no-reasoner OntModel profile
(``OntModelSpec.OWL_MEM``): listings return EXPLICITLY declared
entities; ``direct=False`` hierarchy walks entail through the
transitive closure of asserted subClassOf edges (what
``OntClass.listSubClasses(false)`` reaches with the transitive-class
reasoner bound, the usual deployment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

RDFS_CLASS = RDFS + "Class"
RDFS_SUBCLASS = RDFS + "subClassOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
OWL_CLASS = OWL + "Class"
RDF_PROPERTY = RDF + "Property"

_PROP_TYPES = {
    "object": OWL + "ObjectProperty",
    "datatype": OWL + "DatatypeProperty",
    "annotation": OWL + "AnnotationProperty",
    "functional": OWL + "FunctionalProperty",
    "inverse_functional": OWL + "InverseFunctionalProperty",
    "transitive": OWL + "TransitiveProperty",
    "symmetric": OWL + "SymmetricProperty",
}


def _typed(triples: DataFrame, type_iris: list[str]) -> DataFrame:
    return (
        triples.where((F.col("p_val") == TM.RDF_TYPE)
                      & F.col("o_val").isin(type_iris))
        .select(F.col("s_kind").alias("kind"), F.col("s_val").alias("iri"))
        .distinct()
    )


def list_classes(triples: DataFrame) -> DataFrame:
    """``OntModel.listClasses`` — explicitly declared owl/rdfs classes
    (kind, iri)."""
    return _typed(triples, [OWL_CLASS, RDFS_CLASS])


def list_properties(triples: DataFrame, kind: str | None = None) -> DataFrame:
    """``OntModel.listAllOntProperties`` / ``listObjectProperties`` /
    ``listDatatypeProperties`` / ... — ``kind`` one of
    object/datatype/annotation/functional/inverse_functional/
    transitive/symmetric, or None for every declared property."""
    if kind is None:
        return _typed(triples, [RDF_PROPERTY, *_PROP_TYPES.values()])
    if kind not in _PROP_TYPES:
        raise ValueError(f"ontology: unknown property kind {kind!r} "
                         f"(one of {sorted(_PROP_TYPES)})")
    return _typed(triples, [_PROP_TYPES[kind]])


def _subclass_closure(triples: DataFrame) -> DataFrame:
    """(sub, sup) pairs under transitive subClassOf entailment —
    encoded semi-naive iteration, decode at end."""
    from jena_spark.queries.paths import one_or_more

    edges = triples.where(F.col("p_val") == RDFS_SUBCLASS).select(
        F.col("s_kind").alias("src_kind"), F.col("s_val").alias("src_val"),
        F.col("o_kind").alias("dst_kind"), F.col("o_val").alias("dst_val"),
    )
    return one_or_more(edges).select(
        F.col("src_val").alias("sub"), F.col("dst_val").alias("sup"))


def sub_classes(triples: DataFrame, cls: str, direct: bool = False) -> DataFrame:
    """``OntClass.listSubClasses(direct)`` -> one ``iri`` column."""
    if direct:
        return (
            triples.where((F.col("p_val") == RDFS_SUBCLASS)
                          & (F.col("o_val") == cls))
            .select(F.col("s_val").alias("iri")).distinct()
        )
    cc = _subclass_closure(triples)
    return cc.where(F.col("sup") == cls).select(
        F.col("sub").alias("iri")).distinct()


def super_classes(triples: DataFrame, cls: str, direct: bool = False) -> DataFrame:
    """``OntClass.listSuperClasses(direct)``."""
    if direct:
        return (
            triples.where((F.col("p_val") == RDFS_SUBCLASS)
                          & (F.col("s_val") == cls))
            .select(F.col("o_val").alias("iri")).distinct()
        )
    cc = _subclass_closure(triples)
    return cc.where(F.col("sub") == cls).select(
        F.col("sup").alias("iri")).distinct()


def list_individuals(triples: DataFrame, cls: str | None = None,
                     direct: bool = True) -> DataFrame:
    """``OntModel.listIndividuals(cls)`` / ``OntClass.listInstances``:
    (kind, iri) of instances — ``direct=False`` includes instances of
    entailed subclasses (rdfs9 through the closure)."""
    typed = triples.where(F.col("p_val") == TM.RDF_TYPE)
    if cls is None:
        # individuals = subjects typed with a DECLARED class
        return (
            typed.join(
                F.broadcast(list_classes(triples)
                            .withColumnRenamed("iri", "o_val")
                            .withColumnRenamed("kind", "o_kind")),
                ["o_kind", "o_val"], "left_semi")
            .select(F.col("s_kind").alias("kind"), F.col("s_val").alias("iri"))
            .distinct()
        )
    if direct:
        return (
            typed.where(F.col("o_val") == cls)
            .select(F.col("s_kind").alias("kind"), F.col("s_val").alias("iri"))
            .distinct()
        )
    subs = sub_classes(triples, cls).select(F.col("iri").alias("o_val"))
    return (
        typed.join(F.broadcast(
            subs.unionByName(
                subs.sparkSession.createDataFrame([(cls,)], "o_val string"))
            .distinct()), "o_val", "left_semi")
        .select(F.col("s_kind").alias("kind"), F.col("s_val").alias("iri"))
        .distinct()
    )


def properties_of_class(triples: DataFrame, cls: str) -> DataFrame:
    """Properties whose ``rdfs:domain`` is ``cls`` (the core of
    ``OntClass.listDeclaredProperties``'s direct case)."""
    return (
        triples.where((F.col("p_val") == RDFS_DOMAIN)
                      & (F.col("o_val") == cls))
        .select(F.col("s_val").alias("iri")).distinct()
    )


def shortest_path(triples: DataFrame, src: str, dst: str,
                  predicate: str | Column | None = None,
                  max_hops: int = 15) -> list[str] | None:
    """``OntTools.findShortestPath`` analog: breadth-first search from
    ``src`` to ``dst`` over edges whose predicate passes ``predicate``
    (an IRI string, a Column predicate over ``p_val``, or None for all).

    Distributed BFS: the frontier is a DataFrame of (node, path) rows;
    each round joins the frontier to the (narrow, reusable) edge
    table, keeps the lexicographically smallest path per newly-reached
    node (deterministic tie-break — the reference's iterator order is
    insertion order, which has no distributed meaning), and
    localCheckpoints to cut lineage. Returns the node list of one
    shortest path, or None. The reference walks a driver-side queue
    (``OntTools.java`` findShortestPath); this shape survives graphs
    whose frontier never fits a driver."""
    if isinstance(predicate, str):
        cond = F.col("p_val") == predicate
    elif predicate is not None:
        cond = predicate
    else:
        cond = F.lit(True)
    edges = (
        triples.where(cond & (F.col("o_kind") != "literal"))
        .select(F.col("s_val").alias("src"), F.col("o_val").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    spark = triples.sparkSession
    if src == dst:
        return [src]
    frontier = spark.createDataFrame([(src, [src])],
                                     "node string, path array<string>")
    visited = frontier.select("node")
    for _ in range(max_hops):
        step = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"),
                    F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"))
            .join(visited, "node", "left_anti")
            .groupBy("node").agg(F.min("path").alias("path"))
            .localCheckpoint(eager=True)
        )
        hit = step.where(F.col("node") == dst).select("path").collect()
        if hit:
            return list(hit[0]["path"])
        if step.isEmpty():
            return None
        visited = visited.unionByName(step.select("node")).distinct() \
            .localCheckpoint(eager=True)
        frontier = step
    return None


_RESTRICTION_KINDS = {
    OWL + "someValuesFrom": "someValuesFrom",
    OWL + "allValuesFrom": "allValuesFrom",
    OWL + "hasValue": "hasValue",
    OWL + "cardinality": "cardinality",
    OWL + "minCardinality": "minCardinality",
    OWL + "maxCardinality": "maxCardinality",
}


def list_restrictions(triples: DataFrame) -> DataFrame:
    """``OntModel.listRestrictions`` + the per-kind accessors
    (``ontology/Restriction.java`` family): every ``owl:Restriction``
    node with its ``owl:onProperty`` and constraint facet, one row per
    (restriction, on_property, kind, value_kind, value). A TBox-shaped
    filtered self-join — no driver parsing, so a generated ontology
    with millions of restrictions stays distributed."""
    res = triples.where(
        (F.col("p_val") == TM.RDF_TYPE) & (F.col("o_val") == OWL + "Restriction")
    ).select(F.col("s_kind").alias("r_kind"), F.col("s_val").alias("r_val"))
    onprop = triples.where(F.col("p_val") == OWL + "onProperty").select(
        F.col("s_kind").alias("r_kind"), F.col("s_val").alias("r_val"),
        F.col("o_val").alias("on_property"))
    facets = triples.where(
        F.col("p_val").isin(list(_RESTRICTION_KINDS))
    ).select(
        F.col("s_kind").alias("r_kind"), F.col("s_val").alias("r_val"),
        F.col("p_val").alias("facet_iri"),
        F.col("o_kind").alias("value_kind"), F.col("o_val").alias("value"))
    kind_map = F.create_map(
        *[x for iri, name in sorted(_RESTRICTION_KINDS.items())
          for x in (F.lit(iri), F.lit(name))])
    return (
        res.join(onprop, ["r_kind", "r_val"])
        .join(facets, ["r_kind", "r_val"])
        .select(
            F.col("r_kind").alias("restriction_kind"),
            F.col("r_val").alias("restriction"),
            "on_property",
            kind_map[F.col("facet_iri")].alias("kind"),
            "value_kind", "value")
    )
