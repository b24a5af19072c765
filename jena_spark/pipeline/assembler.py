"""Assembler — config-driven model/dataset construction (jena-core).

Reference (paths relative to /root/reference): the assembler vocabulary
``jena-core/.../assembler/JA.java:29`` (namespace
``http://jena.hpl.hp.com/2005/11/Assembler#``), the recursive-descent
construction in ``assembler/assemblers/`` (``MemoryModelAssembler``,
``DefaultModelAssembler``, ``UnionModelAssembler``,
``InfModelAssembler``, ``ContentAssembler``), root discovery
``AssemblerHelp.findAssemblerRoots``, and jena-arq's dataset assembler
(``ja:RDFDataset`` with ``ja:defaultGraph`` / ``ja:namedGraph``,
``jena-arq/.../sparql/core/assembler/DatasetAssembler.java``).

Spark-first: the assembler description is a TINY configuration graph
(TBox posture), so it is driver-parsed from the triple frame; every
assembled artifact is a DataFrame plan — ja:content loads parse
through the engine's own RIOT readers (distributed ``read_rdf`` for
``ja:externalContent`` files, the pure-Python Turtle parser for
``ja:literalContent`` strings — those are config-size by definition),
union models are plan unions with set semantics, and ja:InfModel
applies the distributed inference closures. The result is a triple /
quad DataFrame (wrapped in a :class:`~jena_spark.pipeline.api.Connection`
for datasets) — construction never collects data to the driver.

Supported (errors loudly outside this profile):

* ``ja:MemoryModel`` / ``ja:DefaultModel`` / ``ja:Model`` with any
  number of ``ja:content`` nodes (``ja:literalContent`` Turtle string
  or ``ja:externalContent`` file IRI/path read via the RDFLanguages
  dispatch)
* ``ja:UnionModel`` with ``ja:rootModel`` / ``ja:subModel`` members
  (set-semantics union — Jena's MultiUnion graph)
* ``ja:InfModel`` with ``ja:baseModel`` and ``ja:reasoner
  [ja:reasonerURL <...#RDFSRuleReasoner|...#OWLFBRuleReasoner>]``
  (RDFS closure; OWL additionally runs the property-characteristic
  rules; ``GenericRuleReasoner`` takes custom rules via inline
  ``ja:rules`` strings and/or ``ja:rulesFrom`` files, evaluated by
  :mod:`jena_spark.pipeline.rules`)
* ``ja:RDFDataset`` with ``ja:defaultGraph`` and ``ja:namedGraph
  [ja:graphName <g> ; ja:graph <model>]`` -> Connection over quads
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.pipeline.api import Connection

JA = "http://jena.hpl.hp.com/2005/11/Assembler#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_MODEL_TYPES = (JA + "MemoryModel", JA + "DefaultModel", JA + "Model")

_RDFS_REASONERS = (
    "http://jena.hpl.hp.com/2003/RDFSExptRuleReasoner",
    "http://jena.hpl.hp.com/2003/RDFSRuleReasoner",
)
_OWL_REASONERS = (
    "http://jena.hpl.hp.com/2003/OWLFBRuleReasoner",
    "http://jena.hpl.hp.com/2003/OWLMicroFBRuleReasoner",
    "http://jena.hpl.hp.com/2003/OWLMiniFBRuleReasoner",
)
# GenericRuleReasonerFactory.URI (GenericRuleReasonerFactory.java:36)
_GENERIC_RULE_REASONER = "http://jena.hpl.hp.com/2003/GenericRuleReasoner"

_CONFIG_LIMIT = 100_000


class _Desc:
    """Driver-side index of the (tiny) assembler description graph."""

    def __init__(self, config: DataFrame):
        n = config.limit(_CONFIG_LIMIT + 1).count()
        if n > _CONFIG_LIMIT:
            raise ValueError(
                f"assembler: description graph exceeds {_CONFIG_LIMIT} "
                "triples — descriptions are driver-parsed (TBox posture)")
        self.by_subj: dict[tuple, dict] = {}
        for r in config.select(*TM.TERM_COLS).collect():
            self.by_subj.setdefault((r["s_kind"], r["s_val"]), {}).setdefault(
                r["p_val"], []).append((r["o_kind"], r["o_val"],
                                        r["o_datatype"], r["o_lang"]))

    def po(self, node: tuple) -> dict:
        return self.by_subj.get(node[:2], {})

    def one(self, node: tuple, prop: str):
        v = self.po(node).get(JA + prop)
        return v[0] if v else None

    def many(self, node: tuple, prop: str) -> list:
        return self.po(node).get(JA + prop, [])

    def types(self, node: tuple) -> set[str]:
        return {t[1] for t in self.po(node).get(RDF_TYPE, []) if t[0] == "iri"}

    def roots(self) -> list[tuple]:
        """AssemblerHelp root discovery: described model/dataset nodes
        that are not a sub-part of another description."""
        sub_parts = {
            t[:2]
            for po in self.by_subj.values()
            for p in ("baseModel", "rootModel", "subModel", "graph",
                      "defaultGraph", "reasoner", "content", "namedGraph")
            for t in po.get(JA + p, [])
        }
        wanted = set(_MODEL_TYPES) | {JA + "UnionModel", JA + "InfModel",
                                      JA + "RDFDataset"}
        return sorted(
            s for s, po in self.by_subj.items()
            if s not in sub_parts
            and any(t[1] in wanted for t in po.get(RDF_TYPE, [])
                    if t[0] == "iri")
        )


def _empty_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], ", ".join(f"{c} string" for c in TM.TERM_COLS))


def _content(spark: SparkSession, desc: _Desc, node: tuple) -> DataFrame:
    """ContentAssembler: ja:literalContent (inline Turtle) or
    ja:externalContent (file through the RDFLanguages dispatch)."""
    lit = desc.one(node, "literalContent")
    if lit is not None:
        from jena_spark.sources.turtle import parse_turtle

        # ContentAssembler.java:174-180 — literal content is parsed
        # with the standard preamble prefixes prepended
        preamble = (
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
            "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
            "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
            "@prefix dc: <http://purl.org/dc/elements/1.1/> .\n")
        rows = parse_turtle(preamble + lit[1])
        return (spark.createDataFrame(rows, ", ".join(
            f"{c} string" for c in TM.TERM_COLS))
            if rows else _empty_triples(spark))
    ext = desc.one(node, "externalContent")
    if ext is not None:
        from jena_spark.sources.languages import read_rdf

        path = ext[1]
        if path.startswith("file://"):
            path = path[len("file://"):]
        return read_rdf(spark, path).select(*TM.TERM_COLS)
    raise ValueError(
        "assembler: ja:Content needs ja:literalContent or "
        "ja:externalContent")


def _model(spark: SparkSession, desc: _Desc, node: tuple,
           _seen: frozenset = frozenset()) -> DataFrame:
    if node[:2] in _seen:
        raise ValueError(
            f"assembler: cyclic model description at <{node[1]}>")
    _seen = _seen | {node[:2]}
    types = desc.types(node)
    if types & set(_MODEL_TYPES) or not types:
        # a bare node with only ja:content is a MemoryModel by default
        # (DefaultModelAssembler behavior)
        out = _empty_triples(spark)
        parts = [_content(spark, desc, c) for c in desc.many(node, "content")]
        for p in parts:
            out = out.unionByName(p)
        return out.dropDuplicates(TM.TERM_COLS)
    if JA + "UnionModel" in types:
        members = desc.many(node, "rootModel") + desc.many(node, "subModel")
        if not members:
            raise ValueError("assembler: ja:UnionModel without members")
        out = _model(spark, desc, members[0], _seen)
        for m in members[1:]:
            out = out.unionByName(_model(spark, desc, m, _seen))
        return out.dropDuplicates(TM.TERM_COLS)
    if JA + "InfModel" in types:
        base = desc.one(node, "baseModel")
        if base is None:
            raise ValueError("assembler: ja:InfModel without ja:baseModel")
        g = _model(spark, desc, base, _seen)
        reasoner = desc.one(node, "reasoner")
        url = desc.one(reasoner, "reasonerURL") if reasoner else None
        if url is None:
            raise ValueError(
                "assembler: ja:InfModel needs ja:reasoner "
                "[ja:reasonerURL <...>]")
        from jena_spark.pipeline.inference import (
            owl_property_closure,
            rdfs_closure,
        )

        if url[1] in _RDFS_REASONERS:
            return rdfs_closure(g)
        if url[1] in _OWL_REASONERS:
            return owl_property_closure(rdfs_closure(g))
        if url[1] == _GENERIC_RULE_REASONER:
            # ReasonerFactoryAssembler + RuleSetAssembler
            # (jena-core/.../assembler/assemblers/RuleSetAssembler.java):
            # ja:rules inline strings (JA.java:58) and ja:rulesFrom
            # files (JA.java:140), concatenated like RuleSet.create
            from jena_spark.pipeline.rules import rule_closure

            parts = [
                t[1] for t in desc.many(reasoner, "rules")
                if t[0] == "literal"
            ]
            for t in desc.many(reasoner, "rulesFrom"):
                path = t[1].removeprefix("file:")
                with open(path) as fh:
                    parts.append(fh.read())
            if not parts:
                raise ValueError(
                    "assembler: GenericRuleReasoner needs ja:rules "
                    "(inline rule text) or ja:rulesFrom (file)")
            return rule_closure(g, "\n".join(parts))
        raise ValueError(f"assembler: unsupported reasonerURL <{url[1]}>")
    raise ValueError(f"assembler: unsupported model type(s) {sorted(types)}")


def assemble_model(spark: SparkSession, config: DataFrame,
                   root: str | None = None) -> DataFrame:
    """``Assembler.general.openModel`` analog: build the model described
    at ``root`` (IRI; or the single discovered root) -> triple frame."""
    desc = _Desc(config)
    node = _find_root(desc, root)
    return _model(spark, desc, node)


def assemble_dataset(spark: SparkSession, config: DataFrame,
                     root: str | None = None) -> Connection:
    """DatasetAssembler analog: ja:RDFDataset -> Connection over quads
    (default graph + ja:namedGraph members)."""
    desc = _Desc(config)
    node = _find_root(desc, root)
    if JA + "RDFDataset" not in desc.types(node):
        # a plain model description assembles as the default graph
        return Connection(spark, assemble_model(spark, config, root))
    dg = desc.one(node, "defaultGraph")
    conn = Connection(
        spark, _model(spark, desc, dg) if dg else _empty_triples(spark))
    for ng in desc.many(node, "namedGraph"):
        name = desc.one(ng, "graphName")
        graph = desc.one(ng, "graph")
        if name is None or graph is None:
            raise ValueError(
                "assembler: ja:namedGraph needs ja:graphName and ja:graph")
        conn = conn.load(_model(spark, desc, graph), graph=name[1])
    return conn


def _find_root(desc: _Desc, root: str | None) -> tuple:
    if root is not None:
        for kind in ("iri", "bnode"):
            if (kind, root) in desc.by_subj:
                return (kind, root)
        raise ValueError(f"assembler: root <{root}> not in the description")
    roots = desc.roots()
    if len(roots) != 1:
        raise ValueError(
            f"assembler: expected exactly one root description, found "
            f"{[r[1] for r in roots]} — pass root=")
    return roots[0]
