"""Commons RDF bridge — the jena-commonsrdf module analog.

Reference: ``jena-extras/jena-commonsrdf/.../JenaRDF.java:31`` (the
``RDF`` term/graph factory with its cheap IRI / language-tag
validations), ``impl/JCR_Graph.java`` / ``JCR_Dataset.java`` (Graph
and Dataset views over Jena structures) and
``JenaCommonsRDF.java:56-142`` (``toJena``/``fromJena`` conversions
between the vendor-neutral API and the engine's native
representation).

The Commons RDF API is deliberately tiny and row-at-a-time (add /
remove / contains / stream). The Spark twin keeps both halves
honest:

* :class:`MemGraph` / :class:`MemDataset` — set-backed builders for
  client-side assembly (the reference's ``createGraph()`` returns an
  in-memory Jena graph too); ``to_frame`` turns one into an engine
  triple/quad DataFrame (the ``toJena`` direction).
* :class:`FrameGraph` — the ``fromJena`` direction: a Commons-RDF
  view WRAPPING a DataFrame without copying it. ``stream(s, p, o)``
  pushes the pattern into Spark as filters and streams matches via
  ``toLocalIterator``; ``contains`` is a ``limit(1)`` probe — every
  access stays a distributed plan, nothing is collected wholesale.

Terms are immutable frozen dataclasses with RDF 1.1 ``ntriples``
forms, equal by value across factories exactly as the Commons RDF
contract requires.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jena_spark import terms as TM

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


# --- terms ----------------------------------------------------------------


@dataclass(frozen=True)
class IRI:
    iri: str

    def ntriples_string(self) -> str:
        return f"<{self.iri}>"


@dataclass(frozen=True)
class BlankNode:
    label: str

    def ntriples_string(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class Literal:
    lexical_form: str
    datatype: IRI = field(default=IRI(XSD_STRING))
    language: str | None = None

    def ntriples_string(self) -> str:
        esc = (self.lexical_form.replace("\\", "\\\\")
               .replace('"', '\\"').replace("\n", "\\n"))
        if self.language is not None:
            return f'"{esc}"@{self.language}'
        if self.datatype.iri == XSD_STRING:
            return f'"{esc}"'
        return f'"{esc}"^^<{self.datatype.iri}>'


@dataclass(frozen=True)
class Triple:
    subject: IRI | BlankNode
    predicate: IRI
    object: IRI | BlankNode | Literal


@dataclass(frozen=True)
class Quad:
    graph_name: IRI | BlankNode | None  # None = default graph
    subject: IRI | BlankNode
    predicate: IRI
    object: IRI | BlankNode | Literal

    def as_triple(self) -> Triple:
        return Triple(self.subject, self.predicate, self.object)


# --- factory (JenaRDF.java:31) --------------------------------------------


class JenaRDF:
    """``RDF`` factory: term constructors with the reference's cheap
    validations (``JenaRDF.validateIRI``/``validateLang``)."""

    _bnode_counter = itertools.count()

    def create_iri(self, iri: str) -> IRI:
        if any(c in iri for c in (" ", "<", ">")):
            raise ValueError(f"invalid IRI: {iri!r}")
        return IRI(iri)

    def create_blank_node(self, name: str | None = None) -> BlankNode:
        if name is None:
            name = f"b{next(self._bnode_counter)}"
        return BlankNode(name)

    def create_literal(self, lexical_form: str,
                       datatype: IRI | None = None,
                       language: str | None = None) -> Literal:
        if language is not None:
            if " " in language:
                raise ValueError(f"invalid language tag: {language!r}")
            return Literal(lexical_form, IRI(LANG_STRING), language)
        return Literal(lexical_form, datatype or IRI(XSD_STRING))

    def create_triple(self, subject, predicate, object) -> Triple:  # noqa: A002
        return Triple(subject, predicate, object)

    def create_quad(self, graph_name, subject, predicate, object) -> Quad:  # noqa: A002
        return Quad(graph_name, subject, predicate, object)

    def create_graph(self) -> "MemGraph":
        return MemGraph()

    def create_dataset(self) -> "MemDataset":
        return MemDataset()


# --- in-memory builders (createGraph/createDataset direction) -------------


class MemGraph:
    """Set-backed Commons RDF ``Graph`` (JCR_Graph over a mem graph)."""

    def __init__(self) -> None:
        self._triples: set[Triple] = set()

    def add(self, triple: Triple) -> None:
        self._triples.add(triple)

    def remove(self, triple: Triple) -> None:
        self._triples.discard(triple)

    def contains(self, triple: Triple) -> bool:
        return triple in self._triples

    def clear(self) -> None:
        self._triples.clear()

    def size(self) -> int:
        return len(self._triples)

    def stream(self, s=None, p=None, o=None) -> Iterator[Triple]:
        return (t for t in self._triples
                if (s is None or t.subject == s)
                and (p is None or t.predicate == p)
                and (o is None or t.object == o))

    def iterate(self) -> Iterator[Triple]:
        return iter(self._triples)


class MemDataset:
    """Set-backed Commons RDF ``Dataset`` (quads; None graph = default)."""

    def __init__(self) -> None:
        self._quads: set[Quad] = set()

    def add(self, quad: Quad) -> None:
        self._quads.add(quad)

    def remove(self, quad: Quad) -> None:
        self._quads.discard(quad)

    def contains(self, quad: Quad) -> bool:
        return quad in self._quads

    def clear(self) -> None:
        self._quads.clear()

    def size(self) -> int:
        return len(self._quads)

    def stream(self, g=None, s=None, p=None, o=None) -> Iterator[Quad]:
        return (q for q in self._quads
                if (g is None or q.graph_name == g)
                and (s is None or q.subject == s)
                and (p is None or q.predicate == p)
                and (o is None or q.object == o))

    def get_graph(self, graph_name: IRI | BlankNode | None = None) -> MemGraph:
        g = MemGraph()
        for q in self.stream(g=graph_name) if graph_name is not None else (
                q for q in self._quads if q.graph_name is None):
            g.add(q.as_triple())
        return g


# --- conversions (JenaCommonsRDF.toJena / fromJena) -----------------------


def _term_to_cols(term) -> tuple[str, str, str | None, str | None]:
    """-> (kind, val, datatype, lang) in the engine's term-column shape."""
    if isinstance(term, IRI):
        return "iri", term.iri, None, None
    if isinstance(term, BlankNode):
        return "bnode", term.label, None, None
    if isinstance(term, Literal):
        dt = None if term.datatype.iri in (XSD_STRING, LANG_STRING) \
            else term.datatype.iri
        return "literal", term.lexical_form, dt, term.language
    raise TypeError(f"not an RDF term: {term!r}")


def _cols_to_term(kind: str, val: str, dt: str | None, lang: str | None):
    if kind == "iri":
        return IRI(val)
    if kind == "bnode":
        return BlankNode(val)
    if lang:
        return Literal(val, IRI(LANG_STRING), lang)
    return Literal(val, IRI(dt) if dt else IRI(XSD_STRING))


def to_frame(spark: SparkSession, graph: MemGraph | MemDataset) -> DataFrame:
    """``toJena(Graph)``/``toJena(Dataset)`` analog: materialize the
    builder as an engine triple/quad DataFrame."""
    quads = isinstance(graph, MemDataset)
    rows = []
    for item in (graph._quads if quads else graph._triples):
        s_kind, s_val, _, _ = _term_to_cols(item.subject)
        o_kind, o_val, o_dt, o_lang = _term_to_cols(item.object)
        row = (s_kind, s_val, item.predicate.iri, o_kind, o_val, o_dt, o_lang)
        if quads:
            g = None if item.graph_name is None \
                else _term_to_cols(item.graph_name)[1]
            row = (*row, g)
        rows.append(row)
    schema = ", ".join(f"{c} string" for c in TM.TERM_COLS)
    if quads:
        schema += ", graph string"
    return spark.createDataFrame(rows, schema)


class FrameGraph:
    """``fromJena(Graph)`` analog: a Commons RDF view over a triple
    DataFrame — no copy, every access is a pushed-down Spark plan."""

    def __init__(self, df: DataFrame):
        self.df = df.select(*TM.TERM_COLS)

    def _filtered(self, s=None, p=None, o=None) -> DataFrame:
        df = self.df
        if s is not None:
            s_kind, s_val, _, _ = _term_to_cols(s)
            df = df.where((F.col("s_kind") == s_kind)
                          & (F.col("s_val") == s_val))
        if p is not None:
            df = df.where(F.col("p_val") == p.iri)
        if o is not None:
            o_kind, o_val, o_dt, o_lang = _term_to_cols(o)
            df = df.where((F.col("o_kind") == o_kind)
                          & (F.col("o_val") == o_val)
                          & (F.col("o_datatype").eqNullSafe(F.lit(o_dt)))
                          & (F.col("o_lang").eqNullSafe(F.lit(o_lang))))
        return df

    def contains(self, triple: Triple) -> bool:
        return bool(self._filtered(triple.subject, triple.predicate,
                                   triple.object).take(1))

    def size(self) -> int:
        return self.df.count()

    def stream(self, s=None, p=None, o=None) -> Iterator[Triple]:
        for r in self._filtered(s, p, o).toLocalIterator():
            yield Triple(
                _cols_to_term(r.s_kind, r.s_val, None, None),
                IRI(r.p_val),
                _cols_to_term(r.o_kind, r.o_val, r.o_datatype, r.o_lang))

    def iterate(self) -> Iterator[Triple]:
        return self.stream()


def from_frame(df: DataFrame) -> FrameGraph:
    """``fromJena`` direction — wrap, never copy."""
    return FrameGraph(df)
