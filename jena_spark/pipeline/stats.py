"""Graph statistics — jena-elephas parity (SURVEY.md §2.13) + TDB stats.

Each MapReduce job in
``jena-elephas/jena-elephas-mapreduce/.../rdf/mapreduce/`` becomes a
one-shuffle DataFrame aggregation; ``characteristic_sets`` mirrors
``characteristics/AbstractCharacteristicSetGeneratingReducer.java:60``;
``predicate_counts`` also feeds join-order statistics the way TDB's
``StatsCollector`` (``jena-tdb/.../solver/stats/StatsCollector.java:27``)
feeds ``StatsMatcher``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_counts(triples: DataFrame) -> DataFrame:
    """≙ TriplePredicateCountMapper + NodeCountReducer."""
    return triples.groupBy(F.col("p_val").alias("predicate")).agg(
        F.count("*").alias("n")
    )


def subject_counts(triples: DataFrame) -> DataFrame:
    return triples.groupBy(
        F.col("s_kind").alias("kind"), F.col("s_val").alias("subject")
    ).agg(F.count("*").alias("n"))


def object_counts(triples: DataFrame) -> DataFrame:
    return triples.groupBy(
        F.col("o_kind").alias("kind"), F.col("o_val").alias("object")
    ).agg(F.count("*").alias("n"))


def node_counts(triples: DataFrame) -> DataFrame:
    """≙ TripleNodeCountMapper: every position flattened then counted."""
    nodes = (
        triples.select(F.col("s_kind").alias("kind"), F.col("s_val").alias("val"))
        .unionByName(triples.select(F.lit("iri").alias("kind"), F.col("p_val").alias("val")))
        .unionByName(triples.select(F.col("o_kind").alias("kind"), F.col("o_val").alias("val")))
    )
    return nodes.groupBy("kind", "val").agg(F.count("*").alias("n"))


def datatype_counts(triples: DataFrame) -> DataFrame:
    """≙ TripleDataTypeCountMapper (literals only)."""
    return (
        triples.where(F.col("o_kind") == "literal")
        .groupBy(F.coalesce("o_datatype", F.lit("plain")).alias("datatype"))
        .agg(F.count("*").alias("n"))
    )


def _namespace(col):
    # namespace = IRI up to the last '#' or '/' (elephas namespace counts)
    return F.regexp_extract(col, r"^(.*[#/])", 1)


def namespace_counts(triples: DataFrame) -> DataFrame:
    ns = (
        triples.select(_namespace(F.col("p_val")).alias("ns"))
        .unionByName(triples.where(F.col("s_kind") == "iri")
                     .select(_namespace(F.col("s_val")).alias("ns")))
        .unionByName(triples.where(F.col("o_kind") == "iri")
                     .select(_namespace(F.col("o_val")).alias("ns")))
    )
    return ns.groupBy("ns").agg(F.count("*").alias("n"))


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Distinct sorted predicate-set per subject, counted — the classic
    structural statistic for cardinality estimation."""
    return (
        triples.groupBy("s_kind", "s_val")
        .agg(F.sort_array(F.collect_set("p_val")).alias("pred_set"))
        .groupBy("pred_set")
        .agg(F.count("*").alias("n_subjects"))
    )

# --- TDB stats.opt file (tdbstats) -------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_CONTAINER_MEMBER = "http://www.w3.org/1999/02/22-rdf-syntax-ns#_"
_XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"


@dataclass
class StatsResults:
    """``StatsResults.java``: the three numbers ``tdbstats`` gathers —
    per-predicate triple counts, per-class ``rdf:type`` object counts,
    and the total triple count."""

    predicates: dict[str, int]
    types: dict[str, int]
    count: int
    other: int = 0


def gather_stats(triples: DataFrame) -> StatsResults:
    """``Stats.gather`` (``jena-tdb/.../solver/stats/Stats.java:77``,
    ``StatsCollectorBase.record``): one pass over the graph counting
    predicates, plus ``rdf:type`` object frequencies. Two partial-agg
    hash aggregations; driver memory is bounded by the number of
    DISTINCT predicates / classes (schema-sized, not data-sized)."""
    preds = {
        r["predicate"]: r["n"] for r in predicate_counts(triples).collect()
    }
    types = {
        r["o_val"]: r["n"]
        for r in triples.where(
            (F.col("p_val") == _RDF_TYPE) & (F.col("o_kind") == "iri"))
        .groupBy("o_val").agg(F.count("*").alias("n")).collect()
    }
    return StatsResults(preds, types, sum(preds.values()))


def write_stats_sse(stats: StatsResults, timestamp: str | None = None) -> str:
    """Serialize to the ``stats.opt`` SSE format ``StatsMatcher`` reads
    (writer: ``Stats.format``, ``Stats.java:95-127``): a ``(stats …)``
    list with a ``(meta (count N))`` header, one ``((VAR rdf:type <T>)
    n)`` entry per class, one ``(<pred> n)`` pair per predicate —
    ``rdf:_N`` container memberships skipped, as the reference skips
    them — and the ``(other 0)`` default rule. Deviations for the
    repo's determinism rule: entries are IRI-sorted and the
    ``timestamp``/``run@`` meta pairs appear only when a timestamp is
    supplied by the caller (never ``now()``)."""
    out = ["(stats"]
    meta = ["  (meta"]
    if timestamp is not None:
        meta.append(f'    (timestamp "{timestamp}"^^<{_XSD_DT}>)')
        meta.append(f'    (run@ "{timestamp}")')
    meta.append(f"    (count {stats.count}))")
    out.extend(meta)
    for t in sorted(stats.types):
        out.append(f"  ((VAR rdf:type <{t}>) {stats.types[t]})")
    for p in sorted(stats.predicates):
        if p.startswith(_RDF_CONTAINER_MEMBER):
            continue
        out.append(f"  (<{p}> {stats.predicates[p]})")
    out.append(f"  (other {stats.other})")
    out.append(")")
    return "\n".join(out) + "\n"


def _sse_tokens(text: str):
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif c in "()":
            yield c
            i += 1
        elif c == "<":
            j = text.index(">", i)
            yield ("iri", text[i + 1:j])
            i = j + 1
        elif c == '"':
            j = i + 1
            while text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            lex, i = text[i + 1:j], j + 1
            if text.startswith("^^<", i):  # typed literal — keep the lexical
                i = text.index(">", i) + 1
            yield ("str", lex)
        else:
            j = i
            while j < n and not text[j].isspace() and text[j] not in "()":
                j += 1
            word = text[i:j]
            i = j
            try:
                yield ("int", int(word))
            except ValueError:
                yield ("sym", word)


def _sse_read(toks) -> object:
    t = next(toks)
    if t == "(":
        items = []
        while True:
            nxt = _sse_read(toks)
            if nxt == ")":
                return items
            items.append(nxt)
    return t


def parse_stats_sse(text: str) -> StatsResults:
    """Read a ``stats.opt`` file back (``StatsMatcher.init``,
    ``jena-arq/.../optimizer/StatsMatcher.java:106-160``): the
    ``(meta (count N))`` header, ``(<pred> n)`` pairs, ``((VAR
    rdf:type <T>) n)`` class patterns — ``rdf:type`` accepted in both
    prefixed and ``<full-IRI>`` spelling — and the ``(other n)``
    default. The result feeds ``queries.algebra.reorder_patterns_stats``
    directly (predicates/types maps), closing the tdbstats →
    stats.opt → ReorderWeighted loop offline."""
    tree = _sse_read(_sse_tokens(text))
    if not (isinstance(tree, list) and tree and tree[0] == ("sym", "stats")):
        raise ValueError("not a (stats ...) SSE document")
    preds: dict[str, int] = {}
    types: dict[str, int] = {}
    count = -1
    other = 0
    for entry in tree[1:]:
        if not isinstance(entry, list) or not entry:
            raise ValueError(f"malformed stats entry: {entry!r}")
        head = entry[0]
        if head == ("sym", "meta"):
            for pair in entry[1:]:
                if isinstance(pair, list) and pair[:1] == [("sym", "count")]:
                    count = pair[1][1]
            continue
        if head == ("sym", "other"):
            other = entry[1][1]
            continue
        n = entry[1][1]
        if isinstance(head, list):  # ((VAR rdf:type <T>) n)
            if len(head) != 3:
                raise ValueError(f"unsupported stats pattern: {head!r}")
            p, o = head[1], head[2]
            if p not in (("sym", "rdf:type"), ("iri", _RDF_TYPE)):
                raise ValueError(
                    f"only rdf:type patterns are supported, got {p!r}")
            types[o[1]] = n
        else:
            preds[head[1]] = n
    if count < 0:
        count = sum(preds.values())
    return StatsResults(preds, types, count, other)


# --- elephas transform/filter one-liners (SURVEY §2.13 rows) ------------------
# Reference: jena-elephas/jena-elephas-mapreduce/.../rdf/mapreduce/
# filter/{ValidTripleFilterMapper,GroundTripleFilterMapper}.java,
# filter/positional/TripleFilterByPredicateUriMapper.java,
# split/TripleSplitToNodesMapper.java,
# transform/{TriplesToQuadsConstantGraphMapper,QuadsToTriplesMapper}.java.
# Each is a map-only DataFrame expression — named here so the operator
# inventory is explicit, tested surface, not a comment.

def valid_triples(triples: DataFrame) -> DataFrame:
    """ValidTripleFilterMapper: keep rows that form a legal RDF triple
    — subject an IRI or bnode, predicate a non-null IRI, object any
    non-null term."""
    return triples.where(
        F.col("s_kind").isin("iri", "bnode")
        & (F.col("p_val").isNotNull())
        & F.col("o_kind").isin("iri", "bnode", "literal"))


def ground_triples(triples: DataFrame) -> DataFrame:
    """GroundTripleFilterMapper: keep triples with NO blank nodes."""
    return triples.where((F.col("s_kind") != "bnode")
                         & (F.col("o_kind") != "bnode"))


def filter_by_predicate(triples: DataFrame, iris: list[str]) -> DataFrame:
    """TripleFilterByPredicateUriMapper: predicate-IRI allowlist."""
    return triples.where(F.col("p_val").isin(list(iris)))


def split_to_nodes(triples: DataFrame) -> DataFrame:
    """TripleSplitToNodesMapper: one output row per term position —
    ``(pos, kind, val, datatype, lang)``."""
    node = F.explode(F.array(
        F.struct(F.lit("s").alias("pos"), F.col("s_kind").alias("kind"),
                 F.col("s_val").alias("val"),
                 F.lit(None).cast("string").alias("datatype"),
                 F.lit(None).cast("string").alias("lang")),
        F.struct(F.lit("p").alias("pos"), F.lit("iri").alias("kind"),
                 F.col("p_val").alias("val"),
                 F.lit(None).cast("string").alias("datatype"),
                 F.lit(None).cast("string").alias("lang")),
        F.struct(F.lit("o").alias("pos"), F.col("o_kind").alias("kind"),
                 F.col("o_val").alias("val"), F.col("o_datatype").alias("datatype"),
                 F.col("o_lang").alias("lang")),
    )).alias("node")
    return triples.select(node).select("node.*")


def triples_to_quads(triples: DataFrame, graph_iri: str) -> DataFrame:
    """TriplesToQuadsConstantGraphMapper: stamp a constant graph."""
    return triples.withColumn("graph", F.lit(graph_iri))


def quads_to_triples(quads: DataFrame) -> DataFrame:
    """QuadsToTriplesMapper: project the graph away (a straight map,
    like the reference — cross-graph dedup is the caller's call)."""
    return quads.drop("graph")
