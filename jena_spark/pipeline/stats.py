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


# === VoID dataset description ==============================================

#: W3C "Vocabulary of Interlinked Datasets" namespace (the vocabulary
#: Jena ships as ``org.apache.jena.sparql.vocabulary.VOID``).
VOID_NS = "http://rdfs.org/ns/void#"
_SEP = "\x1e"


def void_description(triples: DataFrame,
                     dataset_iri: str = "urn:x-jena-spark:dataset"
                     ) -> DataFrame:
    """The dataset's W3C VoID description, AS TRIPLES (``TERM_COLS``
    frame) — ``void:triples`` / ``distinctSubjects`` /
    ``distinctObjects`` / ``properties`` / ``classes`` /
    ``entities`` (distinct IRI subjects; VoID leaves "entity" open —
    documented convention, mirrored in the oracle), plus one
    ``void:propertyPartition`` bnode per predicate (``void:property``
    + ``void:triples``) and one ``void:classPartition`` bnode per
    ``rdf:type`` class (``void:class`` + ``void:entities`` = distinct
    subjects of that class). Partition bnodes are content-addressed
    (``_:void-p-md5(iri)``), so the description is deterministic and
    re-emittable (the repo's skolem discipline).

    Scale: one full-scan aggregation for the six dataset measures
    (distinct counts over ``chr(30)``-joined term keys — Spark's
    multi-column COUNT DISTINCT silently drops null-bearing rows),
    plus two schema-sized groupBys (predicates / classes). Output is
    vocabulary-sized, never data-sized.
    """
    from jena_spark import terms as TM

    t = triples
    ds = F.lit(dataset_iri)
    subj_key = F.concat_ws(_SEP, F.col("s_kind"), F.col("s_val"))
    obj_key = F.concat_ws(
        _SEP, F.col("o_kind"), F.col("o_val"),
        F.coalesce(F.col("o_datatype"), F.lit("")),
        F.coalesce(F.col("o_lang"), F.lit("")))
    g = t.agg(F.count("*").cast("long").alias("n_triples"),
              F.countDistinct(subj_key).alias("n_subj"),
              F.countDistinct(obj_key).alias("n_obj"),
              F.countDistinct("p_val").alias("n_props"))
    cls = t.where((F.col("p_val") == TM.RDF_TYPE)
                  & (F.col("o_kind") == "iri"))
    g = (g.crossJoin(F.broadcast(
            cls.agg(F.countDistinct("o_val").alias("n_classes"))))
         .crossJoin(F.broadcast(
            t.where(F.col("s_kind") == "iri")
            .agg(F.countDistinct("s_val").alias("n_entities")))))

    def _lit_rows(frame, pairs):
        exprs = ", ".join(f"'{name}', CAST({col} AS STRING)"
                          for name, col in pairs)
        return (frame.selectExpr(
                    f"stack({len(pairs)}, {exprs}) AS (vp, vn)")
                .select(F.lit("iri").alias("s_kind"), ds.alias("s_val"),
                        F.concat(F.lit(VOID_NS), F.col("vp")).alias("p_val"),
                        F.lit("literal").alias("o_kind"),
                        F.col("vn").alias("o_val"),
                        F.lit(TM.XSD_INTEGER).alias("o_datatype"),
                        F.lit(None).cast("string").alias("o_lang")))

    head = g.select(
        F.lit("iri").alias("s_kind"), ds.alias("s_val"),
        F.lit(TM.RDF_TYPE).alias("p_val"),
        F.lit("iri").alias("o_kind"),
        F.lit(VOID_NS + "Dataset").alias("o_val"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"))
    measures = _lit_rows(g, [
        ("triples", "n_triples"), ("distinctSubjects", "n_subj"),
        ("distinctObjects", "n_obj"), ("properties", "n_props"),
        ("classes", "n_classes"), ("entities", "n_entities")])

    pp = (t.groupBy("p_val").agg(F.count("*").cast("long").alias("n"))
          .select(F.col("p_val").alias("part_iri"), "n",
                  F.concat(F.lit("_:void-p-"), F.md5("p_val"))
                  .alias("b")))
    cp = (cls.groupBy("o_val")
          .agg(F.countDistinct(subj_key).cast("long").alias("n"))
          .select(F.col("o_val").alias("part_iri"), "n",
                  F.concat(F.lit("_:void-c-"), F.md5("o_val"))
                  .alias("b")))

    def _partition(part, link, member, counter):
        a = part.select(
            F.lit("iri").alias("s_kind"), ds.alias("s_val"),
            F.lit(VOID_NS + link).alias("p_val"),
            F.lit("bnode").alias("o_kind"), F.col("b").alias("o_val"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"))
        m = part.select(
            F.lit("bnode").alias("s_kind"), F.col("b").alias("s_val"),
            F.lit(VOID_NS + member).alias("p_val"),
            F.lit("iri").alias("o_kind"), F.col("part_iri").alias("o_val"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"))
        c = part.select(
            F.lit("bnode").alias("s_kind"), F.col("b").alias("s_val"),
            F.lit(VOID_NS + counter).alias("p_val"),
            F.lit("literal").alias("o_kind"),
            F.col("n").cast("string").alias("o_val"),
            F.lit(TM.XSD_INTEGER).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"))
        return a.unionByName(m).unionByName(c)

    return (head.unionByName(measures)
            .unionByName(_partition(pp, "propertyPartition", "property",
                                    "triples"))
            .unionByName(_partition(cp, "classPartition", "class",
                                    "entities")))


def void_sql(dataset_iri: str = "urn:x-jena-spark:dataset") -> str:
    """DuckDB twin of :func:`void_description` over a ``triples``
    relation — identical term keys, md5 partition bnodes, and counts."""
    from jena_spark import terms as TM

    v, ds, xi = VOID_NS, dataset_iri, TM.XSD_INTEGER
    sk = "s_kind || chr(30) || s_val"
    ok = ("o_kind || chr(30) || o_val || chr(30) || "
          "coalesce(o_datatype, '') || chr(30) || coalesce(o_lang, '')")
    return f"""g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triples,
         CAST(count(DISTINCT {sk}) AS BIGINT) AS n_subj,
         CAST(count(DISTINCT {ok}) AS BIGINT) AS n_obj,
         CAST(count(DISTINCT p_val) AS BIGINT) AS n_props,
         CAST((SELECT count(DISTINCT o_val) FROM triples
               WHERE p_val = '{TM.RDF_TYPE}' AND o_kind = 'iri')
              AS BIGINT) AS n_classes,
         CAST((SELECT count(DISTINCT s_val) FROM triples
               WHERE s_kind = 'iri') AS BIGINT) AS n_entities
  FROM triples),
pp AS (
  SELECT p_val AS part_iri, CAST(count(*) AS BIGINT) AS n,
         '_:void-p-' || md5(p_val) AS b
  FROM triples GROUP BY p_val),
cp AS (
  SELECT o_val AS part_iri,
         CAST(count(DISTINCT {sk}) AS BIGINT) AS n,
         '_:void-c-' || md5(o_val) AS b
  FROM triples WHERE p_val = '{TM.RDF_TYPE}' AND o_kind = 'iri'
  GROUP BY o_val)
SELECT * FROM (
  SELECT 'iri' AS s_kind, '{ds}' AS s_val, '{TM.RDF_TYPE}' AS p_val,
         'iri' AS o_kind, '{v}Dataset' AS o_val,
         CAST(NULL AS VARCHAR) AS o_datatype, CAST(NULL AS VARCHAR) AS o_lang
  UNION ALL
  SELECT 'iri', '{ds}', '{v}' || m.vp, 'literal', m.vn, '{xi}', NULL
  FROM g, LATERAL (VALUES
    ('triples', CAST(n_triples AS VARCHAR)),
    ('distinctSubjects', CAST(n_subj AS VARCHAR)),
    ('distinctObjects', CAST(n_obj AS VARCHAR)),
    ('properties', CAST(n_props AS VARCHAR)),
    ('classes', CAST(n_classes AS VARCHAR)),
    ('entities', CAST(n_entities AS VARCHAR))) AS m(vp, vn)
  UNION ALL
  SELECT 'iri', '{ds}', '{v}propertyPartition', 'bnode', b, NULL, NULL FROM pp
  UNION ALL
  SELECT 'bnode', b, '{v}property', 'iri', part_iri, NULL, NULL FROM pp
  UNION ALL
  SELECT 'bnode', b, '{v}triples', 'literal', CAST(n AS VARCHAR),
         '{xi}', NULL FROM pp
  UNION ALL
  SELECT 'iri', '{ds}', '{v}classPartition', 'bnode', b, NULL, NULL FROM cp
  UNION ALL
  SELECT 'bnode', b, '{v}class', 'iri', part_iri, NULL, NULL FROM cp
  UNION ALL
  SELECT 'bnode', b, '{v}entities', 'literal', CAST(n AS VARCHAR),
         '{xi}', NULL FROM cp)"""
