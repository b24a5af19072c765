"""Materialized inverted text index over literals (jena-text parity).

Reference: jena-text maintains a Lucene index keyed by entity with
analyzed literal fields (``jena-text/.../TextIndexLucene.java:82``,
``addEntity`` ``:296``) and answers ranked queries
(``query(property, string)`` ``:476-486``) that join back to the graph.

Spark-native analog — index-as-a-table:

* :func:`build_text_index` tokenizes indexed-property literals once and
  materializes a posting table ``(token, property, s_kind, s_val, tf,
  doc_len)`` partitioned by token hash. At 100 TB this is the write-once
  index build (TDB/Lucene posture): queries never rescan the corpus.
* :func:`query_index` is a token-equality lookup on the posting table
  (partition-prunable, broadcast-joinable for small term sets) with a
  deterministic integer TF-IDF-style score — multi-term queries AND/OR
  compose via join/union of posting lookups.

Scores are integer basis points (``score_bp``) so ranking is
reproducible across engines — Lucene's float BM25 is not a cross-engine
contract; ORDER is what parity needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM


def build_text_index(
    triples: DataFrame, properties: list[str] | None = None
) -> DataFrame:
    """Posting table for literal objects of the indexed properties.

    One pass: filter indexed properties -> tokenize (lowercased \\w+
    analyzer, the Lucene StandardAnalyzer-ish default) -> per
    (subject, property, token) term frequency + per-literal length.
    """
    props = properties or [TM.RDFS_LABEL, TM.P_TEXT]
    lits = triples.where(
        F.col("p_val").isin(props) & (F.col("o_kind") == "literal")
    )
    words = F.filter(
        F.split(F.lower(F.col("o_val")), r"[^a-z0-9]+"), lambda t: t != ""
    )
    toks = lits.select(
        "s_kind", "s_val", F.col("p_val").alias("property"),
        F.explode(words).alias("token"),
    )
    tf = toks.groupBy("token", "property", "s_kind", "s_val").agg(
        F.count("*").alias("tf")
    )
    # field length per (subject, property): total tokens over ALL its
    # literals — deterministic even when a subject has several values
    # for the indexed property (e.g. multiple labels)
    lens = (
        lits.select("s_kind", "s_val", F.col("p_val").alias("property"),
                    F.size(words).alias("n"))
        .groupBy("s_kind", "s_val", "property")
        .agg(F.sum("n").alias("doc_len"))
    )
    return tf.join(lens, ["s_kind", "s_val", "property"]).select(
        "token", "property", "s_kind", "s_val", "tf", "doc_len"
    )


def update_text_index(
    index: DataFrame,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    properties: list[str] | None = None,
) -> DataFrame:
    """Incremental index maintenance (jena-text keeps its Lucene index
    in sync with dataset changes — ``TextDocProducerTriples.java``
    ``change(ADD/DELETE, ...)``; Lucene's posture is delete-document +
    re-add, keyed by entity).

    Document granularity is (subject, property): any added or removed
    triple for an indexed property invalidates that subject+property's
    postings, which are dropped (anti-join on the touched keys) and
    rebuilt from the POST-change literal set the caller passes in
    ``added`` (for a pure deletion, pass the subject's remaining
    literals — or nothing, if none remain). Cost scales with the
    TOUCHED documents, never the corpus: one anti-join against the
    index plus one :func:`build_text_index` over the changed slice.

    Equivalence contract (tested): when ``added`` carries the FULL
    post-change literal set of every touched (subject, property) —
    the Lucene delete-document + re-add unit —
    ``update_text_index(build(T), added=A, removed=R)`` ==
    ``build(T')`` where T' is the post-change corpus.
    """
    props = properties or [TM.RDFS_LABEL, TM.P_TEXT]

    def _keys(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col("p_val").isin(props) & (F.col("o_kind") == "literal"))
            .select("s_kind", "s_val", F.col("p_val").alias("property"))
            .distinct()
        )

    touched = None
    for d in (added, removed):
        if d is not None:
            k = _keys(d)
            touched = k if touched is None else touched.unionByName(k).distinct()
    if touched is None:
        return index
    cols = ["token", "property", "s_kind", "s_val", "tf", "doc_len"]
    kept = index.join(touched, ["s_kind", "s_val", "property"], "left_anti")
    if added is None:
        return kept.select(*cols)
    return kept.select(*cols).unionByName(build_text_index(added, properties))


def query_index(
    index: DataFrame, terms: list[str], property: str | None = None,
    mode: str = "any", limit: int | None = None,
) -> DataFrame:
    """Ranked lookup: subjects matching the analyzed query terms.

    ``mode='any'`` (OR) sums per-term scores; ``mode='all'`` (AND)
    keeps subjects matching every term. score_bp = sum over terms of
    ``tf * 10000 / doc_len`` (deterministic integer ranking).
    """
    terms = [t.lower() for t in terms]
    hits = index.where(F.col("token").isin(terms))
    if property is not None:
        hits = hits.where(F.col("property") == property)
    scored = hits.groupBy("s_kind", "s_val", "property").agg(
        F.countDistinct("token").alias("n_terms"),
        F.sum((F.col("tf") * 10000 / F.col("doc_len")).cast("long")).alias("score_bp"),
    )
    if mode == "all":
        scored = scored.where(F.col("n_terms") == len(set(terms)))
    out = scored.select("s_kind", "s_val", "property", "score_bp").orderBy(
        F.desc("score_bp"), F.asc("s_val")
    )
    return out.limit(limit) if limit is not None else out
