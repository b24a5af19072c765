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

#: position block size per literal instance of a multi-valued field
#: (Lucene's positionIncrementGap posture): phrase adjacency never
#: crosses a literal boundary. 2^20 tokens per literal is far above
#: any real document literal.
LIT_GAP = 1 << 20


def build_text_index(
    triples: DataFrame, properties: list[str] | None = None
) -> DataFrame:
    """Posting table for literal objects of the indexed properties.

    One pass: filter indexed properties -> tokenize (lowercased \\w+
    analyzer, the Lucene StandardAnalyzer-ish default) -> per
    (subject, property, token) term frequency + per-literal length.
    """
    from pyspark.sql import Window

    props = properties or [TM.RDFS_LABEL, TM.P_TEXT]
    lits = triples.where(
        F.col("p_val").isin(props) & (F.col("o_kind") == "literal")
    ).select("s_kind", "s_val", F.col("p_val").alias("property"), "o_val")
    words = F.filter(
        F.split(F.lower(F.col("o_val")), r"[^a-z0-9]+"), lambda t: t != ""
    )
    # literal ordinal within its (subject, property) document — phrase
    # positions must not be adjacent ACROSS literals, so each literal's
    # positions live in their own LIT_GAP-sized block (Lucene's
    # position-increment-gap between multi-valued field instances).
    # Ordering by the literal value is deterministic; identical
    # duplicate literals yield identical per-block position sets
    # whichever block each copy lands in.
    ordw = Window.partitionBy("s_kind", "s_val", "property").orderBy("o_val")
    numbered = lits.withColumn("_ord", F.row_number().over(ordw) - 1)
    toks = numbered.select(
        "s_kind", "s_val", "property", "_ord",
        F.posexplode(words).alias("pos", "token"),
    ).withColumn(
        "gpos", F.col("_ord") * F.lit(LIT_GAP) + F.col("pos") + 1
    )
    tf = toks.groupBy("token", "property", "s_kind", "s_val").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("gpos")).alias("positions"),
    )
    # field length per (subject, property): total tokens over ALL its
    # literals — deterministic even when a subject has several values
    # for the indexed property (e.g. multiple labels)
    lens = (
        lits.select("s_kind", "s_val", "property",
                    F.size(words).alias("n"))
        .groupBy("s_kind", "s_val", "property")
        .agg(F.sum("n").alias("doc_len"))
    )
    return tf.join(lens, ["s_kind", "s_val", "property"]).select(
        "token", "property", "s_kind", "s_val", "tf", "doc_len", "positions"
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
    cols = ["token", "property", "s_kind", "s_val", "tf", "doc_len",
            "positions"]
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


# --- Lucene query-string front-end ------------------------------------------
#
# jena-text's user-facing contract is a LUCENE QUERY STRING:
# ``?s text:query (rdfs:label "word -other +must \"a phrase\" pre*" 10)``
# (``jena-text/.../query/text/TextQueryPF.java`` passes the string to
# ``TextIndexLucene.query`` -> Lucene ``QueryParser.parse``). This
# implements the classic-parser subset that maps onto the posting
# table:
#
# * bare terms          -> SHOULD (OR; at least one must match)
# * ``+term``           -> MUST
# * ``-term``           -> MUST_NOT
# * ``"a b c"``         -> phrase (positional adjacency, MUST/SHOULD/
#                          MUST_NOT by the same +/- prefixes)
# * ``pre*``            -> prefix wildcard (trailing * only — the
#                          index-prunable form; leading wildcards are
#                          rejected like Lucene's default parser)
# * ``field:term``      -> restrict the clause to one indexed property
#                          via the caller's field map
# * ``a AND b`` / OR    -> AND promotes both neighbours to MUST,
#                          OR leaves SHOULD (the classic parser's
#                          practical behavior for flat queries)
#
# Documented non-goals: fuzzy (~), boosts (^), ranges, grouping parens,
# NOT keyword — each raises ValueError rather than mis-parsing.

_LUCENE_TOK = __import__("re").compile(
    r'\s*(?:(?P<PLUS>\+)|(?P<MINUS>-)|(?P<PHRASE>"(?:[^"\\]|\\.)*")'
    r"|(?P<WORD>[^\s\"+\-][^\s\"]*))"
)


def parse_lucene_query(q: str) -> list[dict]:
    """Query string -> clause dicts ``{occur, kind, field, value}``
    with occur in MUST/MUST_NOT/SHOULD and kind in term/prefix/phrase."""
    clauses: list[dict] = []
    i, occur = 0, None
    pending_and = False
    while i < len(q):
        m = _LUCENE_TOK.match(q, i)
        if not m:
            if q[i:].strip():
                raise ValueError(f"lucene query: cannot parse at {q[i:]!r}")
            break
        i = m.end()
        if m.group("PLUS"):
            occur = "MUST"
            continue
        if m.group("MINUS"):
            occur = "MUST_NOT"
            continue
        field = None
        if m.group("PHRASE") is not None:
            body = m.group("PHRASE")[1:-1].replace('\\"', '"')
            kind, value = "phrase", body
        else:
            w = m.group("WORD")
            if w == "AND":
                if not clauses:
                    raise ValueError("lucene query: AND without left operand")
                if clauses[-1]["occur"] == "SHOULD":
                    clauses[-1]["occur"] = "MUST"
                pending_and = True
                occur = None
                continue
            if w == "OR":
                occur = None
                continue
            if w == "NOT":
                raise ValueError(
                    "lucene query: NOT keyword unsupported — use -term")
            if ":" in w:
                field, w = w.split(":", 1)
                if w.startswith('"'):
                    raise ValueError(
                        "lucene query: field:\"phrase\" unsupported — "
                        "quote the whole clause per field instead")
            if any(ch in w for ch in "~^[]{}()"):
                raise ValueError(f"lucene query: unsupported syntax in {w!r}")
            if w.startswith("*") or w.startswith("?"):
                raise ValueError("lucene query: leading wildcards rejected")
            if w.endswith("*"):
                kind, value = "prefix", w[:-1]
            elif "*" in w or "?" in w:
                raise ValueError(
                    "lucene query: only trailing-* wildcards supported")
            else:
                kind, value = "term", w
        eff = occur or ("MUST" if pending_and else "SHOULD")
        pending_and = False
        clauses.append(
            {"occur": eff, "kind": kind, "field": field, "value": value}
        )
        occur = None
    if not any(c["occur"] != "MUST_NOT" for c in clauses):
        raise ValueError("lucene query: needs at least one positive clause")
    return clauses


def _clause_hits(index: DataFrame, c: dict,
                 prop_map: dict[str, str] | None) -> DataFrame:
    """One clause -> per-(subject, property) hits with a score_bp.
    Terms/prefixes score sum(tf)*10000/doc_len; a phrase scores like
    one term occurring once per adjacency chain start."""
    df = index
    if c["field"] is not None:
        pm = prop_map or {}
        if c["field"] not in pm:
            raise KeyError(f"lucene query: unmapped field {c['field']!r}")
        df = df.where(F.col("property") == pm[c["field"]])
    keys = ["s_kind", "s_val", "property"]
    if c["kind"] == "term":
        hits = df.where(F.col("token") == c["value"].lower())
    elif c["kind"] == "prefix":
        hits = df.where(F.col("token").startswith(c["value"].lower()))
    else:  # phrase: adjacency join over the positional postings
        words = [w for w in
                 __import__("re").split(r"[^a-z0-9]+", c["value"].lower())
                 if w]
        if not words:
            raise ValueError("lucene query: empty phrase")
        if len(words) == 1:
            hits = df.where(F.col("token") == words[0])
        else:
            cur = df.where(F.col("token") == words[0]).select(
                *keys, F.col("positions").alias("chain"), "doc_len"
            )
            for w in words[1:]:
                nxt = df.where(F.col("token") == w).select(
                    *keys, F.col("positions").alias("npos")
                )
                cur = (
                    cur.join(nxt, keys)
                    .withColumn(
                        "chain",
                        F.filter(
                            F.transform(F.col("chain"), lambda p: p + 1),
                            lambda p: F.array_contains(F.col("npos"), p),
                        ),
                    )
                    .where(F.size("chain") > 0)
                    .drop("npos")
                )
            # one "occurrence" per completed chain
            hits = cur.select(
                *keys, F.size("chain").alias("tf"), "doc_len"
            )
    return hits.groupBy(*keys).agg(
        F.sum((F.col("tf") * 10000 / F.col("doc_len")).cast("long"))
        .alias("score_bp")
    )


def query_text(
    index: DataFrame, query: str,
    prop_map: dict[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Evaluate a Lucene-syntax query string against the posting table
    — the ``text:query`` contract. MUST clauses intersect, MUST_NOT
    anti-joins, SHOULD contributes score (and suffices alone); ranking
    is the deterministic integer score summed over matching positive
    clauses, ties by subject."""
    clauses = parse_lucene_query(query)
    keys = ["s_kind", "s_val", "property"]
    positive = [c for c in clauses if c["occur"] != "MUST_NOT"]
    negative = [c for c in clauses if c["occur"] == "MUST_NOT"]
    scored = None
    for c in positive:
        h = _clause_hits(index, c, prop_map)
        scored = h if scored is None else (
            scored.unionByName(h)
            .groupBy(*keys).agg(F.sum("score_bp").alias("score_bp"))
        )
    for c in (x for x in positive if x["occur"] == "MUST"):
        scored = scored.join(
            _clause_hits(index, c, prop_map).select(*keys), keys, "left_semi"
        )
    for c in negative:
        scored = scored.join(
            _clause_hits(index, c, prop_map).select(*keys), keys, "left_anti"
        )
    out = scored.orderBy(F.desc("score_bp"), F.asc("s_val"), F.asc("property"))
    return out.limit(limit) if limit is not None else out


#: jena-text vocabulary namespace (``TextVocab.java``).
TEXT_NS = "http://jena.apache.org/text#"


def text_query_pf(triples: DataFrame, *args) -> DataFrame:
    """``?s text:query ([property] "query string" [limit])`` — the
    text:query property function (``TextQueryPF.java``: node-type
    dispatch over the argument list; here a leading absolute-IRI
    string is the property, the first other string is the Lucene
    query, a trailing integer the limit). Graph-level adapter for the
    SPARQL string front-end: builds the posting table from the query's
    triple table and answers via :func:`query_text`; hits collapse to
    one row per SUBJECT (Lucene documents are keyed by entity —
    ``TextIndexLucene.addEntity``), scores summed over matching
    properties, deterministic (score desc, subject) order before any
    limit. For a standing corpus use :func:`build_text_index` once and
    :func:`query_text` directly — the PF form rebuilds the index per
    query, the right trade only for one-shot queries."""
    import re as _re

    prop: str | None = None
    query: str | None = None
    limit: int | None = None
    for a in args:
        if isinstance(a, bool):
            raise ValueError("text:query: unexpected boolean argument")
        if isinstance(a, (int, float)):
            limit = int(a)
        elif (prop is None and query is None
                and _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", a)):
            prop = a
        elif query is None:
            query = a
        else:
            raise ValueError(f"text:query: unexpected argument {a!r}")
    if query is None:
        raise ValueError("text:query needs a query string")
    idx = build_text_index(
        triples, properties=[prop] if prop is not None else None
    )
    hits = query_text(idx, query)
    per_subject = (
        hits.groupBy("s_kind", "s_val")
        .agg(F.sum("score_bp").alias("score_bp"))
        .orderBy(F.desc("score_bp"), F.asc("s_val"))
        .select(F.col("s_kind").alias("ent_kind"), F.col("s_val").alias("ent"))
    )
    return per_subject.limit(limit) if limit is not None else per_subject
