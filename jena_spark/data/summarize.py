"""Extractive conversation summarization — TextRank-lite.

TextRank (Mihalcea & Tarau, EMNLP 2004) reduced to its deterministic
core: sentences are nodes, an undirected edge connects two sentences
of the SAME conversation that share at least ``min_shared`` distinct
content tokens (lowercased ``\\w+`` of length >= 4 — the co-occurrence
filter standing in for a stopword list), and sentence salience is
exact-integer PageRank (:mod:`jena_spark.queries.graphalgo` — the
repo's micro-mass recipe, bit-identical between Spark and the
unrolled DuckDB twin). The top-``k`` sentences per conversation, in
document order, are the summary — the curation-facing "what is this
conversation about" signal, and the building block for
summary-grounded dedup or indexing.

Edge weights are binarized by the threshold (TextRank-lite, not
weighted TextRank) — the price of exact integer determinism, and
documented as such.

Distributed shape: sentence split + tokenization are map-only; the
similarity graph is an inverted-index equi-join on
``(conv_id, token)`` — never an all-pairs product — and every pair
count is bounded by conversation size, which the day-bucketed conv_id
derivation bounds by construction. PageRank runs ONE global
fixed-iteration loop over the union graph of all conversations (no
per-conv driver loop; components don't interact, so within-conv
ranking is preserved). Isolated sentences join back with rank 0 —
deterministically last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sentence boundary — identical RE2/Java semantics in both engines.
SENT_SPLIT = "[.!?]+\\s+"
#: content-token filter: lowercased word tokens of at least this length.
MIN_TOKEN_LEN = 4


def sentences(turns: DataFrame, conv_id: str = "conv_id",
              turn_idx: str = "turn_idx",
              text: str = "text") -> DataFrame:
    """``(conv_id, turn_idx, sent_idx, sentence)`` — split positions
    are assigned BEFORE empty fragments are dropped, so indices agree
    with the SQL twin's list-subscript indexing."""
    s = turns.select(
        conv_id, turn_idx,
        F.posexplode(F.split(F.col(text), SENT_SPLIT))
         .alias("sent_idx", "sentence"))
    return (s.withColumn("sentence", F.trim("sentence"))
            .where(F.col("sentence") != ""))


def _content_tokens(col):
    return F.array_distinct(F.filter(
        F.split(F.lower(col), r"\W+"),
        lambda t: F.length(t) >= MIN_TOKEN_LEN))


def _node(conv, t, s):
    return F.concat_ws("#", conv, t.cast("string"), s.cast("string"))


def sentence_edges(sents: DataFrame, min_shared: int = 2) -> DataFrame:
    """Undirected (emitted both ways) ``(src, dst)`` string-node edges
    between same-conversation sentences sharing >= ``min_shared``
    distinct content tokens — via an inverted-index join, never a
    cartesian product."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    tok = sents.select(
        "conv_id", "turn_idx", "sent_idx",
        F.explode(_content_tokens(F.col("sentence"))).alias("tok"))
    a, b = tok.alias("a"), tok.alias("b")
    lt = (F.col("a.turn_idx") < F.col("b.turn_idx")) | (
        (F.col("a.turn_idx") == F.col("b.turn_idx"))
        & (F.col("a.sent_idx") < F.col("b.sent_idx")))
    pairs = (a.join(b, (F.col("a.conv_id") == F.col("b.conv_id"))
                    & (F.col("a.tok") == F.col("b.tok")) & lt)
             .groupBy(F.col("a.conv_id").alias("conv_id"),
                      F.col("a.turn_idx").alias("ti"),
                      F.col("a.sent_idx").alias("si"),
                      F.col("b.turn_idx").alias("tj"),
                      F.col("b.sent_idx").alias("sj"))
             .agg(F.count("*").alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))
    u = _node(F.col("conv_id"), F.col("ti"), F.col("si"))
    v = _node(F.col("conv_id"), F.col("tj"), F.col("sj"))
    return (pairs.select(u.alias("src"), v.alias("dst"))
            .unionByName(pairs.select(v.alias("src"), u.alias("dst"))))


def textrank_summary(turns: DataFrame, k: int = 2, iters: int = 3,
                     min_shared: int = 2) -> DataFrame:
    """Top-``k`` sentences per conversation by exact-integer TextRank:
    ``(conv_id, turn_idx, sent_idx, sentence, rank_u, pos)`` with
    ``pos`` 1-based in salience order (ties and isolated sentences
    break by document order)."""
    from jena_spark.queries.graphalgo import pagerank

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sents = sentences(turns).persist()
    # per-round checkpoints (the pagerank default): the sentence edge
    # frame carries the inverted-index join lineage, and the unrolled
    # megaplan re-inlines it — measured 32.6 s vs 7.8 s at sf0.1
    # (BENCH/BASELINE.md's iterative-graph lesson #1 holds here too)
    ranks = pagerank(sentence_edges(sents, min_shared), iters=iters)
    joined = (sents.withColumn(
        "_node", _node(F.col("conv_id"), F.col("turn_idx"),
                       F.col("sent_idx")))
        .join(ranks.withColumnRenamed("node", "_node"), "_node", "left")
        .withColumn("rank_u", F.coalesce("rank_u", F.lit(0))))
    w = Window.partitionBy("conv_id").orderBy(
        F.col("rank_u").desc(), "turn_idx", "sent_idx")
    return (joined.withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= k)
            .select("conv_id", "turn_idx", "sent_idx", "sentence",
                    "rank_u", "pos"))


def textrank_summary_sql(transcripts_cte: str, k: int = 2,
                         iters: int = 3, min_shared: int = 2) -> str:
    """DuckDB twin of :func:`textrank_summary` — sentence split via
    list subscripts, the same inverted-index pair join, and the
    unrolled exact-integer PageRank chain from ``graphalgo``."""
    from jena_spark.queries.graphalgo import pagerank_sql

    edges_cte = f"""SELECT * FROM (
  WITH transcripts AS ({transcripts_cte}),
  sp AS (SELECT conv_id, turn_idx,
                regexp_split_to_array(text, '{SENT_SPLIT}') AS ss
         FROM transcripts),
  sents AS (SELECT conv_id, turn_idx, i - 1 AS sent_idx,
                   trim(ss[i]) AS sentence
            FROM sp, LATERAL (SELECT unnest(generate_series(
                 1, len(ss))) AS i) t
            WHERE trim(ss[i]) != ''),
  tok AS (SELECT conv_id, turn_idx, sent_idx,
                 unnest(list_distinct(list_filter(
                   regexp_split_to_array(lower(sentence), '\\W+'),
                   x -> len(x) >= {MIN_TOKEN_LEN}))) AS tok
          FROM sents),
  pairs AS (
    SELECT a.conv_id, a.turn_idx AS ti, a.sent_idx AS si,
           b.turn_idx AS tj, b.sent_idx AS sj
    FROM tok a JOIN tok b
      ON a.conv_id = b.conv_id AND a.tok = b.tok
     AND (a.turn_idx, a.sent_idx) < (b.turn_idx, b.sent_idx)
    GROUP BY ALL
    HAVING count(*) >= {min_shared}),
  nodes AS (
    SELECT conv_id || '#' || ti || '#' || si AS src,
           conv_id || '#' || tj || '#' || sj AS dst
    FROM pairs)
  SELECT src, dst FROM nodes
  UNION ALL SELECT dst, src FROM nodes)"""
    pr = pagerank_sql(edges_cte, iters)
    return f"""WITH transcripts AS ({transcripts_cte}),
sp AS (SELECT conv_id, turn_idx,
              regexp_split_to_array(text, '{SENT_SPLIT}') AS ss
       FROM transcripts),
sents AS (SELECT conv_id, turn_idx, i - 1 AS sent_idx,
                 trim(ss[i]) AS sentence
          FROM sp, LATERAL (SELECT unnest(generate_series(
               1, len(ss))) AS i) t
          WHERE trim(ss[i]) != ''),
pr AS MATERIALIZED ({pr}),
j AS (
  SELECT s.conv_id, s.turn_idx, s.sent_idx, s.sentence,
         CAST(coalesce(p.rank_u, 0) AS BIGINT) AS rank_u
  FROM sents s LEFT JOIN pr p
    ON p.node = s.conv_id || '#' || s.turn_idx || '#' || s.sent_idx),
r AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
           ORDER BY rank_u DESC, turn_idx, sent_idx) AS pos
  FROM j)
SELECT conv_id, turn_idx, sent_idx, sentence, rank_u,
       CAST(pos AS INT) AS pos
FROM r WHERE pos <= {k}"""
