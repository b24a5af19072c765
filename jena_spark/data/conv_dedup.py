"""Fuzzy whole-conversation near-dedup (token-set Jaccard).

``transcripts.dedup_conversations`` removes EXACT replays (identical
ordered (role, text) sequences). Agent corpora also carry *near*
replays — the same session re-rolled with fresh timestamps, ids, or
one changed tool output — which exact fingerprints miss. This module
treats each conversation as the token SET of its turn texts and drops
any conversation that has a >= threshold Jaccard neighbor with a
smaller conv_id (greedy smaller-id-wins election — the standard
pair-pruning policy of production near-dedup passes; unlike the
connected-components election in ``dedup.dedup_clusters`` it needs no
closure and its verdict for a conversation depends only on its direct
neighbors, which keeps the incremental story simple).

Exactness: the threshold test is pure integer arithmetic —
``1000 * |A∩B| >= threshold_pm * (|A|+|B|-|A∩B|)`` — so the Spark
operator and the DuckDB oracle agree bit-for-bit with no float
division anywhere (the ``data_pii_redaction`` "identical expressions"
discipline).

Distributed shape at 10^12 turns: token sets come straight off the
turns table (one explode + distinct — never a per-conversation string
concatenation, whose row width would grow with conversation length);
the inverted-index self-join is the same bounded pattern as
``dedup.jaccard_pairs`` and accepts the same ``max_df`` hot-token cap
(a token shared by every conversation would make the join quadratic).
The final verdict is one left anti-style join on conv_id.

Reference frame: Jena has no corpus op (training-data-pipeline
extension); the inverted-index/threshold machinery mirrors
``data/dedup.py`` and the greedy election is documented against the
CC-based one there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_token_sets(turns: DataFrame,
                            conv_id: str = "conv_id",
                            text: str = "text") -> DataFrame:
    """``(doc, tok)`` — the distinct whitespace-token set of each
    conversation's turn texts, empty tokens dropped (two all-blank
    conversations are NOT Jaccard-1 duplicates — same guard as
    ``dedup._token_sets``)."""
    return (turns
            .select(F.col(conv_id).alias("doc"),
                    F.explode(F.split(F.trim(F.col(text)), r"\s+"))
                    .alias("tok"))
            .where(F.col("tok") != "")
            .distinct())


def near_dedup_conversations(turns: DataFrame,
                             threshold_pm: int = 700,
                             max_df: int | None = None,
                             conv_id: str = "conv_id",
                             text: str = "text") -> DataFrame:
    """(conv_id, n_tokens, n_smaller_dups, keep) — one row per input
    conversation; ``keep = 1`` iff no conversation with a smaller
    conv_id has token-set Jaccard >= ``threshold_pm``/1000 with it.

    ``n_smaller_dups`` counts the smaller-id near-neighbors that
    doomed the conversation (0 for survivors). ``max_df`` drops
    tokens whose document frequency exceeds it BEFORE the self-join
    (surface dropped tokens via ``dedup.hot_tokens`` — no silent
    caps).
    """
    if not 0 < threshold_pm <= 1000:
        raise ValueError(
            f"threshold_pm must be in (0, 1000], got {threshold_pm}")
    toks = conversation_token_sets(turns, conv_id=conv_id, text=text)
    if max_df is not None:
        rare = (toks.groupBy("tok").agg(F.count("*").alias("df"))
                .where(F.col("df") <= max_df))
        toks = toks.join(rare.select("tok"), "tok")
    sizes = toks.groupBy("doc").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .groupBy(F.col("a.doc").alias("doc_a"),
                      F.col("b.doc").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    pairs = (inter
             .join(sizes.select(F.col("doc").alias("doc_a"),
                                F.col("sz").alias("sz_a")), "doc_a")
             .join(sizes.select(F.col("doc").alias("doc_b"),
                                F.col("sz").alias("sz_b")), "doc_b")
             .where(F.lit(1000) * F.col("i")
                    >= F.lit(int(threshold_pm))
                    * (F.col("sz_a") + F.col("sz_b") - F.col("i"))))
    dooms = pairs.groupBy(F.col("doc_b").alias("doc")) \
                 .agg(F.count("*").alias("_n"))
    convs = turns.select(F.col(conv_id).alias("doc")).distinct()
    return (convs
            .join(sizes, "doc", "left")
            .join(dooms, "doc", "left")
            .select(F.col("doc").alias("conv_id"),
                    F.coalesce("sz", F.lit(0)).cast("bigint")
                    .alias("n_tokens"),
                    F.coalesce("_n", F.lit(0)).cast("bigint")
                    .alias("n_smaller_dups"),
                    F.col("_n").isNull().cast("int").alias("keep")))


def near_dedup_conversations_sql(transcripts_cte: str,
                                 threshold_pm: int = 700,
                                 max_df: int | None = None) -> str:
    """DuckDB twin of :func:`near_dedup_conversations` (identical
    integer threshold inequality — no float division on either
    side)."""
    cap = (f"HAVING count(*) <= {int(max_df)}" if max_df is not None
           else "")
    toks_src = f"""
  SELECT DISTINCT conv_id AS doc, t.tok
  FROM transcripts, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
  WHERE t.tok <> ''"""
    if max_df is not None:
        toks_src = f"""
  SELECT r.doc, r.tok FROM ({toks_src}) r
  JOIN (SELECT tok FROM ({toks_src}) GROUP BY tok {cap}) ok USING (tok)"""
    return f"""
WITH transcripts AS ({transcripts_cte}),
toks AS ({toks_src}),
sizes AS (SELECT doc, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc < b.doc
  GROUP BY a.doc, b.doc
),
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc = doc_a
  JOIN sizes sb ON sb.doc = doc_b
  WHERE 1000 * i >= {int(threshold_pm)} * (sa.sz + sb.sz - i)
),
dooms AS (SELECT doc_b AS doc, CAST(count(*) AS BIGINT) AS n
          FROM pairs GROUP BY doc_b)
SELECT c.doc AS conv_id,
       CAST(coalesce(s.sz, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_smaller_dups,
       CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM (SELECT DISTINCT conv_id AS doc FROM transcripts) c
LEFT JOIN sizes s ON s.doc = c.doc
LEFT JOIN dooms d ON d.doc = c.doc
"""
