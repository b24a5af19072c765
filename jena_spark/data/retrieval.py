"""Hard-negative mining for retrieval / embedding training data.

Dense-retriever training (DPR, Contriever, E5, GTE — and the
contrastive stages of every modern embedding model) needs, for each
(query, positive) pair, a handful of HARD negatives: passages that
look lexically similar to the query but are not its positive. Random
negatives are too easy (the in-batch softmax saturates); the standard
recipe mines the top-k BM25/lexical-overlap candidates from OTHER
documents and labels them negative.

:func:`hard_negatives` is that mining pass: for every query, the
top-k corpus items by shared-distinct-token count, excluding the
query's own group (for transcripts: its own conversation — the
positive and everything correlated with it).

Scale design (the inverted-index posture of
:mod:`jena_spark.data.dedup`): both sides explode to DISTINCT
(id, token) rows and meet in a token-equality join — the only
all-pairs surface, and its volume is sum over tokens of
``df_q(token) * df_d(token)``, which ``max_df`` bounds by dropping
tokens hotter than the cap on the CORPUS side (stopwords would
otherwise contribute |Q|x|D| pairs each; dropping them loses no
signal a contrastive negative needs — a stopword match is exactly the
"easy negative" this pass exists to avoid). ``max_df`` is OPTIONAL
here but MANDATORY at scale; the per-query top-k is a window over
candidates already bounded by the df caps (for pathological hot
queries, the two-phase salted top-n of
``data/selection.py::cap_per_source`` swaps in row-identically).
Everything is exact integer counts with a total (score desc, id asc)
tie-break, so the DuckDB oracle hash-matches.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jena_spark.data.decontaminate import _words


def _tokens(df: DataFrame, id_col: str, text_col: str,
            extra: list[str]) -> DataFrame:
    """DISTINCT (id[, extra...], token) rows — map-only explode."""
    return (df.select(F.col(id_col), *[F.col(c) for c in extra],
                      F.explode(F.array_distinct(
                          _words(F.col(text_col)))).alias("_tok"))
            .where(F.col("_tok") != ""))


def hard_negatives(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   min_overlap: int = 2, max_df: int | None = None,
                   qid: str = "qid", qtext: str = "text",
                   did: str = "did", dtext: str = "text",
                   qgroup: str | None = None,
                   dgroup: str | None = None) -> DataFrame:
    """Top-``k`` lexical hard negatives per query.

    Returns ``(qid, did, overlap, rank)`` — ``overlap`` is the number
    of shared distinct normalized tokens (``>= min_overlap``),
    ``rank`` is 1-based by ``(overlap desc, did asc)``. When
    ``qgroup``/``dgroup`` name group columns (both or neither),
    candidates from the query's own group are excluded — the
    positive, and anything else correlated with the query, must never
    be labeled negative. Queries with no qualifying candidate produce
    no rows (the caller pads with random negatives if the trainer
    needs a fixed fan-out).
    """
    if (qgroup is None) != (dgroup is None):
        raise ValueError("pass both qgroup and dgroup, or neither")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    qt = _tokens(queries, qid, qtext, [qgroup] if qgroup else [])
    dt = _tokens(corpus, did, dtext, [dgroup] if dgroup else [])
    if qgroup:
        # the two group columns may share a name — disambiguate
        # before the token join or the <> filter is unresolvable
        qt = qt.withColumnRenamed(qgroup, "_qgrp")
        dt = dt.withColumnRenamed(dgroup, "_dgrp")
    if max_df is not None:
        hot = (dt.groupBy("_tok").agg(F.count("*").alias("_df"))
               .where(F.col("_df") > max_df).select("_tok"))
        # broadcast anti-join: the hot set is tiny by construction
        # (tokens above a df cap), and BOTH sides must drop them or
        # the join re-inflates
        dt = dt.join(F.broadcast(hot), "_tok", "left_anti")
        qt = qt.join(F.broadcast(hot), "_tok", "left_anti")
    pairs = qt.join(dt, "_tok")
    if qgroup:
        pairs = pairs.where(F.col("_qgrp") != F.col("_dgrp"))
    scored = (pairs.groupBy(qid, did)
              .agg(F.count("*").alias("overlap"))
              .where(F.col("overlap") >= min_overlap))
    w = Window.partitionBy(qid).orderBy(F.col("overlap").desc(),
                                        F.col(did).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid, did, F.col("overlap").cast("long").alias("overlap"),
                    F.col("rank").cast("int").alias("rank")))


def hard_negatives_sql(queries_cte: str, corpus_cte: str, k: int = 5,
                       min_overlap: int = 2,
                       max_df: int | None = None,
                       grouped: bool = False) -> str:
    """DuckDB twin of :func:`hard_negatives`.

    ``queries_cte`` must yield ``(qid, text[, grp])`` and
    ``corpus_cte`` ``(did, text[, grp])`` (``grp`` required iff
    ``grouped``) — the identical normalization, df cap, scoring, and
    tie-break, so the result hash-matches the Spark frame.
    """
    grp_q = ", grp" if grouped else ""
    norm = ("list_distinct(string_split(trim(regexp_replace(lower(text), "
            "'[^a-z0-9]+', ' ', 'g')), ' '))")
    df_cap = (f",\nhot AS (SELECT tok FROM dt GROUP BY tok "
              f"HAVING count(*) > {int(max_df)})"
              if max_df is not None else "")
    anti = " WHERE tok NOT IN (SELECT tok FROM hot)" \
        if max_df is not None else ""
    same_grp = "AND q.grp <> d.grp " if grouped else ""
    return f"""WITH qsrc AS ({queries_cte}),
dsrc AS ({corpus_cte}),
qt0 AS (
  SELECT qid{grp_q}, unnest({norm}) AS tok FROM qsrc),
dt AS (
  SELECT did{grp_q}, unnest({norm}) AS tok
  FROM dsrc){df_cap},
qt AS (SELECT * FROM qt0{anti}),
scored AS (
  SELECT q.qid, d.did, CAST(count(*) AS BIGINT) AS overlap
  FROM qt q JOIN (SELECT * FROM dt{anti}) d ON q.tok = d.tok
    AND q.tok <> '' {same_grp}
  GROUP BY q.qid, d.did
  HAVING count(*) >= {int(min_overlap)}),
ranked AS (
  SELECT qid, did, overlap,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY overlap DESC, did ASC) AS INT) AS rank
  FROM scored)
SELECT qid, did, overlap, rank FROM ranked WHERE rank <= {int(k)}"""


def retrieval_eval(queries: DataFrame, corpus: DataFrame,
                   gold: DataFrame, k: int = 10,
                   min_overlap: int = 1, max_df: int | None = None,
                   qid: str = "qid", qtext: str = "text",
                   did: str = "did", dtext: str = "text",
                   gold_col: str = "gold_did") -> DataFrame:
    """Retrieval-quality eval over the lexical ranker — the
    recall@k / MRR@k harness every retrieval-training pipeline runs
    (BEIR/MTEB protocol, public convention) to sanity-check its
    mining index before spending GPU time on the mined pairs.

    ``gold`` maps each query to its relevant document
    (``qid, gold_col``). Every query is ranked against the corpus
    with the same inverted-index scorer as :func:`hard_negatives`
    (no group exclusion — the gold document must be findable), and
    the gold's rank is looked up. Returns one row per gold pair:
    ``(qid, gold_did, rank, hit, rr_pm)`` with ``rank = 0`` on a miss
    (gold outside top-``k`` or below ``min_overlap``), ``hit`` ∈
    {0,1} (recall@k numerator) and ``rr_pm = 1000 DIV rank`` — the
    integer-permille reciprocal rank (MRR@k numerator; exact, so the
    oracle hash-matches). Aggregate means driver-side or with one
    more tiny agg.

    Scale: identical to the mining pass (one token-equality join
    bounded by ``max_df``) plus a broadcast-sized join against gold.
    """
    ranked = hard_negatives(queries, corpus, k=k, min_overlap=min_overlap,
                            max_df=max_df, qid=qid, qtext=qtext,
                            did=did, dtext=dtext)
    g = gold.select(qid, F.col(gold_col).alias("_gold"))
    r = ranked.withColumnRenamed(did, "_gold")
    j = g.join(r, [qid, "_gold"], "left")
    return j.select(
        qid, F.col("_gold").alias(gold_col),
        F.coalesce(F.col("rank"), F.lit(0)).cast("int").alias("rank"),
        F.when(F.col("rank").isNotNull(), 1).otherwise(0)
         .cast("int").alias("hit"),
        F.expr("CASE WHEN rank IS NOT NULL THEN 1000 DIV rank"
               " ELSE 0 END").cast("int").alias("rr_pm"))


def retrieval_eval_sql(queries_cte: str, corpus_cte: str, gold_cte: str,
                       k: int = 10, min_overlap: int = 1,
                       max_df: int | None = None) -> str:
    """DuckDB twin of :func:`retrieval_eval`. ``gold_cte`` must yield
    ``(qid, gold_did)``; the ranker twin is
    :func:`hard_negatives_sql` verbatim."""
    hn = hard_negatives_sql(queries_cte, corpus_cte, k=k,
                            min_overlap=min_overlap, max_df=max_df)
    return f"""WITH r AS ({hn}),
g AS ({gold_cte})
SELECT g.qid, g.gold_did,
  CAST(coalesce(r.rank, 0) AS INT) AS rank,
  CAST(CASE WHEN r.rank IS NOT NULL THEN 1 ELSE 0 END AS INT) AS hit,
  CAST(CASE WHEN r.rank IS NOT NULL THEN 1000 // r.rank ELSE 0 END
       AS INT) AS rr_pm
FROM g LEFT JOIN r ON r.qid = g.qid AND r.did = g.gold_did"""
