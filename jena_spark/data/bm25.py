"""Okapi BM25 ranked retrieval over a document corpus.

:func:`hard_negatives <jena_spark.data.retrieval.hard_negatives>`
ranks candidates by raw shared-token counts — the right signal for
mining *negatives*, where stopword-ish matches are exactly what the
df cap throws away. A retrieval *ranker* needs term weighting: BM25
(Robertson et al., TREC-3; the Lucene default since 6.0) scores

    score(q, d) = sum over t in q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

with ``idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the Lucene
"plus one" variant — always positive, so hot terms dampen instead of
flipping sign) and the standard ``k1 = 1.2``, ``b = 0.75``.

Determinism contract (the repo-wide integer recipe, see
``data/lm.py``): floats appear exactly ONCE, in the idf quantization
``idf_u = floor(ln(x) * 1e6 + 0.5)`` (integer micro-nats). The tf
normalization is exact integer arithmetic — with ``k1 = 12/10``,
``b = 3/4`` and the integer-rounded average doc length
``A = (2S + N) div (2N)`` (S = total tokens, N = docs), the fraction
clears to

    tf_norm_permille = (22000 * tf * A) div (10*tf*A + 3*A + 9*dl)

so every per-term contribution ``idf_u * tf_norm_permille`` and the
per-(query, doc) sum are exact BIGINTs that Spark and DuckDB agree on
bit-for-bit; ranking ties break on ``did`` ascending. Quantization
changes scores by <0.1% relative — never the ranking semantics BM25
exists for.

Scale design: the only all-pairs surface is the inverted-index token
equi-join (the ``data/dedup.py`` posture); its volume is
``sum_t df_q(t) * df_d(t)``, bounded by the corpus-side ``max_df``
cap (MANDATORY at 100 TB — stopwords otherwise contribute |Q|*|D|
pairs each, and BM25 assigns them near-zero weight anyway). Corpus
statistics are two hash aggregations (per-(doc, term) tf with
map-side combine, then per-doc length); the three-row globals frame
is broadcast. The per-query top-k window runs over candidates already
bounded by the df caps.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate). jena-text ranks
with Lucene's BM25 behind ``text:query`` (see
``jena-text/src/main/java/org/apache/jena/query/text/
TextIndexLucene.java`` — scoring delegated to Lucene); this module is
the corpus-side analog over plain document tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jena_spark.data.decontaminate import _words

# k1 = 1.2 and b = 0.75 are cleared into these integer coefficients
# (see module docstring); they are deliberately NOT parameters — a
# float knob would reopen the cross-engine determinism hole.
_NUM = 22000   # 1000 * 10 * (k1 + 1)          = 1000 * 22,  / 10
_DEN_TF = 10   # 10 * tf * A
_DEN_A = 3     # 10 * k1 * (1 - b) * A         = 3 * A
_DEN_DL = 9    # 10 * k1 * b * dl              = 9 * dl


def _corpus_stats(corpus: DataFrame, did: str, dtext: str,
                  max_df: int | None):
    """(per-(did,tok) tf+dl frame, idf-per-token frame, globals row)."""
    toks = (corpus.select(F.col(did),
                          F.explode(_words(F.col(dtext))).alias("_tok"))
            .where(F.col("_tok") != ""))
    tf = toks.groupBy(did, "_tok").agg(F.count("*").cast("long").alias("tf"))
    # doc length then re-attach: both aggregations hash on did, so the
    # second join is co-partitioned with the first agg's output
    dl = tf.groupBy(did).agg(F.sum("tf").alias("dl"))
    # N docs / S tokens over docs with >= 1 token (zero-token docs can
    # never match and would only shift avgdl; documented convention,
    # mirrored in the oracle)
    glob = dl.agg(F.count("*").cast("long").alias("n_docs"),
                  F.sum("dl").cast("long").alias("s_tokens"))
    df_t = tf.groupBy("_tok").agg(F.count("*").cast("long").alias("df"))
    if max_df is not None:
        df_t = df_t.where(F.col("df") <= int(max_df))
    # idf in integer micro-nats — the module's single float touchpoint
    idf = (df_t.crossJoin(F.broadcast(glob))
           .withColumn(
               "idf_u",
               F.floor(F.log(
                   (F.col("n_docs").cast("double")
                    - F.col("df").cast("double") + F.lit(0.5))
                   / (F.col("df").cast("double") + F.lit(0.5))
                   + F.lit(1.0)) * F.lit(1000000.0) + F.lit(0.5))
               .cast("long"))
           .select("_tok", "idf_u"))
    return tf.join(dl, did), idf, glob


def bm25_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
              max_df: int | None = None,
              qid: str = "qid", qtext: str = "text",
              did: str = "did", dtext: str = "text") -> DataFrame:
    """Top-``k`` corpus documents per query by exact-integer BM25.

    Returns ``(qid, did, score_u, hits, rank)`` — ``score_u`` is the
    BM25 score in (micro-nat idf) x (permille tf-norm) integer units,
    ``hits`` the number of distinct query terms matched, ``rank``
    1-based by ``(score_u desc, did asc)``. Query terms are DISTINCT
    normalized tokens (standard bag-of-words query semantics; query-
    side tf is ignored as in Lucene's practical default for short
    queries). ``max_df`` drops corpus terms hotter than the cap from
    BOTH sides — optional at test scale, mandatory at 100 TB.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ct, idf, glob = _corpus_stats(corpus, did, dtext, max_df)
    qt = (queries.select(F.col(qid),
                         F.explode(F.array_distinct(
                             _words(F.col(qtext)))).alias("_tok"))
          .where(F.col("_tok") != ""))
    # the inner join against the df-capped idf frame enforces max_df
    # on the query side for free; A = (2S + N) div (2N) is the
    # integer-rounded average doc length
    pairs = (qt.join(ct.join(idf, "_tok"), "_tok")
             .crossJoin(F.broadcast(glob))
             .withColumn("_a", F.expr(
                 "(2 * s_tokens + n_docs) div (2 * n_docs)"))
             .withColumn("_tfq", F.expr(
                 f"({_NUM} * tf * _a) div "
                 f"({_DEN_TF} * tf * _a + {_DEN_A} * _a + {_DEN_DL} * dl)"))
             .withColumn("_contrib", F.col("idf_u") * F.col("_tfq")))
    scored = (pairs.groupBy(qid, did)
              .agg(F.sum("_contrib").cast("long").alias("score_u"),
                   F.count("*").cast("long").alias("hits")))
    w = Window.partitionBy(qid).orderBy(F.col("score_u").desc(),
                                        F.col(did).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid, did, "score_u", "hits",
                    F.col("rank").cast("int").alias("rank")))


def bm25_sql(queries_cte: str, corpus_cte: str, k: int = 10,
             max_df: int | None = None) -> str:
    """DuckDB twin of :func:`bm25_topk`.

    ``queries_cte`` must yield ``(qid, text)`` and ``corpus_cte``
    ``(did, text)`` — identical normalization, quantization, integer
    tf-norm, and tie-break, so the result hash-matches the Spark
    frame. ``//`` is DuckDB's integer division; all operands are
    positive, so it agrees with Spark's ``div``.
    """
    norm_all = ("string_split(trim(regexp_replace(lower(text), "
                "'[^a-z0-9]+', ' ', 'g')), ' ')")
    norm_q = f"list_distinct({norm_all})"
    df_cap = f"WHERE df <= {int(max_df)}" if max_df is not None else ""
    return f"""WITH qsrc AS ({queries_cte}),
dsrc AS ({corpus_cte}),
dtok AS (
  SELECT did, unnest({norm_all}) AS tok FROM dsrc),
tf AS (
  SELECT did, tok, CAST(count(*) AS BIGINT) AS tf
  FROM dtok WHERE tok <> '' GROUP BY did, tok),
dl AS (SELECT did, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY did),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS s_tokens FROM dl),
idf AS (
  SELECT tok, CAST(floor(ln(
           (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
           / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0 + 0.5)
         AS BIGINT) AS idf_u
  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY tok) dfx, gstats {df_cap}),
qt AS (
  SELECT qid, unnest({norm_q}) AS tok FROM qsrc),
pairs AS (
  SELECT q.qid, t.did, idf.idf_u,
         ({_NUM} * t.tf * g.a) // ({_DEN_TF} * t.tf * g.a
            + {_DEN_A} * g.a + {_DEN_DL} * d.dl) AS tfq
  FROM qt q
  JOIN tf t ON q.tok = t.tok AND q.tok <> ''
  JOIN idf ON t.tok = idf.tok
  JOIN dl d ON t.did = d.did
  CROSS JOIN (SELECT (2 * s_tokens + n_docs) // (2 * n_docs) AS a
              FROM gstats) g),
scored AS (
  SELECT qid, did, CAST(sum(idf_u * tfq) AS BIGINT) AS score_u,
         CAST(count(*) AS BIGINT) AS hits
  FROM pairs GROUP BY qid, did),
ranked AS (
  SELECT qid, did, score_u, hits,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY score_u DESC, did ASC) AS INT) AS rank
  FROM scored)
SELECT qid, did, score_u, hits, rank FROM ranked
WHERE rank <= {int(k)}"""
