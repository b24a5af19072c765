"""ROUGE-L near-dedup — the Self-Instruct similarity gate.

Instruction-tuning pipelines filter generated instructions whose
ROUGE-L against anything already kept exceeds a threshold
(Wang et al. 2022, "Self-Instruct: Aligning Language Models with
Self-Generated Instructions", public method: "a new instruction is
added … only when its ROUGE-L similarity with any existing
instruction is less than 0.7"). ROUGE-L is sequence-aware — it
catches re-orderings and paraphrases that token-SET Jaccard
(:mod:`jena_spark.data.conv_dedup`) scores low — at the price of an
O(|a|·|b|) LCS per compared pair.

Batch/distributed shape: the quadratic LCS work is bounded by
generating candidates FIRST with the same df-capped inverted-index
token join as every other near-dup family here (``max_df`` hot-token
cap, ``min_overlap`` shared-distinct-token floor), then scoring ONLY
the candidates with an Arrow-batched pandas UDF (the repo's "Python
allowed iff Arrow-batched and candidate-bounded" rule — see
``data/dedup.py``'s LSH verify). Candidate generation by shared
DISTINCT tokens is a recall heuristic, not an exact bound (a pair
whose similarity rides ONE token repeated many times shares only one
distinct token): the same honesty class as SimHash/LSH, and pytest
checks recall against the exhaustive scorer on corpora where they
must agree. ``max_tokens`` truncates both sides before the DP (cost
ceiling per pair — documented, not silent: the returned lengths are
the truncated ones the score used).

Scoring is exact integer arithmetic end to end: ``rouge_pm`` is
``(2000 * LCS) DIV (la + lb)`` (ROUGE-L F1 with beta=1, permille,
floored), so verdicts are engine-deterministic. No DuckDB twin — an
O(n·m) DP has no SQL expression DuckDB can run at corpus scale, so
the registry entry is rows-only and pytest owns exactness
(brute-force LCS reference + known-value cases).

No Jena analog — LLM-data-pipeline surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lcs_len(a: list[str], b: list[str]) -> int:
    """Longest-common-subsequence length, vectorized one-row DP:
    ``tmp[j] = max(prev[j], prev[j-1] + eq)`` then a running max —
    the ``cur[j-1]`` carry of the classic recurrence is exactly
    ``maximum.accumulate`` (property-tested against the naive DP in
    ``tests/test_rouge.py``)."""
    if len(a) == 0 or len(b) == 0:
        return 0
    import numpy as np

    b_arr = np.asarray(b, dtype=object)
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    for x in a:
        tmp = np.maximum(prev[1:], prev[:-1] + (b_arr == x))
        prev[1:] = np.maximum.accumulate(tmp)
    return int(prev[-1])


def _tokens(docs: DataFrame, id_col: str, text_col: str,
            max_tokens: int) -> DataFrame:
    """(doc, toks, n_tokens) with the truncated token stream."""
    toks = F.slice(F.split(F.trim(F.col(text_col)), r"\s+"),
                   1, max_tokens)
    return (docs.select(F.col(id_col).alias("doc"), toks.alias("toks"))
            .withColumn("n_tokens", F.size("toks").cast("bigint")))


def rougel_pairs(docs: DataFrame, max_df: int | None = None,
                 min_overlap: int = 1, max_tokens: int = 500,
                 min_rouge_pm: int = 0, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Scored candidate pairs ``(doc_a, doc_b, overlap, lcs,
    rouge_pm)`` with ``doc_a < doc_b`` — the similarity graph for
    cluster-then-elect consumers (``dedup.dedup_clusters``) or the
    greedy verdict of :func:`rougel_dedup`."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = _tokens(docs, id_col, text_col, max_tokens)
    inv = (base.select("doc", F.explode(F.array_distinct("toks"))
                       .alias("tok"))
           .where(F.col("tok") != ""))
    if max_df is not None:
        rare = (inv.groupBy("tok").agg(F.count("*").alias("df"))
                .where(F.col("df") <= max_df).select("tok"))
        inv = inv.join(F.broadcast(rare), "tok")
    a, b = inv.alias("a"), inv.alias("b")
    cand = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .groupBy(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"))
            .agg(F.count("*").cast("bigint").alias("overlap"))
            .where(F.col("overlap") >= min_overlap))

    @F.pandas_udf("long")
    def _lcs(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series([lcs_len(x, y) for x, y in zip(sa, sb)])

    sides = base.select("doc", "toks", "n_tokens")
    return (cand
            .join(sides.select(F.col("doc").alias("doc_a"),
                               F.col("toks").alias("toks_a"),
                               F.col("n_tokens").alias("la")), "doc_a")
            .join(sides.select(F.col("doc").alias("doc_b"),
                               F.col("toks").alias("toks_b"),
                               F.col("n_tokens").alias("lb")), "doc_b")
            .withColumn("lcs", _lcs("toks_a", "toks_b"))
            .withColumn("rouge_pm",
                        F.expr("(2000 * lcs) DIV (la + lb)"))
            .where(F.col("rouge_pm") >= min_rouge_pm)
            .select("doc_a", "doc_b", "overlap",
                    F.col("lcs").cast("bigint").alias("lcs"),
                    F.col("rouge_pm").cast("bigint").alias("rouge_pm")))


def rougel_dedup(docs: DataFrame, threshold_pm: int = 700,
                 max_df: int | None = None, min_overlap: int = 1,
                 max_tokens: int = 500, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_smaller_dups, keep) — ``keep = 1`` iff no
    candidate with a smaller id scores ROUGE-L F1 >=
    ``threshold_pm``/1000 against the document (greedy
    smaller-id-wins, the ``conv_dedup`` election). ``n_tokens`` is
    the truncated length the scorer used."""
    if not 0 < threshold_pm <= 1000:
        raise ValueError(
            f"threshold_pm must be in (0, 1000], got {threshold_pm}")
    pairs = rougel_pairs(docs, max_df=max_df, min_overlap=min_overlap,
                         max_tokens=max_tokens,
                         min_rouge_pm=threshold_pm,
                         id_col=id_col, text_col=text_col)
    dooms = (pairs.groupBy(F.col("doc_b").alias("doc"))
             .agg(F.count("*").alias("_n")))
    base = _tokens(docs, id_col, text_col, max_tokens)
    return (base.select("doc", "n_tokens")
            .join(dooms, "doc", "left")
            .select(F.col("doc").alias(id_col), "n_tokens",
                    F.coalesce("_n", F.lit(0)).cast("bigint")
                    .alias("n_smaller_dups"),
                    F.col("_n").isNull().cast("int").alias("keep")))
