"""N-gram language-model scoring — CCNet-style perplexity filtering.

The classic data-selection signal (Wenzek et al., *CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data*, LREC 2020):
train a small LM on a reference corpus, score every candidate document
by its per-token negative log-likelihood, and keep the
low-perplexity (reference-like) tail. The production pipeline uses a
KenLM 5-gram; this operator is the same selection machinery over an
add-one-smoothed bigram model, which is what the sandbox can train
deterministically — the join/aggregation shape (the part that matters
at 100 TB) is identical for any n.

Determinism follows ``data/selection.py::importance_weights``: each
bigram's negative log2-probability is quantized ONCE to an integer
number of micro-bits (1e-6 bits), and every aggregation from there is
exact integer arithmetic — no float-sum ordering drift between
partitions, runs, or engines, so a DuckDB oracle can reproduce the
scores bit-for-bit.

Scale posture: the trained model is two count tables — distinct
bigrams and distinct context unigrams of the reference corpus. They
are corpus-vocabulary-sized, NOT row-count-sized, but can still be
large (web-scale vocab), so scoring joins them by shuffle hash join on
the gram key and leaves broadcast decisions to AQE; only the 1-row
vocabulary-size dim is broadcast explicitly. Per-document work is
pre-combined to one row per DISTINCT (doc, bigram) before any join —
the same map-side-combine trick as ``text.repetition_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.text import tokens


def _word_pairs(docs: DataFrame, text: str, *keep) -> DataFrame:
    """One row per ADJACENT word pair occurrence: ``(*keep, w1, w2)``.
    Documents with fewer than two words contribute nothing."""
    ws = tokens(F.col(text))
    pairs = F.when(
        F.size(ws) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + 1).alias("w2")),
        )
    )
    return (docs.where(F.length(F.trim(F.col(text))) > 0)
            .select(*keep, F.explode(pairs).alias("g"))
            .select(*keep, F.col("g.w1").alias("w1"),
                    F.col("g.w2").alias("w2")))


def _scored_pairs(docs: DataFrame, lm_docs: DataFrame | None,
                  doc_id: str, text: str) -> DataFrame:
    """Per-document distinct-bigram scores: ``(doc_id, w1, w2, m, q)``
    with occurrence count ``m`` and the add-one-smoothed bigram NLL
    ``q`` in integer micro-bits (quantized once — see module
    docstring)."""
    lm = lm_docs if lm_docs is not None else docs
    lm_pairs = _word_pairs(lm, text)
    big = lm_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = lm_pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (lm.where(F.length(F.trim(F.col(text))) > 0)
             .select(F.explode(tokens(F.col(text))).alias("w"))
             .agg(F.countDistinct("w").alias("v")))

    freq = (_word_pairs(docs, text, doc_id)
            .groupBy(doc_id, "w1", "w2").agg(F.count(F.lit(1)).alias("m")))
    p = ((F.coalesce("c2", F.lit(0)) + 1).cast("double")
         / (F.coalesce("c1", F.lit(0)) + F.col("v")))
    return (freq.join(big, ["w1", "w2"], "left")
            .join(ctx, ["w1"], "left")
            .crossJoin(F.broadcast(vocab))
            .select(doc_id, "w1", "w2", "m",
                    F.floor(-F.log2(p) * 1e6 + F.lit(0.5))
                    .cast("bigint").alias("q")))


def bigram_lm_scores(docs: DataFrame, lm_docs: DataFrame | None = None,
                     doc_id: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """Per-document bigram-LM negative log-likelihood.

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)`` — add-one smoothing
    over the reference corpus ``lm_docs`` (default: ``docs`` itself,
    the self-perplexity census). Returns one row per document with at
    least one bigram:

    * ``n_bigrams`` — scored bigram occurrences (exact),
    * ``nll_ubits`` — Σ occurrences × quantized −log2 P, in integer
      micro-bits (exact — the engine-portable score),
    * ``avg_logprob`` — bits per bigram, ``nll_ubits / (1e6·n)``
      rounded to 6 dp,
    * ``perplexity`` — ``2^avg_logprob`` rounded to 4 dp (float
      convenience; threshold on the exact columns in pipelines).
    """
    scored = _scored_pairs(docs, lm_docs, doc_id, text) \
        .select(doc_id, "m", "q")
    agg = scored.groupBy(doc_id).agg(
        F.sum("m").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("q")).cast("bigint").alias("nll_ubits"))
    avg = F.col("nll_ubits") / (F.lit(1e6) * F.col("n_bigrams"))
    return agg.select(
        doc_id, "n_bigrams", "nll_ubits",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.pow(F.lit(2.0), avg), 4).alias("perplexity"))


def ccnet_buckets(docs: DataFrame, lm_docs: DataFrame | None = None,
                  group: str = "lang",
                  doc_id: str = "doc_id", text: str = "text",
                  cuts: tuple[float, float] = (1.0 / 3, 2.0 / 3),
                  exact: bool = True) -> DataFrame:
    """CCNet's head/middle/tail selection (Wenzek et al. 2020 §4.3):
    per-``group`` (language) perplexity terciles — the best-modeled
    third of each language is ``head``, the worst ``tail``. The actual
    CCNet release ships data partitioned exactly this way; downstream
    recipes train on head+middle.

    Returns one row per scored document (documents with no bigrams
    have no perplexity and are absent, as in ``bigram_lm_scores``):
    ``(doc_id, <group>, avg_logprob, bucket)`` with ``bucket`` ∈
    head/middle/tail by ``avg_logprob <= q(cuts[0]) / q(cuts[1])``.

    Scale: the threshold frame is one row per group — tiny — and the
    bucket assignment is a broadcast join + map-only CASE. With
    ``exact=True`` the quantiles are the exact interpolated order
    statistics (engine-portable vs the oracle; per-group distinct
    6dp-rounded values must fit one aggregation buffer — fine up to
    ~10^7 distincts). At data scale set ``exact=False`` for the
    mergeable ``percentile_approx`` sketch instead."""
    scores = bigram_lm_scores(docs, lm_docs, doc_id=doc_id, text=text)
    scored = scores.join(docs.select(doc_id, group), doc_id)
    pct = "percentile" if exact else "percentile_approx"
    thr = scored.groupBy(group).agg(
        F.expr(f"{pct}(avg_logprob, array({cuts[0]!r}, {cuts[1]!r}))")
        .alias("_q"))
    return (scored.join(F.broadcast(thr), group)
                  .select(doc_id, group, "avg_logprob",
                          F.when(F.col("avg_logprob") <= F.col("_q")[0],
                                 "head")
                           .when(F.col("avg_logprob") <= F.col("_q")[1],
                                 "middle")
                           .otherwise("tail").alias("bucket")))


def mink_prob_scores(docs: DataFrame, k_pct: int = 20,
                     lm_docs: DataFrame | None = None,
                     doc_id: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """Min-K% prob membership score (Shi et al. 2024, *Detecting
    Pretraining Data from Large Language Models*, public method): a
    document's score is the mean NLL of its ``k_pct``% LEAST likely
    token events — members of the training set lack high-surprise
    outlier tokens, so a low Min-K% score flags likely contamination /
    memorization. Here the token event is a bigram occurrence under
    the same add-one bigram model as :func:`bigram_lm_scores` (the
    production shape swaps in a real LM's per-token logprobs; the
    selection machinery — the part that matters at scale — is
    identical).

    Exact integer arithmetic end-to-end: per-doc selection count
    ``c = max(1, n_bigrams * k_pct DIV 100)``; occurrences are taken
    in (q desc, w1, w2) order — a total order, since (w1,w2) is
    distinct per doc — with partial takes from the boundary bigram's
    multiplicity; the score is ``sum(take·q) DIV c`` micro-bits.

    Scale: one extra window pass (partitioned by doc — bounded state)
    over the per-(doc, distinct-bigram) rows the LM scoring already
    produces; never an explode to per-occurrence rows.

    Returns ``(doc_id, n_bigrams, n_sel, mink_ubits)``.
    """
    if not 1 <= k_pct <= 100:
        raise ValueError(f"mink_prob_scores: k_pct in [1,100], got {k_pct}")
    from pyspark.sql import Window

    sc = _scored_pairs(docs, lm_docs, doc_id, text)
    w_doc = Window.partitionBy(doc_id)
    w_ord = (Window.partitionBy(doc_id)
             .orderBy(F.desc("q"), F.asc("w1"), F.asc("w2"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.sum("m").over(w_doc)
    cum = F.sum("m").over(w_ord)
    c = F.greatest(F.lit(1), F.expr(f"n_total * {int(k_pct)} DIV 100"))
    d = (sc.withColumn("n_total", n.cast("bigint"))
           .withColumn("_cum", cum.cast("bigint"))
           .withColumn("_c", c.cast("bigint"))
           .withColumn("_take",
                       F.greatest(F.lit(0),
                                  F.least(F.col("m"),
                                          F.col("_c") - (F.col("_cum")
                                                         - F.col("m"))))))
    return (d.groupBy(doc_id)
            .agg(F.max("n_total").cast("bigint").alias("n_bigrams"),
                 F.sum("_take").cast("bigint").alias("n_sel"),
                 F.expr("sum(_take * q) DIV max(_c)").cast("bigint")
                 .alias("mink_ubits")))
