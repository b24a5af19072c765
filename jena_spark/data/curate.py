"""Corpus curation — the composed training-data filter.

A pretraining pipeline's document filter is a CONJUNCTION of the ops
this package already ships individually: language selection
(:func:`jena_spark.data.text.lang_id` family), quality thresholding
(:func:`jena_spark.data.text.quality_score_bp` — integer basis points,
engine-exact), exact dedup (sha-256 group representative), and
near-dup cluster survivorship
(:func:`jena_spark.data.dedup.dedup_clusters` over Jaccard pairs).
``curate_corpus`` evaluates all four in one job and labels every
document with its fate — the audit table a data-governance review
wants, and the filter frame the write-out job semi-joins against.

Design choices (documented, deterministic):

* Rules are evaluated INDEPENDENTLY on the full corpus — the dup
  survivor election does not re-run after quality filtering. This
  keeps the job one parallel pass (no cascade recomputation) and makes
  every rule's verdict explainable in isolation; a pipeline that wants
  cascade re-election re-runs curation on the filtered output.
* ``reason`` is the FIRST failing rule in the fixed order lang →
  quality → exact_dup → near_dup (one reason per document keeps the
  audit table one row per doc).
* Everything is exact integer/hash arithmetic — the whole verdict
  table hash-matches a DuckDB twin (``data_curate`` registry entry).

Scale shape: lang/quality are per-row JVM expressions (zero shuffle);
exact dedup is one hash-groupBy; the near-dup component reuses the
bucketed inverted-index + CC machinery. Nothing here adds a new
shuffle beyond the ops it composes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data import dedup as DD
from jena_spark.data import text as TX


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality_bp: int = 5000,
    jaccard_threshold: float = 0.3,
    ngram: int = 3,
    max_df: int = 1000,
    pairs: DataFrame | None = None,
    max_rep_frac: float | None = None,
    max_pii: int | None = None,
    rep_ngram: int = 2,
    nb_weights: DataFrame | None = None,
    min_nb_unats: int = 0,
    nb_buckets: int = 4096,
    max_avg_logprob: float | None = None,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """-> ``(doc_id, kept, reason)``: one verdict row per document;
    ``reason`` is null for kept docs, else the first failing rule
    (``lang`` / ``quality`` / ``repetition`` / ``pii`` /
    ``classifier`` / ``perplexity`` / ``exact_dup`` / ``near_dup``).

    Opt-in content rules (default off, so the four-rule verdict stays
    byte-stable): ``max_rep_frac`` thresholds the Gopher-style
    hottest-``rep_ngram`` repetition fraction
    (:func:`jena_spark.data.text.repetition_stats`; docs too short to
    measure pass), ``max_pii`` bounds the total PII match count
    (:func:`jena_spark.data.redact.pii_counts`; ``0`` = reject any
    email/IP/SSN/phone), ``nb_weights`` (a trained
    :func:`jena_spark.data.classifier.nb_train` frame) rejects docs
    whose NB log-odds score falls below ``min_nb_unats`` (the GPT-3
    quality-classifier gate; ``nb_buckets`` MUST equal the value the
    weights were trained with — the hash space is not recorded in the
    frame), and ``max_avg_logprob`` rejects docs the
    bigram LM (trained on ``lm_docs``, default the corpus itself)
    models WORSE than the threshold bits/bigram — the CCNet
    perplexity gate (docs with no bigrams pass).

    ``pairs``: a precomputed near-dup pair frame (the
    :func:`jena_spark.data.dedup.jaccard_pairs` output). Callers that
    already hold the pair graph (a dedup stage upstream in the same
    pipeline) pass it here so the inverted-index self-join — the
    dominant cost — runs once per corpus, not once per consumer; the
    caller owns parameter consistency (threshold/ngram/max_df are
    ignored when ``pairs`` is given)."""
    # docs feeds >=3 plan branches (flags select, the Jaccard token
    # index, the singleton id set) — persist it or its upstream plan
    # replays per consumer (CLAUDE.md union-replay rule)
    docs = docs.persist()
    extra_flags = []
    if max_pii is not None:
        from jena_spark.data import redact as RED

        total = None
        for _, c in RED.pii_counts(F.col("text")):
            total = c if total is None else total + c
        extra_flags.append((total <= max_pii).alias("pii_ok"))
    base = docs.select(
        "doc_id",
        F.col("lang").isin(*langs).alias("lang_ok"),
        (TX.quality_score_bp(F.col("text")) >= min_quality_bp).alias("q_ok"),
        F.sha2(F.col("text"), 256).alias("h"),
        *extra_flags,
    )
    reps = base.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
    carry = ["lang_ok", "q_ok"] + (["pii_ok"] if max_pii is not None else [])
    exact = base.join(reps, "h").select(
        "doc_id", *carry,
        (F.col("doc_id") == F.col("rep_id")).alias("exact_ok"),
    )
    if pairs is None:
        pairs = DD.jaccard_pairs(
            docs, threshold=jaccard_threshold, ngram=ngram, max_df=max_df)
    near = DD.dedup_clusters(pairs, docs=docs).select(
        "doc_id", F.col("keep").alias("near_ok"))
    v = exact.join(near, "doc_id")
    flags = [F.col("lang_ok"), F.col("q_ok")]
    reason = F.when(~F.col("lang_ok"), "lang").when(~F.col("q_ok"), "quality")
    if max_rep_frac is not None:
        # too-short docs have no repetition row -> pass (coalesce True)
        rep = TX.repetition_stats(docs, n=rep_ngram).select(
            "doc_id", (F.col("rep_frac") <= max_rep_frac).alias("rep_ok"))
        v = v.join(rep, "doc_id", "left").withColumn(
            "rep_ok", F.coalesce(F.col("rep_ok"), F.lit(True)))
        flags.append(F.col("rep_ok"))
        reason = reason.when(~F.col("rep_ok"), "repetition")
    if max_pii is not None:
        flags.append(F.col("pii_ok"))
        reason = reason.when(~F.col("pii_ok"), "pii")
    if nb_weights is not None:
        from jena_spark.data.classifier import nb_score

        clf = nb_score(docs, nb_weights, buckets=nb_buckets).select(
            "doc_id",
            (F.col("score_unats") >= min_nb_unats).alias("clf_ok"))
        v = v.join(clf, "doc_id")
        flags.append(F.col("clf_ok"))
        reason = reason.when(~F.col("clf_ok"), "classifier")
    if max_avg_logprob is not None:
        from jena_spark.data.lm import bigram_lm_scores

        ppl = bigram_lm_scores(docs, lm_docs).select(
            "doc_id",
            (F.col("avg_logprob") <= max_avg_logprob).alias("ppl_ok"))
        v = v.join(ppl, "doc_id", "left").withColumn(
            "ppl_ok", F.coalesce(F.col("ppl_ok"), F.lit(True)))
        flags.append(F.col("ppl_ok"))
        reason = reason.when(~F.col("ppl_ok"), "perplexity")
    flags += [F.col("exact_ok"), F.col("near_ok")]
    reason = reason.when(~F.col("exact_ok"), "exact_dup") \
                   .when(~F.col("near_ok"), "near_dup")
    kept = flags[0]
    for fl in flags[1:]:
        kept = kept & fl
    return v.select("doc_id", kept.alias("kept"), reason.alias("reason"))


def apply_curation(docs: DataFrame, verdicts: DataFrame) -> DataFrame:
    """The write-side: keep only curated docs (semi-join on the kept
    slice — broadcastable when the keep-rate is low, co-partitioned
    when both sides share a doc_id layout)."""
    kept = verdicts.where(F.col("kept")).select("doc_id")
    return docs.join(kept, "doc_id", "left_semi")
