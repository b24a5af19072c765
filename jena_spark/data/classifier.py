"""Quality classifier — hashed n-gram Naive Bayes, trained and applied
distributed.

The "linear quality filter" stage of the published pretraining recipes
(GPT-3 appendix A trains a logistic classifier on WebText-vs-Common-
Crawl; CCNet and LLaMA use fastText models the same way): learn a
cheap linear scorer from a labeled seed set, then score the whole
corpus map-only and keep documents above a threshold. This module is
the multinomial-Naive-Bayes member of that family — NB's closed-form
fit makes training ONE counting aggregate (deterministic, no SGD
ordering effects), and its decision function is the same
"sum of per-feature log-odds" dot product fastText evaluates.

Relationship to :func:`jena_spark.data.selection.importance_weights`
(DSIR): both score documents by Σ count_b · log-ratio_b over hashed
n-gram buckets, but DSIR contrasts two CORPUS distributions (target
vs raw) for resampling, while this trains on per-document LABELS and
emits a calibrated classification (log-odds including the class
prior, plus the argmax prediction). The shared shuffle shape is
deliberate — it is the one that scales.

Scale design (100 TB corpus, bounded seed set):

* Training is one ``groupBy(bucket, label).count()`` over the labeled
  docs' exploded grams — partial-aggregatable, output ≤ 2·B rows.
* The weight table is densified to ALL ``B`` buckets (``spark.range``
  left-join) so unseen-bucket smoothing is a plain inner join at
  scoring time — no per-row conditional path.
* Scoring is the DSIR/decontaminate posture: corpus explodes to
  (doc, bucket) within the map side, joins the BROADCAST B-row weight
  dim, and the only shuffle is the per-doc integer sum (map-side
  combine). The corpus text itself never shuffles.
* Log-odds are quantized to integer 1e-4 nats BEFORE the per-doc sum
  (exact integer arithmetic — float summation order can never perturb
  the score or flip a prediction; the repo-wide determinism
  invariant), and gram→bucket hashing is md5-prefix modulo so the
  DuckDB oracle evaluates the IDENTICAL buckets.

No reference twin: Jena has no corpus operators — this extends the
LLM-data-pipeline surface (SURVEY.md "beyond the reference" mandate)
alongside dedup/curation/selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jena_spark.data.decontaminate import _words
from jena_spark.data.selection import _hash32

__all__ = ["nb_train", "nb_score", "nb_quality_scores"]


def _bucket_rows(df: DataFrame, keep_cols: list[str], text: str, n: int,
                 buckets: int) -> DataFrame:
    """(*keep_cols, bucket) — one row per n-gram occurrence, entirely
    map-only (gram built, hashed, and bucketed inside the explode
    projection; the text column never survives it). Empty documents
    produce one "" unigram under the shared normalizer — dropped, so
    they contribute nothing."""
    w = _words(F.col(text))
    d = df.select(*keep_cols, w.alias("_w")).where(F.size("_w") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_w") - F.lit(n)),
        lambda i: F.array_join(F.slice("_w", i + F.lit(1), n), " "))
    return (d.select(*keep_cols, F.explode(grams).alias("_g"))
             .where(F.col("_g") != "")
             .select(*keep_cols,
                     (_hash32(F.col("_g")) % buckets).alias("bucket")))


def nb_train(labeled: DataFrame, *, doc_id: str = "doc_id",
             text: str = "text", label: str = "label",
             n: int = 1, buckets: int = 4096) -> DataFrame:
    """Fit multinomial NB on ``labeled`` (``label`` ∈ {0, 1}; both
    classes must be non-empty) → a dense ``buckets + 1``-row weight
    frame: one row per bucket with ``w_unats`` = add-one-smoothed
    log-odds ``ln((pc+1)/(P+B)) − ln((nc+1)/(N+B))`` in integer 1e-4
    nats, plus a ``bucket = -1`` row carrying the document-count class
    prior ``ln(Pd/Nd)``. Entirely lazy — no driver-side action."""
    lab = labeled.select(F.col(text).alias("_t"),
                         F.col(label).cast("int").alias("_y"))
    # label rides the explode — no gram-to-label join, the counting
    # aggregate is the first (and only) shuffle of the training pass
    cnts = (_bucket_rows(lab, ["_y"], "_t", n, buckets)
            .groupBy("bucket")
            .agg(F.sum("_y").alias("pc"),
                 F.sum(1 - F.col("_y")).alias("nc")))
    spark = SparkSession.getActiveSession()
    dense = (spark.range(buckets).select(F.col("id").alias("bucket"))
                  .join(cnts, "bucket", "left")
                  .select("bucket",
                          F.coalesce("pc", F.lit(0)).alias("pc"),
                          F.coalesce("nc", F.lit(0)).alias("nc")))
    totals = dense.agg(F.sum("pc").alias("P"), F.sum("nc").alias("N"))
    w = (dense.crossJoin(F.broadcast(totals))
              .select("bucket",
                      F.floor((F.log((F.col("pc") + 1).cast("double")
                                     / (F.col("P") + buckets))
                               - F.log((F.col("nc") + 1).cast("double")
                                       / (F.col("N") + buckets))) * 1e4
                              + F.lit(0.5)).cast("bigint").alias("w_unats")))
    prior = (labeled.select(F.col(label).cast("int").alias("_y"))
                .agg(F.sum("_y").alias("pd"),
                     F.sum(1 - F.col("_y")).alias("nd"))
                .select(F.lit(-1).cast("bigint").alias("bucket"),
                        F.floor((F.log(F.col("pd").cast("double"))
                                 - F.log(F.col("nd").cast("double"))) * 1e4
                                + F.lit(0.5)).cast("bigint")
                        .alias("w_unats")))
    return w.unionByName(prior)


def nb_score(docs: DataFrame, weights: DataFrame, *,
             doc_id: str = "doc_id", text: str = "text",
             n: int = 1, buckets: int = 4096) -> DataFrame:
    """Score every document with a trained weight frame →
    ``(doc_id, score_unats, pred)``: ``score_unats`` = prior +
    Σ count_b · w_unats(b) (integer 1e-4 nats of log-odds),
    ``pred`` = 1 iff score > 0. Documents with no n-grams score the
    bare prior. The weight dim is broadcast; the corpus never
    shuffles text."""
    wb = weights.where(F.col("bucket") >= 0)
    # raw occurrence rows join the broadcast dim directly; the per-doc
    # sum is the only shuffle, collapsed map-side to one row per doc
    # per partition. LEFT join + raise_error: the weight frame is
    # dense over the TRAINING bucket count, so a scored bucket with no
    # weight row means ``buckets`` here exceeds the training value —
    # error loudly instead of silently dropping grams. (The opposite
    # mismatch — scoring with fewer buckets — is undetectable from the
    # join; callers own passing the training value.)
    sums = (_bucket_rows(docs, [doc_id], text, n, buckets)
            .join(F.broadcast(wb), "bucket", "left")
            .groupBy(doc_id)
            .agg(F.sum(F.coalesce(
                "w_unats",
                F.raise_error(F.lit(
                    "nb_score: gram bucket outside the weight frame — "
                    "`buckets` must equal the nb_train value"))))
                 .alias("_s")))
    prior = weights.where(F.col("bucket") == -1) \
                   .select(F.col("w_unats").alias("_prior"))
    return (docs.select(doc_id)
                .join(sums, doc_id, "left")
                .crossJoin(F.broadcast(prior))
                .select(doc_id,
                        (F.coalesce("_s", F.lit(0)) + F.col("_prior"))
                        .cast("bigint").alias("score_unats"))
                .withColumn("pred",
                            (F.col("score_unats") > 0).cast("int")))


def nb_quality_scores(docs: DataFrame, labeled: DataFrame, *,
                      doc_id: str = "doc_id", text: str = "text",
                      label: str = "label", n: int = 1,
                      buckets: int = 4096) -> DataFrame:
    """Train on ``labeled`` and score ``docs`` in one lazy plan —
    the end-to-end quality-filter stage."""
    w = nb_train(labeled, doc_id=doc_id, text=text, label=label,
                 n=n, buckets=buckets)
    return nb_score(docs, w, doc_id=doc_id, text=text, n=n,
                    buckets=buckets)
