"""Readability scoring for corpus curation.

Flesch Reading Ease (Flesch 1948) and Flesch-Kincaid Grade Level
(Kincaid et al. 1975) are the standard curriculum/difficulty signals a
pretraining mix uses to stratify documents (e.g. the "textbook
quality" and kids-corpus filters): both are linear in words-per-
sentence and syllables-per-word.

Determinism contract (the repo-wide integer recipe, see ``data/lm.py``):
NO floats anywhere. The published coefficients are cleared into
integer milli-units —

    fre_milli = 206835 - (1015 * W) div S - (84600 * Y) div W
    fkg_milli = (390 * W) div S + (11800 * Y) div W - 15590

with W = whitespace-token count, S = sentence count (``[.!?]+`` runs,
floored at 1 so headline-style fragments score rather than divide by
zero), Y = syllable proxy = vowel-group count (``[aeiouy]+`` runs over
the lowercased text — the classic approximation; all-consonant tokens
contribute 0, documented and mirrored exactly in the oracle). Floor
divisions over positive operands agree between Spark's ``div`` and
DuckDB's ``//``, so the frames hash-match bit-for-bit.

Scale design: map-only — three ``regexp_count``/``size(split())``
expressions inside whole-stage codegen, zero shuffle, zero Python.
The census rollup (:func:`readability_census`) adds one partial-agg
hash aggregation on a 13-bucket key.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENT_RE = "[.!?]+"
_SYL_RE = "[aeiouy]+"


def readability_scores(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """``(id_col, n_words, n_sentences, n_syllables, fre_milli,
    fkg_milli)`` — exact-integer Flesch Reading Ease and
    Flesch-Kincaid grade in milli-units, one row per document with at
    least one whitespace token (empty/whitespace-only docs have no
    defined word count and are dropped; documented convention shared
    with the LM/perplexity ops)."""
    t = F.col(text_col)
    d = (docs.where(F.length(F.trim(t)) > 0)
         .select(F.col(id_col),
                 F.size(F.split(F.trim(t), r"\s+")).cast("long")
                 .alias("n_words"),
                 F.greatest(F.lit(1).cast("long"),
                            F.regexp_count(t, F.lit(_SENT_RE)).cast("long"))
                 .alias("n_sentences"),
                 F.regexp_count(F.lower(t), F.lit(_SYL_RE)).cast("long")
                 .alias("n_syllables")))
    return d.select(
        id_col, "n_words", "n_sentences", "n_syllables",
        (F.lit(206835).cast("long")
         - F.expr("(1015 * n_words) div n_sentences")
         - F.expr("(84600 * n_syllables) div n_words"))
        .cast("long").alias("fre_milli"),
        (F.expr("(390 * n_words) div n_sentences")
         + F.expr("(11800 * n_syllables) div n_words")
         - F.lit(15590)).cast("long").alias("fkg_milli"))


def readability_census(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """``(grade_bucket, n_docs, n_words)`` — corpus histogram over
    FK grade buckets (grade = ``fkg_milli div 1000`` clamped to
    [0, 12]; 12 collects college+). The curriculum-mix report a
    difficulty-stratified sampler starts from."""
    s = readability_scores(docs, id_col=id_col, text_col=text_col)
    bucket = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(12).cast("long"), F.expr("fkg_milli div 1000")))
    return (s.groupBy(bucket.alias("grade_bucket"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words")))


def readability_sql(docs_cte: str = "SELECT doc_id, text FROM documents"
                    ) -> str:
    """DuckDB twin of :func:`readability_scores` — identical token /
    sentence / vowel-group regexes and the same integer milli-unit
    clearing, so the frame hash-matches."""
    return rf"""WITH src AS ({docs_cte}),
counts AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_words,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '{_SENT_RE}')) AS BIGINT))
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS BIGINT)
           AS n_syllables
  FROM src WHERE length(trim(text)) > 0)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835 - (1015 * n_words) // n_sentences
            - (84600 * n_syllables) // n_words AS BIGINT) AS fre_milli,
       CAST((390 * n_words) // n_sentences
            + (11800 * n_syllables) // n_words - 15590 AS BIGINT) AS fkg_milli
FROM counts"""


def readability_census_sql(docs_cte: str =
                           "SELECT doc_id, text FROM documents") -> str:
    """DuckDB twin of :func:`readability_census`."""
    return f"""WITH scores AS ({readability_sql(docs_cte)})
SELECT greatest(CAST(0 AS BIGINT),
                least(CAST(12 AS BIGINT), fkg_milli // 1000)) AS grade_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words
FROM scores GROUP BY 1"""
