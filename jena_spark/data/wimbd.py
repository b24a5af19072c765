"""WIMBD-style corpus analytics — "what's in my big data?" censuses.

The published recipe (Elazar et al. 2023, "What's In My Big Data?",
public method) runs a small battery of whole-corpus counts that every
pretraining-data audit starts with: the most-common word n-grams, the
share of n-gram OCCURRENCES that are duplicated corpus-wide (the
memorization-pressure proxy), and per-domain document/token tallies.
Each is a single hash aggregation over the same ``(doc, gram)``
explode the decontamination pass already uses — at 100 TB these are
the canonical "one wide shuffle, partial-aggregated map-side" jobs,
and top-k is a ``TakeOrderedAndProject`` (no global sort).

No reference-twin: Jena has no corpus operator family — this extends
the repo's LLM-data-pipeline surface (SURVEY.md "beyond the
reference" mandate) alongside dedup/decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.decontaminate import _raw_ngrams


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20,
               doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """Top-``k`` normalized word ``n``-grams by corpus-wide occurrence
    count (positional occurrences, not per-doc distinct — WIMBD counts
    every occurrence). Deterministic tie-break: count desc, gram asc.

    Returns ``(gram, n_occ)``; the plan is one partial-aggregated
    count shuffle + TakeOrderedAndProject — no global sort, no
    driver-side data.
    """
    g = _raw_ngrams(docs, doc_id, text, n)
    return (g.groupBy("gram")
             .agg(F.count("*").cast("bigint").alias("n_occ"))
             .orderBy(F.desc("n_occ"), F.asc("gram"))
             .limit(k))


def duplicate_ngram_stats(docs: DataFrame, n: int = 10,
                          doc_id: str = "doc_id",
                          text: str = "text") -> DataFrame:
    """WIMBD's duplicate-n-gram census: of all n-gram OCCURRENCES in
    the corpus, how many belong to a gram that occurs more than once?
    (High duplicate share at n=10+ predicts memorization and inflates
    perplexity evals — the reason the audit exists.)

    Returns ONE row ``(n_grams, n_distinct, n_dup_occ, dup_pm)`` —
    total occurrences, distinct grams, occurrences of duplicated
    grams, and the duplicated share in integer parts-per-million
    (``n_dup_occ * 1e6 DIV n_grams`` — engine-exact, no float).

    Scale: one (gram → count) hash aggregation followed by a second
    aggregation over its D-row output; both partial-aggregate
    map-side. The gram strings never leave the first shuffle.
    """
    counts = (_raw_ngrams(docs, doc_id, text, n)
              .groupBy("gram").agg(F.count("*").alias("c")))
    return counts.agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
         .cast("bigint").alias("n_dup_occ"),
        F.expr("sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000"
               " DIV sum(c)").cast("bigint").alias("dup_pm"))


def domain_summary(docs: DataFrame, source: str = "source",
                   text: str = "text") -> DataFrame:
    """Per-domain corpus census: document count, whitespace-token
    count, character count, and each domain's doc share in integer
    parts-per-million. One aggregation + a broadcast 1-row total —
    the WIMBD "where does my data come from" table.

    Returns ``(source, n_docs, n_tokens, n_chars, doc_pm)``.
    """
    toks = F.size(F.split(F.trim(F.col(text)), "\\s+"))
    dom = (docs.groupBy(source)
           .agg(F.count("*").cast("bigint").alias("n_docs"),
                F.sum(toks).cast("bigint").alias("n_tokens"),
                F.sum(F.length(text)).cast("bigint").alias("n_chars")))
    tot = dom.agg(F.sum("n_docs").alias("_t"))
    return (dom.crossJoin(F.broadcast(tot))
            .select(source, "n_docs", "n_tokens", "n_chars",
                    F.expr("n_docs * 1000000 DIV _t").cast("bigint")
                    .alias("doc_pm")))


#: DuckDB twin of :func:`jena_spark.data.decontaminate._words` — the
#: same normalize-lowercase-split recipe, for oracle CTEs.
WORDS_SQL = ("string_split(trim(regexp_replace(lower({col}),"
             " '[^a-z0-9]+', ' ', 'g')), ' ')")


def ngram_cte(n: int, table: str = "documents", id_col: str = "doc_id",
              text: str = "text") -> str:
    """DuckDB CTE body producing the identical positional ``(id,
    gram)`` rows as :func:`_raw_ngrams` (docs shorter than ``n`` words
    emit nothing)."""
    w = WORDS_SQL.format(col=text)
    return f"""
  SELECT {id_col}, array_to_string(w[i : i + {n} - 1], ' ') AS gram
  FROM (
    SELECT {id_col}, w, unnest(generate_series(1, len(w) - {n} + 1)) AS i
    FROM (SELECT {id_col}, {w} AS w FROM {table})
    WHERE len(w) >= {n})
"""
