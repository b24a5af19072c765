"""Corpus release manifest — the per-source datasheet rollup.

Every corpus release ships a datasheet ("Datasheets for Datasets",
Gebru et al. 2021): per source, how many documents and tokens, the
language mix, how much internal duplication, what share passes the
quality bar. The numbers exist piecemeal across the repo's operators;
this op composes them into the ONE frame a release note quotes —
the document-corpus twin of ``data/release.py``'s per-conversation
gate table.

Columns (all exact integers / ppm):

* ``n_docs``, ``n_tokens`` (whitespace contract), ``mean_doc_tokens``
  (floor),
* ``en_ppm`` — share of documents with ``lang = 'en'``,
* ``dup_doc_ppm`` — share of documents whose exact ``md5(text)``
  content hash collides with another document of the SAME source
  (the within-slice duplication rate; cross-source twins are
  deduplication policy, not slice hygiene),
* ``gopher_pass_ppm`` — share passing the Gopher A1.1 battery
  (``data/filters.py::gopher_rules`` conjunctive verdict).

Distributed shape: one map-side projection feeding a per-source
partial agg, one (source, hash) census for the dup rate, one
broadcast-back of the rule verdicts — three shuffles on (source) /
(source, hash) keys, never a driver loop. The DuckDB twin composes
the registered Gopher oracle verbatim, so the two batteries cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 10**6


def corpus_manifest(docs: DataFrame, source: str = "source",
                    text: str = "text", lang: str = "lang",
                    id_col: str = "doc_id", min_words: int = 50,
                    min_required_stops: int = 1) -> DataFrame:
    """``(source, n_docs, n_tokens, mean_doc_tokens, en_ppm,
    dup_doc_ppm, gopher_pass_ppm)`` — one row per source."""
    from jena_spark.data.filters import gopher_rules

    tok = F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("bigint")
    base = docs.select(id_col, source, lang,
                       tok.alias("_tok"), F.md5(F.col(text)).alias("_h"))
    dup = (base.groupBy(source, "_h")
           .agg(F.count("*").alias("_hc"))
           .withColumn("_dup", (F.col("_hc") > 1).cast("bigint")))
    based = (base.join(dup.select(source, "_h", "_dup"),
                       [source, "_h"]))
    gr = gopher_rules(docs, min_words=min_words,
                      min_required_stops=min_required_stops) \
        .select(id_col, F.col("gopher_ok").cast("bigint").alias("_ok"))
    j = based.join(gr, id_col)
    agg = j.groupBy(source).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.sum((F.col(lang) == "en").cast("bigint")).alias("_en"),
        F.sum("_dup").alias("_dups"),
        F.sum("_ok").alias("_oks"))
    return agg.select(
        source, "n_docs", "n_tokens",
        F.expr("n_tokens div n_docs").alias("mean_doc_tokens"),
        F.expr(f"({PPM} * _en) div n_docs").cast("long").alias("en_ppm"),
        F.expr(f"({PPM} * _dups) div n_docs").cast("long")
         .alias("dup_doc_ppm"),
        F.expr(f"({PPM} * _oks) div n_docs").cast("long")
         .alias("gopher_pass_ppm"))


def corpus_manifest_sql(gopher_oracle_sql: str, source: str = "source",
                        text: str = "text", lang: str = "lang",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`corpus_manifest` over the ``documents``
    view. ``gopher_oracle_sql`` is the REGISTERED Gopher oracle query
    (must yield ``(doc_id, ..., gopher_ok)``) — composed verbatim so
    the rule battery cannot drift from the Spark side."""
    return f"""WITH g AS ({gopher_oracle_sql}),
base AS (
  SELECT {id_col}, {source} AS src, {lang} AS lg,
         CAST(len(regexp_split_to_array(trim({text}), '\\s+'))
              AS BIGINT) AS tok,
         md5({text}) AS h
  FROM documents),
dup AS (
  SELECT src, h, CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS dup
  FROM base GROUP BY src, h),
j AS (
  SELECT b.*, dup.dup, CAST(g.gopher_ok AS BIGINT) AS ok
  FROM base b
  JOIN dup ON b.src = dup.src AND b.h = dup.h
  JOIN g ON b.{id_col} = g.{id_col}),
agg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN lg = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS en,
         CAST(sum(dup) AS BIGINT) AS dups,
         CAST(sum(ok) AS BIGINT) AS oks
  FROM j GROUP BY src)
SELECT src AS {source}, n_docs, n_tokens,
       n_tokens // n_docs AS mean_doc_tokens,
       ({PPM} * en) // n_docs AS en_ppm,
       ({PPM} * dups) // n_docs AS dup_doc_ppm,
       ({PPM} * oks) // n_docs AS gopher_pass_ppm
FROM agg"""
