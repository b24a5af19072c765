"""Lexical diversity census — distinct-n ratios per corpus slice.

Distinct-1/2/3 (Li et al. 2016, the generation-diversity metric):
the share of n-gram OCCURRENCES that are distinct types, per corpus
slice (source, language, model run, …). Low distinct-n on generated
or scraped text flags mode collapse / boilerplate floods — the
corpus-level counterpart of the per-document repetition battery in
``data/filters.py``.

Integer recipe: ``distinct_n_ppm = floor(10^6 * types / occurrences)``
per (slice, n); slices with fewer than ``n`` tokens in every document
report 0 occurrences and a NULL ratio.

Distributed shape: one token explode + lead-window gram derivation
(the ``data/wimbd.py`` posture) feeding two partial-agg counts —
occurrences and distinct types — shuffled on (slice, n, gram) once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(col):
    return F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != "")


def distinct_ngrams(docs: DataFrame, ns: tuple[int, ...] = (1, 2, 3),
                    slice_col: str = "source",
                    text: str = "text") -> DataFrame:
    """``(slice, n, n_occurrences, n_types, distinct_ppm)`` — one row
    per slice value and gram size."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be positive, got {ns}")
    base = docs.select(F.col(slice_col).alias("_slice"),
                       _words(F.col(text)).alias("_w"))
    out = None
    for n in ns:
        grams = F.filter(
            F.transform(
                F.col("_w"),
                lambda _, i: F.when(
                    i + n <= F.size("_w"),
                    F.array_join(F.slice("_w", i + 1, n), " "))),
            lambda g: g.isNotNull())
        g = (base.select("_slice", F.explode_outer(grams).alias("_g"))
             .groupBy("_slice")
             .agg(F.count("_g").cast("long").alias("n_occurrences"),
                  F.count_distinct("_g").cast("long").alias("n_types"))
             .select(F.col("_slice"), F.lit(n).alias("n"),
                     "n_occurrences", "n_types"))
        out = g if out is None else out.unionByName(g)
    return out.select(
        F.col("_slice").alias("slice"), F.col("n").cast("int"),
        "n_occurrences", "n_types",
        F.expr("case when n_occurrences = 0 then null else"
               " (1000000 * n_types) div n_occurrences end")
        .cast("long").alias("distinct_ppm"))


def distinct_ngrams_sql(docs_cte: str, ns: tuple[int, ...] = (1, 2, 3),
                        slice_col: str = "source",
                        text: str = "text") -> str:
    """DuckDB twin of :func:`distinct_ngrams` (same tokenization,
    LATERAL gram enumeration)."""
    parts = []
    for n in ns:
        parts.append(f"""SELECT sl AS slice, {n} AS n,
       CAST(count(g) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT g) AS BIGINT) AS n_types
FROM (
  SELECT sl,
         CASE WHEN i + {n} - 1 <= len(w)
              THEN array_to_string(w[i:i+{n}-1], ' ') END AS g
  FROM (SELECT {slice_col} AS sl,
               list_filter(regexp_split_to_array(lower({text}),
                           '\\W+'), x -> x != '') AS w
        FROM ({docs_cte})) t
  LEFT JOIN LATERAL (SELECT unnest(generate_series(1,
       greatest(len(w), 1))) AS i) s ON TRUE)
GROUP BY sl""")
    unions = "\nUNION ALL\n".join(parts)
    return f"""SELECT CAST(slice AS VARCHAR) AS slice, CAST(n AS INT) AS n,
       n_occurrences, n_types,
       CASE WHEN n_occurrences = 0 THEN NULL
            ELSE (1000000 * n_types) // n_occurrences END AS distinct_ppm
FROM ({unions})"""
