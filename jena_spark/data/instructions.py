"""Instruction-diversity census over transcript user turns.

Self-Instruct (Wang et al. 2023, Fig. 2) characterizes an
instruction-tuning corpus by the distribution of instruction-opening
verbs — a skewed census ("write…", "write…", "write…") predicts a
model that only learned one task family, and the census drives the
generation/selection loop toward under-represented verbs. This module
computes the distributed form of that report plus the per-instruction
constraint flags (explicit output-format and quantity requirements)
that instruction-complexity stratification uses (e.g. Tulu / #InsTag
style splits).

Proxy contract (documented, deterministic, engine-identical): the
"verb" is the FIRST normalized token of the user turn (lowercase,
non-alphanumeric runs collapsed to single spaces) — no POS tagger in
the sandbox, and the imperative opening token IS the verb for the
overwhelming majority of instruction data. ``format_req`` fires on a
fixed keyword alternation (json/table/list/bullet/markdown/csv/yaml/
xml), ``quantity_req`` on any standalone integer. Shares are exact
integer ppm (micro-fractions, floor division).

Scale design: map-only extraction inside whole-stage codegen, one
hash aggregation on the verb key (partial agg collapses each verb
map-side — a 10^8-instruction corpus with 10^3 distinct verbs
shuffles ~10^3 rows per partition), one broadcast 1-row totals frame.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMAT_RE = r"\b(json|table|list|bullet|markdown|csv|yaml|xml)\b"
_QUANTITY_RE = r"\b[0-9]+\b"


def _norm_first_token(text):
    norm = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.element_at(F.split(norm, " "), 1)


def instruction_flags(turns: DataFrame, role: str = "role",
                      text: str = "text") -> DataFrame:
    """Per-instruction rows: user turns annotated with ``verb`` (first
    normalized token), ``n_words``, ``format_req``, ``quantity_req``.
    User turns that normalize to nothing (pure punctuation) are
    dropped — they carry no instruction. All other columns pass
    through."""
    t = F.col(text)
    return (turns.where(F.col(role) == "user")
            .withColumn("verb", _norm_first_token(t))
            .where(F.col("verb").isNotNull() & (F.col("verb") != ""))
            .withColumn("n_words",
                        F.size(F.split(F.trim(t), r"\s+")).cast("long"))
            .withColumn("format_req",
                        (F.regexp_count(F.lower(t), F.lit(_FORMAT_RE)) > 0)
                        .cast("int"))
            .withColumn("quantity_req",
                        (F.regexp_count(t, F.lit(_QUANTITY_RE)) > 0)
                        .cast("int")))


def instruction_census(turns: DataFrame, role: str = "role",
                       text: str = "text") -> DataFrame:
    """``(verb, n_instr, n_format_req, n_quantity_req, share_ppm)`` —
    the Self-Instruct verb-distribution report. ``share_ppm`` is the
    verb's exact-integer parts-per-million share of all counted
    instructions."""
    flags = instruction_flags(turns, role=role, text=text)
    census = (flags.groupBy("verb")
              .agg(F.count("*").cast("long").alias("n_instr"),
                   F.sum("format_req").cast("long").alias("n_format_req"),
                   F.sum("quantity_req").cast("long")
                   .alias("n_quantity_req")))
    total = census.agg(F.sum("n_instr").cast("long").alias("_total"))
    return (census.crossJoin(F.broadcast(total))
            .select("verb", "n_instr", "n_format_req", "n_quantity_req",
                    F.expr("(n_instr * 1000000) div _total")
                    .cast("long").alias("share_ppm")))


def instruction_census_sql(turns_cte: str) -> str:
    """DuckDB twin of :func:`instruction_census` over a CTE yielding
    at least ``(role, text)`` — identical normalization, flag regexes
    and ppm clearing, so the frame hash-matches."""
    first = ("list_extract(string_split(trim(regexp_replace(lower(text), "
             "'[^a-z0-9]+', ' ', 'g')), ' '), 1)")
    return rf"""WITH transcripts AS ({turns_cte}),
flags AS (
  SELECT {first} AS verb,
         CASE WHEN len(regexp_extract_all(lower(text),
                       '{_FORMAT_RE}')) > 0 THEN 1 ELSE 0 END AS format_req,
         CASE WHEN len(regexp_extract_all(text,
                       '{_QUANTITY_RE}')) > 0 THEN 1 ELSE 0 END
           AS quantity_req
  FROM transcripts WHERE role = 'user'),
kept AS (SELECT * FROM flags WHERE verb IS NOT NULL AND verb <> ''),
census AS (
  SELECT verb, CAST(count(*) AS BIGINT) AS n_instr,
         CAST(sum(format_req) AS BIGINT) AS n_format_req,
         CAST(sum(quantity_req) AS BIGINT) AS n_quantity_req
  FROM kept GROUP BY verb),
total AS (SELECT CAST(sum(n_instr) AS BIGINT) AS t FROM census)
SELECT verb, n_instr, n_format_req, n_quantity_req,
       CAST((n_instr * 1000000) // t AS BIGINT) AS share_ppm
FROM census, total"""
