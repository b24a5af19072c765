"""Refusal / boilerplate census over assistant turns.

The standard SFT-corpus cleaning pass (the ShareGPT/Alpaca/WizardLM
"uncensoring" scripts, and every serious instruction-tuning report
since): conversations whose assistant turns are canned refusals or
AI-self-reference boilerplate ("as an AI language model...", "I'm
sorry, but I cannot...") teach the model to refuse and to
self-describe instead of to answer — they are dropped or downweighted
before training. :func:`refusal_census` measures exactly that signal:
a per-conversation count and basis-point fraction of assistant turns
matching a fixed refusal-pattern battery, plus an integer keep
verdict.

Pattern discipline follows :mod:`jena_spark.data.redact`: every
pattern is written in the RE2-compatible subset (no backreferences, no
lookaround), on which Spark's Java regex and DuckDB's RE2 agree — so
the DuckDB oracle evaluates the IDENTICAL expressions and the output
hash-matches bit-for-bit. Matching is over ``lower(text)``; patterns
are all-lowercase.

Scale shape: one combined-alternation ``rlike`` per turn (map-only,
whole-stage codegen — never one pass per pattern) followed by a single
per-conversation conditional-count aggregation on the conv_id
partitioning the transcripts derivation already pays. No joins, no
second shuffle; verdict arithmetic is exact integers.

No reference-twin: Jena has no corpus operators — this extends the
LLM-data-pipeline surface (SURVEY.md "beyond the reference" mandate)
alongside the other transcript ops (conv dedup, preference pairs,
trajectory gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: RE2-safe refusal/boilerplate battery (matched against lower(text)).
#: Kept deliberately short and high-precision: a census pass that
#: misfires on ordinary prose ("i cannot wait") poisons the keep
#: verdict corpus-wide. Each entry must stay in the RE2 subset —
#: mirrored verbatim into the DuckDB oracle.
REFUSAL_PATTERNS: tuple[str, ...] = (
    r"\bas an ai( language model)?\b",
    r"\bi (cannot|can't|won't|will not) (help|assist|comply|provide|answer|engage)\b",
    r"\bi'?m sorry,? but i\b",
    r"\bi am (unable|not able) to (help|assist|comply|provide|answer)\b",
    r"\b(against|violates?) (my|our) (guidelines|policies|policy|programming)\b",
    r"\bi do not feel comfortable\b",
)


def refusal_regex(patterns: tuple[str, ...] = REFUSAL_PATTERNS) -> str:
    """One combined alternation — a single regex evaluation per turn."""
    return "|".join(f"(?:{p})" for p in patterns)


def refusal_census(turns: DataFrame, max_refusals: int = 0,
                   conv_id: str = "conv_id", role_col: str = "role",
                   text: str = "text",
                   assistant_role: str = "assistant",
                   patterns: tuple[str, ...] = REFUSAL_PATTERNS,
                   ) -> DataFrame:
    """Per-conversation refusal census: ``(conv_id, n_assistant_turns,
    n_refusals, refusal_bp, keep)``.

    ``n_refusals`` counts assistant turns matching any battery
    pattern; ``refusal_bp`` is the floored basis-point share of
    assistant turns that are refusals (0 when the conversation has no
    assistant turns); ``keep = 1`` iff ``n_refusals <= max_refusals``
    (default 0 — the drop-on-any-refusal rule of the published
    cleaning scripts; raise it to tolerate occasional legitimate
    refusals in long agent sessions).

    One aggregation over the conversation key — conversations with
    zero assistant turns still get a row (keep = 1: no evidence is
    not a drop reason).
    """
    is_assistant = (F.col(role_col) == assistant_role).cast("long")
    is_refusal = (
        (F.col(role_col) == assistant_role)
        & F.lower(F.col(text)).rlike(refusal_regex(patterns))
    ).cast("long")
    return (turns.groupBy(F.col(conv_id).alias("conv_id"))
            .agg(F.sum(is_assistant).alias("n_assistant_turns"),
                 F.sum(is_refusal).alias("n_refusals"))
            .select(
                "conv_id", "n_assistant_turns", "n_refusals",
                F.when(F.col("n_assistant_turns") > 0,
                       F.expr("n_refusals * 10000 div n_assistant_turns"))
                .otherwise(F.lit(0)).cast("long").alias("refusal_bp"),
                (F.col("n_refusals") <= F.lit(int(max_refusals)))
                .cast("int").alias("keep")))


def refusal_census_sql(transcripts_cte: str, max_refusals: int = 0,
                       assistant_role: str = "assistant",
                       patterns: tuple[str, ...] = REFUSAL_PATTERNS,
                       ) -> str:
    """DuckDB twin of :func:`refusal_census` over a transcripts CTE —
    the identical combined regex via ``regexp_matches``."""
    rx = refusal_regex(patterns).replace("'", "''")
    return f"""WITH transcripts AS ({transcripts_cte}),
c AS (
  SELECT conv_id,
         CASE WHEN role = '{assistant_role}' THEN 1 ELSE 0 END AS a,
         CASE WHEN role = '{assistant_role}'
                AND regexp_matches(lower(text), '{rx}')
              THEN 1 ELSE 0 END AS r
  FROM transcripts)
SELECT conv_id,
       CAST(sum(a) AS BIGINT) AS n_assistant_turns,
       CAST(sum(r) AS BIGINT) AS n_refusals,
       CAST(CASE WHEN sum(a) > 0 THEN sum(r) * 10000 // sum(a)
                 ELSE 0 END AS BIGINT) AS refusal_bp,
       CAST(sum(r) <= {int(max_refusals)} AS INT) AS keep
FROM c GROUP BY conv_id"""
