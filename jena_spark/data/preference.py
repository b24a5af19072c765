"""Preference-pair construction (RLHF / DPO data prep) from transcripts.

A preference corpus is built from conversation logs by grouping
assistant responses that answer the SAME user prompt and pairing the
best-scoring response (``chosen``) with the worst (``rejected``) —
the standard construction behind DPO / RLHF reward-model training
sets (Ouyang et al. 2022; Rafailov et al. 2023 use exactly
(prompt, chosen, rejected) rows).

Semantics here, kept deliberately oracle-exact:

* a *candidate* is an assistant turn whose immediately preceding turn
  in the same conversation is a user turn (the prompt);
* the prompt key is ``md5(prompt_text)`` — identical prompts across
  conversations group together, which is precisely where preference
  pairs come from in replayed / A-B-tested agent traffic;
* each response is scored by lexical diversity in integer basis
  points: ``(10000 * n_distinct_tokens) div n_tokens`` — a
  deterministic quality proxy with an exact DuckDB twin (integer
  division on both sides; no float round-trip). Real deployments swap
  in a reward model here; the pairing machinery is the operator;
* ``chosen``  = struct-max of ``(score_bp, fp, text)``,
  ``rejected`` = struct-min — partial-aggregatable min/max, never a
  hot-key window (the same election pattern as
  ``paragraph.dedup_segments``); ties on score break by response
  fingerprint so the pair is deterministic;
* groups whose best and worst response are the same text, or whose
  score margin is below ``min_margin_bp``, emit nothing (a pair with
  no signal is noise in a DPO set).

Distributed shape at 100 TB: one ``lag`` window per conversation (the
conv_id shuffle the transcripts derivation already pays) then ONE
hash aggregation keyed by 16-byte prompt fingerprints. A viral prompt
answered 10^6 times collapses map-side for the min/max structs;
``count(distinct fp)`` is the only two-phase piece and it shuffles
(prompt_fp, fp) pairs only — never response bodies.

Reference frame: Jena has no preference op (this is the
training-data-pipeline extension the build mandates); the grouping /
election discipline mirrors ``data/paragraph.py``'s keep-first
min-struct aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def preference_pairs(turns: DataFrame, min_margin_bp: int = 1,
                     conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                     role: str = "role", text: str = "text",
                     user_role: str = "user",
                     assistant_role: str = "assistant") -> DataFrame:
    """(prompt_fp, prompt, chosen, rejected, chosen_bp, rejected_bp,
    margin_bp, n_responses) — one row per prompt with a usable pair.

    ``n_responses`` counts DISTINCT candidate responses for the
    prompt (by md5), so downstream mixing can weight well-covered
    prompts differently from barely-covered ones.
    """
    if min_margin_bp < 0:
        raise ValueError(
            f"min_margin_bp must be >= 0, got {min_margin_bp}")
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    cand = (turns
            .withColumn("_prev_role", F.lag(role).over(w))
            .withColumn("_prev_text", F.lag(text).over(w))
            .where((F.col(role) == assistant_role)
                   & (F.col("_prev_role") == user_role)))
    toks = F.filter(F.split(F.trim(F.col(text)), r"\s+"),
                    lambda t: t != "")
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    # bigint/bigint is DOUBLE in Spark; subtracting the remainder
    # first makes the quotient an exact small integer (<= 10000), so
    # the double round-trip is lossless and matches DuckDB's `//`.
    score = F.when(n > F.lit(0),
                   (F.lit(10000) * nd - (F.lit(10000) * nd) % n) / n
                   ).otherwise(F.lit(0)).cast("bigint")
    cand = cand.select(
        F.md5(F.col("_prev_text")).alias("prompt_fp"),
        F.col("_prev_text").alias("_prompt"),
        F.struct(score.alias("s"),
                 F.md5(F.col(text)).alias("fp"),
                 F.col(text).alias("x")).alias("_c"))
    g = (cand.groupBy("prompt_fp")
         .agg(F.max("_prompt").alias("prompt"),
              F.max("_c").alias("_best"),
              F.min("_c").alias("_worst"),
              F.count_distinct(F.col("_c")["fp"]).alias("n_responses")))
    return (g.where((F.col("_best")["fp"] != F.col("_worst")["fp"])
                    & (F.col("_best")["s"] - F.col("_worst")["s"]
                       >= F.lit(int(min_margin_bp))))
            .select(
                "prompt_fp", "prompt",
                F.col("_best")["x"].alias("chosen"),
                F.col("_worst")["x"].alias("rejected"),
                F.col("_best")["s"].alias("chosen_bp"),
                F.col("_worst")["s"].alias("rejected_bp"),
                (F.col("_best")["s"] - F.col("_worst")["s"])
                .alias("margin_bp"),
                "n_responses"))


def preference_pairs_sql(transcripts_cte: str,
                         min_margin_bp: int = 1) -> str:
    """DuckDB twin of :func:`preference_pairs` over a transcripts CTE
    body (different plan — windows instead of struct min/max — same
    rows, hash-matched)."""
    return f"""
WITH transcripts AS ({transcripts_cte}),
lagged AS (
  SELECT role, text,
         lag(role) OVER w AS prev_role,
         lag(text) OVER w AS prev_text
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
cand AS (
  SELECT md5(prev_text) AS prompt_fp, prev_text AS prompt,
         text, md5(text) AS fp,
         CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   t -> t <> '')) > 0
              THEN (10000 * len(list_distinct(list_filter(
                       regexp_split_to_array(trim(text), '\\s+'),
                       t -> t <> ''))))
                   // len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          t -> t <> ''))
              ELSE 0 END AS score_bp
  FROM lagged
  WHERE role = 'assistant' AND prev_role = 'user'
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_fp
                            ORDER BY score_bp DESC, fp DESC, text DESC) AS rb,
         row_number() OVER (PARTITION BY prompt_fp
                            ORDER BY score_bp ASC, fp ASC, text ASC) AS rw
  FROM cand
),
nr AS (
  SELECT prompt_fp, CAST(count(DISTINCT fp) AS BIGINT) AS n_responses
  FROM cand GROUP BY prompt_fp
)
SELECT b.prompt_fp AS prompt_fp,
       b.prompt AS prompt,
       b.text AS chosen,
       w.text AS rejected,
       CAST(b.score_bp AS BIGINT) AS chosen_bp,
       CAST(w.score_bp AS BIGINT) AS rejected_bp,
       CAST(b.score_bp - w.score_bp AS BIGINT) AS margin_bp,
       nr.n_responses AS n_responses
FROM (SELECT * FROM ranked WHERE rb = 1) b
JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (prompt_fp)
JOIN nr USING (prompt_fp)
WHERE b.fp <> w.fp AND b.score_bp - w.score_bp >= {int(min_margin_bp)}
"""
