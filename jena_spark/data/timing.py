"""Turn-timing census — response latency and gap analysis.

The temporal QC signal over conversation transcripts: inter-turn gaps
expose stalled sessions (a 4-hour hole usually means two conversations
were glued together by the sessionizer) and assistant *response
latency* (user turn → next assistant turn) is both a product metric
and a curation signal (instant multi-kiloword answers in scraped data
are copy-paste, not dialogue). The structural lint lives in
``data/convqc.py``; this module covers what only timestamps can say.

All outputs are exact integer seconds; means are true FLOOR divisions
via the repo's sign-split recipe (Spark ``div`` truncates toward zero
while DuckDB ``//`` floors, so a negative ``sum(gap_s)`` — possible
with out-of-order timestamps — needs the explicit
``-((-s + c - 1) div c)`` branch, exactly as ``agreement.py`` does
for negative kappas). No float crosses the comparison with the DuckDB
twin.

Distributed shape: one window over ``conv_id`` (lag) + one partial-agg
rollup — the same single shuffle every transcript op pays; at 100 TB
this is map-side arithmetic plus one bounded aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_gaps(turns: DataFrame, conv_id: str = "conv_id",
              turn_idx: str = "turn_idx", role: str = "role",
              ts: str = "ts") -> DataFrame:
    """Per-turn frame ``(conv_id, turn_idx, role, gap_s,
    is_response)``: ``gap_s`` = integer seconds since the previous
    turn (NULL on conversation openers); ``is_response`` marks an
    assistant turn directly following a user turn."""
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    t = (turns.select(conv_id, turn_idx, role, ts)
         .withColumn("_prev_ts", F.lag(ts).over(w))
         .withColumn("_prev_role", F.lag(role).over(w)))
    gap = (F.unix_timestamp(ts) - F.unix_timestamp("_prev_ts")) \
        .cast("bigint")
    return t.select(
        conv_id, turn_idx, role,
        gap.alias("gap_s"),
        ((F.col(role) == "assistant")
         & (F.col("_prev_role") == "user")).alias("is_response"))


def timing_census(turns: DataFrame, long_gap_s: int = 3600,
                  conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                  role: str = "role", ts: str = "ts") -> DataFrame:
    """Per-conversation rollup ``(conv_id, n_turns, span_s,
    mean_gap_s, max_gap_s, n_long_gaps, n_responses,
    mean_latency_s)``.

    ``span_s`` = last-turn ts − first-turn ts; ``mean_gap_s`` /
    ``mean_latency_s`` are floor divisions (NULL when no gaps /
    responses exist); ``n_long_gaps`` counts gaps strictly over
    ``long_gap_s`` — the glued-session detector.
    """
    if long_gap_s < 0:
        raise ValueError(f"long_gap_s must be >= 0, got {long_gap_s}")
    g = turn_gaps(turns, conv_id, turn_idx, role, ts)
    return g.groupBy(conv_id).agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("bigint")
         .alias("span_s"),
        # sign-split floor: `div` truncates toward zero, DuckDB `//`
        # floors — out-of-order timestamps can make sum(gap_s) < 0
        F.expr("case when count(gap_s) = 0 then null "
               "when sum(gap_s) >= 0 then "
               "sum(gap_s) div count(gap_s) else "
               "-((-sum(gap_s) + count(gap_s) - 1) div count(gap_s)) "
               "end").alias("mean_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum(F.when(F.col("gap_s") > long_gap_s, 1).otherwise(0))
         .cast("bigint").alias("n_long_gaps"),
        # NULL-safe: openers have NULL is_response; sum of the CASE
        # (not of the raw cast) so an all-NULL conversation counts 0
        F.sum(F.when(F.col("is_response"), 1).otherwise(0))
         .cast("bigint").alias("n_responses"),
        F.expr("case when count(case when is_response then gap_s end)"
               " = 0 then null "
               "when sum(case when is_response then gap_s end) >= 0 "
               "then sum(case when is_response then gap_s end) div "
               "count(case when is_response then gap_s end) else "
               "-((-sum(case when is_response then gap_s end) + "
               "count(case when is_response then gap_s end) - 1) div "
               "count(case when is_response then gap_s end)) end")
         .alias("mean_latency_s"),
    )


def timing_census_sql(transcripts_cte: str,
                      long_gap_s: int = 3600) -> str:
    """DuckDB twin of :func:`timing_census` — ``date_diff('second')``
    gaps, the same floor-division means."""
    return f"""WITH transcripts AS ({transcripts_cte}),
g AS (
  SELECT conv_id, turn_idx, role,
         CAST(date_diff('second',
              lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx),
              ts) AS BIGINT) AS gap_s,
         role = 'assistant' AND lag(role) OVER (PARTITION BY conv_id
              ORDER BY turn_idx) = 'user' AS is_response
  FROM transcripts)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS span_s,
       CASE WHEN count(gap_s) = 0 THEN NULL
            ELSE CAST(sum(gap_s) AS BIGINT) // count(gap_s)
       END AS mean_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s,
       CAST(sum(CASE WHEN gap_s > {long_gap_s} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_long_gaps,
       CAST(sum(CASE WHEN is_response THEN 1 ELSE 0 END) AS BIGINT)
         AS n_responses,
       CASE WHEN count(CASE WHEN is_response THEN gap_s END) = 0
            THEN NULL
            ELSE CAST(sum(CASE WHEN is_response THEN gap_s END)
                 AS BIGINT)
                 // count(CASE WHEN is_response THEN gap_s END)
       END AS mean_latency_s
FROM g GROUP BY conv_id"""
