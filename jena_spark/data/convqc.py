"""Conversation structural QC + context-budget fitting.

Two transcript-corpus passes every SFT/agentic pipeline runs before
training:

* :func:`validate_conversations` — the structural lint (OpenAI
  chat-format rules, public convention): conversations must open with
  a user/system turn, roles must not repeat back-to-back (tool runs
  excepted — tool results legitimately chain), turns must be
  non-empty, and a tool turn must follow an assistant or tool turn
  (the "dangling tool call" check). One census row per conversation.
* :func:`truncate_middle` — context-window fitting by middle
  eviction (the long-conversation policy popularized by chat-serving
  stacks: keep the opening turn(s) for grounding, keep the most
  recent suffix, drop the middle). Deterministic: whitespace token
  counts, largest surviving suffix under the budget.

Scale design: both are one window pass over ``(conv_id, turn_idx)``
— the same single shuffle the transcripts derivation already pays;
no driver-side data, no Python rows. 100 TB of transcripts is
``events``-partitioned and conversations are day-bucketed by
construction, so per-conversation window state stays tiny.

No reference-twin: Jena has no transcript operators — this extends
the repo's LLM-data-pipeline surface (SURVEY.md "beyond the
reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate_conversations(turns: DataFrame, *,
                           conv_id: str = "conv_id",
                           turn_idx: str = "turn_idx",
                           role: str = "role",
                           text: str = "text") -> DataFrame:
    """Per-conversation structural lint census.

    Returns one row per conversation:
    ``(conv_id, n_turns, bad_first, n_role_repeats, n_empty,
    n_orphan_tools, ok)`` where

    * ``bad_first``       — 1 when the first turn's role is neither
      ``user`` nor ``system``;
    * ``n_role_repeats``  — adjacent turns with the same role,
      excluding tool→tool chains (legal multi-result runs);
    * ``n_empty``         — turns whose text is empty/whitespace;
    * ``n_orphan_tools``  — tool turns whose previous turn is neither
      assistant nor tool (a tool result with no call);
    * ``ok``              — 1 iff every count above is zero.
    """
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    prev = F.lag(role).over(w)
    r, p = F.col(role), prev
    d = turns.select(
        conv_id, turn_idx, role,
        F.when((F.col(turn_idx) == 0) & ~r.isin("user", "system"), 1)
         .otherwise(0).alias("_bf"),
        F.when((p == r) & (r != "tool"), 1).otherwise(0).alias("_rr"),
        F.when(F.length(F.trim(text)) == 0, 1).otherwise(0).alias("_em"),
        F.when((r == "tool")
               & ~F.coalesce(p, F.lit("")).isin("assistant", "tool"), 1)
         .otherwise(0).alias("_ot"))
    out = d.groupBy(conv_id).agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.max("_bf").cast("int").alias("bad_first"),
        F.sum("_rr").cast("bigint").alias("n_role_repeats"),
        F.sum("_em").cast("bigint").alias("n_empty"),
        F.sum("_ot").cast("bigint").alias("n_orphan_tools"))
    bad = (F.col("bad_first") + F.col("n_role_repeats")
           + F.col("n_empty") + F.col("n_orphan_tools"))
    return out.withColumn("ok", F.when(bad == 0, 1).otherwise(0)
                          .cast("int"))


def truncate_middle(turns: DataFrame, budget: int, *,
                    keep_first: int = 1,
                    conv_id: str = "conv_id",
                    turn_idx: str = "turn_idx",
                    text: str = "text") -> DataFrame:
    """Middle-eviction context fitting: keep the first ``keep_first``
    turns plus the longest suffix of later turns whose combined
    whitespace-token count fits ``budget``. Conversations already
    within budget survive whole; the head is kept even when it alone
    exceeds the budget (the caller's overlong-head policy decision is
    visible as ``kept=1`` head rows with ``conv_tokens > budget``).

    Returns every input turn with ``(n_tokens, conv_tokens, kept)``
    appended — filter ``kept = 1`` for the fitted corpus. Exactly one
    window shuffle on ``conv_id``; token counting is map-only.
    """
    if budget <= 0:
        raise ValueError(f"truncate_middle: budget must be > 0, got {budget}")
    if keep_first < 0:
        raise ValueError(
            f"truncate_middle: keep_first must be >= 0, got {keep_first}")
    toks = F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(text), "\\s+")))
    d = turns.withColumn("n_tokens", toks.cast("bigint"))
    wc = Window.partitionBy(conv_id)
    # suffix sum over the tail (turn_idx >= keep_first), accumulated
    # from the END: one descending running sum.
    wdesc = (Window.partitionBy(conv_id).orderBy(F.col(turn_idx).desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_head = F.col(turn_idx) < keep_first
    head_toks = F.sum(F.when(is_head, F.col("n_tokens")).otherwise(0)).over(wc)
    suffix = F.sum(F.when(is_head, F.lit(0))
                   .otherwise(F.col("n_tokens"))).over(wdesc)
    return (d.withColumn("conv_tokens",
                         F.sum("n_tokens").over(wc).cast("bigint"))
             .withColumn("kept",
                         F.when(is_head
                                | (suffix <= F.lit(budget) - head_toks), 1)
                          .otherwise(0).cast("int")))


def validate_sql(turns_cte: str, *, conv_id: str = "conv_id",
                 turn_idx: str = "turn_idx", role: str = "role",
                 text: str = "text") -> str:
    """DuckDB twin of :func:`validate_conversations` over a CTE body
    producing the turns relation."""
    return f"""WITH t AS ({turns_cte}),
d AS (
  SELECT {conv_id}, {turn_idx}, {role},
    CASE WHEN {turn_idx} = 0 AND {role} NOT IN ('user','system')
         THEN 1 ELSE 0 END AS bf,
    CASE WHEN lag({role}) OVER w = {role} AND {role} <> 'tool'
         THEN 1 ELSE 0 END AS rr,
    CASE WHEN len(trim({text})) = 0 THEN 1 ELSE 0 END AS em,
    CASE WHEN {role} = 'tool'
              AND coalesce(lag({role}) OVER w, '')
                  NOT IN ('assistant','tool')
         THEN 1 ELSE 0 END AS ot
  FROM t
  WINDOW w AS (PARTITION BY {conv_id} ORDER BY {turn_idx}))
SELECT {conv_id},
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(max(bf) AS INT) AS bad_first,
  CAST(sum(rr) AS BIGINT) AS n_role_repeats,
  CAST(sum(em) AS BIGINT) AS n_empty,
  CAST(sum(ot) AS BIGINT) AS n_orphan_tools,
  CAST(CASE WHEN max(bf) + sum(rr) + sum(em) + sum(ot) = 0
       THEN 1 ELSE 0 END AS INT) AS ok
FROM d GROUP BY {conv_id}"""


def truncate_sql(turns_cte: str, budget: int, *, keep_first: int = 1,
                 conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                 text: str = "text") -> str:
    """DuckDB twin of :func:`truncate_middle` (identical token rule
    and suffix arithmetic)."""
    toks = (f"CASE WHEN len(trim({text})) = 0 THEN 0 "
            f"ELSE len(string_split_regex(trim({text}), '\\s+')) END")
    return f"""WITH t AS ({turns_cte}),
d AS (SELECT *, CAST({toks} AS BIGINT) AS n_tokens FROM t),
s AS (
  SELECT *,
    CAST(sum(n_tokens) OVER (PARTITION BY {conv_id}) AS BIGINT)
      AS conv_tokens,
    sum(CASE WHEN {turn_idx} < {keep_first} THEN n_tokens ELSE 0 END)
      OVER (PARTITION BY {conv_id}) AS head_toks,
    sum(CASE WHEN {turn_idx} < {keep_first} THEN 0 ELSE n_tokens END)
      OVER (PARTITION BY {conv_id} ORDER BY {turn_idx} DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix
  FROM d)
SELECT * EXCLUDE (head_toks, suffix),
  CAST(CASE WHEN {turn_idx} < {keep_first}
            OR suffix <= {budget} - head_toks
       THEN 1 ELSE 0 END AS INT) AS kept
FROM s"""
