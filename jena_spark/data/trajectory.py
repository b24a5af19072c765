"""Agent-trajectory curation: completeness verdicts and tool census.

Agent-transcript corpora carry failure modes document corpora don't:
trajectories that end mid-tool-call (the run was killed or the tool
hung — training on them teaches the model to stop inside a call), and
trajectories with no assistant content at all (pure tool echo).
``trajectory_verdicts`` is the map-side curation gate for both; it
complements ``data/agentic.py``'s ``detect_loops`` (stuck repeated
runs) — together they are the standard agentic-data triage trio
(loops / truncation / emptiness).

``tool_census`` is the observability side: per-tool call volume and
conversation reach, the first table an agent-data owner asks for.

Distributed shape: each is ONE hash aggregation keyed by conv_id or
tool name — partial-aggregatable counts plus a ``max_by`` (Spark and
DuckDB agree on max_by semantics; turn_idx is unique per conversation
so the election is deterministic). No windows, no joins: at 10^12
turns these run at scan speed, and the conv_id shuffle is the same
one the transcripts derivation already pays.

Reference frame: Jena has no trajectory op (training-data-pipeline
extension); the census shape mirrors ``pipeline/stats.py``'s
predicate census discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trajectory_verdicts(turns: DataFrame,
                        conv_id: str = "conv_id",
                        turn_idx: str = "turn_idx",
                        role: str = "role",
                        tool_role: str = "tool",
                        assistant_role: str = "assistant",
                        user_role: str = "user") -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool, last_role,
    keep) — keep=1 iff the trajectory is complete (does not end on a
    tool turn) AND contains at least one assistant turn."""
    cnt = lambda r: F.sum((F.col(role) == r).cast("bigint"))
    g = (turns.groupBy(F.col(conv_id).alias("conv_id"))
         .agg(F.count("*").alias("n_turns"),
              cnt(user_role).alias("n_user"),
              cnt(assistant_role).alias("n_assistant"),
              cnt(tool_role).alias("n_tool"),
              F.max_by(role, turn_idx).alias("last_role")))
    return g.select(
        "conv_id", "n_turns", "n_user", "n_assistant", "n_tool",
        "last_role",
        ((F.col("last_role") != tool_role) & (F.col("n_assistant") > 0))
        .cast("int").alias("keep"))


def trajectory_verdicts_sql(transcripts_cte: str,
                            tool_role: str = "tool",
                            assistant_role: str = "assistant",
                            user_role: str = "user") -> str:
    """DuckDB twin of :func:`trajectory_verdicts`."""
    return f"""
WITH transcripts AS ({transcripts_cte})
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = '{user_role}' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(sum(CASE WHEN role = '{assistant_role}' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
       CAST(sum(CASE WHEN role = '{tool_role}' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
       max_by(role, turn_idx) AS last_role,
       CAST(CASE WHEN max_by(role, turn_idx) <> '{tool_role}'
                  AND sum(CASE WHEN role = '{assistant_role}' THEN 1 ELSE 0 END) > 0
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM transcripts
GROUP BY conv_id
"""


def tool_census(turns: DataFrame,
                conv_id: str = "conv_id",
                role: str = "role",
                tool: str = "tool",
                tool_role: str = "tool") -> DataFrame:
    """(tool, n_calls, n_convs) — call volume and conversation reach
    per tool name, over tool turns with a non-null tool column."""
    return (turns
            .where((F.col(role) == tool_role) & F.col(tool).isNotNull())
            .groupBy(F.col(tool).alias("tool"))
            .agg(F.count("*").alias("n_calls"),
                 F.count_distinct(F.col(conv_id)).alias("n_convs")))


def tool_census_sql(transcripts_cte: str, tool_role: str = "tool") -> str:
    """DuckDB twin of :func:`tool_census`."""
    return f"""
WITH transcripts AS ({transcripts_cte})
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM transcripts
WHERE role = '{tool_role}' AND tool IS NOT NULL
GROUP BY tool
"""
