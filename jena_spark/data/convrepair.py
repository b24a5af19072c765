"""Conversation repair — merging consecutive same-role turns.

Scraped and API-exported transcripts routinely split one logical
message into several consecutive turns of the same role (client
retries, streaming flushes, UI edits). Trainers want the canonical
alternating form, so the standard repair merges each maximal run of
same-role turns into one turn — the gaps-and-islands transform
(`data/agentic.py::detect_loops` censuses these runs; this op
rewrites them).

Merge semantics (deterministic, mirrored in the twin): texts join
with a single ``\\n`` in turn order; ``ts`` is the run's first
timestamp; ``tool`` is the run's MIN non-null tool name (min/max skip
NULLs identically in Spark and DuckDB); ``turn_idx`` is re-indexed
densely from 0; ``n_merged`` says how many raw turns folded in.

Distributed shape: two window functions and one aggregation, all on
the same conv_id shuffle every transcript op pays; no joins, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_role_runs(turns: DataFrame, conv_id: str = "conv_id",
                    turn_idx: str = "turn_idx", role: str = "role",
                    text: str = "text", tool: str = "tool",
                    ts: str = "ts") -> DataFrame:
    """``(conv_id, turn_idx, role, text, tool, ts, n_merged)`` — one
    row per maximal same-role run, alternating roles guaranteed."""
    wc = Window.partitionBy(conv_id).orderBy(turn_idx)
    wr = Window.partitionBy(conv_id, role).orderBy(turn_idx)
    t = (turns.select(conv_id, turn_idx, role, text, tool, ts)
         .withColumn("_isl",
                     F.row_number().over(wc) - F.row_number().over(wr)))
    agg = (t.groupBy(conv_id, role, "_isl")
           .agg(F.min(turn_idx).alias("_first"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col(turn_idx).alias("i"),
                                     F.col(text).alias("x")))),
                        lambda s: s["x"]),
                    "\n").alias(text),
                F.min(tool).alias(tool),
                F.min(ts).alias(ts),
                F.count("*").cast("bigint").alias("n_merged")))
    wo = Window.partitionBy(conv_id).orderBy("_first")
    return (agg.withColumn(turn_idx,
                           (F.row_number().over(wo) - 1).cast("int"))
            .select(conv_id, turn_idx, role, text, tool, ts,
                    "n_merged"))


def merge_role_runs_sql(transcripts_cte: str) -> str:
    """DuckDB twin of :func:`merge_role_runs` — identical islands,
    ordered ``string_agg``, the same NULL-skipping min aggregates."""
    return f"""WITH transcripts AS ({transcripts_cte}),
i AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         - row_number() OVER (PARTITION BY conv_id, role
                              ORDER BY turn_idx) AS isl
  FROM transcripts),
a AS (
  SELECT conv_id, role, isl,
         min(turn_idx) AS first_idx,
         string_agg(text, chr(10) ORDER BY turn_idx) AS text,
         min(tool) AS tool,
         min(ts) AS ts,
         CAST(count(*) AS BIGINT) AS n_merged
  FROM i GROUP BY conv_id, role, isl)
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id
            ORDER BY first_idx) - 1 AS INT) AS turn_idx,
       role, text, tool, ts, n_merged
FROM a"""
