"""Agent-transcript curation signals.

Agent corpora fail in ways document corpora don't: a stuck tool loop
replays the same turn (or the same role) dozens of times INSIDE one
conversation, which whole-conversation dedup
(:func:`jena_spark.data.transcripts.dedup_conversations`) cannot see —
the conv_ids differ, the fingerprints differ, but 90% of the tokens
are one repeated step. :func:`detect_loops` measures exactly that:
per-conversation run-length statistics of consecutive identical turn
values (text for literal replays, role for "assistant spam" /
tool-call storms), with an integer keep verdict.

Shape: the classic gaps-and-islands — one windowed change indicator +
cumulative segment id (one conv_id shuffle, the same partitioning the
transcripts derivation already uses), a (conv, segment) count, and a
per-conversation rollup. Everything integer, so the DuckDB oracle
hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_loops(turns: DataFrame, max_run: int = 3,
                 conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                 value: str = "text") -> DataFrame:
    """Per-conversation repeated-run census over ``value``:
    ``(conv_id, n_turns, max_run, n_repeated, keep)`` where a *run* is
    a maximal stretch of consecutive turns with equal ``value``,
    ``n_repeated`` counts the turns beyond the first of each run (the
    redundant ones a loop emits), and ``keep = 1`` iff the longest run
    is at most ``max_run``."""
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    prev = F.lag(value).over(w)
    chg = F.when(prev.isNull() | (F.col(value) != prev), 1).otherwise(0)
    seg = F.sum(F.lit(0) + chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = (turns.select(conv_id, turn_idx, value)
            .withColumn("_seg", seg)
            .groupBy(conv_id, "_seg")
            .agg(F.count(F.lit(1)).alias("_len")))
    return (runs.groupBy(F.col(conv_id).alias("conv_id"))
            .agg(F.sum("_len").cast("bigint").alias("n_turns"),
                 F.max("_len").cast("bigint").alias("max_run"),
                 F.sum(F.col("_len") - 1).cast("bigint")
                 .alias("n_repeated"))
            .select("conv_id", "n_turns", "max_run", "n_repeated",
                    (F.col("max_run") <= max_run).cast("int")
                    .alias("keep")))


def detect_loops_sql(transcripts_cte: str, max_run: int = 3,
                     value: str = "text") -> str:
    """DuckDB twin of :func:`detect_loops` over a transcripts CTE."""
    return f"""WITH transcripts AS ({transcripts_cte}),
m AS (
  SELECT conv_id, turn_idx, {value} AS v,
         CASE WHEN lag({value}) OVER w IS NULL
                OR {value} <> lag({value}) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
s AS (
  SELECT conv_id,
         sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM m),
runs AS (
  SELECT conv_id, seg, CAST(count(*) AS BIGINT) AS len
  FROM s GROUP BY conv_id, seg)
SELECT conv_id,
       CAST(sum(len) AS BIGINT) AS n_turns,
       CAST(max(len) AS BIGINT) AS max_run,
       CAST(sum(len - 1) AS BIGINT) AS n_repeated,
       CAST(max(len) <= {max_run} AS INT) AS keep
FROM runs GROUP BY conv_id"""
