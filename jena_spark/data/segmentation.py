"""Topic segmentation of conversations by lexical cohesion.

TextTiling-lite: a topic boundary is declared before turn *i* when the
token-set Jaccard similarity between turn *i* and turn *i-1* falls
below a threshold — the classic lexical-cohesion dip signal (Hearst's
TextTiling, reduced to its deterministic core: no smoothing window, no
learned parts). Long multi-topic conversations are then splittable
into coherent segments for chunking/packing, and the segment census
itself is a curation signal (a 40-turn conversation with 20 segments
is churn, not dialogue).

Determinism discipline: similarity is an **integer per-mille**
``floor(1000 * |A ∩ B| / |A ∪ B|)`` over lowercased ``\\w+`` token
SETS — the same integer-quantization posture as the fuzzy conversation
dedup — so Spark and DuckDB agree exactly and no float ever crosses
the comparison.

Distributed shape: one window over ``conv_id`` (lag + running sum —
the same single shuffle every transcript op pays); token sets come
from builtin split/distinct/intersect array functions inside
whole-stage codegen. No joins, no Python, no collect. Segment ids are
per-conversation cumulative sums, so the op is embarrassingly parallel
across conversations at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col):
    """Distinct lowercased word tokens (empty strings dropped)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != ""))


def topic_segments(turns: DataFrame, threshold_pm: int = 100,
                   conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                   text: str = "text") -> DataFrame:
    """``(conv_id, turn_idx, jacc_pm, is_boundary, segment_id)`` — one
    row per turn.

    ``jacc_pm`` is the integer per-mille Jaccard vs the PREVIOUS turn
    (NULL for the first turn of a conversation). A turn opens a new
    segment when ``jacc_pm < threshold_pm`` (two all-empty token sets
    count as cohesion 0 — a boundary, matching the SQL twin);
    ``segment_id`` is 0-based per conversation.
    """
    if threshold_pm < 0 or threshold_pm > 1000:
        raise ValueError("threshold_pm must be in [0, 1000]")
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    t = (turns.select(conv_id, turn_idx, text)
         .withColumn("_tok", _tokens(F.col(text)))
         .withColumn("_prev", F.lag("_tok").over(w)))
    inter = F.size(F.array_intersect("_tok", "_prev"))
    union = F.size(F.array_distinct(F.concat("_tok", "_prev")))
    jacc = (F.when(F.col("_prev").isNull(), F.lit(None))
            .when(union == 0, F.lit(0))
            .otherwise(F.floor(inter * 1000 / union))).cast("bigint")
    t = (t.withColumn("jacc_pm", jacc)
         .withColumn("is_boundary",
                     F.col("jacc_pm").isNotNull()
                     & (F.col("jacc_pm") < F.lit(threshold_pm))))
    seg = (F.sum(F.col("is_boundary").cast("bigint")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return t.select(conv_id, turn_idx, "jacc_pm", "is_boundary",
                    seg.cast("bigint").alias("segment_id"))


def segment_census(turns: DataFrame, threshold_pm: int = 100,
                   conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                   text: str = "text") -> DataFrame:
    """Per-conversation rollup: ``(conv_id, n_turns, n_segments,
    max_segment_turns)`` — the curation-facing summary."""
    segs = topic_segments(turns, threshold_pm, conv_id, turn_idx, text)
    per_seg = segs.groupBy(conv_id, "segment_id").agg(
        F.count("*").alias("_n"))
    return (per_seg.groupBy(conv_id).agg(
        F.sum("_n").cast("bigint").alias("n_turns"),
        F.count("*").cast("bigint").alias("n_segments"),
        F.max("_n").cast("bigint").alias("max_segment_turns")))


def topic_segments_sql(transcripts_cte: str,
                       threshold_pm: int = 100) -> str:
    """DuckDB twin of :func:`topic_segments` over a transcripts CTE
    body — identical tokenization, integer per-mille arithmetic, and
    boundary rule."""
    return f"""WITH transcripts AS ({transcripts_cte}),
t AS (
  SELECT conv_id, turn_idx,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '\\W+'),
           x -> x != '')) AS tok
  FROM transcripts),
l AS (
  SELECT conv_id, turn_idx, tok,
         lag(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t),
j AS (
  SELECT conv_id, turn_idx,
         CASE WHEN prev IS NULL THEN NULL
              WHEN len(list_distinct(tok || prev)) = 0 THEN 0
              ELSE CAST(floor(len(list_intersect(tok, prev)) * 1000.0
                        / len(list_distinct(tok || prev))) AS BIGINT)
         END AS jacc_pm
  FROM l),
b AS (
  SELECT conv_id, turn_idx, jacc_pm,
         jacc_pm IS NOT NULL AND jacc_pm < {threshold_pm}
           AS is_boundary
  FROM j)
SELECT conv_id, turn_idx, jacc_pm, is_boundary,
       CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS segment_id
FROM b"""
