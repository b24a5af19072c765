"""SFT example assembly from conversation transcripts.

The transcript-payload counterpart of sequence packing: a fine-tuning
corpus is built by turning every assistant turn into a training
example ``(context, target)`` where the context is the MAXIMAL suffix
of preceding turns whose total (whitespace-contract) token count fits
``max_context_tokens`` — the standard "truncate history from the
left" SFT windowing. Emitting ``n_ctx_tokens``/``n_tgt_tokens``
alongside makes the rows loss-mask-ready (mask = first
``n_ctx_tokens`` tokens of the packed sequence).

Distributed shape: ONE window pass per conversation (the same conv_id
shuffle the transcripts derivation already pays) — per-turn prefix
token sums, then a running ``collect_list`` of the preceding turns
filtered by the exact integer budget inequality
``pre_i - pre_j <= budget`` (prefix sums are nondecreasing, so the
kept set is automatically the contiguous most-recent suffix). No
self-join, no Python; context strings assemble via higher-order array
functions inside whole-stage codegen. Conversation length is bounded
by construction (day-bucketed conv_ids), so the per-row history array
is bounded too — the same argument the conversation-fingerprint
operator makes.

The DuckDB oracle evaluates the identical semantics as a prefix-sum +
bounded self-join + ordered ``string_agg`` — different plan, same
rows, hash-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: turn separator inside assembled contexts — the record separator,
#: matching conversation_fingerprints' join byte (chr(30) in DuckDB).
TURN_SEP = "\x1e"


def sft_examples(turns: DataFrame, max_context_tokens: int = 32,
                 conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                 role: str = "role", text: str = "text",
                 assistant_role: str = "assistant") -> DataFrame:
    """One row per assistant turn: ``(conv_id, turn_idx, n_ctx_turns,
    n_ctx_tokens, context, target, n_tgt_tokens)``.

    ``context`` is ``role|text`` units of the kept preceding turns,
    oldest first, joined by :data:`TURN_SEP`; a first-turn assistant
    message gets an empty context. Turn j (< i) is kept iff the token
    count of turns ``j..i-1`` is at most ``max_context_tokens`` —
    exact integer arithmetic over one per-conversation prefix sum.
    """
    tok = F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("bigint")
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    t = (turns.select(conv_id, turn_idx, role, text)
         .withColumn("_tok", tok)
         .withColumn(
             "_pre",
             F.sum("_tok").over(
                 w.rowsBetween(Window.unboundedPreceding,
                               Window.currentRow)) - F.col("_tok")))
    hist = F.collect_list(
        F.struct(F.col(turn_idx).alias("i"), F.col(role).alias("r"),
                 F.col(text).alias("x"), F.col("_pre").alias("p"))
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    t = t.withColumn("_hist", hist)
    # budget filter + explicit re-sort by turn index (struct field `i`
    # leads, so array_sort orders by it) — collect_list's frame order
    # is not a contract, determinism is
    kept = F.array_sort(F.filter(
        "_hist",
        lambda s: (F.col("_pre") - s["p"]) <= max_context_tokens))
    return (t.where(F.col(role) == assistant_role)
            .select(
                conv_id, turn_idx,
                F.size(kept).cast("bigint").alias("n_ctx_turns"),
                F.when(F.size(kept) > 0,
                       F.col("_pre") - F.element_at(kept, 1)["p"])
                .otherwise(F.lit(0)).cast("bigint").alias("n_ctx_tokens"),
                F.array_join(
                    F.transform(kept,
                                lambda s: F.concat_ws("|", s["r"], s["x"])),
                    TURN_SEP).alias("context"),
                F.col(text).alias("target"),
                F.col("_tok").alias("n_tgt_tokens"),
            ))


def sft_examples_sql(transcripts_cte: str,
                     max_context_tokens: int = 32) -> str:
    """DuckDB twin of :func:`sft_examples` over a transcripts CTE body
    (prefix sum + bounded self-join + ordered string_agg)."""
    return f"""WITH transcripts AS ({transcripts_cte}),
t AS (
  SELECT conv_id, turn_idx, role, text,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS tok
  FROM transcripts),
c AS (
  SELECT *, sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
           AS pre
  FROM t),
a AS (SELECT conv_id, turn_idx, text AS target, tok AS n_tgt_tokens,
             pre AS pre_i
      FROM c WHERE role = 'assistant'),
ctx AS (
  SELECT a.conv_id, a.turn_idx,
         count(j.turn_idx) AS n_ctx_turns,
         CAST(coalesce(a.pre_i - min(j.pre), 0) AS BIGINT)
           AS n_ctx_tokens,
         coalesce(string_agg(j.role || '|' || j.text, chr(30)
                             ORDER BY j.turn_idx), '') AS context
  FROM a LEFT JOIN c j
    ON j.conv_id = a.conv_id AND j.turn_idx < a.turn_idx
   AND a.pre_i - j.pre <= {max_context_tokens}
  GROUP BY a.conv_id, a.turn_idx, a.pre_i)
SELECT a.conv_id, a.turn_idx, ctx.n_ctx_turns, ctx.n_ctx_tokens,
       ctx.context, a.target, a.n_tgt_tokens
FROM a JOIN ctx ON a.conv_id = ctx.conv_id AND a.turn_idx = ctx.turn_idx"""
