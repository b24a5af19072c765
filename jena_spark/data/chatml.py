"""Chat-template rendering of transcripts into training text, with
assistant loss-mask character spans.

The last mile of an SFT data pipeline: each conversation is rendered
into ONE training document using a ChatML-shaped template

    <|im_start|>ROLE\\nTEXT<|im_end|>\\n

(tool turns render their tool name into the role line as
``tool:NAME``, the convention the tool-call census uses), and every
assistant turn contributes a **loss-mask span** — the character
interval ``[mask_start, mask_end)`` of its TEXT inside the rendered
document. A trainer masks everything outside these spans, so the
offsets must be exact; they are computed as integer prefix sums of the
per-turn rendered-unit lengths, never by re-searching the text (which
would be wrong for repeated turns).

Reference anchor: the reference's writer side streams a model through
a template-driven serializer (``jena-core/.../rdfxml/xmloutput`` does
the analogous header/body/footer assembly for statements); here the
"document" is a conversation and the units are turns.

Distributed shape: one window over ``conv_id`` (the same shuffle the
transcripts derivation already pays) computes prefix lengths and the
per-conversation ``collect_list`` rendering; everything else is
whole-stage-codegen string arithmetic. Conversation length is bounded
by construction (day-bucketed conv_ids), so the collected unit array
is bounded too. At 100 TB this is a map-side pass after one bounded
shuffle — no joins, no Python.

The DuckDB oracle assembles the identical template with ``string_agg``
and the identical prefix-sum arithmetic — different plan, same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: template pieces — single source of truth for both engines.
HDR_OPEN = "<|im_start|>"
HDR_CLOSE = "\n"
FOOTER = "<|im_end|>\n"


def _role_tag(role, tool):
    """``role`` or ``tool:NAME`` for tool turns carrying a tool name."""
    return F.when((role == "tool") & tool.isNotNull(),
                  F.concat(F.lit("tool:"), tool)).otherwise(role)


def render_chat(turns: DataFrame, conv_id: str = "conv_id",
                turn_idx: str = "turn_idx", role: str = "role",
                text: str = "text", tool: str = "tool",
                assistant_role: str = "assistant") -> DataFrame:
    """One row per **assistant** turn: ``(conv_id, turn_idx,
    mask_start, mask_end, n_chars, rendered)``.

    ``rendered`` is the whole conversation's ChatML rendering (equal
    for every row of one conversation); ``[mask_start, mask_end)`` is
    the character span of this turn's TEXT inside it (the loss
    region); ``n_chars = length(rendered)``. Offsets are 0-based and
    end-exclusive, so ``substring(rendered, mask_start+1,
    mask_end-mask_start) == text`` — asserted in tests.
    """
    tag = _role_tag(F.col(role), F.col(tool))
    unit = F.concat(F.lit(HDR_OPEN), tag, F.lit(HDR_CLOSE),
                    F.col(text), F.lit(FOOTER))
    hdr_len = (F.length(tag)
               + F.lit(len(HDR_OPEN) + len(HDR_CLOSE))).cast("bigint")
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    t = (turns.select(conv_id, turn_idx, role, text, tool)
         .withColumn("_unit", unit)
         .withColumn("_hlen", hdr_len)
         .withColumn("_tlen", F.length(text).cast("bigint"))
         .withColumn(
             "_pre",
             (F.sum(F.length("_unit").cast("bigint")).over(
                 w.rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
              - F.length("_unit")).cast("bigint"))
         .withColumn(
             "_rendered",
             F.array_join(
                 # struct (i, u) sorts by turn index — collect_list
                 # frame order is not a contract, determinism is
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col(turn_idx).alias("i"),
                                  F.col("_unit").alias("u"))).over(
                         w.rowsBetween(Window.unboundedPreceding,
                                       Window.unboundedFollowing))),
                     lambda s: s["u"]),
                 "")))
    return (t.where(F.col(role) == assistant_role)
            .select(
                conv_id, turn_idx,
                (F.col("_pre") + F.col("_hlen")).alias("mask_start"),
                (F.col("_pre") + F.col("_hlen")
                 + F.col("_tlen")).alias("mask_end"),
                F.length("_rendered").cast("bigint").alias("n_chars"),
                F.col("_rendered").alias("rendered"),
            ))


def render_chat_sql(transcripts_cte: str) -> str:
    """DuckDB twin of :func:`render_chat` over a transcripts CTE body
    (identical template constants, ``string_agg`` rendering, prefix-sum
    offsets)."""
    return f"""WITH transcripts AS ({transcripts_cte}),
u AS (
  SELECT conv_id, turn_idx, role, text,
         CASE WHEN role = 'tool' AND tool IS NOT NULL
              THEN 'tool:' || tool ELSE role END AS tag
  FROM transcripts),
v AS (
  SELECT conv_id, turn_idx, role, text,
         '{HDR_OPEN}' || tag || chr(10) || text || '<|im_end|>'
           || chr(10) AS unit,
         CAST(len(tag) + {len(HDR_OPEN) + len(HDR_CLOSE)} AS BIGINT)
           AS hlen,
         CAST(len(text) AS BIGINT) AS tlen
  FROM u),
p AS (
  SELECT *,
         CAST(sum(len(unit)) OVER (PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - len(unit) AS BIGINT) AS pre
  FROM v),
r AS (
  -- ordered string_agg is an aggregate, not a window, in DuckDB
  SELECT conv_id, string_agg(unit, '' ORDER BY turn_idx) AS rendered
  FROM v GROUP BY conv_id)
SELECT p.conv_id, p.turn_idx,
       p.pre + p.hlen AS mask_start,
       p.pre + p.hlen + p.tlen AS mask_end,
       CAST(len(r.rendered) AS BIGINT) AS n_chars,
       r.rendered
FROM p JOIN r ON p.conv_id = r.conv_id
WHERE p.role = 'assistant'"""
