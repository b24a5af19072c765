"""Shared-prefix family census over conversation transcripts.

Agent corpora are prefix-heavy by construction: every conversation
launched from the same product surface opens with the identical
system prompt, few-shot block, or tool preamble. Whole-conversation
dedup (:func:`jena_spark.data.transcripts.dedup_conversations`)
misses this — the conversations differ after turn 3 — yet the
repeated opening both wastes training tokens and concentrates
memorization pressure on boilerplate (the duplicate-n-gram share
:mod:`jena_spark.data.wimbd` measures corpus-wide, localized here to
the place transcripts actually repeat).

:func:`prefix_families` fingerprints each conversation's first ``k``
turns (the ordered ``role|text`` md5 recipe of
:func:`~jena_spark.data.transcripts.conversation_fingerprints`,
restricted to ``turn_idx < k``) and sizes the resulting families; a
family with ``min_family``+ members is boilerplate. One per-conv hash
aggregate on the conv_id shuffle the transcripts derivation already
pays, then a partial-aggregatable count over 16-byte family keys — a
system prompt shared by 10^8 conversations collapses map-side, never
a hot key.

:func:`trim_boilerplate_prefix` is the edit that follows the census:
drop the shared first ``k`` turns of boilerplate conversations
(keeping one exemplar family member intact so the corpus retains the
prompt once) and re-index the survivors' ``turn_idx`` densely.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefix_fp(turns: DataFrame, k: int, conv_id: str, turn_idx: str,
               role: str, text: str) -> DataFrame:
    unit = F.concat_ws("|", F.col(role), F.col(text))
    return (turns.where(F.col(turn_idx) < k)
            .groupBy(F.col(conv_id).alias("conv_id"))
            .agg(F.count("*").cast("long").alias("prefix_turns"),
                 F.md5(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col(turn_idx).alias("i"),
                                      unit.alias("u")))),
                         lambda s: s["u"]),
                     "\x1e")).alias("prefix_fp")))


def prefix_families(turns: DataFrame, k: int = 2, min_family: int = 2,
                    conv_id: str = "conv_id", turn_idx: str = "turn_idx",
                    role: str = "role", text: str = "text") -> DataFrame:
    """Per-conversation prefix-family verdicts.

    Returns ``(conv_id, prefix_fp, prefix_turns, family_n,
    boilerplate)`` — one row per conversation; ``family_n`` is the
    number of conversations sharing the first-``k``-turn fingerprint,
    ``boilerplate`` is 1 iff ``family_n >= min_family``. Conversations
    shorter than ``k`` fingerprint their whole turn sequence (the
    turn-count rides the hash input length, so a 1-turn conv never
    collides with a 2-turn family).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_family < 2:
        raise ValueError(f"min_family must be >= 2, got {min_family}")
    fps = _prefix_fp(turns, k, conv_id, turn_idx, role, text)
    fam = fps.groupBy("prefix_fp").agg(
        F.count("*").cast("long").alias("family_n"))
    return (fps.join(fam, "prefix_fp")
            .select("conv_id", "prefix_fp", "prefix_turns", "family_n",
                    (F.col("family_n") >= min_family).cast("int")
                    .alias("boilerplate")))


def prefix_families_sql(turns_cte: str, k: int = 2,
                        min_family: int = 2) -> str:
    """DuckDB twin of :func:`prefix_families` over a CTE yielding
    ``(conv_id, turn_idx, role, text)`` — identical fingerprint
    recipe, so the result hash-matches the Spark frame."""
    return f"""WITH transcripts AS ({turns_cte}),
fps AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS prefix_turns,
         md5(string_agg(role || '|' || text, chr(30)
             ORDER BY turn_idx)) AS prefix_fp
  FROM transcripts WHERE turn_idx < {int(k)} GROUP BY conv_id),
fam AS (SELECT prefix_fp, CAST(count(*) AS BIGINT) AS family_n
        FROM fps GROUP BY prefix_fp)
SELECT f.conv_id, f.prefix_fp, f.prefix_turns, fam.family_n,
       CAST(fam.family_n >= {int(min_family)} AS INT) AS boilerplate
FROM fps f JOIN fam USING (prefix_fp)"""


def trim_boilerplate_prefix(turns: DataFrame, k: int = 2,
                            min_family: int = 2,
                            conv_id: str = "conv_id",
                            turn_idx: str = "turn_idx",
                            role: str = "role",
                            text: str = "text") -> DataFrame:
    """Drop the shared first ``k`` turns of boilerplate conversations,
    keeping the family's min-conv_id exemplar intact (the corpus
    retains each prompt exactly once) and re-indexing survivors'
    ``turn_idx`` densely from 0. Non-boilerplate conversations pass
    through untouched. Column set is preserved.
    """
    from pyspark.sql import Window

    verdicts = prefix_families(turns, k=k, min_family=min_family,
                               conv_id=conv_id, turn_idx=turn_idx,
                               role=role, text=text)
    exemplar = verdicts.groupBy("prefix_fp").agg(
        F.min("conv_id").alias("_ex"))
    trim = (verdicts.join(exemplar, "prefix_fp")
            .select(F.col("conv_id").alias("_cid"),
                    ((F.col("boilerplate") == 1)
                     & (F.col("conv_id") != F.col("_ex")))
                    .alias("_trim")))
    joined = turns.join(trim, F.col(conv_id) == F.col("_cid"))
    kept = joined.where(~F.col("_trim") | (F.col(turn_idx) >= k))
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    return (kept.withColumn(
                "_new_idx",
                (F.row_number().over(w) - 1).cast(dict(
                    kept.dtypes)[turn_idx]))
            .withColumn(turn_idx, F.col("_new_idx"))
            .drop("_cid", "_trim", "_new_idx")
            .select(*turns.columns))
