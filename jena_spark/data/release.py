"""Composed conversation release gate — the transcript-corpus analog
of :func:`jena_spark.data.curate.curate_corpus`.

A transcript corpus ships through FIVE independent verdicts this repo
already computes one-by-one: structural lint
(:func:`~jena_spark.data.convqc.validate_conversations`), whole-
conversation exact dedup
(:func:`~jena_spark.data.transcripts.dedup_conversations`), stuck-
tool-loop detection (:func:`~jena_spark.data.agentic.detect_loops`),
refusal census (:func:`~jena_spark.data.refusals.refusal_census`) and
PII census (:func:`~jena_spark.data.redact.pii_census_conversations`).
:func:`curate_conversations` runs them as ONE job and rolls them into
the release decision table: per conversation, every rule's verdict, a
``kept`` bit, the first-failing ``reason`` (the audit posture of
``curate_corpus`` — a reviewer asks "why was this dropped", not "list
every failure"), and an ``action``:

* ``drop``  — structure / exact-dup / loops / refusal failed;
* ``scrub`` — kept, but PII present (redact with
  :func:`~jena_spark.data.redact.redact_text` before release);
* ``ship``  — kept and clean.

Rule order (first-failing): structure, exact_dup, loops, refusal.
PII never drops a conversation — it is repairable, hence a separate
action, exactly like the published cleaning pipelines that scrub
rather than discard.

Scale design: all five verdicts are per-conversation aggregations on
the SAME conv_id key — the five shuffles are co-partitioned and the
rollup joins add no Exchange beyond them; each component keeps its
partial-agg map-side collapse. One pass over the turns, five hash
aggregations, five narrow (conv_id, verdict) joins.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.agentic import detect_loops, detect_loops_sql
from jena_spark.data.convqc import validate_conversations, validate_sql
from jena_spark.data.redact import PII_PATTERNS, pii_census_conversations
from jena_spark.data.refusals import refusal_census, refusal_census_sql
from jena_spark.data.transcripts import dedup_conversations


def curate_conversations(turns: DataFrame, *, max_run: int = 3,
                         max_refusals: int = 0) -> DataFrame:
    """``(conv_id, structure_ok, exact_ok, loop_ok, refusal_ok,
    pii_clean, kept, action, reason)`` — the per-conversation release
    decision table (see module docstring for the rule order and the
    drop/scrub/ship actions). Expects the canonical turn columns
    ``(conv_id, turn_idx, role, text)``."""
    v = (validate_conversations(turns)
         .select("conv_id", F.col("ok").alias("structure_ok")))
    dd = (dedup_conversations(turns)
          .select("conv_id", F.col("keep").alias("exact_ok")))
    lp = (detect_loops(turns, max_run=max_run)
          .select("conv_id", F.col("keep").alias("loop_ok")))
    rf = (refusal_census(turns, max_refusals=max_refusals)
          .select("conv_id", F.col("keep").alias("refusal_ok")))
    pc = (pii_census_conversations(turns)
          .select("conv_id", F.col("clean").alias("pii_clean")))
    j = (v.join(dd, "conv_id").join(lp, "conv_id")
          .join(rf, "conv_id").join(pc, "conv_id"))
    kept = ((F.col("structure_ok") == 1) & (F.col("exact_ok") == 1)
            & (F.col("loop_ok") == 1) & (F.col("refusal_ok") == 1))
    reason = (F.when(F.col("structure_ok") == 0, "structure")
              .when(F.col("exact_ok") == 0, "exact_dup")
              .when(F.col("loop_ok") == 0, "loops")
              .when(F.col("refusal_ok") == 0, "refusal"))
    action = (F.when(~kept, "drop")
              .when(F.col("pii_clean") == 0, "scrub")
              .otherwise("ship"))
    return j.select("conv_id", "structure_ok", "exact_ok", "loop_ok",
                    "refusal_ok", "pii_clean",
                    kept.cast("int").alias("kept"),
                    action.alias("action"), reason.alias("reason"))


def curate_conversations_sql(turns_cte: str, *, max_run: int = 3,
                             max_refusals: int = 0) -> str:
    """DuckDB twin of :func:`curate_conversations` — each component's
    existing SQL twin nested as a CTE (identical recipes: md5
    turn-sequence fingerprint, progressive-scrub PII order, the
    verbatim refusal alternation), joined on conv_id with the same
    CASE chain."""
    (_, email, _), (_, ip, _), (_, ssn, _), (_, phone, _) = PII_PATTERNS
    dd = f"""WITH t AS ({turns_cte}),
fps AS (
  SELECT conv_id, md5(string_agg(role || '|' || text, chr(30)
         ORDER BY turn_idx)) AS fp
  FROM t GROUP BY conv_id),
w AS (SELECT fp, min(conv_id) AS winner FROM fps GROUP BY fp)
SELECT f.conv_id, CAST(f.conv_id = w.winner AS INT) AS keep
FROM fps f JOIN w USING (fp)"""
    pc = f"""WITH t AS ({turns_cte}),
s1 AS (SELECT conv_id, text,
              regexp_replace(text, '{email}', '[EMAIL]', 'g') AS t1 FROM t),
s2 AS (SELECT *, regexp_replace(t1, '{ip}', '[IP]', 'g') AS t2 FROM s1),
s3 AS (SELECT *, regexp_replace(t2, '{ssn}', '[SSN]', 'g') AS t3 FROM s2),
per AS (
  SELECT conv_id,
    len(regexp_extract_all(text, '{email}'))
      + len(regexp_extract_all(t1, '{ip}'))
      + len(regexp_extract_all(t2, '{ssn}'))
      + len(regexp_extract_all(t3, '{phone}')) AS hits
  FROM s3)
SELECT conv_id,
  CAST(CASE WHEN sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) = 0
       THEN 1 ELSE 0 END AS INT) AS clean
FROM per GROUP BY conv_id"""
    return f"""WITH v AS ({validate_sql(turns_cte)}),
dd AS ({dd}),
lp AS ({detect_loops_sql(turns_cte, max_run)}),
rf AS ({refusal_census_sql(turns_cte, max_refusals)}),
pc AS ({pc})
SELECT v.conv_id, v.ok AS structure_ok, dd.keep AS exact_ok,
  lp.keep AS loop_ok, rf.keep AS refusal_ok, pc.clean AS pii_clean,
  CAST(v.ok = 1 AND dd.keep = 1 AND lp.keep = 1 AND rf.keep = 1
       AS INT) AS kept,
  CASE WHEN NOT (v.ok = 1 AND dd.keep = 1 AND lp.keep = 1
                 AND rf.keep = 1) THEN 'drop'
       WHEN pc.clean = 0 THEN 'scrub' ELSE 'ship' END AS action,
  CASE WHEN v.ok = 0 THEN 'structure'
       WHEN dd.keep = 0 THEN 'exact_dup'
       WHEN lp.keep = 0 THEN 'loops'
       WHEN rf.keep = 0 THEN 'refusal' END AS reason
FROM v JOIN dd USING (conv_id) JOIN lp USING (conv_id)
JOIN rf USING (conv_id) JOIN pc USING (conv_id)"""
