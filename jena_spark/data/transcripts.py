"""Deterministic transcripts derivation from the driver's ``events`` table.

The north-star input is an Iceberg table of conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json
input_hint). The driver's testdata has no transcripts table, so we
derive one *deterministically* from ``events.parquet`` — the same rows
from PySpark and from DuckDB SQL — which lets every KG query be
oracle-checked end-to-end: the DuckDB oracle rebuilds the identical
transcripts, runs the identical extraction rules, and must produce the
identical triples.

Derivation (pure column functions of (event_id, user_id, event_type, ts)):

* ``conv_id``   = ``conv-<user_id>-d<yyyyMMdd(ts)>`` — one conversation
  per user per day (bounds conversation length at any scale factor).
* ``turn_idx``  = ``row_number() over (partition by conv_id order by ts,
  event_id) - 1`` — stable (ts, event_id) ordering; event_id is unique.
* ``role``      = click/view → user, signup/purchase → assistant,
  error → tool.
* ``tool``      = python/sql (by event_id parity) for tool turns, else
  NULL.
* ``text``      = filler + 0–2 planted gazetteer mentions selected by
  ``event_id`` arithmetic. Planted surfaces come from
  :data:`SAFE_SURFACES` — single-token surfaces only, so the
  longest-first gazetteer regex (Spark side) and a space-delimited
  ``contains`` join (DuckDB side) agree exactly.

Scale note: the derivation is one window function (one shuffle on
conv_id) over a columnar scan — at 100 TB this is the normal "sessionize
events" pattern; conv_id day-bucketing keeps partitions bounded and the
per-conv state tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Single-token gazetteer surfaces (see jena_spark.gazetteer). None is a
# word-boundary substring of another plantable surface, so regex
# longest-match (Spark) and token containment (DuckDB) coincide.
SAFE_SURFACES = [
    "Turing", "Lovelace", "Hopper", "Spark", "Jena", "NYC", "London",
    "Tokyo", "Shannon", "Neumann", "Liskov", "Knuth", "TimBL",
    "Hamilton", "Dijkstra", "Johnson", "Church", "Godel", "Lamarr",
]

# Spark/DuckDB mention parity REQUIRES every plantable surface to be a
# single \w+ token: the Spark side matches with a word-boundary
# longest-first regex, the oracle with space-padded contains — those
# disagree on punctuation-adjacent or overlapping multi-word surfaces
# (e.g. 'New York City' would match both 'New York' and 'New York
# City' in the SQL but only the longest in Spark). Fail at import so a
# future edit cannot silently desynchronize engine and oracle.
import re as _re

for _s in SAFE_SURFACES:
    if not _re.fullmatch(r"\w+", _s):
        raise AssertionError(
            f"SAFE_SURFACES entry {_s!r} is not a single \\w+ token — "
            "regex-vs-contains mention parity would break (see comment)"
        )

_N = len(SAFE_SURFACES)


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> transcripts DataFrame (input_hint shape)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts"
    )
    surfaces = F.array(*[F.lit(s) for s in SAFE_SURFACES])
    s1 = F.element_at(surfaces, (F.col("event_id") % _N + 1).cast("int"))
    s2 = F.element_at(surfaces, ((F.col("event_id") * 7 + 3) % _N + 1).cast("int"))
    has_s1 = F.col("event_id") % 5 != 0
    has_s2 = has_s1 & (F.col("event_id") % 3 == 0)

    conv_id = F.concat(
        F.lit("conv-"), F.col("user_id").cast("string"),
        F.lit("-d"), F.date_format("ts", "yyyyMMdd"),
    )
    text = F.concat(
        F.lit("note "), F.col("event_type"),
        F.when(has_s1, F.concat(F.lit(" we discussed "), s1, F.lit(" earlier")))
        .otherwise(F.lit("")),
        F.when(has_s2, F.concat(F.lit(" and also "), s2)).otherwise(F.lit("")),
        F.lit(" k"), (F.col("event_id") % 100).cast("string"),
    )
    role = (
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type").isin("signup", "purchase"), "assistant")
        .otherwise("tool")
    )
    tool = F.when(
        F.col("event_type") == "error",
        F.when(F.col("event_id") % 2 == 0, "python").otherwise("sql"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("conv_id", conv_id)
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select(
            "conv_id", "turn_idx",
            role.alias("role"), text.alias("text"), tool.alias("tool"),
            F.col("ts"),
        )
    )


def conversation_fingerprints(turns: DataFrame, *,
                              conv_id: str = "conv_id",
                              turn_idx: str = "turn_idx",
                              role: str = "role",
                              text: str = "text") -> DataFrame:
    """``(conv_id, n_turns, fp)`` — md5 of the ordered ``role|text``
    turn sequence (record-separator joined), the whole-conversation
    identity key. One hash aggregate per conversation; the collect is
    bounded by conversation length (day-bucketed conv_ids keep that
    small by construction)."""
    unit = F.concat_ws("|", F.col(role), F.col(text))
    return (turns.groupBy(F.col(conv_id).alias("conv_id"))
                 .agg(F.count("*").alias("n_turns"),
                      F.md5(F.array_join(
                          F.transform(
                              F.array_sort(F.collect_list(
                                  F.struct(F.col(turn_idx).alias("i"),
                                           unit.alias("u")))),
                              lambda s: s["u"]),
                          "\x1e")).alias("fp")))


def dedup_conversations(turns: DataFrame, *,
                        conv_id: str = "conv_id",
                        turn_idx: str = "turn_idx",
                        role: str = "role",
                        text: str = "text") -> DataFrame:
    """Whole-conversation exact dedup — the transcript-corpus analog
    of document dedup (agent corpora are dominated by replayed tool
    loops: identical (role, text) turn sequences under different
    conv_ids). Keep-first by smallest conv_id per fingerprint.

    Returns ``(conv_id, n_turns, fp, keep)`` — one row per input
    conversation; filter ``keep = 1`` for the surviving corpus.

    Scale design: the fingerprint is one per-conversation hash
    aggregate (the same conv_id shuffle the transcripts derivation
    already pays); the winner election is a partial-aggregatable
    ``min`` over 16-byte fingerprint keys — a tool loop replayed 10^6
    times collapses map-side, never a hot window; the verdict join
    carries (fp, winner) rows only.
    """
    fps = conversation_fingerprints(turns, conv_id=conv_id,
                                    turn_idx=turn_idx, role=role,
                                    text=text)
    winners = fps.groupBy("fp").agg(F.min("conv_id").alias("_w"))
    return (fps.join(winners, "fp")
               .select("conv_id", "n_turns", "fp",
                       (F.col("conv_id") == F.col("_w")).cast("int")
                       .alias("keep")))


def transcripts_cte() -> str:
    """DuckDB CTE body producing the identical transcripts relation.

    Usable as ``WITH transcripts AS (<this>) SELECT ...`` against the
    driver-registered ``events`` view.
    """
    arr = "[" + ", ".join(f"'{s}'" for s in SAFE_SURFACES) + "]"
    return f"""
    SELECT
      conv_id, turn_idx, role, text, tool, ts
    FROM (
      SELECT
        'conv-' || CAST(user_id AS VARCHAR) || '-d' || strftime(ts, '%Y%m%d') AS conv_id,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY 'conv-' || CAST(user_id AS VARCHAR) || '-d' || strftime(ts, '%Y%m%d')
          ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
        CASE WHEN event_type IN ('click','view') THEN 'user'
             WHEN event_type IN ('signup','purchase') THEN 'assistant'
             ELSE 'tool' END AS role,
        'note ' || event_type
          || CASE WHEN event_id % 5 <> 0
                  THEN ' we discussed ' || ({arr})[CAST(event_id % {_N} AS INTEGER) + 1] || ' earlier'
                  ELSE '' END
          || CASE WHEN event_id % 5 <> 0 AND event_id % 3 = 0
                  THEN ' and also ' || ({arr})[CAST((event_id * 7 + 3) % {_N} AS INTEGER) + 1]
                  ELSE '' END
          || ' k' || CAST(event_id % 100 AS VARCHAR) AS text,
        CASE WHEN event_type = 'error'
             THEN CASE WHEN event_id % 2 = 0 THEN 'python' ELSE 'sql' END
             END AS tool,
        ts
      FROM events
    )
    """
