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


def tool_call_census(turns: DataFrame, *,
                     conv_id: str = "conv_id",
                     args_col: str = "args_json",
                     required: tuple = ("q",)) -> DataFrame:
    """Tool-call payload validation census — the schema lint every
    agentic-SFT pipeline runs before training on tool trajectories:
    a tool-call argument blob must (a) parse as JSON and (b) carry
    the required argument keys. Rows with a NULL ``args_col`` are not
    tool calls and don't count.

    Returns one row per conversation: ``(conv_id, n_calls,
    n_bad_json, n_missing, n_ok, all_ok)`` where ``n_bad_json``
    counts unparseable payloads, ``n_missing`` counts parseable
    payloads lacking any ``required`` key (null-valued counts as
    missing — the serializer emitted a hole), and ``all_ok = 1`` iff
    every call in the conversation is clean.

    Engine notes: parsing is JVM-side ``try_parse_json`` (variant;
    malformed input yields NULL, never an abort — PERMISSIVE
    ``from_json`` can't distinguish malformed from missing-key), one
    map-only pass + the conv_id aggregation. Required keys are read
    as scalars (``try_variant_get(..., 'string')`` /
    ``json_extract_string``) — keep required args scalar-typed. The
    DuckDB twin uses ``json_valid`` + ``json_extract_string`` — both
    engines treat a valid object with a missing/null key identically.
    """
    parsed = F.expr(f"try_parse_json(`{args_col}`)")
    is_call = F.col(args_col).isNotNull()
    bad = is_call & parsed.isNull()
    miss_any = F.lit(False)
    for k in required:
        miss_any = miss_any | F.expr(
            f"try_variant_get(try_parse_json(`{args_col}`),"
            f" '$.{k}', 'string')").isNull()
    missing = is_call & ~bad & miss_any
    ok = is_call & ~bad & ~missing
    d = turns.select(
        conv_id,
        is_call.cast("int").alias("_c"),
        bad.cast("int").alias("_b"),
        missing.cast("int").alias("_m"),
        ok.cast("int").alias("_o"))
    return (d.groupBy(conv_id)
            .agg(F.sum("_c").cast("bigint").alias("n_calls"),
                 F.sum("_b").cast("bigint").alias("n_bad_json"),
                 F.sum("_m").cast("bigint").alias("n_missing"),
                 F.sum("_o").cast("bigint").alias("n_ok"))
            .withColumn("all_ok",
                        (F.col("n_calls") == F.col("n_ok")).cast("int")))


def tool_call_census_sql(turns_cte: str, *, conv_id: str = "conv_id",
                         args_col: str = "args_json",
                         required: tuple = ("q",)) -> str:
    """DuckDB twin of :func:`tool_call_census` over a CTE body."""
    miss = " OR ".join(
        f"json_extract_string({args_col}, '$.{k}') IS NULL"
        for k in required)
    return f"""WITH t AS ({turns_cte}),
d AS (
  SELECT {conv_id},
    CASE WHEN {args_col} IS NOT NULL THEN 1 ELSE 0 END AS c,
    CASE WHEN {args_col} IS NOT NULL
              AND NOT json_valid({args_col}) THEN 1 ELSE 0 END AS b,
    CASE WHEN {args_col} IS NOT NULL AND json_valid({args_col})
              AND ({miss}) THEN 1 ELSE 0 END AS m
  FROM t)
SELECT {conv_id},
  CAST(sum(c) AS BIGINT) AS n_calls,
  CAST(sum(b) AS BIGINT) AS n_bad_json,
  CAST(sum(m) AS BIGINT) AS n_missing,
  CAST(sum(c - b - m) AS BIGINT) AS n_ok,
  CAST(CASE WHEN sum(c) = sum(c - b - m) THEN 1 ELSE 0 END AS INT)
    AS all_ok
FROM d GROUP BY {conv_id}"""


def tool_chain_census(turns: DataFrame, n: int = 2,
                      conv_id: str = "conv_id",
                      turn_idx: str = "turn_idx", role: str = "role",
                      tool: str = "tool") -> DataFrame:
    """``(chain, n_convs, n_occurrences)`` — census of length-``n``
    tool CHAINS: consecutive tool invocations inside one conversation
    (tool turns in turn order, non-tool turns skipped), joined with
    ``>``. The "which tool sequences actually happen" question an
    agent-harness redesign starts from — e.g. a dominant
    ``search>search`` chain means the retriever needs multi-query
    support, not the agent more turns.

    One conv_id window (the transcript shuffle) + a lead-window chain
    derivation + one partial-agg census; chains bounded by per-conv
    tool-turn counts, which day-bucketed conv_ids bound.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(conv_id).orderBy(turn_idx)
    t = (turns.where((F.col(role) == "tool") & F.col(tool).isNotNull())
         .select(conv_id, turn_idx, tool))
    cols = [F.col(tool)] + [F.lead(tool, i).over(w)
                            for i in range(1, n)]
    # chain and the completeness witness materialize BEFORE the
    # filter: a window referenced after .where() would recompute its
    # leads over the FILTERED rows and silently shorten chains
    t = (t.withColumn("chain", F.concat_ws(">", *cols))
         .withColumn("_last", F.lead(tool, n - 1).over(w))
         .where(F.col("_last").isNotNull())
         .select(conv_id, "chain"))
    return (t.groupBy("chain")
            .agg(F.count_distinct(conv_id).cast("long").alias("n_convs"),
                 F.count("*").cast("long").alias("n_occurrences")))


def tool_chain_census_sql(transcripts_cte: str, n: int = 2) -> str:
    """DuckDB twin of :func:`tool_chain_census`."""
    leads = ["tool"] + [
        f"lead(tool, {i}) OVER (PARTITION BY conv_id ORDER BY turn_idx)"
        for i in range(1, n)]
    concat = " || '>' || ".join(leads)
    last = (f"lead(tool, {n - 1}) OVER (PARTITION BY conv_id"
            f" ORDER BY turn_idx)")
    return f"""WITH transcripts AS ({transcripts_cte}),
t AS (SELECT conv_id, turn_idx, tool FROM transcripts
      WHERE role = 'tool' AND tool IS NOT NULL),
c AS (SELECT conv_id, {concat} AS chain, {last} AS last_t FROM t)
SELECT chain,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM c WHERE last_t IS NOT NULL
GROUP BY chain"""
