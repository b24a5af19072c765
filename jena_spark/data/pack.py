"""Sequence packing — concat-and-chunk assignment for pretraining
batches.

The standard pretraining data layout (GPT-style "concat and chunk"):
documents are laid end-to-end in a deterministic order and the token
stream is cut into fixed ``context_len`` windows. This operator
computes, per document, its place in that layout WITHOUT materializing
the token stream: global token offset, and the first/last chunk its
tokens land in (a document may straddle a boundary — that is the
concat-and-chunk contract, and exactly what the offsets let a reader
reconstruct).

Everything is exact integer arithmetic over one ordered cumulative
sum, so the assignment is reproducible run-to-run and engine-to-engine
(the DuckDB oracle evaluates the identical window).

Scale: the cumulative sum needs a total order. Spark's
``Window.orderBy`` WITHOUT a partition key funnels every row through
ONE task — fine at test scale, a non-starter at 100 TB — so
``num_partitions=N`` switches to the classic distributed prefix sum:
range-exchange on ``doc_id``, per-partition token totals (N driver
rows), exclusive prefix offsets broadcast back, and the cumsum runs
as N PARALLEL per-partition windows. The result is boundary-invariant
(offsets depend only on the doc order, not where ranges split), so
the two paths are row-identical — asserted in
``tests/test_selection.py``. Pass ``partition_cols`` instead to pack
independent per-shard streams (one stream per source), the common
cluster posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_counts(df: DataFrame, text_col: str = "text") -> F.Column:
    """Whitespace token count (the pipeline's token-count contract;
    swap in a real tokenizer count column when one exists)."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def _prefix_sum_distributed(base: DataFrame, doc_id: str,
                            num_partitions: int) -> DataFrame:
    """base(doc_id, n_tokens) -> + ``end_offset`` via the two-pass
    distributed prefix sum. The range-partitioned frame is persisted
    so the partial-totals job and the final plan see the SAME
    partition boundaries (range boundaries come from sampling; two
    separate executions could legally split differently — harmless
    for values, but the _pid join must match its own totals)."""
    d = (base.repartitionByRange(num_partitions, F.col(doc_id))
         .sortWithinPartitions(doc_id)
         .withColumn("_pid", F.spark_partition_id())
         .persist())
    partials = sorted(
        d.groupBy("_pid").agg(F.sum("n_tokens").alias("psum")).collect(),
        key=lambda r: r["_pid"])  # ranges ascend with partition id
    offsets, acc = [], 0
    for r in partials:
        offsets.append((r["_pid"], acc))
        acc += int(r["psum"] or 0)
    off = d.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long")
    w = (Window.partitionBy("_pid").orderBy(doc_id)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(F.broadcast(off), "_pid")
            .withColumn("end_offset",
                        F.sum("n_tokens").over(w) + F.col("_off"))
            .drop("_pid", "_off"))


def pack_documents(df: DataFrame, context_len: int,
                   doc_id: str = "doc_id", text: str = "text",
                   n_tokens: str | None = None,
                   partition_cols: list[str] | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """-> one row per document: ``n_tokens``, ``start_offset`` (global
    token position of its first token), ``chunk_first`` /
    ``chunk_last`` (the ``context_len`` windows it occupies).
    Documents are laid out in ascending ``doc_id`` order (within
    ``partition_cols`` groups when given). Empty documents occupy no
    tokens and land on their neighbour's boundary with
    ``chunk_last = chunk_first - 1`` convention avoided by clamping to
    ``chunk_first``."""
    toks = (F.col(n_tokens) if n_tokens
            else token_counts(df, text)).cast("bigint")
    base = df.select(
        *(partition_cols or []), doc_id, toks.alias("n_tokens"))
    if num_partitions is not None and not partition_cols:
        with_end = _prefix_sum_distributed(base, doc_id, num_partitions)
    else:
        w = Window.orderBy(doc_id) if not partition_cols else \
            Window.partitionBy(*partition_cols).orderBy(doc_id)
        end = F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        with_end = base.withColumn("end_offset", end)
    out = with_end.select(
        *(partition_cols or []), doc_id, "n_tokens",
        (F.col("end_offset") - F.col("n_tokens")).alias("start_offset"),
        "end_offset",
    )
    first = F.floor(F.col("start_offset") / context_len).cast("bigint")
    last = F.floor((F.col("end_offset") - 1) / context_len).cast("bigint")
    return out.select(
        *(partition_cols or []), doc_id, "n_tokens", "start_offset",
        first.alias("chunk_first"),
        F.greatest(last, first).alias("chunk_last"),
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, doc_id: str = "doc_id",
                    text: str = "text") -> DataFrame:
    """Sliding-window chunking with overlap — the retrieval-corpus
    (RAG) counterpart of :func:`pack_documents`: instead of laying
    documents end-to-end, each document is cut independently into
    ``chunk_tokens``-token windows stepping ``chunk_tokens - overlap``
    tokens, so consecutive chunks share ``overlap`` tokens and no
    sentence is lost at a boundary.

    One row per (document, chunk): ``chunk_idx`` (0-based),
    ``start_tok`` (0-based token offset), ``n_chunk_tokens`` (the last
    window may be short), ``chunk_text`` (space-joined token window —
    chunk ids are pure arithmetic on the token count, so the operator
    is reproducible and resumable). Tokens follow the pipeline's
    whitespace contract (:func:`token_counts`).

    Scale: map-only — split, an integer-arithmetic chunk count,
    ``explode(sequence(...))`` and a slice per output row; no shuffle,
    no Python, stays in whole-stage codegen. Chunk fan-out is
    ~n_tokens/step rows per document, the same output cardinality any
    chunker must materialize.
    """
    step = chunk_tokens - overlap
    if overlap < 0 or step <= 0:
        raise ValueError(
            "overlap must be in [0, chunk_tokens) — a negative overlap "
            "would silently skip tokens between chunks")
    base = df.select(
        F.col(doc_id),
        F.split(F.trim(F.col(text)), r"\s+").alias("_toks"),
    ).withColumn("_n", F.size("_toks").cast("bigint"))
    # last chunk index: 0 when the doc fits one window, else the
    # ceil-div of the overhang in exact integer arithmetic (DIV) —
    # the oracle evaluates the identical `(n - W + step - 1) // step`
    last_idx = F.when(
        F.col("_n") <= chunk_tokens, F.lit(0).cast("bigint"),
    ).otherwise(F.expr(
        f"(_n - {chunk_tokens} + {step - 1}) DIV {step}"))
    chunks = base.select(
        doc_id, "_toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             last_idx)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * step).cast("bigint")
    window = F.slice(F.col("_toks"), start + 1, F.lit(chunk_tokens))
    return chunks.select(
        doc_id, "chunk_idx", start.alias("start_tok"),
        F.size(window).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
