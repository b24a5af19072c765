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

Scale: the cumulative sum needs a total order — a global range
exchange, the one shuffle this op owns (packing IS an output-stage
global layout decision; there is no cheaper honest version). Pass
``partition_cols`` to pack independently within partitions (e.g. one
stream per source shard) and the sort becomes per-group, the common
cluster posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_counts(df: DataFrame, text_col: str = "text") -> F.Column:
    """Whitespace token count (the pipeline's token-count contract;
    swap in a real tokenizer count column when one exists)."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def pack_documents(df: DataFrame, context_len: int,
                   doc_id: str = "doc_id", text: str = "text",
                   n_tokens: str | None = None,
                   partition_cols: list[str] | None = None) -> DataFrame:
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
    w = Window.orderBy(doc_id) if not partition_cols else \
        Window.partitionBy(*partition_cols).orderBy(doc_id)
    base = df.select(
        *(partition_cols or []), doc_id, toks.alias("n_tokens"))
    end = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = base.withColumn("end_offset", end).select(
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
