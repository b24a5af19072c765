"""Length-sorted batching — the padding-efficiency alternative to
sequence packing.

Dynamic/sorted batching (the fairseq/HF ``group_by_length`` posture):
documents are ordered by (token length, doc_id) and cut into
fixed-size batches, so each batch pads to its own max instead of the
corpus max. ``data/pack.py`` concatenates into fixed windows (zero
padding, broken document boundaries); this keeps documents intact and
measures what the padding costs — the two standard pretraining/SFT
batching strategies side by side.

Everything is exact integers: lengths are whitespace-contract token
counts, the batch id is ``(global_rank - 1) div batch_size``, waste is
integer ppm of the batch's padded token rectangle. The ordering key
includes ``doc_id``, so ties are deterministic and the DuckDB twin is
row-identical.

Distributed shape: the global rank decomposes as (cross-length
histogram offset) + (within-length rank), so there is NO
single-partition global window — one vocabulary-sized histogram agg,
one broadcast join, one window partitioned by token length, one
bounded per-batch rollup. Worst case (every document the same length)
degrades to one hot window partition; real corpora spread across
thousands of lengths. A deployment that wants per-shard batching
composes with ``data.selection.shuffle_shards`` first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_by_length(docs: DataFrame, batch_size: int = 8,
                    id_col: str = "doc_id",
                    text: str = "text") -> DataFrame:
    """Per-document batch assignment ``(doc_id, n_tokens, batch_id,
    pos_in_batch)`` — documents ordered by ``(n_tokens, doc_id)`` and
    cut into consecutive groups of ``batch_size``."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    tok = F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("bigint")
    t = docs.select(id_col, tok.alias("n_tokens"))
    # Global (n_tokens, doc_id) rank WITHOUT a single-partition window
    # (`Window.orderBy` with no partition key funnels the corpus
    # through one task): rank = (# docs with a shorter length) +
    # (rank within this length by doc_id). The cross-length offsets
    # come from a token-length histogram — a frame bounded by the
    # number of DISTINCT lengths, so its unpartitioned running-sum
    # window is vocabulary-sized, never corpus-sized — and the
    # within-length ranks parallelize across lengths. Deterministic
    # (no range-partitioner sampling involved).
    hist = t.groupBy("n_tokens").agg(F.count("*").alias("_cnt"))
    hw = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, -1)
    offs = hist.select(
        "n_tokens",
        F.coalesce(F.sum("_cnt").over(hw), F.lit(0)).alias("_off"))
    lw = Window.partitionBy("n_tokens").orderBy(id_col)
    return (t.join(F.broadcast(offs), "n_tokens")
            .withColumn("_rn",
                        F.row_number().over(lw) + F.col("_off"))
            .select(
                id_col, "n_tokens",
                F.expr(f"(_rn - 1) div {batch_size}").cast("bigint")
                .alias("batch_id"),
                ((F.col("_rn") - 1) % batch_size).cast("int")
                .alias("pos_in_batch")))


def batch_stats(docs: DataFrame, batch_size: int = 8,
                id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-batch rollup ``(batch_id, n_docs, batch_max_tokens,
    sum_tokens, waste_ppm)`` where ``waste_ppm = 10^6 * (n_docs *
    max - sum) div (n_docs * max)`` — the padded-rectangle fraction a
    trainer throws away (0 for a perfectly uniform batch)."""
    b = batch_by_length(docs, batch_size, id_col, text)
    agg = b.groupBy("batch_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.max("n_tokens").cast("bigint").alias("batch_max_tokens"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"))
    rect = F.col("n_docs") * F.col("batch_max_tokens")
    return agg.select(
        "batch_id", "n_docs", "batch_max_tokens", "sum_tokens",
        F.when(rect == 0, F.lit(0)).otherwise(
            F.expr("(1000000 * (n_docs * batch_max_tokens - sum_tokens))"
                   " div (n_docs * batch_max_tokens)"))
        .cast("bigint").alias("waste_ppm"))


def batch_stats_sql(docs_cte: str, batch_size: int = 8,
                    id_col: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of :func:`batch_stats` over a CTE body with
    ``(id_col, text)``."""
    return f"""WITH docs AS ({docs_cte}),
t AS (SELECT {id_col},
             CAST(len(regexp_split_to_array(trim({text}), '\\s+'))
                  AS BIGINT) AS n_tokens
      FROM docs),
b AS (SELECT {id_col}, n_tokens,
             (row_number() OVER (ORDER BY n_tokens, {id_col}) - 1)
               // {batch_size} AS batch_id
      FROM t),
a AS (SELECT batch_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(max(n_tokens) AS BIGINT) AS batch_max_tokens,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      FROM b GROUP BY batch_id)
SELECT batch_id, n_docs, batch_max_tokens, sum_tokens,
       CASE WHEN n_docs * batch_max_tokens = 0 THEN 0
            ELSE (1000000 * (n_docs * batch_max_tokens - sum_tokens))
                 // (n_docs * batch_max_tokens)
       END AS waste_ppm
FROM a"""
