"""Incremental transcript ingest via Structured Streaming.

``foreachBatch`` reuses the exact batch extraction + materialize code —
the streaming layer adds incrementality, not new semantics (the
reference's StreamRDF parses incrementally into the same Graph.add
path, ``riot/system/StreamRDF.java`` → ``Graph.java:84``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jena_spark.pipeline.extract import raw_triples
from jena_spark.schemas import TRANSCRIPTS_SCHEMA


def stream_transcripts(spark: SparkSession, input_path: str) -> DataFrame:
    """File-source stream of transcript rows (new files = new turns)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_path)
    )


def start_ingest(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint: str,
    gazetteer: dict | None = None,
):
    """Micro-batch ingest: per batch, run extraction and append the
    triples. Exactly-once via the streaming checkpoint (offsets) +
    idempotent dedup downstream. Returns the StreamingQuery."""
    stream = stream_transcripts(spark, input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        triples = raw_triples(batch_df, gazetteer)
        triples.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
