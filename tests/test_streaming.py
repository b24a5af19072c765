"""Structured Streaming ingest (§2.11): foreachBatch reuses the batch
extraction; incremental parse role of StreamRDF
(``jena-arq/.../riot/system/StreamRDF.java``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.pipeline.extract import raw_triples  # noqa: E402
from jena_spark.schemas import TRANSCRIPTS_SCHEMA  # noqa: E402
from jena_spark.streaming.ingest import start_ingest  # noqa: E402
from jena_spark.terms import TERM_COLS  # noqa: E402


def test_stream_ingest_matches_batch(spark, transcripts_pdf, tmp_path):
    tdf, _ = transcripts_pdf
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch_df = spark.createDataFrame(tdf, TRANSCRIPTS_SCHEMA)
    # two "arrivals" -> two files; availableNow drains both
    half = len(tdf) // 2
    spark.createDataFrame(tdf.iloc[:half], TRANSCRIPTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(tdf.iloc[half:], TRANSCRIPTS_SCHEMA).write.mode(
        "append"
    ).parquet(src)

    q = start_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)

    streamed = {
        tuple(r) for r in spark.read.parquet(out).select(*TERM_COLS).distinct().collect()
    }
    expected = {tuple(r) for r in raw_triples(batch_df).select(*TERM_COLS).collect()}
    assert streamed == expected

    # restart with no new files: checkpoint makes it a no-op
    n_before = spark.read.parquet(out).count()
    q2 = start_ingest(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before
