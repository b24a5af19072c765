"""Lineage, counters, and exact-resume tests (kill/restart semantics)."""

from __future__ import annotations

from jena_spark.pipeline import materialize as M
from jena_spark.pipeline.extract import raw_triples


def test_resume_exact(spark, transcripts_df, tmp_path):
    out_clean = str(tmp_path / "clean")
    out_resumed = str(tmp_path / "resumed")
    df = raw_triples(transcripts_df)
    n_buckets = 8

    # clean run
    M.write_stage(df, out_clean, "raw", n_buckets)

    # simulated crash: only half the buckets got written+recorded
    M.write_stage(df, out_resumed, "raw", n_buckets, only_buckets=[0, 1, 2])
    m = M.read_manifest(out_resumed)
    assert m["completed"] == [0, 1, 2]

    # restart: resume computes ONLY missing buckets
    res = M.resume_or_write(df, out_resumed, "raw", n_buckets)
    assert sorted(M.read_manifest(out_resumed)["completed"]) == list(range(n_buckets))

    clean = M.triple_set(spark.read.parquet(out_clean))
    resumed = M.triple_set(spark.read.parquet(out_resumed))
    assert clean == resumed
    assert res.counters["rows_out"] == len(spark.read.parquet(out_resumed).collect())

    # resuming a complete output is a no-op (idempotent)
    before = M.read_manifest(out_resumed)["counters"]["rows_out"]
    M.resume_or_write(df, out_resumed, "raw", n_buckets)
    assert M.read_manifest(out_resumed)["counters"]["rows_out"] == before


def test_run_pipeline_end_to_end(spark, transcripts_df, tmp_path):
    out = str(tmp_path / "kg")
    results = M.run_pipeline(spark, transcripts_df, out, n_buckets=4)
    assert set(results) == {"raw_triples", "triples", "nodes"}
    triples = spark.read.parquet(out + "/triples")
    nodes = spark.read.parquet(out + "/nodes")
    assert triples.count() > 0
    assert nodes.count() > 0
    # every counter present and positive
    for r in results.values():
        assert r.counters["rows_out"] > 0
        assert r.counters["rows_per_sec"] > 0
