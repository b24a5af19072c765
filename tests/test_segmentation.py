"""Topic segmentation: boundary rule, segment ids, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.segmentation import (segment_census, topic_segments,
                                          topic_segments_sql)

ROWS = [
    ("c", 0, "spark runs queries on clusters"),
    ("c", 1, "spark queries shuffle data"),        # cohesive with 0
    ("c", 2, "my cat likes tuna"),                 # topic shift
    ("c", 3, "the cat naps all day"),              # cohesive with 2
    ("d", 0, "solo"),
    ("d", 1, ""),                                  # empty vs solo
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string")


def test_boundaries_and_segments(spark):
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in topic_segments(_df(spark), 100).collect()}
    assert out[("c", 0)]["jacc_pm"] is None
    assert out[("c", 0)]["segment_id"] == 0
    # turns 0/1 share spark+queries: 2 of 7 distinct -> 285 pm
    assert out[("c", 1)]["jacc_pm"] == 285
    assert out[("c", 1)]["is_boundary"] is False
    assert out[("c", 2)]["jacc_pm"] == 0
    assert out[("c", 2)]["segment_id"] == 1
    assert out[("c", 3)]["segment_id"] == 1  # 'cat' + 'the' overlap?
    # turn2 tokens {my,cat,likes,tuna}, turn3 {the,cat,naps,all,day}
    # -> 1/8 = 125 pm >= 100 -> same segment
    assert out[("c", 3)]["jacc_pm"] == 125
    # empty text vs non-empty: union nonzero, inter 0 -> boundary
    assert out[("d", 1)]["jacc_pm"] == 0
    assert out[("d", 1)]["segment_id"] == 1


def test_census(spark):
    got = {r["conv_id"]: r for r in
           segment_census(_df(spark), 100).collect()}
    assert (got["c"]["n_turns"], got["c"]["n_segments"],
            got["c"]["max_segment_turns"]) == (4, 2, 2)
    assert got["d"]["n_segments"] == 2


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        topic_segments(_df(spark), -1)


def test_duckdb_parity(spark):
    got = sorted(tuple(r) for r in
                 topic_segments(_df(spark), 100).collect())
    vals = ", ".join(f"('{c}', {i}, '{t}')" for c, i, t in ROWS)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(conv_id, turn_idx, text)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in
                  con.sql(topic_segments_sql(cte, 100)).fetchall())
    assert got == want


def test_duckdb_parity_on_session_transcripts(spark, transcripts_df):
    got = sorted(tuple(r) for r in
                 topic_segments(transcripts_df, 150).collect())
    pdf = transcripts_df.select("conv_id", "turn_idx", "text").toPandas()
    con = duckdb.connect()
    con.register("ttv", pdf)
    want = sorted(tuple(r) for r in con.sql(
        topic_segments_sql("SELECT * FROM ttv", 150)).fetchall())
    assert got == want
