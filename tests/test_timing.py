"""Turn-timing census: gaps, latency, edge conversations, parity."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from jena_spark.data.timing import timing_census, timing_census_sql, turn_gaps


def _ts(m, s=0):
    return datetime(2025, 1, 1, 12, m, s)


ROWS = [
    ("c", 0, "user", _ts(0)),
    ("c", 1, "assistant", _ts(0, 30)),   # latency 30s
    ("c", 2, "user", _ts(2)),            # gap 90s
    ("c", 3, "tool", _ts(2, 10)),        # not a response
    ("c", 4, "assistant", _ts(2, 20)),   # prev is tool -> not latency
    ("d", 0, "user", _ts(0)),            # single-turn conversation
    ("e", 0, "user", _ts(0)),
    ("e", 1, "assistant", _ts(59)),      # 3540s gap, not > 3600
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, ts timestamp")


def test_gaps_and_responses(spark):
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in turn_gaps(_df(spark)).collect()}
    assert got[("c", 0)]["gap_s"] is None
    assert got[("c", 1)]["gap_s"] == 30
    assert got[("c", 1)]["is_response"] is True
    assert got[("c", 2)]["gap_s"] == 90
    assert got[("c", 4)]["is_response"] is False  # follows tool


def test_census(spark):
    got = {r["conv_id"]: r
           for r in timing_census(_df(spark), long_gap_s=60).collect()}
    c = got["c"]
    assert (c["n_turns"], c["span_s"], c["max_gap_s"]) == (5, 140, 90)
    assert c["mean_gap_s"] == 140 // 4
    assert c["n_long_gaps"] == 1           # only the 90s gap > 60
    assert (c["n_responses"], c["mean_latency_s"]) == (1, 30)
    d = got["d"]
    assert (d["n_turns"], d["span_s"]) == (1, 0)
    assert d["mean_gap_s"] is None and d["mean_latency_s"] is None
    assert d["max_gap_s"] is None and d["n_long_gaps"] == 0
    assert got["e"]["n_long_gaps"] == 1    # 3540 > 60


def test_validation(spark):
    with pytest.raises(ValueError):
        timing_census(_df(spark), long_gap_s=-1)


def test_long_gap_threshold(spark):
    got = {r["conv_id"]: r["n_long_gaps"]
           for r in timing_census(_df(spark), 3600).collect()}
    assert got == {"c": 0, "d": 0, "e": 0}


def test_duckdb_parity(spark, transcripts_df):
    got = sorted(tuple(r) for r in
                 timing_census(transcripts_df, 3600).collect())
    pdf = transcripts_df.select("conv_id", "turn_idx", "role",
                                "ts").toPandas()
    con = duckdb.connect()
    con.register("ttv", pdf)
    want = sorted(tuple(r) for r in con.sql(
        timing_census_sql("SELECT * FROM ttv", 3600)).fetchall())
    assert got == want
