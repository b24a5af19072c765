"""Instruction-diversity census (jena_spark.data.instructions)."""

import pytest

from jena_spark.data.instructions import (instruction_census,
                                          instruction_census_sql,
                                          instruction_flags)

TURNS = [
    ("c1", 0, "user", "Write a poem about spring"),
    ("c1", 1, "assistant", "Here is a poem"),
    ("c2", 0, "user", "write the answer as JSON with 3 fields"),
    ("c2", 1, "assistant", "{}"),
    ("c3", 0, "user", "Summarize this article in a bullet list"),
    ("c4", 0, "user", "EXPLAIN: why is the sky blue?"),
    ("c5", 0, "user", "???"),          # normalizes to nothing: dropped
    ("c5", 1, "assistant", "Write"),   # assistant turns never counted
]
SCHEMA = "conv_id string, turn_idx int, role string, text string"


def test_flags_and_verbs(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    rows = {(r.conv_id, r.turn_idx): r
            for r in instruction_flags(t).collect()}
    assert set(rows) == {("c1", 0), ("c2", 0), ("c3", 0), ("c4", 0)}
    assert rows[("c1", 0)].verb == "write"
    assert rows[("c4", 0)].verb == "explain"   # punctuation collapsed
    assert (rows[("c1", 0)].format_req, rows[("c1", 0)].quantity_req) == (0, 0)
    assert (rows[("c2", 0)].format_req, rows[("c2", 0)].quantity_req) == (1, 1)
    assert rows[("c3", 0)].format_req == 1     # bullet + list


def test_census_shares(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    out = {r.verb: r for r in instruction_census(t).collect()}
    assert set(out) == {"write", "summarize", "explain"}
    assert out["write"].n_instr == 2          # case-insensitive merge
    assert out["write"].n_format_req == 1
    assert out["write"].share_ppm == 2 * 1000000 // 4
    assert out["explain"].share_ppm == 1000000 // 4


def test_duckdb_parity(spark):
    import duckdb

    t = spark.createDataFrame(TURNS, SCHEMA)
    con = duckdb.connect()
    con.sql("CREATE TABLE tr(conv_id VARCHAR, turn_idx INT,"
            " role VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?, ?)", TURNS)
    got = sorted(map(tuple, instruction_census(t).collect()))
    want = sorted(map(tuple, con.sql(
        instruction_census_sql("SELECT role, text FROM tr")).fetchall()))
    assert got == want
