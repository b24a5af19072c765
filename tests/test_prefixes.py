"""Shared-prefix families (jena_spark.data.prefixes)."""

import pytest

from jena_spark.data.prefixes import (prefix_families, prefix_families_sql,
                                      trim_boilerplate_prefix)

# c1/c2/c3 share the 2-turn system-prompt opening; c4 diverges at
# turn 1; c5 is a single-turn conversation
TURNS = [
    ("c1", 0, "user", "sys prompt"), ("c1", 1, "assistant", "ack"),
    ("c1", 2, "user", "question one"),
    ("c2", 0, "user", "sys prompt"), ("c2", 1, "assistant", "ack"),
    ("c2", 2, "user", "question two"), ("c2", 3, "assistant", "answer"),
    ("c3", 0, "user", "sys prompt"), ("c3", 1, "assistant", "ack"),
    ("c4", 0, "user", "sys prompt"), ("c4", 1, "assistant", "different"),
    ("c5", 0, "user", "lonely opener"),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string"


def test_family_census(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    out = {r.conv_id: r for r in prefix_families(t, k=2).collect()}
    assert len(out) == 5
    assert (out["c1"].family_n, out["c1"].boilerplate) == (3, 1)
    assert out["c1"].prefix_fp == out["c2"].prefix_fp == out["c3"].prefix_fp
    assert (out["c4"].family_n, out["c4"].boilerplate) == (1, 0)
    # short conversation fingerprints its whole (1-turn) sequence
    assert (out["c5"].prefix_turns, out["c5"].family_n) == (1, 1)


def test_duckdb_parity(spark):
    import duckdb

    t = spark.createDataFrame(TURNS, SCHEMA)
    got = sorted(map(tuple, prefix_families(t, k=2, min_family=3).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE tr(conv_id VARCHAR, turn_idx INT,"
            " role VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?, ?)", TURNS)
    want = sorted(map(tuple, con.sql(prefix_families_sql(
        "SELECT * FROM tr", k=2, min_family=3)).fetchall()))
    assert got == want


def test_trim_keeps_exemplar_and_reindexes(spark):
    t = spark.createDataFrame(
        [r + (None, None) for r in TURNS],
        SCHEMA + ", tool string, ts timestamp")
    out = trim_boilerplate_prefix(t, k=2).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r.conv_id, []).append(r)
    # c1 is the family's min-conv_id exemplar: intact
    assert [r.text for r in sorted(by_c["c1"], key=lambda r: r.turn_idx)] \
        == ["sys prompt", "ack", "question one"]
    # c2 lost its first 2 turns, re-indexed from 0
    c2 = sorted(by_c["c2"], key=lambda r: r.turn_idx)
    assert [(r.turn_idx, r.text) for r in c2] == [
        (0, "question two"), (1, "answer")]
    # c3 was ONLY boilerplate -> vanishes entirely
    assert "c3" not in by_c
    # non-boilerplate conversations untouched
    assert len(by_c["c4"]) == 2 and len(by_c["c5"]) == 1
    assert set(out[0].asDict()) == {
        "conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_bad_params(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    with pytest.raises(ValueError):
        prefix_families(t, k=0)
    with pytest.raises(ValueError):
        prefix_families(t, min_family=1)
