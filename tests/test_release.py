"""Conversation release gate (jena_spark.data.release)."""

import pytest

from jena_spark.data.release import (curate_conversations,
                                     curate_conversations_sql)

TURNS = [
    # clean: ship
    ("ok1", 0, "user", "hello there"), ("ok1", 1, "assistant", "hi, human"),
    # exact duplicates: dup1 wins (keep-first), dup2 drops
    ("dup1", 0, "user", "same q"), ("dup1", 1, "assistant", "same a"),
    ("dup2", 0, "user", "same q"), ("dup2", 1, "assistant", "same a"),
    # structural: opens with assistant
    ("bad", 0, "assistant", "unprompted"), ("bad", 1, "user", "what"),
    # stuck loop: text run of 5 > max_run=3 (roles alternate, so the
    # structure rule stays green and 'loops' is the first failure)
    ("loop", 0, "user", "same"), ("loop", 1, "assistant", "same"),
    ("loop", 2, "user", "same"), ("loop", 3, "assistant", "same"),
    ("loop", 4, "user", "same"),
    # refusal
    ("ref", 0, "user", "do the thing"),
    ("ref", 1, "assistant", "I cannot help with that"),
    # PII: kept but scrub
    ("pii", 0, "user", "mail me at bob@example.org"),
    ("pii", 1, "assistant", "done"),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string"


def test_verdicts_and_actions(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    out = {r.conv_id: r for r in curate_conversations(t).collect()}
    assert len(out) == 7
    assert (out["ok1"].kept, out["ok1"].action, out["ok1"].reason) == \
        (1, "ship", None)
    assert (out["dup1"].kept, out["dup1"].action) == (1, "ship")
    assert (out["dup2"].kept, out["dup2"].reason) == (0, "exact_dup")
    assert (out["bad"].kept, out["bad"].reason) == (0, "structure")
    assert (out["loop"].kept, out["loop"].reason) == (0, "loops")
    assert out["loop"].structure_ok == 1
    assert (out["ref"].kept, out["ref"].reason) == (0, "refusal")
    assert (out["pii"].kept, out["pii"].action, out["pii"].reason) == \
        (1, "scrub", None)
    assert out["pii"].pii_clean == 0


def test_duckdb_parity(spark):
    import duckdb

    t = spark.createDataFrame(TURNS, SCHEMA)
    got = sorted(map(tuple, curate_conversations(t).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE tr(conv_id VARCHAR, turn_idx INT,"
            " role VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?, ?)", TURNS)
    want = sorted(map(tuple, con.sql(
        curate_conversations_sql("SELECT * FROM tr")).fetchall()))
    assert got == want


def test_loosened_knobs(spark):
    t = spark.createDataFrame(TURNS, SCHEMA)
    out = {r.conv_id: r
           for r in curate_conversations(t, max_run=5,
                                         max_refusals=1).collect()}
    assert out["loop"].kept == 1
    assert out["ref"].kept == 1
