"""Conversation structural QC + middle-eviction truncation."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.convqc import (
    truncate_middle, truncate_sql, validate_conversations, validate_sql)


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string")


_LINT_TURNS = [
    # clean conversation
    ("ok", 0, "user", "hello"),
    ("ok", 1, "assistant", "hi"),
    ("ok", 2, "user", "thanks"),
    # opens with assistant, then double-assistant
    ("bad1", 0, "assistant", "preemptive"),
    ("bad1", 1, "assistant", "again"),
    # empty turn + orphan tool (tool after user)
    ("bad2", 0, "user", "run it"),
    ("bad2", 1, "tool", "result with no call"),
    ("bad2", 2, "assistant", "   "),
    # legal tool chain: assistant -> tool -> tool
    ("chain", 0, "user", "q"),
    ("chain", 1, "assistant", "calling"),
    ("chain", 2, "tool", "r1"),
    ("chain", 3, "tool", "r2"),
    ("chain", 4, "assistant", "done"),
    # system opener is fine
    ("sys", 0, "system", "be brief"),
    ("sys", 1, "user", "ok"),
]


def test_validate_census(spark):
    out = {r["conv_id"]: r for r in
           validate_conversations(_rows(spark, _LINT_TURNS)).collect()}
    assert (out["ok"]["ok"], out["ok"]["n_turns"]) == (1, 3)
    assert out["bad1"]["bad_first"] == 1
    assert out["bad1"]["n_role_repeats"] == 1
    assert out["bad2"]["n_orphan_tools"] == 1
    assert out["bad2"]["n_empty"] == 1
    assert out["bad2"]["ok"] == 0
    assert (out["chain"]["ok"], out["chain"]["n_role_repeats"]) == (1, 0)
    assert out["sys"]["ok"] == 1


def test_validate_duckdb_parity(spark):
    got = sorted(map(tuple,
                     validate_conversations(_rows(spark, _LINT_TURNS))
                     .collect()))
    vals = ", ".join(f"('{c}', {i}, '{r}', '{t}')"
                     for c, i, r, t in _LINT_TURNS)
    cte = ("SELECT * FROM (VALUES " + vals +
           ") AS v(conv_id, turn_idx, role, text)")
    want = sorted(map(tuple, duckdb.sql(validate_sql(cte)).fetchall()))
    assert got == want


_TRUNC_TURNS = [
    # 5 turns, tokens: 2, 3, 1, 2, 2 (total 10)
    ("c1", 0, "system", "be brief"),
    ("c1", 1, "user", "a b c"),
    ("c1", 2, "assistant", "d"),
    ("c1", 3, "user", "e f"),
    ("c1", 4, "assistant", "g h"),
    # within budget whole
    ("c2", 0, "user", "x"),
    ("c2", 1, "assistant", "y z"),
    # head alone exceeds the budget
    ("c3", 0, "user", "t1 t2 t3 t4 t5 t6 t7 t8"),
    ("c3", 1, "assistant", "tail"),
]


def test_truncate_middle_semantics(spark):
    out = truncate_middle(_rows(spark, _TRUNC_TURNS), budget=7).collect()
    kept = {(r["conv_id"], r["turn_idx"]): r["kept"] for r in out}
    # c1: head=2 tokens, suffix budget 5 -> turns 3,4 (2+2=4 fits;
    # adding turn 2 makes 5 <= 5, fits; adding turn 1 makes 8 > 5)
    assert kept[("c1", 0)] == 1
    assert kept[("c1", 1)] == 0
    assert kept[("c1", 2)] == 1
    assert kept[("c1", 3)] == 1 and kept[("c1", 4)] == 1
    # c2 survives whole
    assert kept[("c2", 0)] == 1 and kept[("c2", 1)] == 1
    # c3: overlong head still kept; tail does not fit (8 > 7 - 8 < 0)
    assert kept[("c3", 0)] == 1 and kept[("c3", 1)] == 0
    row = {r["conv_id"]: r for r in out}["c3"]
    assert row["conv_tokens"] == 9


def test_truncate_keep_first_zero_and_guards(spark):
    d = _rows(spark, _TRUNC_TURNS)
    out = {(r["conv_id"], r["turn_idx"]): r["kept"]
           for r in truncate_middle(d, budget=4, keep_first=0).collect()}
    # c1 pure suffix under 4: turns 3,4 (2+2=4), turn 2 would make 5
    assert out[("c1", 4)] == 1 and out[("c1", 3)] == 1
    assert out[("c1", 2)] == 0 and out[("c1", 0)] == 0
    with pytest.raises(ValueError):
        truncate_middle(d, budget=0)
    with pytest.raises(ValueError):
        truncate_middle(d, budget=5, keep_first=-1)


def test_truncate_duckdb_parity(spark):
    got = sorted(map(tuple,
                     truncate_middle(_rows(spark, _TRUNC_TURNS), budget=7)
                     .collect()))
    vals = ", ".join(f"('{c}', {i}, '{r}', '{t}')"
                     for c, i, r, t in _TRUNC_TURNS)
    cte = ("SELECT * FROM (VALUES " + vals +
           ") AS v(conv_id, turn_idx, role, text)")
    want = sorted(map(tuple, duckdb.sql(truncate_sql(cte, 7)).fetchall()))
    assert got == want
