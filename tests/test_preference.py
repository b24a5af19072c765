"""Preference-pair construction and agent-trajectory curation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jena_spark.data.preference import preference_pairs
from jena_spark.data.trajectory import (tool_census, trajectory_verdicts)


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_preference_pairs_basic(spark):
    # same prompt "tell me" answered in three conversations with
    # responses of different lexical diversity
    t = _rows(spark, [
        ("c1", 0, "user", "tell me"),
        ("c1", 1, "assistant", "a b c d"),          # 4/4 -> 10000
        ("c2", 0, "user", "tell me"),
        ("c2", 1, "assistant", "a a a a"),          # 1/4 -> 2500
        ("c3", 0, "user", "tell me"),
        ("c3", 1, "assistant", "a b a b"),          # 2/4 -> 5000
        # a prompt with a single response: no pair
        ("c4", 0, "user", "solo"),
        ("c4", 1, "assistant", "x y"),
        # assistant turn NOT preceded by a user turn: not a candidate
        ("c5", 0, "assistant", "orphan"),
        ("c5", 1, "tool", "out"),
        ("c5", 2, "assistant", "after tool"),
    ])
    out = preference_pairs(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r["prompt"] == "tell me"
    assert r["prompt_fp"] == _md5("tell me")
    assert r["chosen"] == "a b c d"
    assert r["rejected"] == "a a a a"
    assert (r["chosen_bp"], r["rejected_bp"], r["margin_bp"]) == (
        10000, 2500, 7500)
    assert r["n_responses"] == 3


def test_preference_pairs_tie_and_margin(spark):
    # two responses with EQUAL score: margin 0 -> excluded at the
    # default min_margin_bp=1, included at 0 with md5-deterministic
    # chosen/rejected assignment
    a, b = "p q", "r s"   # both 10000
    t = _rows(spark, [
        ("c1", 0, "user", "tie"), ("c1", 1, "assistant", a),
        ("c2", 0, "user", "tie"), ("c2", 1, "assistant", b),
    ])
    assert preference_pairs(t).count() == 0
    out = preference_pairs(t, min_margin_bp=0).collect()
    assert len(out) == 1
    hi, lo = sorted([a, b], key=_md5, reverse=True)
    assert (out[0]["chosen"], out[0]["rejected"]) == (hi, lo)
    assert out[0]["margin_bp"] == 0


def test_preference_pairs_duplicate_responses_and_partitioning(spark):
    # the same response text repeated many times must not inflate
    # n_responses, and the result is partitioning-invariant
    t = _rows(spark, [
        ("c%d" % i, 0, "user", "dup") for i in range(6)
    ] + [
        ("c%d" % i, 1, "assistant", "w w" if i < 5 else "u v")
        for i in range(6)
    ])
    out = preference_pairs(t).collect()
    assert len(out) == 1
    assert out[0]["n_responses"] == 2
    assert out[0]["chosen"] == "u v"      # 10000 vs 5000
    again = preference_pairs(t.repartition(7)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_preference_pairs_rejects_negative_margin(spark):
    t = _rows(spark, [("c", 0, "user", "x"), ("c", 1, "assistant", "y")])
    try:
        preference_pairs(t, min_margin_bp=-1)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "min_margin_bp" in str(e)


def test_trajectory_verdicts(spark):
    t = spark.createDataFrame([
        # complete: ends on assistant
        ("good", 0, "user", "q", None),
        ("good", 1, "tool", "out", "python"),
        ("good", 2, "assistant", "a", None),
        # truncated: ends on a tool turn
        ("trunc", 0, "user", "q", None),
        ("trunc", 1, "assistant", "a", None),
        ("trunc", 2, "tool", "out", "sql"),
        # no assistant content at all
        ("empty", 0, "user", "q", None),
        ("empty", 1, "user", "q2", None),
    ], "conv_id string, turn_idx int, role string, text string, tool string")
    out = {r["conv_id"]: r for r in trajectory_verdicts(t).collect()}
    g = out["good"]
    assert (g["n_turns"], g["n_user"], g["n_assistant"], g["n_tool"],
            g["last_role"], g["keep"]) == (3, 1, 1, 1, "assistant", 1)
    assert (out["trunc"]["last_role"], out["trunc"]["keep"]) == ("tool", 0)
    assert (out["empty"]["last_role"], out["empty"]["keep"]) == ("user", 0)


def test_tool_census(spark):
    t = spark.createDataFrame([
        ("a", 0, "tool", "x", "python"),
        ("a", 1, "tool", "y", "python"),
        ("a", 2, "tool", "z", "sql"),
        ("b", 0, "tool", "w", "python"),
        ("b", 1, "assistant", "python mention, not a call", None),
        # tool turn with a NULL tool name: excluded
        ("b", 2, "tool", "v", None),
    ], "conv_id string, turn_idx int, role string, text string, tool string")
    out = {r["tool"]: r for r in tool_census(t).collect()}
    assert set(out) == {"python", "sql"}
    assert (out["python"]["n_calls"], out["python"]["n_convs"]) == (3, 2)
    assert (out["sql"]["n_calls"], out["sql"]["n_convs"]) == (1, 1)


def test_preference_pairs_oracle_parity_via_duckdb(spark):
    """Row-for-row parity of the Spark operator and its DuckDB twin
    over the derived transcripts at sf0.001 (the same comparison the
    driver harness runs at sf0.01)."""
    import duckdb

    from jena_spark.data.preference import preference_pairs_sql
    from jena_spark.data.transcripts import transcripts_cte, transcripts_df

    sf = "/root/testdata/sf0.001"
    got = preference_pairs(transcripts_df(spark, sf), min_margin_bp=500)
    cols = got.columns
    got_rows = sorted(map(tuple, got.collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute(
        preference_pairs_sql(transcripts_cte(), min_margin_bp=500)).df()
    exp_rows = sorted(map(tuple, exp[cols].itertuples(index=False)))
    assert len(got_rows) > 0
    assert got_rows == exp_rows
