"""Fuzzy whole-conversation near-dedup (token-set Jaccard)."""

from __future__ import annotations

from jena_spark.data.conv_dedup import (
    conversation_token_sets, near_dedup_conversations)


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string")


def test_token_sets_dedupe_and_blank_guard(spark):
    t = _rows(spark, [
        ("a", 0, "user", "x y  x"),     # duplicate token, double space
        ("a", 1, "assistant", "y z"),
        ("b", 0, "user", "   "),        # all-blank conversation
    ])
    got = {(r["doc"], r["tok"]) for r in conversation_token_sets(t).collect()}
    assert got == {("a", "x"), ("a", "y"), ("a", "z")}


def test_near_dedup_greedy_election(spark):
    # a and b share 3 of 4 tokens (J = 3/5 = 0.6); b and c identical
    # (J = 1.0); d disjoint
    t = _rows(spark, [
        ("a", 0, "user", "w x y z"),
        ("b", 0, "user", "w x y q"),
        ("c", 0, "user", "q w"), ("c", 1, "assistant", "x y"),
        ("d", 0, "user", "only these tokens"),
    ])
    out = {r["conv_id"]: r for r in
           near_dedup_conversations(t, threshold_pm=600).collect()}
    assert out["a"]["keep"] == 1
    # b doomed by a (0.6 >= 0.6 — integer boundary inclusive)
    assert (out["b"]["keep"], out["b"]["n_smaller_dups"]) == (0, 1)
    # c doomed by b (J=1.0); a∩c = {w,x,y} of 5 -> 0.6, also dooms
    assert (out["c"]["keep"], out["c"]["n_smaller_dups"]) == (0, 2)
    assert out["d"]["keep"] == 1
    assert out["a"]["n_tokens"] == 4

    # just above the boundary: 0.6 < 0.601 -> a/b pair dissolves
    strict = {r["conv_id"]: r for r in
              near_dedup_conversations(t, threshold_pm=601).collect()}
    assert strict["b"]["keep"] == 1
    assert strict["c"]["n_smaller_dups"] == 1  # only b


def test_near_dedup_blank_and_maxdf(spark):
    t = _rows(spark, [
        ("e1", 0, "user", " "),
        ("e2", 0, "user", ""),
        ("f", 0, "user", "common common2 rare1"),
        ("g", 0, "user", "common common2 rare2"),
        ("h", 0, "user", "common common2 rare3"),
    ])
    out = {r["conv_id"]: r for r in
           near_dedup_conversations(t, threshold_pm=500).collect()}
    # empty conversations never pair (not Jaccard-1 with each other)
    assert out["e1"]["keep"] == 1
    assert (out["e1"]["n_tokens"], out["e2"]["keep"]) == (0, 1)
    # f/g/h pair via the two shared tokens (J = 2/4 = 0.5)
    assert (out["g"]["keep"], out["h"]["n_smaller_dups"]) == (0, 2)
    # capping df<=2 drops 'common'/'common2' (df=3): no pairs survive
    capped = {r["conv_id"]: r for r in
              near_dedup_conversations(t, threshold_pm=500,
                                       max_df=2).collect()}
    assert all(v["keep"] == 1 for v in capped.values())
    assert capped["f"]["n_tokens"] == 1  # only the rare token remains


def test_near_dedup_rejects_bad_threshold(spark):
    t = _rows(spark, [("c", 0, "user", "x")])
    for bad in (0, -5, 1001):
        try:
            near_dedup_conversations(t, threshold_pm=bad)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "threshold_pm" in str(e)


def test_near_dedup_oracle_parity_and_partitioning(spark):
    import duckdb

    from jena_spark.data.conv_dedup import near_dedup_conversations_sql
    from jena_spark.data.transcripts import transcripts_cte, transcripts_df

    sf = "/root/testdata/sf0.001"
    turns = transcripts_df(spark, sf)
    got = near_dedup_conversations(turns, threshold_pm=650)
    cols = got.columns
    got_rows = sorted(map(tuple, got.collect()))
    assert len(got_rows) > 0
    assert any(r[3] == 0 for r in got_rows), "fixture should have near-dups"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute(
        near_dedup_conversations_sql(transcripts_cte(),
                                     threshold_pm=650)).df()
    exp_rows = sorted(map(tuple, exp[cols].itertuples(index=False)))
    assert got_rows == exp_rows
    again = near_dedup_conversations(turns.repartition(13),
                                     threshold_pm=650)
    assert sorted(map(tuple, again.collect())) == got_rows
