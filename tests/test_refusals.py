"""Refusal/boilerplate census (jena_spark.data.refusals)."""

from jena_spark.data.refusals import refusal_census


def test_refusal_census_semantics(spark):
    turns = spark.createDataFrame(
        [
            # c1: one refusal out of two assistant turns
            ("c1", 0, "user", "please write me a poem"),
            ("c1", 1, "assistant",
             "As an AI language model, I cannot help with that."),
            ("c1", 2, "user", "ok then just a haiku"),
            ("c1", 3, "assistant", "cherry blossoms fall"),
            # c2: clean assistant turns; 'i cannot wait' must NOT match
            # (battery requires a refusal verb after the modal)
            ("c2", 0, "user", "are you excited"),
            ("c2", 1, "assistant", "i cannot wait to see the results"),
            # c3: the USER writes refusal-shaped text - ignored
            ("c3", 0, "user", "i'm sorry, but i cannot provide that"),
            ("c3", 1, "assistant", "no problem, here is the answer"),
            # c4: no assistant turns at all
            ("c4", 0, "user", "hello"),
            ("c4", 1, "tool", "i am unable to help right now"),
            # c5: policy-violation boilerplate, mixed case
            ("c5", 0, "assistant", "That VIOLATES my guidelines."),
        ],
        "conv_id string, turn_idx int, role string, text string")

    out = {r.conv_id: r for r in refusal_census(turns).collect()}
    assert set(out) == {"c1", "c2", "c3", "c4", "c5"}
    c1 = out["c1"]
    assert (c1.n_assistant_turns, c1.n_refusals, c1.refusal_bp, c1.keep) \
        == (2, 1, 5000, 0)
    assert out["c2"].n_refusals == 0 and out["c2"].keep == 1
    assert out["c3"].n_refusals == 0 and out["c3"].keep == 1
    c4 = out["c4"]
    assert (c4.n_assistant_turns, c4.refusal_bp, c4.keep) == (0, 0, 1)
    assert out["c5"].n_refusals == 1 and out["c5"].refusal_bp == 10000

    # tolerance: max_refusals=1 keeps the single-refusal conversations
    tol = {r.conv_id: r.keep for r in
           refusal_census(turns, max_refusals=1).collect()}
    assert tol["c1"] == 1 and tol["c5"] == 1


def test_refusal_census_is_single_aggregation(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "assistant", "as an ai i refuse")],
        "conv_id string, turn_idx int, role string, text string")
    plan = refusal_census(turns)._jdf.queryExecution().executedPlan().toString()
    # map-only battery + one hash aggregate: a single conv_id exchange,
    # no joins, no Python
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan
    assert "Python" not in plan
