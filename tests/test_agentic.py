"""Tool-loop detection: run-length census + keep verdicts."""

from __future__ import annotations

from jena_spark.data.agentic import detect_loops


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string")


def test_detect_loops_runs_and_verdict(spark):
    t = _rows(spark, [
        # healthy conversation: no consecutive repeats
        ("ok", 0, "user", "a"), ("ok", 1, "assistant", "b"),
        ("ok", 2, "user", "a"),  # same text, not consecutive
        # stuck loop: 5x the same tool output
        ("loop", 0, "user", "go"),
        ("loop", 1, "tool", "ERR timeout"), ("loop", 2, "tool", "ERR timeout"),
        ("loop", 3, "tool", "ERR timeout"), ("loop", 4, "tool", "ERR timeout"),
        ("loop", 5, "tool", "ERR timeout"),
        ("loop", 6, "assistant", "gave up"),
        # boundary: run of exactly max_run
        ("edge", 0, "tool", "x"), ("edge", 1, "tool", "x"),
        ("edge", 2, "tool", "x"), ("edge", 3, "user", "y"),
    ])
    out = {r["conv_id"]: r for r in detect_loops(t, max_run=3).collect()}
    assert (out["ok"]["n_turns"], out["ok"]["max_run"],
            out["ok"]["n_repeated"], out["ok"]["keep"]) == (3, 1, 0, 1)
    assert (out["loop"]["max_run"], out["loop"]["n_repeated"],
            out["loop"]["keep"]) == (5, 4, 0)
    assert (out["edge"]["max_run"], out["edge"]["keep"]) == (3, 1)


def test_detect_loops_by_role_and_partition_invariance(spark):
    t = _rows(spark, [
        ("c", i, "assistant" if 2 <= i <= 6 else "user", f"t{i}")
        for i in range(9)
    ])
    out = detect_loops(t, max_run=4, value="role").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["max_run"], r["n_repeated"], r["keep"]) == (5, 6, 0)
    again = detect_loops(t.repartition(5), max_run=4, value="role")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out))


def test_tool_call_census(spark):
    from jena_spark.data.agentic import tool_call_census

    rows = [
        # conv a: one clean call, one non-call turn
        ("a", '{"q": "search", "retries": 1}'),
        ("a", None),
        # conv b: malformed + missing key + clean
        ("b", '{"q": "x"'),                      # truncated -> bad json
        ("b", '{"retries": 2}'),                 # parses, q missing
        ("b", '{"q": null}'),                    # null-valued counts missing
        ("b", '{"q": "ok"}'),
        # conv c: no calls at all
        ("c", None),
    ]
    t = spark.createDataFrame(rows, "conv_id string, args_json string")
    out = {r["conv_id"]: r for r in tool_call_census(t).collect()}
    assert (out["a"]["n_calls"], out["a"]["n_ok"], out["a"]["all_ok"]) \
        == (1, 1, 1)
    b = out["b"]
    assert (b["n_calls"], b["n_bad_json"], b["n_missing"], b["n_ok"],
            b["all_ok"]) == (4, 1, 2, 1, 0)
    assert (out["c"]["n_calls"], out["c"]["all_ok"]) == (0, 1)


def test_tool_call_census_duckdb_parity(spark):
    import duckdb

    from jena_spark.data.agentic import tool_call_census, tool_call_census_sql

    rows = [
        ("a", '{"q": "search"}'), ("a", '{"q": "y", "extra": [1,2]}'),
        ("b", 'not json at all'), ("b", '{"q": "z"}'),
        ("b", '{}'),
    ]
    t = spark.createDataFrame(rows, "conv_id string, args_json string")
    got = sorted(map(tuple, tool_call_census(t).collect()))
    vals = ", ".join("('%s', '%s')" % (c, a.replace("'", "''"))
                     for c, a in rows)
    cte = ("SELECT * FROM (VALUES " + vals
           + ") AS v(conv_id, args_json)")
    want = sorted(map(tuple,
                      duckdb.sql(tool_call_census_sql(cte)).fetchall()))
    assert got == want
