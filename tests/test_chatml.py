"""ChatML rendering: exact template output + loss-mask span offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark.data.chatml import render_chat


def _rows(spark, turns):
    return spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string,"
               " tool string")


def test_render_exact_template_and_spans(spark):
    t = _rows(spark, [
        ("c", 0, "user", "hello", None),
        ("c", 1, "assistant", "hi there", None),
        ("c", 2, "tool", "ran ok", "python"),
        ("c", 3, "assistant", "done", None),
    ])
    out = {r["turn_idx"]: r for r in render_chat(t).collect()}
    assert set(out) == {1, 3}
    expected = (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>tool:python\nran ok<|im_end|>\n"
        "<|im_start|>assistant\ndone<|im_end|>\n")
    for r in out.values():
        assert r["rendered"] == expected
        assert r["n_chars"] == len(expected)
    # offsets are 0-based end-exclusive spans of the turn TEXT
    r1 = out[1]
    assert expected[r1["mask_start"]:r1["mask_end"]] == "hi there"
    r3 = out[3]
    assert expected[r3["mask_start"]:r3["mask_end"]] == "done"


def test_spans_correct_for_repeated_text(spark):
    # identical assistant texts — offsets must come from prefix sums,
    # not string search
    t = _rows(spark, [
        ("c", 0, "assistant", "same", None),
        ("c", 1, "user", "q", None),
        ("c", 2, "assistant", "same", None),
    ])
    rows = sorted(render_chat(t).collect(), key=lambda r: r["turn_idx"])
    rendered = rows[0]["rendered"]
    s0 = rendered[rows[0]["mask_start"]:rows[0]["mask_end"]]
    s2 = rendered[rows[1]["mask_start"]:rows[1]["mask_end"]]
    assert s0 == s2 == "same"
    assert rows[0]["mask_start"] < rows[1]["mask_start"]


def test_spans_on_session_transcripts(spark, transcripts_df):
    # every emitted span must cut exactly the turn's text
    out = render_chat(transcripts_df)
    bad = out.where(
        F.expr("substring(rendered, mask_start + 1,"
               " mask_end - mask_start)")
        != F.expr("substring(rendered, mask_start + 1,"
                  " mask_end - mask_start)"))
    joined = (out.alias("o")
              .join(transcripts_df.alias("t"),
                    ["conv_id", "turn_idx"])
              .where(F.expr("substring(o.rendered, o.mask_start + 1,"
                            " o.mask_end - o.mask_start)")
                     != F.col("t.text")))
    assert bad.count() == 0 and joined.count() == 0
    # one rendering per conversation, shared by its rows
    per_conv = out.groupBy("conv_id").agg(
        F.count_distinct("rendered").alias("k"),
        F.count_distinct("n_chars").alias("kc"))
    assert per_conv.where((F.col("k") != 1) | (F.col("kc") != 1)) \
        .count() == 0
