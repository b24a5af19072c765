"""Gopher rule battery + C4 filters (``data/filters.py``): every rule
exercised at its boundary on hand-built documents."""

from __future__ import annotations

import pytest

from jena_spark.data.filters import c4_filters, gopher_rules

GOOD = ("The quick brown fox jumps over the lazy dog and runs to be "
        "free of that fence with great joy. " * 3)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD),                                     # passes everything
        (1, "short text the be of."),                  # too few words
        (2, "a " * 60),                                # mean word len < 3
        (3, ("the be of and that have with to " * 8) + "# " * 10),  # symbols
        (4, "\n".join(["- bullet point here we go the be"] * 10)),   # bullets
        (5, "\n".join(["the be of and that ..."] * 10)),  # ellipsis lines
        (6, ("123 456 789 " * 20) + "the be"),         # alpha frac low
        (7, "x y z " * 30),                            # no required stops
        (8, ""),                                       # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules(docs):
    out = {r["doc_id"]: r for r in
           gopher_rules(docs, min_words=20).collect()}
    assert out[0]["gopher_ok"]
    assert all(out[0][k] for k in
               ("words_ok", "mwl_ok", "symbol_ok", "bullet_ok",
                "ellipsis_ok", "alpha_ok", "stops_ok"))
    assert not out[1]["words_ok"]
    assert not out[2]["mwl_ok"] and out[2]["mean_word_len"] < 3
    assert not out[3]["symbol_ok"] and out[3]["symbol_ratio"] > 0.1
    assert not out[4]["bullet_ok"] and out[4]["bullet_frac"] == 1.0
    assert not out[5]["ellipsis_ok"] and out[5]["ellipsis_frac"] == 1.0
    assert not out[6]["alpha_ok"] and out[6]["alpha_frac"] < 0.8
    assert not out[7]["stops_ok"] and out[7]["n_required_stops"] == 0
    assert out[8]["n_words"] == 0 and not out[8]["gopher_ok"]
    # distinct-membership count, not occurrence count ("have" is the
    # one GOPHER_STOPS member absent from the fixture text)
    assert out[0]["n_required_stops"] == 7


def test_c4_filters(spark):
    rows = [
        # 3 good sentences + a dropped no-punct line + a dropped
        # short line + a dropped javascript line
        (0, "This is a fine sentence with words.\n"
            "another good long sentence right here!\n"
            "and a third one to be safe?\n"
            "no terminal punctuation here\n"
            "Too short.\n"
            "Enable JavaScript to view this page."),
        (1, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
            "Another fine sentence sits right here.\n" * 4),  # lorem ipsum
        (2, "A page with code = { nope }.\n" +
            "This sentence would otherwise be fine and long.\n" * 4),
        (3, "One lonely sentence that is long enough."),       # < sentences
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           c4_filters(docs, min_sentences=3).collect()}
    assert out[0]["c4_ok"] and out[0]["n_kept"] == 3
    assert out[0]["clean_text"].count("\n") == 2
    assert "javascript" not in out[0]["clean_text"].lower()
    assert "no terminal" not in out[0]["clean_text"]
    assert not out[1]["c4_ok"]          # lorem ipsum page kill
    assert out[1]["n_kept"] > 0         # lines were fine; page was not
    assert not out[2]["c4_ok"]          # curly brace page kill
    assert not out[3]["c4_ok"] and out[3]["n_sentences"] == 1
    assert out[4]["n_kept"] == 0 and out[4]["clean_text"] == ""


def test_gopher_repetition(spark):
    from jena_spark.data.filters import gopher_repetition

    rows = [
        (0, "same line\nsame line\nother line here"),   # dup lines
        (1, "p one\n\np one\n\np two"),                 # dup paragraphs
        (2, "a b a b a b"),                             # hot bigram
        (3, "x y z w v x y z w v"),                     # dup 5-gram
        (4, " ".join(f"w{i:02d}" for i in range(40))),    # all distinct
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}

    # doc 0: 3 lines, 1 repeated once -> dup_line_frac = 1/3; the
    # repeat re-spends len("same line")=9 chars of a 35-char doc
    assert out[0]["dup_line_frac"] == round(1 / 3, 6)
    assert out[0]["dup_line_char_frac"] == round(9 / 35, 6)
    assert out[0]["dup_para_frac"] == 0.0   # one paragraph, no repeat

    # doc 1: 3 paragraphs, one repeated once
    assert out[1]["dup_para_frac"] == round(1 / 3, 6)
    assert out[1]["dup_para_char_frac"] == round(5 / 19, 6)

    # doc 2: bigrams of "a b a b a b": "a b"x3, "b a"x2 ->
    # top_2 = 3*3 = 9 chars of an 11-char doc
    assert out[2]["top_2gram_char_frac"] == round(9 / 11, 6)
    assert not out[2]["rep_ok"]

    # doc 3: "x y z w v" (len 9) occurs twice among the 6 5-grams ->
    # dup_5 = 2*9 = 18 chars of a 19-char doc
    assert out[3]["dup_5gram_char_frac"] == round(18 / 19, 6)
    assert not out[3]["rep_ok"]

    # doc 4: nothing repeats at any granularity — every dup signal is
    # zero; top_{n}gram signals count the (c=1) top gram's chars, so
    # they are small-but-nonzero by the paper's definition
    assert out[4]["rep_ok"]
    for c in out[4].asDict():
        if c.startswith("dup_") and c.endswith("_frac"):
            assert out[4][c] == 0.0
    assert 0 < out[4]["top_2gram_char_frac"] < 0.2

    # doc 5: empty doc -> all-zero signals, passes
    assert out[5]["rep_ok"] and out[5]["dup_line_frac"] == 0.0
