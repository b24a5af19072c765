"""Text normalization: step semantics, idempotence, DuckDB parity."""

from __future__ import annotations

import duckdb

from jena_spark.data.normalize import (clean_text, normalize_corpus,
                                       normalize_corpus_sql)

ROWS = [
    (0, "plain ascii text"),
    (1, "bell\x07and\x00nulls"),            # control chars
    (2, "tab\t\truns  and   spaces"),        # ws runs (tabs + spaces)
    (3, "café decomposed"),            # NFC: e + U+0301 -> é
    (4, "bad Ã© mojibake â€™ twice"),        # census only, not fixed
    (5, "keep\nnewlines\tand single tab"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_steps(spark):
    out = {r["doc_id"]: r for r in
           normalize_corpus(_df(spark)).collect()}
    assert out[0]["changed"] is False
    assert out[0]["norm_text"] == "plain ascii text"
    assert out[1]["norm_text"] == "bellandnulls"
    assert out[1]["n_ctl"] == 2
    assert out[2]["norm_text"] == "tab runs and spaces"
    assert out[2]["n_ws_runs"] == 3
    assert out[3]["norm_text"] == "café decomposed"
    assert out[3]["n_before"] == out[3]["n_after"] + 1  # combining mark
    assert out[4]["n_mojibake"] == 2
    assert "Ã©" in out[4]["norm_text"]  # censused, not repaired
    assert out[5]["changed"] is False  # \n and single \t survive


def test_idempotent(spark):
    once = normalize_corpus(_df(spark)).select(
        "doc_id", "norm_text")
    twice = normalize_corpus(once.withColumnRenamed("norm_text", "text"))
    assert twice.where("changed").count() == 0


def test_duckdb_parity(spark):
    got = sorted(normalize_corpus(_df(spark)).collect())
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}')".replace("\x07", "' || chr(7) || '")
        .replace("\x00", "' || chr(0) || '")
        .replace("\t", "' || chr(9) || '")
        .replace("\n", "' || chr(10) || '")
        for i, t in ROWS)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text)"
    want = con.sql(normalize_corpus_sql(cte)).fetchall()
    want = sorted([tuple(r) for r in want])
    got = [tuple(r) for r in got]
    assert got == want
