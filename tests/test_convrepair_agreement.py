"""Conversation repair (role-run merging) + Cohen's kappa agreement."""

from __future__ import annotations

from datetime import datetime

import duckdb

from jena_spark.data.agreement import cohens_kappa, cohens_kappa_sql
from jena_spark.data.convrepair import merge_role_runs, merge_role_runs_sql


def _ts(s):
    return datetime(2025, 3, 1, 10, 0, s)


TURNS = [
    ("c", 0, "user", "hi", None, _ts(0)),
    ("c", 1, "user", "are you there", None, _ts(5)),
    ("c", 2, "assistant", "yes", None, _ts(9)),
    ("c", 3, "tool", "ran", "python", _ts(12)),
    ("c", 4, "tool", "ok", None, _ts(14)),
    ("c", 5, "user", "thanks", None, _ts(20)),
    ("d", 0, "assistant", "solo", None, _ts(0)),
]


def _turns(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string,"
               " tool string, ts timestamp")


def test_merge_runs(spark):
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in merge_role_runs(_turns(spark)).collect()}
    assert len(got) == 5
    r0 = got[("c", 0)]
    assert r0["role"] == "user" and r0["text"] == "hi\nare you there"
    assert r0["n_merged"] == 2 and r0["ts"] == _ts(0)
    r2 = got[("c", 2)]
    assert r2["role"] == "tool" and r2["text"] == "ran\nok"
    assert r2["tool"] == "python"          # min skips the NULL
    # roles alternate after repair
    assert [got[("c", i)]["role"] for i in range(4)] == \
        ["user", "assistant", "tool", "user"]
    assert got[("d", 0)]["n_merged"] == 1


def test_merge_runs_duckdb_parity(spark, transcripts_df):
    got = sorted(tuple(r) for r in
                 merge_role_runs(transcripts_df).collect())
    pdf = transcripts_df.select("conv_id", "turn_idx", "role", "text",
                                "tool", "ts").toPandas()
    con = duckdb.connect()
    con.register("ttv", pdf)
    want = sorted(tuple(r) for r in con.sql(
        merge_role_runs_sql("SELECT * FROM ttv")).fetchall())
    assert got == want


def _flags(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, flag boolean")


def test_kappa_known_value(spark):
    # classic contingency: a=20 b=5 c=10 d=15, n=50
    rows_l, rows_r, i = [], [], 0
    for a, lf, rf in ((20, True, True), (5, True, False),
                      (10, False, True), (15, False, False)):
        for _ in range(a):
            rows_l.append((i, lf)); rows_r.append((i, rf)); i += 1
    out = cohens_kappa(_flags(spark, rows_l), _flags(spark, rows_r)) \
        .collect()[0]
    assert (out["n"], out["n11"], out["n00"]) == (50, 20, 15)
    assert out["po_ppm"] == 700_000
    # kappa = (50*35 - (25*30 + 25*20)) / (2500 - 1250) = 500/1250 = .4
    assert out["kappa_ppm"] == 400_000


def test_kappa_negative_and_degenerate(spark):
    # perfect disagreement on balanced labels -> kappa = -1
    l = _flags(spark, [(1, True), (2, False)])
    r = _flags(spark, [(1, False), (2, True)])
    out = cohens_kappa(l, r).collect()[0]
    assert out["kappa_ppm"] == -1_000_000
    # one rater constant True AND the other constant True -> den 0
    out2 = cohens_kappa(_flags(spark, [(1, True), (2, True)]),
                        _flags(spark, [(1, True), (2, True)])).collect()[0]
    assert out2["kappa_ppm"] is None and out2["po_ppm"] == 1_000_000


def test_kappa_duckdb_parity(spark):
    import random
    rng = random.Random(7)
    rows_l = [(i, rng.random() < 0.3) for i in range(200)]
    rows_r = [(i, (f if rng.random() < 0.7 else not f))
              for i, f in rows_l]
    got = tuple(cohens_kappa(_flags(spark, rows_l),
                             _flags(spark, rows_r)).collect()[0])
    mk = lambda rows: ("SELECT * FROM (VALUES " + ", ".join(
        f"({i}, {str(f).upper()})" for i, f in rows)
        + ") AS v(doc_id, flag)")
    con = duckdb.connect()
    want = tuple(con.sql(
        cohens_kappa_sql(mk(rows_l), mk(rows_r))).fetchall()[0])
    assert got == want
