"""Bradley-Terry integer MM — behavior + DuckDB-unrolled parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.ranking import bt_scores, bt_scores_sql

# a > b > c in strength; d never wins; a-c never played each other
_MATCHES = (
    [("a", "b")] * 6 + [("b", "a")] * 2 +
    [("b", "c")] * 5 + [("c", "b")] * 1 +
    [("a", "d")] * 3 + [("b", "d")] * 2 + [("c", "d")] * 2
)


def _df(spark, rows=_MATCHES):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_bt_ordering_and_counts(spark):
    out = {r["player"]: r for r in bt_scores(_df(spark), n_iter=5).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    # strengths must recover the designed order
    assert (out["a"]["score_micro"] > out["b"]["score_micro"]
            > out["c"]["score_micro"] > out["d"]["score_micro"])
    # the never-winner's MLE strength is 0
    assert out["d"]["score_micro"] == 0 and out["d"]["wins"] == 0
    assert out["a"]["wins"] == 9 and out["a"]["games"] == 11
    assert out["d"]["games"] == 7
    # mean-1 normalization in micro units (floor loses < P units)
    total = sum(r["score_micro"] for r in out.values())
    assert 4_000_000 - 4 <= total <= 4_000_000


def test_bt_duckdb_unrolled_parity(spark):
    got = sorted(map(tuple, bt_scores(_df(spark), n_iter=4).collect()))
    vals = ", ".join(f"('{w}', '{l}')" for w, l in _MATCHES)
    cte = "SELECT * FROM (VALUES " + vals + ") AS v(winner, loser)"
    want = sorted(map(tuple, duckdb.sql(bt_scores_sql(cte, 4)).fetchall()))
    assert got == want


def test_bt_single_pair_closed_form(spark):
    # one pair, 3:1 — after convergence s_a/s_b -> 3; with mean-1
    # normalization s_a = 1.5, s_b = 0.5
    out = {r["player"]: r["score_micro"] for r in
           bt_scores(_df(spark, [("a", "b")] * 3 + [("b", "a")]),
                     n_iter=8).collect()}
    assert out["a"] == pytest.approx(1_500_000, abs=2_000)
    assert out["b"] == pytest.approx(500_000, abs=2_000)


def test_bt_rejects_bad_iter(spark):
    with pytest.raises(ValueError):
        bt_scores(_df(spark), n_iter=0)
