"""Classifier evaluation: confusion, P/R/F1, NULL conventions, parity."""

from __future__ import annotations

import duckdb

from jena_spark.data.evaluation import classifier_eval, classifier_eval_sql


def _f(spark, rows, col):
    return spark.createDataFrame(rows, f"doc_id long, {col} boolean")


def test_known_values(spark):
    # tp=3 fp=1 fn=2 tn=4
    pred, gold, i = [], [], 0
    for k, p, g in ((3, True, True), (1, True, False),
                    (2, False, True), (4, False, False)):
        for _ in range(k):
            pred.append((i, p)); gold.append((i, g)); i += 1
    out = classifier_eval(_f(spark, pred, "pred"),
                          _f(spark, gold, "label")).collect()[0]
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (3, 1, 2, 4)
    assert out["accuracy_ppm"] == 700_000
    assert out["precision_ppm"] == 750_000
    assert out["recall_ppm"] == 600_000
    # f1 = 2*3/(6+1+2) = 6/9 — one floor, not floor-of-floors
    assert out["f1_ppm"] == 666_666


def test_null_conventions(spark):
    # never predicts positive -> precision NULL, recall 0
    out = classifier_eval(
        _f(spark, [(1, False), (2, False)], "pred"),
        _f(spark, [(1, True), (2, False)], "label")).collect()[0]
    assert out["precision_ppm"] is None
    assert out["recall_ppm"] == 0
    assert out["f1_ppm"] == 0


def test_duckdb_parity(spark):
    import random
    rng = random.Random(3)
    pred = [(i, rng.random() < 0.4) for i in range(300)]
    gold = [(i, (p if rng.random() < 0.8 else not p)) for i, p in pred]
    got = tuple(classifier_eval(_f(spark, pred, "pred"),
                                _f(spark, gold, "label")).collect()[0])
    mk = lambda rows, c: ("SELECT * FROM (VALUES " + ", ".join(
        f"({i}, {str(v).upper()})" for i, v in rows) + f") AS v(doc_id, {c})")
    con = duckdb.connect()
    want = tuple(con.sql(classifier_eval_sql(
        mk(pred, "pred"), mk(gold, "label"))).fetchall()[0])
    assert got == want
