"""Naive-Bayes quality classifier (``data/classifier.py``)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.data.classifier import (  # noqa: E402
    nb_quality_scores,
    nb_score,
    nb_train,
)

DOCS = [
    (1, "good clean prose with structure and meaning throughout", 1),
    (2, "more good prose carefully written with meaning and clarity", 1),
    (3, "spam spam buy now click here spam buy spam", 0),
    (4, "click buy now spam offer click click buy", 0),
    (5, "carefully structured prose with clarity and meaning", 1),
    (6, "buy spam offer now here click spam", 0),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, label int")


def test_nb_separates_training_classes(spark):
    d = _docs(spark)
    out = {r.doc_id: r for r in
           nb_quality_scores(d, d, buckets=128).collect()}
    for doc_id, _, label in DOCS:
        assert out[doc_id].pred == label, doc_id
        assert (out[doc_id].score_unats > 0) == bool(label)


def test_nb_weights_shape_and_prior(spark):
    d = _docs(spark)
    w = nb_train(d, buckets=64).collect()
    assert len(w) == 65  # 64 dense buckets + the prior row
    buckets = {r.bucket for r in w}
    assert buckets == set(range(64)) | {-1}
    prior = [r.w_unats for r in w if r.bucket == -1][0]
    # 3 pos vs 3 neg docs -> ln(1) = 0
    assert prior == 0


def test_nb_empty_doc_scores_bare_prior(spark):
    labeled = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "gamma delta", 0), (3, "alpha", 1)],
        "doc_id long, text string, label int")
    target = spark.createDataFrame([(9, "")], "doc_id long, text string")
    w = nb_train(labeled, buckets=32)
    row = nb_score(target, w, buckets=32).collect()[0]
    expected_prior = math.floor((math.log(2.0) - math.log(1.0)) * 1e4 + 0.5)
    assert row.score_unats == expected_prior
    assert row.pred == 1  # prior alone favors the majority class


def test_nb_score_plan_broadcasts_weights(spark):
    """Scale invariant: the corpus side never shuffles text — the
    weight dim joins broadcast and the only hash-partitioned Exchange
    is the per-doc sum."""
    d = _docs(spark)
    w = nb_train(d, buckets=64)
    plan = nb_score(d, w, buckets=64)._jdf.queryExecution() \
        .executedPlan().toString()
    lines = plan.splitlines()
    # the scoring join: broadcast, with the corpus branch (lines
    # between the join and its broadcast build side) map-only —
    # Generate/Project/Filter/Scan, no Exchange (the training pass
    # shuffles its own tiny (bucket, label) rows; that is fine)
    (j,) = [i for i, ln in enumerate(lines)
            if "BroadcastHashJoin [bucket" in ln]
    branch = []
    for ln in lines[j + 1:]:
        if "BroadcastExchange" in ln:
            break
        branch.append(ln)
    assert any("Generate" in ln for ln in branch)
    assert not any("Exchange" in ln for ln in branch), branch


def test_nb_bucket_mismatch_errors_loudly(spark):
    import pytest

    d = _docs(spark)
    w = nb_train(d, buckets=32)
    with pytest.raises(Exception, match="nb_train value"):
        nb_score(d, w, buckets=256).collect()


def test_nb_deterministic(spark):
    d = _docs(spark)
    a = sorted(map(tuple, nb_quality_scores(d, d, buckets=128).collect()))
    b = sorted(map(tuple, nb_quality_scores(d, d, buckets=128).collect()))
    assert a == b
