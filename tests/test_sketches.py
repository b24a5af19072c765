"""HLL sketch census ops: accuracy vs exact COUNT DISTINCT and the
mergeability property (rollup of per-group sketches ≈ direct sketch ≈
exact), on both synthetic data and the real documents table."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.data.sketches import (  # noqa: E402
    distinct_estimate,
    estimate_union,
    sketch_by,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_estimate_accuracy_synthetic(spark):
    n = 20000
    df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = distinct_estimate(df, "v")
    assert abs(est - n) / n < 0.05


def test_mergeability_groups_vs_direct(spark):
    df = spark.range(30000).select(
        (F.col("id") % 7).alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 9000)).alias("v"))
    per_group = sketch_by(df, "v", group_by=["g"])
    rolled = estimate_union(per_group).collect()[0]["n_est"]
    direct = distinct_estimate(df, "v")
    exact = df.select("v").distinct().count()
    # rollup and direct agree with each other and with exact
    assert abs(rolled - exact) / exact < 0.05
    assert abs(rolled - direct) / max(direct, 1) < 0.02


def test_partial_rollup_levels(spark):
    """day -> month style: union of finer sketches equals coarser
    grouping's own estimate within tolerance — no rescan needed."""
    df = spark.range(12000).select(
        (F.col("id") % 12).alias("day"),
        ((F.col("id") % 12) / 4).cast("int").alias("month"),
        F.concat(F.lit("d"), (F.col("id") % 5000)).alias("v"))
    per_day = sketch_by(df, "v", group_by=["day", "month"])
    per_month = estimate_union(per_day, group_by=["month"])
    for r in per_month.collect():
        exact = (df.where(F.col("month") == r["month"])
                 .select("v").distinct().count())
        assert abs(r["n_est"] - exact) / exact < 0.05


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_documents_census(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    col = docs.columns[0]
    est = distinct_estimate(docs, col)
    exact = docs.select(col).distinct().count()
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_empty_frame_estimates_zero(spark):
    from pyspark.sql import functions as F

    empty = spark.range(0).select(F.col("id").cast("string").alias("v"))
    assert distinct_estimate(empty, "v") == 0
    sk = sketch_by(empty, "v")
    assert sk.collect()[0]["n_est"] == 0
    assert estimate_union(sk).collect()[0]["n_est"] == 0
