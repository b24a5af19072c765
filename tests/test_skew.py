"""Salted aggregation/join equal their unsalted counterparts."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.pipeline.skew import salted_agg, salted_count, salted_join  # noqa: E402


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_salted_count_equals_plain(spark):
    # skewed: key "hot" holds 90% of rows
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k")
    )
    got = _rows(salted_count(df, ["k"], salt=8))
    want = _rows(df.groupBy("k").agg(F.count("*").alias("n")))
    assert got == want


def test_salted_distinct_agg_equals_plain(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, "hot").otherwise("cold").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    got = _rows(salted_agg(
        df, ["k"],
        {"_vs": F.collect_set("v")},
        {"n_distinct": F.size(F.array_distinct(F.flatten(F.collect_list("_vs")))).cast("long")},
        salt=8,
    ))
    want = _rows(df.groupBy("k").agg(F.countDistinct("v").alias("n_distinct")))
    assert got == want


def test_salted_join_equals_plain(spark):
    big = spark.range(3000).select(
        F.when(F.col("id") % 3 < 2, "hot").otherwise(F.concat(F.lit("b"), F.col("id"))).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("b5", 2), ("missing", 3)], "k string, tag int"
    )
    got = _rows(salted_join(big, small, "k", salt=8))
    want = _rows(big.join(small, "k"))
    assert got == want


def test_salted_join_rejects_outer_modes(spark):
    import pytest as _pytest

    from jena_spark.pipeline.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    for how in ("right", "full", "full_outer", "cross"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", salt=4, how=how)
    # supported modes still work
    assert salted_join(big, small, "k", salt=4, how="left").count() == 1
