"""Leakage-safe splitting (jena_spark.data.splits)."""

import pytest

from jena_spark.data.splits import (leakage_safe_split, split_case_sql,
                                    _thresholds)


def _fixture(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 21)], "doc_id bigint, text string")
    # two chains and one triangle: {1,2,3}, {5,6}, {10,11,12}; rest single
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (10, 12)],
        "doc_a bigint, doc_b bigint")
    return docs, pairs


def test_cluster_mates_share_split(spark):
    docs, pairs = _fixture(spark)
    rows = leakage_safe_split(docs, pairs).collect()
    assert len(rows) == 20
    by_id = {r.doc_id: r for r in rows}
    for comp in ([1, 2, 3], [5, 6], [10, 11, 12]):
        splits = {by_id[i].split for i in comp}
        clusters = {by_id[i].cluster for i in comp}
        assert len(splits) == 1 and clusters == {min(comp)}, comp
    # singletons are their own cluster
    assert by_id[7].cluster == 7
    assert set(r.split for r in rows) <= {"train", "valid", "test"}


def test_split_deterministic_and_duckdb_parity(spark):
    import duckdb

    docs, pairs = _fixture(spark)
    a = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    b = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    assert a == b
    # oracle: hand-build the tiny component map, apply the CASE twin
    comp = {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}
    con = duckdb.connect()
    con.sql("CREATE TABLE m(doc_id BIGINT, cluster BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?)",
                    [(i, comp.get(i, i)) for i in range(1, 21)])
    want = sorted(map(tuple, con.sql(
        f"SELECT doc_id, cluster, {split_case_sql()} AS split FROM m"
    ).fetchall()))
    assert a == want


def test_fraction_skew_respected(spark):
    # all-train fractions put every cluster in train
    docs, pairs = _fixture(spark)
    rows = leakage_safe_split(docs, pairs, {"train": 1.0}).collect()
    assert {r.split for r in rows} == {"train"}


def test_bad_fractions_rejected(spark):
    docs, pairs = _fixture(spark)
    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        _thresholds({})


def test_last_bucket_absorbs_remainder():
    cuts = _thresholds({"a": 0.3333333, "b": 0.3333333, "c": 0.3333334})
    assert cuts[-1] == ("c", 1 << 32)
    assert cuts[0][1] < cuts[1][1] < cuts[2][1]
