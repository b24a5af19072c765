"""Corpus snapshot diff: statuses, stable census schema, DuckDB parity."""

from __future__ import annotations

import duckdb

from jena_spark.data.versioning import (diff_census, diff_census_sql,
                                        snapshot_diff, snapshot_diff_sql)

OLD = [(1, "alpha"), (2, "beta"), (3, "gamma")]
NEW = [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")]


def _dfs(spark):
    schema = "doc_id long, text string"
    return (spark.createDataFrame(OLD, schema),
            spark.createDataFrame(NEW, schema))


def test_statuses(spark):
    old, new = _dfs(spark)
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_census_has_all_statuses(spark):
    old, _ = _dfs(spark)
    # diff against self: only 'unchanged' is nonzero, but every status
    # row is present
    got = {r["status"]: r["n"]
           for r in diff_census(old, old).collect()}
    assert got == {"added": 0, "removed": 0, "changed": 0,
                   "unchanged": len(OLD)}


def test_duckdb_parity(spark):
    old, new = _dfs(spark)
    o_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{t}')" for i, t in OLD) + ") AS v(doc_id, text)"
    n_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{t}')" for i, t in NEW) + ") AS v(doc_id, text)"
    con = duckdb.connect()
    got = sorted(tuple(r) for r in snapshot_diff(old, new).collect())
    want = sorted(tuple(r) for r in
                  con.sql(snapshot_diff_sql(o_cte, n_cte)).fetchall())
    assert got == want
    gotc = sorted(tuple(r) for r in diff_census(old, new).collect())
    wantc = sorted(tuple(r) for r in
                   con.sql(diff_census_sql(o_cte, n_cte)).fetchall())
    assert gotc == wantc
