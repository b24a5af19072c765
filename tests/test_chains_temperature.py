"""Tool-chain census + sqrt-temperature source mixing."""

from __future__ import annotations

import math

import duckdb
import pytest

from jena_spark.data.agentic import tool_chain_census, tool_chain_census_sql
from jena_spark.data.selection import (temperature_mixture,
                                       temperature_mixture_sql)

TURNS = [
    ("c", 0, "user", None), ("c", 1, "tool", "search"),
    ("c", 2, "tool", "search"), ("c", 3, "assistant", None),
    ("c", 4, "tool", "python"),
    ("d", 0, "tool", "search"), ("d", 1, "tool", "python"),
    ("e", 0, "tool", "python"),      # single tool turn, no chain
]


def _turns(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, tool string")


def test_chains(spark):
    got = {r["chain"]: (r["n_convs"], r["n_occurrences"])
           for r in tool_chain_census(_turns(spark), 2).collect()}
    # chains skip non-tool turns: c yields search>search, search>python
    assert got == {"search>search": (1, 1),
                   "search>python": (2, 2),
                   }


def test_chain_length_three(spark):
    got = {r["chain"] for r in
           tool_chain_census(_turns(spark), 3).collect()}
    assert got == {"search>search>python"}
    with pytest.raises(ValueError):
        tool_chain_census(_turns(spark), 1)


def test_chains_duckdb_parity(spark, transcripts_df):
    got = sorted(tuple(r) for r in
                 tool_chain_census(transcripts_df, 2).collect())
    pdf = transcripts_df.select("conv_id", "turn_idx", "role",
                                "tool").toPandas()
    con = duckdb.connect()
    con.register("ttv", pdf)
    want = sorted(tuple(r) for r in con.sql(
        tool_chain_census_sql("SELECT * FROM ttv", 2)).fetchall())
    assert got == want


def test_temperature_shares(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string")
    got = {r["source"]: r for r in
           temperature_mixture(docs).collect()}
    assert got["big"]["raw_share_ppm"] == 900_000
    # sqrt weights: w_big = 9486833, w_small = 3162278
    wb = math.floor(math.sqrt(90) * 1e6 + 0.5)
    ws = math.floor(math.sqrt(10) * 1e6 + 0.5)
    assert got["big"]["temp_share_ppm"] == 10**6 * wb // (wb + ws)
    # temperature pulls toward uniform: small's share rises
    assert got["small"]["temp_share_ppm"] > got["small"]["raw_share_ppm"]


def test_temperature_duckdb_parity(spark):
    rows = [(i, f"s{i % 7}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(tuple(r) for r in temperature_mixture(docs).collect())
    vals = ", ".join(f"({i}, '{s}')" for i, s in rows)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(doc_id, source)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(
        temperature_mixture_sql(cte)).fetchall())
    assert got == want
