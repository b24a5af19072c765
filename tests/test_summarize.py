"""TextRank summarization: sentence split, edges, ranking, parity."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.summarize import (sentence_edges, sentences,
                                       textrank_summary,
                                       textrank_summary_sql)

# conversation with a clear "hub" sentence sharing tokens with others
ROWS = [
    ("c", 0, "user", "spark shuffle tuning matters here. unrelated aside.",
     None),
    ("c", 1, "assistant",
     "shuffle tuning needs partition sizing! partition sizing controls "
     "spill behavior.", None),
    ("c", 2, "user", "what about spill behavior during shuffle tuning?",
     None),
    ("d", 0, "user", "lonely tiny note", None),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string,"
              " tool string")


def test_sentence_split_indices(spark):
    out = sorted(
        (r["conv_id"], r["turn_idx"], r["sent_idx"], r["sentence"])
        for r in sentences(_df(spark)).collect())
    assert ("c", 0, 0, "spark shuffle tuning matters here") in out
    assert ("c", 0, 1, "unrelated aside.") in out  # last keeps punct
    assert ("c", 1, 1,
            "partition sizing controls spill behavior.") in out


def test_edges_need_min_shared(spark):
    edges = sentence_edges(sentences(_df(spark)), min_shared=2)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    # hub: c#1#0 shares {shuffle,tuning} with c#0#0 and
    # {partition,sizing} with c#1#1 and {shuffle,tuning} with c#2#0
    assert ("c#1#0", "c#0#0") in got or ("c#0#0", "c#1#0") in got
    assert ("c#1#0", "c#1#1") in got
    # both directions present
    assert {(d, s) for s, d in got} == got
    # 'unrelated aside' and conv d are isolated
    assert not any("c#0#1" in e or e[0].startswith("d#") for e in got)


def test_summary_ranks_hub_first(spark):
    out = textrank_summary(_df(spark), k=1, iters=3, min_shared=2)
    got = {r["conv_id"]: r for r in out.collect()}
    # the hub sentence (turn 1, sent 0) touches all three others
    assert (got["c"]["turn_idx"], got["c"]["sent_idx"]) == (1, 0)
    assert got["c"]["rank_u"] > 0
    # isolated conversation still yields a (rank 0) summary row
    assert got["d"]["rank_u"] == 0 and got["d"]["pos"] == 1


def test_validation(spark):
    with pytest.raises(ValueError):
        textrank_summary(_df(spark), k=0)
    with pytest.raises(ValueError):
        sentence_edges(sentences(_df(spark)), min_shared=0)


def test_duckdb_parity_on_session_transcripts(spark, transcripts_df):
    got = sorted(tuple(r) for r in
                 textrank_summary(transcripts_df, k=2).collect())
    pdf = transcripts_df.select("conv_id", "turn_idx", "text").toPandas()
    con = duckdb.connect()
    con.register("ttv", pdf)
    want = sorted(tuple(r) for r in con.sql(
        textrank_summary_sql("SELECT * FROM ttv", k=2)).fetchall())
    assert got == want
