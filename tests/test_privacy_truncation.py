"""k-anonymity census + embedding dimension-truncation QA."""

from __future__ import annotations

import duckdb
import pytest

from jena_spark.data.privacy import (k_anonymity_census, k_anonymity_flags,
                                     k_anonymity_flags_sql)
from jena_spark.data.similarity import (dim_truncation_eval,
                                        dim_truncation_eval_sql)

DOCS = [
    (1, "en", "web"), (2, "en", "web"), (3, "en", "web"),
    (4, "fr", "web"),
    (5, "en", None), (6, "en", None),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, lang string, source string")


def test_census_and_flags(spark):
    cen = {(r["lang"], r["source"]): (r["n"], r["k_anonymous"])
           for r in k_anonymity_census(
               _docs(spark), ["lang", "source"], k=2).collect()}
    assert cen[("en", "web")] == (3, True)
    assert cen[("fr", "web")] == (1, False)
    assert cen[("en", None)] == (2, True)    # NULLs group together
    flags = {r["doc_id"]: (r["n_group"], r["k_anonymous"])
             for r in k_anonymity_flags(
                 _docs(spark), ["lang", "source"], k=2).collect()}
    assert len(flags) == 6
    assert flags[4] == (1, False) and flags[5] == (2, True)


def test_validation(spark):
    with pytest.raises(ValueError):
        k_anonymity_census(_docs(spark), [], 2)
    with pytest.raises(ValueError):
        k_anonymity_census(_docs(spark), ["lang"], 0)


def test_kanon_duckdb_parity(spark):
    got = sorted(tuple(r) for r in k_anonymity_flags(
        _docs(spark), ["lang", "source"], 2).collect())
    vals = ", ".join(
        f"({i}, '{l}', " + (f"'{s}'" if s else "NULL") + ")"
        for i, l, s in DOCS)
    cte = f"SELECT * FROM (VALUES {vals}) AS v(doc_id, lang, source)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(
        k_anonymity_flags_sql(cte, ["lang", "source"], 2)).fetchall())
    assert got == want


def test_truncation_eval_properties(spark):
    import random
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dim_truncation_eval(e, dims=(4, 16), k=5, n_queries=4)
    rowso = {(r["d"], r["query_id"]): r for r in out.collect()}
    assert len(rowso) == 8                     # 2 dims x 4 queries
    # full-width truncation is the identity ranking -> perfect overlap
    for q in range(4):
        assert rowso[(16, q)]["overlap_ppm"] == 1_000_000
    for key, r in rowso.items():
        assert 0 <= r["n_common"] <= 5


def test_truncation_duckdb_parity(spark):
    import random
    rng = random.Random(13)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(12)])
            for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(tuple(r) for r in
                 dim_truncation_eval(e, dims=(4, 8), k=5,
                                     n_queries=3).collect())
    con = duckdb.connect()
    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(str(x) for x in v) + "]::FLOAT[])"
        for i, v in rows)
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM (VALUES {vals})"
            " AS t(vec_id, embedding)")
    want = sorted(tuple(r) for r in con.sql(
        dim_truncation_eval_sql(dims=(4, 8), k=5, n_queries=3)).fetchall())
    assert got == want
