"""Property-path tests (P_Seq/P_Alt/P_Inverse/closure)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_spark.queries import paths as P

EX = "http://ex.org/"
KNOWS, LIKES = EX + "knows", EX + "likes"


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("iri", EX + "a", KNOWS, "iri", EX + "b", None, None),
        ("iri", EX + "b", KNOWS, "iri", EX + "c", None, None),
        ("iri", EX + "c", KNOWS, "iri", EX + "d", None, None),
        ("iri", EX + "d", KNOWS, "iri", EX + "b", None, None),  # cycle b->c->d->b
        ("iri", EX + "a", LIKES, "iri", EX + "e", None, None),
    ]
    full = [r + (None, None) for r in rows]
    return spark.createDataFrame(
        full,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string, graph string, conv_id string",
    )


def _pairs(df):
    return {(r["src_val"], r["dst_val"]) for r in df.collect()}


def test_link_and_inverse(spark, g):
    k = P.link(g, KNOWS)
    assert _pairs(k) == {(EX + "a", EX + "b"), (EX + "b", EX + "c"),
                         (EX + "c", EX + "d"), (EX + "d", EX + "b")}
    assert _pairs(P.inverse(P.link(g, LIKES))) == {(EX + "e", EX + "a")}


def test_seq_and_alt(spark, g):
    k = P.link(g, KNOWS)
    two = P.seq(k, k)  # knows/knows
    assert (EX + "a", EX + "c") in _pairs(two)
    both = P.alt(P.link(g, KNOWS), P.link(g, LIKES))
    assert both.count() == 5


def test_fixed_length(spark, g):
    k = P.link(g, KNOWS)
    assert _pairs(P.fixed_length(k, 3)) == {
        (EX + "a", EX + "d"), (EX + "b", EX + "b"),
        (EX + "c", EX + "c"), (EX + "d", EX + "d"),
    }


def test_one_or_more_closure_with_cycle(spark, g):
    k = P.link(g, KNOWS)
    got = _pairs(P.one_or_more(k))
    # a reaches b,c,d; b,c,d reach each other and themselves (cycle)
    want = {(EX + "a", x) for x in (EX + "b", EX + "c", EX + "d")}
    for u in (EX + "b", EX + "c", EX + "d"):
        for v in (EX + "b", EX + "c", EX + "d"):
            want.add((u, v))
    assert got == want


def test_zero_or_more_adds_identity(spark, g):
    k = P.link(g, KNOWS)
    domain = (
        g.select(F.col("s_kind").alias("kind"), F.col("s_val").alias("val"))
        .unionByName(g.select(F.col("o_kind").alias("kind"), F.col("o_val").alias("val")))
        .distinct()
    )
    got = _pairs(P.zero_or_more(k, domain))
    assert (EX + "e", EX + "e") in got and (EX + "a", EX + "a") in got
    assert (EX + "a", EX + "c") in got


def test_neg_prop_set(spark, g):
    assert _pairs(P.neg_prop_set(g, [KNOWS])) == {(EX + "a", EX + "e")}
