"""Dictionary encoding (TDB NodeId parity): encode -> decode is the
identity; encoded pattern scans equal string-level find()."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jena_spark import terms as TM  # noqa: E402
from jena_spark.pipeline import encode as E  # noqa: E402
from jena_spark.queries import graph as G  # noqa: E402


@pytest.fixture(scope="module")
def canon(spark, transcripts_df):
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples

    return canonicalize_triples(raw_triples(transcripts_df)).select(*TM.TERM_COLS).persist()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_roundtrip_identity(canon):
    d = E.node_dictionary(canon)
    E.assert_injective(d)
    enc = E.encode_triples(canon)
    assert _rows(E.decode_triples(enc, d)) == _rows(canon)


def test_encoded_find_matches_string_find(canon):
    d = E.node_dictionary(canon)
    enc = E.encode_triples(canon)
    got = E.decode_triples(E.find_encoded(enc, p=TM.P_MENTIONS), d)
    want = G.find(canon, p=TM.P_MENTIONS)
    assert _rows(got) == _rows(want)


def test_encoded_row_is_narrow(canon):
    enc = E.encode_triples(canon)
    assert [f.dataType.simpleString() for f in enc.schema.fields[:3]] == [
        "bigint", "bigint", "bigint"
    ]


def test_encoded_join_matches_string_join(canon):
    """BGP-style self-join on ids decodes to the string-level result."""
    d = E.node_dictionary(canon)
    enc = E.encode_triples(canon)
    m = E.find_encoded(enc, p=TM.P_MENTIONS)
    a, b = m.alias("a"), m.alias("b")
    pairs_enc = (
        a.join(b, (F.col("a.s_id") == F.col("b.s_id")) & (F.col("a.o_id") < F.col("b.o_id")))
        .select(F.col("a.o_id").alias("x"), F.col("b.o_id").alias("y"))
        .distinct()
    )
    dd = d.select("node_id", "val")
    got = _rows(
        pairs_enc.join(dd.withColumnRenamed("node_id", "x"), "x")
        .withColumnRenamed("val", "e1")
        .join(dd.withColumnRenamed("node_id", "y"), "y")
        .withColumnRenamed("val", "e2")
        .select("e1", "e2")
    )
    ms = G.find(canon, p=TM.P_MENTIONS)
    sa, sb = ms.alias("a"), ms.alias("b")
    want_pairs = (
        sa.join(sb, (F.col("a.s_val") == F.col("b.s_val")))
        .select(F.col("a.o_val").alias("e1"), F.col("b.o_val").alias("e2"))
        .distinct()
    )
    # compare as unordered pairs (id order != lexicographic order)
    got_unordered = {frozenset(p) for p in got}
    want_unordered = {
        frozenset((x, y)) for (x, y) in _rows(want_pairs) if x != y
    }
    assert got_unordered == want_unordered
