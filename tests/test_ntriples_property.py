"""Property-based N-Triples round-trip — RIOT writer/parser fidelity
under arbitrary literal content (the reference's round-trip/isomorphism
test style, ``RiotEvalTest.java:105``, driven by hypothesis instead of
fixed fixtures)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import given, settings, strategies as st  # noqa: E402

from jena_spark.sources.ntriples import format_ntriples, read_ntriples  # noqa: E402
from jena_spark.terms import TERM_COLS  # noqa: E402

# NUL is the writer's documented exclusion (escape sentinel); lone
# surrogates are not encodable to UTF-8 at all.
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0, max_size=40,
)

_langs = st.sampled_from([None, "en", "en-US", "fr"])
_datatypes = st.sampled_from(
    [None, "http://www.w3.org/2001/XMLSchema#integer",
     "http://www.w3.org/2001/XMLSchema#dateTime"]
)


@st.composite
def _triple(draw):
    s_kind = draw(st.sampled_from(["iri", "bnode"]))
    s_val = "http://e/s" + str(draw(st.integers(0, 99))) if s_kind == "iri" \
        else "_:b" + str(draw(st.integers(0, 99)))
    p_val = "http://e/p" + str(draw(st.integers(0, 9)))
    o_kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if o_kind == "literal":
        o_val = draw(_text)
        lang = draw(_langs)
        datatype = None if lang is not None else draw(_datatypes)
        return (s_kind, s_val, p_val, o_kind, o_val, datatype, lang)
    o_val = "http://e/o" + str(draw(st.integers(0, 99))) if o_kind == "iri" \
        else "_:c" + str(draw(st.integers(0, 99)))
    return (s_kind, s_val, p_val, o_kind, o_val, None, None)


@settings(max_examples=12, deadline=None)
@given(st.lists(_triple(), min_size=1, max_size=8, unique=True))
def _roundtrip_check(spark, tmp_dir, triples):
    df = spark.createDataFrame(
        triples,
        "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
        "o_datatype string, o_lang string",
    )
    from pyspark.sql import functions as F

    df = df.withColumn("graph", F.lit(None).cast("string"))
    import uuid

    path = str(tmp_dir / f"nt-{uuid.uuid4().hex}")
    format_ntriples(df).write.mode("overwrite").text(path)
    back = read_ntriples(spark, path)
    got = {tuple(r) for r in back.select(*TERM_COLS).collect()}
    want = {t for t in triples}
    assert got == want


def test_property_roundtrip(spark, tmp_path_factory):
    # session + dir are fixed args; hypothesis drives only `triples`
    _roundtrip_check(spark, tmp_path_factory.mktemp("ntprop"))
