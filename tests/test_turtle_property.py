"""Property-based Turtle round-trip — format_turtle/parse_turtle
fidelity under arbitrary literal content (pure Python, no Spark: the
distributed read/write paths delegate to these per document)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import given, settings, strategies as st  # noqa: E402

from jena_spark.sources.rdfjson import format_rdfjson, parse_rdfjson  # noqa: E402
from jena_spark.sources.trix import format_trix, parse_trix  # noqa: E402
from jena_spark.sources.turtle import format_turtle, parse_turtle  # noqa: E402

# exclusions: NUL (writer sentinel), lone surrogates (not UTF-8);
# XML additionally cannot carry most C0 controls — generate printable+ws
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="\x00"
    ).map(lambda c: c),
    min_size=0, max_size=40,
) | st.sampled_from(["", "with \t tab", 'quo "te"', "line\nbreak", "back\\slash"])

_langs = st.sampled_from([None, "en", "en-GB", "fr"])
_datatypes = st.sampled_from(
    [None, "http://www.w3.org/2001/XMLSchema#integer",
     "http://jena-spark.org/vocab#custom"]
)


@st.composite
def _triple(draw):
    s_kind = draw(st.sampled_from(["iri", "bnode"]))
    s_val = ("http://e/s" + str(draw(st.integers(0, 99)))) if s_kind == "iri" \
        else "_:b" + str(draw(st.integers(0, 99)))
    p_val = "http://e/ns#p" + str(draw(st.integers(0, 9)))
    o_kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if o_kind == "literal":
        o_val = draw(_text)
        lang = draw(_langs)
        datatype = None if lang is not None else draw(_datatypes)
        return (s_kind, s_val, p_val, o_kind, o_val, datatype, lang)
    o_val = ("http://e/o" + str(draw(st.integers(0, 99)))) if o_kind == "iri" \
        else "_:c" + str(draw(st.integers(0, 99)))
    return (s_kind, s_val, p_val, o_kind, o_val, None, None)


@settings(max_examples=40, deadline=None)
@given(st.lists(_triple(), min_size=1, max_size=10, unique=True))
def test_turtle_roundtrip_property(rows):
    assert set(parse_turtle(format_turtle(rows))) == set(rows)


@settings(max_examples=40, deadline=None)
@given(st.lists(_triple(), min_size=1, max_size=10, unique=True))
def test_trix_roundtrip_property(rows):
    quads = [(*r, None) for r in rows]
    # TriX writes literal text verbatim inside XML: tab survives, but
    # bare CR is normalized by XML parsers — exclude CR rows
    quads = [q for q in quads if "\r" not in q[4]]
    if not quads:
        return
    assert set(parse_trix(format_trix(quads))) == set(quads)


@settings(max_examples=40, deadline=None)
@given(st.lists(_triple(), min_size=1, max_size=10, unique=True))
def test_rdfjson_roundtrip_property(rows):
    assert set(parse_rdfjson(format_rdfjson(rows))) == set(rows)
