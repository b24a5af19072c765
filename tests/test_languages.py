"""RDFLanguages/RDFDataMgr dispatch tests (extension mapping, N3-as-
Turtle alias — ``riot/RDFLanguages.java:77-78``)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.sources import languages as L  # noqa: E402


def test_extension_mapping():
    assert L.lang_for_path("/x/out.ttl") == "turtle"
    assert L.lang_for_path("/x/dump.n3") == "n3"
    assert L.lang_for_path("graph.trdf/") == "thrift"
    assert L.lang_for_path("a/b/c.nq") == "nquads"
    with pytest.raises(ValueError, match="extension"):
        L.lang_for_path("/x/out.zzz")
    with pytest.raises(ValueError, match="infer"):
        L.lang_for_path("/x/noext")


def test_dispatch_roundtrips_all_langs(spark, tmp_path):
    """One graph through EVERY registered writer+reader pair via the
    dispatch surface — identical triple sets (RIOT family contract)."""
    from jena_spark import terms as TM

    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", "hello world", None, None),
        ("iri", "http://e/s", "http://e/n", "literal", "5",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("bnode", "_:b0", "http://e/p", "iri", "http://e/o", None, None),
        ("iri", "http://e/a", "http://e/p", "literal", "bonjour", None, "fr"),
    ]
    t = spark.createDataFrame(
        rows,
        "s_kind string, s_val string, p_val string, o_kind string,"
        "o_val string, o_datatype string, o_lang string",
    )
    want = set(rows)
    # triple-shaped languages (quads need a graph column — covered by
    # their own suites)
    for lang, ext in [("ntriples", "nt"), ("turtle", "ttl"), ("n3", "n3"),
                      ("rdfjson", "rj"), ("rdfxml", "rdf"),
                      ("jsonld", "jsonld"), ("thrift", "trdf")]:
        path = str(tmp_path / f"g.{ext}")
        L.write_rdf(t, path)            # lang inferred from extension
        back = L.read_rdf(spark, path, lang=lang)
        got = {tuple(r) for r in back.select(*TM.TERM_COLS).collect()}
        assert got == want, f"{lang} round-trip mismatch"
