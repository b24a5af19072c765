"""SPARQL Update semantics (§2.10): INSERT/DELETE DATA, DELETE WHERE,
DELETE/INSERT WHERE, CLEAR — set semantics preserved throughout
(Graph.add duplicate no-op, ``jena-core/.../graph/Graph.java:84``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.pipeline import update as U  # noqa: E402
from jena_spark.terms import TERM_COLS  # noqa: E402

SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _g(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return {tuple(r) for r in df.select(*TERM_COLS).collect()}


BASE = [
    ("iri", "e:a", "p:role", "literal", "user", None, None),
    ("iri", "e:b", "p:role", "literal", "tool", None, None),
    ("iri", "e:c", "p:role", "literal", "user", None, None),
    ("iri", "e:a", "p:knows", "iri", "e:b", None, None),
]


def test_insert_data_is_set_union(spark):
    g = _g(spark, BASE)
    new = _g(spark, [BASE[0], ("iri", "e:d", "p:role", "literal", "admin", None, None)])
    out = _rows(U.insert_data(g, new))
    assert len(out) == 5  # duplicate add was a no-op
    assert ("iri", "e:d", "p:role", "literal", "admin", None, None) in out


def test_delete_data_exact_rows(spark):
    g = _g(spark, BASE)
    gone = _g(spark, [BASE[1]])
    out = _rows(U.delete_data(g, gone))
    assert tuple(BASE[1]) not in out and len(out) == 3


def test_delete_where_pattern(spark):
    g = _g(spark, BASE)
    out = _rows(U.delete_where(g, p="p:role", o=("literal", "user")))
    assert out == {tuple(BASE[1]), tuple(BASE[3])}


def test_delete_insert_where_rewrites_and_dedups(spark):
    g = _g(spark, BASE)
    out = U.delete_insert_where(
        g, p="p:role", o=("literal", "user"), set_object=("literal", "member")
    )
    rows = _rows(out)
    assert ("iri", "e:a", "p:role", "literal", "member", None, None) in rows
    assert not any(r[4] == "user" for r in rows)
    # predicate rewrite must match on ORIGINAL predicate, not the new one
    out2 = U.delete_insert_where(
        g, p="p:role", set_predicate="p:function", set_object=("literal", "x")
    )
    assert all(r[2] != "p:role" for r in _rows(out2) if r[4] == "x")


def test_clear(spark):
    assert U.clear(_g(spark, BASE)).count() == 0
