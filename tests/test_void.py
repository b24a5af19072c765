"""VoID dataset description (jena_spark.pipeline.stats.void_description)."""

import pytest

from jena_spark import terms as TM
from jena_spark.pipeline.stats import VOID_NS, void_description, void_sql

TRIPLES = [
    ("iri", "urn:a", TM.RDF_TYPE, "iri", "urn:Person", None, None),
    ("iri", "urn:b", TM.RDF_TYPE, "iri", "urn:Person", None, None),
    ("iri", "urn:a", "urn:knows", "iri", "urn:b", None, None),
    ("iri", "urn:a", "urn:name", "literal", "Ada", None, None),
    ("iri", "urn:b", "urn:name", "literal", "Ada", None, "en"),
    ("bnode", "_:x", "urn:name", "literal", "5", TM.XSD_INTEGER, None),
]
SCHEMA = ("s_kind string, s_val string, p_val string, o_kind string, "
          "o_val string, o_datatype string, o_lang string")


def test_measures(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA)
    rows = void_description(t).collect()
    meas = {r.p_val.rsplit("#", 1)[-1]: r.o_val for r in rows
            if r.s_val == "urn:x-jena-spark:dataset"
            and r.o_kind == "literal"}
    assert meas["triples"] == "6"
    assert meas["distinctSubjects"] == "3"       # a, b, _:x
    # "Ada" plain vs "Ada"@en vs "5"^^int vs two entity IRIs = 5
    assert meas["distinctObjects"] == "5"
    assert meas["properties"] == "3"
    assert meas["classes"] == "1"
    assert meas["entities"] == "2"               # IRI subjects a, b
    # class partition: Person has 2 distinct subjects
    cls_n = [r.o_val for r in rows
             if r.p_val == VOID_NS + "entities" and r.s_kind == "bnode"]
    assert cls_n == ["2"]
    # partition bnodes are content-addressed -> stable across calls
    b1 = sorted(r.o_val for r in rows if r.o_kind == "bnode")
    b2 = sorted(r.o_val for r in void_description(t).collect()
                if r.o_kind == "bnode")
    assert b1 == b2 and len(b1) == 4             # 3 props + 1 class


def test_duckdb_parity(spark):
    import duckdb

    t = spark.createDataFrame(TRIPLES, SCHEMA)
    got = sorted(map(tuple, void_description(t).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE tr(s_kind VARCHAR, s_val VARCHAR, p_val VARCHAR,"
            " o_kind VARCHAR, o_val VARCHAR, o_datatype VARCHAR,"
            " o_lang VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?, ?, ?, ?, ?)", TRIPLES)
    want = sorted(map(tuple, con.sql(
        "WITH triples AS (SELECT * FROM tr),\n" + void_sql()).fetchall()))
    assert got == want
