"""CSV PropertyTable reader (jena-csv parity; text/csv is a registered
RIOT language, ``riot/RDFLanguages.java:46,194-196``)."""

import os

from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.sources.csvpt import CSV_ROW_PRED, column_predicate, read_csv_pt
from jena_spark.sources.languages import lang_for_path, read_rdf


def _write(path: str, text: str) -> None:
    with open(path, "w") as f:
        f.write(text)


def test_property_table_view(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t.csv")
    _write(p, 'name,age,note\nalice,30,"hello, world"\nbob,2.5e1,\ncarol,,plain\n')
    out = read_csv_pt(spark, p, base_iri="http://ex/t.csv").collect()
    by = {(r.s_val, r.p_val): r for r in out}

    # one bnode subject per row, 1-based row-number triples
    rows = [r for r in out if r.p_val == CSV_ROW_PRED]
    assert sorted((r.s_val, r.o_val) for r in rows) == [
        ("row-1", "1"), ("row-2", "2"), ("row-3", "3")
    ]
    assert all(r.s_kind == "bnode" and r.o_datatype == TM.XSD_INTEGER for r in rows)

    # quoted field with an embedded comma survives
    assert by[("row-1", "http://ex/t.csv#note")].o_val == "hello, world"
    # numeric cells (incl. scientific notation) typed xsd:double,
    # lexical form preserved
    assert by[("row-1", "http://ex/t.csv#age")].o_datatype == TM.XSD + "double"
    assert by[("row-2", "http://ex/t.csv#age")].o_val == "2.5e1"
    # strings stay plain literals
    assert by[("row-1", "http://ex/t.csv#name")].o_datatype is None
    # empty cells emit no triple
    assert ("row-2", "http://ex/t.csv#note") not in by
    assert ("row-3", "http://ex/t.csv#age") not in by


def test_column_name_url_encoding(spark, tmp_path):
    p = os.path.join(str(tmp_path), "enc.csv")
    _write(p, "full name,a&b\nx,y\n")
    out = read_csv_pt(spark, p, base_iri="http://ex/e.csv")
    preds = {r.p_val for r in out.collect()}
    assert "http://ex/e.csv#full%20name" in preds
    assert "http://ex/e.csv#a%26b" in preds
    assert column_predicate("http://ex/e.csv", "full name") == (
        "http://ex/e.csv#full%20name"
    )


def test_multi_file_row_numbering_is_path_ordered(spark, tmp_path):
    # a directory of part files numbers rows in path order, like Jena
    # streaming files alphabetically
    d = str(tmp_path / "parts")
    os.makedirs(d)
    _write(os.path.join(d, "a.csv"), "k\na1\na2\n")
    _write(os.path.join(d, "b.csv"), "k\nb1\n")
    out = read_csv_pt(spark, d, base_iri="http://ex/d.csv")
    vals = {
        r.s_val: r.o_val
        for r in out.where(F.col("p_val") == "http://ex/d.csv#k").collect()
    }
    assert vals == {"row-1": "a1", "row-2": "a2", "row-3": "b1"}


def test_rdf_datamgr_dispatch(spark, tmp_path):
    p = os.path.join(str(tmp_path), "x.csv")
    _write(p, "c\nv\n")
    assert lang_for_path(p) == "csv"
    out = read_rdf(spark, p)
    assert out.where(F.col("p_val").endswith("#c")).count() == 1
