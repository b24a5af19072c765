"""Result-set sinks (§2.1): CSV/TSV/JSON round-trips."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.queries import algebra as A  # noqa: E402
from jena_spark.sources.resultsets import write_csv, write_json, write_tsv  # noqa: E402


def test_csv_json_tsv_roundtrip(spark, tmp_path):
    vals = A.values(
        spark, ["x", "y"],
        [[("iri", "http://e/a"), ("literal", "1", "http://www.w3.org/2001/XMLSchema#integer")],
         [("bnode", "_:b0"), ("literal", "hi")]],
    )
    flat = A.flatten(vals, ["x", "y"])

    p_csv, p_json, p_tsv = (str(tmp_path / n) for n in ("c", "j", "t"))
    write_csv(flat, p_csv)
    write_json(flat, p_json)
    write_tsv(vals, p_tsv)

    back_csv = spark.read.option("header", True).csv(p_csv)
    assert {tuple(r) for r in back_csv.collect()} == {("http://e/a", "1"), ("_:b0", "hi")}

    lines = [json.loads(ln) for f in Path(p_json).glob("part-*") for ln in open(f)]
    assert {(d["x"], d["y"]) for d in lines} == {("http://e/a", "1"), ("_:b0", "hi")}

    tsv_rows = set()
    for f in Path(p_tsv).glob("part-*.csv"):
        for ln in open(f):
            if ln.startswith("?x\t"):
                continue
            tsv_rows.add(tuple(ln.rstrip("\n").split("\t")))
    assert tsv_rows == {
        ("<http://e/a>", '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("_:b0", '"hi"'),
    }


def test_tsv_escapes_and_types(spark, tmp_path):
    """ADVICE fix: literals with embedded tab/newline/quote/backslash
    must not corrupt the TSV framing, and datatype/lang tags must
    round-trip (SPARQL TSV term syntax)."""
    from jena_spark.sources.resultsets import write_tsv

    rows = [
        (("literal", 'has\ttab and "quote" \\ and\nnewline', None, None),),
        (("literal", "42", "http://www.w3.org/2001/XMLSchema#integer", None),),
        (("literal", "chat", None, "en"),),
        (("iri", "http://e/a", None, None),),
    ]
    df = spark.createDataFrame(
        rows,
        "x struct<kind:string,val:string,datatype:string,lang:string>",
    )
    out = str(tmp_path / "tsv")
    write_tsv(df, out)
    import glob

    lines = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    body = {ln for ln in lines if ln != "?x"}
    assert '"has\\ttab and \\"quote\\" \\\\ and\\nnewline"' in body
    assert '"42"^^<http://www.w3.org/2001/XMLSchema#integer>' in body
    assert '"chat"@en' in body
    assert "<http://e/a>" in body
    # every data line is exactly one column (no framing corruption)
    for ln in body:
        assert "\t" not in ln


def test_xml_output(spark, tmp_path):
    """XMLOutput parity (sparql/resultset/XMLOutput.java:30): document
    structure, term element kinds, XML escaping, lang/datatype attrs."""
    from jena_spark.queries import algebra as A
    from jena_spark.sources.resultsets import write_xml

    vals = A.values(
        spark, ["x", "y"],
        [[("iri", "http://e/a?b=1&c=<2>"),
          ("literal", "5", "http://www.w3.org/2001/XMLSchema#integer")],
         [("bnode", "_:b0"), ("literal", "bonjour", None, "fr")]],
    )
    path = str(tmp_path / "out.xml")
    write_xml(vals, path)
    doc = open(path).read()
    assert doc.startswith('<?xml version="1.0"?>')
    assert '<variable name="x"/>' in doc and '<variable name="y"/>' in doc
    assert "<uri>http://e/a?b=1&amp;c=&lt;2&gt;</uri>" in doc
    assert '<literal datatype="http://www.w3.org/2001/XMLSchema#integer">5</literal>' in doc
    assert '<literal xml:lang="fr">bonjour</literal>' in doc
    assert "<bnode>b0</bnode>" in doc
    assert doc.count("<result>") == 2 and doc.rstrip().endswith("</sparql>")
    import xml.etree.ElementTree as ET

    ET.fromstring(doc)  # well-formed


def test_xml_distributed_matches_streamed(spark, tmp_path):
    """write_xml_distributed: head + parts + foot == write_xml's doc
    (row order aside), and no collect anywhere in the module."""
    import inspect
    import xml.etree.ElementTree as ET

    from jena_spark.queries import algebra as A
    from jena_spark.sources import resultsets as RS

    # no sink materializes rows on the driver (the only collect in the
    # module is bindings_wide's O(#vars) head-list, data-independent)
    for fn in (RS.write_csv, RS.write_json, RS.write_tsv, RS.write_xml,
               RS.write_xml_distributed, RS.write_srj, RS.to_xml_rows):
        assert ".collect()" not in inspect.getsource(fn)

    vals = A.values(
        spark, ["x"],
        [[("iri", f"http://e/{i}")] for i in range(20)],
    )
    single = str(tmp_path / "one.xml")
    parts = str(tmp_path / "many")
    RS.write_xml(vals, single)
    RS.write_xml_distributed(vals, parts)

    part_rows = []
    for f in sorted(Path(parts).glob("rows/part-*")):
        part_rows.extend(ln for ln in open(f).read().split("\n") if ln)
    doc = (
        open(f"{parts}/head.xml").read()
        + "\n".join(part_rows) + "\n"
        + open(f"{parts}/foot.xml").read()
    )
    ET.fromstring(doc)
    # same multiset of <result> elements as the streamed document
    one = open(single).read()
    def results_of(d):
        ns = "{http://www.w3.org/2005/sparql-results#}"
        return sorted(
            ET.tostring(r, encoding="unicode")
            for r in ET.fromstring(d).find(f"{ns}results")
        )
    assert results_of(doc) == results_of(one)


def test_tsv_reader_roundtrip(spark, tmp_path):
    """read_tsv (TSVInput parity): write_tsv -> read_tsv is lossless on
    term structs (kind/val/datatype/lang), bare numeric cells become
    typed literals, empty cells unbound."""
    from jena_spark.queries import algebra as A
    from jena_spark.sources.resultsets import read_tsv, write_tsv

    XSD = "http://www.w3.org/2001/XMLSchema#"
    vals = A.values(
        spark, ["x", "y"],
        [[("iri", "http://e/a"), ("literal", "tab\there", None, None)],
         [("bnode", "_:b0"), ("literal", "42", XSD + "integer")],
         [("literal", "chat", None, "fr"), None]],
    )
    out = str(tmp_path / "t")
    write_tsv(vals, out)
    back = read_tsv(spark, out)
    orig = {tuple((tuple(r[n]) if r[n] is not None else None) for n in ("x", "y"))
            for r in vals.collect()}
    got = {tuple((tuple(r[n]) if r[n] is not None else None) for n in ("x", "y"))
           for r in back.collect()}
    assert got == orig

    # bare-numeric interop (hand-written TSV, as TSVInput accepts)
    p = tmp_path / "bare" ; p.mkdir()
    (p / "part-0.csv").write_text("?n\n30\n2.5\n1e3\n")
    rows = {tuple(r["n"]) for r in read_tsv(spark, str(p)).collect()}
    assert rows == {("literal", "30", XSD + "integer", ""),
                    ("literal", "2.5", XSD + "decimal", ""),
                    ("literal", "1e3", XSD + "double", "")}


def test_srj_roundtrip(spark, tmp_path):
    """write_srj -> read_srj -> bindings_wide is lossless; the document
    is valid W3C SPARQL-results+json (head.vars + results.bindings,
    unbound variables omitted per spec)."""
    import json

    from jena_spark.queries import algebra as A
    from jena_spark.sources.resultsets import (
        bindings_wide, read_srj, write_srj,
    )

    XSD = "http://www.w3.org/2001/XMLSchema#"
    vals = A.values(
        spark, ["x", "y"],
        [[("iri", "http://e/a"), ("literal", "5", XSD + "integer")],
         [("bnode", "_:b0"), ("literal", "bonjour", None, "fr")],
         [("literal", "plain"), None]],
    )
    path = str(tmp_path / "out.srj")
    write_srj(vals, path)
    doc = json.load(open(path))
    assert doc["head"]["vars"] == ["x", "y"]
    assert len(doc["results"]["bindings"]) == 3
    kinds = {b["x"]["type"] for b in doc["results"]["bindings"]}
    assert kinds == {"uri", "bnode", "literal"}
    assert any("y" not in b for b in doc["results"]["bindings"])  # unbound omitted
    assert any(b.get("y", {}).get("xml:lang") == "fr"
               for b in doc["results"]["bindings"])

    wide = bindings_wide(read_srj(spark, path))
    orig = {tuple((tuple(r[n]) if r[n] is not None else None) for n in ("x", "y"))
            for r in vals.collect()}
    got = {tuple((tuple(r[n]) if r[n] is not None else None) for n in ("x", "y"))
           for r in wide.collect()}
    assert got == orig


def test_xml_reader_roundtrip(spark, tmp_path):
    """read_xml_results parses write_xml's document back to the same
    bindings (long frame -> bindings_wide)."""
    from jena_spark.queries import algebra as A
    from jena_spark.sources.resultsets import (
        bindings_wide, read_xml_results, write_xml,
    )

    XSD = "http://www.w3.org/2001/XMLSchema#"
    vals = A.values(
        spark, ["x", "y"],
        [[("iri", "http://e/a?b=1&c=<2>"), ("literal", "5", XSD + "integer")],
         [("bnode", "_:b0"), ("literal", "bonjour", None, "fr")]],
    )
    path = str(tmp_path / "out.xml")
    write_xml(vals, path)
    wide = bindings_wide(read_xml_results(spark, path))
    orig = {tuple(tuple(r[n]) for n in ("x", "y")) for r in vals.collect()}
    got = {tuple(tuple(r[n]) for n in ("x", "y")) for r in wide.collect()}
    assert got == orig


def test_csv_reader_lossy(spark, tmp_path):
    """read_csv_results (CSVInput): plain lexical values, lossy by
    design."""
    from jena_spark.queries import algebra as A
    from jena_spark.sources.resultsets import read_csv_results, write_csv

    vals = A.values(spark, ["x"], [[("iri", "http://e/a")], [("literal", "hi")]])
    flat = A.flatten(vals, ["x"])
    out = str(tmp_path / "c")
    write_csv(flat, out)
    back = read_csv_results(spark, out)
    assert {r["x"] for r in back.collect()} == {"http://e/a", "hi"}


def _term(kind, val, dt="", lang=""):
    return (kind, val, dt, lang)


def _rs(spark, rows, cols):
    schema = ", ".join(
        f"{c}: struct<kind string, val string, datatype string, lang string>"
        .replace(": ", " ") for c in cols)
    return spark.createDataFrame(rows, schema)


XSD = "http://www.w3.org/2001/XMLSchema#"


def test_resultset_compare_bnode_bijection(spark):
    """ResultSetCompare.equalsByTerm semantics: row order irrelevant,
    blank-node labels match under ONE consistent bijection, crossed
    mappings are rejected."""
    from jena_spark.sources.resultsets import equal_by_term

    a = _rs(spark, [
        (_term("bnode", "b1"), _term("iri", "http://x/p")),
        (_term("bnode", "b1"), _term("iri", "http://x/q")),
        (_term("bnode", "b2"), _term("iri", "http://x/p")),
    ], ["s", "p"])
    # same shape, renamed bnodes, shuffled rows
    b = _rs(spark, [
        (_term("bnode", "z9"), _term("iri", "http://x/p")),
        (_term("bnode", "z7"), _term("iri", "http://x/p")),
        (_term("bnode", "z7"), _term("iri", "http://x/q")),
    ], ["s", "p"])
    assert equal_by_term(a, b)
    # a's bnode degree profile is {p,q} + {p}; c's is {p,q} + {q} —
    # no bijection can make b2's {p} row match a {q} row
    c = _rs(spark, [
        (_term("bnode", "z7"), _term("iri", "http://x/p")),
        (_term("bnode", "z7"), _term("iri", "http://x/q")),
        (_term("bnode", "z9"), _term("iri", "http://x/q")),
    ], ["s", "p"])
    assert not equal_by_term(a, c)
    # and a crossed SHARED mapping is rejected: one bnode on the left
    # cannot map to two on the right even when per-row terms align
    d = _rs(spark, [
        (_term("bnode", "b1"), _term("bnode", "b1")),
    ], ["s", "p"])
    e = _rs(spark, [
        (_term("bnode", "z1"), _term("bnode", "z2")),
    ], ["s", "p"])
    assert not equal_by_term(d, e)
    assert equal_by_term(d, _rs(spark, [
        (_term("bnode", "w"), _term("bnode", "w"))], ["s", "p"]))
    # different column sets never match
    assert not equal_by_term(a, b.withColumnRenamed("p", "o"))


def test_resultset_compare_by_value(spark):
    from jena_spark.sources.resultsets import equal_by_term, equal_by_value

    a = _rs(spark, [
        (_term("literal", "01", XSD + "integer"),),
        (_term("literal", "5.0", XSD + "double"),),
        (_term("literal", "plain"),),
    ], ["x"])
    b = _rs(spark, [
        (_term("literal", "1", XSD + "integer"),),
        (_term("literal", "5", XSD + "decimal"),),
        (_term("literal", "plain", XSD + "string"),),
    ], ["x"])
    assert equal_by_value(a, b)
    assert not equal_by_term(a, b)
    # value space still distinguishes actual differences
    c = _rs(spark, [
        (_term("literal", "2", XSD + "integer"),),
        (_term("literal", "5", XSD + "decimal"),),
        (_term("literal", "plain"),),
    ], ["x"])
    assert not equal_by_value(a, c)
