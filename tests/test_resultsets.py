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
            if ln.startswith("x\t"):
                continue
            tsv_rows.add(tuple(ln.rstrip("\n").split("\t")))
    assert tsv_rows == {("<http://e/a>", '"1"'), ("_:b0", '"hi"')}
