"""RDF/JSON reader / writer (RIOT parity).

Reference: ``jena-arq/.../riot/lang/LangRDFJSON.java`` (term keys
``type``/``value``/``lang``/``datatype`` at ``:318-353``; object types
``uri``/``bnode``/``literal`` ``:404-429``), registered
``riot/RDFLanguages.java:100``; writer ``riot/writer/RDFJSONWriter``.

Document shape::

    { "<subject>": { "<predicate>": [ {"type": "literal",
                                       "value": "...",
                                       "lang": "en" | "datatype": iri},
                                      ... ] , ... }, ... }

Subjects that are blank nodes use their ``_:label`` as the key.
One JSON document per file = the parse unit; same per-file parallelism
as the other document readers (``wholetext`` + ``mapInPandas``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

TERM_COLS7 = ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype", "o_lang"]


def parse_rdfjson(text: str) -> list[tuple]:
    """One RDF/JSON document -> list of 7-tuples (TERM_COLS order)."""
    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("RDF/JSON parse error: top level must be an object")
    rows: list[tuple] = []
    for subj, po in doc.items():
        s_kind = "bnode" if subj.startswith("_:") else "iri"
        if not isinstance(po, dict):
            raise ValueError(f"RDF/JSON parse error: bad predicate map for {subj!r}")
        for pred, objs in po.items():
            if not isinstance(objs, list):
                raise ValueError(f"RDF/JSON parse error: object list for {pred!r}")
            for o in objs:
                typ, val = o.get("type"), o.get("value")
                if typ is None or val is None:
                    raise ValueError(
                        "RDF/JSON parse error: object needs 'type' and 'value'")
                if typ == "uri":
                    rows.append((s_kind, subj, pred, "iri", val, None, None))
                elif typ == "bnode":
                    rows.append((s_kind, subj, pred, "bnode", val, None, None))
                elif typ == "literal":
                    rows.append((s_kind, subj, pred, "literal", val,
                                 o.get("datatype"), o.get("lang")))
                else:
                    raise ValueError(
                        f"RDF/JSON parse error: object type {typ!r} not one of "
                        "uri, bnode, literal")
    return rows


def format_rdfjson(rows: list[tuple]) -> str:
    """7-tuples -> one RDF/JSON document (sorted keys, deterministic)."""
    doc: dict[str, dict[str, list]] = {}
    for s_kind, s_val, p_val, o_kind, o_val, o_dt, o_lang in sorted(rows):
        obj: dict[str, str] = {
            "type": "uri" if o_kind == "iri" else o_kind, "value": o_val,
        }
        if o_kind == "literal":
            if o_dt:
                obj["datatype"] = o_dt
            if o_lang:
                obj["lang"] = o_lang
        doc.setdefault(s_val, {}).setdefault(p_val, []).append(obj)
    return json.dumps(doc, indent=1, sort_keys=True, ensure_ascii=False) + "\n"


def read_rdfjson(spark: SparkSession, path: str) -> DataFrame:
    """Read .rj file(s) into the triple-table schema."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                if txt.strip():
                    out.extend(parse_rdfjson(txt))
            yield pd.DataFrame(out, columns=TERM_COLS7)

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string")
    from pyspark.sql import functions as F

    return (
        files.mapInPandas(_parse, schema)
        .withColumn("graph", F.lit(None).cast("string"))
        .withColumn("conv_id", F.lit(None).cast("string"))
    )


def write_rdfjson(triples: DataFrame, path: str) -> None:
    """Distributed RDF/JSON sink: one self-contained document per
    partition (same sharding as the other document writers)."""
    import pandas as pd

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([
                tuple(None if v is None or (isinstance(v, float) and pd.isna(v)) else v
                      for v in r)
                for r in pdf[TERM_COLS7].itertuples(index=False)
            ])
        yield pd.DataFrame({"value": [format_rdfjson(rows)] if rows else []})

    triples.select(*TERM_COLS7).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)
