"""TriX reader / writer (RIOT parity).

Reference: tag set ``jena-arq/.../riot/lang/TriX.java:64-74``
(``trix``/``TriX``, ``graph``, ``triple``, ``uri``, ``id``,
``plainLiteral``, ``typedLiteral``), parser ``ReaderTriX.java``, writer
``StreamWriterTriX.java``; registered ``riot/RDFLanguages.java:135``.

TriX is one XML document per file, so the parse unit is a document —
same per-file parallelism as the Turtle/TriG readers
(``wholetext`` + ``mapInPandas``; ElementTree does the XML work).
Blank-node ``<id>`` labels are kept as-given (``LabelToNode`` policy,
matching our other readers, so cross-format equality holds).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"

QUAD_COLS = ["s_kind", "s_val", "p_val", "o_kind", "o_val",
             "o_datatype", "o_lang", "graph"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _term(el: ET.Element):
    tag = _local(el.tag)
    text = el.text or ""
    if tag == "uri":
        return ("iri", text, None, None)
    if tag == "id":
        label = text if text.startswith("_:") else "_:" + text
        return ("bnode", label, None, None)
    if tag == "plainLiteral":
        lang = el.get("{http://www.w3.org/XML/1998/namespace}lang") or el.get("xml:lang")
        return ("literal", text, None, lang)
    if tag == "typedLiteral":
        return ("literal", text, el.get("datatype"), None)
    raise ValueError(f"TriX parse error: unexpected term element <{tag}>")


def parse_trix(text: str) -> list[tuple]:
    """One TriX document -> list of 8-tuples (TERM_COLS + graph)."""
    root = ET.fromstring(text)
    if _local(root.tag) not in ("TriX", "trix"):
        raise ValueError(f"TriX parse error: root <{_local(root.tag)}>")
    rows: list[tuple] = []
    for graph_el in root:
        if _local(graph_el.tag) != "graph":
            raise ValueError(f"TriX parse error: expected <graph>, got <{_local(graph_el.tag)}>")
        children = list(graph_el)
        graph_name = None
        if children and _local(children[0].tag) in ("uri", "id"):
            g_kind, g_val, _, _ = _term(children[0])
            graph_name = g_val
            children = children[1:]
        for triple_el in children:
            if _local(triple_el.tag) != "triple":
                raise ValueError(
                    f"TriX parse error: expected <triple>, got <{_local(triple_el.tag)}>")
            terms = [_term(t) for t in triple_el]
            if len(terms) != 3:
                raise ValueError("TriX parse error: triple arity != 3")
            (sk, sv, _, _), (pk, pv, _, _), (ok, ov, odt, olang) = terms
            if pk != "iri":
                raise ValueError("TriX parse error: non-IRI predicate")
            rows.append((sk, sv, pv, ok, ov, odt, olang, graph_name))
    return rows


def _fmt_term(kind: str, val: str, datatype=None, lang=None) -> str:
    if kind == "iri":
        return f"<uri>{escape(val)}</uri>"
    if kind == "bnode":
        return f"<id>{escape(val[2:] if val.startswith('_:') else val)}</id>"
    if datatype:
        return f'<typedLiteral datatype="{escape(datatype)}">{escape(val)}</typedLiteral>'
    if lang:
        return f'<plainLiteral xml:lang="{lang}">{escape(val)}</plainLiteral>'
    return f"<plainLiteral>{escape(val)}</plainLiteral>"


def format_trix(rows: list[tuple]) -> str:
    """8-tuples (TERM_COLS + graph) -> one TriX document; triples group
    into one <graph> element per (possibly default) graph."""
    by_graph: dict[str | None, list] = {}
    for r in rows:
        by_graph.setdefault(r[7] if len(r) > 7 else None, []).append(r)
    out = [f'<TriX xmlns="{TRIX_NS}">']
    for g in sorted(by_graph, key=lambda x: (x is not None, x or "")):
        out.append("  <graph>")
        if g is not None:
            out.append(f"    <uri>{escape(g)}</uri>")
        for r in sorted(by_graph[g]):
            out.append("    <triple>")
            out.append("      " + _fmt_term(r[0], r[1]))
            out.append("      " + _fmt_term("iri", r[2]))
            out.append("      " + _fmt_term(r[3], r[4], r[5], r[6]))
            out.append("    </triple>")
        out.append("  </graph>")
    out.append("</TriX>")
    return "\n".join(out) + "\n"


def read_trix(spark: SparkSession, path: str) -> DataFrame:
    """Read .trix file(s) into the quad-table schema; per-file parse
    units parallelize across executors."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                if txt.strip():
                    out.extend(parse_trix(txt))
            yield pd.DataFrame(out, columns=QUAD_COLS)

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string, graph string")
    from pyspark.sql import functions as F

    return (
        files.mapInPandas(_parse, schema)
        .withColumn("conv_id", F.lit(None).cast("string"))
    )


def write_trix(quads: DataFrame, path: str) -> None:
    """Distributed TriX sink: one self-contained document per partition."""
    import pandas as pd

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([
                tuple(None if v is None or (isinstance(v, float) and pd.isna(v)) else v
                      for v in r)
                for r in pdf[QUAD_COLS].itertuples(index=False)
            ])
        yield pd.DataFrame({"value": [format_trix(rows)] if rows else []})

    quads.select(*QUAD_COLS).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)
