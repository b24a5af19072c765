"""SELECT result-set sinks — CSV / TSV / JSON (§2.1).

Reference: ``jena-arq/.../sparql/resultset/{CSVOutput,TSVOutput,
JSONOutput}.java`` serialize SELECT results. Spark mapping is the
built-in writers; the only semantics work is SPARQL's TSV term syntax
(IRIs bracketed, literals quoted) which :func:`write_tsv` reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(results: DataFrame, path: str) -> None:
    """CSVOutput parity: plain lexical values, header row."""
    results.write.mode("overwrite").option("header", True).csv(path)


def write_json(results: DataFrame, path: str) -> None:
    """JSONOutput parity (one binding object per line)."""
    results.write.mode("overwrite").json(path)


def to_xml_rows(results: DataFrame) -> DataFrame:
    """SPARQL XML Results rows (``sparql/resultset/XMLOutput.java:30``):
    one ``<result>`` element per binding row, built distributively with
    JVM-side string functions. Var-struct columns render
    ``<uri>``/``<bnode>``/``<literal [xml:lang|datatype]>`` elements;
    plain columns render as plain literals. XML-escapes &, <, >."""
    def esc(c):
        out = F.regexp_replace(c, "&", "&amp;")
        out = F.regexp_replace(out, "<", "&lt;")
        return F.regexp_replace(out, ">", "&gt;")

    parts = [F.lit("  <result>\n")]
    for name, dtype in results.dtypes:
        if dtype.startswith("struct"):
            c = F.col(name)
            lang = F.nullif(c.getField("lang"), F.lit(""))
            dt = F.nullif(c.getField("datatype"), F.lit(""))
            lit_open = F.concat(
                F.lit("<literal"),
                F.when(lang.isNotNull(),
                       F.concat(F.lit(' xml:lang="'), lang, F.lit('"')))
                .otherwise(F.lit("")),
                F.when(dt.isNotNull(),
                       F.concat(F.lit(' datatype="'), dt, F.lit('"')))
                .otherwise(F.lit("")),
                F.lit(">"),
            )
            term = (
                F.when(c.getField("kind") == "iri",
                       F.concat(F.lit("<uri>"), esc(c.getField("val")), F.lit("</uri>")))
                .when(c.getField("kind") == "bnode",
                      F.concat(F.lit("<bnode>"),
                               F.regexp_replace(c.getField("val"), "^_:", ""),
                               F.lit("</bnode>")))
                .otherwise(F.concat(lit_open, esc(c.getField("val")), F.lit("</literal>")))
            )
        else:
            term = F.concat(F.lit("<literal>"), esc(F.col(name).cast("string")),
                            F.lit("</literal>"))
        parts.append(
            F.concat(F.lit(f'    <binding name="{name}">'), term, F.lit("</binding>\n"))
        )
    parts.append(F.lit("  </result>"))
    return results.select(F.concat(*parts).alias("xml"))


def _xml_head(names: list[str]) -> str:
    return (
        '<?xml version="1.0"?>\n<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
        "<head>\n"
        + "".join(f'  <variable name="{n}"/>\n' for n in names)
        + "</head>\n<results>\n"
    )


_XML_FOOT = "</results>\n</sparql>\n"


def write_xml(results: DataFrame, path: str) -> None:
    """XMLOutput parity: ONE ``<sparql>`` document (Jena streams a
    single document). The envelope is O(#vars) driver-side; the
    per-row ``<result>`` elements are rendered distributed
    (:func:`to_xml_rows`) and *streamed* to the file handle via
    ``toLocalIterator`` — O(one partition) driver memory, never a full
    ``collect``. For result sets too large for any single document use
    :func:`write_xml_distributed`."""
    import os

    names = [n for n, _ in results.dtypes]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(_xml_head(names))
        for r in to_xml_rows(results).toLocalIterator():
            f.write(r["xml"])
            f.write("\n")
        f.write(_XML_FOOT)


def write_xml_distributed(results: DataFrame, path: str) -> None:
    """Cluster-scale XML sink: the row elements go out through Spark's
    distributed text writer (``path/rows/part-*``), the envelope to
    ``path/head.xml`` / ``path/foot.xml``. Concatenating
    head + parts + foot reproduces :func:`write_xml`'s document —
    the same part-file posture as the CSV/TSV/JSON sinks, nothing on
    the driver."""
    import os

    names = [n for n, _ in results.dtypes]
    to_xml_rows(results).write.mode("overwrite").text(f"{path}/rows")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/head.xml", "w") as f:
        f.write(_xml_head(names))
    with open(f"{path}/foot.xml", "w") as f:
        f.write(_XML_FOOT)


def _nt_escape(c):
    """N-Triples string escaping (TSVOutput writes literals with
    ``\\``/``"``/newline/CR/tab escapes — ``riot/out/EscapeStr.java``):
    literal values are arbitrary (turn text can contain tabs/newlines),
    so without this the TSV framing is corrupted."""
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, "\"", "\\\\\"")
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, "\t", r"\\t")


def write_tsv(results: DataFrame, path: str) -> None:
    """TSVOutput parity: SPARQL TSV quotes terms. Var-struct columns
    (kind, val, datatype, lang) are rendered as N-Triples-style terms —
    literal values N-Triples-escaped and suffixed with ``@lang`` /
    ``^^<datatype>`` when present (lossless round-trip); plain string
    columns pass through with the same escaping."""
    cols = []
    for name, dtype in results.dtypes:
        if dtype.startswith("struct"):
            c = F.col(name)
            fields = dict.fromkeys(
                dtype.replace("struct<", "").split(",")
            )  # crude but only names before ':' matter
            names = [f.split(":")[0].strip("<> ") for f in fields]
            lit = F.concat(F.lit("\""), _nt_escape(c.getField("val")), F.lit("\""))
            if "lang" in names:
                lang = F.nullif(c.getField("lang"), F.lit(""))
                lit = F.when(
                    lang.isNotNull(), F.concat(lit, F.lit("@"), lang)
                ).otherwise(lit)
            if "datatype" in names:
                dt = F.nullif(c.getField("datatype"), F.lit(""))
                lit = F.when(
                    dt.isNotNull(), F.concat(lit, F.lit("^^<"), dt, F.lit(">"))
                ).otherwise(lit)
            term = (
                F.when(c.getField("kind") == "iri",
                       F.concat(F.lit("<"), c.getField("val"), F.lit(">")))
                .when(c.getField("kind") == "bnode", c.getField("val"))
                .otherwise(lit)
            )
            cols.append(term.alias(name))
        else:
            cols.append(_nt_escape(F.col(name)).alias(name))
    # disable the CSV writer's own quoting: terms are already quoted
    # SPARQL-TSV style and tab/newline are escaped above
    results.select(*cols).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).option("quote", "").csv(path)
