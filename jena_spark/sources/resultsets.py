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
        binding = F.concat(
            F.lit(f'    <binding name="{name}">'), term, F.lit("</binding>\n"))
        # unbound variable (null struct / null value): omit the binding
        # element entirely (XMLOutput does; a null would null the concat)
        parts.append(F.coalesce(
            F.when(F.col(name).isNotNull(), binding), F.lit("")))
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


def tsv_cols(results: DataFrame) -> list:
    """SPARQL-TSV term renderings, one column per variable (shared by
    :func:`write_tsv` and the protocol endpoint's streamed variant)."""
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
            cols.append(term.alias("?" + name))
        else:
            cols.append(_nt_escape(F.col(name)).alias("?" + name))
    return cols


def write_tsv(results: DataFrame, path: str) -> None:
    """TSVOutput parity: SPARQL TSV quotes terms. Var-struct columns
    (kind, val, datatype, lang) are rendered as N-Triples-style terms —
    literal values N-Triples-escaped and suffixed with ``@lang`` /
    ``^^<datatype>`` when present (lossless round-trip); plain string
    columns pass through with the same escaping."""
    # disable the CSV writer's own quoting: terms are already quoted
    # SPARQL-TSV style and tab/newline are escaped above. Header vars
    # carry the W3C results-TSV "?" prefix (TSVOutput.java does).
    results.select(*tsv_cols(results)).write.mode("overwrite").option(
        "sep", "\t"
    ).option("header", True).option("quote", "").csv(path)


# --- readers (ResultSetFactory.load analog) ---------------------------------
#
# Reference: ``jena-arq/.../sparql/resultset/ResultSetFactory.java`` +
# ``resultset/{TSVInput,CSVInput,JSONInput,XMLInput}.java``. Wide
# formats (TSV/CSV) come back as one column per variable; document
# formats (SPARQL-results+json / XML) come back as a LONG bindings
# frame (fixed schema — fully distributed however many variables the
# document has) widened on demand by :func:`bindings_wide`.

BINDINGS_LONG_SCHEMA = (
    "row_key string, var string, kind string, val string, "
    "datatype string, lang string"
)


def _term_struct_cols(kind, val, datatype, lang):
    return F.struct(
        kind.alias("kind"), val.alias("val"),
        F.coalesce(datatype, F.lit("")).alias("datatype"),
        F.coalesce(lang, F.lit("")).alias("lang"),
    )


def read_tsv(spark, path: str) -> DataFrame:
    """``TSVInput.java`` parity: header names the variables (leading
    ``?`` stripped), each cell an N-Triples-style term — decoded with
    the same JVM-side term machinery as the N-Triples reader; SPARQL
    numeric shorthand (bare ``30`` / ``2.5`` / ``1e3`` cells, which
    TSVInput also accepts) becomes a typed literal; empty cells are
    unbound (null struct)."""
    from jena_spark.sources.ntriples import _decode_term

    XSD = "http://www.w3.org/2001/XMLSchema#"
    df = (
        spark.read.option("sep", "\t").option("header", True)
        .option("quote", "").csv(path)
    )
    cols = []
    for name in df.columns:
        raw = df[name]
        kind, val, dt, lang = _decode_term(raw)
        bare_num = raw.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
        num_dt = (
            F.when(raw.rlike("[eE]"), F.lit(XSD + "double"))
            .when(raw.rlike(r"\."), F.lit(XSD + "decimal"))
            .otherwise(F.lit(XSD + "integer"))
        )
        term = _term_struct_cols(
            F.when(bare_num, F.lit("literal")).otherwise(kind),
            F.when(bare_num, raw).otherwise(val),
            F.when(bare_num, num_dt).otherwise(dt),
            F.when(bare_num, F.lit(None).cast("string")).otherwise(lang),
        )
        cols.append(
            F.when(raw.isNotNull() & (raw != ""), term).alias(name.lstrip("?"))
        )
    return df.select(*cols)


def read_csv_results(spark, path: str) -> DataFrame:
    """``CSVInput.java`` parity: the CSV results format is lossy by
    design (plain lexical values, no term typing) — comes back as one
    plain string column per variable."""
    return spark.read.option("header", True).csv(path)


def _srj_binding_json(results: DataFrame):
    """Per-row W3C SPARQL-results+json binding object, rendered
    JVM-side (``to_json`` drops null fields, which is exactly the
    omit-unbound-variables rule)."""
    fields = []
    for name, dtype in results.dtypes:
        if dtype.startswith("struct"):
            c = F.col(name)
            kind = c.getField("kind")
            lang = F.nullif(c.getField("lang"), F.lit(""))
            dt = F.nullif(c.getField("datatype"), F.lit(""))
            typ = (
                F.when(kind == "iri", "uri")
                .when(kind == "bnode", "bnode")
                .when(kind == "triple", "triple")
                .otherwise("literal")
            )
            value = F.when(
                kind == "bnode", F.regexp_replace(c.getField("val"), "^_:", "")
            ).otherwise(c.getField("val"))
            term = F.when(c.isNotNull(), F.struct(
                typ.alias("type"), value.alias("value"),
                lang.alias("xml:lang"), dt.alias("datatype"),
            ))
        else:
            term = F.struct(
                F.lit("literal").alias("type"),
                F.col(name).cast("string").alias("value"),
                F.lit(None).cast("string").alias("xml:lang"),
                F.lit(None).cast("string").alias("datatype"),
            )
        fields.append(term.alias(name))
    return results.select(
        F.to_json(F.struct(*fields), {"ignoreNullFields": "true"}).alias("json")
    )


def write_srj(results: DataFrame, path: str) -> None:
    """W3C SPARQL-results+json document (``JSONOutput.java`` — Jena's
    primary result format). One document; the envelope is O(#vars)
    driver-side, binding objects render distributed and stream out via
    ``toLocalIterator`` (same posture as :func:`write_xml`)."""
    import os

    names = [n for n, _ in results.dtypes]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import json as _json

    with open(path, "w") as f:
        f.write('{ "head": { "vars": %s },\n  "results": { "bindings": [\n'
                % _json.dumps(names))
        first = True
        for r in _srj_binding_json(results).toLocalIterator():
            if not first:
                f.write(",\n")
            f.write("    " + r["json"])
            first = False
        f.write("\n  ] } }\n")


def read_srj(spark, path: str) -> DataFrame:
    """``JSONInput.java`` parity: parse SPARQL-results+json documents
    (one per file, ``wholetext`` + ``mapInPandas`` — the per-document
    distribution every document reader here uses) into the LONG
    bindings frame. ``row_key`` = md5(document) + row index, so rows
    from different documents never collide; widen with
    :func:`bindings_wide`."""
    raw = spark.read.text(path, wholetext=True)

    def gen(it):
        import hashlib
        import json as _json

        import pandas as pd

        for pdf in it:
            rows = []
            for doc in pdf["value"]:
                if not doc.strip():
                    continue
                d = _json.loads(doc)
                key = hashlib.md5(doc.encode()).hexdigest()[:16]
                for i, b in enumerate(d["results"]["bindings"]):
                    for v, t in b.items():
                        kind = {"uri": "iri", "bnode": "bnode",
                                "triple": "triple"}.get(t["type"], "literal")
                        val = t["value"]
                        if kind == "bnode" and not val.startswith("_:"):
                            val = "_:" + val
                        rows.append((f"{key}:{i}", v, kind, val,
                                     t.get("datatype"), t.get("xml:lang")))
            yield pd.DataFrame(
                rows, columns=["row_key", "var", "kind", "val",
                               "datatype", "lang"])

    return raw.mapInPandas(gen, BINDINGS_LONG_SCHEMA)


def read_xml_results(spark, path: str) -> DataFrame:
    """``XMLInput.java`` parity: parse SPARQL XML Results documents
    (the :func:`write_xml` output) into the LONG bindings frame, one
    document per file, distributed."""
    raw = spark.read.text(path, wholetext=True)

    def gen(it):
        import hashlib
        import xml.etree.ElementTree as ET

        import pandas as pd

        NS = "{http://www.w3.org/2005/sparql-results#}"
        for pdf in it:
            rows = []
            for doc in pdf["value"]:
                if not doc.strip():
                    continue
                root = ET.fromstring(doc)
                key = hashlib.md5(doc.encode()).hexdigest()[:16]
                results_el = root.find(NS + "results")
                for i, res in enumerate(results_el.findall(NS + "result")):
                    for b in res.findall(NS + "binding"):
                        v = b.get("name")
                        el = list(b)[0]
                        tag = el.tag.rsplit("}", 1)[-1]
                        if tag == "uri":
                            rows.append((f"{key}:{i}", v, "iri",
                                         el.text or "", None, None))
                        elif tag == "bnode":
                            rows.append((f"{key}:{i}", v, "bnode",
                                         "_:" + (el.text or ""), None, None))
                        else:
                            lang = el.get(
                                "{http://www.w3.org/XML/1998/namespace}lang")
                            rows.append((f"{key}:{i}", v, "literal",
                                         el.text or "", el.get("datatype"),
                                         lang))
            yield pd.DataFrame(
                rows, columns=["row_key", "var", "kind", "val",
                               "datatype", "lang"])

    import pandas as pd  # noqa: F401  (import check at def time)

    return raw.mapInPandas(gen, BINDINGS_LONG_SCHEMA)


def bindings_wide(long_df: DataFrame) -> DataFrame:
    """LONG bindings frame -> one term-struct column per variable.
    The variable list is O(#vars) on the driver (a result set's head,
    never data-sized); the widen itself is one hash aggregation."""
    names = sorted(r["var"] for r in long_df.select("var").distinct().collect())
    term = _term_struct_cols(
        F.col("kind"), F.col("val"), F.col("datatype"), F.col("lang"))
    aggs = [
        F.first(F.when(F.col("var") == v, term), ignorenulls=True).alias(v)
        for v in names
    ]
    return long_df.groupBy("row_key").agg(*aggs).drop("row_key")


# --- ResultSetCompare ---------------------------------------------------------
# Reference: jena-arq/.../sparql/resultset/ResultSetCompare.java
# (equalsByTerm / equalsByValue) with the blank-node bijection of
# util/iso/BNodeIso.java. Like ARQ — which materializes both sides as
# ResultSetRewindable — this is a driver-side utility over collected
# results; the engine's distributed equality paths are the oracle
# hash-compare and graph isomorphism (queries/isomorphism.py).

_XSD = "http://www.w3.org/2001/XMLSchema#"
_NUMERIC_DTS = {
    _XSD + t for t in (
        "integer", "decimal", "double", "float", "int", "long", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "negativeInteger", "positiveInteger", "unsignedLong",
        "unsignedInt", "unsignedShort", "unsignedByte",
    )
}


def _rs_rows(results: DataFrame):
    """Collected rows as tuples of (var, term) pairs; term =
    ('bnode', label) or ('term', kind, val, datatype, lang)."""
    rows = []
    struct_cols = {n for n, t in results.dtypes if t.startswith("struct")}
    for r in results.collect():
        row = []
        for n in sorted(results.columns):
            v = r[n]
            if v is None:
                row.append((n, None))
            elif n in struct_cols:
                kind = v["kind"]
                if kind == "bnode":
                    row.append((n, ("bnode", v["val"])))
                else:
                    row.append((n, ("term", kind, v["val"],
                                    v["datatype"] or "", v["lang"] or "")))
            else:
                row.append((n, ("term", "literal", str(v), "", "")))
        rows.append(tuple(row))
    return rows


def _value_key(term):
    """NodeValue-style value-space key: numeric literals compare
    numerically across datatypes, plain literal == xsd:string,
    booleans/dateTimes by parsed value; everything else by term."""
    if term is None or term[0] == "bnode":
        return term
    _, kind, val, dt, lang = term
    if kind != "literal":
        return term
    if lang:
        return ("lit-lang", val, lang.lower())
    if dt in _NUMERIC_DTS:
        from decimal import Decimal, InvalidOperation

        try:
            return ("num", Decimal(val))
        except InvalidOperation:
            try:
                return ("num", Decimal(repr(float(val))))
            except (ValueError, InvalidOperation):
                return term
    if dt == _XSD + "boolean":
        return ("bool", val.strip() in ("true", "1"))
    if dt in (_XSD + "dateTime", _XSD + "date"):
        from datetime import datetime

        try:
            return ("dt", datetime.fromisoformat(
                val.replace("Z", "+00:00")))
        except ValueError:
            return term
    if dt in ("", _XSD + "string"):
        return ("lit-str", val)
    return ("lit", val, dt)


def _rs_iso(rows_a, rows_b, by_value: bool) -> bool:
    """Multiset row equality under ONE global blank-node bijection
    (BNodeIso semantics), backtracking over skeleton-bucketed
    candidates."""
    if len(rows_a) != len(rows_b):
        return False

    def norm(t):
        return _value_key(t) if by_value else t

    def skeleton(row):
        return tuple((n, "*" if t is not None and t[0] == "bnode"
                      else norm(t)) for n, t in row)

    from collections import defaultdict

    buckets = defaultdict(list)
    for j, rb in enumerate(rows_b):
        buckets[skeleton(rb)].append(j)

    used = [False] * len(rows_b)
    fwd: dict = {}
    rev: dict = {}

    def try_row(i) -> bool:
        if i == len(rows_a):
            return True
        ra = rows_a[i]
        for j in buckets.get(skeleton(ra), ()):
            if used[j]:
                continue
            rb = rows_b[j]
            added = []
            ok = True
            for (_, ta), (_, tb) in zip(ra, rb):
                if ta is None or ta[0] != "bnode":
                    continue
                la, lb = ta[1], tb[1]
                if fwd.get(la, lb) != lb or rev.get(lb, la) != la:
                    ok = False
                    break
                if la not in fwd:
                    fwd[la], rev[lb] = lb, la
                    added.append((la, lb))
            if ok:
                used[j] = True
                if try_row(i + 1):
                    return True
                used[j] = False
            for la, lb in added:
                del fwd[la], rev[lb]
        return False

    return try_row(0)


def equal_by_term(a: DataFrame, b: DataFrame) -> bool:
    """``ResultSetCompare.equalsByTerm``: same variables, same row
    multiset term-for-term, up to one consistent blank-node bijection."""
    if sorted(a.columns) != sorted(b.columns):
        return False
    return _rs_iso(_rs_rows(a), _rs_rows(b), by_value=False)


def equal_by_value(a: DataFrame, b: DataFrame) -> bool:
    """``ResultSetCompare.equalsByValue``: like :func:`equal_by_term`
    but literals compare in VALUE space — "01"^^xsd:integer matches
    "1"^^xsd:integer, 5.0e0 matches 5, plain matches xsd:string."""
    if sorted(a.columns) != sorted(b.columns):
        return False
    return _rs_iso(_rs_rows(a), _rs_rows(b), by_value=True)
