"""N-Triples / N-Quads reader and writer (RIOT parity).

Reference: grammar and parser ``jena-arq/.../riot/lang/LangNTriples.java``
(registered at ``riot/RDFLanguages.java:84``, N-Quads ``:112``); writers
under ``jena-arq/.../riot/writer/``. Round-trip fidelity is the
reference's own test style (``RiotEvalTest.java:105`` asserts parsed ==
expected graph) — our test asserts write→read equals the input triple
set exactly (deterministic skolemization makes isomorphism ≡ equality,
SURVEY.md §5.3).

Implementation notes:
* Everything is JVM-side (``regexp_extract`` / nested ``regexp_replace``
  inside whole-stage codegen) — no Python in the parse path.
* Escapes: ``\\\\ \\" \\n \\r \\t`` (the writer emits exactly these;
  RDF 1.1 N-Triples is UTF-8, so no UCHAR on the write side).
  ``\\uXXXX``/``\\UXXXXXXXX`` decoding for FOREIGN files is opt-in
  (``decode_uchar=True`` — one Arrow-batched pass) so the default
  parse path stays all-JVM.
* Unescape uses a NUL sentinel to make the backslash-backslash case
  order-independent; NUL cannot appear in N-Triples literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- term patterns (shared with queries.rdfstar's destructurer) -------------
_IRI_PAT = r"<[^<>]*>"
_BNODE_PAT = r"_:\S+"
_LIT_PAT = r"\"(?:[^\"\\]|\\.)*\"(?:\^\^<[^>]*>|@[A-Za-z0-9][A-Za-z0-9-]*)?"

#: N-Triples-star (``Node_Triple.java:27``; NT grammar extension): the
#: JVM line regex accepts quoted-triple terms ``<< s p o >>`` nested up
#: to this depth, in CANONICAL spacing (single spaces — what our writer
#: and ``terms.quote`` emit). Foreign files with non-canonical interior
#: whitespace parse via ``read_turtle`` (superset grammar, tokenizer
#: whitespace-insensitive).
STAR_REGEX_DEPTH = 2


def quoted_triple_pat(depth: int) -> str:
    """Regex for a quoted-triple term whose components may themselves
    be quoted triples nested up to ``depth - 1`` further levels."""
    flat = f"(?:{_IRI_PAT}|{_BNODE_PAT}|{_LIT_PAT})"
    comp = flat
    for _ in range(depth - 1):
        comp = f"(?:{flat}|<< {comp} {_IRI_PAT} {comp} >>)"
    return rf"<< {comp} {_IRI_PAT} {comp} >>"


_QT = quoted_triple_pat(STAR_REGEX_DEPTH)
# quoted-triple alternative FIRST: "<<" would otherwise prefix-match
# the IRI alternative's opening "<"
_S = rf"({_QT}|{_IRI_PAT}|{_BNODE_PAT})"
_P = r"<([^<>]*)>"
_O = rf"({_QT}|{_IRI_PAT}|{_BNODE_PAT}|{_LIT_PAT})"
_G = rf"({_IRI_PAT})?"
_LINE = rf"^\s*{_S}\s+{_P}\s+{_O}\s*{_G}\s*\.\s*$"


def _escape(c: Column) -> Column:
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\"", "\\\\\"")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _unescape(c: Column) -> Column:
    c = F.regexp_replace(c, r"\\\\", "\x00")
    c = F.regexp_replace(c, "\\\\\"", "\"")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, "\x00", r"\\")
    return c


def format_ntriples(triples: DataFrame, quads: bool = False) -> DataFrame:
    """Triple rows -> one N-Triples/N-Quads line per row (column ``value``)."""
    subj = F.when(
        F.col("s_kind").isin("bnode", "triple"), F.col("s_val")
    ).otherwise(F.concat(F.lit("<"), F.col("s_val"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("p_val"), F.lit(">"))
    lit_suffix = (
        F.when(F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang")))
        .when(F.col("o_datatype").isNotNull(),
              F.concat(F.lit("^^<"), F.col("o_datatype"), F.lit(">")))
        .otherwise(F.lit(""))
    )
    obj = (
        F.when(F.col("o_kind").isin("bnode", "triple"), F.col("o_val"))
        .when(F.col("o_kind") == "iri",
              F.concat(F.lit("<"), F.col("o_val"), F.lit(">")))
        .otherwise(F.concat(F.lit("\""), _escape(F.col("o_val")), F.lit("\""), lit_suffix))
    )
    parts = [subj, pred, obj]
    if quads:
        parts.append(
            F.when(F.col("graph").isNotNull(),
                   F.concat(F.lit("<"), F.col("graph"), F.lit(">"))).otherwise(F.lit(""))
        )
    line = F.concat(F.concat_ws(" ", *parts), F.lit(" ."))
    # collapse double space from empty graph slot in the quads case
    line = F.regexp_replace(line, r"\s+\.$", " .")
    return triples.select(line.alias("value"))


def write_ntriples(triples: DataFrame, path: str, quads: bool = False) -> None:
    format_ntriples(triples, quads).write.mode("overwrite").text(path)


def _decode_term(raw: Column, unescape: bool = True) -> list[Column]:
    """raw N-Triples(-star) term -> (kind, val, datatype, lang) columns.
    ``unescape=False`` keeps literal lexicals RAW (escapes intact) for
    the decode_uchar path, which must run ECHAR and UCHAR in ONE pass
    (layering them double-decodes ``\\\\uXXXX``)."""
    is_qt = raw.startswith("<<")
    is_iri = raw.startswith("<") & ~is_qt
    is_bnode = raw.startswith("_:")
    quoted = F.regexp_extract(raw, r"^\"((?:[^\"\\]|\\.)*)\"", 1)
    datatype = F.nullif(F.regexp_extract(raw, r"\^\^<([^>]*)>$", 1), F.lit(""))
    lang = F.nullif(F.regexp_extract(raw, r"\"@([A-Za-z0-9-]+)$", 1), F.lit(""))
    kind = (
        F.when(is_qt, "triple").when(is_iri, "iri")
        .when(is_bnode, "bnode").otherwise("literal")
    )
    val = (
        F.when(is_qt | is_bnode, raw)
        .when(is_iri, F.regexp_extract(raw, r"^<(.*)>$", 1))
        .otherwise(_unescape(quoted) if unescape else quoted)
    )
    dtl = [
        F.when(is_qt, F.lit(None).cast("string")).otherwise(datatype),
        F.when(is_qt, F.lit(None).cast("string")).otherwise(lang),
    ]
    return [kind, val, *dtl]


def read_ntriples(
    spark: SparkSession, path: str, quads: bool = False,
    decode_uchar: bool = False,
) -> DataFrame:
    """Parse into the triple-table schema. Blank-node labels are taken
    as given (``LabelToNode.createUseLabelAsGiven``,
    ``jena-arq/.../riot/lang/LabelToNode.java:71``) — our writers only
    emit already-skolemized labels, so this is lossless.

    ``decode_uchar=True`` additionally decodes RDF 1.1 ``\\uXXXX`` /
    ``\\UXXXXXXXX`` numeric escapes in IRIs and literals via one
    Arrow-batched pass over the parsed term columns (foreign files
    only — our writer emits raw UTF-8, and the default all-JVM path
    stays Python-free). Escaped foreign files also parse through
    ``read_turtle`` (superset grammar, decodes UCHAR natively)."""
    lines = spark.read.text(path)
    lines = lines.where(
        (F.length(F.trim("value")) > 0) & ~F.trim(F.col("value")).startswith("#")
    )
    parsed = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("raw_s"),
        F.regexp_extract("value", _LINE, 2).alias("p_val"),
        F.regexp_extract("value", _LINE, 3).alias("raw_o"),
        (F.regexp_extract("value", _LINE, 4) if quads else F.lit("")).alias("raw_g"),
    ).where(F.col("raw_s") != "")

    s_kind, s_val, _, _ = _decode_term(F.col("raw_s"), unescape=not decode_uchar)
    o_kind, o_val, o_datatype, o_lang = _decode_term(
        F.col("raw_o"), unescape=not decode_uchar)
    graph = F.nullif(F.regexp_extract("raw_g", r"^<(.*)>$", 1), F.lit(""))
    out = parsed.select(
        s_kind.alias("s_kind"), s_val.alias("s_val"), F.col("p_val"),
        o_kind.alias("o_kind"), o_val.alias("o_val"),
        o_datatype.alias("o_datatype"), o_lang.alias("o_lang"),
        graph.alias("graph"), F.lit(None).cast("string").alias("conv_id"),
    )
    return decode_uchar_cols(out) if decode_uchar else out


def _full_unescape_str(s):
    # ONE pass over ECHAR + UCHAR (turtle._unescape: surrogate-pairing,
    # loud on lone surrogates); cheap substring check fast path
    if s is None or "\\" not in s:
        return s
    from jena_spark.sources.turtle import _unescape as _tu

    return _tu(s)


def decode_uchar_cols(df: DataFrame) -> DataFrame:
    """Full escape decode (ECHAR + UCHAR in one pass) over every string
    term column INCLUDING the graph IRI — one ``mapInPandas`` pass
    (Arrow-batched; the per-string fast path is a substring check, so
    unescaped corpora pay ~nothing). Quoted-triple lexicals
    (kind='triple') are left as-is: their embedded terms carry their
    own escaping and decode at destructure time."""
    cols = df.columns

    def _fix(batches):
        for pdf in batches:
            for c, kind_col in (("s_val", "s_kind"), ("o_val", "o_kind"),
                                ("p_val", None), ("o_datatype", None),
                                ("graph", None)):
                if c not in pdf.columns:
                    continue
                if kind_col is not None and kind_col in pdf.columns:
                    mask = pdf[kind_col] != "triple"
                    pdf.loc[mask, c] = pdf.loc[mask, c].map(_full_unescape_str)
                else:
                    pdf[c] = pdf[c].map(_full_unescape_str)
            yield pdf

    return df.mapInPandas(_fix, df.schema).select(*cols)
