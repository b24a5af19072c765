"""Turtle reader / writer (RIOT LangTurtle parity).

Reference: grammar + parser ``jena-arq/.../riot/lang/LangTurtle.java:33``
(registered ``riot/RDFLanguages.java:68``); writer family under
``riot/writer/TurtleWriter*``. Feature coverage:

* ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``
* prefixed names, ``a`` keyword, ``;`` predicate lists, ``,`` object
  lists
* labeled blank nodes (kept as-given, ``LabelToNode.java:71`` policy —
  matching our N-Triples reader so cross-format equality holds),
  anonymous ``[]`` and bnode property lists ``[ p o ; ... ]`` with
  deterministic per-document skolem labels
  (``BlankNodeAllocatorHash.java:31-46``: scope = document hash)
* collections ``( ... )`` expanded to rdf:first/rest/nil
* literals: ``'...'``/``"..."``/``'''...'''``/``\"\"\"...\"\"\"``,
  ``@lang``, ``^^dt``, numeric shorthand (integer/decimal/double),
  ``true``/``false``; ``\\uXXXX``/``\\UXXXXXXXX`` escapes

Distribution model: one Turtle DOCUMENT is a parse unit (prefix state
is document-scoped), so files parallelize per-file — the same unit of
parallelism the reference's RIOT reader has. The parser is pure Python
executed Arrow-batched via ``mapInPandas`` (a context-sensitive grammar
is the documented case for leaving JVM expressions); line-oriented
N-Triples stays on the all-JVM fast path (``sources/ntriples.py``).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from jena_spark import terms as TM

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST, RDF_REST, RDF_NIL = RDF + "first", RDF + "rest", RDF + "nil"

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<qt_open><<)
    | (?P<qt_close>>>)
    | (?P<ann_open>\{\|)
    | (?P<ann_close>\|\})
    | (?P<iri><(?:[^<>"{}|^`\\\s]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
    | (?P<str_long3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<str_long1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str2>"(?:[^"\\\n]|\\.)*")
    | (?P<str1>'(?:[^'\\\n]|\\.)*')
    | (?P<bnode>_:[A-Za-z0-9_.-]+)
    | (?P<prefix_decl>@prefix|@base|(?i:PREFIX|BASE)(?=[\s<]))
    | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.:%-]*(?<![.]))?
    | (?P<kw>\ba\b|true|false)
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<dtmark>\^\^)
    | (?P<graph_kw>(?i:\bGRAPH\b))
    | (?P<punct>[;,.\[\](){}])
    """,
    re.VERBOSE,
)

_ESC = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    """Single left-to-right pass over ECHAR + UCHAR escapes (the only
    correct order — a decoded backslash must never be re-examined).
    JSON-style surrogate PAIRS (``\\uD83D\\uDE00``) combine into one
    code point; a lone surrogate raises (it is not a Unicode scalar
    value and would crash Arrow serialization later, opaquely)."""
    out, i = [], 0
    pending_hi: int | None = None

    def emit_cp(cp: int) -> None:
        nonlocal pending_hi
        if pending_hi is not None:
            if 0xDC00 <= cp <= 0xDFFF:
                out.append(chr(0x10000 + ((pending_hi - 0xD800) << 10)
                               + (cp - 0xDC00)))
                pending_hi = None
                return
            raise ValueError(
                f"lone surrogate \\u{pending_hi:04X} in escaped string")
        if 0xD800 <= cp <= 0xDBFF:
            pending_hi = cp
            return
        if 0xDC00 <= cp <= 0xDFFF:
            raise ValueError(f"lone surrogate \\u{cp:04X} in escaped string")
        out.append(chr(cp))

    def flush() -> None:
        if pending_hi is not None:
            raise ValueError(
                f"lone surrogate \\u{pending_hi:04X} in escaped string")

    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                emit_cp(int(s[i + 2:i + 6], 16)); i += 6; continue
            if nxt == "U":
                emit_cp(int(s[i + 2:i + 10], 16)); i += 10; continue
            flush()
            if nxt in _ESC:
                out.append(_ESC[nxt]); i += 2; continue
        flush()
        out.append(ch); i += 1
    flush()
    return "".join(out)


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        for m in _TOKEN.finditer(text):
            kind = m.lastgroup
            if kind in ("comment",):
                continue
            if kind == "local":  # pname match spans pname+colon+local
                self.toks.append(("pname_full", m.group(0)))
            elif kind == "pname":
                self.toks.append(("pname_full", m.group(0)))
            elif kind == "iri" and ("\\u" in m.group(0) or "\\U" in m.group(0)):
                # IRIREF UCHAR (grammar [18]) decoded ONCE at the token,
                # so every consumer — subject/object AND predicate,
                # datatype, @prefix, @base — sees one spelling per IRI
                self.toks.append(
                    ("iri", "<" + _unescape(m.group(0)[1:-1]) + ">"))
            else:
                self.toks.append((kind, m.group(0)))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_punct(self, ch: str):
        kind, val = self.next()
        if kind != "punct" or val != ch:
            raise ValueError(f"Turtle parse error: expected {ch!r}, got {val!r}")


class TurtleParser:
    """Recursive-descent Turtle parser producing triple-table rows."""

    def __init__(self, text: str, base: str | None = None, scope: str | None = None):
        self.toks = _Tokens(text)
        self.base = base or ""
        self.prefixes: dict[str, str] = {}
        self.scope = scope or hashlib.md5(text.encode("utf-8")).hexdigest()
        self.anon = 0
        self.rows: list[tuple] = []

    # --- terms --------------------------------------------------------------
    def _resolve(self, iri: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        return self.base + iri

    def _fresh_bnode(self) -> str:
        self.anon += 1
        return TM.skolem(self.scope, f"anon-{self.anon}")

    def _pname(self, tok: str) -> str:
        pfx, _, local = tok.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"Turtle parse error: undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _term(self):
        """-> (kind, val, datatype, lang); consumes tokens. Handles
        nested [ ... ] and ( ... ) by emitting their triples."""
        kind, val = self.toks.next()
        if kind == "iri":
            return ("iri", self._resolve(val[1:-1]), None, None)
        if kind == "bnode":
            return ("bnode", val, None, None)
        if kind == "pname_full":
            return ("iri", self._pname(val), None, None)
        if kind in ("str2", "str1", "str_long3", "str_long1"):
            q = 3 if kind.startswith("str_long") else 1
            lex = _unescape(val[q:-q])
            nk, nv = self.toks.peek()
            if nk == "langtag":
                self.toks.next()
                return ("literal", lex, None, nv[1:])
            if nk == "dtmark":
                self.toks.next()
                dk, dv = self.toks.next()
                if dk == "iri":
                    dt = self._resolve(dv[1:-1])
                elif dk == "pname_full":
                    dt = self._pname(dv)
                else:
                    raise ValueError(f"Turtle parse error: bad datatype {dv!r}")
                return ("literal", lex, dt, None)
            return ("literal", lex, None, None)
        if kind == "integer":
            return ("literal", val, TM.XSD_INTEGER, None)
        if kind == "decimal":
            return ("literal", val, TM.XSD_DECIMAL, None)
        if kind == "double":
            return ("literal", val, TM.XSD + "double", None)
        if kind == "kw" and val in ("true", "false"):
            return ("literal", val, TM.XSD_BOOLEAN, None)
        if kind == "punct" and val == "[":
            label = self._fresh_bnode()
            nk, nv = self.toks.peek()
            if not (nk == "punct" and nv == "]"):
                self._predicate_object_list(("bnode", label))
            self.toks.expect_punct("]")
            return ("bnode", label, None, None)
        if kind == "punct" and val == "(":
            return self._collection()
        if kind == "qt_open":
            # Turtle-star quoted triple << s p o >> (Node_Triple.java:27;
            # LangTurtle's RDF-star extension). Canonical lexical is the
            # term value — component-wise equality becomes string equality.
            s = self._term()
            if s[0] == "literal":
                raise ValueError("Turtle parse error: literal subject in quoted triple")
            p = self._predicate()
            o = self._term()
            ck, cv = self.toks.next()
            if ck != "qt_close":
                raise ValueError(f"Turtle parse error: expected '>>', got {cv!r}")
            return ("triple", TM.quote(s[0], s[1], p, o[0], o[1], o[2], o[3]),
                    None, None)
        raise ValueError(f"Turtle parse error: unexpected term {val!r}")

    def _collection(self):
        items = []
        while True:
            nk, nv = self.toks.peek()
            if nk == "punct" and nv == ")":
                self.toks.next()
                break
            items.append(self._term())
        if not items:
            return ("iri", RDF_NIL, None, None)
        heads = [self._fresh_bnode() for _ in items]
        for i, item in enumerate(items):
            self._emit(("bnode", heads[i], None, None), RDF_FIRST, item)
            rest = (("bnode", heads[i + 1], None, None) if i + 1 < len(items)
                    else ("iri", RDF_NIL, None, None))
            self._emit(("bnode", heads[i], None, None), RDF_REST, rest)
        return ("bnode", heads[0], None, None)

    # --- grammar ------------------------------------------------------------
    graph: str | None = None  # current named graph (TriG blocks)

    def _emit(self, subj, pred: str, obj):
        self.rows.append(
            (subj[0], subj[1], pred, obj[0], obj[1], obj[2], obj[3], self.graph)
        )

    def _predicate(self) -> str:
        kind, val = self.toks.next()
        if kind == "kw" and val == "a":
            return TM.RDF_TYPE
        if kind == "iri":
            return self._resolve(val[1:-1])
        if kind == "pname_full":
            return self._pname(val)
        raise ValueError(f"Turtle parse error: bad predicate {val!r}")

    def _predicate_object_list(self, subj):
        while True:
            pred = self._predicate()
            while True:
                obj = self._term()
                self._emit((subj[0], subj[1]), pred, obj)
                nk, nv = self.toks.peek()
                if nk == "ann_open":
                    # Turtle-star annotation {| p o ; ... |}: metadata on
                    # the quoted form of the triple just emitted
                    self.toks.next()
                    qt = ("triple", TM.quote(subj[0], subj[1], pred,
                                             obj[0], obj[1], obj[2], obj[3]))
                    self._predicate_object_list(qt)
                    ck, cv = self.toks.next()
                    if ck != "ann_close":
                        raise ValueError(
                            f"Turtle parse error: expected '|}}', got {cv!r}")
                    nk, nv = self.toks.peek()
                if nk == "punct" and nv == ",":
                    self.toks.next(); continue
                break
            nk, nv = self.toks.peek()
            if nk == "punct" and nv == ";":
                self.toks.next()
                nk, nv = self.toks.peek()  # trailing ; before . or ]
                if nk == "punct" and nv in (".", "]"):
                    break
                continue
            break

    def _directive(self, val: str) -> None:
        self.toks.next()
        low = val.lower().lstrip("@")
        if low == "prefix":
            pk, pv = self.toks.next()
            if pk != "pname_full" or not pv.endswith(":"):
                raise ValueError(f"bad @prefix name {pv!r}")
            ik, iv = self.toks.next()
            if ik != "iri":
                raise ValueError(f"bad @prefix IRI {iv!r}")
            self.prefixes[pv[:-1]] = self._resolve(iv[1:-1])
        else:  # base
            ik, iv = self.toks.next()
            if ik != "iri":
                raise ValueError(f"bad @base IRI {iv!r}")
            self.base = self._resolve(iv[1:-1])
        nk, nv = self.toks.peek()
        if nk == "punct" and nv == ".":  # @prefix form ends with .
            self.toks.next()

    def _triples_statement(self, subj=None) -> None:
        if subj is None:
            subj = self._term()
        if subj[0] == "literal":
            raise ValueError("Turtle parse error: literal subject")
        nk, nv = self.toks.peek()
        # a bare "[ ... ] ." statement is legal; only parse a
        # predicate-object list if one follows
        if not (nk == "punct" and nv == "."):
            self._predicate_object_list(subj)
        self.toks.expect_punct(".")

    def parse(self) -> list[tuple]:
        while True:
            kind, val = self.toks.peek()
            if kind is None:
                break
            if kind == "prefix_decl":
                self._directive(val)
                continue
            self._triples_statement()
        return self.rows


class TrigParser(TurtleParser):
    """TriG (``riot/RDFLanguages.java:106``, ``riot/lang/LangTriG``):
    Turtle plus named-graph blocks — ``GRAPH <g> { ... }``, bare
    ``<g> { ... }``, and default-graph ``{ ... }`` blocks, interleaved
    with plain Turtle statements."""

    def _block(self, graph_term) -> None:
        if graph_term is not None and graph_term[0] in ("literal", "triple"):
            raise ValueError(f"TriG parse error: {graph_term[0]} graph name")
        self.graph = graph_term[1] if graph_term is not None else None
        self.toks.expect_punct("{")
        while True:
            kind, val = self.toks.peek()
            if kind == "punct" and val == "}":
                self.toks.next()
                break
            if kind is None:
                raise ValueError("TriG parse error: unterminated graph block")
            self._triples_statement()
        self.graph = None

    def _triples_statement(self, subj=None) -> None:
        # inside a block, statements may omit the final '.' before '}'
        if subj is None:
            subj = self._term()
        if subj[0] == "literal":
            raise ValueError("Turtle parse error: literal subject")
        nk, nv = self.toks.peek()
        if not (nk == "punct" and nv in (".", "}")):
            self._predicate_object_list(subj)
        nk, nv = self.toks.peek()
        if nk == "punct" and nv == ".":
            self.toks.next()

    def parse(self) -> list[tuple]:
        while True:
            kind, val = self.toks.peek()
            if kind is None:
                break
            if kind == "prefix_decl":
                self._directive(val)
                continue
            if kind == "graph_kw":
                self.toks.next()
                self._block(self._term())
                continue
            if kind == "punct" and val == "{":
                self._block(None)
                continue
            term = self._term()
            nk, nv = self.toks.peek()
            if nk == "punct" and nv == "{":
                self._block(term)
            else:
                self._triples_statement(subj=term)
        return self.rows


def parse_turtle(text: str, base: str | None = None, scope: str | None = None) -> list[tuple]:
    """Parse one Turtle document -> list of 7-tuples (TERM_COLS order)."""
    return [r[:7] for r in TurtleParser(text, base, scope).parse()]


def parse_trig(text: str, base: str | None = None, scope: str | None = None) -> list[tuple]:
    """Parse one TriG document -> list of 8-tuples (TERM_COLS + graph;
    graph None = default graph)."""
    return TrigParser(text, base, scope).parse()


def read_turtle(spark: SparkSession, path: str, base: str | None = None) -> DataFrame:
    """Read .ttl file(s) into the triple-table schema. Each file is one
    parse unit (document-scoped prefixes + bnode scope); files
    parallelize across executors via ``wholetext`` + ``mapInPandas``."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                out.extend(parse_turtle(txt, base))
            yield pd.DataFrame(
                out,
                columns=["s_kind", "s_val", "p_val", "o_kind", "o_val",
                         "o_datatype", "o_lang"],
            )

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string")
    from pyspark.sql import functions as F

    return (
        files.mapInPandas(_parse, schema)
        .withColumn("graph", F.lit(None).cast("string"))
        .withColumn("conv_id", F.lit(None).cast("string"))
    )


def read_trig(spark: SparkSession, path: str, base: str | None = None) -> DataFrame:
    """Read .trig file(s) into the quad-table schema (TERM_COLS +
    graph); same per-document parallelism as :func:`read_turtle`."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                out.extend(parse_trig(txt, base))
            yield pd.DataFrame(
                out,
                columns=["s_kind", "s_val", "p_val", "o_kind", "o_val",
                         "o_datatype", "o_lang", "graph"],
            )

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string, graph string")
    from pyspark.sql import functions as F

    return (
        files.mapInPandas(_parse, schema)
        .withColumn("conv_id", F.lit(None).cast("string"))
    )


def format_trig(rows: list[tuple]) -> str:
    """Serialize 8-tuples (TERM_COLS + graph) to TriG: default-graph
    statements first, then one named block per graph."""
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in _PREFIXES.items()]
    lines.append("")
    by_graph: dict[str | None, list] = {}
    for r in rows:
        by_graph.setdefault(r[7], []).append(r[:7])
    for g in sorted(by_graph, key=lambda x: (x is not None, x or "")):
        body = format_turtle(by_graph[g])
        body = "\n".join(
            ln for ln in body.splitlines() if not ln.startswith("@prefix")
        ).strip()
        if g is None:
            lines.append(body)
        else:
            lines.append(f"{_fmt_iri(g)} {{\n{body}\n}}")
    return "\n".join(lines) + "\n"


_PREFIXES = {
    "jsv": TM.NS_VOCAB,
    "jse": TM.NS_ENTITY,
    "jsc": TM.NS_CONV,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": RDF,
    "xsd": TM.XSD,
    "owl": "http://www.w3.org/2002/07/owl#",
}

_LOCAL_OK = re.compile(r"^[A-Za-z0-9_][\w.-]*$")


def _fmt_iri(iri: str) -> str:
    for pfx, ns in _PREFIXES.items():
        if iri.startswith(ns):
            local = iri[len(ns):]
            if _LOCAL_OK.match(local):
                return f"{pfx}:{local}"
    return f"<{iri}>"


def _fmt_literal(val: str, datatype: str | None, lang: str | None) -> str:
    esc = (val.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
    out = f'"{esc}"'
    if lang:
        return out + f"@{lang}"
    if datatype:
        return out + f"^^{_fmt_iri(datatype)}"
    return out


def format_turtle(rows: list[tuple]) -> str:
    """Serialize 7-tuples (TERM_COLS order) to Turtle with prefixes and
    subject grouping (``;``) — TurtleWriter's pretty shape. Pure Python
    because output is a single document; the distributed sink is
    :func:`write_turtle` (one document per partition, the same sharding
    RIOT's stream writer has)."""
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in _PREFIXES.items()]
    lines.append("")
    by_subj: dict[tuple, list] = {}
    for r in rows:
        by_subj.setdefault((r[0], r[1]), []).append(r)
    for (s_kind, s_val), group in sorted(by_subj.items()):
        # quoted-triple subjects print their canonical << s p o >>
        # lexical verbatim (valid Turtle-star; components in NT form)
        subj = s_val if s_kind in ("bnode", "triple") else _fmt_iri(s_val)
        parts = []
        for r in sorted(group, key=lambda r: (r[2], r[4])):
            pred = "a" if r[2] == TM.RDF_TYPE else _fmt_iri(r[2])
            if r[3] == "iri":
                obj = _fmt_iri(r[4])
            elif r[3] in ("bnode", "triple"):
                obj = r[4]
            else:
                obj = _fmt_literal(r[4], r[5], r[6])
            parts.append(f"{pred} {obj}")
        lines.append(subj + " " + " ;\n    ".join(parts) + " .")
    return "\n".join(lines) + "\n"


def write_turtle(triples: DataFrame, path: str) -> None:
    """Distributed Turtle sink: each partition serializes one document
    (self-contained prefixes), written as one file per partition."""
    import pandas as pd

    cols = ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype", "o_lang"]

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([tuple(r) for r in pdf[cols].itertuples(index=False)])
        yield pd.DataFrame({"value": [format_turtle(rows)] if rows else []})

    triples.select(*cols).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)


def write_trig(quads: DataFrame, path: str) -> None:
    """Distributed TriG sink: each partition serializes one
    self-contained TriG document (quads of one graph may span
    partitions — blocks for the same graph across files union cleanly
    on read, exactly like RIOT's sharded stream output)."""
    import pandas as pd

    cols = ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype",
            "o_lang", "graph"]

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([
                tuple(None if (isinstance(v, float) and pd.isna(v)) or v is None
                      else v for v in r)
                for r in pdf[cols].itertuples(index=False)
            ])
        yield pd.DataFrame({"value": [format_trig(rows)] if rows else []})

    quads.select(*cols).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)
