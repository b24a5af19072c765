"""SPARQL algebra as SSE text — the ``arq.qparse --print=op`` surface.

Reference (paths relative to /root/reference): ARQ compiles a parsed
query to the Op tree (``jena-arq/.../sparql/algebra/AlgebraGenerator.java``)
and prints it in SSE — symbolic s-expressions — via
``sparql/algebra/op/OpBase.java`` / ``sparql/sse/writers/WriterOp.java``
with the tag vocabulary of ``sparql/sse/Tags.java`` (``bgp``, ``triple``,
``join``, ``leftjoin``, ``union``, ``minus``, ``filter``, ``extend``,
``table``, ``graph``, ``service``, ``path``, ``project``, ``distinct``,
``group``, ``order``, ``slice``). This module prints the SAME algebra
this engine executes (the Parser AST compiled by ``sparql.py``), in
that dialect — the debugging/EXPLAIN surface of the string front-end.

Documented deviations from ARQ's writer (each keeps the output
readable rather than byte-matching a Java pretty-printer):

* FILTER prints at its SYNTACTIC position (wrapping the bindings built
  so far), because that is where this engine applies it — ARQ's
  generator hoists filters to the end of the group;
* aggregate result variables print under their user alias, not ARQ's
  internal ``?.0`` allocations;
* quoted-triple patterns print as ``(qtriple s p o)``;
* property-function patterns print as ``(propfunc <iri> ?subj (args))``;
* blank nodes print ``_:label`` (ARQ allocates ``??0`` style).
"""

from __future__ import annotations

from jena_spark.queries.sparql import (
    Group,
    ParsedQuery,
    Parser,
    PathExpr,
    PFPat,
    QTPat,
    Var,
)

_XSD = "http://www.w3.org/2001/XMLSchema#"
_BARE_NUM = {_XSD + "integer", _XSD + "decimal", _XSD + "double",
             _XSD + "boolean"}

_CMP = {"eq": "=", "ne": "!=", "lt": "<", "le": "<=", "gt": ">", "ge": ">="}
_ARITH = {"add": "+", "subtract": "-", "multiply": "*", "divide": "/"}


def _term(t) -> str:
    if isinstance(t, Var):
        return f"?{t.name}"
    if isinstance(t, QTPat):
        return f"(qtriple {_term(t.s)} {_term(t.p)} {_term(t.o)})"
    kind, val = t[0], t[1]
    if kind == "iri":
        return f"<{val}>"
    if kind == "bnode":
        return f"_:{val.lstrip('_:')}"
    if kind == "triple":
        return f"<<{val}>>"
    dt = t[2] if len(t) > 2 else None
    lang = t[3] if len(t) > 3 else None
    if dt in _BARE_NUM:
        return val
    esc = val.replace("\\", "\\\\").replace('"', '\\"')
    if lang:
        return f'"{esc}"@{lang}'
    if dt:
        return f'"{esc}"^^<{dt}>'
    return f'"{esc}"'


def _path(pe: PathExpr) -> str:
    if pe.op == "link":
        return _term(pe.args[0])
    if pe.op == "inv":
        return f"(reverse {_path(pe.args[0])})"
    if pe.op == "seq":
        return f"(seq {_path(pe.args[0])} {_path(pe.args[1])})"
    if pe.op == "alt":
        return f"(alt {_path(pe.args[0])} {_path(pe.args[1])})"
    if pe.op == "plus":
        return f"(path+ {_path(pe.args[0])})"
    if pe.op == "star":
        return f"(path* {_path(pe.args[0])})"
    if pe.op == "opt":
        return f"(path? {_path(pe.args[0])})"
    if pe.op == "neg":
        inner = " ".join(_term(a) for a in pe.args)
        return f"(notoneof {inner})"
    raise ValueError(f"SSE: unknown path op {pe.op!r}")


def _expr(e) -> str:
    kind = e[0]
    if kind == "var":
        return f"?{e[1]}"
    if kind == "const":
        return _term(e[1])
    if kind == "cmp":
        return f"({_CMP[e[1]]} {_expr(e[2])} {_expr(e[3])})"
    if kind in ("or", "and"):
        tag = "||" if kind == "or" else "&&"
        return f"({tag} {_expr(e[1])} {_expr(e[2])})"
    if kind == "not":
        return f"(! {_expr(e[1])})"
    if kind == "neg":
        return f"(- {_expr(e[1])})"
    if kind == "arith":
        return f"({_ARITH.get(e[1], e[1])} {_expr(e[2])} {_expr(e[3])})"
    if kind == "in":
        return f"(in {_expr(e[1])} " + " ".join(_expr(x) for x in e[2]) + ")"
    if kind == "call":
        _, name, args, distinct, _sep = e
        body = " ".join(_expr(a) for a in args)
        tag = name + (" distinct" if distinct else "")
        return f"({tag}{(' ' + body) if body else ''})"
    if kind == "call_iri":
        body = " ".join(_expr(a) for a in e[2])
        return f"(<{e[1]}>{(' ' + body) if body else ''})"
    raise ValueError(f"SSE: unknown expression kind {kind!r}")


def _bgp(triples: list) -> str:
    rows = []
    for s, p, o in triples:
        rows.append(f"(triple {_term(s)} {_term(p)} {_term(o)})")
    return "(bgp " + " ".join(rows) + ")"


def _group_op(g: Group) -> str:
    """Compilation order of THIS engine's ``_Compiler.compile_group``:
    accumulate basic patterns, join elements left-to-right, OPTIONAL
    becomes leftjoin, and a FILTER wraps the bindings built SO FAR —
    syntactic placement, which is where this engine applies it. (ARQ's
    AlgebraGenerator instead collects filters and wraps the finished
    group; printing that here would show an algebra the engine does
    not execute — the documented deviation.)"""
    acc: str | None = None
    basic: list = []

    def flush():
        nonlocal acc, basic
        if basic:
            join(_bgp(basic))
            basic = []

    def join(op: str):
        nonlocal acc
        acc = op if acc is None else f"(join {acc} {op})"

    for el in g.elements:
        tag = el[0]
        if tag == "triple":
            s, p, o = el[1]
            if isinstance(p, PathExpr):
                flush()
                join(f"(path {_term(s)} {_path(p)} {_term(o)})")
            else:
                basic.append(el[1])
        elif tag == "propfunc":
            flush()
            pf: PFPat = el[1]
            args = " ".join(_term(a) for a in pf.args)
            join(f"(propfunc <{pf.iri}> {_term(pf.subj)} ({args}))")
        elif tag == "filter":
            flush()
            acc = f"(filter {_expr(el[1])} {acc or '(table unit)'})"
        elif tag == "optional":
            flush()
            inner = _group_op(el[1])
            acc = f"(leftjoin {acc or '(table unit)'} {inner})"
        elif tag == "minus":
            flush()
            acc = f"(minus {acc or '(table unit)'} {_group_op(el[1])})"
        elif tag == "exists":
            flush()
            acc = f"(filter (exists {_group_op(el[1])}) {acc or '(table unit)'})"
        elif tag == "not_exists":
            flush()
            acc = (f"(filter (notexists {_group_op(el[1])}) "
                   f"{acc or '(table unit)'})")
        elif tag == "bind":
            flush()
            acc = f"(extend ((?{el[2]} {_expr(el[1])})) {acc or '(table unit)'})"
        elif tag == "values":
            flush()
            names, rows = el[1]
            hdr = " ".join(f"?{n}" for n in names)
            body = " ".join(
                "(row " + " ".join(
                    "UNDEF" if v is None else _term(v) for v in row) + ")"
                for row in rows)
            join(f"(table (vars {hdr}) {body})")
        elif tag == "union":
            flush()
            branches = [_group_op(b) for b in el[1]]
            u = branches[0]
            for b in branches[1:]:
                u = f"(union {u} {b})"
            join(u)
        elif tag == "group":
            flush()
            join(_group_op(el[1]))
        elif tag == "graph":
            flush()
            join(f"(graph {_term(el[1])} {_group_op(el[2])})")
        elif tag == "service":
            flush()
            silent = "silent " if el[1] else ""
            join(f"(service {silent}{_term(el[2])} {_group_op(el[3])})")
        elif tag == "subselect":
            flush()
            join(_query_op(el[1]))
        else:
            raise ValueError(f"SSE: unknown group element {tag!r}")
    flush()
    return acc or "(table unit)"


def _query_op(q: ParsedQuery) -> str:
    op = _group_op(q.where) if q.where is not None else "(table unit)"
    if q.values is not None:
        names, rows = q.values
        hdr = " ".join(f"?{n}" for n in names)
        body = " ".join(
            "(row " + " ".join(
                "UNDEF" if v is None else _term(v) for v in row) + ")"
            for row in rows)
        op = f"(join {op} (table (vars {hdr}) {body}))"
    aggs = [p for p in (q.projection or []) if p[0] == "expr"]
    if q.group_by is not None:
        keys = " ".join(f"?{v}" for v in q.group_by)
        defs = " ".join(f"(?{name} {_expr(e)})" for _, e, name in aggs)
        op = f"(group ({keys}) ({defs}) {op})"
        for h in q.having or []:
            op = f"(filter {_expr(h)} {op})"
    elif aggs and all(_is_agg(e) for _, e, _ in aggs):
        defs = " ".join(f"(?{name} {_expr(e)})" for _, e, name in aggs)
        op = f"(group () ({defs}) {op})"
    elif aggs:
        ext = " ".join(f"(?{name} {_expr(e)})" for _, e, name in aggs)
        op = f"(extend ({ext}) {op})"
    if q.order_by:
        keys = " ".join(
            _expr(e) if asc else f"(desc {_expr(e)})" for e, asc in q.order_by)
        op = f"(order ({keys}) {op})"
    if q.form == "select" and q.projection is not None:
        names = " ".join(f"?{p[1] if p[0] == 'var' else p[2]}"
                         for p in q.projection)
        op = f"(project ({names}) {op})"
    if q.distinct:
        op = f"(distinct {op})"
    if q.limit is not None or q.offset:
        start = q.offset if q.offset else "_"
        length = q.limit if q.limit is not None else "_"
        op = f"(slice {start} {length} {op})"
    return op


def _is_agg(e) -> bool:
    return e[0] == "call" and e[1] in (
        "count", "sum", "avg", "min", "max", "sample", "group_concat",
        "median", "mode", "stddev", "variance")


def query_to_sse(query: str, pretty: bool = True) -> str:
    """Parse a SPARQL string with the engine's own parser and print the
    algebra it will execute, in ARQ's SSE dialect."""
    q = Parser(query).parse()
    flat = _query_op(q)
    return _indent(flat) if pretty else flat


def _tokenize(s: str) -> list[str]:
    """Split an SSE string into '(' / ')' / atom tokens. Quoted
    literals track backslash escapes (a literal may END in an escaped
    backslash), and ``<...>`` IRIs are atomic — parentheses inside an
    IRI never split it."""
    tokens: list[str] = []
    buf = ""
    in_str = in_iri = escaped = False
    for ch in s:
        if in_str:
            buf += ch
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_str = False
            continue
        if in_iri:
            buf += ch
            if ch == ">":
                in_iri = False
            continue
        if ch == '"':
            in_str = True
            buf += ch
            continue
        if ch == "<":
            in_iri = True
            buf += ch
            continue
        if ch in "()":
            if buf.strip():
                tokens.append(buf.strip())
            buf = ""
            tokens.append(ch)
        else:
            buf += ch
    if buf.strip():
        tokens.append(buf.strip())
    return tokens


def _indent(s: str) -> str:
    """Minimal pretty-printer: short or leaf-only lists stay inline,
    anything longer breaks one child per line with two-space nesting —
    the WriterOp layout."""
    tokens = _tokenize(s)

    def render(idx: int, depth: int) -> tuple[str, int]:
        assert tokens[idx] == "("
        parts = []
        i = idx + 1
        while i < len(tokens):
            t = tokens[i]
            if t == "(":
                sub, i = render(i, depth + 1)
                parts.append(sub)
            elif t == ")":
                i += 1
                break
            else:
                parts.append(t)
                i += 1
        flat = "(" + " ".join(parts) + ")"
        if len(flat) <= 78 and "\n" not in flat:
            return flat, i
        head = parts[0] if parts else ""
        pad = "\n" + "  " * (depth + 1)
        # children were rendered at absolute depth+1, so their internal
        # newlines already carry the right padding — only prefix each
        body = "".join(pad + p for p in parts[1:])
        return "(" + head + body + ")", i

    rendered, _ = render(0, 0)
    return rendered
