"""SPARQL string front-end — parse + translate to the algebra layer.

Reference: the main entry path ``QueryFactory.create(String)`` →
``sparql/lang/ParserSPARQL11.java`` (javacc grammar
``jena-arq/Grammar/main/sparql_11.jj``) → ``AlgebraGenerator`` →
``Op`` tree (SURVEY §3.1). This module is the Spark-native twin: a
hand-written recursive-descent parser for the SPARQL 1.1 profile below
that compiles straight onto :mod:`jena_spark.queries.algebra`
combinators (which build the Catalyst plan), the same two-stage shape
(syntax → algebra) as the reference.

Supported profile (errors loudly outside it):

* ``PREFIX`` / ``BASE`` prologue; SELECT (DISTINCT/REDUCED, ``*`` or
  projection incl. ``(expr AS ?v)``), ASK, CONSTRUCT, DESCRIBE
* group graph patterns: triple blocks with ``;`` ``,`` and ``a``,
  nested groups, ``OPTIONAL``, ``MINUS``, ``UNION``, ``FILTER``,
  ``BIND``, ``VALUES`` (inline + trailing), ``FILTER (NOT) EXISTS``
* property paths in verb position: ``iri``, ``^p``, ``p1/p2``,
  ``p1|p2``, ``p+``, ``p*``, ``p?``, ``!(p1|...|pn)``, grouping
* expressions: ``||`` ``&&`` ``!``, comparisons (numeric value-space
  when a side is a numeric constant or an aggregate/numeric function,
  SPARQL term equality otherwise), arithmetic, ``IN``/``NOT IN``, and
  the function library (STR, LANG, DATATYPE, BOUND, STRLEN, UCASE,
  CONTAINS, REGEX, ... — everything in
  :data:`jena_spark.functions.scalar.SPARQL_FUNCTIONS`)
* solution modifiers: GROUP BY / HAVING / ORDER BY (ASC/DESC; the
  SPARQL mixed-term total order via ``order_by_terms``) / LIMIT /
  OFFSET; aggregates COUNT(*)/COUNT/SUM/AVG/MIN/MAX/SAMPLE/
  GROUP_CONCAT(;SEPARATOR=...)
* dataset clauses ``FROM <g>`` / ``FROM NAMED <g>`` over a quad frame
  (ARQ ``DynamicDatasets``): default graph = union of the FROM graphs,
  named graphs restricted to the FROM NAMED set
* ``GRAPH <iri> {...}`` / ``GRAPH ?g {...}`` — when the input frame
  is a QUAD frame (has a ``graph`` column); patterns outside GRAPH
  blocks then match the default graph (null graph column), the SPARQL
  dataset semantics. Over a plain triple table GRAPH raises.
* sub-SELECT (``{ SELECT ... }`` groups, incl. aggregate projections —
  results join the enclosing group as whole-term bindings; aggregate
  values come back as typed literal structs)
* SPARQL-star (the ARQ RDF-star surface, ``sparql/lang/
  ParserSPARQL11.java`` star productions + ``TestTripleTermFunctions``):
  quoted-triple patterns ``<< s p o >>`` in subject/object position
  (ground terms match directly; patterns with variables destructure
  kind='triple' terms JVM-side via regexp), the annotation shorthand
  ``s p o {| q r |}`` (sugar for the triple plus ``<< s p o >> q r``),
  and the functions TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE in
  expressions (term-valued calls bind whole term structs). Variable
  destructuring handles quoted terms nested to
  :data:`jena_spark.queries.rdfstar.MAX_REGEX_DEPTH`.
* ``SERVICE [SILENT] <iri> {...}`` — federated evaluation against the
  dataset registered for the IRI in
  :mod:`jena_spark.queries.service` (the ``ServiceExecutorRegistry``
  analog); an UNREGISTERED http(s) IRI falls through to the real
  SPARQL-protocol client (``QueryIterService.java:36-55`` — the group
  source text is forwarded, the SRJ bindings joined). SILENT + unknown
  endpoint -> unit table. Variable endpoints are out of profile.

Path endpoints carry (kind, val) only — a path step through a typed
literal loses datatype/lang in the binding (same shape as
:mod:`jena_spark.queries.paths`; documented deviation).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark.queries.algebra import Var

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

# --- tokenizer --------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>\s{}|\\^`"]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTSEP>\^\^)
  | (?P<NUM>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>(?:[A-Za-z_][A-Za-z_0-9.\-]*)?:[A-Za-z_0-9.\-]*)
  | (?P<KW>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<OP><<|>>|\{\||\|\}|&&|\|\||!=|<=|>=|[{}().,;*/+\-|^?!<>=\[\]])
""", re.VERBOSE)


@dataclass
class Tok:
    kind: str
    val: str
    pos: int


def tokenize(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"SPARQL: cannot tokenize at {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append(Tok(kind, m.group(), m.start()))
    out.append(Tok("EOF", "", len(s)))
    return out


# --- AST fragments ----------------------------------------------------------

@dataclass
class PathExpr:
    """Property-path tree: op in link/inv/seq/alt/plus/star/opt/neg."""
    op: str
    args: tuple


@dataclass
class QTPat:
    """Quoted-triple pattern with at least one variable component
    (SPARQL-star ``<< s p o >>`` in subject/object position). Ground
    quoted triples become plain ("triple", lexical) term tuples
    instead."""
    s: object
    p: object
    o: object


@dataclass
class PFPat:
    """Property-function pattern (``OpPropFunc``, exec
    ``OpExecutor.java:198``): ``?s <pf-iri> (arg ...)`` where the
    predicate IRI resolves in the PropertyFunctionRegistry analog and
    the object is an argument list of constants. Dispatch covers the
    graph-level library adapters (the jena-spatial family)."""
    subj: object
    iri: str
    args: list


@dataclass
class Group:
    """One group graph pattern, in syntactic order."""
    elements: list = field(default_factory=list)  # ("triple"|...)-tagged


@dataclass
class ParsedQuery:
    form: str                      # select | ask | construct | describe
    distinct: bool = False
    projection: list | None = None  # [("var", name) | ("expr", expr_ast, name)]
    where: Group | None = None
    templates: list | None = None   # construct templates
    describe_terms: list | None = None
    group_by: list | None = None
    having: list | None = None
    order_by: list | None = None    # [(expr_ast_or_var, ascending)]
    limit: int | None = None
    offset: int = 0
    values: tuple | None = None     # trailing VALUES
    from_graphs: list | None = None  # FROM <g> dataset clause IRIs
    from_named: list | None = None   # FROM NAMED <g> IRIs


_KEYWORDS = {
    "select", "ask", "construct", "describe", "where", "prefix", "base",
    "distinct", "reduced", "optional", "minus", "union", "filter", "bind",
    "values", "group", "having", "order", "by", "asc", "desc", "limit",
    "offset", "as", "a", "in", "not", "exists", "true", "false", "undef",
    "separator", "from", "named",
}


class Parser:
    def __init__(self, text: str):
        self.text = text  # kept for SERVICE source-span capture
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._anon = 0

    # --- token helpers ---
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t.kind in ("KW", "PNAME") and t.val.lower() == word:
            self.next()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.kw(word):
            raise ValueError(f"SPARQL: expected {word!r}, got {self.peek().val!r}")

    def op(self, sym: str) -> bool:
        t = self.peek()
        if t.kind == "OP" and t.val == sym:
            self.next()
            return True
        return False

    def expect_op(self, sym: str):
        if not self.op(sym):
            raise ValueError(f"SPARQL: expected {sym!r}, got {self.peek().val!r}")

    # --- terms ---
    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"SPARQL: unknown prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _unescape(self, body: str) -> str:
        return (body.replace("\\\\", "\x00").replace('\\"', '"')
                .replace("\\'", "'").replace("\\n", "\n").replace("\\t", "\t")
                .replace("\\r", "\r").replace("\x00", "\\"))

    def term(self):
        """One RDF term or Var. Returns Var or a normalized tuple
        (kind, val, datatype, lang)."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return Var(t.val[1:])
        if t.kind == "IRI":
            self.next()
            iri = t.val[1:-1]
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri
            return ("iri", iri, None, None)
        if t.kind == "PNAME":
            self.next()
            return ("iri", self._expand_pname(t.val), None, None)
        if t.kind == "STRING":
            self.next()
            lex = self._unescape(t.val[1:-1])
            if self.peek().kind == "LANGTAG":
                return ("literal", lex, None, self.next().val[1:])
            if self.peek().kind == "DTSEP":
                self.next()
                dt = self.term()
                return ("literal", lex, dt[1], None)
            return ("literal", lex, None, None)
        if t.kind == "NUM":
            self.next()
            dt = (XSD + "integer" if re.fullmatch(r"[+-]?\d+", t.val)
                  else XSD + "double" if "e" in t.val.lower()
                  else XSD + "decimal")
            return ("literal", t.val, dt, None)
        if t.kind == "KW" and t.val.lower() in ("true", "false"):
            self.next()
            return ("literal", t.val.lower(), XSD + "boolean", None)
        if t.kind == "KW" and t.val.lower() == "a":
            self.next()
            return ("iri", RDF_NS + "type", None, None)
        if t.kind == "OP" and t.val == "[":
            self.next()
            self.expect_op("]")
            self._anon += 1
            return ("bnode", f"_:sparql-anon-{self._anon}", None, None)
        if t.kind == "OP" and t.val == "<<":
            self.next()
            s = self.term()
            p = self.term()
            o = self.term()
            self.expect_op(">>")
            return self._quoted_of(s, p, o)
        raise ValueError(f"SPARQL: expected term, got {t.val!r}")

    def _quoted_of(self, s, p, o):
        """Quoted form of a triple: a ground ("triple", lexical) term
        when every component is concrete, else a QTPat."""
        from jena_spark import terms as TM

        if isinstance(p, QTPat) or (not isinstance(p, Var) and p[0] != "iri"):
            raise ValueError("SPARQL: quoted-triple predicate must be an IRI")
        if not isinstance(s, (Var, QTPat)) and s[0] == "literal":
            raise ValueError("SPARQL: literal subject in quoted triple")
        if any(isinstance(x, (Var, QTPat)) for x in (s, p, o)):
            return QTPat(s, p, o)
        return ("triple", TM.quote(s[0], s[1], p[1], o[0], o[1], o[2], o[3]),
                None, None)

    # --- prologue + entry ---
    def prologue(self) -> None:
        """PREFIX/BASE declarations (shared by query and update forms)."""
        while True:
            if self.kw("prefix"):
                pn = self.next()
                if pn.kind != "PNAME" or not pn.val.endswith(":"):
                    raise ValueError("SPARQL: bad PREFIX declaration")
                iri = self.next()
                if iri.kind != "IRI":
                    raise ValueError("SPARQL: PREFIX needs an IRI")
                self.prefixes[pn.val[:-1]] = iri.val[1:-1]
            elif self.kw("base"):
                iri = self.next()
                self.base = iri.val[1:-1]
            else:
                return

    def _dataset_clauses(self, q: ParsedQuery) -> None:
        """DatasetClause* — ``FROM <g>`` / ``FROM NAMED <g>`` (SPARQL
        13.2 dataset specification; ARQ ``DatasetDescription.java`` +
        ``DynamicDatasets.java`` build the same description and rewrite
        the dataset before execution, which is what the compiler does
        with the quad frame)."""
        while self.kw("from"):
            named = self.kw("named")
            t = self.term()
            if isinstance(t, Var) or t[0] != "iri":
                raise ValueError("SPARQL: FROM needs an IRI")
            if named:
                q.from_named = (q.from_named or []) + [t[1]]
            else:
                q.from_graphs = (q.from_graphs or []) + [t[1]]

    def parse(self) -> ParsedQuery:
        self.prologue()
        if self.kw("select"):
            q = self._select()
        elif self.kw("ask"):
            q = ParsedQuery(form="ask")
            self._dataset_clauses(q)
            q.where = self.group_graph_pattern(optional_where=True)
        elif self.kw("construct"):
            q = self._construct()
        elif self.kw("describe"):
            q = self._describe()
        else:
            raise ValueError(f"SPARQL: expected query form, got {self.peek().val!r}")
        if self.peek().kind != "EOF":
            raise ValueError(f"SPARQL: trailing input at {self.peek().val!r}")
        return q

    def _select(self) -> ParsedQuery:
        q = ParsedQuery(form="select")
        if self.kw("distinct"):
            q.distinct = True
        elif self.kw("reduced"):
            q.distinct = True  # REDUCED may dedup; we do (documented)
        if self.op("*"):
            q.projection = None
        else:
            proj = []
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    proj.append(("var", self.next().val[1:]))
                elif t.kind == "OP" and t.val == "(":
                    self.next()
                    e = self.expression()
                    self.expect_kw("as")
                    v = self.next()
                    if v.kind != "VAR":
                        raise ValueError("SPARQL: (expr AS ?var) needs a var")
                    self.expect_op(")")
                    proj.append(("expr", e, v.val[1:]))
                else:
                    break
            if not proj:
                raise ValueError("SPARQL: empty SELECT projection")
            q.projection = proj
        self._dataset_clauses(q)
        q.where = self.group_graph_pattern(optional_where=True)
        self._modifiers(q)
        return q

    def _construct(self) -> ParsedQuery:
        q = ParsedQuery(form="construct")
        if self.peek().val != "{":
            # CONSTRUCT WHERE { TriplesTemplate } shorthand (SPARQL 1.1
            # 10.2.3; sparql_11.jj ConstructQuery second alternative):
            # the template IS the pattern — triples only, no FILTER/
            # OPTIONAL/paths (the triples-block parser enforces it)
            self._dataset_clauses(q)
            self.expect_kw("where")
            self.expect_op("{")
            q.templates = self._triples_block(stop="}")
            self.expect_op("}")
            for s, v, o in q.templates:
                if isinstance(v, PathExpr):
                    raise ValueError(
                        "SPARQL: property paths not allowed in "
                        "CONSTRUCT WHERE")
            g = Group()
            for tri in q.templates:
                g.elements.append(("triple", tri))
            q.where = g
            self._modifiers(q)
            return q
        self.expect_op("{")
        q.templates = self._triples_block(stop="}")
        self.expect_op("}")
        self._dataset_clauses(q)
        q.where = self.group_graph_pattern(optional_where=True)
        self._modifiers(q)
        return q

    def _describe(self) -> ParsedQuery:
        q = ParsedQuery(form="describe")
        terms = []
        while self.peek().kind in ("IRI", "PNAME", "VAR"):
            terms.append(self.term())
        if not terms:
            raise ValueError("SPARQL: DESCRIBE needs a term")
        q.describe_terms = terms
        self._dataset_clauses(q)
        if self.peek().kind != "EOF" and (
            self.peek().val == "{" or self.peek().val.lower() == "where"
        ):
            q.where = self.group_graph_pattern(optional_where=True)
        return q

    def _modifiers(self, q: ParsedQuery):
        if self.kw("group"):
            self.expect_kw("by")
            q.group_by = []
            while self.peek().kind == "VAR":
                q.group_by.append(self.next().val[1:])
            if not q.group_by:
                raise ValueError("SPARQL: GROUP BY needs variables")
        if self.kw("having"):
            q.having = [self._bracketed_expr()]
        if self.kw("order"):
            self.expect_kw("by")
            q.order_by = []
            while True:
                if self.kw("asc"):
                    q.order_by.append((self._bracketed_expr(), True))
                elif self.kw("desc"):
                    q.order_by.append((self._bracketed_expr(), False))
                elif self.peek().kind == "VAR":
                    q.order_by.append((("var", self.next().val[1:]), True))
                else:
                    break
            if not q.order_by:
                raise ValueError("SPARQL: ORDER BY needs sort conditions")
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.kw("limit"):
                q.limit = int(self.next().val)
            elif self.kw("offset"):
                q.offset = int(self.next().val)
        if self.kw("values"):
            q.values = self._values_body()

    # --- group graph patterns ---
    def group_graph_pattern(self, optional_where: bool = False) -> Group:
        if optional_where:
            self.kw("where")
        self.expect_op("{")
        # SubSelect (sparql_11.jj GroupGraphPattern ::= '{' (SubSelect |
        # GroupGraphPatternSub) '}')
        t = self.peek()
        if t.kind == "KW" and t.val.lower() == "select":
            self.next()
            sub = self._select()
            self.expect_op("}")
            g = Group()
            g.elements.append(("subselect", sub))
            return g
        g = Group()
        while not self.op("}"):
            t = self.peek()
            low = t.val.lower()
            if t.kind in ("KW", "PNAME") and low == "optional":
                self.next()
                g.elements.append(("optional", self.group_graph_pattern()))
            elif t.kind in ("KW", "PNAME") and low == "minus":
                self.next()
                g.elements.append(("minus", self.group_graph_pattern()))
            elif t.kind in ("KW", "PNAME") and low == "filter":
                self.next()
                if self.kw("exists"):
                    g.elements.append(("exists", self.group_graph_pattern()))
                elif self.kw("not"):
                    self.expect_kw("exists")
                    g.elements.append(("not_exists", self.group_graph_pattern()))
                else:
                    g.elements.append(("filter", self._bracketed_expr()))
            elif t.kind in ("KW", "PNAME") and low == "bind":
                self.next()
                self.expect_op("(")
                e = self.expression()
                self.expect_kw("as")
                v = self.next()
                self.expect_op(")")
                g.elements.append(("bind", e, v.val[1:]))
            elif t.kind in ("KW", "PNAME") and low == "values":
                self.next()
                g.elements.append(("values", self._values_body()))
            elif t.kind == "KW" and low == "graph":
                self.next()
                gterm = self.term()
                g.elements.append(("graph", gterm, self.group_graph_pattern()))
            elif t.kind in ("KW", "PNAME") and low == "service":
                self.next()
                silent = self.kw("silent")
                sterm = self.term()
                if isinstance(sterm, Var):
                    raise ValueError(
                        "SPARQL: SERVICE with a variable endpoint is out "
                        "of profile (register a concrete IRI)")
                # capture the group's SOURCE SPAN too: the HTTP
                # executor forwards the original pattern text to the
                # remote endpoint verbatim (QueryIterService builds the
                # outgoing query from the service sub-op)
                start = self.peek().pos
                sub_g = self.group_graph_pattern()
                end = self.toks[self.i - 1].pos + 1
                g.elements.append(
                    ("service", silent, sterm, sub_g,
                     self.text[start:end]))
            elif t.val == "{":
                sub = self.group_graph_pattern()
                branches = [sub]
                while self.kw("union"):
                    branches.append(self.group_graph_pattern())
                g.elements.append(("union", branches) if len(branches) > 1
                                  else ("group", sub))
            else:
                for tri in self._triples_block(stop="}"):
                    g.elements.append(
                        ("propfunc", tri) if isinstance(tri, PFPat)
                        else ("triple", tri))
            self.op(".")
        return g

    def _values_body(self):
        names = []
        if self.op("("):
            while self.peek().kind == "VAR":
                names.append(self.next().val[1:])
            self.expect_op(")")
        elif self.peek().kind == "VAR":
            names = [self.next().val[1:]]
        else:
            raise ValueError("SPARQL: VALUES needs variables")
        self.expect_op("{")
        rows = []
        while not self.op("}"):
            row = []
            if self.op("("):
                while not self.op(")"):
                    row.append(None if self.kw("undef") else self.term())
            else:
                row.append(None if self.kw("undef") else self.term())
            if len(row) != len(names):
                raise ValueError("SPARQL: VALUES row arity mismatch")
            rows.append(row)
        return (names, rows)

    @staticmethod
    def _pf_registered(iri: str) -> bool:
        from jena_spark.queries import propfunc

        return propfunc.lookup(iri) is not None

    @staticmethod
    def _pf_graph_level(iri: str) -> bool:
        from jena_spark.queries import propfunc

        return propfunc.graph_level(iri)

    def _triples_block(self, stop: str) -> list:
        """TriplesSameSubject(Path) with ';' and ',' lists."""
        out = []
        while True:
            t = self.peek()
            if t.kind == "EOF" or t.val == stop or (
                t.kind in ("KW", "PNAME") and t.val.lower() in (
                    "optional", "minus", "filter", "bind", "values",
                    "union", "graph", "service")
            ) or t.val == "{":
                return out
            subj = self.term()
            while True:
                verb = self.path()
                # property-function pattern: registered IRI verb with a
                # list object -> PFPat (never valid collection syntax
                # otherwise; plain collections are out of profile)
                if (isinstance(verb, tuple) and not isinstance(verb, Var)
                        and verb[0] == "iri"
                        and self._pf_registered(verb[1])):
                    if not self._pf_graph_level(verb[1]):
                        if self.peek().val == "(":
                            # bindings-level library member (strSplit,
                            # list:member, ...): consumes a bindings
                            # frame + Column — no string-front-end
                            # calling convention. Error loudly instead
                            # of dispatching with the wrong signature.
                            raise ValueError(
                                f"SPARQL: <{verb[1]}> is a bindings-"
                                "level property function; call it from "
                                "the Python algebra surface "
                                "(queries.propfunc), not a query string")
                        # non-list object: fall through — an ordinary
                        # triple pattern over that predicate is the
                        # only sensible reading for a bindings-level PF
                    elif self.peek().val != "(":
                        # graph-level PF with a single-node object:
                        # matching data triples for a magic predicate
                        # would silently return nothing — out of
                        # profile, error loudly (module contract)
                        raise ValueError(
                            f"SPARQL: property function <{verb[1]}> "
                            "needs a list object, e.g. ?s <iri> (arg ...)")
                    else:
                        self.next()  # '('
                        pf_args = []
                        while self.peek().val != ")":
                            pf_args.append(self.term())
                        self.expect_op(")")
                        out.append(PFPat(subj, verb[1], pf_args))
                        if not self.op(";"):
                            break
                        if self.peek().val in (".", stop):  # dangling ';'
                            break
                        continue
                while True:
                    obj = self.term()
                    out.append((subj, verb, obj))
                    if self.op("{|"):
                        # SPARQL-star annotation block: sugar for the
                        # asserted triple PLUS << s p o >> q r patterns
                        if isinstance(verb, PathExpr):
                            raise ValueError(
                                "SPARQL: annotation on a property-path "
                                "triple is out of grammar")
                        qt = self._quoted_of(subj, verb, obj)
                        while True:
                            ap = self.path()
                            while True:
                                ao = self.term()
                                out.append((qt, ap, ao))
                                if not self.op(","):
                                    break
                            if not self.op(";"):
                                break
                            if self.peek().val == "|}":
                                break
                        self.expect_op("|}")
                    if not self.op(","):
                        break
                if not self.op(";"):
                    break
                if self.peek().val in (".", stop):  # dangling ';'
                    break
            if not self.op("."):
                return out

    # --- property paths ---
    def path(self) -> PathExpr | tuple | Var:
        """PathAlternative. A bare IRI verb returns the plain term tuple
        and a variable verb returns the Var (both compile to ordinary
        triple patterns)."""
        if self.peek().kind == "VAR":
            return Var(self.next().val[1:])
        e = self._path_seq()
        while self.op("|"):
            e = PathExpr("alt", (e, self._path_seq()))
        if isinstance(e, PathExpr) and e.op == "link":
            return e.args[0]
        return e

    def _path_seq(self):
        e = self._path_elt()
        while self.op("/"):
            e = PathExpr("seq", (e, self._path_elt()))
        return e

    def _path_elt(self):
        inverse = self.op("^")
        if self.op("!"):
            self.expect_op("(")
            preds = [self.term()]
            while self.op("|"):
                preds.append(self.term())
            self.expect_op(")")
            e = PathExpr("neg", tuple(preds))
        elif self.op("("):
            e = self._path_group()
        else:
            t = self.peek()
            if t.kind == "VAR":
                raise ValueError("SPARQL: variable predicates need plain "
                                 "triple patterns, not paths")
            e = PathExpr("link", (self.term(),))
        if inverse:
            e = PathExpr("inv", (e,))
        return self._path_mod(e)

    def _path_group(self):
        e = self._path_seq()
        while self.op("|"):
            e = PathExpr("alt", (e, self._path_seq()))
        self.expect_op(")")
        return self._path_mod(e)

    def _path_mod(self, e):
        if self.op("+"):
            return PathExpr("plus", (e,))
        if self.op("*"):
            return PathExpr("star", (e,))
        if self.op("?"):
            return PathExpr("opt", (e,))
        return e

    # --- expressions ---
    def _bracketed_expr(self):
        self.expect_op("(")
        e = self.expression()
        self.expect_op(")")
        return e

    def expression(self):
        e = self._and_expr()
        while self.op("||"):
            e = ("or", e, self._and_expr())
        return e

    def _and_expr(self):
        e = self._rel_expr()
        while self.op("&&"):
            e = ("and", e, self._rel_expr())
        return e

    def _rel_expr(self):
        e = self._num_expr()
        for sym, name in (("<=", "le"), (">=", "ge"), ("!=", "ne"),
                          ("=", "eq"), ("<", "lt"), (">", "gt")):
            if self.op(sym):
                return ("cmp", name, e, self._num_expr())
        if self.kw("in"):
            return ("in", e, self._expr_list())
        if self.kw("not"):
            self.expect_kw("in")
            return ("not", ("in", e, self._expr_list()))
        return e

    def _expr_list(self):
        self.expect_op("(")
        items = [self.expression()]
        while self.op(","):
            items.append(self.expression())
        self.expect_op(")")
        return items

    def _num_const(self, lex: str):
        """Unsigned numeric lexical -> const expression AST (same
        datatype rule as the term-level NUM branch)."""
        dt = (XSD + "integer" if re.fullmatch(r"\d+", lex)
              else XSD + "double" if "e" in lex.lower()
              else XSD + "decimal")
        return ("const", ("literal", lex, dt, None))

    def _num_expr(self):
        e = self._mul_expr()
        while True:
            if self.op("+"):
                e = ("arith", "add", e, self._mul_expr())
            elif self.op("-"):
                e = ("arith", "subtract", e, self._mul_expr())
            elif (self.peek().kind == "NUM"
                    and self.peek().val[0] in "+-"):
                # grammar rule [116] AdditiveExpression: the tokenizer
                # (like SPARQL's own lexer) eats the sign into a
                # NumericLiteralPositive/Negative token, so `?x+2`
                # means ?x + 2 — re-split the sign here
                t = self.next()
                op = "add" if t.val[0] == "+" else "subtract"
                lit = self._num_const(t.val.lstrip("+-"))
                e = ("arith", op, e, lit)
                # the grammar allows ('*'|'/' UnaryExpression)* after
                # the signed literal: 1+2*3 tokenized (1)(+2)(*)(3)
                while True:
                    if self.op("*"):
                        lit = ("arith", "multiply", lit, self._unary_expr())
                    elif self.op("/"):
                        lit = ("arith", "divide", lit, self._unary_expr())
                    else:
                        break
                    e = (e[0], e[1], e[2], lit)
            else:
                return e

    def _mul_expr(self):
        e = self._unary_expr()
        while True:
            if self.op("*"):
                e = ("arith", "multiply", e, self._unary_expr())
            elif self.op("/"):
                e = ("arith", "divide", e, self._unary_expr())
            else:
                return e

    def _unary_expr(self):
        if self.op("!"):
            return ("not", self._unary_expr())
        if self.op("-"):
            return ("neg", self._unary_expr())
        if self.op("+"):
            return self._unary_expr()
        return self._primary_expr()

    def _primary_expr(self):
        t = self.peek()
        if t.val == "(":
            return self._bracketed_expr()
        if t.kind == "VAR":
            return ("var", self.next().val[1:])
        if t.kind in ("IRI", "PNAME") and self.peek(1).val == "(":
            # custom function call by IRI (ARQ E_Function /
            # FunctionRegistry dispatch, ``sparql/expr/E_Function.java``):
            # <http://...>(args) or pname:local(args); the IRI must be
            # registered via functions.scalar.register
            term = self.term()  # ("iri", full_iri, None, None)
            self.expect_op("(")
            args = []
            if self.peek().val != ")":
                args.append(self.expression())
                while self.op(","):
                    args.append(self.expression())
            self.expect_op(")")
            return ("call_iri", term[1], args)
        if t.kind == "KW" and t.val.lower() not in _KEYWORDS:
            # function call: STRLEN(?x), REGEX(...), COUNT(...)
            name = self.next().val
            self.expect_op("(")
            args = []
            distinct = False
            if self.kw("distinct"):
                distinct = True
            if self.op("*"):
                args.append(("star",))
            elif self.peek().val != ")":
                args.append(self.expression())
                while self.op(","):
                    args.append(self.expression())
            sep = None
            if self.op(";"):
                self.expect_kw("separator")
                self.expect_op("=")
                sep_t = self.next()
                sep = self._unescape(sep_t.val[1:-1])
            self.expect_op(")")
            return ("call", name.lower(), args, distinct, sep)
        # literal / IRI constant
        return ("const", self.term())


# --- compilation to algebra -------------------------------------------------

_AGG_FNS = {"count", "sum", "avg", "min", "max", "sample", "group_concat"}

#: functions whose result is a whole RDF term (struct), not a value —
#: BIND and projection keep the struct instead of wrapping a literal
_TERM_VALUED = {"triple", "subject", "predicate", "object"}

# SPARQL function name -> registry name (where they differ)
_FN_ALIASES = {
    "ucase": "ucase", "lcase": "lcase", "strlen": "strlen", "str": "str",
    "contains": "contains", "strstarts": "strstarts", "strends": "strends",
    "substr": "substr", "concat": "concat", "replace": "replace",
    "regex": "regex", "abs": "abs", "ceil": "ceil", "floor": "floor",
    "round": "round", "rand": "rand", "bound": "bound", "lang": "lang",
    "datatype": "datatype", "isiri": "isiri", "isuri": "isiri",
    "isblank": "isblank", "isliteral": "isliteral", "isnumeric": "isnumeric",
}


class _Compiler:
    def __init__(self, df: DataFrame, parser: Parser):
        if "graph" in df.columns:
            # quad frame: default graph = null graph column
            # (Quad.defaultGraphIRI posture); GRAPH blocks allowed
            self.quads: DataFrame | None = df
            self.triples = df.where(F.col("graph").isNull()).drop("graph")
        else:
            self.quads = None
            self.triples = df
        self.p = parser
        self.spark = df.sparkSession

    def _ctx_frame(self, ctx) -> DataFrame:
        """The triple view for a graph context: None -> default graph,
        ('iri', g) -> that named graph, Var -> all named graphs (the
        graph column kept for binding)."""
        if ctx is None:
            return self.triples
        if self.quads is None:
            raise ValueError("SPARQL: GRAPH needs a quad frame "
                             "(input has no graph column)")
        if isinstance(ctx, Var):
            return self.quads.where(F.col("graph").isNotNull())
        return (self.quads.where(F.col("graph") == ctx[1]).drop("graph"))

    def _quad_pattern(self, frame: DataFrame, pattern, gvar: str) -> DataFrame:
        """triple_pattern + the graph name bound as ?gvar (OpGraph with
        a variable, ``OpExecutor.java:160``)."""
        from jena_spark.queries.algebra import _var_struct_for
        from jena_spark.queries.graph import pattern_predicate

        s, p, o = pattern
        consts = [t if not isinstance(t, Var) else None for t in (s, p, o)]
        df = frame.where(pattern_predicate(*consts))
        cols = {
            gvar: F.struct(
                F.lit("iri").alias("kind"), F.col("graph").alias("val"),
                F.lit("").alias("datatype"), F.lit("").alias("lang"),
            )
        }
        for pos, term in zip(("s", "p", "o"), (s, p, o)):
            if isinstance(term, Var):
                expr = _var_struct_for(pos)
                if term.name in cols:
                    df = df.where(cols[term.name] == expr)
                else:
                    cols[term.name] = expr
        return df.select(*[c.alias(n) for n, c in cols.items()])

    def _bgp_graph_var(self, patterns, gvar: str) -> DataFrame:
        from jena_spark.queries import algebra as A

        frame = self._ctx_frame(Var(gvar))
        out = None
        for pat in A.reorder_patterns(patterns):
            step = self._quad_pattern(frame, pat, gvar)
            out = step if out is None else A.join(out, step)
        return out

    # -- terms/vars to columns --
    def _var_col(self, name: str) -> Column:
        return F.col(name)

    def _is_numeric_ast(self, e) -> bool:
        if e[0] == "const":
            return e[1][2] is not None and e[1][2].startswith(XSD) and \
                e[1][2] not in (XSD + "string", XSD + "boolean", XSD + "dateTime")
        if e[0] in ("arith", "neg"):
            return True
        if e[0] == "call" and e[1] in ("strlen", "abs", "ceil", "floor",
                                       "round", "count", "sum", "avg",
                                       "min", "max", "year", "month", "day"):
            return True
        return False

    def _value(self, e, numeric: bool = False) -> Column:
        """Expression AST -> Column in VALUE space (lexical string or
        decimal shadow when numeric)."""
        from jena_spark.queries.algebra import v, v_num

        kind = e[0]
        if kind == "var":
            return v_num(e[1]) if numeric else v(e[1])
        if kind == "const":
            _k, val, dt, _lang = e[1]
            if numeric:
                return F.lit(val).cast("decimal(38,18)")
            return F.lit(val)
        if kind == "arith":
            from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN

            return FN[e[1]](self._value(e[2], numeric=True),
                            self._value(e[3], numeric=True))
        if kind == "neg":
            return -self._value(e[1], numeric=True)
        if kind == "call":
            return self._call(e)
        if kind == "call_iri":
            # ARQ E_Function: dispatch through the FunctionRegistry
            # analog; args are evaluated to lexical-value columns
            from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN

            if e[1] not in FN:
                raise ValueError(f"SPARQL: unregistered function <{e[1]}>")
            return FN[e[1]](*[self._value(a) for a in e[2]])
        if kind in ("or", "and", "not", "cmp", "in"):
            return self._bool(e)  # boolean value used as a value
        raise ValueError(f"SPARQL: unsupported expression {kind!r}")

    def _term_struct(self, e) -> Column | None:
        """Whole-term struct for term-equality comparisons (vars and
        constants only)."""
        if e[0] == "var":
            return F.col(e[1])
        if e[0] == "const":
            k, val, dt, lang = e[1]
            return F.struct(
                F.lit(k).alias("kind"), F.lit(val).alias("val"),
                F.lit(dt or "").alias("datatype"), F.lit(lang or "").alias("lang"),
            )
        return None

    def _call(self, e) -> Column:
        from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN
        from jena_spark.queries.algebra import v, v_datatype, v_kind, v_lang, v_num

        _, name, args, distinct, sep = e
        if name in _AGG_FNS:
            if name == "count":
                if args and args[0] == ("star",):
                    return F.count(F.lit(1))
                col = self._value(args[0])
                return F.count_distinct(col) if distinct else F.count(col)
            col = self._value(args[0], numeric=name in ("sum", "avg"))
            if distinct and name in ("avg",):
                raise ValueError(
                    "SPARQL: AVG(DISTINCT) is out of profile (no "
                    "distinct-avg aggregate; pre-deduplicate in a "
                    "sub-select)")
            if name == "sum":
                return F.sum_distinct(col) if distinct else F.sum(col)
            if name == "avg":
                return F.avg(col)
            if name == "min":
                return F.min(col)  # DISTINCT is a no-op for min/max/sample
            if name == "max":
                return F.max(col)
            if name == "sample":
                return F.min(col)  # deterministic SAMPLE policy (min)
            if name == "group_concat":
                base = F.collect_set(col) if distinct else F.collect_list(col)
                return F.array_join(
                    F.array_sort(base), sep if sep is not None else " ")
        # term-accessor functions work on the STRUCT, not the value
        if name == "bound" and args and args[0][0] == "var":
            return F.col(args[0][1]).isNotNull()
        if name == "lang" and args and args[0][0] == "var":
            return F.coalesce(v_lang(args[0][1]), F.lit(""))
        if name == "datatype" and args and args[0][0] == "var":
            return v_datatype(args[0][1])
        if name in ("isiri", "isuri") and args and args[0][0] == "var":
            return v_kind(args[0][1]) == "iri"
        if name == "isblank" and args and args[0][0] == "var":
            return v_kind(args[0][1]) == "bnode"
        if name == "isliteral" and args and args[0][0] == "var":
            return v_kind(args[0][1]) == "literal"
        if name == "isnumeric" and args and args[0][0] == "var":
            return FN["isnumeric"](F.col(args[0][1]))
        if name == "istriple" and args and args[0][0] == "var":
            return v_kind(args[0][1]) == "triple"
        if name in _TERM_VALUED:
            # term-valued call used in value position: its lexical form
            return self._term_valued(e).getField("val")
        if name == "str":
            return self._value(args[0])
        reg = _FN_ALIASES.get(name, name)
        if reg not in FN:
            raise ValueError(f"SPARQL: unknown function {name!r}")
        numeric_args = name in ("abs", "ceil", "floor", "round")
        return FN[reg](*[self._value(a, numeric=numeric_args) for a in args])

    def _binding_struct(self, e) -> Column:
        """Expression AST -> the term struct BIND / (expr AS ?v) binds:
        term-valued calls keep their whole-term result; everything else
        wraps the value as a plain literal."""
        if e[0] == "call" and e[1] in _TERM_VALUED:
            return self._term_valued(e)
        return F.struct(
            F.lit("literal").alias("kind"),
            self._value(e).cast("string").alias("val"),
            F.lit("").alias("datatype"), F.lit("").alias("lang"),
        )

    def _term_arg(self, e) -> Column:
        """Expression AST -> whole-term struct (for the triple-term
        functions, which operate on terms, not values)."""
        if e[0] == "call" and e[1] in _TERM_VALUED:
            return self._term_valued(e)
        st = self._term_struct(e)
        if st is None:
            raise ValueError(
                "SPARQL: triple-term functions take variables, constants "
                "or other triple-term calls")
        return st

    def _term_valued(self, e) -> Column:
        """TRIPLE / SUBJECT / PREDICATE / OBJECT — the ARQ triple-term
        function family (``TestTripleTermFunctions.java``); errors map
        to NULL (unbound), the engine's try_cast-style convention."""
        from jena_spark.queries import rdfstar as RS

        _, name, args, _distinct, _sep = e

        def norm(st: Column) -> Column:
            return F.struct(
                st.getField("kind").alias("kind"),
                st.getField("val").alias("val"),
                F.coalesce(st.getField("datatype"), F.lit("")).alias("datatype"),
                F.coalesce(st.getField("lang"), F.lit("")).alias("lang"),
            )

        if name == "triple":
            if len(args) != 3:
                raise ValueError("SPARQL: TRIPLE(s, p, o) takes 3 arguments")
            s, p, o = (self._term_arg(a) for a in args)
            lex = RS.quote_col(
                s.getField("kind"), s.getField("val"), p.getField("val"),
                o.getField("kind"), o.getField("val"),
                F.nullif(o.getField("datatype"), F.lit("")),
                F.nullif(o.getField("lang"), F.lit("")),
            )
            ok = (p.getField("kind") == "iri") & (s.getField("kind") != "literal")
            return F.when(ok, F.struct(
                F.lit("triple").alias("kind"), lex.alias("val"),
                F.lit("").alias("datatype"), F.lit("").alias("lang"),
            ))
        t = self._term_arg(args[0])
        is_t = t.getField("kind") == "triple"
        qs, qp, qo = RS.unquote_cols(t.getField("val"))
        if name == "subject":
            return F.when(is_t, norm(qs))
        if name == "predicate":
            return F.when(is_t, F.struct(
                F.lit("iri").alias("kind"), qp.alias("val"),
                F.lit("").alias("datatype"), F.lit("").alias("lang"),
            ))
        return F.when(is_t, norm(qo))

    def _bool(self, e) -> Column:
        kind = e[0]
        if kind == "or":
            return self._bool(e[1]) | self._bool(e[2])
        if kind == "and":
            return self._bool(e[1]) & self._bool(e[2])
        if kind == "not":
            return ~self._bool(e[1])
        if kind == "cmp":
            _, op, a, b = e
            numeric = self._is_numeric_ast(a) or self._is_numeric_ast(b)
            if op in ("eq", "ne") and not numeric:
                ta, tb = self._term_struct(a), self._term_struct(b)
                if ta is not None and tb is not None:
                    res = ta == tb
                    return ~res if op == "ne" else res
            ca, cb = self._value(a, numeric), self._value(b, numeric)
            return {"eq": ca == cb, "ne": ca != cb, "lt": ca < cb,
                    "le": ca <= cb, "gt": ca > cb, "ge": ca >= cb}[op]
        if kind == "in":
            col = self._value(e[1])
            return col.isin([self._value(x) for x in e[2]])
        if kind == "call":
            return self._call(e).cast("boolean")
        if kind == "call_iri":
            # boolean-valued custom function as the FILTER predicate —
            # same cast the name-based call form gets
            return self._value(e).cast("boolean")
        if kind == "var":
            from jena_spark.queries.algebra import v

            return v(e[1]).cast("boolean")
        raise ValueError(f"SPARQL: expression is not boolean: {e[0]!r}")

    # -- paths --
    def _path_pairs(self, pe: PathExpr, t: DataFrame) -> DataFrame:
        from jena_spark.queries import paths as P

        if pe.op == "link":
            return P.link(t, pe.args[0][1])
        if pe.op == "inv":
            return P.inverse(self._path_pairs(pe.args[0], t))
        if pe.op == "seq":
            return P.seq(self._path_pairs(pe.args[0], t),
                         self._path_pairs(pe.args[1], t))
        if pe.op == "alt":
            return P.alt(self._path_pairs(pe.args[0], t),
                         self._path_pairs(pe.args[1], t))
        if pe.op == "neg":
            return P.neg_prop_set(t, [a[1] for a in pe.args])
        if pe.op == "plus":
            return P.one_or_more(self._path_pairs(pe.args[0], t))
        if pe.op in ("star", "opt"):
            domain = (
                t.select(F.col("s_kind").alias("kind"), F.col("s_val").alias("val"))
                .unionByName(
                    t.select(F.col("o_kind").alias("kind"), F.col("o_val").alias("val")))
                .distinct()
            )
            inner = self._path_pairs(pe.args[0], t)
            from jena_spark.queries.paths import zero_or_more, zero_or_one

            return (zero_or_more(inner, domain) if pe.op == "star"
                    else zero_or_one(inner, domain))
        raise ValueError(f"SPARQL: unsupported path op {pe.op!r}")

    def _pf_bindings(self, pf: PFPat, graph_ctx) -> DataFrame:
        """OpPropFunc (exec ``OpExecutor.java:198``): dispatch a
        registered graph-level property function (the jena-spatial
        library) and bind the subject variable to the produced
        entities as IRI term structs."""
        from jena_spark.queries import propfunc as PFR

        if isinstance(graph_ctx, Var):
            raise ValueError("SPARQL: property functions inside "
                             "GRAPH ?var are out of profile")
        if not isinstance(pf.subj, Var):
            raise ValueError(
                "SPARQL: property-function subject must be a variable")
        fn = PFR.lookup(pf.iri)
        args = []
        for a in pf.args:
            if isinstance(a, Var):
                raise ValueError("SPARQL: property-function arguments "
                                 "must be constants")
            k, val, dt, _lang = a
            if k == "literal" and dt and dt.startswith(XSD):
                local = dt[len(XSD):]
                if local in ("integer", "int", "long"):
                    args.append(int(val))
                    continue
                if local in ("decimal", "double", "float"):
                    args.append(float(val))
                    continue
            args.append(val)
        out = fn(self._ctx_frame(graph_ctx), *args)
        if "ent" not in out.columns:
            raise ValueError(
                f"SPARQL: <{pf.iri}> has no graph-level adapter usable "
                "from query strings")
        # subject term kind: carried through by the adapter when the
        # scan preserves it (points_from_triples exports ent_kind —
        # bnode-subject geometries keep their kind and join correctly
        # with ordinary patterns); 'iri' only as a last resort
        kind = (F.col("ent_kind") if "ent_kind" in out.columns
                else F.lit("iri"))
        return out.select(F.struct(
            kind.alias("kind"), F.col("ent").alias("val"),
            F.lit("").alias("datatype"), F.lit("").alias("lang"),
        ).alias(pf.subj.name))

    def _path_bindings(self, s, pe: PathExpr, o, frame: DataFrame) -> DataFrame:
        """Path triple -> bindings frame with var-struct columns."""
        pairs = self._path_pairs(pe, frame)

        def struct_of(prefix):
            return F.struct(
                F.col(f"{prefix}_kind").alias("kind"),
                F.col(f"{prefix}_val").alias("val"),
                F.lit("").alias("datatype"), F.lit("").alias("lang"),
            )

        df = pairs
        cols = {}
        for term, prefix in ((s, "src"), (o, "dst")):
            if isinstance(term, Var):
                if term.name in cols:
                    df = df.where(cols[term.name] == struct_of(prefix))
                else:
                    cols[term.name] = struct_of(prefix)
            else:
                k, val = term[0], term[1]
                df = df.where((F.col(f"{prefix}_kind") == k)
                              & (F.col(f"{prefix}_val") == val))
        if not cols:
            return df.limit(1).select(F.lit(1).alias("__exists__"))
        return df.select(*[c.alias(n) for n, c in cols.items()])

    # -- SPARQL-star quoted-triple patterns --
    def _qt_bindings(self, tri, frame: DataFrame) -> DataFrame:
        """Triple pattern with a QTPat in subject/object position ->
        bindings frame. Rows whose term kind is 'triple' are
        destructured JVM-side (``rdfstar.unquote_cols`` — regexp inside
        whole-stage codegen, no Python), component variables bind as
        ordinary term structs, constants filter. Nested QTPats recurse
        (depth bounded by ``rdfstar.MAX_REGEX_DEPTH``). One narrow
        filtered scan per pattern — same shape as ``triple_pattern``."""
        from jena_spark.queries import rdfstar as RS
        from jena_spark.queries.algebra import _var_struct_for

        s, p, o = tri
        cols: dict[str, Column] = {}
        conds: list[Column] = []

        def norm(st: Column) -> Column:
            # "" convention for absent datatype/lang (matches
            # _var_struct_for, so joins across binding sources work)
            return F.struct(
                st.getField("kind").alias("kind"),
                st.getField("val").alias("val"),
                F.coalesce(st.getField("datatype"), F.lit("")).alias("datatype"),
                F.coalesce(st.getField("lang"), F.lit("")).alias("lang"),
            )

        def bind(expr: Column, term) -> None:
            if isinstance(term, Var):
                if term.name in cols:
                    conds.append(cols[term.name] == expr)
                else:
                    cols[term.name] = expr
            elif isinstance(term, QTPat):
                conds.append(expr.getField("kind") == "triple")
                qs, qp, qo = RS.unquote_cols(expr.getField("val"))
                bind(norm(qs), term.s)
                bind_pred(qp, term.p)
                bind(norm(qo), term.o)
            else:
                k, val, dt, lang = term
                conds.append((expr.getField("kind") == k)
                             & (expr.getField("val") == val))
                if k == "literal":
                    conds.append(expr.getField("datatype") == (dt or ""))
                    conds.append(expr.getField("lang") == (lang or ""))

        def bind_pred(p_col: Column, term) -> None:
            if isinstance(term, Var):
                bind(F.struct(
                    F.lit("iri").alias("kind"), p_col.alias("val"),
                    F.lit("").alias("datatype"), F.lit("").alias("lang"),
                ), term)
            else:
                conds.append(p_col == term[1])

        bind(_var_struct_for("s"), s)
        bind_pred(F.col("p_val"), p)
        bind(_var_struct_for("o"), o)
        df = frame
        for c in conds:
            df = df.where(c)
        if not cols:
            return df.limit(1).select(F.lit(1).alias("__exists__"))
        return df.select(*[c.alias(n) for n, c in cols.items()])

    def _compile_subselect(self, q: ParsedQuery, graph_ctx=None) -> DataFrame:
        """Sub-SELECT -> STRUCT-typed bindings frame (joins naturally
        with the enclosing group). Aggregate projections come back as
        literal structs whose datatype is derived from the Spark result
        type (count -> xsd:integer, avg -> xsd:decimal/double), so
        value-space filters in the outer query work unchanged."""
        from pyspark.sql import types as T

        from jena_spark.queries import algebra as A

        df = self.compile_group(q.where, graph_ctx)
        if q.values is not None:
            names, rows = q.values
            df = A.join(df, A.values(self.spark, names, rows))

        proj = q.projection
        has_agg = q.group_by is not None or (
            proj is not None and any(pt[0] == "expr" and _has_aggregate(pt[1])
                                     for pt in proj)
        )
        if has_agg:
            keys = q.group_by or []
            aggs = []
            for pt in proj or []:
                if pt[0] == "var":
                    if pt[1] not in keys:
                        raise ValueError(
                            f"SPARQL: non-grouped variable ?{pt[1]} in "
                            "sub-select projection")
                else:
                    aggs.append(self._value(pt[1]).alias(pt[2]))
            # whole-TERM grouping (two terms sharing a lexical form stay
            # distinct groups — SPARQL group keys are RDF terms)
            gb = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
            out = gb.agg(*aggs) if aggs else (
                gb.agg(F.count(F.lit(1)).alias("__n__")).drop("__n__"))
            if q.having:
                for h in q.having:
                    out = out.where(self_having(self, h, out))

            def _wrap(alias: str) -> Column:
                dt = out.schema[alias].dataType
                if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
                    xsd = XSD + "integer"
                elif isinstance(dt, T.DecimalType):
                    xsd = XSD + "decimal"
                elif isinstance(dt, (T.DoubleType, T.FloatType)):
                    xsd = XSD + "double"
                else:
                    xsd = ""
                return F.struct(
                    F.lit("literal").alias("kind"),
                    F.col(alias).cast("string").alias("val"),
                    F.lit(xsd).alias("datatype"), F.lit("").alias("lang"),
                )

            cols = []
            for pt in proj or []:
                if pt[0] == "var":
                    cols.append(F.col(pt[1]))
                else:
                    cols.append(_wrap(pt[2]).alias(pt[2]))
            result = out.select(*cols)
        else:
            names = (sorted(df.columns) if proj is None
                     else [pt[1] if pt[0] == "var" else pt[2] for pt in proj])
            for pt in proj or []:
                if pt[0] == "expr":
                    df = A.extend(df, pt[2], self._binding_struct(pt[1]))
            result = A.project(df, *names)
            if q.distinct:
                result = result.distinct()
        if q.order_by:
            cols = []
            for e, asc in q.order_by:
                if e[0] == "var":
                    for k in A.term_sort_key(e[1]):
                        cols.append(k.asc_nulls_first() if asc
                                    else k.desc_nulls_last())
                else:
                    col = self._value(e)
                    cols.append(col.asc_nulls_first() if asc
                                else col.desc_nulls_last())
            result = result.orderBy(*cols)
        if q.offset:
            result = result.offset(q.offset)
        if q.limit is not None:
            result = result.limit(q.limit)
        return result

    # -- groups --
    def compile_group(self, g: Group, graph_ctx=None) -> DataFrame:
        from jena_spark.queries import algebra as A

        df: DataFrame | None = None
        patterns: list = []

        def flush():
            nonlocal df, patterns
            if patterns:
                if isinstance(graph_ctx, Var):
                    step = self._bgp_graph_var(patterns, graph_ctx.name)
                else:
                    step = A.bgp(self._ctx_frame(graph_ctx), patterns)
                df = step if df is None else A.join(df, step)
                patterns = []

        for el in g.elements:
            tag = el[0]
            if tag == "triple":
                s, verb, o = el[1]
                if isinstance(s, QTPat) or isinstance(o, QTPat):
                    if isinstance(verb, PathExpr) or isinstance(graph_ctx, Var):
                        raise ValueError(
                            "SPARQL: quoted-triple patterns combine with "
                            "plain verbs in a concrete graph context only")
                    flush()
                    step = self._qt_bindings(el[1], self._ctx_frame(graph_ctx))
                    df = step if df is None else A.join(df, step)
                elif isinstance(verb, PathExpr):
                    if isinstance(graph_ctx, Var):
                        raise ValueError(
                            "SPARQL: property paths inside GRAPH ?var "
                            "are out of profile")
                    flush()
                    step = self._path_bindings(s, verb, o,
                                               self._ctx_frame(graph_ctx))
                    df = step if df is None else A.join(df, step)
                else:
                    patterns.append((s, verb if not isinstance(verb, Var)
                                     else verb, o))
            elif tag == "propfunc":
                flush()
                step = self._pf_bindings(el[1], graph_ctx)
                df = step if df is None else A.join(df, step)
            elif tag == "graph":
                flush()
                sub = self.compile_group(el[2], graph_ctx=el[1])
                df = sub if df is None else A.join(df, sub)
            elif tag == "service":
                flush()
                from jena_spark.queries import service as SVC

                _, silent, sterm, sub_g = el[:4]
                raw = el[4] if len(el) > 4 else None
                sub = None
                if (sterm[1] not in SVC.SERVICE_REGISTRY and raw
                        and SVC.is_http_endpoint(sterm[1])):
                    # unregistered http(s) endpoint: real SPARQL-
                    # protocol client (QueryIterService.java:36-55) —
                    # forward the group's source text, join the SRJ
                    # bindings. A registered frame always wins (the
                    # offline default and the 100 TB posture).
                    try:
                        sub = SVC.http_service_group(
                            self.spark, sterm[1], raw, self.p.prefixes)
                    except Exception:
                        if not silent:
                            raise
                else:
                    frame = SVC.service_frame(sterm[1], silent=silent)
                    if frame is not None:
                        # evaluate the group against the ENDPOINT's
                        # dataset (fresh compiler: its default/named
                        # graphs are the remote frame's), then
                        # compatible-binding join. SILENT swallows
                        # evaluation failures too — Jena's
                        # QueryIterService catch yields the unit table
                        # for ANY failure of the remote execution, not
                        # just resolution misses.
                        try:
                            sub = _Compiler(frame,
                                            self.p).compile_group(sub_g)
                        except Exception:
                            if not silent:
                                raise
                if sub is None:
                    # SILENT failure -> unit table (one solution, no
                    # bindings): the join identity, so df is unchanged;
                    # a group that is ONLY the failed service yields
                    # the unit table itself.
                    if df is None:
                        df = self.spark.range(1).select()
                else:
                    df = sub if df is None else A.join(df, sub)
            elif tag == "subselect":
                flush()
                sub = self._compile_subselect(el[1], graph_ctx)
                df = sub if df is None else A.join(df, sub)
            elif tag == "group":
                flush()
                sub = self.compile_group(el[1], graph_ctx)
                df = sub if df is None else A.join(df, sub)
            elif tag == "union":
                flush()
                parts = [self.compile_group(b, graph_ctx) for b in el[1]]
                u = parts[0]
                for pt in parts[1:]:
                    u = A.union_(u, pt)
                df = u if df is None else A.join(df, u)
            elif tag == "optional":
                flush()
                sub = self.compile_group(el[1], graph_ctx)
                df = sub if df is None else A.left_join(df, sub)
            elif tag == "minus":
                flush()
                sub = self.compile_group(el[1], graph_ctx)
                df = sub if df is None else A.minus(df, sub)
            elif tag == "exists":
                flush()
                sub = self.compile_group(el[1], graph_ctx)
                df = sub if df is None else A.exists(df, sub)
            elif tag == "not_exists":
                flush()
                sub = self.compile_group(el[1], graph_ctx)
                df = df if df is None else A.not_exists(df, sub)
            elif tag == "filter":
                flush()
                if df is None:
                    raise ValueError("SPARQL: FILTER before any pattern")
                df = A.filter_(df, self._bool(el[1]))
            elif tag == "bind":
                flush()
                if df is None:
                    raise ValueError("SPARQL: BIND before any pattern")
                df = A.extend(df, el[2], self._binding_struct(el[1]))
            elif tag == "values":
                flush()
                names, rows = el[1]
                vdf = A.values(self.spark, names, rows)
                df = vdf if df is None else A.join(df, vdf)
        flush()
        if df is None:
            raise ValueError("SPARQL: empty group pattern")
        return df


def _has_aggregate(e) -> bool:
    if not isinstance(e, tuple):
        return False
    if e[0] == "call" and e[1] in _AGG_FNS:
        return True
    return any(_has_aggregate(x) for x in e if isinstance(x, (tuple, list)))


def dataset_view(df: DataFrame, from_graphs: list | None,
                 from_named: list | None) -> DataFrame:
    """Rewrite a quad frame per dataset clauses
    (``DynamicDatasets.dynamicDataset``; shared by query FROM/FROM
    NAMED and update USING/USING NAMED): with any clause present the
    dataset is EXACTLY as described — the default graph is the union
    of the FROM graphs (``GraphUnionRead`` dedups, hence the
    distinct), the named graphs are exactly the FROM NAMED set. A
    clause family that is absent yields that side empty (SPARQL 13.2).

    Pure narrow filter + union — partition-preserving, no shuffle
    beyond the default-graph distinct (which only runs over the
    selected graphs, not the whole store)."""
    if not (from_graphs or from_named):
        return df
    if "graph" not in df.columns:
        raise ValueError("SPARQL: FROM/FROM NAMED need a quad frame "
                         "(input has no graph column)")
    cols = df.columns
    tcols = [c for c in cols if c != "graph"]
    if from_graphs:
        default = (
            df.where(F.col("graph").isin(list(from_graphs)))
            .select(tcols).distinct()
            .withColumn("graph", F.lit(None).cast("string"))
        )
    else:
        default = df.limit(0)
    named = (df.where(F.col("graph").isin(list(from_named)) & F.col("graph").isNotNull())
             if from_named else df.limit(0))
    return default.select(cols).unionByName(named.select(cols))


def sparql_query(triples: DataFrame, query: str, flat: bool = True) -> DataFrame:
    """Execute a SPARQL string over the triple table.

    ``flat=True`` (default) returns lexical-value columns (the SELECT
    result-set shape the sinks/oracles consume); ``flat=False`` keeps
    the full term structs. ASK returns one boolean column ``ask``;
    CONSTRUCT/DESCRIBE return triple tables (TERM_COLS)."""
    from jena_spark.queries import algebra as A
    from jena_spark.queries import graph as G

    p = Parser(query)
    q = p.parse()
    triples = dataset_view(triples, q.from_graphs, q.from_named)
    c = _Compiler(triples, p)

    if q.form == "ask":
        df = c.compile_group(q.where)
        return triples.sparkSession.range(1).select(
            F.lit(not df.isEmpty()).alias("ask")
        )

    if q.form == "describe":
        base = c.triples
        out = None
        var_terms = [t for t in q.describe_terms if isinstance(t, Var)]
        if var_terms:
            if q.where is None:
                raise ValueError("SPARQL: DESCRIBE ?var needs a WHERE clause")
            bindings = c.compile_group(q.where)
            for t in var_terms:
                # distributed: semi-join the triple table against the
                # bound terms — never a driver-side collect
                terms = bindings.select(
                    F.col(t.name).getField("kind").alias("k"),
                    F.col(t.name).getField("val").alias("v"),
                ).distinct()
                subj = base.alias("t").join(
                    terms.alias("b"),
                    (F.col("t.s_kind") == F.col("b.k"))
                    & (F.col("t.s_val") == F.col("b.v")),
                    "left_semi",
                )
                obj = base.alias("t").join(
                    terms.alias("b"),
                    (F.col("t.o_kind") == F.col("b.k"))
                    & (F.col("t.o_val") == F.col("b.v")),
                    "left_semi",
                )
                part = G.union(subj, obj)
                out = part if out is None else G.union(out, part)
        for t in q.describe_terms:
            if isinstance(t, Var):
                continue
            part = G.union(G.find(base, s=t[1]), G.find(base, o=(t[0], t[1])))
            out = part if out is None else G.union(out, part)
        return out

    df = c.compile_group(q.where)
    if q.values is not None:
        names, rows = q.values
        df = A.join(df, A.values(triples.sparkSession, names, rows))

    if q.form == "construct":
        pats = [(s, v if not isinstance(v, PathExpr) else v, o)
                for (s, v, o) in q.templates]
        for s, v, o in pats:
            if isinstance(v, PathExpr):
                raise ValueError("SPARQL: paths not allowed in CONSTRUCT template")
        return A.construct(df, q.templates)

    # SELECT
    proj = q.projection
    has_agg = q.group_by is not None or (
        proj is not None and any(pt[0] == "expr" and _has_aggregate(pt[1])
                                 for pt in proj)
    )
    if has_agg:
        keys = q.group_by or []
        aggs = []
        for pt in proj or []:
            if pt[0] == "var":
                if pt[1] not in keys:
                    raise ValueError(
                        f"SPARQL: non-grouped variable ?{pt[1]} in projection")
            else:
                aggs.append(c._value(pt[1]).alias(pt[2]))
        # whole-TERM group keys (SPARQL groups by RDF term, not lexical
        # form); flattened to lexical values only at output
        gb = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
        out = gb.agg(*aggs) if aggs else gb.agg(F.count(F.lit(1)).alias("__n__")).drop("__n__")
        if q.having:
            # HAVING over aggregates already projected by name — the
            # (agg AS ?n) ... HAVING(?n > k) shape; re-evaluating fresh
            # aggregate expressions inside HAVING is out of profile
            for h in q.having:
                out = out.where(self_having(c, h, out))
        cols = []
        for pt in proj or []:
            if pt[0] == "var":
                cols.append(F.col(pt[1]).getField("val").alias(pt[1]))
            else:
                cols.append(F.col(pt[2]))
        result = out.select(*cols)
    else:
        if proj is None:
            names = sorted(df.columns)
        else:
            names = []
            for pt in proj:
                if pt[0] == "var":
                    if pt[1] not in df.columns:
                        # projecting a nowhere-bound variable is legal
                        # SPARQL (e.g. a group that is only a failed
                        # SERVICE SILENT): bind it unbound (null term)
                        df = df.withColumn(
                            pt[1], F.lit(None).cast(
                                "struct<kind:string,val:string,"
                                "datatype:string,lang:string>"))
                    names.append(pt[1])
                else:
                    df = A.extend(df, pt[2], c._binding_struct(pt[1]))
                    names.append(pt[2])
        result = A.project(df, *names)
        if q.distinct:
            result = result.distinct()
        if flat:
            result = A.flatten(result, names)

    if q.order_by:
        cols = []
        for e, asc in q.order_by:
            if e[0] == "var" and not has_agg and not flat:
                for k in A.term_sort_key(e[1]):
                    cols.append(k.asc_nulls_first() if asc else k.desc_nulls_last())
            else:
                colname = e[1] if e[0] == "var" else None
                col = F.col(colname) if colname else c._value(e)
                cols.append(col.asc_nulls_first() if asc else col.desc_nulls_last())
        result = result.orderBy(*cols)
    if q.offset:
        result = result.offset(q.offset)
    if q.limit is not None:
        result = result.limit(q.limit)
    return result


def self_having(c: _Compiler, h, frame: DataFrame | None = None) -> Column:
    """HAVING over already-named aggregate columns: ``HAVING(?n > 3)``
    where ?n was bound by the projection's (agg AS ?n). Group-key
    variables (struct columns) compare by lexical value."""
    from pyspark.sql import types as T

    def conv(e):
        if e[0] == "var":
            col = F.col(e[1])
            if frame is not None and isinstance(
                frame.schema[e[1]].dataType, T.StructType
            ):
                return col.getField("val")
            return col
        if e[0] == "const":
            val = e[1][1]
            dt = e[1][2] or ""
            if dt.startswith(XSD) and dt not in (XSD + "string", XSD + "boolean"):
                return F.lit(val).cast("decimal(38,18)")
            return F.lit(val)
        if e[0] == "cmp":
            a, b = conv(e[2]), conv(e[3])
            return {"eq": a == b, "ne": a != b, "lt": a < b, "le": a <= b,
                    "gt": a > b, "ge": a >= b}[e[1]]
        if e[0] == "and":
            return conv(e[1]) & conv(e[2])
        if e[0] == "or":
            return conv(e[1]) | conv(e[2])
        if e[0] == "not":
            return ~conv(e[1])
        raise ValueError("SPARQL: HAVING supports comparisons over "
                         "projected aggregate variables")
    return conv(h)
