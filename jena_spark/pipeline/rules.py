"""GenericRuleReasoner analog: user-defined forward rules on DataFrames.

Reference contract (paths relative to /root/reference):

* Rule syntax — the embedded recursive-descent grammar of
  ``jena-core/.../reasoner/rulesys/Rule.java`` (doc comment :72-82,
  ``Parser.parseRule`` :1029, ``parseNode`` :920-951, ``parseNumber``
  :953-970): ``[name: (s p o), builtin(args) -> (s p o)]``, commas
  ignored, ``?x`` variables, ``<iri>`` / ``pre:local`` IRIs (resolved
  against ``@prefix`` lines like ``Rule.rulesParserFromReader``
  :545-560), quoted literals with optional ``^^dt``, bare numbers
  (no dot -> xsd:int, dot -> xsd:float, same as ``parseNumber``).
* Engine — ``GenericRuleReasoner.java`` in FORWARD mode drives
  ``FRuleEngine.java`` (naive forward fixpoint; ``RETEEngine.java`` is
  the incremental variant): fire every rule against the current graph,
  assert the consequents, repeat until no new triple appears.
* Builtins — ``reasoner/rulesys/builtins/`` (one class per builtin;
  the subset table below cites each).

Spark-first design (100 TB posture): each rule body is a conjunctive
query — exactly a BGP — so a rule firing is the existing
:mod:`jena_spark.queries.algebra` machinery: per-pattern filtered
scans joined on shared variables (ReorderFixed-ordered), guard
builtins as Catalyst filter expressions, binding builtins as projected
columns, the head as a projection back onto the term columns. The
fixpoint loop is SEMI-NAIVE rather than the reference's naive re-fire:
after the first round each k-pattern rule is evaluated as k variants
where one pattern reads the per-round DELTA and the rest read the full
graph — any new derivation must use at least one new triple, so the
variants are complete, and the per-round anti-join keeps the delta
shrinking. Rounds are ``localCheckpoint``-ed (the repo-wide rule:
a frame with many consumers is otherwise replayed per consumer).

Backward rules (``head <- body``, ``LPBackwardRuleReasoner``) parse
and evaluate through :func:`backward_query` — goal-directed: the
static rule-dependency restriction (the magic-sets seed) picks the
rule subset that can reach the goal predicate, the same semi-naive
closure saturates it, and the goal pattern binds over the result.
For pure monotone rules this equals SLD resolution's answer set;
the tabling the reference's LP engine needs for termination
(``impl/LPInterpreter.java``) is subsumed by the set-semantics
fixpoint.

Deviations from the reference, all raised loudly rather than silently
mis-evaluated: HYBRID mode (forward rules whose heads spawn backward
rules), nested rule heads, functor terms in patterns, ``@include``,
and the non-deterministic or procedural builtins (``makeTemp``,
``now``, ``print``, ``drop``, ``remove``, ``hide``,
``table``/``tableAll``, ``makeInstance``) are ``ValueError``s. ``noValue`` is negation-as-failure evaluated against
the graph state at fire time — same non-monotone caveat as the
reference engine. Numeric comparison builtins compare numbers only
(``Util.comparable`` also admits date pairs; dates are unsupported
here).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.queries import algebra as A
from jena_spark.queries.algebra import Var

XSD = "http://www.w3.org/2001/XMLSchema#"

# PrintUtil.registerPrefixUsage defaults (PrintUtil.java) — the global
# prefix map rule files rely on without declaring
_BUILTIN_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": XSD,
}

# Const term: (kind, val, datatype, lang) — the graph.TermSpec tuple.
Const = tuple


@dataclass(frozen=True)
class BuiltinCall:
    name: str
    args: tuple  # of Var | Const


@dataclass
class ParsedRule:
    name: str | None
    body_patterns: list[tuple]  # (s, p, o) of Var | Const
    body_builtins: list[BuiltinCall]  # in textual order
    head_patterns: list[tuple]
    head_builtins: list[BuiltinCall] = field(default_factory=list)
    is_backward: bool = False  # written "head <- body" (Rule.java:1056)


# --- tokenizer / parser ------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s+ | \#[^\n]* |              # whitespace / comments (Tokenizer.java)
    (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")(?P<dt>\^\^\S+?(?=[\s,()\[\]]|$))? |
    (?P<iri><[^<>\s]*>) |   # no spaces/brackets inside an IRI, so '<-' never matches
    (?P<punct>->|<-|[\[\](),]) |
    (?P<word>[^\s,()\[\]]+)
    """,
    re.VERBOSE,
)

_ESC = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(r"\\(.)", lambda m: _ESC.get(m.group(1), m.group(1)), body)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"rule syntax error at {text[pos:pos+30]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("lit", _unquote(m.group("str"))))
            if m.group("dt"):
                out.append(("dt", m.group("dt")[2:]))
        elif m.group("iri") is not None:
            out.append(("iri", m.group("iri")[1:-1]))
        elif m.group("punct") is not None:
            if m.group("punct") != ",":  # commas are ignored (Rule.java:81)
                out.append(("punct", m.group("punct")))
        elif m.group("word") is not None:
            out.append(("word", m.group("word")))
    return out


_PASSTHROUGH_SCHEMES = ("http", "urn", "file", "ftp", "mailto")


class _Parser:
    """Recursive-descent over the token list (Parser, Rule.java:699)."""

    def __init__(self, tokens: list[tuple[str, str]], prefixes: dict[str, str]):
        self.toks = tokens
        self.i = 0
        self.prefixes = dict(_BUILTIN_PREFIXES) | prefixes
        self._anon = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val: str):
        kind, tok = self.next()
        if tok != val:
            raise ValueError(f"expected {val!r}, found {tok!r}")

    def _expand(self, word: str) -> str:
        pre, _, local = word.partition(":")
        if pre in self.prefixes:
            return self.prefixes[pre] + local
        if pre in _PASSTHROUGH_SCHEMES:  # parseNode:938-942
            return word
        raise ValueError(f"unrecognized qname prefix ({pre}) in rule")

    def parse_term(self):
        kind, tok = self.next()
        if kind == "iri":
            return ("iri", tok, None, None)
        if kind == "lit":
            if self.peek()[0] == "dt":
                dt = self.next()[1]
                if ":" in dt and not dt.startswith("<"):
                    dt = self._expand(dt)
                else:
                    dt = dt.strip("<>")
                return ("literal", tok, dt, None)
            return ("literal", tok, None, None)
        if kind != "word":
            raise ValueError(f"unexpected token {tok!r} in term position")
        if tok.startswith("?"):
            return Var(tok[1:])
        if tok in ("*", "_"):  # parseNode:924 — dropped in the reference too
            raise ValueError("wildcard variables are not supported")
        if ":" in tok:
            return ("iri", self._expand(tok), None, None)
        # bare token: number or plain literal (parseNumber:953-970)
        if re.fullmatch(r"-?\d+", tok):
            return ("literal", tok, XSD + "int", None)
        if re.fullmatch(r"-?\d+\.\d+([eE][+-]?\d+)?", tok):
            return ("literal", tok, XSD + "float", None)
        return ("literal", tok, None, None)

    def parse_clause(self):
        """One body/head clause: triple pattern, builtin call, or the
        unsupported nested rule (parseClause, Rule.java:995)."""
        kind, tok = self.peek()
        if tok == "(":
            self.next()
            terms = []
            while self.peek()[1] != ")":
                terms.append(self.parse_term())
            self.next()
            if len(terms) != 3:
                raise ValueError(f"triple pattern needs 3 terms, got {len(terms)}")
            return ("pattern", tuple(terms))
        if tok == "[":
            raise ValueError("nested (backward) rules are not supported")
        if kind == "word" and not tok.startswith("?"):
            name = self.next()[1]
            self.expect("(")
            args = []
            while self.peek()[1] != ")":
                args.append(self.parse_term())
            self.next()
            return ("builtin", BuiltinCall(name, tuple(args)))
        raise ValueError(f"unexpected token {tok!r} at clause position")

    def parse_rule(self) -> ParsedRule:
        self.expect("[")
        name = None
        # optional "name:" prefix — a word token ending in ':' that is
        # NOT a resolvable qname followed by a clause opener
        kind, tok = self.peek()
        if kind == "word" and tok.endswith(":"):
            name = tok[:-1]
            self.next()
        first_p, first_b = [], []
        while self.peek()[1] not in ("->", "<-"):
            what, clause = self.parse_clause()
            (first_p if what == "pattern" else first_b).append(clause)
        backward = self.next()[1] == "<-"
        second_p, second_b = [], []
        while self.peek()[1] != "]":
            what, clause = self.parse_clause()
            (second_p if what == "pattern" else second_b).append(clause)
        self.next()  # ]
        if backward:  # "head <- body" (Rule.java:1056 swaps the lists)
            body_p, body_b = second_p, second_b
            head_p, head_b = first_p, first_b
        else:
            body_p, body_b = first_p, first_b
            head_p, head_b = second_p, second_b
        if not head_p and not head_b:
            raise ValueError("rule has an empty head")
        for b in head_b:
            if b.name in ("listMapAsSubject", "listMapAsObject") and not backward:
                # ListMapAsSubject/ListMapAsObject.java fire the head
                # template once per list member. Desugared: a binding
                # listContains over a fresh variable in the body plus a
                # plain head pattern over that variable — row-identical
                # to the reference semantics, no procedural head needed.
                if len(b.args) != 3:
                    raise ValueError(
                        f"head builtin {b.name} expects (list, p, o) /"
                        " (s, p, list) — 3 args")
                self._anon += 1
                fresh = Var(f"_lm{self._anon}")
                if b.name == "listMapAsSubject":
                    lst, pp, oo = b.args
                    head_p.append((fresh, pp, oo))
                else:
                    ss, pp, lst = b.args
                    head_p.append((ss, pp, fresh))
                body_b.append(BuiltinCall("listContains", (lst, fresh)))
                continue
            raise ValueError(
                f"head builtin {b.name!r} is not supported (procedural "
                "attachments are driver-side effects, not graph rows)")
        return ParsedRule(name, body_p, body_b, head_p, is_backward=backward)


# Built-in rule libraries for ``@include`` (Rule.java:553-568 maps the
# special names to the shipped reasoner rule sets). These are
# hand-written equivalents of the FORWARD cores:
#
# * RDFS — the ρdf rules of ``etc/rdfs.rules`` (RDFSFBRuleReasoner.
#   loadRules): rdfs5/7/2/3/9/11. Axiomatic rdfs1/4/6/8/10/12/13
#   memberships are omitted (same scope as pipeline/inference.py).
# * OWL — the property-characteristic core of ``etc/owl-fb.rules``
#   (OWLFBRuleReasoner.loadRules): inverseOf (both directions),
#   SymmetricProperty, TransitiveProperty. The variable head
#   predicates disable delta pruning, which is correct — any
#   predicate can become derivable. Plus the forward class-expression
#   extraction rules of owl-fb: equivalentClass/equivalentProperty as
#   mutual sub-links and intersectionOf/unionOf list extraction via
#   the listMapAs* head builtins (recognition — "instance of ALL
#   members ⇒ instance of the intersection" — is owl-fb's TABLED
#   backward half and stays out of the forward core, same split as
#   the reference). Pair with ``@include <rdfs>`` for the sub-link
#   rules to propagate instances, as OWLFBRuleReasoner does.
_INCLUDE_LIBS = {
    "rdfs": """
    [rdfs5:  (?p1 rdfs:subPropertyOf ?p2), (?p2 rdfs:subPropertyOf ?p3)
             -> (?p1 rdfs:subPropertyOf ?p3)]
    [rdfs7:  (?p1 rdfs:subPropertyOf ?p2), (?s ?p1 ?o) -> (?s ?p2 ?o)]
    [rdfs2:  (?p rdfs:domain ?c), (?s ?p ?o) -> (?s rdf:type ?c)]
    [rdfs3:  (?p rdfs:range ?c), (?s ?p ?o), notLiteral(?o) -> (?o rdf:type ?c)]
    [rdfs11: (?c1 rdfs:subClassOf ?c2), (?c2 rdfs:subClassOf ?c3)
             -> (?c1 rdfs:subClassOf ?c3)]
    [rdfs9:  (?c1 rdfs:subClassOf ?c2), (?s rdf:type ?c1) -> (?s rdf:type ?c2)]
    """,
    "owl": """
    [inv1: (?p owl:inverseOf ?q), (?s ?p ?o) -> (?o ?q ?s)]
    [inv2: (?p owl:inverseOf ?q), (?s ?q ?o) -> (?o ?p ?s)]
    [sym:  (?p rdf:type owl:SymmetricProperty), (?s ?p ?o) -> (?o ?p ?s)]
    [trans: (?p rdf:type owl:TransitiveProperty), (?x ?p ?y), (?y ?p ?z)
            -> (?x ?p ?z)]
    [equivalentClass1: (?p owl:equivalentClass ?q)
            -> (?p rdfs:subClassOf ?q), (?q rdfs:subClassOf ?p)]
    [equivalentProperty1: (?p owl:equivalentProperty ?q)
            -> (?p rdfs:subPropertyOf ?q), (?q rdfs:subPropertyOf ?p)]
    [intersectionOf1: (?c owl:intersectionOf ?l)
            -> listMapAsObject(?c, rdfs:subClassOf, ?l)]
    [unionOf1: (?c owl:unionOf ?l)
            -> listMapAsSubject(?l, rdfs:subClassOf, ?c)]
    """,
}


def parse_rules(text: str) -> list[ParsedRule]:
    """``Rule.parseRules`` for the supported forward/backward subset.

    Handles ``@prefix pre: <uri>.`` lines and ``@include <rdfs>`` /
    ``<owl>`` library splicing (rulesParserFromReader,
    ``Rule.java:545-575``); owlmicro/owlmini and URL includes raise."""
    prefixes: dict[str, str] = {}
    rule_lines: list[str] = []
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("@prefix"):
            m = re.match(r"@prefix\s+(\w*):\s*<([^>]*)>\s*\.?\s*$", stripped)
            if not m:
                raise ValueError(f"malformed @prefix line: {stripped!r}")
            prefixes[m.group(1)] = m.group(2)
        elif stripped.startswith("@include"):
            m = re.match(r"@include\s+<([^>]*)>\s*\.?\s*$", stripped)
            if not m:
                raise ValueError(f"malformed @include line: {stripped!r}")
            lib = _INCLUDE_LIBS.get(m.group(1).lower())
            if lib is None:
                raise ValueError(
                    f"@include <{m.group(1)}> is not supported — built-in "
                    "libraries are <rdfs> and <owl>; inline other rules")
            rule_lines.append(lib)
        else:
            rule_lines.append(line)
    toks = _tokenize("\n".join(rule_lines))
    p = _Parser(toks, prefixes)
    rules = []
    while p.peek()[0] != "eof":
        rules.append(p.parse_rule())
        if p.peek()[1] == ".":  # optional separator
            p.next()
    if not rules:
        raise ValueError("no rules found")
    return rules


# --- builtin evaluation ------------------------------------------------------

_UNSUPPORTED = {
    "makeTemp": "non-deterministic bnode allocation (determinism policy — "
                "use makeSkolem)",
    "now": "non-deterministic (determinism policy)",
    "print": "procedural side effect",
    "drop": "mutates the rule set at run time",
    "remove": "non-monotonic retraction",
    "hide": "engine directive",
    "table": "backward-engine directive",
    "tableAll": "backward-engine directive",
    "makeInstance": "backward-engine helper",
    "isFunctor": "functor terms are unsupported",
    "notFunctor": "functor terms are unsupported",
}


def _lex(t, df_cols: set[str]) -> Column:
    """Lexical form of a term (StrConcat.lex — bnodes print their id)."""
    if isinstance(t, Var):
        if t.name not in df_cols:
            raise ValueError(f"builtin argument ?{t.name} is unbound")
        return F.col(t.name).getField("val")
    return F.lit(t[1])


def _num(t, df_cols: set[str]) -> Column:
    return _lex(t, df_cols).try_cast("double")


def _struct(t, df_cols: set[str]) -> Column:
    if isinstance(t, Var):
        if t.name not in df_cols:
            raise ValueError(f"builtin argument ?{t.name} is unbound")
        return F.col(t.name)
    kind, val, dt, lang = t
    return F.struct(
        F.lit(kind).alias("kind"), F.lit(val).alias("val"),
        F.lit(dt or "").alias("datatype"), F.lit(lang or "").alias("lang"),
    )


def _plain_literal(val: Column) -> Column:
    return F.struct(
        F.lit("literal").alias("kind"), val.alias("val"),
        F.lit("").alias("datatype"), F.lit("").alias("lang"),
    )


_INT_DTS = {
    XSD + s for s in (
        "int", "integer", "long", "short", "byte", "nonNegativeInteger",
        "nonPositiveInteger", "positiveInteger", "negativeInteger",
        "unsignedInt", "unsignedLong", "unsignedShort", "unsignedByte",
    )
}


def _is_int_term(t, df_cols: set[str]) -> Column:
    if isinstance(t, Var):
        return F.col(t.name).getField("datatype").isin(*sorted(_INT_DTS))
    return F.lit(t[2] in _INT_DTS)


def _numeric_result(a, b, op, df_cols: set[str]) -> Column:
    """Arithmetic builtins preserve int-ness when both args are integer
    literals (Util.makeIntNode vs makeDoubleNode in Sum.java etc.)."""
    x, y = _num(a, df_cols), _num(b, df_cols)
    val = op(x, y)
    both_int = _is_int_term(a, df_cols) & _is_int_term(b, df_cols)
    return F.when(
        both_int,
        F.struct(F.lit("literal").alias("kind"),
                 val.try_cast("long").cast("string").alias("val"),
                 F.lit(XSD + "int").alias("datatype"), F.lit("").alias("lang")),
    ).otherwise(
        F.struct(F.lit("literal").alias("kind"),
                 val.cast("string").alias("val"),
                 F.lit(XSD + "double").alias("datatype"), F.lit("").alias("lang"))
    )


def _bind(df: DataFrame, out, col: Column) -> DataFrame:
    """Bind a builtin result: new column if the output arg is an unbound
    var, equality filter if already bound (BindingEnvironment.bind)."""
    if not isinstance(out, Var):
        return df.where(_struct(out, set(df.columns)) == col)
    if out.name in df.columns:
        return df.where(F.col(out.name) == col)
    return df.withColumn(out.name, col)


def _apply_builtin(df: DataFrame, b: BuiltinCall, graph: DataFrame) -> DataFrame:
    """One body builtin as a Catalyst filter / projected column.

    Each branch cites its reference class in
    ``jena-core/.../reasoner/rulesys/builtins/``."""
    cols = set(df.columns)
    n, a = b.name, list(b.args)

    def need(k: int):
        if len(a) != k:
            raise ValueError(f"builtin {n} expects {k} args, got {len(a)}")

    if n in _UNSUPPORTED:
        raise ValueError(f"builtin {n!r} is not supported: {_UNSUPPORTED[n]}")

    # -- guards (filter builtins) --
    if n in ("equal", "notEqual"):  # Equal.java / NotEqual.java: sameValueAs
        need(2)
        x, y = _struct(a[0], cols), _struct(a[1], cols)
        nx, ny = _num(a[0], cols), _num(a[1], cols)
        same = (x == y) | (nx.isNotNull() & ny.isNotNull() & (nx == ny))
        return df.where(same if n == "equal" else ~same)
    if n in ("lessThan", "greaterThan", "le", "ge"):
        # LessThan/GreaterThan/LE/GE.java: Util.comparable + typed compare
        # (numbers only here; reference also compares date pairs)
        need(2)
        x, y = _num(a[0], cols), _num(a[1], cols)
        cmp = {"lessThan": x < y, "greaterThan": x > y, "le": x <= y, "ge": x >= y}[n]
        return df.where(x.isNotNull() & y.isNotNull() & cmp)
    if n in ("isLiteral", "notLiteral", "isBNode", "notBNode"):
        need(1)
        kind = "literal" if "Literal" in n else "bnode"
        cond = _struct(a[0], cols).getField("kind") == kind
        return df.where(cond if n.startswith("is") else ~cond)
    if n in ("isDType", "notDType"):  # IsDType.java: literal of the datatype
        need(2)
        s = _struct(a[0], cols)
        cond = (s.getField("kind") == "literal") & (
            s.getField("datatype") == _lex(a[1], cols))
        return df.where(cond if n == "isDType" else ~cond)
    if n in ("bound", "unbound"):  # Bound.java / Unbound.java
        need(1)
        cond = (_struct(a[0], cols).isNotNull()
                if isinstance(a[0], Var) and a[0].name in cols else F.lit(not isinstance(a[0], Var)))
        return df.where(cond if n == "bound" else ~cond)
    if n == "noValue":  # NoValue.java: no triple (s,p,*) / (s,p,o) exists
        if len(a) not in (2, 3):
            raise ValueError("noValue expects (s,p) or (s,p,o)")
        cond = F.lit(True)
        g = graph.select(*TM.TERM_COLS)
        for pos, term in zip(("s", "p", "o"), a + [None] * (3 - len(a))):
            if term is None:
                continue
            t = _struct(term, cols)
            if pos == "s":
                cond = cond & (F.col("s_kind") == t.getField("kind")) & (
                    F.col("s_val") == t.getField("val"))
            elif pos == "p":
                cond = cond & (F.col("p_val") == t.getField("val"))
            else:
                cond = cond & (F.col("o_kind") == t.getField("kind")) & (
                    F.col("o_val") == t.getField("val")) & (
                    F.coalesce(F.col("o_datatype"), F.lit("")) == t.getField("datatype")) & (
                    F.coalesce(F.col("o_lang"), F.lit("")) == t.getField("lang"))
        return df.join(g, cond, "left_anti")
    if n == "regex":  # Regex.java: full-region match, groups bind trailing args
        if len(a) < 2:
            raise ValueError("regex expects (text, pattern[, groups...])")
        if not (isinstance(a[1], tuple) and a[1][0] == "literal"):
            raise ValueError("regex pattern must be a literal constant")
        pat = "^(?:" + a[1][1] + ")$"  # Matcher.matches() anchoring
        out = df.where(_lex(a[0], cols).rlike(pat))
        for i, g_arg in enumerate(a[2:], start=1):
            out = _bind(out, g_arg,
                        _plain_literal(F.regexp_extract(_lex(a[0], set(out.columns)), pat, i)))
        return out
    if n == "countLiteralValues":
        # CountLiteralValues.java: bind arg0 to the number of distinct
        # LITERAL values of (arg1, arg2) in the graph — the helper the
        # OWL cardinality rules use. One partial-aggregatable
        # groupBy over the literal slice, broadcast-joined back
        # (vocab-shaped group keys); subjects with no literal values
        # count 0 (the reference returns an explicit 0 node too).
        need(3)
        out_arg, s_arg, p_arg = a
        counts = (
            graph.where(F.col("o_kind") == "literal")
            .groupBy(
                F.col("s_kind").alias("_ck"), F.col("s_val").alias("_cv"),
                F.col("p_val").alias("_cp"))
            # count(DISTINCT a,b,c) drops any-NULL rows — normalize the
            # optional term columns first (plain literals have NULL dt/lang)
            .agg(F.count_distinct(
                F.col("o_val"), F.coalesce(F.col("o_datatype"), F.lit("")),
                F.coalesce(F.col("o_lang"), F.lit(""))).alias("_n"))
        )
        s_t, p_t = _struct(s_arg, cols), _struct(p_arg, cols)
        joined = df.join(
            counts,
            (counts["_ck"] == s_t.getField("kind"))
            & (counts["_cv"] == s_t.getField("val"))
            & (counts["_cp"] == p_t.getField("val")),
            "left",
        ).drop("_ck", "_cv", "_cp")
        col = F.struct(
            F.lit("literal").alias("kind"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("string").alias("val"),
            F.lit(XSD + "int").alias("datatype"), F.lit("").alias("lang"),
        )
        return _bind(joined, out_arg, col).drop("_n")
    if n.startswith("list") and n not in ("listContains", "listNotContains"):
        raise ValueError(f"builtin {n!r} is not supported (RDF list walks — "
                         "use queries.propfunc list:* property functions)")

    # -- binders --
    if n in ("strConcat", "uriConcat"):  # StrConcat.java / UriConcat.java
        if len(a) < 1:
            raise ValueError(f"{n} needs at least the output argument")
        val = F.concat(*[_lex(x, cols) for x in a[:-1]]) if len(a) > 1 else F.lit("")
        col = (_plain_literal(val) if n == "strConcat" else
               F.struct(F.lit("iri").alias("kind"), val.alias("val"),
                        F.lit("").alias("datatype"), F.lit("").alias("lang")))
        return _bind(df, a[-1], col)
    if n in ("sum", "difference", "product", "quotient", "min", "max"):
        # Sum/Difference/Product/Quotient/Min/Max.java: (a, b, ?c) —
        # the reference builtins refuse to fire on non-numeric
        # operands, so rows where the cast comes back NULL are dropped
        # rather than emitting a NULL-valued term
        need(3)
        ops = {
            "sum": lambda x, y: x + y, "difference": lambda x, y: x - y,
            "product": lambda x, y: x * y, "quotient": lambda x, y: x / y,
            "min": F.least, "max": F.greatest,
        }
        col = _numeric_result(a[0], a[1], ops[n], cols)
        return _bind(df.where(_num(a[0], cols).isNotNull()
                              & _num(a[1], cols).isNotNull()), a[2], col)
    if n == "addOne":  # AddOne.java: (a, ?b); non-numeric -> no fire
        need(2)
        one = ("literal", "1", XSD + "int", None)
        col = _numeric_result(a[0], one, lambda x, y: x + y, cols)
        return _bind(df.where(_num(a[0], cols).isNotNull()), a[1], col)
    if n == "makeSkolem":  # MakeSkolem.java: ?out <- bnode keyed on args
        if len(a) < 1:
            raise ValueError("makeSkolem needs the output argument first")
        key = F.concat_ws(
            "", *[_struct(x, cols).cast("string") for x in a[1:]])
        col = F.struct(F.lit("bnode").alias("kind"),
                       F.concat(F.lit("skolem-"), F.md5(key)).alias("val"),
                       F.lit("").alias("datatype"), F.lit("").alias("lang"))
        return _bind(df, a[0], col)

    if n in ("listContains", "listNotContains"):
        # ListContains/ListNotContains.java — membership of arg 2 in the
        # rdf:first/rdf:rest list arg 1, against the CURRENT graph. With
        # an unbound second arg, listContains is a BINDER enumerating the
        # members (the expansion target of the listMapAsSubject /
        # listMapAsObject head builtins, which parse_rule desugars into
        # exactly this form over a fresh variable).
        need(2)
        mem = F.broadcast(_list_members(graph))  # TBox-sized by posture
        lst = _struct(a[0], cols)
        on = ((lst.getField("kind") == mem["_lc_k"])
              & (lst.getField("val") == mem["_lc_v"]))
        if (n == "listContains" and isinstance(a[1], Var)
                and a[1].name not in cols):
            return (df.join(mem, on)
                      .withColumn(a[1].name, F.col("_lc_m"))
                      .drop("_lc_k", "_lc_v", "_lc_m"))
        cond = on & (_struct(a[1], cols) == mem["_lc_m"])
        how = "left_semi" if n == "listContains" else "left_anti"
        return df.join(mem, cond, how)

    raise ValueError(f"unknown builtin {n!r} (BuiltinRegistry has no analog here)")


def _list_members(graph: DataFrame) -> DataFrame:
    """``(_lc_k, _lc_v, _lc_m)``: for every RDF collection node in
    ``graph``, one row per member term reachable via rdf:rest*/rdf:first
    (``Util.convertList`` in the reference builtins). Reachability is
    path-doubled — log rounds in the longest list — and every frame is
    schema-vocabulary-sized (lists appear in TBox positions such as
    owl:unionOf), so the result is broadcastable by construction."""
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rest = (graph.where(F.col("p_val") == rdf_ns + "rest")
            .select(F.col("s_kind").alias("a_k"), F.col("s_val").alias("a_v"),
                    F.col("o_kind").alias("b_k"), F.col("o_val").alias("b_v")))
    first = (graph.where(F.col("p_val") == rdf_ns + "first")
             .select(F.col("s_kind").alias("b_k"), F.col("s_val").alias("b_v"),
                     F.struct(
                         F.col("o_kind").alias("kind"),
                         F.col("o_val").alias("val"),
                         F.coalesce("o_datatype", F.lit("")).alias("datatype"),
                         F.coalesce("o_lang", F.lit("")).alias("lang"),
                     ).alias("_lc_m")))
    cells = (rest.select(F.col("a_k").alias("k"), F.col("a_v").alias("v"))
             .unionByName(first.select(F.col("b_k").alias("k"),
                                       F.col("b_v").alias("v")))
             .distinct())
    reach = (cells.select(F.col("k").alias("a_k"), F.col("v").alias("a_v"),
                          F.col("k").alias("b_k"), F.col("v").alias("b_v"))
             .unionByName(rest).distinct().localCheckpoint(eager=True))
    for _ in range(8):  # doubling: lists up to 2^8 cells
        n0 = reach.count()
        step = (reach.alias("x").join(
                    reach.alias("y"),
                    (F.col("x.b_k") == F.col("y.a_k"))
                    & (F.col("x.b_v") == F.col("y.a_v")))
                .select(F.col("x.a_k").alias("a_k"),
                        F.col("x.a_v").alias("a_v"),
                        F.col("y.b_k").alias("b_k"),
                        F.col("y.b_v").alias("b_v")))
        reach = (reach.unionByName(step).distinct()
                 .localCheckpoint(eager=True))
        if reach.count() == n0:
            break
    else:
        raise ValueError("rdf list longer than 256 cells — not a TBox list")
    return (reach.join(first, ["b_k", "b_v"])
            .select(F.col("a_k").alias("_lc_k"), F.col("a_v").alias("_lc_v"),
                    "_lc_m"))


# --- head emission -----------------------------------------------------------

def _head_cols(term, pos: str, cols: set[str]) -> list[Column]:
    """Project one head-pattern position onto the term columns."""
    if isinstance(term, Var):
        if term.name not in cols:
            raise ValueError(f"head variable ?{term.name} is unbound in the body")
        s = F.col(term.name)
        kind, val = s.getField("kind"), s.getField("val")
        dt = F.nullif(s.getField("datatype"), F.lit(""))
        lang = F.nullif(s.getField("lang"), F.lit(""))
    else:
        k, v_, d, lg = term
        kind, val = F.lit(k), F.lit(v_)
        dt, lang = F.lit(d).cast("string"), F.lit(lg).cast("string")
    if pos == "s":
        return [kind.alias("s_kind"), val.alias("s_val")]
    if pos == "p":
        return [val.alias("p_val")]
    return [kind.alias("o_kind"), val.alias("o_val"),
            dt.alias("o_datatype"), lang.alias("o_lang")]


def _emit_head(bindings: DataFrame, patterns: list[tuple]) -> DataFrame:
    cols = set(bindings.columns)
    outs = []
    for s, p, o in patterns:
        proj = _head_cols(s, "s", cols) + _head_cols(p, "p", cols) + _head_cols(o, "o", cols)
        outs.append(bindings.select(*proj).select(*TM.TERM_COLS))
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionByName(o_)
    return out


# --- the forward engine ------------------------------------------------------

def _fire_rule(rule: ParsedRule, frames: list[DataFrame], graph: DataFrame) -> DataFrame:
    """One rule firing: BGP join chain (pattern i reads frames[i]),
    builtins in textual order, head projection."""
    out = None
    for pat, frame in zip(rule.body_patterns, frames):
        step = A.triple_pattern(frame, pat)
        out = step if out is None else A.join(out, step)
    if out is None:
        if rule.body_builtins:
            raise ValueError(
                f"rule {rule.name or '<anon>'} has no body triple pattern — "
                "builtin-only bodies cannot be evaluated against a graph")
        # axiom rule "-> (a p b)": one unconditional firing with a
        # no-variable binding row (Rule.java axioms; FRuleEngine adds
        # them before the fixpoint)
        out = graph.sparkSession.range(1).select()
    for b in rule.body_builtins:
        out = _apply_builtin(out, b, graph)
    return _emit_head(out, rule.head_patterns)


def _union_all(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _anti(new: DataFrame, seen: DataFrame) -> DataFrame:
    d, b = new.alias("d"), seen.alias("b")
    cond = F.lit(True)
    for c in TM.TERM_COLS:
        cond = cond & F.col(f"d.{c}").eqNullSafe(F.col(f"b.{c}"))
    return d.join(b, cond, "left_anti")


def rule_closure(
    triples: DataFrame,
    rules: str | list[ParsedRule],
    max_iter: int = 50,
) -> DataFrame:
    """Input triples + everything the forward rules entail (set
    semantics) — ``GenericRuleReasoner`` FORWARD mode
    (``FRuleEngine.java`` fixpoint), evaluated semi-naive (module
    docstring). Raises after ``max_iter`` rounds without convergence
    (a value-generating rule like recursive strConcat never converges;
    the reference engine would spin forever)."""
    if isinstance(rules, str):
        rules = parse_rules(rules)
    for r in rules:
        if r.is_backward:
            raise ValueError(
                f"rule {r.name or '<anon>'} is backward (head <- body) — "
                "use backward_query for goal-directed evaluation")
    # logical join order per rule body: ReorderFixed, like every other
    # BGP in this engine (builtins always evaluate after the full chain,
    # so pattern order is semantics-free)
    rules = [
        ParsedRule(r.name, A.reorder_patterns(r.body_patterns),
                   r.body_builtins, r.head_patterns)
        for r in rules
    ]
    # static delta-relevance pruning (the alpha-index effect of the
    # reference's RETE engine, RETEEngine.java clause filters): after
    # round 0 every delta triple's predicate comes from some rule HEAD,
    # so a delta variant at pattern i is only worth firing when pattern
    # i's predicate is a variable or a derivable predicate. With a
    # variable head predicate anywhere, everything is derivable.
    derivable: set[str] | None = set()
    for r in rules:
        for _s, p, _o in r.head_patterns:
            if isinstance(p, Var):
                derivable = None
                break
            derivable.add(p[1])
        if derivable is None:
            break

    def _delta_relevant(pat) -> bool:
        if derivable is None:
            return True
        p = pat[1]
        return isinstance(p, Var) or p[1] in derivable

    def _reads_graph(r: ParsedRule) -> bool:
        """Rules with a graph-READING binder builtin can bind new values
        when the graph grows even if no body pattern matches a delta
        triple (a countLiteralValues count changes as heads assert) —
        the semi-naive completeness argument covers only pattern
        matches, so these rules re-fire naively every round. noValue
        needs no such pass: a growing graph only SHRINKS its matches,
        and already-derived triples are never retracted (same
        fire-time-state semantics as the reference engine)."""
        return any(b.name in ("countLiteralValues", "listContains")
                   for b in r.body_builtins)

    base = triples.select(*TM.TERM_COLS)
    if not rules:
        # nothing to derive (backward_query reaches this for a goal
        # over a base-data predicate no rule head can produce)
        return base

    # round 0: naive — every pattern reads the base graph
    all_df = base.localCheckpoint(eager=False)
    derived = [
        _fire_rule(r, [all_df] * len(r.body_patterns), all_df) for r in rules
    ]
    delta = _anti(_union_all(derived).dropDuplicates(TM.TERM_COLS), all_df)
    delta = delta.localCheckpoint(eager=False)

    for _ in range(max_iter):
        if delta.isEmpty():
            return all_df
        all_df = all_df.unionByName(delta).localCheckpoint(eager=False)
        derived = []
        for r in rules:
            k = len(r.body_patterns)
            if _reads_graph(r):
                # naive re-fire: the builtin's view of the graph changed
                derived.append(_fire_rule(r, [all_df] * k, all_df))
                continue
            for dpos in range(k):
                if not _delta_relevant(r.body_patterns[dpos]):
                    continue  # this pattern can never match a derived triple
                frames = [delta if i == dpos else all_df for i in range(k)]
                derived.append(_fire_rule(r, frames, all_df))
        if not derived:
            return all_df  # no rule can consume its own output
        delta = _anti(_union_all(derived).dropDuplicates(TM.TERM_COLS), all_df)
        delta = delta.localCheckpoint(eager=False)
    raise ValueError(f"rule closure did not converge in {max_iter} rounds")


# --- backward (goal-directed) evaluation -------------------------------------

def _head_pred(pat) -> str | None:
    """Concrete predicate IRI of a pattern position — accepts both the
    parser's 4-tuple terms and the plain-string IRI shorthand
    ``graph._normalize`` allows in user-supplied goal patterns."""
    p = pat[1]
    if isinstance(p, Var):
        return None
    return p if isinstance(p, str) else p[1]


def relevant_rules(rules: list[ParsedRule], goal_pred: str | None) -> list[ParsedRule]:
    """The static dependency restriction of SLD resolution (what the
    reference's LP engine reaches by chaining goals,
    ``impl/LPRuleStore.java`` clause indexing by head predicate): start
    from rules whose head can produce the goal predicate, add rules
    whose heads feed any relevant rule's body, to fixpoint. A variable
    predicate anywhere in a head (or a variable goal) makes everything
    reachable."""
    if goal_pred is None:
        return list(rules)
    needed = {goal_pred}
    out: list[ParsedRule] = []
    pending = list(rules)
    changed = True
    while changed:
        changed = False
        for r in list(pending):
            heads = {_head_pred(h) for h in r.head_patterns}
            if None in heads or heads & needed:
                out.append(r)
                pending.remove(r)
                for b in r.body_patterns:
                    p = _head_pred(b)
                    if p is None:  # variable body predicate: everything feeds it
                        return out + pending
                    if p not in needed:
                        needed.add(p)
                        changed = True
    return out


def backward_query(
    triples: DataFrame,
    rules: str | list[ParsedRule],
    goal: tuple,
    max_iter: int = 50,
) -> DataFrame:
    """Goal-directed query over BACKWARD rules — the
    ``LPBackwardRuleReasoner`` surface (``GenericRuleReasoner`` in
    BACKWARD mode; engine ``impl/LPInterpreter.java``): ``goal`` is a
    triple pattern of :class:`jena_spark.queries.algebra.Var` /
    constants; the result is its bindings over the entailed graph.

    A backward rule ``head <- body`` has the same logical content as
    the forward rule ``body -> head``; for pure monotone datalog the
    SLD answer set equals the forward fixpoint filtered by the goal.
    The goal-directedness that makes the reference's engine practical
    is kept in its STATIC form: only the rules whose heads can reach
    the goal predicate through body dependencies (:func:`relevant_rules`)
    enter the fixpoint — a bounded closure instead of per-goal driver
    recursion, which is the posture that distributes."""
    if isinstance(rules, str):
        rules = parse_rules(rules)
    fwd = [
        ParsedRule(r.name, r.body_patterns, r.body_builtins,
                   r.head_patterns, is_backward=False)
        for r in rules
    ]
    goal_pred = _head_pred(goal)
    closed = rule_closure(triples, relevant_rules(fwd, goal_pred), max_iter)
    return A.triple_pattern(closed, goal)
