"""Fluent programmatic query construction — the jena-querybuilder
surface (``jena-extras/jena-querybuilder/src/main/java/org/apache/jena/
arq/querybuilder/``: ``SelectBuilder.java``, ``AskBuilder.java``,
``ConstructBuilder.java``, ``DescribeBuilder.java``,
``WhereBuilder.java``; term coercion ``Converters.java``).

Architectural mapping (not a port): the reference's builders assemble
an ARQ ``Query`` AST consumed by the ARQ engine. Here the builders
render the SPARQL string consumed by this engine's own string
front-end (:mod:`jena_spark.queries.sparql`) — one parser, one algebra,
one optimizer, two authoring styles. ``build()`` returns the SPARQL
text (the analog of ``AbstractQueryBuilder.buildString``); ``execute``
runs it over a triple/quad frame.

Term coercion (``Converters.makeNode``): strings starting with ``?``
are variables, absolute IRIs render as ``<...>``, ``a`` stays the
rdf:type keyword, Python ints/floats/bools become typed shorthand
literals, everything else a quoted string literal (N-Triples escaping
via :func:`jena_spark.terms.nt_escape`). Explicit wrappers
:func:`iri` / :func:`literal` override the guess.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from jena_spark.terms import nt_escape

# absolute IRI: a scheme AND an IRI-safe remainder — a colon alone must
# not turn prose like "note: call Bob" into an IRI with whitespace
_IRI_RE = re.compile(r'^[A-Za-z][A-Za-z0-9+.-]*:[^\s<>"{}|^`\\]*$')


class iri(str):
    """Force IRI rendering for a string term."""


class literal:
    """Force literal rendering, optionally language-tagged or typed
    (mutually exclusive, as in RDF)."""

    def __init__(self, value, lang: str | None = None, datatype: str | None = None):
        if lang and datatype:
            raise ValueError("literal: lang and datatype are mutually exclusive")
        self.value, self.lang, self.datatype = value, lang, datatype


def term(v) -> str:
    """Render one term (``Converters.makeNode`` analog)."""
    if isinstance(v, iri):
        return f"<{v}>"
    if isinstance(v, literal):
        base = f'"{nt_escape(str(v.value))}"'
        if v.lang:
            return f"{base}@{v.lang}"
        if v.datatype:
            return f"{base}^^<{v.datatype}>"
        return base
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        if v == "a" or v.startswith("?") or v.startswith("$"):
            return v
        if v.startswith("<") and v.endswith(">"):
            return v
        if _IRI_RE.match(v):
            return f"<{v}>"
        return f'"{nt_escape(v)}"'
    raise TypeError(f"cannot render SPARQL term from {type(v).__name__}")


class WhereBuilder:
    """Pattern-group builder (``WhereBuilder.java``): composable WHERE
    clause fragments. All ``add*`` methods return self (fluent)."""

    def __init__(self):
        self._elems: list[str] = []

    # -- patterns -------------------------------------------------------
    def add_where(self, s, p, o) -> "WhereBuilder":
        self._elems.append(f"{term(s)} {term(p)} {term(o)} .")
        return self

    def add_optional(self, sub) -> "WhereBuilder":
        self._elems.append("OPTIONAL { %s }" % _body(sub))
        return self

    def add_minus(self, sub) -> "WhereBuilder":
        self._elems.append("MINUS { %s }" % _body(sub))
        return self

    def add_union(self, left, right) -> "WhereBuilder":
        self._elems.append("{ %s } UNION { %s }" % (_body(left), _body(right)))
        return self

    def add_graph(self, g, sub) -> "WhereBuilder":
        self._elems.append("GRAPH %s { %s }" % (term(g), _body(sub)))
        return self

    def add_filter(self, expression: str) -> "WhereBuilder":
        self._elems.append(f"FILTER ({expression})")
        return self

    def add_bind(self, expression: str, var: str) -> "WhereBuilder":
        self._elems.append(f"BIND (({expression}) AS {_var(var)})")
        return self

    def add_values(self, var_or_vars, rows) -> "WhereBuilder":
        vars_ = [var_or_vars] if isinstance(var_or_vars, str) else list(var_or_vars)
        if len(vars_) == 1:
            cells = " ".join(term(r) for r in rows)
            self._elems.append("VALUES %s { %s }" % (_var(vars_[0]), cells))
        else:
            head = " ".join(_var(v) for v in vars_)
            body = " ".join("(" + " ".join(term(c) for c in row) + ")" for row in rows)
            self._elems.append("VALUES (%s) { %s }" % (head, body))
        return self

    def add_sub_query(self, select: "SelectBuilder") -> "WhereBuilder":
        self._elems.append("{ %s }" % select.build())
        return self

    def where_text(self) -> str:
        return " ".join(self._elems)


def _body(sub) -> str:
    if isinstance(sub, WhereBuilder):
        return sub.where_text()
    if isinstance(sub, tuple) and len(sub) == 3:
        return f"{term(sub[0])} {term(sub[1])} {term(sub[2])} ."
    raise TypeError("expected a WhereBuilder or an (s, p, o) tuple")


def _var(v: str) -> str:
    return v if v.startswith("?") or v.startswith("$") else f"?{v}"


class _SolutionModifiers:
    """GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET
    (``handlers/SolutionModifierHandler.java``)."""

    def __init__(self):
        self._group: list[str] = []
        self._having: list[str] = []
        self._order: list[str] = []
        self._limit: int | None = None
        self._offset: int | None = None

    def render(self) -> str:
        out = []
        if self._group:
            out.append("GROUP BY " + " ".join(self._group))
        if self._having:
            # one HAVING clause, constraints conjoined — repeated
            # HAVING keywords are not legal SPARQL
            out.append("HAVING (" + " && ".join(f"({h})" for h in self._having) + ")")
        if self._order:
            out.append("ORDER BY " + " ".join(self._order))
        if self._limit is not None:
            out.append(f"LIMIT {self._limit}")
        if self._offset is not None:
            out.append(f"OFFSET {self._offset}")
        return " ".join(out)


class SelectBuilder(WhereBuilder, _SolutionModifiers):
    """``SelectBuilder.java`` analog."""

    def __init__(self):
        WhereBuilder.__init__(self)
        _SolutionModifiers.__init__(self)
        self._vars: list[str] = []
        self._distinct = False

    def add_var(self, var_or_expr: str, as_var: str | None = None) -> "SelectBuilder":
        if as_var is not None:
            self._vars.append(f"({var_or_expr} AS {_var(as_var)})")
        else:
            self._vars.append(_var(var_or_expr))
        return self

    def set_distinct(self, on: bool = True) -> "SelectBuilder":
        self._distinct = on
        return self

    def add_group_by(self, var: str) -> "SelectBuilder":
        self._group.append(_var(var))
        return self

    def add_having(self, expression: str) -> "SelectBuilder":
        self._having.append(expression)
        return self

    def add_order_by(self, var_or_expr: str, order: str = "ASC") -> "SelectBuilder":
        o = order.upper()
        if o not in ("ASC", "DESC"):
            raise ValueError("order must be ASC or DESC")
        # bare names get the ?-prefix; anything else (an expression like
        # strlen(?x)) passes through unmodified — the extra wrapping
        # parens stay a legal bracketted expression
        key = _var(var_or_expr) if re.fullmatch(r"[?$]?\w+", var_or_expr) \
            else var_or_expr
        self._order.append(f"{o}({key})")
        return self

    def set_limit(self, n: int) -> "SelectBuilder":
        self._limit = n
        return self

    def set_offset(self, n: int) -> "SelectBuilder":
        self._offset = n
        return self

    def build(self) -> str:
        head = "SELECT "
        if self._distinct:
            head += "DISTINCT "
        head += " ".join(self._vars) if self._vars else "*"
        return f"{head} WHERE {{ {self.where_text()} }} {self.render()}".strip()

    def execute(self, triples: DataFrame, **kw) -> DataFrame:
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(triples, self.build(), **kw)


class AskBuilder(WhereBuilder):
    """``AskBuilder.java`` analog."""

    def build(self) -> str:
        return f"ASK {{ {self.where_text()} }}"

    def execute(self, triples: DataFrame, **kw) -> DataFrame:
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(triples, self.build(), **kw)


class ConstructBuilder(WhereBuilder):
    """``ConstructBuilder.java`` analog."""

    def __init__(self):
        super().__init__()
        self._template: list[str] = []

    def add_construct(self, s, p, o) -> "ConstructBuilder":
        self._template.append(f"{term(s)} {term(p)} {term(o)} .")
        return self

    def build(self) -> str:
        tmpl = " ".join(self._template)
        return f"CONSTRUCT {{ {tmpl} }} WHERE {{ {self.where_text()} }}"

    def execute(self, triples: DataFrame, **kw) -> DataFrame:
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(triples, self.build(), **kw)


class UpdateBuilder(WhereBuilder):
    """``UpdateBuilder.java`` analog — renders SPARQL Update text for
    :func:`jena_spark.pipeline.sparql_update.update_sparql`.

    Shapes (same dispatch as the reference's ``updatebuilder/``
    handlers): ``add_insert``/``add_delete`` WITHOUT a WHERE clause
    render ``INSERT DATA``/``DELETE DATA`` (ground quads); with WHERE
    patterns they render the template form
    ``DELETE {...} INSERT {...} WHERE {...}``; ``add_delete`` + the
    same triples as WHERE is expressible directly via
    ``delete_where``."""

    def __init__(self):
        super().__init__()
        self._inserts: list[str] = []
        self._deletes: list[str] = []
        self._delete_where: list[str] = []

    def add_insert(self, s, p, o) -> "UpdateBuilder":
        self._inserts.append(f"{term(s)} {term(p)} {term(o)} .")
        return self

    def add_delete(self, s, p, o) -> "UpdateBuilder":
        self._deletes.append(f"{term(s)} {term(p)} {term(o)} .")
        return self

    def delete_where(self, s, p, o) -> "UpdateBuilder":
        self._delete_where.append(f"{term(s)} {term(p)} {term(o)} .")
        return self

    def build(self) -> str:
        if self._delete_where:
            if self._inserts or self._deletes or self._elems:
                raise ValueError("delete_where cannot mix with other clauses")
            return "DELETE WHERE { %s }" % " ".join(self._delete_where)
        if not self._elems:
            out = []
            if self._deletes:
                out.append("DELETE DATA { %s }" % " ".join(self._deletes))
            if self._inserts:
                out.append("INSERT DATA { %s }" % " ".join(self._inserts))
            if not out:
                raise ValueError("empty update")
            return " ;\n".join(out)
        parts = []
        if self._deletes:
            parts.append("DELETE { %s }" % " ".join(self._deletes))
        if self._inserts:
            parts.append("INSERT { %s }" % " ".join(self._inserts))
        if not parts:
            raise ValueError("WHERE clause without INSERT/DELETE template")
        return " ".join(parts) + " WHERE { %s }" % self.where_text()

    def execute(self, quads: DataFrame) -> DataFrame:
        from jena_spark.pipeline.sparql_update import update_sparql

        return update_sparql(quads, self.build())


class DescribeBuilder(WhereBuilder):
    """``DescribeBuilder.java`` analog."""

    def __init__(self):
        super().__init__()
        self._terms: list[str] = []

    def add_describe(self, t) -> "DescribeBuilder":
        self._terms.append(term(t))
        return self

    def build(self) -> str:
        head = "DESCRIBE " + " ".join(self._terms)
        if self._elems:
            head += f" WHERE {{ {self.where_text()} }}"
        return head

    def execute(self, triples: DataFrame, **kw) -> DataFrame:
        from jena_spark.queries.sparql import sparql_query

        return sparql_query(triples, self.build(), **kw)
