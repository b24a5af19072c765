"""SHACL core validation over the triple table (jena-shacl analog).

Reference: ``jena-shacl/.../ShaclValidator.java:77`` (validate(shapes,
data) -> ValidationReport), shape parsing ``shacl/Shapes.java`` /
``shacl/parser/``, constraint library ``shacl/engine/constraint/``
(MinCount/MaxCount ``CardinalityConstraint.java``, Datatype/Class/
NodeKind/Pattern/In/HasValue/StrMin-MaxLength/ValueMin-Max* —
one class per SHACL core component).

Spark-first posture: a SHAPES graph is tiny and static (like the
inference TBox), so it parses ONCE on the driver into plain constraint
records and every constraint compiles to a declarative DataFrame step
over the DATA graph — target selection is a filtered scan/join,
cardinality is a groupBy over the focus-value frame, and the term
constraints are per-row JVM predicates. No per-row Python anywhere;
the report is itself a DataFrame (the distributed twin of
``ValidationReport``) so at 100 TB the violations land as a table, not
a driver list.

Supported core components (errors loudly outside the profile):
targets ``sh:targetClass``/``sh:targetNode``/``sh:targetSubjectsOf``/
``sh:targetObjectsOf``; property shapes with FULL SHACL property
paths — predicate, ``sh:inversePath``, sequence (RDF list),
``sh:alternativePath``, ``sh:zeroOrMorePath``/``sh:oneOrMorePath``/
``sh:zeroOrOnePath``, arbitrarily nested (``shacl/parser/path/``) —
evaluated set-based through ``_path_pairs`` (sequence = full-term
equi-join, alternative = union, unbounded closure = semi-naive on
encoded ids; the identity component of zero-paths rides a flag and
unions the focus nodes, never an all-nodes frame); constraints
``sh:minCount``, ``sh:maxCount``,
``sh:datatype``, ``sh:class``, ``sh:nodeKind``, ``sh:pattern``
(+``sh:flags``), ``sh:in``, ``sh:hasValue``, ``sh:minLength``,
``sh:maxLength``, ``sh:minInclusive``/``sh:maxInclusive``/
``sh:minExclusive``/``sh:maxExclusive`` (numeric value space).
Node-shape-level ``sh:nodeKind``/``sh:class``/``sh:in`` apply to the
focus node itself. Also covered: ``sh:closed`` (+
``sh:ignoredProperties``), ``sh:uniqueLang``, the pairwise property
constraints ``sh:equals``/``sh:disjoint``/``sh:lessThan``/
``sh:lessThanOrEquals`` (``EqualsConstraint.java`` family), and
SPARQL-based constraints (``sh:sparql`` with ``sh:select`` on a node
shape — ``SparqlConstraint.java``/``SparqlValidation.java``):
evaluated SET-BASED, not per-focus — ``$this`` is rewritten to the
variable ``?this``, the query runs ONCE through this engine's own
SPARQL front-end (term-struct results), and the result joins the
focus frame on the ``this`` binding; each joined row is a violation
(``?value`` projected if present). Logical combinators ``sh:not``/
``sh:and``/``sh:or``/``sh:xone`` and ``sh:node``
(``ShNot.java``/``ShAnd``/``ShOr``/``ShXone``/``ShNode``) are
evaluated set-based too: the inner shape compiles to a per-node
conformance FLAG frame (term constraints as predicates, inner property
shapes as per-node aggregations, recursion depth-bounded), and the
combinator is a boolean fold over the flags — one pass over the
candidate nodes per inner shape, never a per-focus loop.
``sh:qualifiedValueShape`` (+ ``qualifiedMin/MaxCount``,
``qualifiedValueShapesDisjoint``) rides the same flag machinery:
conforming-value counts per focus, bound-checked; disjointness
anti-joins away values conforming to any sibling qualified shape
(``QualifiedValueShape.java`` sibling collection).

``sh:deactivated true`` (node or property shapes) skips the shape
entirely (an all-deactivated graph conforms with an empty report).

RDF 1.1 note: a plain literal (datatype column NULL) IS an
``xsd:string`` for ``sh:datatype`` comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_NODEKINDS = {
    SH + "IRI": ("iri",),
    SH + "BlankNode": ("bnode",),
    SH + "Literal": ("literal",),
    SH + "BlankNodeOrIRI": ("bnode", "iri"),
    SH + "BlankNodeOrLiteral": ("bnode", "literal"),
    SH + "IRIOrLiteral": ("iri", "literal"),
}

_TERM_CONSTRAINTS = (
    "datatype", "class", "nodeKind", "pattern", "flags", "in", "hasValue",
    "minLength", "maxLength", "minInclusive", "maxInclusive",
    "minExclusive", "maxExclusive", "languageIn",
)


@dataclass
class PropertyShape:
    path: str  # display string (SPARQL path syntax) for the report
    inverse: bool = False
    #: parsed path AST: ("link", iri) | ("inv", ast) | ("seq", [ast...])
    #: | ("alt", [ast...]) | ("star", ast) | ("plus", ast) | ("opt", ast)
    path_ast: tuple | None = None
    min_count: int | None = None
    max_count: int | None = None
    constraints: dict = field(default_factory=dict)
    unique_lang: bool = False
    pairwise: list = field(default_factory=list)  # (component, predicate IRI)
    logic: list = field(default_factory=list)  # (op, [InnerShape...])
    qualified: tuple | None = None  # (InnerShape, min | None, max | None)
    qualified_disjoint: bool = False  # sh:qualifiedValueShapesDisjoint
    severity: str | None = None  # sh:severity IRI (default sh:Violation)
    message: str | None = None  # sh:message literal


@dataclass
class InnerShape:
    """A shape referenced from sh:not/and/or/xone/node — term
    constraints, property shapes, and (recursively) more logic."""
    constraints: dict = field(default_factory=dict)
    properties: list = field(default_factory=list)
    logic: list = field(default_factory=list)


@dataclass
class NodeShape:
    iri: str
    target_class: list = field(default_factory=list)
    target_node: list = field(default_factory=list)
    target_subjects_of: list = field(default_factory=list)
    target_objects_of: list = field(default_factory=list)
    constraints: dict = field(default_factory=dict)  # on the focus itself
    properties: list = field(default_factory=list)
    closed: bool = False
    ignored: list = field(default_factory=list)  # predicate IRIs
    sparql: list = field(default_factory=list)  # (select string, message)
    logic: list = field(default_factory=list)  # (op, [InnerShape...])
    severity: str | None = None  # sh:severity IRI (default sh:Violation)
    message: str | None = None  # sh:message literal


def _collect_shapes_rows(shapes: DataFrame, max_rows: int = 100_000):
    n = shapes.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"SHACL: shapes graph exceeds {max_rows} triples — shapes "
            "are driver-parsed (TBox posture); split the graph")
    return [tuple(r) for r in shapes.select(
        "s_kind", "s_val", "p_val", "o_kind", "o_val",
        "o_datatype", "o_lang").collect()]


def _rdf_list(by_subj: dict, head: tuple) -> list:
    """rdf:first/rest chain -> python list of (kind,val,dt,lang)."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    out = []
    while not (head[0] == "iri" and head[1] == rdf + "nil"):
        po = by_subj.get(head[:2], {})
        first = po.get(rdf + "first")
        rest = po.get(rdf + "rest")
        if first is None or rest is None:
            raise ValueError("SHACL: malformed sh:in list")
        out.append(first[0])
        head = rest[0]
    return out


def parse_shapes(shapes: DataFrame) -> list[NodeShape]:
    """Shapes graph -> NodeShape records (``shacl/parser/`` analog,
    restricted to the documented core profile)."""
    rows = _collect_shapes_rows(shapes)
    by_subj: dict[tuple, dict] = {}
    for s_kind, s_val, p_val, o_kind, o_val, o_dt, o_lang in rows:
        by_subj.setdefault((s_kind, s_val), {}).setdefault(p_val, []).append(
            (o_kind, o_val, o_dt, o_lang))

    def one(po: dict, p: str):
        v = po.get(SH + p)
        return v[0] if v else None

    def _term_constraints(po: dict, out: dict) -> None:
        for key in _TERM_CONSTRAINTS:
            v = one(po, key)
            if v is None:
                continue
            if key == "in":
                out["in"] = _rdf_list(by_subj, v)
            elif key == "languageIn":
                out["languageIn"] = [t[1] for t in _rdf_list(by_subj, v)]
            elif key == "hasValue":
                out["hasValue"] = v
            elif key in ("datatype", "class", "nodeKind"):
                out[key] = v[1]
            elif key in ("minLength", "maxLength"):
                out[key] = int(v[1])
            elif key in ("minInclusive", "maxInclusive",
                         "minExclusive", "maxExclusive"):
                out[key] = float(v[1])
            else:  # pattern / flags
                out[key] = v[1]
        unknown = {p for p in po
                   if p.startswith(SH) and p[len(SH):] not in
                   _TERM_CONSTRAINTS + (
                       "path", "inversePath", "alternativePath",
                       "zeroOrMorePath", "oneOrMorePath", "zeroOrOnePath",
                       "minCount", "maxCount", "deactivated",
                       "severity", "message",
                       "property", "targetClass", "targetNode",
                       "targetSubjectsOf", "targetObjectsOf",
                       "closed", "ignoredProperties", "sparql",
                       "uniqueLang", "equals", "disjoint",
                       "lessThan", "lessThanOrEquals",
                       "not", "and", "or", "xone", "node",
                       "qualifiedValueShape", "qualifiedMinCount",
                       "qualifiedMaxCount", "qualifiedValueShapesDisjoint")}
        if unknown:
            raise ValueError(f"SHACL: unsupported constraint(s) {sorted(unknown)}")

    def _inner_shape(ref: tuple, depth: int = 0) -> InnerShape:
        """A shape referenced from sh:not/and/or/xone/node (bnode or
        named shape in the same graph)."""
        if depth > 10:
            raise ValueError("SHACL: shape recursion deeper than 10")
        ipo = by_subj.get(ref[:2], {})
        sh = InnerShape()
        _term_constraints(ipo, sh.constraints)
        for prop_ref in ipo.get(SH + "property", []):
            ips = _property_shape(prop_ref, depth + 1)
            if ips is not None:
                sh.properties.append(ips)
        sh.logic = _logic(ipo, depth + 1)
        return sh

    def _logic(po: dict, depth: int = 0) -> list:
        out = []
        for t in po.get(SH + "not", []):
            out.append(("not", [_inner_shape(t, depth)]))
        for t in po.get(SH + "node", []):
            out.append(("node", [_inner_shape(t, depth)]))
        for op in ("and", "or", "xone"):
            for t in po.get(SH + op, []):
                refs = _rdf_list(by_subj, t)
                out.append((op, [_inner_shape(r, depth) for r in refs]))
        return out

    def _parse_path(t: tuple, depth: int = 0) -> tuple:
        """SHACL property-path term -> AST (``shacl/parser/path/``):
        IRI = predicate link; blank node = an RDF list (sequence path)
        or one of sh:inversePath / sh:alternativePath /
        sh:zeroOrMorePath / sh:oneOrMorePath / sh:zeroOrOnePath."""
        if depth > 10:
            raise ValueError("SHACL: path nesting deeper than 10")
        if t[0] == "iri":
            return ("link", t[1])
        if t[0] != "bnode":
            raise ValueError("SHACL: sh:path must be an IRI or path bnode")
        rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        po = by_subj.get(t[:2], {})
        if rdf + "first" in po:  # sequence path = RDF list of sub-paths
            return ("seq", [_parse_path(m, depth + 1)
                            for m in _rdf_list(by_subj, t)])
        for key, op in (("inversePath", "inv"), ("zeroOrMorePath", "star"),
                        ("oneOrMorePath", "plus"), ("zeroOrOnePath", "opt")):
            if SH + key in po:
                return (op, _parse_path(po[SH + key][0], depth + 1))
        if SH + "alternativePath" in po:
            return ("alt", [_parse_path(m, depth + 1) for m in
                            _rdf_list(by_subj, po[SH + "alternativePath"][0])])
        raise ValueError(
            "SHACL: unsupported path bnode — expected a sequence list, "
            "sh:inversePath, sh:alternativePath, sh:zeroOrMorePath, "
            "sh:oneOrMorePath or sh:zeroOrOnePath")

    def _property_shape(prop_ref: tuple, depth: int = 0) -> PropertyShape | None:
        ppo = by_subj.get(prop_ref[:2], {})
        deact = one(ppo, "deactivated")
        if deact is not None and deact[1] == "true":
            return None  # sh:deactivated: the shape validates nothing
        path = one(ppo, "path")
        if path is None:
            raise ValueError("SHACL: property shape without sh:path")
        ast = _parse_path(path)
        inverse = ast[0] == "inv" and ast[1][0] == "link"
        ps = PropertyShape(path=_path_str(ast), inverse=inverse,
                           path_ast=ast)
        mn, mx = one(ppo, "minCount"), one(ppo, "maxCount")
        ps.min_count = int(mn[1]) if mn else None
        ps.max_count = int(mx[1]) if mx else None
        ul = one(ppo, "uniqueLang")
        ps.unique_lang = bool(ul) and ul[1] == "true"
        for comp in ("equals", "disjoint", "lessThan", "lessThanOrEquals"):
            for t in ppo.get(SH + comp, []):
                if t[0] != "iri":
                    raise ValueError(f"SHACL: sh:{comp} needs an IRI object")
                ps.pairwise.append((comp, t[1]))
        sev = one(ppo, "severity")
        ps.severity = sev[1] if sev else None
        msg = one(ppo, "message")
        ps.message = msg[1] if msg else None
        ps.logic = _logic(ppo, depth)
        qv = one(ppo, "qualifiedValueShape")
        if qv is not None:
            qmin, qmax = one(ppo, "qualifiedMinCount"), one(ppo, "qualifiedMaxCount")
            if qmin is None and qmax is None:
                raise ValueError(
                    "SHACL: sh:qualifiedValueShape needs "
                    "sh:qualifiedMinCount and/or sh:qualifiedMaxCount")
            ps.qualified = (
                _inner_shape(qv, depth),
                int(qmin[1]) if qmin else None,
                int(qmax[1]) if qmax else None)
            qd = one(ppo, "qualifiedValueShapesDisjoint")
            ps.qualified_disjoint = bool(qd) and qd[1] == "true"
        _term_constraints(ppo, ps.constraints)
        return ps

    shapes_out = []
    node_shape_subjects = [
        s for s, po in by_subj.items()
        if any(p.startswith(SH + "target") for p in po)
    ]
    if not node_shape_subjects:
        raise ValueError("SHACL: no node shape with a target found")
    for subj in sorted(node_shape_subjects):
        po = by_subj[subj]
        deact = one(po, "deactivated")
        if deact is not None and deact[1] == "true":
            continue  # sh:deactivated node shape validates nothing
        ns = NodeShape(iri=subj[1])
        for p, attr in (("targetClass", ns.target_class),
                        ("targetNode", ns.target_node),
                        ("targetSubjectsOf", ns.target_subjects_of),
                        ("targetObjectsOf", ns.target_objects_of)):
            attr.extend(po.get(SH + p, []))
        _term_constraints(po, ns.constraints)
        sev = one(po, "severity")
        ns.severity = sev[1] if sev else None
        msg = one(po, "message")
        ns.message = msg[1] if msg else None
        closed = one(po, "closed")
        ns.closed = bool(closed) and closed[1] == "true"
        ign = one(po, "ignoredProperties")
        if ign is not None:
            ns.ignored = [t[1] for t in _rdf_list(by_subj, ign)]
        for sref in po.get(SH + "sparql", []):
            spo = by_subj.get(sref[:2], {})
            sel = one(spo, "select")
            if sel is None:
                raise ValueError("SHACL: sh:sparql without sh:select")
            msg = one(spo, "message")
            ns.sparql.append((sel[1], msg[1] if msg else "sparql"))
        ns.logic = _logic(po)
        for prop_ref in po.get(SH + "property", []):
            ps = _property_shape(prop_ref)
            if ps is not None:
                ns.properties.append(ps)
        shapes_out.append(ns)
    return shapes_out  # may be empty if every targeted shape is deactivated


REPORT_COLS = ["shape", "focus_kind", "focus", "path", "constraint",
               "value", "severity", "message"]


def _path_str(ast: tuple) -> str:
    """AST -> SPARQL path syntax for the report's ``path`` column
    (plain predicate paths print as the bare IRI — report parity with
    the pre-path profile and with Jena's ``Path.toString``)."""
    def grp(a: tuple) -> str:
        s = _path_str(a)
        return s if a[0] in ("link", "alt") else "(" + s + ")"
    op = ast[0]
    if op == "link":
        return ast[1]
    if op == "inv":
        return "^" + grp(ast[1])
    if op == "seq":
        return "/".join(grp(m) for m in ast[1])
    if op == "alt":
        return "(" + "|".join(_path_str(m) for m in ast[1]) + ")"
    return grp(ast[1]) + {"star": "*", "plus": "+", "opt": "?"}[op]


_PAIR8 = ["n_kind", "n_val", "n_dt", "n_lang",
          "v_kind", "v_val", "v_dt", "v_lang"]


def _path_pairs(data: DataFrame, ast: tuple) -> tuple[DataFrame, bool]:
    """Evaluate a SHACL property path over the data graph ->
    ``(pairs, zero)``: a (start-node, value-node) DataFrame in full
    8-column term space plus a flag saying the identity relation is
    also included (sh:zeroOrMorePath / sh:zeroOrOnePath) — callers
    union the focus nodes themselves as value nodes when set, so the
    identity never materializes as an all-nodes cross frame.

    Every composite is declarative: sequence = equi-join on the full
    term key, alternative = union+distinct, inverse = column swap;
    only unbounded closure iterates (semi-naive on dictionary-encoded
    ids, same discipline as ``queries.paths.one_or_more``). The zero
    flag composes: seq(a,b) includes b-pairs when a has identity and
    a-pairs when b does; alt is any-member; closure of an
    identity-bearing path is itself identity-bearing."""
    op = ast[0]
    null_s = F.lit(None).cast("string")
    if op == "link":
        return data.where(F.col("p_val") == ast[1]).select(
            F.col("s_kind").alias("n_kind"), F.col("s_val").alias("n_val"),
            null_s.alias("n_dt"), null_s.alias("n_lang"),
            F.col("o_kind").alias("v_kind"), F.col("o_val").alias("v_val"),
            F.col("o_datatype").alias("v_dt"), F.col("o_lang").alias("v_lang"),
        ), False
    if op == "inv":
        inner, z = _path_pairs(data, ast[1])
        return inner.select(
            F.col("v_kind").alias("n_kind"), F.col("v_val").alias("n_val"),
            F.col("v_dt").alias("n_dt"), F.col("v_lang").alias("n_lang"),
            F.col("n_kind").alias("v_kind"), F.col("n_val").alias("v_val"),
            F.col("n_dt").alias("v_dt"), F.col("n_lang").alias("v_lang"),
        ), z
    if op == "seq":
        cur, z = _path_pairs(data, ast[1][0])
        for m in ast[1][1:]:
            cur, z = _seq_pairs(cur, z, *_path_pairs(data, m))
        return cur, z
    if op == "alt":
        parts = [_path_pairs(data, m) for m in ast[1]]
        out = parts[0][0]
        for df, _ in parts[1:]:
            out = out.unionByName(df)
        return out.distinct(), any(z for _, z in parts)
    inner, z = _path_pairs(data, ast[1])
    if op == "opt":
        return inner, True
    return _closure_pairs(inner), (True if op == "star" else z)


def _seq_pairs(left: DataFrame, lz: bool,
               right: DataFrame, rz: bool) -> tuple[DataFrame, bool]:
    """Relational composition of two 8-column pair frames. The join
    key is the FULL term (kind, val, datatype, lang) — literal
    midpoints (possible when the right side starts inverse) never
    conflate value-distinct literals."""
    cond = (
        (F.col("l.v_kind") == F.col("r.n_kind"))
        & (F.col("l.v_val") == F.col("r.n_val"))
        & (F.coalesce(F.col("l.v_dt"), F.lit(""))
           == F.coalesce(F.col("r.n_dt"), F.lit("")))
        & (F.coalesce(F.col("l.v_lang"), F.lit(""))
           == F.coalesce(F.col("r.n_lang"), F.lit("")))
    )
    joined = left.alias("l").join(right.alias("r"), cond).select(
        *[F.col("l." + c).alias(c) for c in _PAIR8[:4]],
        *[F.col("r." + c).alias(c) for c in _PAIR8[4:]],
    )
    if lz:  # identity on the left: right's own pairs pass through
        joined = joined.unionByName(right.select(*_PAIR8))
    if rz:  # identity on the right: left's own pairs pass through
        joined = joined.unionByName(left.select(*_PAIR8))
    return joined.distinct(), (lz and rz)


def _closure_pairs(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Transitive closure of an 8-column pair frame — path-doubling
    (closure-by-squaring: each round joins the closure-so-far with
    itself, so round *k* covers paths up to length 2^k and the round
    count is logarithmic in graph diameter; max_iter=30 ⇒ diameter
    2^30 before the loud failure) on xxhash64 term ids (the
    ``queries.paths`` discipline otherwise: 16-byte join rows,
    localCheckpoint per round, decode once at the end via a node
    dictionary carrying the full term). Doubling costs O(|closure|)
    per join instead of semi-naive's O(|frontier|), but SHACL path
    frames are property-scoped (not the whole graph) and a linked
    list / org hierarchy thousands deep must not hit an iteration
    ceiling (ADVICE r3)."""
    from jena_spark.pipeline.encode import term_id_col

    p = pairs.select(*_PAIR8).distinct()
    nodes = (
        p.select(F.col("n_kind").alias("kind"), F.col("n_val").alias("val"),
                 F.col("n_dt").alias("dt"), F.col("n_lang").alias("lang"))
        .unionByName(
            p.select(F.col("v_kind").alias("kind"),
                     F.col("v_val").alias("val"),
                     F.col("v_dt").alias("dt"), F.col("v_lang").alias("lang")))
        .distinct()
        .select(term_id_col(F.col("kind"), F.col("val"),
                            F.col("dt"), F.col("lang")).alias("node_id"),
                "kind", "val", "dt", "lang")
        # eager checkpoint: the decode at the end consumes this frame
        # TWICE (src + dst joins) — uncheckpointed, the distinct node
        # derivation replays per consumer (the paths.py lesson)
        .localCheckpoint(eager=True)
    )
    edges = p.select(
        term_id_col(F.col("n_kind"), F.col("n_val"),
                    F.col("n_dt"), F.col("n_lang")).alias("src"),
        term_id_col(F.col("v_kind"), F.col("v_val"),
                    F.col("v_dt"), F.col("v_lang")).alias("dst"),
    ).localCheckpoint(eager=True)
    reached = edges
    for _ in range(max_iter):
        nxt = (
            reached.alias("a")
            .join(reached.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
        new = nxt.join(reached, ["src", "dst"], "left_anti") \
            .localCheckpoint(eager=True)
        if new.isEmpty():
            break
        # re-checkpoint the squared closure: it is self-joined (two
        # consumers) next round, so an un-checkpointed union would
        # replay the whole lineage quadratically
        reached = reached.unionByName(new).localCheckpoint(eager=True)
    else:
        raise ValueError(
            f"SHACL: path closure exceeded {max_iter} doubling rounds "
            f"(graph diameter > 2^{max_iter})")
    s = nodes.select(
        F.col("node_id").alias("src"), F.col("kind").alias("n_kind"),
        F.col("val").alias("n_val"), F.col("dt").alias("n_dt"),
        F.col("lang").alias("n_lang"))
    d = nodes.select(
        F.col("node_id").alias("dst"), F.col("kind").alias("v_kind"),
        F.col("val").alias("v_val"), F.col("dt").alias("v_dt"),
        F.col("lang").alias("v_lang"))
    return reached.join(s, "src").join(d, "dst").select(*_PAIR8)


def _focus_frame(data: DataFrame, ns: NodeShape) -> DataFrame:
    """Target selection -> (focus_kind, focus, focus_dt, focus_lang)
    frame. dt/lang are non-null only for literal focus nodes (reachable
    via sh:targetObjectsOf or an explicit literal sh:targetNode) and
    exist so a focus re-injected as its OWN value node — node-level
    constraints, sh:not/and/or/xone at node scope, zero-length path
    identities — keeps its datatype/language tag instead of degrading
    to a plain string (ADVICE r3: "5"^^xsd:integer must not judge as
    xsd:string under sh:datatype/sh:languageIn)."""
    spark = data.sparkSession
    null_s = F.lit(None).cast("string")
    parts = []
    for t in ns.target_class:
        parts.append(
            data.where((F.col("p_val") == RDF_TYPE)
                       & (F.col("o_kind") == "iri")
                       & (F.col("o_val") == t[1]))
            .select(F.col("s_kind").alias("focus_kind"),
                    F.col("s_val").alias("focus"),
                    null_s.alias("focus_dt"), null_s.alias("focus_lang")))
    for p in ns.target_subjects_of:
        parts.append(data.where(F.col("p_val") == p[1]).select(
            F.col("s_kind").alias("focus_kind"),
            F.col("s_val").alias("focus"),
            null_s.alias("focus_dt"), null_s.alias("focus_lang")))
    for p in ns.target_objects_of:
        parts.append(data.where(F.col("p_val") == p[1]).select(
            F.col("o_kind").alias("focus_kind"),
            F.col("o_val").alias("focus"),
            F.col("o_datatype").alias("focus_dt"),
            F.col("o_lang").alias("focus_lang")))
    if ns.target_node:
        parts.append(spark.createDataFrame(
            [(t[0], t[1], t[2], t[3]) for t in ns.target_node],
            "focus_kind string, focus string,"
            "focus_dt string, focus_lang string"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _value_violation_cond(data: DataFrame, cons: dict) -> tuple[Column, DataFrame | None]:
    """Per-row violation predicate over (v_kind, v_val, v_dt, v_lang)
    columns; sh:class additionally needs a typed-nodes frame (returned
    for the caller to anti-join)."""
    c = F.lit(False)
    if "nodeKind" in cons:
        kinds = _NODEKINDS.get(cons["nodeKind"])
        if kinds is None:
            raise ValueError(f"SHACL: unknown nodeKind {cons['nodeKind']}")
        c = c | ~F.col("v_kind").isin(*kinds)
    if "datatype" in cons:
        dt = cons["datatype"]
        # RDF 1.1: plain literal == xsd:string; lang-tagged ==
        # rdf:langString; non-literals never match any datatype
        eff = F.when(F.col("v_kind") != "literal", F.lit("\x00")).otherwise(
            F.when(F.col("v_lang").isNotNull(),
                   F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
            .otherwise(F.coalesce(F.col("v_dt"), F.lit(XSD_STRING))))
        c = c | (eff != dt)
    if "pattern" in cons:
        # sh:pattern applies to the STRING REPRESENTATION of the value
        # (IRIs included); blank nodes always violate (PatternConstraint)
        pat = cons["pattern"]
        if cons.get("flags"):
            pat = f"(?{cons['flags']}){pat}"
        c = c | (F.col("v_kind") == "bnode") | ~F.col("v_val").rlike(pat)
    if "in" in cons:
        terms = cons["in"]
        m = F.lit(False)
        for k, v, dt, lang in terms:
            mm = (F.col("v_kind") == k) & (F.col("v_val") == v)
            if k == "literal":
                mm = mm & (F.coalesce(F.col("v_dt"), F.lit("")) == (dt or "")) \
                    & (F.coalesce(F.col("v_lang"), F.lit("")) == (lang or ""))
            m = m | mm
        c = c | ~m
    if "languageIn" in cons:
        # StrLanguageIn: value must be a lang-tagged literal whose tag
        # matches a basic language range (langMatches semantics:
        # case-insensitive exact or range-prefix; "*" = any tag)
        lang = F.lower(F.coalesce(F.col("v_lang"), F.lit("")))
        m = F.lit(False)
        for rng in cons["languageIn"]:
            r = rng.lower()
            if r == "*":
                m = m | (lang != "")
            else:
                m = m | (lang == r) | lang.startswith(r + "-")
        c = c | (F.col("v_kind") != "literal") | (lang == "") | ~m
    if "minLength" in cons:
        c = c | (F.length("v_val") < cons["minLength"])
    if "maxLength" in cons:
        c = c | (F.length("v_val") > cons["maxLength"])
    num = F.col("v_val").try_cast("double")
    if "minInclusive" in cons:
        c = c | num.isNull() | (num < cons["minInclusive"])
    if "maxInclusive" in cons:
        c = c | num.isNull() | (num > cons["maxInclusive"])
    if "minExclusive" in cons:
        c = c | num.isNull() | (num <= cons["minExclusive"])
    if "maxExclusive" in cons:
        c = c | num.isNull() | (num >= cons["maxExclusive"])
    class_types = None
    if "class" in cons:
        class_types = data.where(
            (F.col("p_val") == RDF_TYPE) & (F.col("o_kind") == "iri")
            & (F.col("o_val") == cons["class"])
        ).select(F.col("s_kind").alias("v_kind"), F.col("s_val").alias("v_val"))
    return c, class_types


def _report(shape, path, constraint, frame, vk="v_kind", vv="v_val",
            src=None, message=None) -> DataFrame:
    """One report slice. ``src`` is the shape record declaring the
    constraint (its sh:severity / sh:message fill resultSeverity /
    resultMessage, ``ValidationResult.java``); ``message`` overrides
    (sh:sparql constraints carry their own sh:message)."""
    sev = (getattr(src, "severity", None)) or (SH + "Violation")
    msg = message if message is not None else getattr(src, "message", None)
    return frame.select(
        F.lit(shape).alias("shape"),
        F.col("focus_kind"), F.col("focus"),
        F.lit(path).alias("path"),
        F.lit(constraint).alias("constraint"),
        (F.col(vv) if vv in frame.columns else F.lit(None).cast("string"))
        .alias("value"),
        F.lit(sev).alias("severity"),
        F.lit(msg).cast("string").alias("message"),
    )


def _nk() -> Column:
    """Null-safe node key for flag joins (coalesced struct fields are
    non-null, so plain struct equality is total)."""
    return F.struct(
        F.col("v_kind"), F.col("v_val"),
        F.coalesce(F.col("v_dt"), F.lit("")).alias("v_dt"),
        F.coalesce(F.col("v_lang"), F.lit("")).alias("v_lang"))


def _conform_flags(data: DataFrame, sh: InnerShape, nodes: DataFrame) -> DataFrame:
    """(_nk, _ok) per candidate node: does the node conform to the
    inner shape? Term constraints are row predicates, inner property
    shapes are per-node aggregations (count + any-value-violation),
    nested logic recurses — everything one set-based pass, the
    distributed twin of ``ValidationProc.execValidateShape`` called
    per-node by ShNot/ShAnd/ShOr/ShXone/ShNode."""
    base = nodes.select(_nk().alias("_nk"), "v_kind", "v_val",
                        "v_dt", "v_lang").dropDuplicates(["_nk"])
    cond, class_types = _value_violation_cond(data, sh.constraints)
    out = base.withColumn("_bad", cond)
    if class_types is not None:
        marked = class_types.withColumn("_in_cls", F.lit(True)) \
            .dropDuplicates(["v_kind", "v_val"])
        out = out.join(marked, ["v_kind", "v_val"], "left")
        out = out.withColumn(
            "_bad", F.col("_bad") | F.col("_in_cls").isNull()).drop("_in_cls")
    for ps in sh.properties:
        pairs, zero = _path_pairs(data, ps.path_ast)
        tri = pairs.select("n_kind", "n_val",
                           "v_kind", "v_val", "v_dt", "v_lang")
        vals = base.select("_nk", F.col("v_kind").alias("n_kind"),
                           F.col("v_val").alias("n_val")) \
            .join(tri, ["n_kind", "n_val"])
        if zero:  # identity: the node is its own value (x path* x)
            ident = base.select(
                "_nk", F.col("v_kind").alias("n_kind"),
                F.col("v_val").alias("n_val"),
                "v_kind", "v_val", "v_dt", "v_lang")
            vals = vals.unionByName(ident).distinct()
        vcond, vclass = _value_violation_cond(data, ps.constraints)
        if vclass is not None:
            marked = vclass.withColumn("_in_cls", F.lit(True)) \
                .dropDuplicates(["v_kind", "v_val"])
            vals = vals.join(marked, ["v_kind", "v_val"], "left")
            vcond = vcond | F.col("_in_cls").isNull()
        if ps.logic:
            lf = _logic_flags(data, ps.logic, vals)
            vals = vals.withColumn("_vnk", _nk()).join(
                lf.withColumnRenamed("_nk", "_vnk"), "_vnk")
            vcond = vcond | F.col("_lbad")
        agg = vals.groupBy("_nk").agg(
            F.count(F.lit(1)).alias("_n"),
            F.max(vcond.cast("int")).alias("_vbad"))
        out = out.join(agg, "_nk", "left")
        n = F.coalesce(F.col("_n"), F.lit(0))
        bad = F.col("_bad") | (F.coalesce(F.col("_vbad"), F.lit(0)) == 1)
        if ps.min_count is not None:
            bad = bad | (n < ps.min_count)
        if ps.max_count is not None:
            bad = bad | (n > ps.max_count)
        out = out.withColumn("_bad", bad).drop("_n", "_vbad")
    if sh.logic:
        lf = _logic_flags(data, sh.logic, base)
        out = out.join(lf, "_nk").withColumn(
            "_bad", F.col("_bad") | F.col("_lbad")).drop("_lbad")
    return out.select("_nk", (~F.col("_bad")).alias("_ok"))


def _logic_flags(data: DataFrame, logic: list, nodes: DataFrame) -> DataFrame:
    """(_nk, _lbad) per node: violation of any combinator in ``logic``.
    Each sub-shape contributes one conformance flag frame; the
    combinator folds the flags:

      not  -> violates when the inner shape CONFORMS
      node -> violates when the inner shape does not conform
      and  -> violates unless ALL conform
      or   -> violates unless AT LEAST ONE conforms
      xone -> violates unless EXACTLY ONE conforms
    """
    base = nodes.select(_nk().alias("_nk"), "v_kind", "v_val",
                        "v_dt", "v_lang").dropDuplicates(["_nk"])
    out = base.select("_nk").withColumn("_lbad", F.lit(False))
    for i, (op, subs) in enumerate(logic):
        oks = []
        for j, sub in enumerate(subs):
            name = f"_ok_{i}_{j}"
            out = out.join(
                _conform_flags(data, sub, base).withColumnRenamed("_ok", name),
                "_nk")
            oks.append(F.col(name))
        if not oks:
            # empty member list (object rdf:nil): and() is vacuously
            # true, or()/xone() can never be satisfied
            if op in ("or", "xone"):
                out = out.withColumn("_lbad", F.lit(True))
            continue
        if op == "not":
            bad = oks[0]
        elif op in ("and", "node"):
            bad = ~oks[0]
            for ok in oks[1:]:
                bad = bad | ~ok
        elif op == "or":
            bad = ~oks[0]
            for ok in oks[1:]:
                bad = bad & ~ok
        else:  # xone
            total = oks[0].cast("int")
            for ok in oks[1:]:
                total = total + ok.cast("int")
            bad = total != 1
        out = out.withColumn("_lbad", F.col("_lbad") | bad).drop(
            *[f"_ok_{i}_{j}" for j in range(len(subs))])
    return out


def validate(data: DataFrame, shapes: DataFrame) -> DataFrame:
    """``ShaclValidator.validate`` analog: returns the violation table
    (``REPORT_COLS``); empty == conforms. Every constraint is a
    declarative step over ``data`` — counts are groupBys, term checks
    are predicates, sh:class is an anti-join against the typed nodes."""
    report: DataFrame | None = None

    def add(df: DataFrame) -> None:
        nonlocal report
        report = df if report is None else report.unionByName(df)

    for ns in parse_shapes(shapes):
        # focus4 keeps literal focus nodes' dt/lang (see _focus_frame);
        # focus is the 2-column view every per-focus join/report keys on
        # (report identity is (kind, val), matching the reference's
        # focusNode term rendering)
        focus4 = _focus_frame(data, ns).persist()
        focus = focus4.select("focus_kind", "focus").distinct().persist()

        # node-level constraints apply to the focus term itself
        if ns.constraints:
            nf = focus4.select(
                "focus_kind", "focus",
                F.col("focus_kind").alias("v_kind"),
                F.col("focus").alias("v_val"),
                F.col("focus_dt").alias("v_dt"),
                F.col("focus_lang").alias("v_lang"),
            )
            cond, class_types = _value_violation_cond(data, ns.constraints)
            bad = nf.where(cond)
            if class_types is not None:
                bad = bad.unionByName(
                    nf.join(class_types, ["v_kind", "v_val"], "left_anti"))
            add(_report(ns.iri, None, "node", bad.distinct(), src=ns))

        if ns.closed:
            # ClosedConstraint.java: every (focus p o) with p outside
            # the declared property paths + ignoredProperties violates;
            # the offending predicate is the report path (per-row)
            # only single-predicate forward paths open a predicate for
            # sh:closed (ClosedConstraint.java collects Path->P_Link)
            allowed = ([ps.path_ast[1] for ps in ns.properties
                        if ps.path_ast[0] == "link"] + list(ns.ignored))
            subj = data.select(
                F.col("s_kind").alias("focus_kind"),
                F.col("s_val").alias("focus"),
                "p_val", F.col("o_val").alias("v_val"))
            bad = focus.join(subj, ["focus_kind", "focus"])
            if allowed:
                bad = bad.where(~F.col("p_val").isin(allowed))
            add(bad.select(
                F.lit(ns.iri).alias("shape"), "focus_kind", "focus",
                F.col("p_val").alias("path"),
                F.lit("closed").alias("constraint"),
                F.col("v_val").alias("value"),
                F.lit(ns.severity or (SH + "Violation")).alias("severity"),
                F.lit(ns.message).cast("string").alias("message"),
            ).distinct())

        if ns.logic:
            nf = focus4.select(
                "focus_kind", "focus",
                F.col("focus_kind").alias("v_kind"),
                F.col("focus").alias("v_val"),
                F.col("focus_dt").alias("v_dt"),
                F.col("focus_lang").alias("v_lang"))
            for op, subs in ns.logic:
                lf = _logic_flags(data, [(op, subs)], nf)
                bad_keys = lf.where(F.col("_lbad")).select(
                    F.col("_nk").alias("_nkk"))
                bad = nf.withColumn("_nkk", _nk()).join(bad_keys, "_nkk")
                add(_report(ns.iri, None, op,
                            bad.select("focus_kind", "focus").distinct(),
                            src=ns))

        for sel, msg in ns.sparql:
            # SparqlConstraint.java — SET-BASED twin of the per-focus
            # reference loop: $this becomes a variable, the constraint
            # query runs once over the data graph through this engine's
            # own front-end, and results join the focus frame (each
            # joined row = one violation; ?value projected if present)
            import re as _re

            from jena_spark.queries.sparql import sparql_query

            res = sparql_query(data, _re.sub(r"\$this\b", "?this", sel),
                               flat=False)
            if "this" not in res.columns:
                raise ValueError(
                    "SHACL: sh:select must project $this")
            proj = res.select(
                F.col("this").getField("kind").alias("focus_kind"),
                F.col("this").getField("val").alias("focus"),
                (F.col("value").getField("val") if "value" in res.columns
                 else F.lit(None).cast("string")).alias("v_val"))
            add(_report(ns.iri, None, msg,
                        proj.join(focus, ["focus_kind", "focus"]).distinct(),
                        src=ns, message=msg))

        for ps in ns.properties:
            pairs, zero = _path_pairs(data, ps.path_ast)
            vals = focus.join(
                pairs.select(
                    F.col("n_kind").alias("focus_kind"),
                    F.col("n_val").alias("focus"),
                    "v_kind", "v_val", "v_dt", "v_lang"),
                ["focus_kind", "focus"])
            if zero:  # identity: the focus is one of its own values —
                # carrying its dt/lang (a literal focus under path*
                # stays typed, the _conform_flags identity posture)
                ident = focus4.select(
                    "focus_kind", "focus",
                    F.col("focus_kind").alias("v_kind"),
                    F.col("focus").alias("v_val"),
                    F.col("focus_dt").alias("v_dt"),
                    F.col("focus_lang").alias("v_lang"))
                vals = vals.unionByName(ident).distinct()
            path_str = ps.path

            if ps.min_count is not None or ps.max_count is not None:
                counts = focus.join(
                    vals.groupBy("focus_kind", "focus")
                        .agg(F.count("*").alias("n")),
                    ["focus_kind", "focus"], "left",
                ).select("focus_kind", "focus",
                         F.coalesce("n", F.lit(0)).alias("n"))
                if ps.min_count is not None:
                    add(_report(ns.iri, path_str, "minCount",
                                counts.where(F.col("n") < ps.min_count)
                                .withColumn("v_val", F.col("n").cast("string")), src=ps))
                if ps.max_count is not None:
                    add(_report(ns.iri, path_str, "maxCount",
                                counts.where(F.col("n") > ps.max_count)
                                .withColumn("v_val", F.col("n").cast("string")), src=ps))

            for op, subs in ps.logic:
                lf = _logic_flags(data, [(op, subs)], vals)
                bad_keys = lf.where(F.col("_lbad")).select(
                    F.col("_nk").alias("_nkk"))
                bad = vals.withColumn("_nkk", _nk()).join(bad_keys, "_nkk")
                add(_report(ns.iri, path_str, op, bad.distinct(), src=ps))

            if ps.qualified:
                # QualifiedValueShape: count the value nodes CONFORMING
                # to the inner shape per focus, then bound-check — one
                # flag pass + one aggregation. With
                # sh:qualifiedValueShapesDisjoint, a value node counts
                # only if it does NOT also conform to any SIBLING
                # qualified shape (other property shapes of the same
                # node shape, ``QualifiedValueShape.java`` sibling
                # collection) — one extra flag pass + anti-join per
                # sibling, still set-based.
                ish, qmin, qmax = ps.qualified
                flags = _conform_flags(data, ish, vals)
                qv = vals.withColumn("_nkk", _nk()).join(
                    flags.where(F.col("_ok")).select(
                        F.col("_nk").alias("_nkk")), "_nkk")
                if ps.qualified_disjoint:
                    for sib in (o.qualified[0] for o in ns.properties
                                if o is not ps and o.qualified):
                        sib_ok = _conform_flags(data, sib, vals) \
                            .where(F.col("_ok")) \
                            .select(F.col("_nk").alias("_nkk"))
                        qv = qv.join(sib_ok, "_nkk", "left_anti")
                qcounts = focus.join(
                    qv.groupBy("focus_kind", "focus")
                      .agg(F.count(F.lit(1)).alias("qn")),
                    ["focus_kind", "focus"], "left",
                ).select("focus_kind", "focus",
                         F.coalesce("qn", F.lit(0)).alias("qn"))
                if qmin is not None:
                    add(_report(ns.iri, path_str, "qualifiedMinCount",
                                qcounts.where(F.col("qn") < qmin)
                                .withColumn("v_val", F.col("qn").cast("string")), src=ps))
                if qmax is not None:
                    add(_report(ns.iri, path_str, "qualifiedMaxCount",
                                qcounts.where(F.col("qn") > qmax)
                                .withColumn("v_val", F.col("qn").cast("string")), src=ps))

            if ps.unique_lang:
                # UniqueLangConstraint: >1 value sharing a language tag
                # (BCP47 tags are case-insensitive — "en" == "EN")
                tag = F.lower(F.col("v_lang"))
                dup = (
                    vals.where(F.col("v_lang").isNotNull()
                               & (F.col("v_lang") != ""))
                    .groupBy("focus_kind", "focus", tag.alias("v_lang"))
                    .agg(F.count("*").alias("n"))
                    .where(F.col("n") > 1)
                    .select("focus_kind", "focus",
                            F.col("v_lang").alias("v_val"))
                )
                add(_report(ns.iri, path_str, "uniqueLang", dup, src=ps))

            if ps.pairwise:
                vt = vals.select(
                    "focus_kind", "focus", "v_kind", "v_val",
                    F.coalesce("v_dt", F.lit("")).alias("v_dt"),
                    F.coalesce("v_lang", F.lit("")).alias("v_lang"))
                term_cols = ["focus_kind", "focus", "v_kind", "v_val",
                             "v_dt", "v_lang"]
            for comp, pred in ps.pairwise:
                # EqualsConstraint / DisjointConstraint / LessThan[OrEquals]
                # (pairwise value comparison with the other property's
                # values at the SAME focus node — per-focus equi joins)
                other = data.where(F.col("p_val") == pred).select(
                    F.col("s_kind").alias("focus_kind"),
                    F.col("s_val").alias("focus"),
                    F.col("o_kind").alias("v_kind"),
                    F.col("o_val").alias("v_val"),
                    F.coalesce("o_datatype", F.lit("")).alias("v_dt"),
                    F.coalesce("o_lang", F.lit("")).alias("v_lang"))
                cname = f"{comp}(<{pred}>)"
                if comp == "equals":
                    missing = vt.join(other, term_cols, "left_anti")
                    extra = other.join(vt, term_cols, "left_anti") \
                        .join(focus, ["focus_kind", "focus"], "left_semi")
                    add(_report(ns.iri, path_str, cname,
                                missing.unionByName(extra).distinct(), src=ps))
                elif comp == "disjoint":
                    shared = vt.join(other, term_cols, "left_semi")
                    add(_report(ns.iri, path_str, cname, shared.distinct(), src=ps))
                else:  # lessThan / lessThanOrEquals (numeric value space)
                    w = other.select(
                        "focus_kind", "focus",
                        F.col("v_val").try_cast("double").alias("w_num"))
                    pairs = vt.withColumn(
                        "v_num", F.col("v_val").try_cast("double")
                    ).join(w, ["focus_kind", "focus"])
                    viol = (F.col("v_num").isNull() | F.col("w_num").isNull()
                            | (F.col("v_num") >= F.col("w_num")
                               if comp == "lessThan"
                               else F.col("v_num") > F.col("w_num")))
                    add(_report(ns.iri, path_str, cname,
                                pairs.where(viol).distinct(), src=ps))

            if ps.constraints:
                if "hasValue" in ps.constraints:
                    k, v, dt, lang = ps.constraints["hasValue"]
                    have = vals.where(
                        (F.col("v_kind") == k) & (F.col("v_val") == v)
                    ).select("focus_kind", "focus")
                    add(_report(ns.iri, path_str, "hasValue",
                                focus.join(have, ["focus_kind", "focus"],
                                           "left_anti"), src=ps))
                rest = {k: v for k, v in ps.constraints.items()
                        if k != "hasValue"}
                if rest:
                    cond, class_types = _value_violation_cond(data, rest)
                    bad = vals.where(cond)
                    if class_types is not None:
                        bad = bad.unionByName(
                            vals.join(class_types, ["v_kind", "v_val"],
                                      "left_anti"))
                    add(_report(ns.iri, path_str, "value", bad.distinct(), src=ps))

    if report is None:  # all shapes deactivated / constraint-free
        return data.sparkSession.createDataFrame(
            [], "shape string, focus_kind string, focus string,"
                "path string, constraint string, value string,"
                "severity string, message string")
    return report.select(*REPORT_COLS).distinct()


def conforms(data: DataFrame, shapes: DataFrame) -> bool:
    return validate(data, shapes).isEmpty()
