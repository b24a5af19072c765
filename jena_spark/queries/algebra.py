"""SPARQL-algebra operators compiled to DataFrame plans.

The reference compiles SPARQL to an ``Op`` tree
(``jena-arq/.../sparql/algebra/op/``, executed by
``engine/main/OpExecutor.java:62``). We expose the same algebra as
Python combinators that build a Catalyst logical plan — Catalyst then
plays the role of ``OptimizerStd`` (``algebra/optimize/OptimizerStd.java:45``):
predicate pushdown ≙ TransformFilterPlacement, TakeOrderedAndProject ≙
TransformTopN, AQE join selection ≙ TransformJoinStrategy (SURVEY.md §4.1).

Binding model: a solution (``Binding``,
``jena-arq/.../sparql/engine/binding/Binding.java:28``) is a DataFrame
row; each SPARQL variable is ONE struct column
``(kind, val, datatype, lang)`` so join equality is whole-term (node)
equality, exactly ``Node.equals`` (``Node.java:247-248``). Null
datatype/lang are normalized to '' inside the structs so plain column
equality works; :func:`flatten` de-normalizes for output.

Operator mapping (exec dispatch lines in OpExecutor.java):
  OpBGP ``:127`` → :func:`bgp` (chain of filtered scans joined on
  shared vars); OpFilter ``:300`` → :func:`filter_`;
  OpProject ``:387`` → :func:`project`; OpExtend ``:444`` →
  :func:`extend`; OpJoin ``:205`` → :func:`join`; OpLeftJoin ``:238``
  → :func:`left_join`; OpMinus ``:257`` → :func:`minus`;
  OpUnion ``:275`` → :func:`union_`; OpDistinct ``:415`` →
  ``df.distinct()``; OpOrder ``:364`` / OpSlice ``:403`` / OpTopN
  ``:370`` → :func:`order_by` / :func:`slice_` (Catalyst fuses
  order+limit into TakeOrderedAndProject); OpTable (VALUES) ``:325``
  → :func:`values`; E_Exists/E_NotExists → :func:`exists` /
  :func:`not_exists` (left_semi / left_anti).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.queries.graph import TermSpec, _normalize, pattern_predicate


@dataclass(frozen=True)
class Var:
    name: str


Pattern = tuple  # (s, p, o), each Var or TermSpec const


def _empty_str(c: Column) -> Column:
    return F.coalesce(c, F.lit(""))


def _var_struct_for(position: str) -> Column:
    """Bind a variable to the term at an s/p/o position as one struct."""
    if position == "s":
        return F.struct(
            F.col("s_kind").alias("kind"), F.col("s_val").alias("val"),
            F.lit("").alias("datatype"), F.lit("").alias("lang"),
        )
    if position == "p":
        return F.struct(
            F.lit("iri").alias("kind"), F.col("p_val").alias("val"),
            F.lit("").alias("datatype"), F.lit("").alias("lang"),
        )
    return F.struct(
        F.col("o_kind").alias("kind"), F.col("o_val").alias("val"),
        _empty_str(F.col("o_datatype")).alias("datatype"),
        _empty_str(F.col("o_lang")).alias("lang"),
    )


def triple_pattern(triples: DataFrame, pattern: Pattern) -> DataFrame:
    """One triple pattern -> bindings DataFrame (one struct col per var)."""
    s, p, o = pattern
    consts = [t if not isinstance(t, Var) else None for t in (s, p, o)]
    df = triples.where(pattern_predicate(*consts))
    cols: dict[str, Column] = {}
    for pos, term in zip(("s", "p", "o"), (s, p, o)):
        if isinstance(term, Var):
            expr = _var_struct_for(pos)
            if term.name in cols:  # repeated var within one pattern
                df = df.where(cols[term.name] == expr)
            else:
                cols[term.name] = expr
    return df.select(*[c.alias(n) for n, c in cols.items()])


def join(left: DataFrame, right: DataFrame) -> DataFrame:
    """OpJoin: natural join on shared vars; cross join when disjoint
    (``engine/join/QueryIterNestedLoopJoin.java`` is the reference's
    no-shared-vars fallback — Spark plans a cartesian product)."""
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left.crossJoin(right)
    return left.join(right, shared, "inner")


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _reorder_weight(pattern: Pattern, bound: set[str]) -> int:
    """ReorderFixed's fixed weights (``jena-arq/.../engine/optimizer/
    reorder/ReorderFixed.java:84-98``): SP?=2, ?PO=3, S?O=2, S??=10,
    ??O=20, ?P?=30, ???=big; rdf:type patterns penalized (VAR type
    TERM=5, VAR type VAR=50). A variable already bound by earlier
    patterns counts as concrete (the substitution part of
    ``ReorderTransformationSubstitution``)."""
    s, p, o = pattern

    def concrete(t):
        return not isinstance(t, Var) or t.name in bound

    cs, cp, co = concrete(s), concrete(p), concrete(o)
    is_type = (not isinstance(p, Var)) and (
        p == RDF_TYPE or (isinstance(p, tuple) and p[1] == RDF_TYPE)
    )
    if cs and cp and co:
        return 1
    if cs and cp:
        return 2
    if cp and co:
        return 5 if is_type else 3
    if cs and co:
        return 2
    if cs:
        return 10
    if co:
        return 20
    if cp:
        return 50 if is_type else 30
    return 100


def reorder_patterns(patterns: list[Pattern]) -> list[Pattern]:
    """Greedy smallest-weight-first with variable substitution —
    the ARQ/TDB heuristic join order (``ReorderFixed.java:34``,
    ``ReorderTransformationSubstitution.java``). AQE still adapts the
    physical join strategy at runtime; this fixes the *logical* chain
    order so the most selective pattern scans first."""
    remaining = list(patterns)
    bound: set[str] = set()
    out: list[Pattern] = []
    while remaining:
        best = min(range(len(remaining)),
                   key=lambda i: (_reorder_weight(remaining[i], bound), i))
        chosen = remaining.pop(best)
        out.append(chosen)
        for t in chosen:
            if isinstance(t, Var):
                bound.add(t.name)
    return out


def _pattern_pred_iri(p) -> str | None:
    """Concrete predicate IRI of a pattern position, if any."""
    if isinstance(p, Var):
        return None
    return p[1] if isinstance(p, tuple) else p


def reorder_patterns_stats(
    patterns: list[Pattern], pred_counts: dict[str, int],
    type_counts: dict[str, int] | None = None,
) -> list[Pattern]:
    """Statistics-fed join ordering — the ``StatsMatcher`` /
    ``ReorderWeighted`` posture (``jena-arq/.../engine/optimizer/
    StatsMatcher.java``; the neo-optimizer fork's
    ``reorder/ReorderWeighted.java:8-29``): the collected per-predicate
    cardinalities (``pipeline/stats.predicate_counts`` ≙ TDB
    ``StatsCollector``) scale the fixed boundness weights, so of two
    equally-shaped patterns the one over the RARER predicate scans
    first, and an unfiltered-predicate pattern (no concrete predicate,
    or a predicate at corpus-dominating count) never leads the chain.

    weight(pattern) = fixed_boundness_weight × estimated_scan_rows,
    greedy smallest-first with bound-variable substitution (same
    substitution rule as :func:`reorder_patterns`)."""
    remaining = list(patterns)
    bound: set[str] = set()
    out: list[Pattern] = []
    while remaining:

        def weight(pat: Pattern) -> int:
            return stats_weight(pat, bound, pred_counts, type_counts)

        best = min(range(len(remaining)), key=lambda i: (weight(remaining[i]), i))
        chosen = remaining.pop(best)
        out.append(chosen)
        for t in chosen:
            if isinstance(t, Var):
                bound.add(t.name)
    return out


def stats_weight(
    pattern: Pattern, bound: set[str], pred_counts: dict[str, int],
    type_counts: dict[str, int] | None = None,
) -> int:
    """One pattern's stats-scaled weight: the fixed boundness weight ×
    the predicate's collected count (``ReorderWeighted.
    getTripleWeight`` over a ``StatsMatcher``). An unseen predicate
    estimates 1 — StatsMatcher treats it as matching nothing (weight 0
    would be ideal-first; 1 keeps fully concrete known patterns
    winning ties deterministically); a variable predicate estimates
    the corpus total. When a ``type_counts`` map is supplied (the
    ``((VAR rdf:type <T>) n)`` entries of a ``stats.opt`` file —
    ``StatsMatcher.addPattern`` registers exactly these,
    ``StatsMatcher.java:140-160``), an ``rdf:type`` pattern with a
    CONCRETE class estimates that class's instance count instead of
    the whole rdf:type census. Shared by
    :func:`reorder_patterns_stats` and the join-tree explain
    (``queries/jointree.py``) so the printed cardinality cannot drift
    from the reorder."""
    pred = _pattern_pred_iri(pattern[1])
    total = max(1, sum(pred_counts.values()))
    est = total if pred is None else pred_counts.get(pred, 1)
    if type_counts is not None and pred == TM.RDF_TYPE:
        obj = pattern[2]
        if isinstance(obj, tuple) and obj[0] == "iri":
            est = type_counts.get(obj[1], 1)
    return _reorder_weight(pattern, bound) * max(1, est)


def pred_counts_of(triples: DataFrame) -> dict[str, int]:
    """Collect per-predicate counts for :func:`reorder_patterns_stats`
    (driver-size: bounded by the number of distinct predicates)."""
    from jena_spark.pipeline.stats import predicate_counts

    return {
        r["predicate"]: r["n"] for r in predicate_counts(triples).collect()
    }


def bgp(
    triples: DataFrame, patterns: list[Pattern], reorder: bool = True,
    pred_counts: dict[str, int] | None = None,
    measured_cards: dict[str, int] | None = None,
) -> DataFrame:
    """Basic graph pattern: conjunctive self-joins over the triple table
    (OpBGP, ``OpExecutor.java:127``; stage generator
    ``engine/main/StageGeneratorGeneric.java:37``). Logical join order
    follows the ReorderFixed heuristic (:func:`reorder_patterns`) — or,
    when collected statistics are supplied, the stats-weighted order
    (:func:`reorder_patterns_stats`, the TDB StatsMatcher posture), or,
    when a measured-cardinality harvest from a prior run is supplied
    (``jointree.pattern_cardinalities``), the executed-weight order
    (``jointree.reorder_patterns_measured``, the neo-optimizer fork's
    feedback loop); AQE/CBO then own the physical strategy — together
    the analog of TDB's ReorderFixed + runtime re-order
    (``OpExecutorTDB1.java:187``)."""
    if measured_cards is not None:
        from jena_spark.queries.jointree import reorder_patterns_measured

        patterns = reorder_patterns_measured(
            patterns, measured_cards, pred_counts)
    elif pred_counts is not None:
        patterns = reorder_patterns_stats(patterns, pred_counts)
    elif reorder:
        patterns = reorder_patterns(patterns)
    out = None
    for p in patterns:
        step = triple_pattern(triples, p)
        out = step if out is None else join(out, step)
    assert out is not None, "empty BGP"
    return out


# --- accessors for filter/extend expressions --------------------------------

def v(name: str) -> Column:
    """The variable's lexical value (E_Str semantics)."""
    return F.col(name).getField("val")


def v_kind(name: str) -> Column:
    return F.col(name).getField("kind")


def v_datatype(name: str) -> Column:
    return F.nullif(F.col(name).getField("datatype"), F.lit(""))


def v_lang(name: str) -> Column:
    return F.nullif(F.col(name).getField("lang"), F.lit(""))


def v_num(name: str) -> Column:
    """Typed numeric shadow (NodeValue promotion, decimal space)."""
    return v(name).cast("decimal(38,18)")


def filter_(df: DataFrame, cond: Column) -> DataFrame:
    return df.where(cond)


def extend(df: DataFrame, name: str, expr: Column) -> DataFrame:
    return df.withColumn(name, expr)


def project(df: DataFrame, *names: str) -> DataFrame:
    return df.select(*names)


def union_(left: DataFrame, right: DataFrame) -> DataFrame:
    """OpUnion — bag union of compatible bindings; missing vars -> null."""
    return left.unionByName(right, allowMissingColumns=True)


def left_join(left: DataFrame, right: DataFrame, cond: Column | None = None) -> DataFrame:
    """OpLeftJoin (OPTIONAL): left outer on shared vars, the optional
    filter condition folded into the join expression
    (``OpExecutor.java:238``)."""
    shared = sorted(set(left.columns) & set(right.columns))
    if cond is None and shared:
        return left.join(right, shared, "left")
    lft, rgt = left.alias("l"), right.alias("r")
    join_cond = F.lit(True)
    for s in shared:
        join_cond = join_cond & (F.col(f"l.{s}") == F.col(f"r.{s}"))
    if cond is not None:
        join_cond = join_cond & cond
    out = lft.join(rgt, join_cond, "left")
    keep = [F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c) if c in shared
            else F.col(f"l.{c}") for c in left.columns]
    keep += [F.col(f"r.{c}").alias(c) for c in right.columns if c not in shared]
    return out.select(*keep)


def _nlj_minus(left: DataFrame, right: DataFrame, shared: list[str]) -> DataFrame:
    """Null-tolerant MINUS remainder: non-equi anti join (Spark plans a
    BroadcastNestedLoopJoin). Only ever fed null-BEARING slices — the
    null-free bulk goes through the equi fast path in :func:`minus`."""
    lft, rgt = left.alias("l"), right.alias("r")
    compat = F.lit(True)
    overlap = F.lit(False)
    for s in shared:
        lc, rc = F.col(f"l.{s}"), F.col(f"r.{s}")
        compat = compat & (lc.isNull() | rc.isNull() | (lc == rc))
        overlap = overlap | (lc.isNotNull() & rc.isNotNull())
    return lft.join(rgt, compat & overlap, "left_anti")


def minus(left: DataFrame, right: DataFrame) -> DataFrame:
    """OpMinus (``OpExecutor.java:257``, ``QueryIterMinus.java``):
    remove left rows for which some right row is *compatible* AND the
    shared domain is non-empty. Unbound (null) vars are compatible with
    anything — hence the null-tolerant condition rather than plain
    equality.

    Scale design: the null-tolerant condition is non-equi, which would
    force an O(N·M) nested-loop plan over the WHOLE inputs. In this
    algebra unbound vars arise only from OPTIONAL/UNION, so nulls are
    (a) statically impossible when the schema says every shared column
    is non-nullable (BGP-built bindings — Spark's CreateNamedStruct is
    non-nullable), in which case compatibility degenerates to equality
    and a single hash/broadcast ``left_anti`` is the whole plan; or
    (b) runtime-rare, in which case the inputs are split: the null-free
    bulk takes the equi anti join and only the null-bearing slices pay
    the nested loop (``QueryIterMinus.java`` always pays it)."""
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left  # disjoint domains: keep everything
    l_nullable = [s for s in shared if left.schema[s].nullable]
    r_nullable = [s for s in shared if right.schema[s].nullable]
    if not l_nullable and not r_nullable:
        return left.join(right, shared, "left_anti")

    def any_null(cols: list[str]) -> Column:
        pred = F.lit(False)
        for s in cols:
            pred = pred | F.col(s).isNull()
        return pred

    r_full = right.where(~any_null(r_nullable)) if r_nullable else right
    r_part = right.where(any_null(r_nullable)) if r_nullable else right.limit(0)
    l_full = left.where(~any_null(l_nullable)) if l_nullable else left
    l_part = left.where(any_null(l_nullable)) if l_nullable else left.limit(0)

    # Null-free left rows: equality is required against null-free right
    # rows (equi anti), then the survivors face only the null-bearing
    # right slice in the nested loop.
    survivors = l_full.join(r_full, shared, "left_anti")
    return _nlj_minus(survivors, r_part, shared).unionByName(
        _nlj_minus(l_part, right, shared)
    )


def exists(left: DataFrame, right: DataFrame) -> DataFrame:
    """FILTER EXISTS — left_semi on shared vars (E_Exists)."""
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left if not right.isEmpty() else left.limit(0)
    return left.join(right, shared, "left_semi")


def not_exists(left: DataFrame, right: DataFrame) -> DataFrame:
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left if right.isEmpty() else left.limit(0)
    return left.join(right, shared, "left_anti")


def values(spark: SparkSession, names: list[str], rows: list[list[TermSpec]]) -> DataFrame:
    """OpTable (VALUES): inline bindings table (``OpExecutor.java:325``)."""
    data = []
    for row in rows:
        rec = []
        for t in row:
            n = _normalize(t)
            rec.append((n[0], n[1], n[2] or "", n[3] or "") if n else None)
        data.append(rec)
    schema_parts = [
        f"{name} struct<kind:string,val:string,datatype:string,lang:string>"
        for name in names
    ]
    return spark.createDataFrame(data, ", ".join(schema_parts))


def order_by(df: DataFrame, *cols: Column) -> DataFrame:
    return df.orderBy(*cols)


def term_sort_key(name: str) -> list[Column]:
    """SPARQL ORDER BY total order over mixed RDF terms, as sort-key
    columns (``NodeValue.java:60`` comparison chain +
    ``engine/binding/BindingComparator.java`` — ARQ's compareAlways).

    Category order: unbound < blank node < IRI < literal; literals
    subdivide by value space (numerics by promoted numeric value, then
    xsd:dateTime by instant) with the remaining literals ordered by
    (lexical form, datatype IRI, language tag) — a deterministic total
    order that refines the SPARQL 15.1 partial order exactly the way
    ARQ's compareAlways does for sorting. Ties inside a value space
    (e.g. "01"^^xsd:int vs "1"^^xsd:integer) break on the lexical
    triple, so the order is strict on distinct terms.

    Pure JVM-side CASE/cast expressions — usable in a distributed
    range-partitioned sort (TakeOrderedAndProject for LIMIT queries)."""
    from jena_spark import terms as TM
    from jena_spark.pipeline.shadows import _NUMERIC_DTS

    c = F.col(name)
    kind, val = c.getField("kind"), c.getField("val")
    dt, lang = c.getField("datatype"), c.getField("lang")
    is_lit = kind == F.lit("literal")
    is_num = is_lit & dt.isin(_NUMERIC_DTS)
    is_ts = is_lit & (dt == F.lit(TM.XSD_DATETIME))
    rank = (
        F.when(c.isNull(), 0)
        .when(kind == "bnode", 1)
        .when(kind == "iri", 2)
        .when(is_num, 3)
        .when(is_ts, 4)
        # RDF-star quoted triples order AFTER every literal
        # (NodeCmp.compareRDFTerms classifies triple terms last),
        # among themselves by canonical lexical
        .when(kind == "triple", 6)
        .otherwise(5)
    )
    num = F.when(is_num, val.try_cast("decimal(38,18)"))
    ts = F.when(is_ts, F.regexp_replace(val, "Z$", "").try_cast("timestamp"))
    return [rank, num, ts, val, dt, lang]


def order_by_terms(df: DataFrame, *names: str, ascending: bool = True) -> DataFrame:
    """ORDER BY over mixed-term variables using the SPARQL total order
    (``QueryIterSort.java:48`` with a BindingComparator). DESC reverses
    the whole key chain (ARQ reverses the comparator)."""
    cols: list[Column] = []
    for n in names:
        for k in term_sort_key(n):
            cols.append(k.asc_nulls_first() if ascending else k.desc_nulls_last())
    return df.orderBy(*cols)


def slice_(df: DataFrame, offset: int = 0, limit: int | None = None) -> DataFrame:
    out = df.offset(offset) if offset else df
    return out.limit(limit) if limit is not None else out


def construct(bindings: DataFrame, templates: list[Pattern]) -> DataFrame:
    """CONSTRUCT: instantiate triple templates from bindings
    (``QueryExecutionBase.execConstruct``, ``sparql/engine/
    QueryExecutionBase.java:206``). Each template position is a Var
    (substituted from the binding's term struct) or a constant TermSpec;
    rows with an unbound variable in any position are skipped (SPARQL
    CONSTRUCT semantics); the result is a set (CONSTRUCT builds a
    graph, so duplicates collapse)."""

    def term_cols(term, position: str) -> list[Column]:
        if isinstance(term, Var):
            v = F.col(term.name)
            kind, val = v.getField("kind"), v.getField("val")
            datatype = F.nullif(v.getField("datatype"), F.lit(""))
            lang = F.nullif(v.getField("lang"), F.lit(""))
        else:
            n = _normalize(term)
            kind, val = F.lit(n[0]), F.lit(n[1])
            datatype = F.lit(n[2]).cast("string")
            lang = F.lit(n[3]).cast("string")
        if position == "s":
            return [kind.alias("s_kind"), val.alias("s_val")]
        if position == "p":
            return [val.alias("p_val")]
        return [kind.alias("o_kind"), val.alias("o_val"),
                datatype.alias("o_datatype"), lang.alias("o_lang")]

    parts = []
    for s, p, o in templates:
        bound = F.lit(True)
        for term in (s, p, o):
            if isinstance(term, Var):
                bound = bound & F.col(term.name).isNotNull()
        row = bindings.where(bound).select(
            *term_cols(s, "s"), *term_cols(p, "p"), *term_cols(o, "o")
        )
        parts.append(row)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.dropDuplicates(
        ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype", "o_lang"]
    )


def flatten(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """Var structs -> plain lexical-value string columns (for output /
    oracle comparison). '' normalization is undone to real nulls."""
    names = names or df.columns
    return df.select(*[F.col(n).getField("val").alias(n) for n in names])
