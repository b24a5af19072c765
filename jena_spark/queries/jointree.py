"""Join-tree plan explain — the neo-optimizer fork's own tooling.

The fork's research surface (its whole point, per the module name)
serializes the optimizer's chosen BGP join order as a left-deep
binary tree: ``tdbqueryplan`` reads a CSV of queries, reorders every
BGP with ``ReorderWeighted`` over collected statistics, and emits one
nested-JSON-array tree per BGP —

* leaf: ``["<S>_<P>_<O>ᶲ<predicate|NONE>"]`` where ``<S>_<P>_<O>`` is
  the pattern's term-kind signature (``VisitorJoinTreeNeo2.formatTriple``:
  ``getType`` → URI/VAR/LITERAL, property paths print ``PATH``) and
  the second field is the pattern's identifying concrete term in
  (predicate, subject, object) preference order — ``NONE`` when the
  pattern has no concrete anchor
  (``jena-neo-optimizer/.../mgt/VisitorJoinTreeNeo2.java:520-560``);
* join: ``["JOINᶲ<pred>ᶲ<pred>…", left, right]`` collecting every
  leaf anchor underneath, built by folding the reordered pattern list
  left-deep (``utils/BinaryTree.java::addNodeList``,
  ``utils/BinaryTreePlan.java::defineDataJoinNode``).

This module reproduces that surface over THIS engine's parser and
reorderers: the tree shows exactly the join order
:func:`jena_spark.queries.algebra.reorder_patterns` (or the stats-fed
:func:`~jena_spark.queries.algebra.reorder_patterns_stats`, when
predicate counts are supplied — the ``StatsMatcher``/``stats.opt``
analog) will hand to Spark. Each leaf also carries the reorder weight
(``ReorderWeighted.getTripleWeight``) in its data dict, though — like
the reference's ``printLeafDataNode`` — the serialized form prints
only the kind signature and anchor.

Driver-side by design: plans are metadata, not data. The only
cluster work is the optional one-pass predicate census
(``pipeline/stats.predicate_counts``) feeding the weights.
"""

from __future__ import annotations

import json

from jena_spark.queries.algebra import (
    Var,
    _reorder_weight,
    reorder_patterns,
    reorder_patterns_stats,
    stats_weight,
)

#: the reference's value delimiter inside one tree node
#: (``VisitorJoinTreeNeo2.write`` builds ``BinaryTreePlan("ᶲ")``).
DELIM = "ᶲ"  # ᶲ

#: the reference's within-column value delimiter
#: (``tdbqueryplan.java:227`` — ``delimiterColVals = "ᶷ"``); measured
#: leaf cardinalities append to the leaf label with it.
VAL_DELIM = "ᶷ"


def _term_kind(t, position: str) -> str:
    from jena_spark.queries.sparql import PathExpr

    if isinstance(t, Var):
        return "VAR"
    if isinstance(t, PathExpr):
        return "PATH"
    if isinstance(t, tuple):
        if t[0] == "iri":
            return "URI"
        if t[0] == "bnode":
            return "BLANK"
        return "LITERAL"
    return "LITERAL"


#: kind signatures with no concrete anchor term (the reference's
#: explicit NONE list, ``VisitorJoinTreeNeo2.java:546``).
_ANCHORLESS = {"VAR_VAR_VAR", "VAR_VAR_LITERAL", "LITERAL_VAR_VAR"}


def leaf(pattern, pred_counts: dict[str, int] | None = None) -> dict:
    """Leaf node data for one triple pattern: kind signature, anchor
    predicate list (empty = NONE), and the reorder weight the
    optimizer used (scaled by the predicate's collected count when
    stats are supplied — ``getTripleWeight``)."""
    from jena_spark.queries.sparql import PathExpr

    s, p, o = pattern
    sig = "_".join(
        _term_kind(t, pos) for t, pos in ((s, "s"), (p, "p"), (o, "o"))
    )
    preds: list[str] = []
    if sig not in _ANCHORLESS:
        if isinstance(p, PathExpr):
            preds.append("PATH")
        elif _term_kind(p, "p") == "URI":
            preds.append(p[1])
        elif _term_kind(s, "s") == "URI":
            preds.append(s[1])
        elif _term_kind(o, "o") == "URI":
            preds.append(o[1])
    # the pattern's STANDALONE weight — ``getTripleWeight(new
    # PatternTriple(t))`` takes no bound-variable context, so neither
    # does this; the in-context weights the greedy reorder used along
    # the way are a different number (algebra.stats_weight with the
    # accumulated bound set).
    if isinstance(p, PathExpr):
        weight = None
    elif pred_counts is not None:
        weight = stats_weight(pattern, set(), pred_counts)
    else:
        weight = _reorder_weight(pattern, set())
    return {"tpf_type": sig, "predicates": preds, "cardinality": weight,
            "key": pattern_key(pattern)}


def join_tree(
    patterns: list, pred_counts: dict[str, int] | None = None
) -> dict:
    """Reorder ``patterns`` (stats-fed when counts are given, the
    fixed-weight order otherwise) and fold the result into the
    left-deep binary tree the engine will execute — node dicts with
    ``type`` JOIN/TPF, ``predicates``, and ``left``/``right``."""
    from jena_spark.queries.sparql import PathExpr

    if any(isinstance(p[1], PathExpr) for p in patterns) and len(patterns) > 1:
        # the compiler evaluates each path triple as its OWN step
        # (every path flushes the BGP run) — a tree mixing paths with
        # plain patterns would show a join order that never executes
        raise ValueError(
            "join_tree: property-path patterns evaluate as their own "
            "step — pass each as a single-pattern list"
        )
    if isinstance(patterns[0][1], PathExpr):
        ordered = list(patterns)
    elif pred_counts is not None:
        ordered = reorder_patterns_stats(patterns, pred_counts)
    else:
        ordered = reorder_patterns(patterns)
    leaves = [
        {"type": "TPF", **leaf(p, pred_counts)} for p in ordered
    ]
    if not leaves:
        raise ValueError("join_tree: empty pattern list")
    node = leaves[0]
    for right in leaves[1:]:
        node = {
            "type": "JOIN",
            "predicates": node["predicates"] + right["predicates"],
            "left": node,
            "right": right,
        }
    return node


def tree_json(node: dict, delim: str = DELIM) -> list:
    """The reference serialization: nested JSON arrays, label =
    type-or-signature + delim-joined anchors (leaves print their kind
    signature; NONE marks an anchorless leaf)."""
    if node["type"] == "TPF":
        anchor = node["predicates"][0] if node["predicates"] else "NONE"
        return [node["tpf_type"] + delim + anchor]
    label = "JOIN" + delim + delim.join(node["predicates"])
    return [label, tree_json(node["left"], delim), tree_json(node["right"], delim)]


def _walk_groups(group, out: list) -> None:
    """Collect contiguous triple-pattern runs exactly as the compiler
    evaluates them: FILTER/BIND/VALUES and every sub-group boundary
    flushes the run (``sparql._Compiler.compile_group``)."""
    from jena_spark.queries.sparql import Group, PathExpr, PFPat, QTPat

    run: list = []

    def flush():
        nonlocal run
        if run:
            out.append(run)
            run = []

    for el in group.elements:
        tag = el[0]
        if tag == "triple" and not isinstance(el[1], PFPat):
            s, verb, o = el[1]
            if isinstance(s, QTPat) or isinstance(o, QTPat):
                flush()
                continue
            if isinstance(verb, PathExpr):
                # every path triple is its own evaluation step — the
                # compiler flushes the BGP run at a PathExpr
                flush()
                out.append([el[1]])
                continue
            run.append(el[1])
        else:
            flush()
            for part in el[1:]:
                if isinstance(part, Group):
                    _walk_groups(part, out)
                elif isinstance(part, list) and all(
                    isinstance(b, Group) for b in part
                ):
                    for b in part:
                        _walk_groups(b, out)
                elif hasattr(part, "where") and part.where is not None:
                    _walk_groups(part.where, out)  # subselect
    flush()


def pattern_key(pattern) -> str:
    """Deterministic per-pattern registry key — the
    ``PatternTriple.toString()`` analog (``ReorderWeighted.java:21``
    keys ``currentCardinality`` by it): ``?var`` / ``<iri>`` /
    ``_:label`` / ``"lexical"`` space-joined."""
    from jena_spark.queries.sparql import PathExpr

    def term(t) -> str:
        if isinstance(t, Var):
            return "?" + t.name
        if isinstance(t, PathExpr):
            return "PATH"
        if isinstance(t, tuple):
            if t[0] == "iri":
                return f"<{t[1]}>"
            if t[0] == "bnode":
                return "_:" + t[1]
            out = '"' + t[1] + '"'
            dt = t[2] if len(t) > 2 else None
            lang = t[3] if len(t) > 3 else None
            if lang:
                out += "@" + lang
            elif dt:
                out += "^^<" + dt + ">"
            return out
        return str(t)

    return " ".join(term(x) for x in pattern)


def pattern_cardinalities(triples, patterns) -> dict[str, int]:
    """EXECUTED per-pattern cardinalities — the measurement the fork's
    research loop exists to harvest (``tdbqueryplan.java:50`` keeps a
    per-query ``currentCardinality`` map; ``ReorderWeighted.java:21``
    fills it with *stats-matched* weights — here the count is the
    pattern's actual scan cardinality against ``triples``).

    ONE aggregation job for the whole batch: every pattern contributes
    a conditional count over a single shared scan (no per-pattern jobs,
    no shuffle beyond the final 1-row reduce), so measuring a 50-query
    workload costs one pass over the triple table at 100 TB.
    """
    from jena_spark.queries.graph import pattern_predicate
    from jena_spark.queries.sparql import PathExpr
    from pyspark.sql import functions as F

    uniq: dict[str, tuple] = {}
    for p in patterns:
        if isinstance(p[1], PathExpr):
            continue  # paths evaluate as closures, not one scan
        uniq.setdefault(pattern_key(p), p)
    if not uniq:
        return {}
    keys = list(uniq)
    aggs = []
    for i, k in enumerate(keys):
        s, pp, o = uniq[k]
        consts = [t if not isinstance(t, Var) else None for t in (s, pp, o)]
        cond = pattern_predicate(*consts)
        # repeated variable inside one pattern filters the scan too
        # (algebra.triple_pattern's within-pattern equality)
        names = [t.name if isinstance(t, Var) else None for t in (s, pp, o)]
        plain_o = (F.coalesce(F.col("o_datatype"), F.lit("")) == "") \
            & (F.coalesce(F.col("o_lang"), F.lit("")) == "")
        if names[0] is not None and names[0] == names[2]:
            cond = cond & (F.col("s_kind") == F.col("o_kind")) \
                & (F.col("s_val") == F.col("o_val")) & plain_o
        if names[1] is not None and names[1] == names[0]:
            cond = cond & (F.col("s_kind") == F.lit("iri")) \
                & (F.col("s_val") == F.col("p_val"))
        if names[1] is not None and names[1] == names[2]:
            cond = cond & (F.col("o_kind") == F.lit("iri")) \
                & (F.col("o_val") == F.col("p_val")) & plain_o
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"c{i}"))
    row = triples.agg(*aggs).collect()[0]
    return {k: int(row[f"c{i}"] or 0) for i, k in enumerate(keys)}


def reorder_patterns_measured(
    patterns, cards: dict[str, int],
    pred_counts: dict[str, int] | None = None,
):
    """Close the fork's research loop: ``ReorderWeighted`` driven by
    EXECUTED cardinalities instead of estimates
    (``OpExecutorTDB2Neo.java:74,381`` logs ``currentCardinality`` per
    pattern key precisely so later runs can weight with the measured
    number). A pattern whose :func:`pattern_key` appears in ``cards``
    (a :func:`pattern_cardinalities` /
    :func:`measured_query_plan` harvest) weights as fixed boundness ×
    measured scan rows; unmeasured patterns fall back to the
    stats-fed estimate when ``pred_counts`` is given, else to a
    pessimistic max-measured+1 prior (StatsMatcher's no-information
    path defers to the fallback reorder — here that means measured
    patterns lead). Greedy smallest-first with bound-variable
    substitution, same as the estimate-fed twin."""
    default = (max(cards.values()) + 1) if cards else 1
    remaining = list(patterns)
    bound: set[str] = set()
    out = []
    while remaining:

        def weight(pat) -> int:
            key = pattern_key(pat)
            if key in cards:
                return _reorder_weight(pat, bound) * max(1, cards[key])
            if pred_counts is not None:
                return stats_weight(pat, bound, pred_counts)
            return _reorder_weight(pat, bound) * default

        best = min(range(len(remaining)),
                   key=lambda i: (weight(remaining[i]), i))
        chosen = remaining.pop(best)
        out.append(chosen)
        for t in chosen:
            if isinstance(t, Var):
                bound.add(t.name)
    return out


def tree_json_measured(
    node: dict, cards: dict[str, int],
    delim: str = DELIM, val_delim: str = VAL_DELIM,
) -> list:
    """:func:`tree_json` with each measured leaf label suffixed
    ``ᶷ<executed cardinality>`` (the reference's within-column value
    delimiter); unmeasured leaves (paths) keep the plain label."""
    if node["type"] == "TPF":
        anchor = node["predicates"][0] if node["predicates"] else "NONE"
        label = node["tpf_type"] + delim + anchor
        if node.get("key") in cards:
            label += val_delim + str(cards[node["key"]])
        return [label]
    label = "JOIN" + delim + delim.join(node["predicates"])
    return [label, tree_json_measured(node["left"], cards, delim, val_delim),
            tree_json_measured(node["right"], cards, delim, val_delim)]


def measured_query_plan(
    data, query: str, pred_counts: dict[str, int] | None = None,
    delim: str = DELIM, val_delim: str = VAL_DELIM,
) -> dict:
    """Run ``query`` against ``data`` and return the fork's per-query
    registries shape (``tdbqueryplan.java:46-51``: ``registros`` row =
    {query, execution_tree}, ``currentCardinality``, ``ModTime`` wall
    clock) with EXECUTED numbers:

    * ``execution_tree`` — one serialized join tree per BGP run, each
      leaf annotated ``ᶷ<executed cardinality>``;
    * ``cardinality`` — the per-pattern scan-cardinality registry;
    * ``rows`` / ``time_ms`` — result size and wall time of the real
      execution through the engine's own front-end.
    """
    import time as _time

    from jena_spark.queries.sparql import Parser, sparql_query

    q = Parser(query).parse()
    runs: list = []
    if q.where is not None:
        _walk_groups(q.where, runs)
    cards = pattern_cardinalities(data, [p for r in runs for p in r])
    trees = [
        json.dumps(
            tree_json_measured(join_tree(r, pred_counts), cards,
                               delim, val_delim),
            ensure_ascii=False, separators=(",", ":"))
        for r in runs
    ]
    t0 = _time.perf_counter()
    rows = sparql_query(data, query).count()
    dt_ms = round((_time.perf_counter() - t0) * 1000.0, 3)
    return {
        "query": " ".join(query.split()),
        "execution_tree": trees,
        "cardinality": cards,
        "rows": rows,
        "time_ms": dt_ms,
    }


def query_plan(
    query: str, pred_counts: dict[str, int] | None = None,
    delim: str = DELIM,
) -> list[str]:
    """Parse a SPARQL string with this engine's front-end and return
    one serialized join tree per BGP run, in evaluation order — the
    ``tdbqueryplan --tdb_tree`` output for one query."""
    from jena_spark.queries.sparql import Parser

    q = Parser(query).parse()
    if q.where is None:
        return []
    runs: list = []
    _walk_groups(q.where, runs)
    return [
        json.dumps(tree_json(join_tree(r, pred_counts), delim),
                   ensure_ascii=False, separators=(",", ":"))
        for r in runs
    ]
