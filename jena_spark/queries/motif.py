"""GraphFrames-style motif finding over the triple table.

The idiomatic Spark graph surface is GraphFrames' ``g.find()`` motif
language — ``"(a)-[e]->(b); (b)-[e2]->(c)"`` — compiled to DataFrame
joins. An RDF graph IS an edge table (subject --predicate--> object),
so the motif language maps exactly onto the BGP machinery this engine
already has (``OpBGP``, ``OpExecutor.java:127``): each positive edge
is a triple pattern, repeated names are natural-join constraints, and
a negated edge ``!(a)-[]->(b)`` is the anti-join GraphFrames documents
for negated terms. Patterns run through the same ReorderFixed
weighting + Catalyst planning as SPARQL BGPs — one optimizer, two
front-ends.

Grammar (GraphFrames' motif subset that is meaningful on RDF):

* ``(a)-[e]->(b)`` — edge with named endpoints and edge variable;
  ``e`` binds the predicate term.
* ``(a)-[]->(b)`` — anonymous edge (no predicate binding).
* ``(a)-[e:pred]->(b)`` — typed edge: the predicate is the IRI bound
  in the caller-supplied ``edge_types`` map under ``pred`` (RDF's
  analog of GraphFrames' post-filter on the edge relationship column,
  folded into the scan so it pushes down).
* ``!(a)-[]->(b)`` — negated edge: no such edge may exist (anti-join;
  negated edges cannot carry edge variables, as in GraphFrames).
* ``()`` — anonymous vertex: matches anything, binds nothing.
* ``;`` separates terms.

Returns one struct column (kind/val/datatype/lang) per named element
— vertices bind s/o terms, edge variables bind predicate terms.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from jena_spark.queries import algebra as A
from jena_spark.queries.algebra import Var

_EDGE_RE = re.compile(
    r"""^\s*(?P<neg>!)?\s*
        \(\s*(?P<src>[A-Za-z_][A-Za-z_0-9]*)?\s*\)\s*
        -\s*\[\s*(?P<edge>[A-Za-z_][A-Za-z_0-9]*)?
        \s*(?::\s*(?P<etype>[A-Za-z_][A-Za-z_0-9]*)\s*)?\]\s*->\s*
        \(\s*(?P<dst>[A-Za-z_][A-Za-z_0-9]*)?\s*\)\s*$""",
    re.VERBOSE,
)

def parse_motif(pattern: str, edge_types: dict[str, str] | None = None):
    """Motif string -> (positive_patterns, negated_patterns) of
    (s, p, o) triple patterns over :class:`Var` terms. Anonymous
    elements get parse-local ``__``-prefixed names (pruned from the
    output); user names may not start with ``__`` so they can neither
    collide with generated names nor be silently pruned."""
    anon = [0]

    def _term(name: str | None, prefix: str):
        if name:
            if name.startswith("__"):
                raise ValueError(
                    f"motif: names starting with '__' are reserved "
                    f"for anonymous elements: {name!r}")
            return Var(name)
        anon[0] += 1
        return Var(f"__{prefix}{anon[0]}__")

    pos, neg = [], []
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _EDGE_RE.match(raw)
        if not m:
            raise ValueError(f"motif: cannot parse edge term {raw.strip()!r}")
        if m["neg"] and m["edge"]:
            raise ValueError(
                "motif: negated edges cannot have an edge variable "
                f"(GraphFrames rule): {raw.strip()!r}")
        s = _term(m["src"], "v")
        o = _term(m["dst"], "v")
        if m["etype"]:
            iri = (edge_types or {}).get(m["etype"])
            if iri is None:
                raise ValueError(f"motif: unknown edge type {m['etype']!r} "
                                 "(pass edge_types={name: predicate_iri})")
            p = ("iri", iri, None, None)
            if m["edge"]:
                raise ValueError("motif: edge variable and edge type are "
                                 f"mutually exclusive: {raw.strip()!r}")
        else:
            p = _term(m["edge"], "e")
        (neg if m["neg"] else pos).append((s, p, o))
    if not pos:
        raise ValueError("motif: at least one positive edge is required")
    return pos, neg


def find_motif(
    triples: DataFrame, pattern: str,
    edge_types: dict[str, str] | None = None,
) -> DataFrame:
    """``GraphFrame.find`` analog: evaluate a motif over the triple
    table, returning one term-struct column per named vertex/edge.

    Positive edges compile to one BGP (reordered, joined on shared
    names); each negated edge anti-joins the result on its shared
    names — the same plan GraphFrames builds, but over RDF terms and
    with anonymous-variable columns pruned from the output."""
    pos, neg = parse_motif(pattern, edge_types)
    df = A.bgp(triples, pos)
    for np in neg:
        df = A.not_exists(df, A.triple_pattern(triples, np))
    keep = [c for c in df.columns if not c.startswith("__")]
    if not keep:
        raise ValueError("motif: pattern binds no named elements")
    return df.select(*keep).distinct()
