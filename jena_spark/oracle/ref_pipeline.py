"""Single-threaded reference pipeline — expected-triple producer.

Runs the SAME extraction rules as the distributed pipeline
(jena_spark.pipeline.*), but sequentially over a pandas DataFrame,
building a :class:`jena_spark.oracle.jena_model.Graph`. The distributed
pipeline's output is scored against this (P/R ≥ 0.95, BASELINE.md).

Rule summary (the construction semantics, mirroring how Jena's RIOT
parse path emits triples into a Graph —
``jena-arq/.../riot/system/StreamRDF.java`` → ``Graph.add``):

per turn (conv_id, turn_idx, role, text, tool, ts):
  conv_iri  hasTurn    turn_bnode            (bnode skolem: conv_id, "turn-<idx>")
  turn      turnIndex  "<idx>"^^xsd:integer  (canonical lexical form)
  turn      role       "<role>"
  turn      text       "<text>"              (per-turn text equality invariant)
  turn      tool       "<tool>"              (only when tool is non-null)
  turn      timestamp  "<ts>"^^xsd:dateTime  (canonical form, UTC, Z)
per distinct mention surface in the turn's text (gazetteer longest-match):
  turn         mentions  surface_entity_iri
  surface_iri  label     "<surface>"
  surface_iri  sameAs    canonical_iri       (only when surface != canonical)
canonicalization (owl:sameAs closure ≡ connected components, cf.
``jena-core/src/main/resources/etc/owl-fb.rules:157,424-431``):
  rewrite every IRI subject/object to its component representative
  (lexicographically smallest IRI in the component); drop the then
  self-referential sameAs triples; keep exactly one label per alias
  IRI rewritten to the canonical — i.e. labels survive as
  (canonical, label, "<surface>").
"""

from __future__ import annotations

import pandas as pd

from jena_spark import terms as TM
from jena_spark.gazetteer import DEFAULT_GAZETTEER, mention_pattern, surface_to_canonical
from jena_spark.oracle.jena_model import Graph, Triple, bnode, iri, literal


def extract_graph(transcripts: pd.DataFrame, gazetteer: dict | None = None) -> Graph:
    """Raw (pre-canonicalization) graph from transcripts."""
    gazetteer = gazetteer or DEFAULT_GAZETTEER
    pat = mention_pattern(gazetteer)
    surf2canon = surface_to_canonical(gazetteer)
    g = Graph()
    df = transcripts.sort_values(["conv_id", "turn_idx"])  # stable ordering invariant
    for row in df.itertuples(index=False):
        conv = iri(TM.conv_iri(row.conv_id))
        turn = bnode(TM.skolem(row.conv_id, f"turn-{int(row.turn_idx)}"))
        g.add((conv, iri(TM.P_HAS_TURN), turn))
        g.add((turn, iri(TM.P_TURN_INDEX),
               literal(TM.canon_integer(str(int(row.turn_idx))), TM.XSD_INTEGER)))
        g.add((turn, iri(TM.P_ROLE), literal(row.role)))
        g.add((turn, iri(TM.P_TEXT), literal(row.text)))
        if row.tool is not None and not (isinstance(row.tool, float) and pd.isna(row.tool)):
            g.add((turn, iri(TM.P_TOOL), literal(row.tool)))
        g.add((turn, iri(TM.P_TS),
               literal(TM.canon_datetime(row.ts.to_pydatetime()
                                         if hasattr(row.ts, "to_pydatetime") else row.ts),
                       TM.XSD_DATETIME)))
        for surface in sorted(set(pat.findall(row.text))):
            s_iri = iri(TM.entity_iri(surface))
            g.add((turn, iri(TM.P_MENTIONS), s_iri))
            g.add((s_iri, iri(TM.RDFS_LABEL), literal(surface)))
            canonical = surf2canon[surface]
            if TM.entity_iri(canonical) != TM.entity_iri(surface):
                g.add((s_iri, iri(TM.OWL_SAMEAS), iri(TM.entity_iri(canonical))))
    return g


def _components(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find: map node -> lexicographically-smallest component member."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def canonicalize_graph(g: Graph) -> Graph:
    """owl:sameAs closure → rewrite to component representatives."""
    same_pred = iri(TM.OWL_SAMEAS)
    pairs = [(s[1], o[1]) for (s, p, o) in g.find(p=same_pred)]
    mapping = _components(pairs)

    def rewrite(t):
        k, v, dt, lg = t
        if k == "iri" and v in mapping:
            return ("iri", mapping[v], dt, lg)
        return t

    out = Graph()
    for (s, p, o) in g.triples():
        s2, o2 = rewrite(s), rewrite(o)
        if p == same_pred and s2 == o2:
            continue  # self-sameAs dropped after closure
        out.add((s2, p, o2))
    return out


def expected_triples(transcripts: pd.DataFrame, gazetteer: dict | None = None) -> Graph:
    return canonicalize_graph(extract_graph(transcripts, gazetteer))


def graph_to_rows(g: Graph) -> list[tuple]:
    """Flatten to the triple-table row shape for set comparison."""
    rows = []
    for (s, p, o) in g.triples():
        rows.append((s[0], s[1], p[1], o[0], o[1], o[2], o[3]))
    return rows


def precision_recall(actual: set[Triple] | set[tuple], expected: set) -> tuple[float, float]:
    if not actual or not expected:
        return (0.0, 0.0)
    tp = len(actual & expected)
    return (tp / len(actual), tp / len(expected))
