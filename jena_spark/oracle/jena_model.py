"""Pure-Python Jena Graph/Model semantics (the test oracle).

Implements the contract of (reference paths relative to /root/reference):

* ``jena-core/src/main/java/org/apache/jena/graph/Graph.java:84-165``:
  ``add`` (set semantics — duplicate add is a no-op), ``delete``,
  ``find(s,p,o)`` with ANY wildcards, ``contains``, ``size``.
* ``Node.matches`` — equality except ANY matches anything
  (``Node.java:274-275``).
* ``Model.union/intersection/difference`` (``rdf/model/Model.java:872-895``)
  via the compose classes (``graph/compose/Union.java:34``,
  ``Intersection.java:34``, ``Difference.java:28``): **term equality** —
  blank nodes from different scopes never merge because their skolem
  labels differ.

Terms are plain tuples ``(kind, val, datatype, lang)``; triples are
3-tuples of terms. ``ANY`` is the wildcard singleton (``Node.ANY``,
``Node.java:48``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

Term = tuple[str, str, str | None, str | None]
Triple = tuple[Term, Term, Term]

ANY = ("__any__", "", None, None)


def iri(v: str) -> Term:
    return ("iri", v, None, None)


def bnode(v: str) -> Term:
    return ("bnode", v, None, None)


def literal(lex: str, datatype: str | None = None, lang: str | None = None) -> Term:
    return ("literal", lex, datatype, lang)


def _matches(pattern: Term, term: Term) -> bool:
    return pattern is ANY or pattern == ANY or pattern == term


class Graph:
    """Set of triples with Jena's core Graph contract."""

    def __init__(self, triples: Iterable[Triple] = ()):  # noqa: D107
        self._triples: set[Triple] = set(triples)

    # -- mutation (Graph.java:84-92) --
    def add(self, t: Triple) -> None:
        self._triples.add(t)

    def delete(self, t: Triple) -> None:
        self._triples.discard(t)

    def clear(self) -> None:
        self._triples.clear()

    # -- access (Graph.java:100-165) --
    def find(self, s: Term = ANY, p: Term = ANY, o: Term = ANY) -> Iterator[Triple]:
        for t in self._triples:
            if _matches(s, t[0]) and _matches(p, t[1]) and _matches(o, t[2]):
                yield t

    def contains(self, s: Term, p: Term, o: Term) -> bool:
        return next(self.find(s, p, o), None) is not None

    def size(self) -> int:
        return len(self._triples)

    def triples(self) -> set[Triple]:
        return set(self._triples)

    # -- composition (compose/{Union,Intersection,Difference}.java) --
    def union(self, other: "Graph") -> "Graph":
        return Graph(self._triples | other._triples)

    def intersection(self, other: "Graph") -> "Graph":
        return Graph(self._triples & other._triples)

    def difference(self, other: "Graph") -> "Graph":
        return Graph(self._triples - other._triples)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Graph) and self._triples == other._triples

    def __hash__(self) -> int:  # pragma: no cover
        return hash(frozenset(self._triples))
