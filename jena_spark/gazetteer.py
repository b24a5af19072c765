"""Entity gazetteer for mention detection / entity linking.

The reference precedent for text→entity lookup is ``jena-text``
(``jena-text/src/main/java/org/apache/jena/query/text/TextIndexLucene.java:82``,
``addEntity`` at ``:296``, ``query`` at ``:476-486``): literals are
indexed so entities can be found from text. Our Spark-native analog is
a broadcast dictionary + compiled alternation regex applied in batched
pandas UDFs (SURVEY.md §2.14) — no external index server.

At 100 TB scale the gazetteer is a *small dimension* (maybe millions of
surfaces): it broadcasts to every executor once; matching stays
embarrassingly parallel over text partitions. Longest-surface-first
alternation gives deterministic longest-match semantics shared by the
distributed pipeline and the pure-Python oracle.
"""

from __future__ import annotations

import re

# canonical name -> aliases (surfaces that link to it). The canonical
# name itself is always also a valid surface.
DEFAULT_GAZETTEER: dict[str, list[str]] = {
    "Alan Turing": ["Turing", "A. Turing"],
    "Ada Lovelace": ["Lovelace", "Countess Lovelace"],
    "Grace Hopper": ["Hopper", "Admiral Hopper"],
    "Apache Spark": ["Spark"],
    "Apache Jena": ["Jena"],
    "New York": ["NYC", "New York City"],
    "San Francisco": ["SF", "San Fran"],
    "London": [],
    "Tokyo": [],
    "Claude Shannon": ["Shannon"],
    "John von Neumann": ["von Neumann", "Neumann"],
    "Barbara Liskov": ["Liskov"],
    "Donald Knuth": ["Knuth"],
    "Tim Berners-Lee": ["Berners-Lee", "TimBL"],
    "Margaret Hamilton": ["Hamilton"],
    "Edsger Dijkstra": ["Dijkstra"],
    "Katherine Johnson": ["Johnson"],
    "Alonzo Church": ["Church"],
    "Kurt Gödel": ["Gödel", "Godel"],
    "Hedy Lamarr": ["Lamarr"],
}

# entities planted disproportionately often (skew / hot-key testing)
HOT_ENTITIES = ["Apache Spark", "Alan Turing"]


def surface_to_canonical(gazetteer: dict[str, list[str]] | None = None) -> dict[str, str]:
    """Flat map surface -> canonical name (canonical maps to itself)."""
    gazetteer = gazetteer or DEFAULT_GAZETTEER
    out: dict[str, str] = {}
    for canonical, aliases in gazetteer.items():
        out[canonical] = canonical
        for a in aliases:
            out[a] = canonical
    return out


def validate_gazetteer(gazetteer: dict[str, list[str]] | None = None) -> dict[str, str]:
    """Validate the two structural contracts the pipeline's
    dedup-free-by-construction and star-oracle arguments rest on, then
    return the surface->canonical map. Raises ValueError otherwise.

    1. *Slug injectivity*: ``entity_iri`` lowercases and collapses
       non-alphanumerics, so two distinct surfaces with equal slugs
       (e.g. 'NYC'/'nyc') would emit duplicate mention/sameAs rows in
       one turn, breaking raw_triples' set-semantics-by-construction.
    2. *Star shape*: no canonical may itself be an alias of a different
       canonical, and no alias may link to two canonicals — the DuckDB
       oracle computes components with one grouped aggregation that is
       only correct for disjoint stars (the Spark side would still be
       right, i.e. the ORACLE would be the wrong one — fail loudly
       instead).
    """
    from jena_spark.terms import entity_slug

    gazetteer = gazetteer or DEFAULT_GAZETTEER
    s2c: dict[str, str] = {}
    slugs: dict[str, str] = {}
    for canonical, aliases in gazetteer.items():
        for surface in [canonical, *aliases]:
            prev = s2c.get(surface)
            if prev is not None and prev != canonical:
                raise ValueError(
                    f"gazetteer not star-shaped: surface {surface!r} links to "
                    f"both {prev!r} and {canonical!r}"
                )
            s2c[surface] = canonical
            slug = entity_slug(surface)
            owner = slugs.setdefault(slug, surface)
            if owner != surface:
                raise ValueError(
                    f"slug collision: surfaces {owner!r} and {surface!r} both "
                    f"slug to {slug!r} — entity IRIs would alias silently"
                )
    for canonical in gazetteer:
        if s2c[canonical] != canonical:
            raise ValueError(
                f"gazetteer not star-shaped: canonical {canonical!r} is also "
                f"an alias of {s2c[canonical]!r} (chained aliases)"
            )
    return s2c


def mention_pattern(gazetteer: dict[str, list[str]] | None = None) -> re.Pattern[str]:
    """Compiled longest-first word-boundary alternation over all surfaces.

    Longest-first ordering makes the regex engine prefer "New York City"
    over "New York" at the same position — deterministic longest match,
    identical in the Spark pandas UDF and the oracle.
    """
    surfaces = sorted(surface_to_canonical(gazetteer), key=len, reverse=True)
    alts = "|".join(re.escape(s) for s in surfaces)
    return re.compile(rf"(?<![\w])(?:{alts})(?![\w])")
