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


def mention_pattern(gazetteer: dict[str, list[str]] | None = None) -> re.Pattern[str]:
    """Compiled longest-first word-boundary alternation over all surfaces.

    Longest-first ordering makes the regex engine prefer "New York City"
    over "New York" at the same position — deterministic longest match,
    identical in the Spark pandas UDF and the oracle.
    """
    surfaces = sorted(surface_to_canonical(gazetteer), key=len, reverse=True)
    alts = "|".join(re.escape(s) for s in surfaces)
    return re.compile(rf"(?<![\w])(?:{alts})(?![\w])")
