"""GeoSPARQL geometry engine (jena-geosparql ``geof:`` families).

Fixed cases are hand-computed from the OGC simple-features/Egenhofer/
RCC8 definitions; the randomized check validates point-in-polygon
against an INDEPENDENT formula (half-plane signs, valid for convex
polygons) rather than re-running the engine's own ray cast.
"""

import random

import pytest
from pyspark.sql import functions as F

from jena_spark.queries import geometry as G

SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"          # unit-ish square
SQ_INNER = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"        # strictly inside SQ
SQ_TANGENT = "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"      # inside, shares corner
SQ_RIGHT = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))" # shares an edge
SQ_FAR = "POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30))"
SQ_OVERLAP = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"  # partial overlap
HOLEY = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
CONCAVE = "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))"  # notch at top
LINE_ACROSS = "LINESTRING (-5 5, 15 5)"
LINE_INSIDE = "LINESTRING (1 1, 9 1)"
LINE_X1 = "LINESTRING (0 0, 10 10)"
LINE_X2 = "LINESTRING (0 10, 10 0)"
PT_IN = "POINT (3 3)"
PT_HOLE = "POINT (5 5)"
PT_EDGE = "POINT (5 0)"
PT_OUT = "POINT (20 20)"


def _eval(spark, fn, w1, w2=None):
    df = spark.range(1)
    col = fn(F.lit(w1)) if w2 is None else fn(F.lit(w1), F.lit(w2))
    return df.select(col.alias("v")).first().v


#: (relation-name, A, B, expected) battery. Evaluated in ONE Spark job
#: via the materialized primitives struct (``geometry.py`` module
#: docstring: inlining the witness machinery per case multiplies the
#: Catalyst tree — parametrized per-case queries took ~30s EACH).
_REL_CASES = [
        # sfWithin: interior containment; boundary points are NOT within
        (G.sf_within, PT_IN, SQ, True),
        (G.sf_within, PT_EDGE, SQ, False),
        (G.sf_within, PT_OUT, SQ, False),
        (G.sf_within, PT_HOLE, HOLEY, False),       # inside the hole
        (G.sf_within, PT_IN, HOLEY, True),
        (G.sf_within, SQ_INNER, SQ, True),
        (G.sf_within, SQ_TANGENT, SQ, True),        # touching from inside
        (G.sf_within, SQ_OVERLAP, SQ, False),
        (G.sf_within, SQ, SQ, True),                # equal => within
        (G.sf_within, LINE_INSIDE, SQ, True),
        (G.sf_within, LINE_ACROSS, SQ, False),
        (G.sf_within, SQ, PT_IN, False),            # higher dim never within lower
        # point in the concave notch region (outside the polygon)
        (G.sf_within, "POINT (5 8)", CONCAVE, False),
        (G.sf_within, "POINT (2 2)", CONCAVE, True),
        # sfContains is within reversed
        (G.sf_contains, SQ, PT_IN, True),
        (G.sf_contains, SQ, SQ_INNER, True),
        (G.sf_contains, PT_IN, SQ, False),
        # sfIntersects includes boundary contact
        (G.sf_intersects, PT_EDGE, SQ, True),
        (G.sf_intersects, PT_OUT, SQ, False),
        (G.sf_intersects, SQ, SQ_RIGHT, True),
        (G.sf_intersects, SQ, SQ_FAR, False),
        (G.sf_intersects, SQ, SQ_OVERLAP, True),
        (G.sf_intersects, LINE_ACROSS, SQ, True),
        (G.sf_intersects, LINE_X1, LINE_X2, True),
        (G.sf_intersects, PT_IN, PT_IN, True),
        (G.sf_intersects, PT_IN, PT_OUT, False),
        # a fully-contained polygon intersects (no edge contact at all)
        (G.sf_intersects, SQ_INNER, SQ, True),
        # sfDisjoint
        (G.sf_disjoint, SQ, SQ_FAR, True),
        (G.sf_disjoint, SQ, SQ_RIGHT, False),
        # sfEquals: topological, not lexical — reversed ring order is equal
        (G.sf_equals, SQ, SQ, True),
        (G.sf_equals, SQ, "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))", True),
        (G.sf_equals, SQ, SQ_INNER, False),
        (G.sf_equals, PT_IN, PT_IN, True),
        # sfTouches: boundary-only contact
        (G.sf_touches, SQ, SQ_RIGHT, True),
        (G.sf_touches, PT_EDGE, SQ, True),
        (G.sf_touches, PT_IN, SQ, False),
        (G.sf_touches, SQ, SQ_OVERLAP, False),
        (G.sf_touches, SQ, SQ_FAR, False),
        # corner-only contact
        (G.sf_touches, SQ, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", True),
        # sfOverlaps: same dim, partial
        (G.sf_overlaps, SQ, SQ_OVERLAP, True),
        (G.sf_overlaps, SQ, SQ_INNER, False),
        (G.sf_overlaps, SQ, SQ_RIGHT, False),
        (G.sf_overlaps, SQ, SQ, False),
        (G.sf_overlaps, PT_IN, SQ, False),
        # sfCrosses: line through polygon; proper line/line crossing
        (G.sf_crosses, LINE_ACROSS, SQ, True),
        (G.sf_crosses, LINE_INSIDE, SQ, False),
        (G.sf_crosses, LINE_X1, LINE_X2, True),
        (G.sf_crosses, SQ, SQ_OVERLAP, False),
        # Egenhofer / RCC8 (region relations)
        (G.rcc8_ntpp, SQ_INNER, SQ, True),
        (G.rcc8_ntpp, SQ_TANGENT, SQ, False),
        (G.rcc8_tpp, SQ_TANGENT, SQ, True),
        (G.rcc8_tpp, SQ_INNER, SQ, False),
        (G.rcc8_tppi, SQ, SQ_TANGENT, True),
        (G.rcc8_ntppi, SQ, SQ_INNER, True),
        (G.rcc8_ec, SQ, SQ_RIGHT, True),
        (G.rcc8_po, SQ, SQ_OVERLAP, True),
        (G.rcc8_eq, SQ, SQ, True),
        (G.rcc8_dc, SQ, SQ_FAR, True),
        (G.eh_inside, SQ_INNER, SQ, True),
        (G.eh_covered_by, SQ_TANGENT, SQ, True),
        (G.eh_covers, SQ, SQ_TANGENT, True),
        (G.eh_contains, SQ, SQ_INNER, True),
        (G.eh_meet, SQ, SQ_RIGHT, True),
        # thin-geometry interior/boundary distinctions (the witness
        # rule needs the dimension guard for all of these)
        (G.sf_within, "POINT (5 5)", LINE_ACROSS, True),   # line interior
        (G.sf_within, "POINT (-5 5)", LINE_ACROSS, False), # line endpoint
        (G.sf_touches, "POINT (-5 5)", LINE_ACROSS, True),
        # a line ending ON another line's interior touches, never within
        (G.sf_touches, "LINESTRING (5 5, 5 20)", LINE_ACROSS, True),
        (G.sf_within, "LINESTRING (5 5, 5 20)", LINE_ACROSS, False),
        # colinear sub-segment IS within
        (G.sf_within, "LINESTRING (0 5, 5 5)", LINE_ACROSS, True),
        # EMPTY operands: all-F relate matrix (JTS) — disjoint true,
        # everything else false, even empty-vs-empty equals; must not
        # crash under ANSI mode (rings[0] of an empty array throws)
        (G.sf_disjoint, "POINT EMPTY", SQ, True),
        (G.sf_intersects, "POINT EMPTY", SQ, False),
        (G.sf_within, "POINT EMPTY", SQ, False),
        (G.sf_contains, SQ, "POLYGON EMPTY", False),
        (G.sf_equals, "POINT EMPTY", "POINT EMPTY", False),
        (G.sf_disjoint, "LINESTRING EMPTY", "POLYGON EMPTY", True),
        (G.rcc8_dc, "POLYGON EMPTY", SQ, True),
        (G.eh_disjoint, SQ, "LINESTRING EMPTY", True),
]


def _rel_name(fn):
    parts = fn.__name__.split("_")
    if parts[0] == "rcc8":
        return "rcc8" + "".join(parts[1:])
    return parts[0] + "".join(p.title() for p in parts[1:])


def test_relations(spark):
    rows = [
        (i, a, b, _rel_name(fn), want)
        for i, (fn, a, b, want) in enumerate(_REL_CASES)
    ]
    df = spark.createDataFrame(
        rows, "idx int, a string, b string, rel string, want boolean"
    )
    prims = df.select(
        "idx", "rel", "want", G.primitives(F.col("a"), F.col("b")).alias("p")
    )
    picked = F.lit(None).cast("boolean")
    for name, col in G.relations_from_primitives(F.col("p")).items():
        picked = F.when(F.col("rel") == name, col).otherwise(picked)
    got = {r.idx: r.got for r in prims.select("idx", picked.alias("got")).collect()}
    bad = [
        (rows[i][3], _REL_CASES[i][1], _REL_CASES[i][2], want, got[i])
        for i, (_, _, _, want) in enumerate(_REL_CASES)
        if got[i] is not want
    ]
    assert not bad, bad


def test_relation_wrappers_inline(spark):
    """The public per-function wrappers share one `_rel` delegation —
    a single inlined evaluation covers the path (each inlined query
    costs ~25s of Catalyst analysis; the batched battery covers the
    semantics of all 24)."""
    assert _eval(spark, G.eh_covers, SQ, SQ_TANGENT) is True


def test_non_topological(spark):
    assert _eval(spark, G.geof_get_srid, SQ) == G.CRS84
    crs = "http://www.opengis.net/def/crs/EPSG/0/4326"
    assert _eval(spark, G.geof_get_srid, f"<{crs}> POINT (1 2)") == crs
    assert _eval(spark, G.geof_dimension, PT_IN) == 0
    assert _eval(spark, G.geof_dimension, LINE_X1) == 1
    assert _eval(spark, G.geof_dimension, SQ) == 2
    assert _eval(spark, G.geof_is_empty, "POINT EMPTY") is True
    assert _eval(spark, G.geof_is_empty, PT_IN) is False
    assert _eval(spark, G.geof_envelope, LINE_X1) == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    )
    assert _eval(spark, G.geof_envelope, PT_IN) == "POINT (3 3)"
    # 1-D envelopes are LINESTRINGs, empty input POINT EMPTY (JTS
    # Geometry.getEnvelope degenerate cases)
    assert _eval(spark, G.geof_envelope, "LINESTRING (3 1, 3 9)") == (
        "LINESTRING (3 1, 3 9)"
    )
    assert _eval(spark, G.geof_envelope, "LINESTRING (1 3, 9 3, 5 3)") == (
        "LINESTRING (1 3, 9 3)"
    )
    assert _eval(spark, G.geof_envelope, "POLYGON EMPTY") == "POINT EMPTY"
    assert _eval(spark, G.geof_boundary, "LINESTRING EMPTY") == (
        "GEOMETRYCOLLECTION EMPTY"
    )
    assert _eval(spark, G.geof_boundary, SQ) == (
        "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)"
    )
    assert _eval(spark, G.geof_boundary, LINE_X1) == "MULTIPOINT ((0 0), (10 10))"
    assert _eval(spark, G.geof_boundary, PT_IN) == "GEOMETRYCOLLECTION EMPTY"
    assert _eval(spark, G.geof_is_simple, LINE_X1) is True
    # bowtie self-intersection
    assert _eval(spark, G.geof_is_simple, "LINESTRING (0 0, 2 2, 2 0, 0 2)") is False
    assert _eval(spark, G.geof_is_simple, SQ) is True
    assert (
        _eval(spark, G.geof_is_simple,
              "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))") is False
    )


def test_convex_hull(spark):
    got = _eval(spark, G.geof_convex_hull,
                "LINESTRING (0 0, 10 0, 5 5, 10 10, 0 10, 5 5)")
    assert got == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert _eval(spark, G.geof_convex_hull, PT_IN) == "POINT (3 3)"
    assert _eval(spark, G.geof_convex_hull, "LINESTRING (0 0, 4 4)") == (
        "LINESTRING (0 0, 4 4)"
    )


def test_point_in_convex_polygon_vs_half_plane_formula(spark):
    """Randomized cross-check: for CONVEX polygons, inclusion has an
    independent closed form (every cross product the same sign) — the
    engine's ray cast must agree on every sampled point."""
    rng = random.Random(20260818)
    import math

    cases = []  # (pt_wkt, poly_wkt, want) across ALL trials — one job
    for trial in range(12):
        n = rng.randint(3, 8)
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
        if len(set(angles)) < n:
            continue
        cx, cy = rng.uniform(-5, 5), rng.uniform(-5, 5)
        verts = [
            (round(cx + rng.uniform(2, 10) * math.cos(a), 3),
             round(cy + rng.uniform(2, 10) * math.sin(a), 3))
            for a in angles
        ]
        # star-shaped around (cx, cy); convexify via the hull formula
        def hull(pts):
            pts = sorted(set(pts))
            def half(seq):
                out = []
                for p in seq:
                    while len(out) >= 2 and (
                        (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                        - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                    ) <= 0:
                        out.pop()
                    out.append(p)
                return out
            lo, hi = half(pts), half(pts[::-1])
            return lo[:-1] + hi[:-1]
        verts = hull(verts)
        if len(verts) < 3:
            continue
        ring = verts + [verts[0]]
        wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"

        probes = [
            (round(rng.uniform(-16, 16), 3), round(rng.uniform(-16, 16), 3))
            for _ in range(40)
        ]

        def inside_convex(px, py):
            signs = set()
            on_edge = False
            for (ax, ay), (bx, by) in zip(ring, ring[1:]):
                c = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                if c == 0:
                    if min(ax, bx) <= px <= max(ax, bx) and (
                        min(ay, by) <= py <= max(ay, by)
                    ):
                        on_edge = True
                else:
                    signs.add(c > 0)
            if on_edge:
                return None  # boundary — skip (within is interior-only)
            return len(signs) == 1

        for px, py in probes:
            want = inside_convex(px, py)
            if want is None:
                continue
            cases.append((f"POINT ({px} {py})", wkt, want))

    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "idx int, pt string, poly string, want boolean",
    )
    prims = df.select(
        "idx", "want", G.primitives(F.col("pt"), F.col("poly")).alias("p")
    )
    within = G.relations_from_primitives(F.col("p"))["sfWithin"]
    got = {r.idx: r.got for r in prims.select("idx", within.alias("got")).collect()}
    bad = [cases[i] for i in got if got[i] is not cases[i][2]]
    assert not bad, bad[:5]


def test_function_registry(spark):
    from jena_spark.functions import scalar

    G.register_functions()
    fn = scalar.SPARQL_FUNCTIONS[G.GEOF + "sfWithin"]
    assert _eval(spark, fn, PT_IN, SQ) is True
