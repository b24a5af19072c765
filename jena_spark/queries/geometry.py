"""GeoSPARQL geometry engine (jena-geosparql parity) — WKT geometries
and the geof: filter-function families, from scratch in Catalyst
expressions.

Reference: ``jena-geosparql/.../implementation/datatype/WKTDatatype.java``
(geo:wktLiteral = optional ``<CRS IRI>`` prefix + WKT, default CRS84),
``implementation/vocabulary/Geof.java`` (function IRIs),
``geof/topological/filter_functions/simple_features|egenhofer|rcc8``
and ``geof/nontopological/filter_functions`` (the per-function classes
are one-line delegations into JTS; the SEMANTICS re-created here are
the OGC simple-features / Egenhofer / RCC8 relations those JTS calls
compute).

Design: a WKT literal parses (pure JVM ``split``/``transform``/
``regexp``) into ``struct(srid, gtype, rings)`` with
``rings: array<array<array<double>>>``; every topological relation is
built from four primitives — point-in-ring ray casting, point-on-
segment, proper segment crossing, and segment touching — composed with
``exists``/``filter``/``aggregate`` higher-order functions. No Python
runs on the data path except ``geof:convexHull`` (a sort-dependent
algorithm Spark's expression language cannot express; Arrow-batched
pandas UDF).

Scope (documented, not silent):

* geometry types POINT / LINESTRING / POLYGON (with holes), planar
  coordinates — the same planar model the reference's JTS kernel uses;
* ``within``/``contains`` for line/polygon operands sample vertices +
  edge midpoints against the closure plus a proper-crossing test —
  exact for simple polygons (convex or concave, holes included);
  adversarial all-samples-on-boundary arrangements need a full
  topology kernel and are out of scope;
* geometry-constructing set operations (``geof:buffer``, ``union``,
  ``intersection``, ``difference``, ``symDifference``) are not
  implemented — they require a geometry kernel, not a relation test;
* mixed-SRID comparisons are not rejected (the reference transforms
  CRSes via Apache SIS); coordinates compare as given.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOF = "http://www.opengis.net/def/function/geosparql/"
CRS84 = "http://www.opengis.net/def/crs/OGC/1.3/CRS84"
WKT_DT = "http://www.opengis.net/ont/geosparql#wktLiteral"

# === parsing =================================================================


def parse_wkt(wkt: Column) -> Column:
    """geo:wktLiteral -> struct(srid string, gtype string,
    rings array<array<array<double>>>) (``WKTDatatype.java:34-42``:
    optional ``<CRS>`` prefix, default CRS84; ``EMPTY`` -> no rings).

    POINT/LINESTRING parse as a single ring; POLYGON splits its ring
    list on ``),(`` boundaries. All JVM string ops."""
    srid = F.regexp_extract(wkt, r"^\s*<([^>]*)>", 1)
    srid = F.when(srid == "", F.lit(CRS84)).otherwise(srid)
    body = F.trim(F.regexp_replace(wkt, r"^\s*<[^>]*>\s*", ""))
    gtype = F.upper(F.regexp_extract(body, r"^([A-Za-z]+)", 1))
    inner = F.regexp_extract(body, r"\((.*)\)", 1)  # greedy: outermost parens
    is_empty = (inner == "") | F.upper(body).rlike(r"^[A-Za-z]+\s+EMPTY$")
    ring_txts = F.when(is_empty, F.array().cast("array<string>")).otherwise(
        F.split(inner, r"\)\s*,\s*\(")
    )
    rings = F.transform(
        ring_txts,
        lambda r: F.transform(
            F.split(F.regexp_replace(r, r"[()]", ""), r"\s*,\s*"),
            lambda c: F.transform(
                F.split(F.trim(c), r"\s+"), lambda v: v.try_cast("double")
            ),
        ),
    )
    return F.struct(srid.alias("srid"), gtype.alias("gtype"), rings.alias("rings"))


def _fmt(v: Column) -> Column:
    """double -> WKT lexical form (trailing '.0' trimmed, matching the
    reference's JTS writer for integral coordinates)."""
    return F.regexp_replace(v.cast("string"), r"\.0$", "")


# === primitives ==============================================================


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _edges(ring: Column) -> Column:
    """array<coord> -> array<struct(a: coord, b: coord)> of consecutive
    pairs."""
    return F.transform(
        F.slice(ring, 1, F.greatest(F.size(ring) - 1, F.lit(0))),
        lambda p, i: F.struct(p.alias("a"), F.element_at(ring, i + 2).alias("b")),
    )


def _on_segment(px, py, e) -> Column:
    ax, ay, bx, by = e.a[0], e.a[1], e.b[0], e.b[1]
    colinear = _cross(ax, ay, bx, by, px, py) == 0
    inbox = (
        (px >= F.least(ax, bx)) & (px <= F.greatest(ax, bx))
        & (py >= F.least(ay, by)) & (py <= F.greatest(ay, by))
    )
    return colinear & inbox


def _ray_odd(px, py, ring: Column) -> Column:
    """Ray-casting parity: odd crossing count of the +x ray with the
    ring's edges (half-open y rule, so vertices count once)."""
    hits = F.filter(
        _edges(ring),
        lambda e: ((e.a[1] > py) != (e.b[1] > py))
        & (
            px
            < (e.b[0] - e.a[0]) * (py - e.a[1]) / (e.b[1] - e.a[1]) + e.a[0]
        ),
    )
    return F.size(hits) % 2 == 1


def _seg_proper_cross(e1, e2) -> Column:
    d1 = _cross(e2.a[0], e2.a[1], e2.b[0], e2.b[1], e1.a[0], e1.a[1])
    d2 = _cross(e2.a[0], e2.a[1], e2.b[0], e2.b[1], e1.b[0], e1.b[1])
    d3 = _cross(e1.a[0], e1.a[1], e1.b[0], e1.b[1], e2.a[0], e2.a[1])
    d4 = _cross(e1.a[0], e1.a[1], e1.b[0], e1.b[1], e2.b[0], e2.b[1])
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def _seg_touch(e1, e2) -> Column:
    """Segments intersect at all: proper crossing, or an endpoint of
    either lying on the other (covers colinear overlap)."""
    return (
        _seg_proper_cross(e1, e2)
        | _on_segment(e1.a[0], e1.a[1], e2)
        | _on_segment(e1.b[0], e1.b[1], e2)
        | _on_segment(e2.a[0], e2.a[1], e1)
        | _on_segment(e2.b[0], e2.b[1], e1)
    )


# === per-geometry point tests ===============================================


def _all_edges(g: Column) -> Column:
    return F.flatten(F.transform(g.rings, _edges))


def _vertices(g: Column) -> Column:
    return F.flatten(g.rings)


def _samples(g: Column) -> Column:
    """Vertices plus edge midpoints — the witness set for the
    containment relations."""
    mids = F.transform(
        _all_edges(g),
        lambda e: F.array((e.a[0] + e.b[0]) / 2, (e.a[1] + e.b[1]) / 2),
    )
    return F.concat(_vertices(g), mids)


def _pt_eq(pt: Column, qt: Column) -> Column:
    return (pt[0] == qt[0]) & (pt[1] == qt[1])


def _pt_on_boundary(pt: Column, g: Column) -> Column:
    """Point on the geometry's boundary: any ring edge for polygons,
    the two end vertices for linestrings, never for points."""
    px, py = pt[0], pt[1]
    line = g.rings[0]
    return (
        # EMPTY first: ANSI mode throws on rings[0] of an empty array
        F.when(F.size(g.rings) == 0, F.lit(False))
        .when(g.gtype == "POLYGON",
              F.exists(_all_edges(g), lambda e: _on_segment(px, py, e)))
        .when(g.gtype == "LINESTRING",
              _pt_eq(pt, F.element_at(line, 1))
              | _pt_eq(pt, F.element_at(line, -1)))
        .otherwise(F.lit(False))
    )


def _pt_in_interior(pt: Column, g: Column) -> Column:
    px, py = pt[0], pt[1]
    on_any_edge = F.exists(_all_edges(g), lambda e: _on_segment(px, py, e))
    in_shell = _ray_odd(px, py, g.rings[0])
    in_hole = F.exists(
        F.slice(g.rings, 2, F.greatest(F.size(g.rings) - 1, F.lit(0))),
        lambda r: _ray_odd(px, py, r),
    )
    return (
        F.when(F.size(g.rings) == 0, F.lit(False))
        .when(g.gtype == "POINT", _pt_eq(pt, g.rings[0][0]))
        .when(g.gtype == "LINESTRING", on_any_edge & ~_pt_on_boundary(pt, g))
        .when(g.gtype == "POLYGON", in_shell & ~in_hole & ~on_any_edge)
        .otherwise(F.lit(False))
    )


def _pt_in_closure(pt: Column, g: Column) -> Column:
    px, py = pt[0], pt[1]
    on_any_edge = F.exists(_all_edges(g), lambda e: _on_segment(px, py, e))
    in_shell = _ray_odd(px, py, g.rings[0])
    in_hole_int = F.exists(
        F.slice(g.rings, 2, F.greatest(F.size(g.rings) - 1, F.lit(0))),
        lambda r: _ray_odd(px, py, r) & ~F.exists(
            _edges(r), lambda e: _on_segment(px, py, e)
        ),
    )
    return (
        F.when(F.size(g.rings) == 0, F.lit(False))
        .when(g.gtype == "POINT", _pt_eq(pt, g.rings[0][0]))
        .when(g.gtype == "LINESTRING", on_any_edge)
        .when(g.gtype == "POLYGON", (in_shell & ~in_hole_int) | on_any_edge)
        .otherwise(F.lit(False))
    )


# === relations ===============================================================
#
# Every topological relation derives from ONE "primitives" struct per
# geometry pair — 13 boolean/int witnesses computed in a single
# expression. Composing relations from raw column functions instead
# multiplied the Catalyst tree (sfEquals alone inlined the full parse
# + witness machinery ~8x; a 24-relation projection OOMed the driver
# during analysis). Callers evaluating MANY relations should
# materialize ``primitives(...)`` with a select/withColumn first and
# feed the attribute to ``relations_from_primitives`` — Spark's
# CollapseProject keeps a non-cheap aliased struct from being inlined
# into every consumer.


def _is_point(g):
    return g.gtype == "POINT"


def _dim(g: Column) -> Column:
    return (
        F.when(g.gtype == "POINT", F.lit(0))
        .when(g.gtype == "LINESTRING", F.lit(1))
        .when(g.gtype == "POLYGON", F.lit(2))
        .otherwise(F.lit(-1))
    )


def _any_edge_pair(a: Column, b: Column, pred) -> Column:
    return F.exists(
        _all_edges(a), lambda ea: F.exists(_all_edges(b), lambda eb: pred(ea, eb))
    )


def primitives(wkt1: Column, wkt2: Column) -> Column:
    """struct of the pairwise topological witnesses from two WKT
    string columns. The witness formulas reference each geometry ~10
    times, so parse the operands FIRST when they are attributes of a
    materialized projection (``primitives_parsed``) — from raw WKT
    columns each reference would inline the whole ``parse_wkt`` tree
    (regexps + nested transforms), which both bloats analysis/codegen
    and re-executes the parse per witness at run time."""
    return primitives_parsed(parse_wkt(wkt1), parse_wkt(wkt2))


def primitives_parsed(a: Column, b: Column) -> Column:
    """struct of the pairwise topological witnesses over PRE-PARSED
    geometry structs (``parse_wkt`` output). The general formulas
    below subsume the point cases: a POINT geometry has one vertex, no
    edges, and its interior/closure tests degrade to coordinate
    equality inside ``_pt_in_interior``/``_pt_in_closure``."""
    # A sample p of X witnesses int(X) ∩ int(Y) ≠ ∅ when p ∈ int(Y)
    # and EITHER Y is 2-dimensional (int(Y) is open in the plane and p
    # ∈ closure(int(X)) — true of every sample) OR p is itself interior
    # to X. Without the guard, a boundary sample of a polygon sitting
    # in the interior of a point/line claims an interior overlap that
    # does not exist (e.g. a point lying ON a polygon edge).
    dim_a, dim_b = _dim(a), _dim(b)
    # EMPTY operand: every witness is false (JTS relate on an empty
    # geometry gives the all-F disjoint matrix — disjoint true, equals
    # false even empty-vs-empty). The forall witnesses are vacuously
    # true over an empty sample set, so they need the explicit gate.
    both = (F.size(a.rings) > 0) & (F.size(b.rings) > 0)

    def int_wit(x, y, dim_y):
        return F.exists(
            _samples(x),
            lambda p: _pt_in_interior(p, y)
            & ((dim_y == 2) | _pt_in_interior(p, x)),
        )

    return F.struct(
        dim_a.alias("dim_a"),
        dim_b.alias("dim_b"),
        (a.gtype == "LINESTRING").alias("line_a"),
        (b.gtype == "LINESTRING").alias("line_b"),
        (both & _any_edge_pair(a, b, _seg_proper_cross)).alias("proper_cross"),
        (both & _any_edge_pair(a, b, _seg_touch)).alias("edge_touch"),
        (both & F.exists(_vertices(a), lambda p: _pt_in_closure(p, b))
         ).alias("a_vert_cl_b"),
        (both & F.exists(_vertices(b), lambda p: _pt_in_closure(p, a))
         ).alias("b_vert_cl_a"),
        (both & F.forall(_samples(a), lambda p: _pt_in_closure(p, b))
         ).alias("a_all_cl_b"),
        (both & F.forall(_samples(b), lambda p: _pt_in_closure(p, a))
         ).alias("b_all_cl_a"),
        (both & int_wit(a, b, dim_b)).alias("a_int_b"),
        (both & int_wit(b, a, dim_a)).alias("b_int_a"),
        (
            both & (
                F.exists(_samples(a), lambda p: _pt_on_boundary(p, b))
                | F.exists(_samples(b), lambda p: _pt_on_boundary(p, a))
            )
        ).alias("bnd_contact"),
    )


def relations_from_primitives(p: Column) -> dict[str, Column]:
    """All geof: topological relations as boolean combinations of the
    witness struct (OGC simple features; Egenhofer and RCC8 via their
    published DE-9IM equivalences — the reference computes the same
    patterns through JTS ``relate``)."""
    # interiors intersect: a proper crossing, a strict interior
    # witness either way, or mutual closure containment (equal regions
    # whose witnesses all sit on both boundaries)
    ii = (
        p.proper_cross
        | p.a_int_b
        | p.b_int_a
        | (p.a_all_cl_b & p.b_all_cl_a)
    )
    intersects = p.edge_touch | p.a_vert_cl_b | p.b_vert_cl_a
    within = (p.dim_a <= p.dim_b) & p.a_all_cl_b & ~p.proper_cross & ii
    contains = (p.dim_b <= p.dim_a) & p.b_all_cl_a & ~p.proper_cross & ii
    equals = within & contains
    touches = intersects & ~ii
    overlaps = (p.dim_a == p.dim_b) & ii & ~within & ~contains
    crosses = (
        F.when(p.line_a & p.line_b, p.proper_cross & ~within & ~contains)
        .when(
            (p.dim_a != p.dim_b) & (p.dim_a > 0) & (p.dim_b > 0),
            ii & ~within & ~contains,
        )
        .otherwise(F.lit(False))
    )
    proper_part = within & ~contains
    proper_part_i = contains & ~within
    return {
        "sfEquals": equals,
        "sfDisjoint": ~intersects,
        "sfIntersects": intersects,
        "sfTouches": touches,
        "sfWithin": within,
        "sfContains": contains,
        "sfOverlaps": overlaps,
        "sfCrosses": crosses,
        "ehEquals": equals,
        "ehDisjoint": ~intersects,
        "ehMeet": touches,
        "ehOverlap": overlaps,
        "ehInside": proper_part & ~p.bnd_contact,
        "ehContains": proper_part_i & ~p.bnd_contact,
        "ehCoveredBy": proper_part & p.bnd_contact,
        "ehCovers": proper_part_i & p.bnd_contact,
        "rcc8eq": equals,
        "rcc8dc": ~intersects,
        "rcc8ec": touches,
        "rcc8po": overlaps,
        "rcc8tpp": proper_part & p.bnd_contact,
        "rcc8ntpp": proper_part & ~p.bnd_contact,
        "rcc8tppi": proper_part_i & p.bnd_contact,
        "rcc8ntppi": proper_part_i & ~p.bnd_contact,
    }


def _rel(name: str, w1: Column, w2: Column) -> Column:
    return relations_from_primitives(primitives(w1, w2))[name]


def sf_intersects(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfIntersects (``SfIntersectsFF.java``)."""
    return _rel("sfIntersects", wkt1, wkt2)


def sf_disjoint(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfDisjoint (``SfDisjointFF.java``)."""
    return _rel("sfDisjoint", wkt1, wkt2)


def sf_within(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfWithin (``SfWithinFF.java``): every point of A in B and
    the interiors intersect."""
    return _rel("sfWithin", wkt1, wkt2)


def sf_contains(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfContains (``SfContainsFF.java``) = within reversed."""
    return _rel("sfContains", wkt1, wkt2)


def sf_equals(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfEquals (``SfEqualsFF.java``): topological equality =
    mutual within."""
    return _rel("sfEquals", wkt1, wkt2)


def sf_touches(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfTouches (``SfTouchesFF.java``): they intersect but only
    at boundaries."""
    return _rel("sfTouches", wkt1, wkt2)


def sf_overlaps(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfOverlaps (``SfOverlapsFF.java``): same dimension,
    interiors intersect, neither contains the other."""
    return _rel("sfOverlaps", wkt1, wkt2)


def sf_crosses(wkt1: Column, wkt2: Column) -> Column:
    """geof:sfCrosses (``SfCrossesFF.java``): interiors intersect in a
    lower dimension — line/line proper crossing, or a line passing
    through a polygon (mixed dimension, not within)."""
    return _rel("sfCrosses", wkt1, wkt2)


def rcc8_eq(w1, w2):
    """geof:rcc8eq (``RccEqualsFF.java``)."""
    return _rel("rcc8eq", w1, w2)


def rcc8_dc(w1, w2):
    """geof:rcc8dc — disconnected (``RccDisconnectedFF.java``)."""
    return _rel("rcc8dc", w1, w2)


def rcc8_ec(w1, w2):
    """geof:rcc8ec — externally connected (``RccExternallyConnectedFF.java``)."""
    return _rel("rcc8ec", w1, w2)


def rcc8_po(w1, w2):
    """geof:rcc8po — partially overlapping (``RccPartiallyOverlappingFF.java``)."""
    return _rel("rcc8po", w1, w2)


def rcc8_tpp(w1, w2):
    """geof:rcc8tpp — tangential proper part (``RccTangentialProperPartFF.java``)."""
    return _rel("rcc8tpp", w1, w2)


def rcc8_ntpp(w1, w2):
    """geof:rcc8ntpp — non-tangential proper part."""
    return _rel("rcc8ntpp", w1, w2)


def rcc8_tppi(w1, w2):
    """geof:rcc8tppi (inverse tangential proper part)."""
    return _rel("rcc8tppi", w1, w2)


def rcc8_ntppi(w1, w2):
    """geof:rcc8ntppi (inverse non-tangential proper part)."""
    return _rel("rcc8ntppi", w1, w2)


def eh_equals(w1, w2):
    """geof:ehEquals (``EhEqualsFF.java``)."""
    return _rel("ehEquals", w1, w2)


def eh_disjoint(w1, w2):
    """geof:ehDisjoint (``EhDisjointFF.java``)."""
    return _rel("ehDisjoint", w1, w2)


def eh_meet(w1, w2):
    """geof:ehMeet (``EhMeetFF.java``)."""
    return _rel("ehMeet", w1, w2)


def eh_overlap(w1, w2):
    """geof:ehOverlap (``EhOverlapFF.java``)."""
    return _rel("ehOverlap", w1, w2)


def eh_inside(w1, w2):
    """geof:ehInside (``EhInsideFF.java``) = non-tangential proper part."""
    return _rel("ehInside", w1, w2)


def eh_contains(w1, w2):
    """geof:ehContains (``EhContainsFF.java``)."""
    return _rel("ehContains", w1, w2)


def eh_covered_by(w1, w2):
    """geof:ehCoveredBy (``EhCoveredByFF.java``) = tangential proper part."""
    return _rel("ehCoveredBy", w1, w2)


def eh_covers(w1, w2):
    """geof:ehCovers (``EhCoversFF.java``)."""
    return _rel("ehCovers", w1, w2)


# === non-topological (``geof/nontopological/filter_functions``) =============


def geof_get_srid(wkt: Column) -> Column:
    """geof:getSRID (``GetSRIDFF.java``): the literal's CRS IRI
    (default CRS84 when no prefix)."""
    return parse_wkt(wkt).srid


def geof_dimension(wkt: Column) -> Column:
    """geof:dimension (``DimensionFF.java``)."""
    return _dim(parse_wkt(wkt))


def geof_coordinate_dimension(wkt: Column) -> Column:
    """geof:coordinateDimension (``CoordinateDimensionFF.java``) — this
    engine stores 2D coordinates."""
    return F.when(parse_wkt(wkt).gtype != "", F.lit(2))


def geof_spatial_dimension(wkt: Column) -> Column:
    """geof:spatialDimension (``SpatialDimensionFF.java``)."""
    return geof_coordinate_dimension(wkt)


def geof_is_empty(wkt: Column) -> Column:
    """geof:isEmpty (``IsEmptyFF.java``)."""
    return F.size(parse_wkt(wkt).rings) == 0


def geof_is_simple(wkt: Column) -> Column:
    """geof:isSimple (``IsSimpleFF.java``): no two NON-ADJACENT edges
    of any ring intersect (adjacent edges meet at their shared vertex
    by construction). Points are always simple."""
    g = parse_wkt(wkt)
    def ring_simple(ring):
        edges = _edges(ring)
        n = F.size(edges)
        idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
        closed = F.element_at(edges, 1).isNotNull() & _pt_eq(
            F.element_at(ring, 1), F.element_at(ring, -1)
        )
        def bad(i):
            return F.exists(
                idx,
                lambda j: (j > i + 1)
                # for closed rings the last and first edges are adjacent too
                & ~(closed & (i == 0) & (j == n - 1))
                & _seg_touch(F.element_at(edges, i + 1), F.element_at(edges, j + 1)),
            )
        return ~F.exists(idx, lambda i: (i < n) & bad(i))
    return F.when(_is_point(g) | (F.size(g.rings) == 0), F.lit(True)).otherwise(
        F.forall(g.rings, ring_simple)
    )


def geof_envelope(wkt: Column) -> Column:
    """geof:envelope (``EnvelopFF.java``): the bounding box as a WKT
    polygon. Degenerate envelopes follow JTS ``Geometry.getEnvelope``:
    0-dimensional collapses to POINT, 1-dimensional (horizontal or
    vertical extent only) to a LINESTRING, empty input to POINT EMPTY."""
    g = parse_wkt(wkt)
    xs = F.transform(_vertices(g), lambda c: c[0])
    ys = F.transform(_vertices(g), lambda c: c[1])
    x0, x1 = F.array_min(xs), F.array_max(xs)
    y0, y1 = F.array_min(ys), F.array_max(ys)
    point = F.concat(F.lit("POINT ("), _fmt(x0), F.lit(" "), _fmt(y0), F.lit(")"))
    line = F.concat(
        F.lit("LINESTRING ("),
        _fmt(x0), F.lit(" "), _fmt(y0), F.lit(", "),
        _fmt(x1), F.lit(" "), _fmt(y1), F.lit(")"),
    )
    poly = F.concat(
        F.lit("POLYGON (("),
        _fmt(x0), F.lit(" "), _fmt(y0), F.lit(", "),
        _fmt(x1), F.lit(" "), _fmt(y0), F.lit(", "),
        _fmt(x1), F.lit(" "), _fmt(y1), F.lit(", "),
        _fmt(x0), F.lit(" "), _fmt(y1), F.lit(", "),
        _fmt(x0), F.lit(" "), _fmt(y0), F.lit("))"),
    )
    return (
        F.when(F.size(g.rings) == 0, F.lit("POINT EMPTY"))
        .when((x0 == x1) & (y0 == y1), point)
        .when((x0 == x1) | (y0 == y1), line)
        .otherwise(poly)
    )


def geof_boundary(wkt: Column) -> Column:
    """geof:boundary (``BoundaryFF.java``): polygon -> its exterior
    ring as a LINESTRING (single-ring scope), linestring -> MULTIPOINT
    of its two endpoints, point -> empty collection (JTS)."""
    g = parse_wkt(wkt)
    shell = g.rings[0]
    ring_txt = F.array_join(
        F.transform(shell, lambda c: F.concat(_fmt(c[0]), F.lit(" "), _fmt(c[1]))),
        ", ",
    )
    first = F.element_at(shell, 1)
    last = F.element_at(shell, -1)
    multipoint = F.concat(
        F.lit("MULTIPOINT (("), _fmt(first[0]), F.lit(" "), _fmt(first[1]),
        F.lit("), ("), _fmt(last[0]), F.lit(" "), _fmt(last[1]), F.lit("))"),
    )
    return (
        # EMPTY first (ANSI throws on rings[0] of an empty array); a
        # point's boundary is the empty set too (JTS)
        F.when(F.size(g.rings) == 0, F.lit("GEOMETRYCOLLECTION EMPTY"))
        .when(g.gtype == "POLYGON",
              F.concat(F.lit("LINESTRING ("), ring_txt, F.lit(")")))
        .when(g.gtype == "LINESTRING", multipoint)
        .otherwise(F.lit("GEOMETRYCOLLECTION EMPTY"))
    )


def geof_convex_hull(wkt: Column) -> Column:
    """geof:convexHull (``ConvexHullFF.java``): Andrew monotone chain
    over the vertex set — the one geometry op here that needs a sort,
    hence the single Arrow-batched pandas UDF in this module."""
    from pyspark.sql.functions import pandas_udf

    # no type-hint signature: `from __future__ import annotations`
    # stringifies hints and pyspark cannot resolve them here
    def _hull_fn(s):
        import re

        def hull_of(text):
            if text is None:
                return None
            body = re.sub(r"^\s*<[^>]*>\s*", "", text)
            nums = re.findall(r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s+"
                              r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)", body)
            pts = sorted({(float(x), float(y)) for x, y in nums})
            if not pts:
                return "GEOMETRYCOLLECTION EMPTY"
            if len(pts) == 1:
                x, y = pts[0]
                return f"POINT ({_f(x)} {_f(y)})"

            def half(points):
                out = []
                for p in points:
                    while len(out) >= 2 and (
                        (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                        - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                    ) <= 0:
                        out.pop()
                    out.append(p)
                return out

            lower = half(pts)
            upper = half(pts[::-1])
            ring = lower[:-1] + upper[:-1]
            if len(ring) == 2:
                return (
                    f"LINESTRING ({_f(ring[0][0])} {_f(ring[0][1])}, "
                    f"{_f(ring[1][0])} {_f(ring[1][1])})"
                )
            ring = ring + [ring[0]]
            inner = ", ".join(f"{_f(x)} {_f(y)}" for x, y in ring)
            return f"POLYGON (({inner}))"

        def _f(v):
            s = repr(v)
            return s[:-2] if s.endswith(".0") else s

        return s.map(hull_of)

    return pandas_udf(_hull_fn, "string")(wkt)


def register_functions() -> None:
    """Register the geof: families in the FunctionRegistry analog
    (``function_registration/SimpleFeatures.java``, ``Egenhofer.java``,
    ``RCC8.java``, ``NonTopological.java``, ``GeometryProperty.java``).
    geof:distance is registered by ``queries.spatial``."""
    from jena_spark.functions import scalar

    fns = {
        "sfEquals": sf_equals, "sfDisjoint": sf_disjoint,
        "sfIntersects": sf_intersects, "sfTouches": sf_touches,
        "sfWithin": sf_within, "sfContains": sf_contains,
        "sfOverlaps": sf_overlaps, "sfCrosses": sf_crosses,
        "ehEquals": eh_equals, "ehDisjoint": eh_disjoint,
        "ehMeet": eh_meet, "ehOverlap": eh_overlap,
        "ehInside": eh_inside, "ehContains": eh_contains,
        "ehCoveredBy": eh_covered_by, "ehCovers": eh_covers,
        "rcc8eq": rcc8_eq, "rcc8dc": rcc8_dc, "rcc8ec": rcc8_ec,
        "rcc8po": rcc8_po, "rcc8tpp": rcc8_tpp, "rcc8ntpp": rcc8_ntpp,
        "rcc8tppi": rcc8_tppi, "rcc8ntppi": rcc8_ntppi,
        "getSRID": geof_get_srid, "envelope": geof_envelope,
        "boundary": geof_boundary, "convexHull": geof_convex_hull,
        "dimension": geof_dimension,
        "coordinateDimension": geof_coordinate_dimension,
        "spatialDimension": geof_spatial_dimension,
        "isEmpty": geof_is_empty, "isSimple": geof_is_simple,
    }
    for name, fn in fns.items():
        scalar.register(GEOF + name, fn)
