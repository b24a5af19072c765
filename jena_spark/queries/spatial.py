"""Spatial queries over WKT point geometries — the jena-spatial /
jena-geosparql query surface, re-created Spark-first.

Reference semantics (all paths relative to /root/reference):

* Great-circle distance = haversine on the mean earth radius:
  ``jena-geosparql/.../implementation/great_circle/GreatCircleDistance.java:177-193``
  with ``UnitsOfMeasure.EARTH_MEAN_RADIUS = 6371008.7714`` m
  (``implementation/UnitsOfMeasure.java:51``). geof:distance exposes it
  (``geof/nontopological/filter_functions/DistanceFF.java``).
* ``spatial:nearby`` / NearbyFF relate = strict ``distance < radius``
  (``spatial/filter_functions/NearbyFF.java:69-71``).
* ``spatial:withinBox`` — lat/lon envelope containment
  (``spatial/property_functions/box/WithinBoxPF.java``; jena-spatial's
  Lucene-index twin ``jena-spatial/.../query/spatial/SpatialIndexLucene.java``).
* Geometry literals: ``geo:asWKT`` with ``geo:wktLiteral`` lexical
  ``POINT(lon lat)`` — axis order per GeoSPARQL / jena-geosparql
  (``implementation/parsers/wkt/WKTReader.java``; x=lon, y=lat as in
  ``GreatCircleDistance.java:158-165``).

Spark-first design, not a port: the reference answers nearby/box
queries from a driver-local Lucene R-tree. At 100 TB the analog is a
**grid-cell bin join**: every point is keyed by a (band, lon-cell)
bucket, candidates meet on an equi shuffle join on the bucket key
(AQE skew-split handles hot cells), and the exact haversine predicate
filters candidates. No cross join, no driver index. The grid is
latitude-banded and valid over the FULL sphere: bands are one radius
tall (dlat <= d/R is exact), each band carries its own longitude cell
count (fewer cells toward the poles), and a probe enumerates the
candidate cell range [lon-delta, lon+delta] per reachable band, with
delta the per-band-pair great-circle bound
sin(dlon/2) <= sin(d/2R)/sqrt(cos lat1 cos lat2). Modular cell
indexing makes pairs straddling the antimeridian (lon +179.9 vs
-179.9) meet — the haversine already treats them as near via
sin(dLon/2); pole-touching bands degrade to a handful of cells, never
to O(N*M).

Single-point predicates (``nearby``, ``within_box``) are plain column
filters: a lat/lon bounding-box prefilter that Catalyst pushes to the
scan when lon/lat are stored columns, then the exact haversine. These
run at any latitude (no grid involved).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ``UnitsOfMeasure.java:51`` — jena-geosparql's earth mean radius (m).
EARTH_MEAN_RADIUS_M = 6371008.7714

#: GeoSPARQL vocabulary (``implementation/vocabulary/Geo.java``).
GEO_NS = "http://www.opengis.net/ont/geosparql#"
GEO_AS_WKT = GEO_NS + "asWKT"
GEO_WKT_LITERAL = GEO_NS + "wktLiteral"


#: case-insensitive keyword, optional sign, decimal or exponent forms —
#: the lexical space the reference WKTReader accepts for points
_WKT_NUM = r"[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
_WKT_POINT_RE = rf"(?i)^POINT\s*\(\s*({_WKT_NUM})\s+({_WKT_NUM})\s*\)$"


# --- WKT point literals -----------------------------------------------------

def wkt_point(lon: Column, lat: Column, decimals: int = 2) -> Column:
    """``POINT(lon lat)`` lexical form (x=lon first, per GeoSPARQL
    ``WKTReader.java``; fixed decimal count so the lexical form is
    canonical — same-value points compare term-equal)."""
    fmt = f"POINT(%.{decimals}f %.{decimals}f)"
    return F.format_string(fmt, lon, lat)


def parse_wkt_point(wkt: Column) -> tuple[Column, Column]:
    """(lon, lat) doubles from a WKT point lexical; NULLs on
    non-point/malformed input (``try_cast`` — ANSI-safe)."""
    lon = F.regexp_extract(wkt, _WKT_POINT_RE, 1).try_cast("double")
    lat = F.regexp_extract(wkt, _WKT_POINT_RE, 2).try_cast("double")
    return lon, lat


def points_from_triples(triples: DataFrame) -> DataFrame:
    """(ent, lon, lat) from ``?ent geo:asWKT "POINT(..)"^^geo:wktLiteral``
    triples — the scan side of every spatial property function
    (``GenericSpatialPropertyFunction.java``). The p_val equality is a
    plain pushable predicate (TDB POS-index posture)."""
    wkt = triples.where(
        (F.col("p_val") == GEO_AS_WKT) & (F.col("o_datatype") == GEO_WKT_LITERAL)
    )
    lon, lat = parse_wkt_point(F.col("o_val"))
    return (
        wkt.select(F.col("s_val").alias("ent"),
                   F.col("s_kind").alias("ent_kind"),
                   lon.alias("lon"), lat.alias("lat"))
        .where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    )


# --- great-circle distance ---------------------------------------------------

def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in metres — formula-for-formula the
    reference's ``GreatCircleDistance.haversineFormula``
    (``GreatCircleDistance.java:177-193``), as a single JVM-codegen
    column expression (no UDF)."""
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    # clamp: float rounding can push a to 1+ulp for (near-)antipodal
    # pairs; sqrt(1-a) would be NaN here and an ERROR in the DuckDB
    # oracle twin
    a = F.least(a, F.lit(1.0))
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_MEAN_RADIUS_M) * c


# --- single-point predicates -------------------------------------------------

def nearby(points: DataFrame, lat: float, lon: float, radius_m: float) -> DataFrame:
    """``spatial:nearby`` (``NearbyPF.java`` / ``NearbyFF.java:69-71``):
    points strictly within ``radius_m`` of (lat, lon), with the
    distance attached as ``dist_m``.

    A lat/lon bounding-box prefilter runs before the trig: it is a
    plain range predicate on stored columns, so Catalyst pushes it to
    the parquet scan (row-group pruning) and the haversine only prices
    the survivors — the same two-phase shape as the reference's
    Lucene-box-then-exact-check (``GenericSpatialPropertyFunction``
    second filter)."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    # widest lon span of the circle, clamped at the poles
    coslat = min(
        math.cos(math.radians(min(abs(lat) + dlat, 90.0))), 1.0
    )
    dlon = 360.0 if coslat <= 1e-12 else min(dlat / coslat, 360.0)
    box = (F.col("lat") >= lat - dlat) & (F.col("lat") <= lat + dlat)
    if dlon < 180.0:
        lo, hi = lon - dlon, lon + dlon
        # antimeridian-crossing circles become a lon disjunction
        if lo < -180.0:
            box &= (F.col("lon") >= lo + 360.0) | (F.col("lon") <= hi)
        elif hi > 180.0:
            box &= (F.col("lon") >= lo) | (F.col("lon") <= hi - 360.0)
        else:
            box &= (F.col("lon") >= lo) & (F.col("lon") <= hi)
    dist = haversine_m(F.lit(lat), F.lit(lon), F.col("lat"), F.col("lon"))
    return (
        points.where(box)
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") < radius_m)
    )


def within_box(
    points: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """``spatial:withinBox`` (``WithinBoxPF.java``): inclusive lat/lon
    envelope containment — a pure pushable range predicate."""
    return points.where(
        (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max)
        & (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
    )


def north_of(points: DataFrame, lat: float) -> DataFrame:
    """``spatial:north`` (``pfunction/library/NorthPF.java:37-41``: box
    from the given latitude to the world's north edge, longitude
    unbounded)."""
    return within_box(points, lat, 90.0, -180.0, 180.0)


def south_of(points: DataFrame, lat: float) -> DataFrame:
    """``spatial:south`` (``SouthPF.java``)."""
    return within_box(points, -90.0, lat, -180.0, 180.0)


def east_of(points: DataFrame, lon: float) -> DataFrame:
    """``spatial:east`` (``EastPF.java:37-42``: box from the given
    longitude to the world's east edge, latitude unbounded — no
    antimeridian wrap, matching the reference's world-bounds box)."""
    return within_box(points, -90.0, 90.0, lon, 180.0)


def west_of(points: DataFrame, lon: float) -> DataFrame:
    """``spatial:west`` (``WestPF.java``)."""
    return within_box(points, -90.0, 90.0, -180.0, lon)


def geof_distance(wkt1: Column, wkt2: Column,
                  units: str | Column = "metre") -> Column:
    """geof:distance filter function
    (``geof/nontopological/filter_functions/DistanceFF.java``): great-
    circle distance between two WKT point literals; units metre or
    kilometre (``UnitsOfMeasure.java`` URIs map to the same pair).

    ``units`` may be a Column (the SPARQL-string front-end evaluates
    the third argument to a lexical column, value unknown at compile
    time), so the conversion is a conditional expression, never a
    Python branch on the column."""
    lon1, lat1 = parse_wkt_point(wkt1)
    lon2, lat2 = parse_wkt_point(wkt2)
    d = haversine_m(lat1, lon1, lat2, lon2)
    units_c = F.lit(units) if isinstance(units, str) else units
    is_km = units_c.isin(
        "kilometre", "kilometer", "km",
        "http://www.opengis.net/def/uom/OGC/1.0/kilometre")
    return F.when(is_km, d / 1000.0).otherwise(d)


def register_functions() -> None:
    """Register geof: filter functions in the FunctionRegistry analog
    (``FunctionRegistry.put``) under the GeoSPARQL function namespace."""
    from jena_spark.functions import scalar

    scalar.register("http://www.opengis.net/def/function/geosparql/distance",
                    geof_distance)


# --- property-function adapters (jena-spatial pfunction/library) -------------
#
# jena-spatial exposes the spatial predicates as SPARQL property
# functions (``pfunction/library/IsNearByPF.java``, ``IsWithinBoxPF``,
# ``IntersectsBoxPF``, ``IsWithinCirclePF``, ``NorthPF`` ...); radius
# arguments default to kilometres (``DistanceUnitsUtils.java:28``).
# These graph-level adapters register in the engine's
# PropertyFunctionRegistry analog under the reference IRIs: they take
# the triple table, locate subjects via geo:asWKT, and return binding
# rows. ``limit`` (the reference's optional last argument) is a
# deterministic distance-ordered top-N (TakeOrderedAndProject), not an
# arbitrary cut.

SPATIAL_NS = "http://jena.apache.org/spatial#"


#: unit name -> metres-per-unit (``DistanceUnitsUtils.java:36-51``
#: SUPPORTED_UNITS; mile factor = R_M/R_MI of spatial4j's
#: ``DistanceUtils`` = the international mile). "degrees"/"de" convert
#: through arc length on the mean radius (``dist2Degrees`` inverse).
_UNIT_M = {
    "kilometres": 1000.0, "kilometers": 1000.0, "km": 1000.0,
    "meters": 1.0, "metres": 1.0, "m": 1.0,
    "centimeters": 0.01, "centimetres": 0.01, "cm": 0.01,
    "millimetres": 0.001, "millimeters": 0.001, "mm": 0.001,
    "miles": 1609.344, "mi": 1609.344,
    "degrees": math.radians(1.0) * EARTH_MEAN_RADIUS_M,
    "de": math.radians(1.0) * EARTH_MEAN_RADIUS_M,
}


def _units_limit(rest: tuple, where: str) -> tuple[float, int]:
    """Parse the reference's optional trailing ``[units] [limit]``
    arguments (``SpatialOperationWithCircleBase.java:124-166``:
    literals after the required ones are a unit string and/or an
    integer limit, in that order). Returns (metres-per-unit, limit);
    raises the module's documented ValueError outside the profile."""
    factor, limit = _UNIT_M["kilometres"], -1
    rest = list(rest)
    if rest and isinstance(rest[0], str):
        unit = rest.pop(0)
        if unit not in _UNIT_M:
            raise ValueError(f"spatial: unknown distance units {unit!r} "
                             f"in {where} (DistanceUnitsUtils)")
        factor = _UNIT_M[unit]
    if rest and isinstance(rest[0], (int, float)):
        v = rest.pop(0)
        limit = int(v) if v >= 0 else -1
    if rest:
        raise ValueError(f"spatial: unexpected trailing arguments "
                         f"{rest!r} in {where} (expected [units] [limit])")
    return factor, limit


def _limited(df: DataFrame, limit: int) -> DataFrame:
    """Deterministic top-N: the reference caps by index iteration
    order; here distance-ordered (ent tiebreak) when a distance is
    present, ent-ordered otherwise — TakeOrderedAndProject either way."""
    if limit is not None and limit > 0:
        keys = ["dist_m", "ent"] if "dist_m" in df.columns else ["ent"]
        return df.orderBy(*keys).limit(limit)
    return df


def nearby_pf(triples: DataFrame, lat: float, lon: float,
              radius: float, *rest) -> DataFrame:
    """``?ent spatial:nearby (lat lon radius [units] [limit])``
    (``IsNearByPF.java``; also registered as spatial:withinCircle —
    ``IsWithinCirclePF.java`` shares the circle semantics). Radius
    units default to kilometres (``DistanceUnitsUtils.java:28``)."""
    factor, limit = _units_limit(rest, "spatial:nearby")
    return _limited(
        nearby(points_from_triples(triples), lat, lon, radius * factor), limit
    )


def within_box_pf(triples: DataFrame, lat_min: float, lon_min: float,
                  lat_max: float, lon_max: float, *rest) -> DataFrame:
    """``?ent spatial:withinBox (latMin lonMin latMax lonMax [limit])``
    (``IsWithinBoxPF.java``; for point geometries intersection equals
    containment, so spatial:intersectBox — ``IntersectsBoxPF.java`` —
    registers to the same adapter)."""
    _, limit = _units_limit(rest, "spatial:withinBox")
    return _limited(
        within_box(points_from_triples(triples), lat_min, lat_max,
                   lon_min, lon_max), limit)


def north_pf(triples: DataFrame, lat: float, *rest) -> DataFrame:
    """``?ent spatial:north (lat [limit])`` (``NorthPF.java:37-41``)."""
    _, limit = _units_limit(rest, "spatial:north")
    return _limited(north_of(points_from_triples(triples), lat), limit)


def south_pf(triples: DataFrame, lat: float, *rest) -> DataFrame:
    """``SouthPF.java``."""
    _, limit = _units_limit(rest, "spatial:south")
    return _limited(south_of(points_from_triples(triples), lat), limit)


def east_pf(triples: DataFrame, lon: float, *rest) -> DataFrame:
    """``EastPF.java``."""
    _, limit = _units_limit(rest, "spatial:east")
    return _limited(east_of(points_from_triples(triples), lon), limit)


def west_pf(triples: DataFrame, lon: float, *rest) -> DataFrame:
    """``WestPF.java``."""
    _, limit = _units_limit(rest, "spatial:west")
    return _limited(west_of(points_from_triples(triples), lon), limit)


# --- distance self/AB join (the scale operator) ------------------------------


def _cos_min_band(band: Column, h: float) -> Column:
    """Minimum cos(lat) over latitude band ``band`` (bands of height
    ``h`` degrees from -90). cos is unimodal on [-90, 90] with its max
    at 0, so the interval minimum is at whichever edge is closer to a
    pole; clamped at 0 for pole-touching bands."""
    lo = band.cast("double") * h - 90.0
    return F.greatest(
        F.lit(0.0), F.least(F.cos(F.radians(lo)), F.cos(F.radians(lo + h)))
    )


def _delta_deg(sin_half: float, cos1: Column, cos2: Column) -> Column:
    """Upper bound (degrees) on the longitude separation of two points
    within the join radius at latitudes with cos >= cos1 / cos2:
    haversine gives sin(dlon/2) <= sin(d/2R)/sqrt(cos(lat1)cos(lat2)).
    Pole-touching bands (cos 0) degrade to the full circle. The 1e-7
    margin absorbs the few-ulp rounding of the trig chain so a pair
    exactly on the bound is never dropped."""
    denom = F.sqrt(cos1 * cos2)
    ratio = F.when(
        denom > 0.0, F.least(F.lit(1.0), F.lit(sin_half) / denom)
    ).otherwise(F.lit(1.0))
    return F.degrees(F.lit(2.0) * F.asin(ratio)) + F.lit(1e-7)


def _n_cells(sin_half: float, cos_min: Column) -> Column:
    """Per-band longitude bucket count — a pure performance knob
    (correctness comes from the explicit [lon-delta, lon+delta] probe
    range, not from cell adjacency): one cell per own-band delta keeps
    the candidate range a small constant at every latitude."""
    ratio = F.when(
        cos_min > 0.0, F.least(F.lit(1.0), F.lit(sin_half) / cos_min)
    ).otherwise(F.lit(1.0))
    w = F.degrees(F.lit(2.0) * F.asin(ratio))
    return F.greatest(F.lit(1).cast("long"), F.floor(360.0 / w).cast("long"))


def with_cell(points: DataFrame, radius_m: float) -> DataFrame:
    """Attach the banded grid key (``band``, ``cx``) sized for
    ``radius_m`` — the SAME key :func:`distance_join` joins on, so at
    write time this pair is the natural partition/bucket column set: a
    stored spatial index in the TDB-index sense (one sort order per
    access path, ``jena-tdb/.../sys/Names.java:24-25``)."""
    h = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    n_bands = max(1, math.ceil(180.0 / h))
    sin_half = math.sin(radius_m / (2.0 * EARTH_MEAN_RADIUS_M))
    band = F.least(
        F.floor((F.col("lat") + 90.0) / h).cast("long"), F.lit(n_bands - 1)
    )
    out = points.withColumn("band", band)
    ncells = _n_cells(sin_half, _cos_min_band(F.col("band"), h))
    cx = F.pmod(
        F.floor((F.col("lon") + 180.0) * ncells / 360.0).cast("long"), ncells
    )
    return out.withColumn("cx", cx)


def distance_join(
    points: DataFrame,
    radius_m: float,
    right: DataFrame | None = None,
) -> DataFrame:
    """All pairs strictly within ``radius_m`` — the query jena-spatial
    answers per-probe from a driver-local Lucene index
    (``SpatialIndexLucene.java``), here as one distributed bin join,
    valid over the FULL sphere (poles and antimeridian included).

    Shape: latitude bands of height radius (dlat <= d/R is exact), a
    per-band longitude grid whose cell count shrinks toward the poles,
    and probes exploded to the candidate cell RANGE
    ``[lon - delta, lon + delta]`` (modular) in each of the <=3
    reachable bands, where delta is the per-band-pair great-circle
    bound sin(dlon/2) <= sin(d/2R)/sqrt(cos lat1 cos lat2). A target's
    (band, cell) key is unique and each probe range enumerates distinct
    cells, so every qualifying pair meets exactly once — no post-join
    dedup; the self-join case keeps ``ent_a < ent_b``. The range stays
    O(1) cells at every latitude (pole-touching bands have few cells by
    construction), so cost is O(candidates in shared cells), never
    O(N*M) — a plain shuffle-hash equi join AQE can skew-split.
    """
    self_join = right is None
    h = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    n_bands = max(1, math.ceil(180.0 / h))
    sin_half = math.sin(radius_m / (2.0 * EARTH_MEAN_RADIUS_M))

    left = with_cell(points, radius_m)
    rgt = left if self_join else with_cell(right, radius_m)
    nb = F.col("nb")
    probes = (
        left.withColumn(
            "nb", F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1))
        )
        .where((nb >= 0) & (nb < n_bands))
        .withColumn("ncells_nb", _n_cells(sin_half, _cos_min_band(nb, h)))
        .withColumn(
            "delta",
            _delta_deg(sin_half, _cos_min_band(F.col("band"), h), _cos_min_band(nb, h)),
        )
        .withColumn(
            "lo",
            F.floor(
                (F.col("lon") - F.col("delta") + 180.0) * F.col("ncells_nb") / 360.0
            ).cast("long"),
        )
        .withColumn(
            "hi",
            F.least(
                F.floor(
                    (F.col("lon") + F.col("delta") + 180.0) * F.col("ncells_nb") / 360.0
                ).cast("long"),
                F.col("lo") + F.col("ncells_nb") - 1,  # <= one full circle
            ),
        )
        .withColumn("ncx", F.explode(F.sequence(F.col("lo"), F.col("hi"))))
        .select(
            F.col("ent").alias("ent_a"),
            F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"),
            nb.alias("band"),
            F.pmod(F.col("ncx"), F.col("ncells_nb")).alias("cx"),
        )
    )
    cand = probes.join(
        rgt.select(
            F.col("ent").alias("ent_b"),
            F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"),
            "band", "cx",
        ),
        ["band", "cx"],
    )
    if self_join:
        cand = cand.where(F.col("ent_a") < F.col("ent_b"))
    dist = haversine_m(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        cand.withColumn("dist_m", dist)
        .where(F.col("dist_m") < radius_m)
        .drop("band", "cx")
    )
