"""Spatial surface (jena-spatial / jena-geosparql analog): haversine
parity with the reference formula, grid-join losslessness vs brute
force (antimeridian and lat-boundary cases included), and plan-level
proof that the distance join never degenerates to a cross join."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.queries import spatial as SP  # noqa: E402


def _ref_haversine_m(lat1, lon1, lat2, lon2):
    """Pure-Python twin of GreatCircleDistance.haversineFormula
    (GreatCircleDistance.java:177-193)."""
    lat1r, lat2r = math.radians(lat1), math.radians(lat2)
    dlat, dlon = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(lat1r) * math.cos(lat2r) * math.sin(dlon / 2) ** 2
    return SP.EARTH_MEAN_RADIUS_M * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))


def _points(spark, n=400, seed=7):
    """Deterministic pseudo-random points with antimeridian and
    lat-boundary mass: ids 0..n-1, lat in [-66, 66], lon in [-180, 180)."""
    rows = []
    for i in range(n):
        h = (i * 2654435761 + seed) % (2**32)
        lat = ((h % 13200) / 100.0) - 66.0
        lon = (((h // 13200) % 36000) / 100.0) - 180.0
        if i % 10 == 0:  # force antimeridian neighbourhoods
            lon = 179.0 + (i % 20) / 10.0  # 179.0..180.9 -> wraps
            if lon >= 180.0:
                lon -= 360.0
        if i % 17 == 0:  # force the lat boundary
            lat = 65.0 + (i % 11) / 10.0
            if lat > 66.0:
                lat = 66.0
        rows.append((f"e{i:04d}", float(lon), float(lat)))
    return spark.createDataFrame(rows, "ent string, lon double, lat double")


def _brute_pairs(pts, radius_m):
    a = pts.select(F.col("ent").alias("ent_a"), F.col("lat").alias("lat_a"),
                   F.col("lon").alias("lon_a"))
    b = pts.select(F.col("ent").alias("ent_b"), F.col("lat").alias("lat_b"),
                   F.col("lon").alias("lon_b"))
    d = SP.haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    return (
        a.crossJoin(b)
        .where(F.col("ent_a") < F.col("ent_b"))
        .withColumn("dist_m", d)
        .where(F.col("dist_m") < radius_m)
    )


def test_haversine_matches_reference_formula(spark):
    cases = [
        (0.0, 0.0, 0.0, 1.0),
        (51.5, -0.12, 48.85, 2.35),     # London-Paris
        (-33.9, 151.2, 40.7, -74.0),    # Sydney-NYC (antipodal-ish)
        (65.9, 179.9, 65.9, -179.9),    # antimeridian, high lat
        (20.0, 10.0, 20.0, 10.0),       # identical points
    ]
    df = spark.createDataFrame(cases, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        SP.haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for (lat1, lon1, lat2, lon2), row in zip(cases, got):
        want = _ref_haversine_m(lat1, lon1, lat2, lon2)
        assert abs(row["d"] - want) <= max(1e-6 * max(want, 1.0), 1e-6)


def test_wkt_point_roundtrip(spark):
    df = spark.createDataFrame(
        [(-179.99, -66.0), (0.0, 0.0), (179.99, 66.0), (10.25, -45.5)],
        "lon double, lat double",
    )
    wkt = df.select(SP.wkt_point(F.col("lon"), F.col("lat")).alias("w"),
                    "lon", "lat")
    lon2, lat2 = SP.parse_wkt_point(F.col("w"))
    back = wkt.select("lon", "lat", lon2.alias("lon2"), lat2.alias("lat2")).collect()
    for r in back:
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)
    bad = spark.createDataFrame([("LINESTRING(0 0, 1 1)",), ("POINT(x y)",)], "w string")
    lonb, latb = SP.parse_wkt_point(F.col("w"))
    assert bad.select(lonb.alias("l")).where(F.col("l").isNotNull()).count() == 0


@pytest.mark.parametrize("radius_km", [150.0, 800.0])
def test_distance_join_equals_brute_force(spark, radius_km):
    pts = _points(spark)
    radius_m = radius_km * 1000.0
    got = {
        (r["ent_a"], r["ent_b"], round(r["dist_m"], 3))
        for r in SP.distance_join(pts, radius_m).collect()
    }
    want = {
        (r["ent_a"], r["ent_b"], round(r["dist_m"], 3))
        for r in _brute_pairs(pts, radius_m).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise pairs


def test_distance_join_ab_sides(spark):
    pts = _points(spark, n=200)
    left = pts.where(F.col("ent") < "e0100")
    right = pts.where(F.col("ent") >= "e0100")
    radius_m = 500_000.0
    got = {
        (r["ent_a"], r["ent_b"])
        for r in SP.distance_join(left, radius_m, right=right).collect()
    }
    d = SP.haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    want = {
        (r["ent_a"], r["ent_b"])
        for r in left.select(F.col("ent").alias("ent_a"), F.col("lat").alias("lat_a"),
                             F.col("lon").alias("lon_a"))
        .crossJoin(right.select(F.col("ent").alias("ent_b"), F.col("lat").alias("lat_b"),
                                F.col("lon").alias("lon_b")))
        .withColumn("dist_m", d).where(F.col("dist_m") < radius_m).collect()
    }
    assert got == want and len(want) > 0


def test_nearby_equals_brute_force_and_antimeridian_center(spark):
    pts = _points(spark)
    for lat, lon, radius_m in [(20.0, 10.0, 1_000_000.0),
                               (65.5, 179.8, 800_000.0),   # box crosses antimeridian
                               (0.0, -179.9, 500_000.0)]:
        got = {r["ent"] for r in SP.nearby(pts, lat, lon, radius_m).collect()}
        d = SP.haversine_m(F.lit(lat), F.lit(lon), F.col("lat"), F.col("lon"))
        want = {r["ent"] for r in pts.withColumn("d", d).where(F.col("d") < radius_m).collect()}
        assert got == want


def test_sparql_property_function_pattern(spark):
    """OpPropFunc from the string front-end: ``?s spatial:nearby (lat
    lon km)`` dispatches the registered graph-level adapter and joins
    with ordinary patterns; non-var subjects and var args raise."""
    from jena_spark.queries.sparql import sparql_query

    rows = [("iri", f"http://ex.org/p{i}", SP.GEO_AS_WKT, "literal",
             f"POINT({i * 7 - 30}.00 {i * 4 - 18}.00)", SP.GEO_WKT_LITERAL, None)
            for i in range(10)]
    t = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    got = {r["s"] for r in sparql_query(t, """
        PREFIX spatial: <http://jena.apache.org/spatial#>
        SELECT ?s WHERE { ?s spatial:nearby (0.0 0.0 3000.0) . }""").collect()}
    want = {r["ent"] for r in SP.nearby(
        SP.points_from_triples(t), 0.0, 0.0, 3_000_000.0).collect()}
    assert got == want and len(want) > 0
    # ';'-chained with an ordinary pattern joins on the subject
    joined = sparql_query(t, f"""PREFIX spatial: <http://jena.apache.org/spatial#>
        SELECT ?s ?w WHERE {{ ?s spatial:nearby (0.0 0.0 3000.0) ;
                                 <{SP.GEO_AS_WKT}> ?w . }}""")
    assert joined.count() == len(want) and set(joined.columns) == {"s", "w"}
    with pytest.raises(ValueError, match="must be constants"):
        sparql_query(t, """PREFIX spatial: <http://jena.apache.org/spatial#>
            SELECT ?s WHERE { ?s spatial:nearby (?x 0.0 10.0) . }""")


def test_sparql_iri_function_call(spark):
    """ARQ E_Function: custom functions invoked by IRI (full or
    prefixed) from SPARQL strings, dispatched through the
    FunctionRegistry analog; xsd:double() casting constructor too."""
    from jena_spark.queries.sparql import sparql_query

    SP.register_functions()
    rows = [("iri", f"http://ex.org/p{i}", SP.GEO_AS_WKT, "literal",
             f"POINT({i * 5 - 20}.00 {i * 3 - 12}.00)", SP.GEO_WKT_LITERAL, None)
            for i in range(9)]
    t = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    # full-IRI call in FILTER
    got = sparql_query(t, f"""SELECT ?s WHERE {{ ?s <{SP.GEO_AS_WKT}> ?w .
      FILTER (<http://www.opengis.net/def/function/geosparql/distance>(?w, "POINT(0.00 0.00)") < 1000000) }}""")
    pts = SP.points_from_triples(t)
    want = SP.nearby(pts, 0.0, 0.0, 1_000_000.0).count()
    assert got.count() == want > 0
    # prefixed call in projection + xsd:double constructor
    got2 = sparql_query(t, f"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      SELECT ?s (xsd:double(geof:distance(?w, "POINT(0.00 0.00)")) AS ?d)
      WHERE {{ ?s <{SP.GEO_AS_WKT}> ?w }}""")
    # flat results canonicalize typed literals to lexical strings —
    # the values must equal the direct-API distances
    got_d = {r["s"]: float(r["d"]) for r in got2.collect()}
    want_d = {r["ent"]: r["d"] for r in pts.withColumn(
        "d", SP.haversine_m(F.lit(0.0), F.lit(0.0), F.col("lat"), F.col("lon"))
    ).collect()}
    assert len(got_d) == 9
    for k, d in got_d.items():
        assert d == pytest.approx(want_d[k], rel=1e-12)
    # unregistered IRI fails loudly
    with pytest.raises(ValueError, match="unregistered function"):
        sparql_query(t, """SELECT ?s WHERE { ?s ?p ?w .
          FILTER (<http://ex.org/nosuch>(?w) > 0) }""").collect()


def test_geof_distance_function_registry(spark):
    """geof:distance (DistanceFF.java) registers in the FunctionRegistry
    analog and prices WKT literal pairs in metres or kilometres."""
    from jena_spark.functions import scalar

    SP.register_functions()
    fn = scalar.SPARQL_FUNCTIONS["http://www.opengis.net/def/function/geosparql/distance"]
    df = spark.createDataFrame(
        [("POINT(0.00 0.00)", "POINT(1.00 0.00)")], "w1 string, w2 string")
    m = df.select(fn(F.col("w1"), F.col("w2")).alias("d")).collect()[0]["d"]
    km = df.select(fn(F.col("w1"), F.col("w2"), "kilometre").alias("d")).collect()[0]["d"]
    want = _ref_haversine_m(0.0, 0.0, 0.0, 1.0)
    assert m == pytest.approx(want, rel=1e-9)
    assert km == pytest.approx(want / 1000.0, rel=1e-9)


def test_spatial_property_function_registry(spark):
    """The jena-spatial property functions resolve through the
    PropertyFunctionRegistry analog and agree with the direct API
    (IsNearByPF / IsWithinBoxPF / NorthPF family; radius in km per
    DistanceUnitsUtils.java:28, limit = distance-ordered top-N)."""
    from jena_spark.queries import propfunc

    rows = [("iri", f"http://ex.org/e{i}", SP.GEO_AS_WKT, "literal",
             f"POINT({(i * 37) % 340 - 170}.50 {(i * 11) % 120 - 60}.25)",
             SP.GEO_WKT_LITERAL, None) for i in range(80)]
    triples = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    nearby_fn = propfunc.lookup(SP.SPATIAL_NS + "nearby")
    circle_fn = propfunc.lookup(SP.SPATIAL_NS + "withinCircle")
    assert nearby_fn is circle_fn is SP.nearby_pf
    got = {r["ent"] for r in nearby_fn(triples, 10.0, 20.0, 3000.0).collect()}
    want = {r["ent"] for r in SP.nearby(
        SP.points_from_triples(triples), 10.0, 20.0, 3_000_000.0).collect()}
    assert got == want and len(want) > 0
    # limit: distance-ordered top-N, deterministic (trailing positional
    # arg, SpatialOperationWithCircleBase arg-list order)
    top2 = nearby_fn(triples, 10.0, 20.0, 3000.0, 2).collect()
    assert len(top2) == 2
    assert top2[0]["dist_m"] <= top2[1]["dist_m"]
    # units string before the limit (DistanceUnitsUtils): 3000 km
    # spelled in miles must select the same entity set
    miles = {r["ent"] for r in
             nearby_fn(triples, 10.0, 20.0, 3000.0 / 1.609344, "miles").collect()}
    assert miles == got
    # metres spelling
    metres = {r["ent"] for r in
              nearby_fn(triples, 10.0, 20.0, 3_000_000.0, "metres").collect()}
    assert metres == got
    # unknown units / stray trailing args error loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="units"):
        nearby_fn(triples, 10.0, 20.0, 3000.0, "leagues")
    with _pytest.raises(ValueError, match="trailing"):
        nearby_fn(triples, 10.0, 20.0, 3000.0, "km", 2, 9)
    box_fn = propfunc.lookup(SP.SPATIAL_NS + "intersectBox")
    assert {r["ent"] for r in box_fn(triples, -10.0, -20.0, 30.0, 40.0).collect()} == {
        r["ent"] for r in SP.within_box(
            SP.points_from_triples(triples), -10.0, 30.0, -20.0, 40.0).collect()}
    north_fn = propfunc.lookup(SP.SPATIAL_NS + "north")
    assert {r["ent"] for r in north_fn(triples, 30.0).collect()} == {
        r["ent"] for r in SP.north_of(SP.points_from_triples(triples), 30.0).collect()}
    # unknown IRIs still miss cleanly
    assert propfunc.lookup("http://jena.apache.org/spatial#bogus") is None


def test_directional_half_planes(spark):
    """spatial:north/south/east/west (NorthPF.java:37-41 family) are
    half-plane boxes against the world bounds, bounds inclusive."""
    pts = spark.createDataFrame(
        [("a", 20.0, 0.0), ("b", 20.0, 35.0), ("c", -10.0, -35.0), ("d", 10.0, 35.0)],
        "ent string, lon double, lat double",
    )
    assert {r["ent"] for r in SP.north_of(pts, 35.0).collect()} == {"b", "d"}
    assert {r["ent"] for r in SP.south_of(pts, 0.0).collect()} == {"a", "c"}
    assert {r["ent"] for r in SP.east_of(pts, 10.0).collect()} == {"a", "b", "d"}
    assert {r["ent"] for r in SP.west_of(pts, -10.0).collect()} == {"c"}


def test_within_box_inclusive_bounds(spark):
    pts = spark.createDataFrame(
        [("a", 10.0, 5.0), ("b", 30.0, 40.0), ("c", 9.99, 5.0), ("d", 20.0, 40.01)],
        "ent string, lat double, lon double",
    )
    got = {r["ent"] for r in SP.within_box(pts, 10.0, 30.0, -20.0, 40.0).collect()}
    assert got == {"a", "b"}


def test_distance_join_plan_is_equi_join(spark):
    pts = _points(spark, n=100)
    plan = SP.distance_join(pts, 500_000.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_width_exact_bound_regression(spark):
    """The linear cell-width bound h/cos(MAX_ABS_LAT) under-reaches:
    at radius 707 km two points at lat 66.0 with lons 7.8211/23.4837
    are 706.5 km apart but span 15.66 deg of longitude (> the linear
    15.63) and used to land two cells apart — silently dropped. The
    exact bound 2*asin(sin(d/2R)/cos(MAX_ABS_LAT)) must keep them."""
    pts = spark.createDataFrame(
        [("a", 7.8211, 66.0), ("b", 23.4837, 66.0)],
        "ent string, lon double, lat double",
    )
    got = SP.distance_join(pts, 707_000.0).collect()
    assert len(got) == 1 and got[0]["dist_m"] < 707_000.0
    # sweep the floor-slack-critical band against brute force
    pts2 = _points(spark, n=150, seed=13)
    for radius_m in (660_000.0, 707_000.0, 761_000.0, 843_000.0, 901_000.0):
        got = {(r["ent_a"], r["ent_b"]) for r in SP.distance_join(pts2, radius_m).collect()}
        want = {(r["ent_a"], r["ent_b"]) for r in _brute_pairs(pts2, radius_m).collect()}
        assert got == want, f"radius {radius_m}"


def test_haversine_antipodal_clamp(spark):
    """Exact antipodes: rounding can push the haversine 'a' term past 1
    — must clamp to the half-circumference, never NaN (and the DuckDB
    oracle twin must not error on sqrt of a negative)."""
    df = spark.createDataFrame(
        [(20.0, 10.0, -20.0, -170.0), (0.0, 0.0, 0.0, 180.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    rows = df.select(
        SP.haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    half_circumference = math.pi * SP.EARTH_MEAN_RADIUS_M
    for r in rows:
        assert not math.isnan(r["d"])
        assert r["d"] == pytest.approx(half_circumference, abs=1.0)
    import duckdb
    got = duckdb.sql("""SELECT (6371008.7714 * 2 * atan2(
        sqrt(least(pow(sin(radians(-20.0 - 20.0) / 2), 2)
             + cos(radians(20.0)) * cos(radians(-20.0))
               * pow(sin(radians(-170.0 - 10.0) / 2), 2), 1.0)),
        sqrt(1 - least(pow(sin(radians(-20.0 - 20.0) / 2), 2)
                  + cos(radians(20.0)) * cos(radians(-20.0))
                    * pow(sin(radians(-170.0 - 10.0) / 2), 2), 1.0)))) AS d""").fetchone()[0]
    assert got == pytest.approx(half_circumference, abs=1.0)


def test_wkt_parse_lexical_variants(spark):
    """Reference WKTReader accepts case-insensitive keywords, signed
    and exponent-form coordinates — parsing must not silently drop
    such externally-sourced literals."""
    df = spark.createDataFrame(
        [("point(10.5 20.5)", 10.5, 20.5),
         ("POINT(+10.5 -20.5)", 10.5, -20.5),
         ("Point( 1.05e1   -2.05E1 )", 10.5, -20.5),
         ("POINT(.5 5.)", 0.5, 5.0)],
        "w string, want_lon double, want_lat double",
    )
    lon, lat = SP.parse_wkt_point(F.col("w"))
    for r in df.select("want_lon", "want_lat", lon.alias("lon"), lat.alias("lat")).collect():
        assert r["lon"] == pytest.approx(r["want_lon"], abs=1e-9)
        assert r["lat"] == pytest.approx(r["want_lat"], abs=1e-9)


def test_distance_join_polar_full_sphere(spark):
    """The banded grid has NO latitude restriction: clusters at and
    around both poles (where one lon-degree is near zero metres and a
    uniform grid under-reaches) must match brute force exactly."""
    rows = []
    for i in range(60):  # dense north-pole cap, all longitudes
        rows.append((f"n{i:02d}", float((i * 37) % 360 - 180), 89.0 + (i % 10) * 0.1))
    for i in range(40):  # south-pole cap
        rows.append((f"s{i:02d}", float((i * 91) % 360 - 180), -90.0 + (i % 8) * 0.3))
    rows += [("p1", 0.0, 90.0), ("p2", 180.0, 90.0),   # the pole itself, twice
             ("eq", 10.0, 0.0)]
    pts = spark.createDataFrame(rows, "ent string, lon double, lat double")
    for radius_m in (50_000.0, 120_000.0, 707_000.0):
        got = {(r["ent_a"], r["ent_b"]) for r in SP.distance_join(pts, radius_m).collect()}
        want = {(r["ent_a"], r["ent_b"]) for r in _brute_pairs(pts, radius_m).collect()}
        assert got == want, f"radius {radius_m}"
    assert ("p1", "p2") in got  # identical location, distance 0


def test_pf_bnode_subject_keeps_kind(spark):
    """A bnode-subject geometry binds with its OWN term kind from the
    string front-end (PropFuncArg subjects are any node kind), so the
    struct equi-join with ordinary patterns over the same subject
    matches instead of silently dropping rows."""
    from jena_spark.queries.sparql import sparql_query

    rows = [
        ("bnode", "b0", SP.GEO_AS_WKT, "literal",
         "POINT(1.00 1.00)", SP.GEO_WKT_LITERAL, None),
        ("iri", "http://ex.org/i1", SP.GEO_AS_WKT, "literal",
         "POINT(2.00 2.00)", SP.GEO_WKT_LITERAL, None),
    ]
    t = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    got = sparql_query(t, f"""PREFIX spatial: <http://jena.apache.org/spatial#>
        SELECT ?s ?w WHERE {{ ?s spatial:nearby (0.0 0.0 1000.0) ;
                                 <{SP.GEO_AS_WKT}> ?w . }}""").collect()
    assert {r["s"] for r in got} == {"b0", "http://ex.org/i1"}


def test_pf_registry_contract_errors(spark):
    """String-front-end property-function contract: bindings-level
    library IRIs error loudly (wrong calling convention), a graph-level
    IRI without a list object errors loudly (a silent empty ordinary
    pattern would mask the mistake), and register() overrides survive
    the lazy spatial load."""
    from jena_spark.queries import propfunc
    from jena_spark.queries.sparql import sparql_query

    t = spark.createDataFrame(
        [("iri", "http://ex.org/i1", SP.GEO_AS_WKT, "literal",
          "POINT(2.00 2.00)", SP.GEO_WKT_LITERAL, None)],
        "s_kind string, s_val string, p_val string, o_kind string,"
        " o_val string, o_datatype string, o_lang string")
    with pytest.raises(ValueError, match="bindings-level"):
        sparql_query(t, """PREFIX apf: <http://jena.apache.org/ARQ/property#>
            SELECT ?s WHERE { ?s apf:strSplit ("a b" " ") . }""")
    with pytest.raises(ValueError, match="list object"):
        sparql_query(t, """PREFIX spatial: <http://jena.apache.org/spatial#>
            SELECT ?s WHERE { ?s spatial:north 40.0 . }""")
    # a user registration is never clobbered by the lazy library load
    iri = SP.SPATIAL_NS + "nearby"
    prev = propfunc.lookup(iri)
    try:
        marker = lambda triples, *a: SP.nearby_pf(triples, *a)  # noqa: E731
        propfunc.register(iri, marker, graph_level=True)
        propfunc.lookup(SP.SPATIAL_NS + "no-such-pf")  # miss -> lazy load path
        assert propfunc.lookup(iri) is marker
    finally:
        propfunc.register(iri, prev, graph_level=True)


def test_call_iri_as_filter_predicate(spark):
    """A boolean-valued custom function invoked by IRI is usable
    directly as the FILTER predicate (same cast the name-based call
    form gets)."""
    from jena_spark.functions import scalar
    from jena_spark.queries.sparql import sparql_query

    scalar.register("http://ex.org/fn/nearOrigin",
                    lambda w: SP.geof_distance(
                        w, F.lit("POINT(0.00 0.00)")) < 500_000.0)
    rows = [("iri", "http://ex.org/a", SP.GEO_AS_WKT, "literal",
             "POINT(1.00 1.00)", SP.GEO_WKT_LITERAL, None),
            ("iri", "http://ex.org/b", SP.GEO_AS_WKT, "literal",
             "POINT(90.00 40.00)", SP.GEO_WKT_LITERAL, None)]
    t = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    got = sparql_query(t, f"""SELECT ?s WHERE {{ ?s <{SP.GEO_AS_WKT}> ?w .
        FILTER (<http://ex.org/fn/nearOrigin>(?w)) }}""").collect()
    assert {r["s"] for r in got} == {"http://ex.org/a"}


def test_geof_distance_units_column_and_cast_null(spark):
    """geof:distance's units argument works as a Column (the string
    front-end passes one); xsd casting constructors yield NULL on
    malformed lexicals instead of an ANSI runtime abort."""
    from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN

    df = spark.range(1).select(
        F.lit("POINT(0.00 0.00)").alias("a"),
        F.lit("POINT(0.00 1.00)").alias("b"))
    m = df.select(SP.geof_distance(F.col("a"), F.col("b")).alias("d")).first()["d"]
    km = df.select(SP.geof_distance(
        F.col("a"), F.col("b"), F.lit("kilometre")).alias("d")).first()["d"]
    assert km == pytest.approx(m / 1000.0)
    bad = spark.range(1).select(
        FN["http://www.w3.org/2001/XMLSchema#integer"](F.lit("not-a-number")).alias("i"),
        FN["http://www.w3.org/2001/XMLSchema#double"](F.lit("xyz")).alias("d"))
    row = bad.first()
    assert row["i"] is None and row["d"] is None


def test_user_bindings_level_registration_wins(spark):
    """A user registration made BEFORE the lazy spatial load keeps both
    its function AND its bindings-level convention — the library load
    must not flip the IRI to graph-level."""
    import importlib

    from jena_spark.queries import propfunc

    importlib.reload(propfunc)  # fresh registry, spatial not yet loaded
    try:
        iri = SP.SPATIAL_NS + "nearby"
        marker = lambda bindings, col, out: bindings  # noqa: E731
        propfunc.register(iri, marker)  # bindings-level
        propfunc.lookup(SP.SPATIAL_NS + "missing")  # triggers lazy load
        assert propfunc.lookup(iri) is marker
        assert not propfunc.graph_level(iri)
    finally:
        importlib.reload(propfunc)
