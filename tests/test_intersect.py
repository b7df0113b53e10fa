"""Full Geometry.intersects / contains dispatch, pinned to the
reference vectors in GeojsonTest.kt:157-390 plus the onLineSegment and
stringify/ensureHasAltitude helpers."""

import math

import numpy as np
import pytest

from geogeometry_spark.kernels import geometry as kgeo
from geogeometry_spark.kernels import intersect as kx


def P(lon, lat):
    return {"type": "Point", "coordinates": [lon, lat]}


def Poly(*rings):
    return {"type": "Polygon", "coordinates": [list(r) for r in rings]}


def Line(*pts):
    return {"type": "LineString", "coordinates": [list(p) for p in pts]}


UNIT_SQUARE = [
    [0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]
]


class TestOnLineSegment:
    # geojson.kt:202-213
    def test_on_segment(self):
        assert kx.on_line_segment([0.5, 0.5], [0.0, 0.0], [1.0, 1.0])

    def test_endpoints(self):
        assert kx.on_line_segment([0.0, 0.0], [0.0, 0.0], [1.0, 1.0])
        assert kx.on_line_segment([1.0, 1.0], [0.0, 0.0], [1.0, 1.0])

    def test_collinear_but_outside(self):
        assert not kx.on_line_segment([2.0, 2.0], [0.0, 0.0], [1.0, 1.0])
        assert not kx.on_line_segment([-0.5, -0.5], [0.0, 0.0], [1.0, 1.0])

    def test_off_line(self):
        assert not kx.on_line_segment([0.5, 0.6], [0.0, 0.0], [1.0, 1.0])

    def test_epsilon(self):
        # cross product below 1e-10 still counts as collinear
        assert kx.on_line_segment([0.5, 0.5 + 1e-11], [0.0, 0.0], [1.0, 1.0])

    def test_degenerate_segment_is_point(self):
        assert kx.on_line_segment([5.0, 5.0], [5.0, 5.0], [5.0, 5.0])
        # reference bug-parity: a zero-length segment accepts ANY point
        # (cross and dot both collapse to 0, and 0 <= squaredLength=0;
        # geojson.kt:202-213) — kept faithful, documented here
        assert kx.on_line_segment([5.0, 6.0], [5.0, 5.0], [5.0, 5.0])


class TestIntersectsMatrix:
    def test_point_inside_polygon(self):
        # GeojsonTest.kt:158-173 (Berlin box)
        point = P(13.3889, 52.5170)
        polygon = Poly([
            [13.387, 52.516], [13.390, 52.516], [13.390, 52.518],
            [13.387, 52.518], [13.387, 52.516],
        ])
        assert kx.intersects(point, polygon)
        assert kx.intersects(polygon, point)

    def test_disjoint(self):
        # GeojsonTest.kt:176-192
        point = P(10.0, 10.0)
        polygon = Poly(UNIT_SQUARE)
        assert not kx.intersects(point, polygon)
        assert not kx.intersects(polygon, point)

    def test_touching_lines(self):
        # GeojsonTest.kt:195-210
        l1 = Line([0.0, 0.0], [1.0, 1.0])
        l2 = Line([1.0, 1.0], [2.0, 2.0])
        assert kx.intersects(l1, l2)

    def test_overlapping_collinear_lines(self):
        # GeojsonTest.kt:213-228
        l1 = Line([0.0, 0.0], [2.0, 2.0])
        l2 = Line([1.0, 1.0], [3.0, 3.0])
        assert kx.intersects(l1, l2)

    def test_antimeridian_polygon_point(self):
        # GeojsonTest.kt:231-252
        polygon = Poly([
            [179.0, 0.0], [-179.0, 0.0], [-179.0, 1.0],
            [179.0, 1.0], [179.0, 0.0],
        ])
        assert kx.intersects(P(179.5, 0.5), polygon)
        assert kx.intersects(P(-179.5, 0.5), polygon)
        assert not kx.intersects(P(178.0, 0.5), polygon)

    def test_point_on_edge_and_vertex(self):
        # GeojsonTest.kt:255-270
        square = Poly(UNIT_SQUARE)
        assert kx.intersects(P(0.5, 0.0), square)
        assert kx.intersects(P(1.0, 1.0), square)

    def test_polygons_touching_at_vertex(self):
        # GeojsonTest.kt:273-297
        p1 = Poly(UNIT_SQUARE)
        p2 = Poly([
            [1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]
        ])
        assert kx.intersects(p1, p2)

    def test_zero_length_line_like_point(self):
        # GeojsonTest.kt:300-315
        pt = P(5.0, 5.0)
        zero = Line([5.0, 5.0], [5.0, 5.0])
        assert kx.intersects(zero, pt)
        big = Poly([
            [0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]
        ])
        assert kx.intersects(zero, big)

    def test_multipoint_any_member(self):
        # GeojsonTest.kt:318-334
        mp = {"type": "MultiPoint", "coordinates": [[0.0, 0.0], [2.0, 2.0]]}
        tri = Poly([
            [1.0, 1.0], [3.0, 1.0], [2.0, 3.0], [1.0, 1.0]
        ])
        assert kx.intersects(mp, tri)

    def test_geometry_collection(self):
        # GeojsonTest.kt:337-355
        coll = {
            "type": "GeometryCollection",
            "geometries": [P(10.0, 10.0), Line([0.0, 0.0], [1.0, 1.0])],
        }
        big = Poly([
            [-1.0, -1.0], [2.0, -1.0], [2.0, 2.0], [-1.0, 2.0], [-1.0, -1.0]
        ])
        assert kx.intersects(coll, big)

    def test_antimeridian_line_vs_multipolygon(self):
        # GeojsonTest.kt:358-377
        mp = {
            "type": "MultiPolygon",
            "coordinates": [[[
                [179.0, 0.0], [-179.0, 0.0], [-179.0, 1.0],
                [179.0, 1.0], [179.0, 0.0],
            ]]],
        }
        line = Line([178.0, 0.5], [-178.0, 0.5])
        assert kx.intersects(line, mp)

    def test_nested_circles(self):
        # GeojsonTest.kt:380-387
        c1 = kgeo.circle_to_polygon(50, 52.0, 13.0, 10.0)
        c2 = kgeo.circle_to_polygon(50, 52.0, 13.0, 5.0)
        g1 = Poly([list(p) for p in np.asarray(c1)])
        g2 = Poly([list(p) for p in np.asarray(c2)])
        assert kx.intersects(g1, g2)
        assert kx.intersects(g2, g1)

    def test_line_crossing_polygon_no_vertex_inside(self):
        # a line that crosses straight through: edge crossing, no
        # endpoint containment
        line = Line([-1.0, 0.5], [2.0, 0.5])
        assert kx.intersects(line, Poly(UNIT_SQUARE))
        assert kx.intersects(Poly(UNIT_SQUARE), line)

    def test_polygon_with_hole_contains(self):
        # hole-aware Geometry.contains (geojson.kt:186-191)
        holed = Poly(
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]],
        )
        assert kx.contains(holed, [0.5, 0.5])
        assert not kx.contains(holed, [2.0, 2.0])  # inside the hole
        # but the intersect matrix's containment ignores holes
        # (GeoGeometry.kt:216-223 outer-ring dispatch)
        assert kx.intersects(P(2.0, 2.0), holed) is False  # contains is hole-aware for Point x Polygon
        assert kx.intersects(holed, P(2.0, 2.0))  # polygon side: outer-only shortcut


class TestBboxesIntersect:
    def test_plain_overlap(self):
        assert kx.bboxes_intersect((0, 0, 2, 2), (1, 1, 3, 3))
        assert not kx.bboxes_intersect((0, 0, 1, 1), (2, 2, 3, 3))

    def test_antimeridian_wrap(self):
        # (179 .. -179) wraps; overlaps a box at 179.5
        assert kx.bboxes_intersect((-179.0, 0.0, 179.0, 1.0), (179.2, 0.2, 179.8, 0.8))
        # and does not overlap one at 178
        assert not kx.bboxes_intersect(
            (-179.0, 0.0, 179.0, 1.0), (177.5, 0.2, 178.5, 0.8)
        )

    def test_latitude_disjoint(self):
        assert not kx.bboxes_intersect((0, 0, 1, 1), (0, 2, 1, 3))


class TestFormatters:
    def test_point_to_string(self):
        # GeoGeometry.kt:1309-1311 "(longitude,latitude)"
        assert kx.point_to_string([13.2, 52.1]) == "(13.2,52.1)"
        assert kx.point_to_string([13.0, 52.0]) == "(13.0,52.0)"

    def test_line_to_string(self):
        assert (
            kx.line_to_string([[1.0, 2.0], [3.0, 4.0]]) == "(1.0,2.0),(3.0,4.0)"
        )

    def test_stringify(self):
        # geojson.kt:215-218
        assert kx.stringify([13.2, 52.1]) == "[13.2,52.1]"
        assert (
            kx.stringify([[1.0, 2.0], [3.0, 4.0]]) == "[[1.0,2.0], [3.0,4.0]]"
        )

    def test_ensure_has_altitude(self):
        # geojson.kt:241-288
        assert kx.ensure_has_altitude(P(1.0, 2.0))["coordinates"] == [1.0, 2.0, 0.0]
        p3 = {"type": "Point", "coordinates": [1.0, 2.0, 5.0]}
        assert kx.ensure_has_altitude(p3)["coordinates"] == [1.0, 2.0, 5.0]
        poly = kx.ensure_has_altitude(Poly(UNIT_SQUARE))
        assert all(len(p) == 3 for p in poly["coordinates"][0])
        coll = kx.ensure_has_altitude(
            {"type": "GeometryCollection", "geometries": [P(1.0, 2.0)]}
        )
        assert coll["geometries"][0]["coordinates"] == [1.0, 2.0, 0.0]


def test_intersects_udf_matrix(spark):
    """The pandas-UDF surface returns the same verdicts as the kernel."""
    import json

    from pyspark.sql import functions as F

    from geogeometry_spark.functions.udfs import make_intersects_udf

    cases = [
        (P(13.3889, 52.5170), Poly([
            [13.387, 52.516], [13.390, 52.516], [13.390, 52.518],
            [13.387, 52.518], [13.387, 52.516]]), True),
        (P(10.0, 10.0), Poly(UNIT_SQUARE), False),
        (Line([0.0, 0.0], [1.0, 1.0]), Line([1.0, 1.0], [2.0, 2.0]), True),
        (Line([178.0, 0.5], [-178.0, 0.5]), {
            "type": "MultiPolygon",
            "coordinates": [[[
                [179.0, 0.0], [-179.0, 0.0], [-179.0, 1.0],
                [179.0, 1.0], [179.0, 0.0]]]]}, True),
        (Poly(UNIT_SQUARE), Poly([
            [1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]), True),
    ]
    rows = [(i, json.dumps(a), json.dumps(b)) for i, (a, b, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, ga string, gb string")
    udf = make_intersects_udf()
    got = {
        r["i"]: r["x"]
        for r in df.select("i", udf(F.col("ga"), F.col("gb")).alias("x")).collect()
    }
    for i, (_a, _b, expect) in enumerate(cases):
        assert got[i] == expect, i
    # fixed-geometry variant
    fixed_udf = make_intersects_udf(Poly(UNIT_SQUARE))
    df2 = spark.createDataFrame(
        [(0, json.dumps(P(0.5, 0.5))), (1, json.dumps(P(5.0, 5.0))), (2, "notjson")],
        "i int, ga string",
    )
    got2 = {
        r["i"]: r["x"]
        for r in df2.select("i", fixed_udf(F.col("ga")).alias("x")).collect()
    }
    assert got2 == {0: True, 1: False, 2: False}


def test_vectorized_line_polygon_matches_dispatch():
    """kernels.geometry.line_intersects_polygon (the uniform-type hot
    path) must agree with the full kx.intersects dispatch on random and
    antimeridian segments."""
    rng = np.random.RandomState(3)
    poly = Poly([
        [13.376599, 52.509515], [13.377157, 52.516279],
        [13.381921, 52.531188], [13.412949, 52.532755],
        [13.410717, 52.503663], [13.376599, 52.509515],
    ])
    rings = [np.asarray(r) for r in poly["coordinates"]]
    lat1 = np.concatenate([
        52.49 + rng.rand(300) * 0.06, np.array([0.5, 0.5, 52.51])
    ])
    lon1 = np.concatenate([
        13.36 + rng.rand(300) * 0.07, np.array([179.9, -179.95, 13.39])
    ])
    lat2 = lat1 + (rng.rand(303) - 0.5) * 0.02
    lon2 = lon1 + (rng.rand(303) - 0.5) * 0.04
    got = kgeo.line_intersects_polygon(lat1, lon1, lat2, lon2, rings)
    for i in range(len(lat1)):
        line = Line([lon1[i], lat1[i]], [lon2[i], lat2[i]])
        expect = kx.intersects(line, poly)
        assert bool(got[i]) == expect, (i, lat1[i], lon1[i])


class TestUrlEncode:
    # json-helpers.kt:17-33
    def test_unreserved_kept(self):
        assert kx.url_encode("Az09-._~") == "Az09-._~"

    def test_reserved_escaped_uppercase_hex(self):
        assert kx.url_encode(" ") == "%20"
        assert kx.url_encode("{\"a\":[1,2]}") == "%7B%22a%22%3A%5B1%2C2%5D%7D"
        assert kx.url_encode("a/b+c") == "a%2Fb%2Bc"

    def test_utf8_multibyte(self):
        assert kx.url_encode("é") == "%C3%A9"  # UTF-8 bytes each escaped

    def test_geojson_io_url(self):
        url = kx.geojson_io_url('{"type":"FeatureCollection","features":[]}')
        assert url.startswith("https://geojson.io/#data=data%3Aapplication%2Fjson%2C")
        assert "%7B%22type%22" in url


def test_vectorized_line_polygon_wide_span_bbox_veto():
    """A polygon whose raw lon span exceeds 180° is read as antimeridian-
    crossing by the reference's shorter-arc bbox normalization, vetoing
    segments a planar reading would accept — the vectorized kernel must
    reproduce that verdict (code-review r2 finding)."""
    wide = Poly([
        [-170.0, -10.0], [170.0, -10.0], [170.0, 10.0],
        [-170.0, 10.0], [-170.0, -10.0],
    ])
    rings = [np.asarray(r) for r in wide["coordinates"]]
    cases = [
        (0.0, 0.0, 1.0, 1.0),       # planar-inside, wrap-reading outside
        (5.0, -175.0, 5.5, -174.5), # inside the wrap arc
        (0.0, 175.0, 0.5, 175.5),
        (0.0, 160.0, 0.0, 161.0),   # outside both readings
    ]
    lat1 = np.array([c[0] for c in cases]); lon1 = np.array([c[1] for c in cases])
    lat2 = np.array([c[2] for c in cases]); lon2 = np.array([c[3] for c in cases])
    got = kgeo.line_intersects_polygon(lat1, lon1, lat2, lon2, rings)
    for i, c in enumerate(cases):
        line = Line([c[1], c[0]], [c[3], c[2]])
        assert bool(got[i]) == kx.intersects(line, wide), c


class TestKtDoubleRendering:
    """Java Double.toString thresholds (plain for 1e-3 <= |v| < 1e7,
    scientific outside) — python repr switches at 1e-4/1e16 and would
    diverge (code-review r2 finding)."""

    def test_scientific_low(self):
        assert kx.point_to_string([0.0005, 52.0]) == "(5.0E-4,52.0)"
        assert kx.stringify([0.0009, -5e-4]) == "[9.0E-4,-5.0E-4]"

    def test_scientific_high(self):
        assert kx._kt_double(1e7) == "1.0E7"
        assert kx._kt_double(12345678.9) == "1.23456789E7"

    def test_plain_boundaries(self):
        assert kx._kt_double(0.001) == "0.001"
        assert kx._kt_double(9999999.5) == "9999999.5"
        assert kx._kt_double(-0.001) == "-0.001"

    def test_zero_and_specials(self):
        assert kx._kt_double(0.0) == "0.0"
        assert kx._kt_double(-0.0) == "-0.0"
        assert kx._kt_double(float("nan")) == "NaN"
        assert kx._kt_double(float("inf")) == "Infinity"
