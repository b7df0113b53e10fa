"""Transform kernel parity with reference vectors.

Vectors: GeoGeometryTest.kt:36-67 (DMS), RotateScaleTranslateTest.kt
(translate circle / scaleX/Y / rotate invariants),
GeoGeometryMigratedTests.kt:221-281 (hull containment), :776-781
(DP straight line), GeoGeometry.kt:1503-1515 winding.
"""

from __future__ import annotations

import numpy as np
import pytest

from geogeometry_spark.kernels import geometry as kg
from geogeometry_spark.kernels import transform as kt

BBG = (52.516279, 13.377157)


def test_to_decimal_degree():
    # GeoGeometryTest.kt:45-48
    assert kt.to_decimal_degree("W", 111, 38, 45.40) == pytest.approx(
        -111.64594444444445, abs=1e-5
    )
    assert kt.to_decimal_degree("E", 111, 38, 45.40) == pytest.approx(
        111.64594444444445, abs=1e-5
    )


def test_dms_accessors():
    d, m, s = kt.dms(-111.64594444444445)
    assert (d, m) == (111, 38)
    assert np.floor(s * 100 + 0.5) / 100 == 45.40


def test_human_readable():
    # GeoGeometryTest.kt:63-66
    assert (
        kt.human_readable(52.5298311, 13.3941763)
        == "52° 31' 47.39\" N, 13° 23' 39.03\" E"
    )
    assert (
        kt.human_readable(-22.910643, -43.2216922)
        == "22° 54' 38.31\" S, 43° 13' 18.09\" W"
    )
    assert (
        kt.human_readable(-33.8567844, 151.213108)
        == "33° 51' 24.42\" S, 151° 12' 47.19\" E"
    )


def test_convex_hull_contains_all_points():
    rng = np.random.default_rng(5)
    pts = np.stack(
        [13.3 + rng.random(200) * 0.2, 52.4 + rng.random(200) * 0.2], axis=1
    )
    hull = kt.convex_hull(pts)
    assert np.array_equal(hull[0], hull[-1])
    # every input point inside-or-on the hull: shrink test via PIP on a
    # slightly expanded hull (reference treats vertices as outside)
    grown = kt.expand_polygon(10.0, hull)
    inside = kg.polygon_contains(pts[:, 1], pts[:, 0], grown)
    assert inside.all()


def test_hull_of_square_is_square():
    pts = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5]]
    )
    hull = kt.convex_hull(pts)
    assert hull.shape[0] == 5  # 4 corners + closure
    assert {tuple(p) for p in hull[:-1]} == {
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)
    }


def test_simplify_straight_line_two_points():
    # GeoGeometryMigratedTests.kt:776-781
    line = np.array([[13.0, 52.0], [13.1, 52.1], [13.2, 52.2], [13.3, 52.3]])
    out = kt.simplify_line(line, 10.0)
    assert out.shape[0] == 2
    assert np.array_equal(out[0], line[0])
    assert np.array_equal(out[-1], line[-1])


def test_simplify_keeps_spike():
    # spike at index 2 (the reference's scan starts at i=2,
    # GeoGeometry.kt:1381-1387)
    line = np.array(
        [[13.0, 52.0], [13.05, 52.0], [13.1, 52.5], [13.15, 52.0], [13.2, 52.0]]
    )
    out = kt.simplify_line(line, 100.0)
    assert out.shape[0] >= 3  # the spike survives
    assert [13.1, 52.5] in out.tolist()


def test_rotate_preserves_centroid_distance():
    # RotateScaleTranslateTest.kt:53-64: radius invariant under rotation
    ring = kg.circle_to_polygon(20, BBG[0], BBG[1], 50.0)
    for degrees in (45.0, 360.0, 2000.0):
        lat2, lon2 = kt.rotate_around(
            BBG[0], BBG[1], ring[:, 1], ring[:, 0], degrees
        )
        d = kg.haversine(
            np.full_like(lat2, BBG[0]), np.full_like(lon2, BBG[1]), lat2, lon2
        )
        assert np.all(np.abs(d - 50.0) < 1.5)


def test_scale_x_y():
    # RotateScaleTranslateTest.kt:37-50 analogue on a 70 m rectangle
    w, s, e, n = kg.rectangle_around_centroid(BBG[0], BBG[1], 70.0, 70.0)
    ring = np.array([[w, s], [e, s], [e, n], [w, n], [w, s]])
    for pct in (30.0, 130.0):
        out = kt.scale_x(ring, pct)
        width = kg.haversine_scalar(out[0][1], out[0][0], out[1][1], out[1][0])
        assert round(width) == round(70.0 * pct / 100.0)
        out = kt.scale_y(ring, pct)
        height = kg.haversine_scalar(out[1][1], out[1][0], out[2][1], out[2][0])
        assert round(height) == round(70.0 * pct / 100.0)


def test_winding_and_rhr():
    ccw = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
    cw = ccw[::-1].copy()
    assert not kt.is_clockwise(ccw)
    assert kt.is_clockwise(cw)
    fixed = kt.ensure_rhr([cw, ccw])  # bad: outer cw, hole ccw
    assert not kt.is_clockwise(fixed[0])
    assert kt.is_clockwise(fixed[1])


def test_expand_polygon_contains_original():
    ring = kg.circle_to_polygon(12, BBG[0], BBG[1], 100.0)
    grown = kt.expand_polygon(50.0, ring)
    inside = kg.polygon_contains(ring[:, 1], ring[:, 0], grown)
    assert inside.all()


def test_simplify_multipolygon_per_polygon():
    """simplifyMultiPolygon (GeoGeometry.kt:1335-1346): applies
    simplifyPolygon per polygon, preserving polygon and ring order."""
    import numpy as np

    ring = np.array(
        [[0.0, 0.0], [0.001, 0.0000001], [0.002, 0.0], [0.002, 0.002],
         [0.0, 0.002], [0.0, 0.0]]
    )
    mp = [[ring], [ring + 1.0]]
    out = kt.simplify_multipolygon(mp, tolerance_m=50.0)
    assert len(out) == 2 and len(out[0]) == 1
    for poly_in, poly_out in zip(mp, out):
        expect = kt.simplify_polygon(poly_in, 50.0)
        for r_e, r_o in zip(expect, poly_out):
            assert np.array_equal(r_e, r_o)
    # the near-collinear vertex was dropped
    assert out[0][0].shape[0] < ring.shape[0]
