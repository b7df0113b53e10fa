"""Covering planner tests — invariants from GeoHashUtilsTest.kt."""

import numpy as np
import pytest

from geogeometry_spark.kernels import covering, geohash as gh, geometry as geo

# 9-vertex concave Berlin polygon, GeoHashUtilsTest.kt:76-120 [lon, lat]
CONCAVE = np.array([
    [13.402633666992188, 52.556785714011625],
    [13.402719497680664, 52.54713081557263],
    [13.41379165649414, 52.547078621160054],
    [13.413705825805664, 52.54968826575346],
    [13.405895233154297, 52.54927073304618],
    [13.40580940246582, 52.55459397751005],
    [13.413963317871094, 52.55433304920524],
    [13.413877487182617, 52.55683789687965],
    [13.402633666992188, 52.556785714011625],
])

# bigRing from test-fixture.kt:5-14
BIG_RING = np.array([
    [13.376599, 52.509515],  # potsDammerPlatz
    [13.377157, 52.516279],  # brandenBurgerGate
    [13.381921, 52.531188],  # naturkundeMuseum
    [13.412949, 52.532755],  # senefelderPlatz
    [13.410717, 52.503663],  # moritzPlatz
    [13.376599, 52.509515],
])


def test_concave_cover_smaller_than_bbox():
    # GeoHashUtilsTest.kt:75-133: hash-area < bbox-area for the concave ring
    hashes = covering.geohashes_for_linear_ring(CONCAVE, include_partial=True)
    assert len(hashes) > 0
    total = sum(geo.area_bbox(gh.decode_bbox_scalar(h)) for h in hashes)
    bbox_area = geo.area_bbox(geo.bounding_box(CONCAVE))
    assert total < bbox_area


def test_max_length_respected():
    # GeoHashUtilsTest.kt:64-72
    h5 = str(gh.encode(52.0, 13.0, 5)[0])
    w, s, e, n = gh.decode_bbox_scalar(h5)
    ring = np.array([[w, s], [e, s], [e, n], [w, n], [w, s]])
    hashes = covering.geohashes_for_linear_ring(ring, max_length=5, include_partial=True)
    assert len(hashes) < 5
    assert all(len(h) <= 5 for h in hashes)


def test_cover_cells_contain_only_inside_points():
    """Covering guarantee: a point whose hash extends an interior cell is
    inside the ring (GeoHashUtils.kt:485-492 doc)."""
    full, border = covering.cover_with_borders([BIG_RING], max_length=7)
    assert full, "expected at least one interior cell"
    rng = np.random.default_rng(42)
    w, s, e, n = geo.bounding_box(BIG_RING)
    lat = rng.uniform(s, n, 3000)
    lon = rng.uniform(w, e, 3000)
    cells = gh.encode(lat, lon, 12)
    inside = geo.polygon_contains(lat, lon, BIG_RING)

    def member(cell_set):
        m = np.zeros(lat.shape[0], dtype=bool)
        for ln in sorted({len(c) for c in cell_set}):
            at_len = np.array(sorted(c for c in cell_set if len(c) == ln))
            prefixes = np.array([str(c)[:ln] for c in cells])
            m |= np.isin(prefixes, at_len)
        return m

    in_full = member(full)
    in_border = member(border)
    # every point assigned to an interior cell must truly be inside
    assert not (in_full & ~inside).any()
    # and interior+border together cover everything inside
    assert not (inside & ~(in_full | in_border)).any()


def test_circle_cover_within_radius():
    # GeoHashUtilsTest.kt:452-467 — circle hashes stay within 1.3 * r
    lat, lon, r = 52.0, 13.0, 500.0
    hashes = covering.geohashes_for_circle(None, lat, lon, r, include_partial=True)
    assert hashes
    for h in hashes:
        wlon, wlat = gh.decode(np.array([h]))
        assert geo.haversine_scalar(lat, lon, float(wlat[0]), float(wlon[0])) < 1.3 * r


def test_polygon_with_hole_excludes_hole():
    # GeoHashUtilsTest.kt:504-560 — unit square with centered hole
    outer = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    hole = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]],
        dtype=float,
    )
    hashes = covering.geohashes_for_polygon([outer, hole], max_length=6)
    assert hashes
    for h in hashes:
        clon, clat = gh.decode(np.array([h]))
        clat, clon = float(clat[0]), float(clon[0])
        # center inside outer, not inside hole
        assert geo.polygon_contains_scalar(clat, clon, outer)
        assert not geo.polygon_contains_scalar(clat, clon, hole)


def test_path_cover():
    path = np.array([[13.38, 52.51], [13.40, 52.52], [13.41, 52.53]])
    hashes = covering.geohashes_for_path(7, path)
    assert hashes
    assert all(len(h) >= 1 for h in hashes)


def test_pole_rejection():
    ring = np.array([[0, 89.9], [1, 89.9], [1, 89.95], [0, 89.9]])
    with pytest.raises(ValueError):
        covering.geohashes_for_linear_ring(ring)


def test_line_cover_degenerate():
    got = covering.geohashes_for_line(100.0, 52.0, 13.0, 52.0, 13.0)
    assert got == {str(gh.encode(52.0, 13.0, 12)[0])}


def test_large_quad_cover_vector():
    # GeoHashUtilsTest.kt:374-392: large quad at maxLength=5 produces
    # >=1000 hashes and parent-collapse yields some length-4 hashes
    import numpy as np

    from geogeometry_spark.kernels import covering

    ring = np.array([[-1.0, 1.0], [2.0, 2.0], [3.0, -1.0], [-2.0, -4.0]])
    hashes = covering.geohashes_for_linear_ring(ring, max_length=5)
    assert len(hashes) >= 1000
    assert min(len(h) for h in hashes) == 4


def test_overlap_boxes_vs_ring_matches_scalar_overlap():
    """The batched child-overlap must equal geo.overlap per box — the
    per-child short-circuit collapses to order-free booleans."""
    import numpy as np

    from geogeometry_spark.kernels import geometry as geo
    from geogeometry_spark.kernels.covering import (
        _box_rings,
        _overlap_boxes_vs_ring,
    )

    rng = np.random.default_rng(11)
    total = hits = 0
    for _ in range(100):
        k = int(rng.integers(3, 14))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.01, 0.3, k)
        cx, cy = rng.uniform(-50, 50, 2)
        ring = np.stack(
            [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
        )
        ring = np.vstack([ring, ring[:1]])
        c = 16
        w = cx + rng.uniform(-0.5, 0.4, c)
        e = w + rng.uniform(0.01, 0.3, c)
        s = cy + rng.uniform(-0.5, 0.4, c)
        n = s + rng.uniform(0.01, 0.3, c)
        got = _overlap_boxes_vs_ring(w, s, e, n, ring)
        boxes = _box_rings(w, s, e, n)
        want = np.array([geo.overlap(boxes[i], ring) for i in range(c)])
        assert (got == want).all()
        total += c
        hits += int(got.sum())
    assert 0 < hits < total  # both outcomes exercised
