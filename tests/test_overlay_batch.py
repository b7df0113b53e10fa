"""polygon_pairs_intersect_batch must equal the per-pair reference
dispatch (kernels.intersect.intersects) row for row — fast path,
fallback routing, and every adversarial shape we can think of."""

import numpy as np
import pytest

from geogeometry_spark.kernels import intersect as kx
from geogeometry_spark.kernels.overlay import (
    polygon_contains_batch,
    polygon_pairs_intersect_batch,
)
from geogeometry_spark.kernels import geometry as kgeo


def _ref(ra, rb):
    try:
        return kx.intersects(
            {"type": "Polygon", "coordinates": ra},
            {"type": "Polygon", "coordinates": rb},
        )
    except (ValueError, KeyError, TypeError, IndexError):
        return False


def _box(w, s, e, n):
    return [[[w, s], [e, s], [e, n], [w, n], [w, s]]]


def _check(pairs):
    got = polygon_pairs_intersect_batch(
        [a for a, _ in pairs], [b for _, b in pairs]
    )
    want = np.array([_ref(a, b) for a, b in pairs])
    mism = np.flatnonzero(got != want)
    assert mism.size == 0, (
        f"{mism.size} mismatches, first: pair {mism[0]}, "
        f"got {got[mism[0]]}, want {want[mism[0]]}, "
        f"a={pairs[mism[0]][0]}, b={pairs[mism[0]][1]}"
    )
    return got


def test_adversarial_pairs():
    tri = [[[0.0, 0.0], [4.0, 0.0], [2.0, 3.0], [0.0, 0.0]]]
    pairs = [
        (_box(0, 0, 2, 2), _box(1, 1, 3, 3)),        # partial overlap
        (_box(0, 0, 2, 2), _box(5, 5, 7, 7)),        # disjoint
        (_box(0, 0, 4, 4), _box(1, 1, 2, 2)),        # B inside A
        (_box(1, 1, 2, 2), _box(0, 0, 4, 4)),        # A inside B
        (_box(0, 0, 2, 2), _box(2, 2, 4, 4)),        # corner touch
        (_box(0, 0, 2, 2), _box(2, 0, 4, 2)),        # shared edge
        (_box(0, 0, 2, 2), _box(0, 0, 2, 2)),        # identical
        (_box(0, 0, 2, 2), _box(2.0000001, 0, 4, 2)),  # near-touch miss
        (tri, _box(1, -1, 3, 0.5)),                   # tri x box overlap
        (tri, _box(1, 4, 3, 5)),                      # tri x box miss
        # thin sliver crossing a box edge without containing vertices
        (_box(0, 0, 10, 10), [[[-1.0, 5.0], [11.0, 5.2], [11.0, 5.1],
                               [-1.0, 4.9], [-1.0, 5.0]]]),
        # degenerate 2-point "ring" (slow-path routing)
        ([[[0.0, 0.0], [3.0, 3.0]]], _box(1, 0, 2, 5)),
        # polygon with a hole (slow path): point-box inside the hole
        ([_box(0, 0, 10, 10)[0], _box(4, 4, 6, 6)[0]], _box(4.5, 4.5, 5, 5)),
        # same hole, B overlapping the solid part
        ([_box(0, 0, 10, 10)[0], _box(4, 4, 6, 6)[0]], _box(1, 1, 2, 2)),
        # antimeridian spread > 180 (slow-path routing)
        (_box(170, 0, 179, 5), _box(-179, 0, -170, 5)),
        (_box(-170, 0, -160, 5), _box(160, 0, 170, 5)),
        # altitude-bearing coordinates on the fast path
        ([[[0.0, 0.0, 1.0], [2.0, 0.0, 1.0], [2.0, 2.0, 1.0],
           [0.0, 2.0, 1.0], [0.0, 0.0, 1.0]]], _box(1, 1, 3, 3)),
    ]
    _check(pairs)


def test_vertical_horizontal_quirk_pairs():
    """The reference lines_cross checks only the y-range of the other
    segment when one is vertical — the bbox gate is what keeps far-away
    horizontal/vertical segments from reporting a cross.  The batch
    kernel must reproduce BOTH the quirk and the gate."""
    # vertical east edge of A at x=2; B's horizontal edges share y-range
    # but B is far east: bbox-disjoint -> both must say False
    pairs = [
        (_box(0, 0, 2, 10), _box(50, 3, 60, 4)),
        # bbox-overlapping L-shaped proximity: vertical edge of A at x=2,
        # horizontal edge of B at y=5 with x in [3, 6] — bboxes overlap
        # via other extents, the quirk fires inside the gate
        (_box(0, 0, 2, 10), _box(3, 5, 6, 12)),
        (_box(0, 0, 2, 10), _box(3, 5, 6, 7)),
    ]
    _check(pairs)


def test_randomized_boxes_match_reference():
    rng = np.random.default_rng(20260818)
    pairs = []
    for _ in range(600):
        cx, cy = rng.uniform(-30, 30, 2)
        w1, h1 = rng.uniform(0.1, 8, 2)
        dx, dy = rng.uniform(-6, 6, 2)
        w2, h2 = rng.uniform(0.1, 8, 2)
        pairs.append(
            (
                _box(cx - w1, cy - h1, cx + w1, cy + h1),
                _box(cx + dx - w2, cy + dy - h2, cx + dx + w2, cy + dy + h2),
            )
        )
    got = _check(pairs)
    # the generator must exercise both outcomes
    assert 50 < got.sum() < 550


def test_randomized_polygons_match_reference():
    rng = np.random.default_rng(7)
    pairs = []
    for _ in range(300):
        out = []
        for _ in range(2):
            k = int(rng.integers(3, 12))
            cx, cy = rng.uniform(-5, 5, 2)
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = rng.uniform(0.2, 4, k)
            ring = np.stack(
                [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
            )
            ring = np.vstack([ring, ring[:1]])
            out.append([ring.tolist()])
        pairs.append(tuple(out))
    got = _check(pairs)
    assert 20 < got.sum() < 280


def test_mixed_ring_lengths_one_batch():
    """Padding must stay exact when one batch mixes 4-vertex boxes with
    40-vertex blobs."""
    rng = np.random.default_rng(99)
    pairs = []
    for i in range(120):
        if i % 3 == 0:
            a = _box(*np.sort(rng.uniform(-10, 10, 2)).tolist(),
                     *np.sort(rng.uniform(-10, 10, 2)).tolist())
            # reorder: _box(w, s, e, n)
            xs = np.sort(rng.uniform(-10, 10, 2))
            ys = np.sort(rng.uniform(-10, 10, 2))
            a = _box(xs[0], ys[0], xs[1], ys[1])
        else:
            k = int(rng.integers(3, 40))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = rng.uniform(0.5, 6, k)
            cx, cy = rng.uniform(-4, 4, 2)
            ring = np.stack(
                [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
            )
            a = [np.vstack([ring, ring[:1]]).tolist()]
        xs = np.sort(rng.uniform(-10, 10, 2))
        ys = np.sort(rng.uniform(-10, 10, 2))
        pairs.append((a, _box(xs[0], ys[0], xs[1], ys[1])))
    _check(pairs)


def test_polygon_contains_batch_matches_per_row():
    rng = np.random.default_rng(3)
    rings, plat, plon = [], [], []
    for _ in range(200):
        k = int(rng.integers(3, 15))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.2, 5, k)
        cx, cy = rng.uniform(-20, 20, 2)
        ring = np.stack(
            [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
        )
        rings.append(np.vstack([ring, ring[:1]]))
        plon.append(cx + rng.uniform(-6, 6))
        plat.append(cy + rng.uniform(-6, 6))
    from geogeometry_spark.kernels.overlay import _pad_rings

    padded, _ = _pad_rings(rings)
    got = polygon_contains_batch(
        np.asarray(plat), np.asarray(plon), padded
    )
    want = np.array(
        [
            kgeo.polygon_contains(
                np.array([plat[i]]), np.array([plon[i]]), rings[i]
            )[0]
            for i in range(len(rings))
        ]
    )
    assert (got == want).all()
    assert 20 < got.sum() < 180


def test_empty_and_null_rows():
    got = polygon_pairs_intersect_batch([], [])
    assert got.shape == (0,)
    pairs = [(None, _box(0, 0, 1, 1)), ([], _box(0, 0, 1, 1))]
    got = polygon_pairs_intersect_batch(
        [a for a, _ in pairs], [b for _, b in pairs]
    )
    assert not got.any()
