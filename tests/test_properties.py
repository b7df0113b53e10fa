"""Hypothesis property tests — the reference's seeded-random round-trip
patterns (SURVEY.md §5) with shrinking: encode∘decode containment,
tile↔coord round trips, UTM round trips, wrap periodicity, neighbor
adjacency, haversine metric axioms."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geogeometry_spark.kernels import geohash as kgh
from geogeometry_spark.kernels import geometry as kg
from geogeometry_spark.kernels import tiles as kt
from geogeometry_spark.kernels import utm as ku

lats = st.floats(-89.9, 89.9, allow_nan=False)
lons = st.floats(-179.9, 179.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(1, 12))
def test_geohash_cell_contains_its_point(lat, lon, length):
    h = str(kgh.encode(lat, lon, length)[0])
    w, s, e, n = kgh.decode_bbox_scalar(h)
    assert s <= lat <= n
    assert w <= lon <= e


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_geohash_morton_equals_bisection(lat, lon):
    # The closed-form ceil index computes (v+lo)/span, which rounds; for
    # points within ~1e-13 deg of a cell edge it can land one cell off
    # the reference bisection (strict > on the raw value).  Outside that
    # hair-width band the two are identical.
    span_lat = 180.0 / (1 << 30)
    span_lon = 360.0 / (1 << 30)
    for v, lo, span in ((lat, 90.0, span_lat), (lon, 180.0, span_lon)):
        frac = ((v + lo) / span) % 1.0
        if min(frac, 1.0 - frac) * span < 1e-12:
            return
    assert kgh.encode(lat, lon, 12)[0] == kgh.encode_morton(lat, lon, 12)[0]


@settings(max_examples=200, deadline=None)
@given(st.floats(-85.0, 85.0, allow_nan=False), lons, st.integers(1, 22))
def test_tile_contains_its_point(lat, lon, zoom):
    # zoom 0 excluded: the reference's zoom-0 bbox is the verbatim
    # constant [-180, MAX_LAT, 180, MIN_LAT] (Tile.kt:99-101), i.e. its
    # south/north slots are swapped relative to every other zoom.
    # lat restricted to the Mercator domain: at the rounded clamp
    # constant +-85.05112878 the y formula lands a hair past 1.0 and
    # truncates to an out-of-range row — reference-identical behavior
    # (Tile.kt:222-226), so property-tested only in-domain, matching
    # TileTest.kt:42-81's random-coordinate range.
    x, y = kt.coordinate_to_tile(lat, lon, zoom)
    w, s, e, n = kt.tile_bbox(int(x[0]), int(y[0]), zoom)
    assert s - 1e-9 <= lat <= n + 1e-9
    if e > w:  # skip the antimeridian-wrap column
        assert w - 1e-9 <= lon <= e + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 20) - 1), st.integers(0, (1 << 20) - 1))
def test_quadkey_roundtrip(x, y):
    zoom = 20
    qk = str(kt.quadkey(x, y, zoom)[0])
    assert kt.from_quadkey(qk) == (x, y, zoom)
    qkl = int(kt.quadkey_long(x, y, zoom)[0])
    assert kt.from_quadkey_long(qkl, zoom) == (x, y, zoom)


@settings(max_examples=100, deadline=None)
@given(st.floats(-79.9, 83.9, allow_nan=False), lons)
def test_utm_roundtrip_under_1m(lat, lon):
    # subnormal |lat| excluded: toRadians underflows to -0.0 there, so
    # the reference's hemisphere test (phi < 0, utm.kt:376) disagrees
    # with its band letter (latitude < 0, utm.kt:194) — a faithful
    # reference bug (round trip breaks identically in Kotlin).
    if lat != 0.0 and abs(lat) < 1e-300:
        return
    z, letter, e, n = ku.to_utm(lat, lon)
    lon2, lat2 = ku.from_utm(z, letter, e, n)
    assert kg.haversine(
        np.array([lat]), np.array([lon]), lat2, lon2
    )[0] < 1.0


@settings(max_examples=200, deadline=None)
@given(st.floats(-1000, 1000, allow_nan=False))
def test_wrap_into_range(v):
    out = float(kg.wrap(v, -180.0, 180.0))
    assert -180.0 <= out < 180.0
    # periodicity: wrapping again is a fixed point
    assert float(kg.wrap(out, -180.0, 180.0)) == out


@settings(max_examples=100, deadline=None)
@given(lats, lons, lats, lons)
def test_haversine_metric(lat1, lon1, lat2, lon2):
    a = np.array([lat1]), np.array([lon1])
    b = np.array([lat2]), np.array([lon2])
    d_ab = kg.haversine(a[0], a[1], b[0], b[1])[0]
    d_ba = kg.haversine(b[0], b[1], a[0], a[1])[0]
    assert d_ab >= 0
    assert abs(d_ab - d_ba) < 1e-6
    assert kg.haversine(a[0], a[1], a[0], a[1])[0] == 0.0


@settings(max_examples=50, deadline=None)
@given(lats, lons)
def test_neighbors_share_edges(lat, lon):
    h = str(kgh.encode(lat, lon, 6)[0])
    w, s, e, n = kgh.decode_bbox_scalar(h)
    nb = kgh.neighbors_scalar(h)
    wn, sn, en, nn = kgh.decode_bbox_scalar(nb["north"])
    assert abs(sn - n) < 1e-9
    we, se, ee, ne = kgh.decode_bbox_scalar(nb["east"])
    if e < 180.0 - 1e-6:
        assert abs(we - e) < 1e-9


@given(st.integers(0, (1 << 22) - 1), st.integers(0, (1 << 22) - 1),
       st.integers(1, 22))
def test_tile_neighbor_involution_and_range(x, y, zoom):
    """Tile.kt:104-123 invariants: east/west are inverse (wrap), all
    neighbors stay on the zoom grid, north/south clamp at the rows."""
    from geogeometry_spark.kernels import tiles as kt

    n = 1 << zoom
    x, y = x % n, y % n
    nb = kt.neighbors(x, y, zoom)
    for (nx, ny, nz) in nb.values():
        assert nz == zoom and 0 <= nx < n and 0 <= ny < n
    ex, ey, _ = nb["east"]
    assert kt.neighbors(ex, ey, zoom)["west"][:2] == (x, y)
    wx, wy, _ = nb["west"]
    assert kt.neighbors(wx, wy, zoom)["east"][:2] == (x, y)
    # north/south invert except at the clamped rows
    nx_, ny_, _ = nb["north"]
    if y > 0:
        assert kt.neighbors(nx_, ny_, zoom)["south"][:2] == (x, y)
    else:
        assert (nx_, ny_) == (x, 0)
    sx, sy, _ = nb["south"]
    if y < n - 1:
        assert kt.neighbors(sx, sy, zoom)["north"][:2] == (x, y)
    else:
        assert (sx, sy) == (x, n - 1)


@given(st.text(max_size=60))
def test_url_encode_matches_stdlib_rfc3986(s):
    """The reference byte-loop percent-encode (json-helpers.kt:17-33)
    must agree with urllib.parse.quote(safe='-._~') — an independent
    RFC 3986 implementation — on arbitrary unicode."""
    import urllib.parse

    from geogeometry_spark.kernels.intersect import url_encode

    assert url_encode(s) == urllib.parse.quote(s, safe="-._~")


@given(lats, lons, lats, lons)
def test_on_line_segment_endpoints(lat1, lon1, lat2, lon2):
    """Segment endpoints always lie on the segment (geojson.kt:202-213)."""
    from geogeometry_spark.kernels.intersect import on_line_segment

    a, b = [lon1, lat1], [lon2, lat2]
    assert on_line_segment(a, a, b)
    assert on_line_segment(b, a, b)


@given(st.floats(-80.0, 80.0, allow_nan=False), st.floats(-170.0, 170.0, allow_nan=False),
       st.floats(-80.0, 80.0, allow_nan=False), st.floats(-170.0, 170.0, allow_nan=False))
def test_vincenty_close_to_haversine(lat1, lon1, lat2, lon2):
    """Ellipsoidal and spherical distances agree within ~0.6% (the
    WGS84 flattening bound) away from poles/antipodes."""
    import numpy as np

    from geogeometry_spark.kernels.geometry import haversine_scalar
    from geogeometry_spark.kernels.vincenty import vincenty_distance

    # reference bug-parity (vicenty.kt:106-110): when BOTH points are
    # within float rounding of the equator but not exactly on it,
    # cosSqAlpha can round to exactly 0 with sinU1*sinU2 != 0, making
    # cos2SigmaM -inf (the reference guards only NaN) and the distance
    # NaN — the reference's own equatorial-line limitation, kept
    # faithful, so the property skips that regime
    if abs(lat1) < 1e-4 and abs(lat2) < 1e-4:
        return
    h = haversine_scalar(lat1, lon1, lat2, lon2)
    if h < 1000.0 or h > 1.9e7:  # degenerate / near-antipodal
        return
    v = float(vincenty_distance(lat1, lon1, lat2, lon2)[0])
    assert abs(v - h) / h < 0.0075


# --------------------------------------------------------------------------
# S2 (SURVEY §2.4bis): scheme invariants under shrinking
# --------------------------------------------------------------------------

from geogeometry_spark.kernels import s2 as ks2  # noqa: E402

full_lats = st.floats(-90.0, 90.0, allow_nan=False)
full_lons = st.floats(-180.0, 180.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(full_lats, full_lons, st.integers(0, 30))
def test_s2_center_reencodes_to_same_cell(lat, lon, level):
    c = ks2.cell_id(lat, lon, level)
    clat, clng = ks2.center_latlng(c)
    assert ks2.cell_id(float(clat[0]), float(clng[0]), level)[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(full_lats, full_lons, st.integers(0, 29), st.integers(1, 30))
def test_s2_ancestor_range_contains_descendant(lat, lon, anc_level, extra):
    child_level = min(30, anc_level + extra)
    anc = ks2.cell_id(lat, lon, anc_level)
    child = ks2.cell_id(lat, lon, child_level)
    assert ks2.contains(anc, child)[0]
    assert ks2.parent(child, anc_level)[0] == anc[0]


@settings(max_examples=200, deadline=None)
@given(full_lats, full_lons)
def test_s2_token_roundtrip_property(lat, lon):
    c = ks2.cell_id(lat, lon, 30)
    assert ks2.token_to_id(ks2.token(c))[0] == c[0]


@settings(max_examples=100, deadline=None)
@given(full_lats, full_lons, st.floats(100.0, 1_000_000.0, allow_nan=False))
def test_s2_cap_covering_covers_the_center(lat, lon, radius_m):
    level = ks2.suitable_level(radius_m)
    ids, interior = ks2.cap_covering(lat, lon, radius_m, level)
    assert len(ids) >= 1
    center_cell = ks2.cell_id(lat, lon, level)
    assert center_cell[0] in set(int(i) for i in ids)


# --- round-3 additions ------------------------------------------------

s2_lats = st.floats(-85.0, 85.0, allow_nan=False)
s2_lons = st.floats(-179.9, 179.9, allow_nan=False)


@settings(max_examples=100, deadline=None)
@given(s2_lats, s2_lons, st.integers(0, 30))
def test_s2_parent_of_leaf_equals_direct_encode(lat, lon, level):
    from geogeometry_spark.kernels import s2 as ks2

    leaf = ks2.cell_id(lat, lon, 30)
    assert ks2.parent(leaf, level)[0] == ks2.cell_id(lat, lon, level)[0]
    assert int(ks2.level(ks2.parent(leaf, level))[0]) == level


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-10.0, 10.0, allow_nan=False),
            st.floats(-10.0, 10.0, allow_nan=False),
        ),
        min_size=4,
        max_size=9,
        unique=True,
    )
)
def test_remove_self_intersections_vertex_preserving(pts):
    """The untangle swap only reverses sub-runs: the vertex SET is
    invariant and the ring stays closed (reference concave-hull.kt
    semantics — full untangling is only guaranteed within the
    iteration cap, so we assert the invariants, not simplicity)."""
    from geogeometry_spark.kernels.concave_hull import (
        remove_self_intersections,
    )

    fixed = remove_self_intersections(pts, max_iterations=50)
    assert (fixed[0] == fixed[-1]).all()
    assert {tuple(p) for p in fixed} == {(float(a), float(b)) for a, b in pts}


@settings(max_examples=60, deadline=None)
@given(
    st.recursive(
        st.one_of(st.none(), st.floats(allow_nan=False), st.integers(-9, 9)),
        lambda kids: st.lists(kids, max_size=3),
        max_leaves=12,
    )
)
def test_deep_equals_reflexive(x):
    from geogeometry_spark.operators.geojson import deep_equals

    assert deep_equals(x, x)


# --- winnowing batch kernel vs per-doc reference ---------------------------


def _winnow_doc_reference(txt: str, k: int, w: int):
    """Slow per-doc rolling-hash winnowing — the spec the batch-wide
    vectorized kernel (boundary masking, global argmin reuse) must
    match exactly."""
    b = txt.encode("utf-8")
    if len(b) < k + w - 1:
        return set()
    B = 1099511628211
    M = 1 << 64
    h = []
    for i in range(len(b) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc + b[i + j] * pow(B, k - 1 - j, M)) % M
        h.append(acc)
    sel = set()
    for s in range(len(h) - w + 1):
        window = h[s : s + w]
        a = min(range(w), key=lambda j: (window[j], j))
        val = h[s + a]
        sel.add((s + a, val if val < (1 << 63) else val - M))
    return sel


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=60,
        ),
        min_size=0,
        max_size=8,
    ),
    st.integers(2, 6),
    st.integers(2, 5),
)
def test_winnow_batch_matches_per_doc_reference(texts, k, w):
    from geogeometry_spark.operators.text import winnow_batch

    ids = list(range(len(texts)))
    out_ids, out_pos, out_h = winnow_batch(ids, texts, k, w)
    got = {}
    for i, p, h in zip(out_ids, out_pos, out_h):
        got.setdefault(int(i), set()).add((int(p), int(h)))
    for i, txt in enumerate(texts):
        assert got.get(i, set()) == _winnow_doc_reference(txt, k, w), (
            i,
            txt,
            k,
            w,
        )
