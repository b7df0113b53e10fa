"""Batch polygon-pair intersects kernel for the overlay join hot path.

Bit-exact vectorization of the per-pair dispatch chain
``kernels.intersect.intersects(PolygonA, PolygonB)``
(geojson-intersect.kt:5-19 bbox gate -> :90-131 polygon matrix):

  result = bboxes_intersect
           AND ( any A-outer edge crosses any B-outer edge    # :55-88
                 OR any A-edge start inside B (hole-aware)    # :69-71
                 OR B.outer[0] inside A.outer                 # :113-122
                 OR A.outer[0] inside B.outer )

The fast path handles the dominant overlay shape — BOTH geometries a
single-ring Polygon whose combined longitude spread is <= 180 deg (so
the antimeridian normalization of geojson-intersect.kt:146-157 is the
identity and the shorter-arc bbox normalization of :21-53 reduces to a
plain interval test).  Everything else (holes, MultiPolygon, antimeridian
spans, degenerate rings) falls back to the per-pair reference dispatch,
so the batch result is equal to ``intersects`` row for row — pinned by
tests/test_overlay_batch.py against randomized and adversarial pairs.

Why this exists: the overlay join's boundary pairs are the only stage
that cannot resolve map-side from the covering; at 100 TB the pair
relation is billions of rows, and a per-pair ``json.loads`` + Python
dispatch (the generality UDF) is ~2k pairs/s/core.  This kernel does the
same predicate as padded numpy tensors (segments x segments crossing via
lines_cross_vec, per-row-ring ray casts) at ~2 orders of magnitude more
throughput, keeping the Arrow batch the unit of work.
"""

from __future__ import annotations

import numpy as np

from . import geometry as kgeo
from . import intersect as kx

# rows per vectorized chunk are sized so the (rows, segA, segB) crossing
# tensor stays ~2M float64 cells (~16 MB) regardless of ring size
_CROSS_CELL_BUDGET = 1 << 21


def _pad_rings(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length (m_i, 2) rings into (n, M, 2) by repeating
    each ring's LAST vertex.  Padded vertices duplicate a real vertex, so
    ring bbox / vertex-eps tests are unchanged, and every pad-derived
    edge is degenerate (zero length) — masked out of the crossing test
    and a no-op in the ray cast (nondegenerate / |dy|>=eps guards)."""
    n = len(rings)
    lens = np.fromiter((r.shape[0] for r in rings), dtype=np.int64, count=n)
    m = int(lens.max())
    out = np.empty((n, m, 2), dtype=np.float64)
    for i, r in enumerate(rings):
        k = r.shape[0]
        out[i, :k] = r
        if k < m:
            out[i, k:] = r[k - 1]
    return out, lens


def polygon_contains_batch(
    plat: np.ndarray, plon: np.ndarray, rings: np.ndarray, active=None
) -> np.ndarray:
    """Row-wise twin of kernels.geometry.polygon_contains: point i is
    tested against ring i (padded (n, M, 2) [lon, lat]).  Same op order
    as GeoGeometry.kt:237-295 — wrap-normalized ring lon, bbox early-out,
    eps=1e-9 vertex hit, segment-bbox edge hit, eastward ray cast with
    ``lat > lower && lat <= upper`` and ``xInt > 0`` odd parity."""
    n = plat.shape[0]
    out = np.zeros(n, dtype=bool)
    idx = np.flatnonzero(active) if active is not None else np.arange(n)
    if idx.size == 0:
        return out
    eps = 1e-9
    m = rings.shape[1]
    chunk = max(1, _CROSS_CELL_BUDGET // max(m, 1))
    for s in range(0, idx.size, chunk):
        sel = idx[s : s + chunk]
        pl = plat[sel][:, None]  # (c, 1)
        po = plon[sel][:, None]
        rx = rings[sel, :, 0]  # (c, m)
        ry = rings[sel, :, 1]
        nx = kgeo._wrap_longitude(rx - po)
        nx_next = np.roll(nx, -1, axis=1)
        ry_next = np.roll(ry, -1, axis=1)
        inside_bbox = (
            (ry.min(axis=1) <= pl[:, 0])
            & (pl[:, 0] <= ry.max(axis=1))
            & (nx.min(axis=1) <= 0.0)
            & (0.0 <= nx.max(axis=1))
        )
        vertex_hit = (
            (np.abs(ry - pl) < eps) & (np.abs(rx - po) < eps)
        ).any(axis=1)
        seg_minx = np.minimum(nx, nx_next)
        seg_maxx = np.maximum(nx, nx_next)
        seg_miny = np.minimum(ry, ry_next)
        seg_maxy = np.maximum(ry, ry_next)
        nondegenerate = (nx != nx_next) | (ry != ry_next)
        edge_hit = (
            nondegenerate
            & (seg_minx <= 0.0)
            & (0.0 <= seg_maxx)
            & (seg_miny <= pl)
            & (pl <= seg_maxy)
        ).any(axis=1)
        nonhoriz = np.abs(ry - ry_next) >= eps
        lower = np.minimum(ry, ry_next)
        upper = np.maximum(ry, ry_next)
        crossing = nonhoriz & (pl > lower) & (pl <= upper)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = nx + (pl - ry) * (nx_next - nx) / (ry_next - ry)
        hits = (crossing & (x_int > 0)).sum(axis=1)
        out[sel] = inside_bbox & (vertex_hit | edge_hit | (hits % 2 == 1))
    return out


def ring_array(r) -> np.ndarray:
    """One GeoJSON ring -> (m, 2|3) float64 array.  Arrow hands nested
    list columns to pandas UDFs as OBJECT ndarrays of per-point float
    arrays — ``np.asarray(r, float64)`` rejects that shape, so object
    rings go through one C-level concatenate instead."""
    a = np.asarray(r)
    if a.dtype == object:
        if len(a) == 0:
            return np.empty((0, 2), dtype=np.float64)
        k = len(a[0])
        a = np.concatenate(
            [np.asarray(p, dtype=np.float64) for p in a]
        ).reshape(-1, k)
    else:
        a = a.astype(np.float64, copy=False)
    if a.ndim != 2:
        raise ValueError("ring is not a point sequence")
    return a


def _rings_list(rings) -> list[np.ndarray] | None:
    """Normalize a Polygon coordinates value to [(m, 2|3) float64, ...];
    None when absent/malformed (quarantine posture)."""
    if rings is None or len(rings) == 0:
        return None
    try:
        return [ring_array(r) for r in rings]
    except (TypeError, ValueError, IndexError):
        return None


def _fast_eligible(rings: list[np.ndarray] | None) -> np.ndarray | None:
    """A geometry joins the fast path iff it is exactly one ring of >= 3
    distinct-slot points; returns the (m, 2) float ring or None."""
    if rings is None or len(rings) != 1:
        return None
    r = rings[0]
    if r.shape[0] < 3 or r.shape[1] not in (2, 3):
        return None
    if r.shape[1] == 3:
        r = r[:, :2]  # altitude is ignored by every 2D predicate
    if not np.isfinite(r).all():
        return None
    return r


def _slow_pair(ra: list[np.ndarray] | None, rb) -> bool:
    """Per-pair reference dispatch (quarantine posture on malformed
    input, mirroring functions.udfs.make_intersects_udf)."""
    if ra is None or rb is None:
        return False
    try:
        return kx.intersects(
            {"type": "Polygon", "coordinates": ra},
            {"type": "Polygon", "coordinates": rb},
        )
    except (ValueError, KeyError, TypeError, IndexError):
        return False


def polygon_pairs_intersect_batch(rings_a, rings_b) -> np.ndarray:
    """Vectorized Polygon-vs-Polygon intersects over N pairs.

    ``rings_a`` / ``rings_b``: length-N sequences, element i a GeoJSON
    Polygon coordinates value (list of rings, ring = [[lon, lat], ...]).
    Returns bool (N,).  Row-for-row equal to
    ``intersect.intersects({Polygon: a_i}, {Polygon: b_i})``.
    """
    n = len(rings_a)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out

    fa: list[np.ndarray] = []
    fb: list[np.ndarray] = []
    fidx: list[int] = []
    for i in range(n):
        la = _rings_list(rings_a[i])
        lb = _rings_list(rings_b[i])
        ra = _fast_eligible(la)
        rb = _fast_eligible(lb) if ra is not None else None
        if rb is None:
            out[i] = _slow_pair(la, lb)
            continue
        lons = (ra[:, 0].min(), ra[:, 0].max(), rb[:, 0].min(), rb[:, 0].max())
        if max(lons) - min(lons) > 180.0:
            # antimeridian normalization / shorter-arc bbox would kick
            # in — stay on the reference dispatch for exactness
            out[i] = _slow_pair(la, lb)
            continue
        fa.append(ra)
        fb.append(rb)
        fidx.append(i)

    if not fidx:
        return out

    A, na = _pad_rings(fa)  # (nf, Ma, 2)
    B, nb = _pad_rings(fb)
    idx = np.asarray(fidx, dtype=np.int64)
    nf = idx.size

    # bbox gate (geojson-intersect.kt:21-53; spread <= 180 => the
    # shorter-arc normalization is the identity => plain intervals)
    aw, ae = A[:, :, 0].min(axis=1), A[:, :, 0].max(axis=1)
    as_, an = A[:, :, 1].min(axis=1), A[:, :, 1].max(axis=1)
    bw, be = B[:, :, 0].min(axis=1), B[:, :, 0].max(axis=1)
    bs, bn = B[:, :, 1].min(axis=1), B[:, :, 1].max(axis=1)
    bbox_ok = ~((aw > be) | (ae < bw) | (an < bs) | (as_ > bn))

    res = np.zeros(nf, dtype=bool)
    sa = A.shape[1] - 1  # padded segment slots
    sb = B.shape[1] - 1
    va = np.arange(sa)[None, :] < (na - 1)[:, None]  # real A segments
    vb = np.arange(sb)[None, :] < (nb - 1)[:, None]

    # --- edge x edge crossing (lines_cross_vec, identity AM frame) ----
    live = np.flatnonzero(bbox_ok)
    chunk = max(1, _CROSS_CELL_BUDGET // max(sa * sb, 1))
    for s in range(0, live.size, chunk):
        sel = live[s : s + chunk]
        ax1 = A[sel, :-1, 0][:, :, None]
        ay1 = A[sel, :-1, 1][:, :, None]
        ax2 = A[sel, 1:, 0][:, :, None]
        ay2 = A[sel, 1:, 1][:, :, None]
        bx1 = B[sel, :-1, 0][:, None, :]
        by1 = B[sel, :-1, 1][:, None, :]
        bx2 = B[sel, 1:, 0][:, None, :]
        by2 = B[sel, 1:, 1][:, None, :]
        cross = kgeo.lines_cross_vec(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
        cross &= va[sel][:, :, None] & vb[sel][:, None, :]
        res[sel] = cross.any(axis=(1, 2))

    # --- A edge-start vertices inside B (contains, single ring =>
    # outer ray cast); loop over vertex SLOT, all rows at once ----------
    pending = bbox_ok & ~res
    for j in range(sa):  # slots 0..na-2 are segment starts
        if not pending.any():
            break
        act = pending & (j < (na - 1))
        if not act.any():
            continue
        hit = polygon_contains_batch(A[:, j, 1], A[:, j, 0], B, active=act)
        res |= hit
        pending &= ~hit

    # --- first-vertex containment shortcuts (:113-122) ----------------
    pending = bbox_ok & ~res
    if pending.any():
        res |= polygon_contains_batch(
            B[:, 0, 1], B[:, 0, 0], A, active=pending
        )

    out[idx] = res & bbox_ok
    return out
