"""S2 cell-id kernels (quadratic projection, Hilbert curve order).

The reference library indexes space with geohash (GeoHashUtils.kt) and
slippy tiles (Tile.kt); the north-star rule additionally names an
"H3/S2 index" as the cell-index family for the engine.  This module
implements the public S2 cell-id scheme from its published algorithm
(s2geometry.io / "S2 cells" docs): unit sphere -> cube face ->
quadratic ST transform -> 2^30 x 2^30 leaf grid per face -> Hilbert
curve position, packed into a 64-bit id

    id = face(3 bits) . hilbert_position(2*level bits) . 1 . 0...0

Ids follow the standard convention of the Java/Go S2 ports: the uint64
value is stored two's-complement-wrapped in a signed int64 (faces 4-5
wrap negative); ``sortable`` flips the sign bit so signed comparisons
give unsigned cell order (needed for range scans over a sorted column).

Everything is numpy-vectorized; scalar convenience wrappers are given
for driver-side planning.  No code is taken from any S2 library; the
lookup-table construction follows the published algorithm description.
"""

from __future__ import annotations

import math

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

# Hilbert sub-cell traversal order per orientation: position -> (i,j)
# packed as 2-bit ij = i*2+j.
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped + inverted
)
# orientation adjustment picked up entering each sub-cell position
POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK + _SWAP_MASK)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """lookup_pos[(ij16 << 2) | orient] = (pos8 << 2) | orient' and the
    inverse lookup_ij — 4 curve levels (8 bits of i/j) per step."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for index in range(4):
            init(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ POS_TO_ORIENTATION[index],
            )

    for orient in (0, _SWAP_MASK, _INVERT_MASK, _SWAP_MASK | _INVERT_MASK):
        init(0, 0, 0, orient, 0, orient)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup()


def _as1d(x) -> np.ndarray:
    return np.atleast_1d(np.asarray(x, dtype=np.float64))


# --------------------------------------------------------------------------
# sphere -> face/u/v -> s/t -> i/j
# --------------------------------------------------------------------------

def xyz_from_latlng(lat, lon):
    """Unit-sphere direction from degrees."""
    phi = _as1d(lat) * (math.pi / 180.0)
    theta = _as1d(lon) * (math.pi / 180.0)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def face_from_xyz(x, y, z) -> np.ndarray:
    """Largest-|component| cube face: 0..2 = +x,+y,+z; 3..5 = -x,-y,-z."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, (x, y, z))
    return np.where(comp < 0.0, face + 3, face).astype(np.int64)


def uv_from_xyz(face, x, y, z):
    """Gnomonic (u, v) on the given face."""
    face = np.asarray(face)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    m = face == 0
    u[m], v[m] = (y[m] / x[m], z[m] / x[m])
    m = face == 1
    u[m], v[m] = (-x[m] / y[m], z[m] / y[m])
    m = face == 2
    u[m], v[m] = (-x[m] / z[m], -y[m] / z[m])
    m = face == 3
    u[m], v[m] = (z[m] / x[m], y[m] / x[m])
    m = face == 4
    u[m], v[m] = (z[m] / y[m], -x[m] / y[m])
    m = face == 5
    u[m], v[m] = (-y[m] / z[m], -x[m] / z[m])
    return u, v


def st_from_uv(u):
    """Quadratic projection: cell areas within ~2.1x of each other."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def uv_from_st(s):
    """Inverse quadratic projection."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def ij_from_st(s) -> np.ndarray:
    """Leaf-grid index: floor(s * 2^30) clamped to [0, 2^30 - 1]."""
    ij = np.floor(np.asarray(s, dtype=np.float64) * (1 << MAX_LEVEL))
    return np.clip(ij, 0, (1 << MAX_LEVEL) - 1).astype(np.int64)


# --------------------------------------------------------------------------
# (face, i, j) <-> cell id
# --------------------------------------------------------------------------

def cell_id_from_face_ij(face, i, j, level: int = MAX_LEVEL) -> np.ndarray:
    """Hilbert-encode leaf (i, j) on ``face``; truncate to ``level``.

    uint64 math throughout, returned bit-cast to int64 (Java-port
    convention; faces 4-5 wrap negative)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = face & np.uint64(_SWAP_MASK)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    lookup = LOOKUP_POS.astype(np.uint64)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = lookup[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level < MAX_LEVEL:
        lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
        leaf = (leaf & (~lsb + np.uint64(1))) | lsb
    return leaf.view(np.int64)


def face_ij_from_cell_id(cell_id):
    """(face, i, j, orientation) of the cell id (leaf i/j of its min
    corner-curve position, per the published decode loop).

    Orientation carries the canonical non-leaf correction (the decode
    loop walks all 30 levels, which over-rotates ids whose level has
    opposite parity — the published fix XORs SWAP_MASK whenever the lsb
    has a bit in 0x1111111111111110; ADVICE r2)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(_SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    lookup = LOOKUP_IJ.astype(np.uint64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += (
            (cid >> np.uint64(k * 2 * _LOOKUP_BITS + 1))
            & np.uint64((1 << (2 * nbits)) - 1)
        ) << np.uint64(2)
        bits = lookup[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(
            k * _LOOKUP_BITS
        )
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    low = cid & (~cid + np.uint64(1))
    correct = (low & np.uint64(0x1111111111111110)) != 0
    bits = bits ^ (correct.astype(np.uint64) * np.uint64(_SWAP_MASK))
    return face, i.view(np.int64), j.view(np.int64), bits.view(np.int64)


def cell_id(lat, lon, level: int = MAX_LEVEL) -> np.ndarray:
    """lat/lng degrees -> S2 cell id at ``level`` (int64, wrapped)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = xyz_from_latlng(lat, lon)
    face = face_from_xyz(x, y, z)
    u, v = uv_from_xyz(face, x, y, z)
    i = ij_from_st(st_from_uv(u))
    j = ij_from_st(st_from_uv(v))
    return cell_id_from_face_ij(face, i, j, level)


# --------------------------------------------------------------------------
# id algebra: level / parent / children / ranges / tokens
# --------------------------------------------------------------------------

def lsb(cell_id) -> np.ndarray:
    """Lowest set bit (uint64 semantics)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    return (cid & (~cid + np.uint64(1))).view(np.int64)


def level(cell_id) -> np.ndarray:
    """Cell level: 30 - (trailing zero count / 2).  The sentinel/invalid
    id 0 (no set bit) returns -1 instead of emitting divide-by-zero
    warnings and garbage (ADVICE r2)."""
    low = lsb(cell_id).view(np.uint64).astype(np.float64)
    # lsb = 2^(2*(30-level)); float64 holds 2^61 exactly (power of two),
    # and frexp's exponent (= log2 + 1 for powers of two) avoids
    # np.log2(0) warnings for the id-0 row
    tz = np.frexp(low)[1].astype(np.int64) - 1
    return np.where(low == 0.0, -1, MAX_LEVEL - (tz >> 1)).astype(np.int64)


def parent(cell_id, parent_level: int) -> np.ndarray:
    """Ancestor at ``parent_level`` (caller ensures it is <= cell level)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - parent_level)))
    return ((cid & (~new_lsb + np.uint64(1))) | new_lsb).view(np.int64)


def children(cell_id) -> np.ndarray:
    """The 4 children, curve-ordered: shape (..., 4)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    old = cid & (~cid + np.uint64(1))
    new = old >> np.uint64(2)
    starts = cid - old + new
    offs = np.arange(4, dtype=np.uint64)[np.newaxis, :] * (
        np.uint64(2) * new
    )[:, np.newaxis]
    return (starts[:, np.newaxis] + offs).view(np.int64)


def range_min(cell_id) -> np.ndarray:
    """Smallest leaf id contained in the cell."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    low = cid & (~cid + np.uint64(1))
    return (cid - low + np.uint64(1)).view(np.int64)


def range_max(cell_id) -> np.ndarray:
    """Largest leaf id contained in the cell."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    low = cid & (~cid + np.uint64(1))
    return (cid + low - np.uint64(1)).view(np.int64)


def sortable(cell_id) -> np.ndarray:
    """Sign-bit flip: signed order of the result == unsigned cell order.
    Use for ORDER BY / BETWEEN over ids that may sit on faces 4-5."""
    return np.atleast_1d(np.asarray(cell_id, dtype=np.int64)) ^ np.int64(-(1 << 63))


def contains(ancestor_id, cell) -> np.ndarray:
    """ancestor contains cell (range nesting, unsigned compare)."""
    return (sortable(range_min(ancestor_id)) <= sortable(cell)) & (
        sortable(cell) <= sortable(range_max(ancestor_id))
    )


def token(cell_id) -> np.ndarray:
    """Canonical hex token: 16 hex digits of the uint64, trailing zeros
    stripped ('X' for id 0)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    out = np.empty(cid.shape[0], dtype=object)
    for idx, v in enumerate(cid):
        if v == 0:
            out[idx] = "X"
        else:
            out[idx] = f"{int(v):016x}".rstrip("0")
    return out.astype("U16")


def token_to_id(tok) -> np.ndarray:
    toks = np.atleast_1d(np.asarray(tok, dtype="U16"))
    out = np.empty(toks.shape[0], dtype=np.uint64)
    for idx, t in enumerate(toks):
        out[idx] = 0 if t == "X" else int(t.ljust(16, "0"), 16)
    return out.view(np.int64)


# --------------------------------------------------------------------------
# center decode (id -> lat/lng)
# --------------------------------------------------------------------------

def center_st(cell_id):
    """(face, s, t) of the cell center on the 2^31 si/ti grid."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    face, i, j, _ = face_ij_from_cell_id(cell_id)
    is_leaf = (cid & np.uint64(1)).astype(bool)
    # published center rule: leaf centers sit at odd si/ti (delta=1); a
    # non-leaf id decodes to the leaf at curve position "10..0" inside
    # itself, which is offset (0,0) or (1,1) from the cell center's
    # leaf-pair depending on orientation parity -> delta 2 or 0.
    parity = ((i.view(np.uint64) ^ (cid >> np.uint64(2))) & np.uint64(1)).view(
        np.int64
    )
    delta = np.where(is_leaf, 1, np.where(parity != 0, 2, 0)).astype(np.int64)
    si = 2 * i + delta
    ti = 2 * j + delta
    scale = 1.0 / (1 << (MAX_LEVEL + 1))
    return face, si.astype(np.float64) * scale, ti.astype(np.float64) * scale


def xyz_from_face_uv(face, u, v):
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    ones = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [ones, -u, -u, -ones, v],
        default=v,
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [u, ones, -v, -v, -ones],
        default=u,
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [v, v, ones, -u, -u],
        default=-ones,
    )
    return x, y, z


def center_latlng(cell_id):
    """(lat, lng) degrees of the cell center."""
    face, s, t = center_st(cell_id)
    u = uv_from_st(s)
    v = uv_from_st(t)
    x, y, z = xyz_from_face_uv(face, u, v)
    lat = np.arctan2(z, np.sqrt(x * x + y * y)) * (180.0 / math.pi)
    lng = np.arctan2(y, x) * (180.0 / math.pi)
    return lat, lng


# --------------------------------------------------------------------------
# spherical-cap covering (the S2 analogue of geoHashesForCircle,
# GeoHashUtils.kt:829-843): driver-side planning, output = broadcast
# join build side
# --------------------------------------------------------------------------

from .geometry import EARTH_RADIUS_METERS  # noqa: E402  GeoGeometry.kt:62
# (single definition — cap_angle below MUST use the same sphere radius
# as the haversine re-check in s2_radius_join, or "conservative
# covering" silently stops being conservative)


def suitable_level(radius_m: float) -> int:
    """Largest level whose cell edge is still >= ~radius/2 — keeps a cap
    covering at a few dozen cells.  Face edge spans 90 deg, so edge at
    level l ~ (pi/2) * R / 2^l meters."""
    if radius_m <= 0:
        return MAX_LEVEL
    l = int(math.floor(math.log2((math.pi / 2) * EARTH_RADIUS_METERS / radius_m))) + 1
    return max(0, min(MAX_LEVEL, l))


def _cell_geom(face: int, lvl: int, ic: int, jc: int):
    """(unit center xyz, circumradius angle) of cell (face, lvl, ic, jc).

    Cells are spherical quads with great-circle edges; the geodesic
    distance from the center to any cell point is maximized at a corner
    (distance along a geodesic edge is quasi-convex), so the max corner
    angle is a true circumradius."""
    shift = MAX_LEVEL - lvl
    s_lo = (ic << shift) / float(1 << MAX_LEVEL)
    s_hi = ((ic + 1) << shift) / float(1 << MAX_LEVEL)
    t_lo = (jc << shift) / float(1 << MAX_LEVEL)
    t_hi = ((jc + 1) << shift) / float(1 << MAX_LEVEL)
    s_c = (s_lo + s_hi) / 2.0
    t_c = (t_lo + t_hi) / 2.0
    ss = np.array([s_c, s_lo, s_lo, s_hi, s_hi])
    tt = np.array([t_c, t_lo, t_hi, t_lo, t_hi])
    x, y, z = xyz_from_face_uv(
        np.full(5, face, dtype=np.int64), uv_from_st(ss), uv_from_st(tt)
    )
    norm = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / norm, y / norm, z / norm
    dots = np.clip(x[0] * x[1:] + y[0] * y[1:] + z[0] * z[1:], -1.0, 1.0)
    circ = float(np.max(np.arccos(dots)))
    return (float(x[0]), float(y[0]), float(z[0])), circ


def cap_covering(
    lat: float,
    lon: float,
    radius_m: float,
    level: int | None = None,
    max_cells: int = 4096,
):
    """Level-``level`` cells intersecting the spherical cap — a
    conservative superset (never a false negative): a cell is kept iff
    angle(cell_center, cap_center) <= cap_angle + circumradius.

    Returns (ids int64 array, interior bool array); ``interior`` cells
    lie entirely inside the cap (distance re-check skippable).

    ``max_cells`` fails fast (mirroring polygon_covering; ADVICE r2)
    when radius_m is oversized for ``level`` — the covering grows as
    ~(2r/edge)^2 cells, so e.g. a 250 km cap at level 12 would silently
    enumerate ~40k+ cells per query inside a worker otherwise.
    """
    if level is None:
        level = suitable_level(radius_m)
    cx, cy, cz = (float(v[0]) for v in xyz_from_latlng(lat, lon))
    cap_angle = radius_m / EARTH_RADIUS_METERS
    out_ids: list[int] = []
    out_interior: list[bool] = []

    def emit(face: int, lvl: int, ic: int, jc: int, interior: bool) -> None:
        if lvl == level:
            if len(out_ids) >= max_cells:
                raise ValueError(
                    f"cap covering exceeds max_cells={max_cells} "
                    f"(radius_m={radius_m}, level={level}); lower `level` "
                    "or raise `max_cells`"
                )
            cid = cell_id_from_face_ij(
                np.array([face]),
                np.array([ic << (MAX_LEVEL - lvl)]),
                np.array([jc << (MAX_LEVEL - lvl)]),
                lvl,
            )
            out_ids.append(int(cid[0]))
            out_interior.append(interior)
            return
        for di in (0, 1):
            for dj in (0, 1):
                if interior:
                    emit(face, lvl + 1, 2 * ic + di, 2 * jc + dj, True)
                else:
                    rec(face, lvl + 1, 2 * ic + di, 2 * jc + dj)

    def rec(face: int, lvl: int, ic: int, jc: int) -> None:
        (x, y, z), circ = _cell_geom(face, lvl, ic, jc)
        d = math.acos(max(-1.0, min(1.0, x * cx + y * cy + z * cz)))
        if d > cap_angle + circ:
            return  # provably disjoint
        if d + circ <= cap_angle:
            emit(face, lvl, ic, jc, True)  # provably contained
            return
        if lvl == level:
            emit(face, lvl, ic, jc, False)
            return
        for di in (0, 1):
            for dj in (0, 1):
                rec(face, lvl + 1, 2 * ic + di, 2 * jc + dj)

    for face in range(6):
        rec(face, 0, 0, 0)
    return np.array(out_ids, dtype=np.int64), np.array(out_interior, dtype=bool)


# --------------------------------------------------------------------------
# polygon covering (the S2 analogue of geoHashesForPolygon,
# GeoHashUtils.kt:442-607): driver-side planning, broadcast build side
# --------------------------------------------------------------------------

def _cell_corners_latlng(face: int, lvl: int, ic: int, jc: int):
    """(lats, lons) of the 4 exact cell corners, curve order irrelevant."""
    shift = MAX_LEVEL - lvl
    s_lo = (ic << shift) / float(1 << MAX_LEVEL)
    s_hi = ((ic + 1) << shift) / float(1 << MAX_LEVEL)
    t_lo = (jc << shift) / float(1 << MAX_LEVEL)
    t_hi = ((jc + 1) << shift) / float(1 << MAX_LEVEL)
    ss = np.array([s_lo, s_lo, s_hi, s_hi])
    tt = np.array([t_lo, t_hi, t_lo, t_hi])
    x, y, z = xyz_from_face_uv(
        np.full(4, face, dtype=np.int64), uv_from_st(ss), uv_from_st(tt)
    )
    lat = np.arctan2(z, np.sqrt(x * x + y * y)) * (180.0 / math.pi)
    lng = np.arctan2(y, x) * (180.0 / math.pi)
    return lat, lng


def _wrap_deg(d):
    return (np.asarray(d) + 180.0) % 360.0 - 180.0


def polygon_covering(
    rings: list, level: int | None = None, max_cells: int = 8192
):
    """Level-``level`` cells intersecting the polygon (outer ring +
    holes, each (m, 2) [lon, lat]) with an ``is_border`` flag.

    Conservative by construction: each candidate cell is replaced by the
    padded axis-aligned lat/lng bbox of its exact corners, where the pad
    (sagitta bound theta^2/4 radians, lon scaled by 1/cos lat) covers
    how far the true great-circle cell edges can bow away from the
    corner chords.  bbox disjoint from the polygon => the cell is
    provably disjoint; bbox fully inside the outer ring and clear of
    every hole => the cell is provably interior (no re-check needed);
    anything else is border and gets the exact ray-cast downstream —
    the same splitAndFilter contract as the geohash covering
    (GeoHashUtils.kt:609-645).

    Like the reference covering, polar (|lat| > 89.5) and
    antimeridian-crossing polygons are rejected; cell corner longitudes
    are normalized into the polygon's frame so cells straddling +-180
    classify correctly against a non-crossing polygon.
    """
    from . import geometry as kgeo

    outer = np.asarray(rings[0], dtype=np.float64)
    holes = [np.asarray(h, dtype=np.float64) for h in rings[1:]]
    if np.abs(outer[:, 1]).max() > 89.5:
        raise ValueError("polar polygons are not supported (reference parity)")
    lon_span = outer[:, 0].max() - outer[:, 0].min()
    if lon_span > 180.0:
        raise ValueError("antimeridian-crossing polygons are not supported")
    frame_lon = float(outer[:, 0].mean())

    w, s, e, n = (
        outer[:, 0].min(), outer[:, 1].min(),
        outer[:, 0].max(), outer[:, 1].max(),
    )
    if level is None:
        diag_m = kgeo.haversine_scalar(s, w, n, e)
        level = suitable_level(max(diag_m, 1.0) / 3.0)

    # rings arrive closed (first == last) per the GeoJSON convention, so
    # consecutive-pair iteration covers every edge
    all_rings = [outer] + holes

    # Per-ring edge bboxes, precomputed vectorized.  The BOUNDARY the
    # covering must respect is the reference's, and polygonContains
    # accepts any point inside an edge's axis-aligned segment bbox (the
    # onSegment shortcut, GeoGeometry.kt:268-274/682-690) — i.e. the
    # effective polygon is fattened by those bboxes.  Classifying
    # "border" whenever a segment bbox overlaps the rect (a superset of
    # true edge crossings) therefore (a) never misses a crossing — the
    # gradient linesCross provably does for near-axis edges — and
    # (b) covers the reference's edge-accept halo, so interior/disjoint
    # verdicts agree with the oracle's fattened semantics exactly.
    _edges = []
    for _r in all_rings:
        _x1, _y1 = _r[:-1, 0], _r[:-1, 1]
        _x2, _y2 = _r[1:, 0], _r[1:, 1]
        _edges.append(
            (
                np.minimum(_x1, _x2), np.maximum(_x1, _x2),
                np.minimum(_y1, _y2), np.maximum(_y1, _y2),
            )
        )

    # flatten every ring's edge bboxes into one (E,) set for the batch
    # border test
    _exl = np.concatenate([e_[0] for e_ in _edges])
    _exh = np.concatenate([e_[1] for e_ in _edges])
    _eyl = np.concatenate([e_[2] for e_ in _edges])
    _eyh = np.concatenate([e_[3] for e_ in _edges])

    out_id_chunks: list[np.ndarray] = []
    out_border_chunks: list[np.ndarray] = []
    emitted = 0

    def emit(faces_e, ics_e, jcs_e, lvl, border):
        """Emit cells (already AT the target level) in one batch."""
        nonlocal emitted
        if faces_e.size == 0:
            return
        emitted += faces_e.size
        if emitted > max_cells:
            raise ValueError(
                f"covering exceeds max_cells={max_cells}; lower `level`"
            )
        shift = MAX_LEVEL - lvl
        out_id_chunks.append(
            cell_id_from_face_ij(
                faces_e, ics_e << shift, jcs_e << shift, lvl
            )
        )
        out_border_chunks.append(
            np.broadcast_to(border, faces_e.shape).astype(bool)
            if np.isscalar(border)
            else border
        )

    def emit_block(face_i, lvl, ic, jc):
        """All level-``level`` descendants of one interior cell."""
        d = level - lvl
        side = 1 << d
        base_i, base_j = ic << d, jc << d
        ii, jj = np.meshgrid(
            base_i + np.arange(side, dtype=np.int64),
            base_j + np.arange(side, dtype=np.int64),
            indexing="ij",
        )
        emit(
            np.full(side * side, face_i, dtype=np.int64),
            ii.ravel(),
            jj.ravel(),
            level,
            False,
        )

    # Frontier sweep: one vectorized pass per LEVEL instead of one
    # Python call per CELL — identical verdicts to the former recursion
    # (tests pin conservativeness vs the reference contains), ~100x
    # less per-cell overhead; a 10k-polygon covering batch is dominated
    # by numpy, not the interpreter.
    faces = np.arange(6, dtype=np.int64)
    ics = np.zeros(6, dtype=np.int64)
    jcs = np.zeros(6, dtype=np.int64)
    two30 = float(1 << MAX_LEVEL)

    for lvl in range(level + 1):
        if faces.size == 0:
            break
        shift = MAX_LEVEL - lvl
        s_lo = (ics << shift) / two30
        s_hi = ((ics + 1) << shift) / two30
        t_lo = (jcs << shift) / two30
        t_hi = ((jcs + 1) << shift) / two30
        s_c = (s_lo + s_hi) / 2.0
        t_c = (t_lo + t_hi) / 2.0

        # latitude reject FIRST, from the TRUE spherical bound: every
        # cell point lies within angular distance `circ` of the cell
        # center (max corner angle = circumradius; corner latitudes are
        # NOT a bound — the polar face's interior reaches the pole).
        # 9 sample points per cell: center + 4 corners (x2 usage below)
        ss = np.stack([s_c, s_lo, s_lo, s_hi, s_hi], axis=1)  # (C,5)
        tt = np.stack([t_c, t_lo, t_hi, t_lo, t_hi], axis=1)
        fx = np.repeat(faces, 5)
        x, y, z = xyz_from_face_uv(
            fx, uv_from_st(ss.ravel()), uv_from_st(tt.ravel())
        )
        norm = np.sqrt(x * x + y * y + z * z)
        x, y, z = (x / norm).reshape(-1, 5), (y / norm).reshape(-1, 5), (
            z / norm
        ).reshape(-1, 5)
        dots = np.clip(
            x[:, :1] * x[:, 1:] + y[:, :1] * y[:, 1:] + z[:, :1] * z[:, 1:],
            -1.0,
            1.0,
        )
        circ_deg = np.degrees(np.arccos(dots).max(axis=1))
        lat_center = np.degrees(np.arctan2(z[:, 0], np.hypot(x[:, 0], y[:, 0])))
        band_lo, band_hi = lat_center - circ_deg, lat_center + circ_deg
        keep = ~((band_hi < s) | (band_lo > n))
        if not keep.any():
            break
        faces, ics, jcs = faces[keep], ics[keep], jcs[keep]
        band_lo, band_hi = band_lo[keep], band_hi[keep]
        lat_c = np.degrees(
            np.arctan2(z[keep, 1:], np.hypot(x[keep, 1:], y[keep, 1:]))
        )
        lon_c = np.degrees(np.arctan2(y[keep, 1:], x[keep, 1:]))

        # sagitta bound: great-circle edges bow <= theta^2/4 rad off the
        # corner chords; lon pad scales by the worst meridian
        # convergence over the cell's whole lat band (no cos floor)
        theta = (math.pi / 2) / (1 << lvl)
        pad_lat = (theta * theta / 4.0) * (180.0 / math.pi)
        abs_band = np.minimum(
            89.999, np.maximum(np.abs(band_lo), np.abs(band_hi))
        )
        pad_lon = pad_lat / np.maximum(1e-9, np.cos(np.radians(abs_band)))
        lon_adj = frame_lon + _wrap_deg(lon_c - frame_lon)
        bw = lon_adj.min(axis=1) - pad_lon
        be = lon_adj.max(axis=1) + pad_lon
        bs = lat_c.min(axis=1) - pad_lat
        bn = lat_c.max(axis=1) + pad_lat

        # pole/face-scale cells wrapping the frame can't classify; they
        # descend (or emit as border at the final level)
        wrap = (be - bw) > 180.0

        # classify the padded rects (same contract as before: no
        # segment bbox touching the rect => the rect is strictly off
        # the fattened boundary of every ring, so one representative
        # corner decides inside/outside; polygon_contains is exact
        # there — its vertex/edge accepts only fire inside seg bboxes)
        disjoint = ~wrap & ((be < w) | (bw > e) | (bn < s) | (bs > n))
        border = np.zeros(faces.shape, dtype=bool)
        todo = np.flatnonzero(~wrap & ~disjoint)
        if todo.size:
            chunk = max(1, (1 << 22) // max(_exl.size, 1))
            for cs in range(0, todo.size, chunk):
                sel = todo[cs : cs + chunk]
                hit = (
                    (_exl[None, :] <= be[sel, None])
                    & (_exh[None, :] >= bw[sel, None])
                    & (_eyl[None, :] <= bn[sel, None])
                    & (_eyh[None, :] >= bs[sel, None])
                ).any(axis=1)
                border[sel] = hit
        probe = ~wrap & ~disjoint & ~border
        interior = np.zeros(faces.shape, dtype=bool)
        pi = np.flatnonzero(probe)
        if pi.size:
            inside = kgeo.polygon_contains(bs[pi], bw[pi], outer)
            for h in holes:
                inside &= ~kgeo.polygon_contains(bs[pi], bw[pi], h)
            interior[pi] = inside
            disjoint[pi[~inside]] = True

        if lvl == level:
            final = wrap | border
            emit(faces[final], ics[final], jcs[final], level, True)
            emit(faces[interior], ics[interior], jcs[interior], level, False)
            faces = np.empty(0, dtype=np.int64)
            break

        for k in np.flatnonzero(interior):
            emit_block(int(faces[k]), lvl, int(ics[k]), int(jcs[k]))

        descend = wrap | border
        faces = np.repeat(faces[descend], 4)
        ic0 = np.repeat(ics[descend] * 2, 4)
        jc0 = np.repeat(jcs[descend] * 2, 4)
        quad = np.tile(np.array([0, 1, 2, 3], dtype=np.int64), descend.sum())
        ics = ic0 + (quad >> 1)
        jcs = jc0 + (quad & 1)

    if out_id_chunks:
        out_ids = np.concatenate(out_id_chunks).astype(np.int64)
        out_border = np.concatenate(out_border_chunks).astype(bool)
    else:
        out_ids = np.empty(0, dtype=np.int64)
        out_border = np.empty(0, dtype=bool)
    return out_ids, out_border, level


def polygon_covering_batch(
    outers: list, level: int, max_cells: int = 8192
):
    """Coverings of MANY single-ring polygons at one level in ONE
    frontier sweep — the per-batch form of :func:`polygon_covering`
    for the distributed covering operators (s2_cover_polygons_df),
    identical verdict logic and output set per polygon.

    ``outers``: list of (m, 2) [lon, lat] outer rings (no holes — the
    caller routes holed/invalid polygons through the single-polygon
    path).  Returns (pidx, ids, border): flat int64/int64/bool arrays
    where ``pidx[k]`` is the index into ``outers`` of cell ``ids[k]``.

    Why batched: the per-polygon sweep costs ~4 ms regardless of size
    (14 levels x ~25 small-array ops of interpreter overhead); covering
    10^5 polygons per task is covering-bound at that constant.  Here the
    level loop runs ONCE for the whole batch — frontier rows carry a
    polygon index, per-polygon values (bbox, frame, edges, ray-cast
    ring) gather through it — so the constant amortizes across the
    batch (~20x at 10k 5-vertex boxes).

    Raises the same polar/antimeridian/max_cells errors as the single
    path (max_cells is enforced PER POLYGON, as there)."""
    from . import geometry as kgeo
    from .overlay import polygon_contains_batch

    P = len(outers)
    if P == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=bool),
        )
    rings = [np.asarray(o, dtype=np.float64) for o in outers]
    for r in rings:
        if np.abs(r[:, 1]).max() > 89.5:
            raise ValueError(
                "polar polygons are not supported (reference parity)"
            )
        if r[:, 0].max() - r[:, 0].min() > 180.0:
            raise ValueError(
                "antimeridian-crossing polygons are not supported"
            )

    # pad rings to (P, M, 2) repeating the last vertex: padded edges are
    # degenerate POINT bboxes at a real vertex, which lie inside the
    # union of that vertex's real edge bboxes — any rect touching one
    # also touches a real edge bbox, so border verdicts are unchanged
    lens = np.fromiter((r.shape[0] for r in rings), dtype=np.int64, count=P)
    M = int(lens.max())
    R = np.empty((P, M, 2), dtype=np.float64)
    for i, r in enumerate(rings):
        k = r.shape[0]
        R[i, :k] = r
        if k < M:
            R[i, k:] = r[k - 1]
    # per-polygon scalars (means over REAL vertices only)
    pw = np.array([r[:, 0].min() for r in rings])
    pe = np.array([r[:, 0].max() for r in rings])
    ps = np.array([r[:, 1].min() for r in rings])
    pn = np.array([r[:, 1].max() for r in rings])
    pframe = np.array([float(r[:, 0].mean()) for r in rings])
    # per-polygon edge bboxes over the padded slots: (P, M-1)
    ex1, ey1 = R[:, :-1, 0], R[:, :-1, 1]
    ex2, ey2 = R[:, 1:, 0], R[:, 1:, 1]
    exl, exh = np.minimum(ex1, ex2), np.maximum(ex1, ex2)
    eyl, eyh = np.minimum(ey1, ey2), np.maximum(ey1, ey2)

    out_pidx: list[np.ndarray] = []
    out_ids: list[np.ndarray] = []
    out_border: list[np.ndarray] = []
    counts = np.zeros(P, dtype=np.int64)

    def emit(pidx_e, faces_e, ics_e, jcs_e, lvl, border):
        if faces_e.size == 0:
            return
        counts_add = np.bincount(pidx_e, minlength=P)
        np.add(counts, counts_add, out=counts)
        if (counts > max_cells).any():
            raise ValueError(
                f"covering exceeds max_cells={max_cells}; lower `level`"
            )
        shift = MAX_LEVEL - lvl
        out_pidx.append(pidx_e.astype(np.int64))
        out_ids.append(
            cell_id_from_face_ij(faces_e, ics_e << shift, jcs_e << shift, lvl)
        )
        out_border.append(
            np.broadcast_to(border, faces_e.shape).astype(bool)
            if np.isscalar(border)
            else border
        )

    two30 = float(1 << MAX_LEVEL)
    pidx = np.repeat(np.arange(P, dtype=np.int64), 6)
    faces = np.tile(np.arange(6, dtype=np.int64), P)
    ics = np.zeros(6 * P, dtype=np.int64)
    jcs = np.zeros(6 * P, dtype=np.int64)

    for lvl in range(level + 1):
        if faces.size == 0:
            break
        shift = MAX_LEVEL - lvl
        s_lo = (ics << shift) / two30
        s_hi = ((ics + 1) << shift) / two30
        t_lo = (jcs << shift) / two30
        t_hi = ((jcs + 1) << shift) / two30
        s_c = (s_lo + s_hi) / 2.0
        t_c = (t_lo + t_hi) / 2.0
        ss = np.stack([s_c, s_lo, s_lo, s_hi, s_hi], axis=1)
        tt = np.stack([t_c, t_lo, t_hi, t_lo, t_hi], axis=1)
        fx = np.repeat(faces, 5)
        x, y, z = xyz_from_face_uv(
            fx, uv_from_st(ss.ravel()), uv_from_st(tt.ravel())
        )
        norm = np.sqrt(x * x + y * y + z * z)
        x = (x / norm).reshape(-1, 5)
        y = (y / norm).reshape(-1, 5)
        z = (z / norm).reshape(-1, 5)
        dots = np.clip(
            x[:, :1] * x[:, 1:] + y[:, :1] * y[:, 1:] + z[:, :1] * z[:, 1:],
            -1.0,
            1.0,
        )
        circ_deg = np.degrees(np.arccos(dots).max(axis=1))
        lat_center = np.degrees(
            np.arctan2(z[:, 0], np.hypot(x[:, 0], y[:, 0]))
        )
        band_lo, band_hi = lat_center - circ_deg, lat_center + circ_deg
        keep = ~((band_hi < ps[pidx]) | (band_lo > pn[pidx]))
        if not keep.any():
            break
        pidx, faces, ics, jcs = pidx[keep], faces[keep], ics[keep], jcs[keep]
        band_lo, band_hi = band_lo[keep], band_hi[keep]
        lat_c = np.degrees(
            np.arctan2(z[keep, 1:], np.hypot(x[keep, 1:], y[keep, 1:]))
        )
        lon_c = np.degrees(np.arctan2(y[keep, 1:], x[keep, 1:]))

        theta = (math.pi / 2) / (1 << lvl)
        pad_lat = (theta * theta / 4.0) * (180.0 / math.pi)
        abs_band = np.minimum(
            89.999, np.maximum(np.abs(band_lo), np.abs(band_hi))
        )
        pad_lon = pad_lat / np.maximum(1e-9, np.cos(np.radians(abs_band)))
        frame = pframe[pidx]
        lon_adj = frame[:, None] + _wrap_deg(lon_c - frame[:, None])
        bw = lon_adj.min(axis=1) - pad_lon
        be = lon_adj.max(axis=1) + pad_lon
        bs = lat_c.min(axis=1) - pad_lat
        bn = lat_c.max(axis=1) + pad_lat

        wrap = (be - bw) > 180.0
        disjoint = ~wrap & (
            (be < pw[pidx]) | (bw > pe[pidx]) | (bn < ps[pidx]) | (bs > pn[pidx])
        )
        border = np.zeros(faces.shape, dtype=bool)
        todo = np.flatnonzero(~wrap & ~disjoint)
        if todo.size:
            chunk = max(1, (1 << 22) // max(M - 1, 1))
            for cs in range(0, todo.size, chunk):
                sel = todo[cs : cs + chunk]
                rows = pidx[sel]
                hit = (
                    (exl[rows] <= be[sel, None])
                    & (exh[rows] >= bw[sel, None])
                    & (eyl[rows] <= bn[sel, None])
                    & (eyh[rows] >= bs[sel, None])
                ).any(axis=1)
                border[sel] = hit
        probe = ~wrap & ~disjoint & ~border
        interior = np.zeros(faces.shape, dtype=bool)
        pi = np.flatnonzero(probe)
        if pi.size:
            inside = polygon_contains_batch(bs[pi], bw[pi], R[pidx[pi]])
            interior[pi] = inside
            disjoint[pi[~inside]] = True

        if lvl == level:
            final = wrap | border
            emit(pidx[final], faces[final], ics[final], jcs[final], level, True)
            emit(
                pidx[interior],
                faces[interior],
                ics[interior],
                jcs[interior],
                level,
                False,
            )
            break

        for k in np.flatnonzero(interior):
            d = level - lvl
            side = 1 << d
            base_i, base_j = int(ics[k]) << d, int(jcs[k]) << d
            ii, jj = np.meshgrid(
                base_i + np.arange(side, dtype=np.int64),
                base_j + np.arange(side, dtype=np.int64),
                indexing="ij",
            )
            emit(
                np.full(side * side, int(pidx[k]), dtype=np.int64),
                np.full(side * side, int(faces[k]), dtype=np.int64),
                ii.ravel(),
                jj.ravel(),
                level,
                False,
            )

        descend = wrap | border
        nd = int(descend.sum())
        pidx = np.repeat(pidx[descend], 4)
        faces = np.repeat(faces[descend], 4)
        ic0 = np.repeat(ics[descend] * 2, 4)
        jc0 = np.repeat(jcs[descend] * 2, 4)
        quad = np.tile(np.array([0, 1, 2, 3], dtype=np.int64), nd)
        ics = ic0 + (quad >> 1)
        jcs = jc0 + (quad & 1)

    if out_ids:
        return (
            np.concatenate(out_pidx),
            np.concatenate(out_ids).astype(np.int64),
            np.concatenate(out_border).astype(bool),
        )
    return (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=bool),
    )


def multipolygon_covering(
    polygons: list, level: int, max_cells: int = 8192
):
    """Union of per-polygon coverings (the S2 analogue of
    geoHashesForMultiPolygon, GeoHashUtils.kt:466-478): each element of
    ``polygons`` is a ring list ([outer, *holes]); a cell that is
    interior to ANY member is interior (no re-check needed), otherwise
    it keeps its border flag."""
    best: dict[int, bool] = {}
    for rings in polygons:
        ids, border, _ = polygon_covering(rings, level=level, max_cells=max_cells)
        for c, b in zip(ids, border):
            c = int(c)
            best[c] = best.get(c, True) and bool(b)
    items = sorted(best.items())
    return (
        np.array([c for c, _ in items], dtype=np.int64),
        np.array([b for _, b in items], dtype=bool),
        level,
    )
