"""Hexagonal cell index ("hexgrid") on the cylindrical equal-area projection.

Closes the last BASELINE.json north-star noun ("H3/S2 index", "kNN via
H3 k-ring"): a hexagonal multi-resolution cell index delivering the H3
query capabilities the engine consumes — gridDisk/k-ring candidate
generation, hex adjacency, an aperture resolution pyramid with
parent/children navigation, and cell ids packing (res, axial coords)
into one BIGINT — implemented from scratch on public hex-lattice math
(axial/cube coordinates and cube rounding are standard published
constructions).  It is deliberately NOT bit-compatible with Uber H3
ids: the sandbox has no ``h3`` library to verify bit parity against,
and bit parity adds no engine capability; what the index must provide
(k-ring joins, hierarchy rollup, equi-joinable cell keys) is provided
and oracle-checked cross-engine instead.  Two properties this lattice
has that icosahedral H3 does not:

- **exactly equal-area cells** at every resolution (the projection is
  equal-area and every hex has identical projected area), vs H3's
  up-to ~2x area spread per resolution;
- **no pentagons**: the lattice tiles the cylinder seamlessly (the
  longitude wrap is an integer number of q-steps at every resolution),
  so gridDisk(k) is always exactly 3k(k+1)+1 cells — no pentagon
  special cases in join planning.

The tradeoff is honest too: cells keep equal area but distort in SHAPE
poleward (long-thin on the ground), so ring-expansion joins near the
poles need more rings; operators compute the required ring count from
the worst latitude a radius can reach (same policy as the geohash
``radius_join_bulk``) and route the |lat| -> 90 degenerate band to an
explicit fallback instead of silently under-covering.

Geometry
--------
Projection: x = lon (degrees), y = sin(lat) * (180/pi).  This is
Lambert's cylindrical equal-area map scaled so it is conformal at the
equator (equatorial hexes are near-regular on the ground).

Lattice: pointy-top hexes in axial coordinates (q, r); center of
(q, r) sits at x = sqrt(3)*s*(q + r/2), y = (3/2)*s*r where s is the
center-to-vertex size.  Resolution res in [0, 20] has
ncols = 16 * 2**res columns and s(res) = 360 / (sqrt(3) * ncols), so
translating q -> q + ncols is exactly x -> x + 360: the lattice is
periodic around the antimeridian and cell ids store q modulo ncols.

Aperture-4 pyramid: res+1 halves s.  Hex tilings are not self-similar
under any aperture, so (exactly like H3's aperture-7) parent/child is
defined by CENTER CONTAINMENT: parent(c) = the res-1 cell containing
c's center.  ``parent(child)`` is exact and ``children`` inverts it
exactly (children are the res+1 cells whose parent is the cell,
4 on average).

Cell id packing (BIGINT): res<<56 | (r + 2**27)<<28 | q.  All three
fields are non-negative and disjoint, so ``+`` equals ``|`` and ids at
one resolution sort by (r, q) — row-major locality for range scans.

Cross-engine parity: encode is sin + fixed-order float64 arithmetic +
floor(v + 0.5) rounding + integer bit math, written in the SAME
operation order here (numpy), in functions/hexcell.py (Spark Columns)
and in the DuckDB oracle SQL — the repo-wide recipe that keeps cell
assignments hash-identical across engines (see contract.py header).

Reference parity: the reference has no hex index (its cell systems are
geohash only — GeoHashUtils.kt); this module exists for the
BASELINE.json north star, with the same operator surface as the
geohash/S2 kernels so joins are interchangeable across cell systems.
"""

from __future__ import annotations

import numpy as np

SQRT3 = 1.7320508075688772
TWO_OVER_SQRT3 = 1.1547005383792515
RAD = 0.017453292519943295  # pi / 180, explicit literal in all engines
Y_SCALE = 57.29577951308232  # 180 / pi
BASE_COLS = 16
MAX_RES = 20
R_BIAS = 1 << 27
EARTH_RADIUS_M = 6371000.0
M_PER_DEG = EARTH_RADIUS_M * RAD  # meters per degree along a meridian


def ncols(res: int) -> int:
    """Number of q-columns at ``res`` (the longitude wrap period)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    return BASE_COLS << res


def size(res: int) -> float:
    """Center-to-vertex hex size in projected units (degrees at the
    equator).  Chosen so ncols(res) hexes wrap exactly around."""
    return 360.0 / (SQRT3 * ncols(res))


def x_scale(res: int) -> float:
    """Single-multiply center-x scale: sqrt(3) * s, pre-folded (see
    :func:`q_scale` for why)."""
    return SQRT3 * size(res)


def y_step(res: int) -> float:
    """Single-multiply center-y scale: 1.5 * s, pre-folded."""
    return 1.5 * size(res)


def cell_area_m2(res: int) -> float:
    """Exact spherical area of EVERY cell at ``res`` (equal-area map:
    projected hex area x the constant sphere-per-map density)."""
    s = size(res)
    hex_area_proj = 1.5 * SQRT3 * s * s
    map_area = 360.0 * (2.0 * Y_SCALE)
    sphere_area = 4.0 * np.pi * EARTH_RADIUS_M * EARTH_RADIUS_M
    return hex_area_proj * (sphere_area / map_area)


# --------------------------------------------------------------------------
# encode: (lat, lon) -> axial (q, r) -> packed id
# --------------------------------------------------------------------------

def q_scale(res: int) -> float:
    """Single-multiply scale for qf: ncols/360, precomputed in Python so
    every engine sees ONE double literal (DuckDB's optimizer
    reassociates ``expr * n / 360.0`` constant chains — measured 1-ulp
    divergence — so scales must be pre-folded, not left to the engine)."""
    return float(ncols(res)) / 360.0


def r_scale(res: int) -> float:
    """Single-multiply scale for rf: (2/sqrt(3)) * ncols/360."""
    return TWO_OVER_SQRT3 * (float(ncols(res)) / 360.0)


def _axial_from_xy(x, y, res: int):
    """Fractional axial coords + cube rounding.  OP ORDER IS THE PARITY
    CONTRACT — functions/hexcell.py and the oracle SQL mirror it
    expression by expression."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (x - y / SQRT3) * q_scale(res)
    rf = y * r_scale(res)
    sf = (-qf) - rf
    q1 = np.floor(qf + 0.5)
    r1 = np.floor(rf + 0.5)
    s1 = np.floor(sf + 0.5)
    dq = np.abs(q1 - qf)
    dr = np.abs(r1 - rf)
    ds = np.abs(s1 - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, (-r1) - s1, q1).astype(np.int64)
    r = np.where(fix_r, (-q1) - s1, r1).astype(np.int64)
    nq = np.int64(ncols(res))
    q = ((q % nq) + nq) % nq  # non-negative wrap, same formula as SQL
    return q, r


def encode_axial(lat, lon, res: int):
    """Vectorized (lat, lon) degrees -> axial (q, r) at ``res``."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    y = np.sin(lat * RAD) * Y_SCALE
    return _axial_from_xy(lon, y, res)


def pack(res: int, q, r):
    """Pack (res, q, r) into one BIGINT; fields disjoint so + == |."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return (np.int64(res) << np.int64(56)) + ((r + np.int64(R_BIAS)) << np.int64(28)) + q


def unpack(cell):
    """Inverse of :func:`pack` -> (res, q, r) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(56)).astype(np.int64)
    r = ((cell >> np.int64(28)) & np.int64((1 << 28) - 1)) - np.int64(R_BIAS)
    q = cell & np.int64((1 << 28) - 1)
    return res, q, r


def encode_cell(lat, lon, res: int):
    """Vectorized (lat, lon) -> packed cell id at ``res``."""
    q, r = encode_axial(lat, lon, res)
    return pack(res, q, r)


def encode_cell_scalar(lat: float, lon: float, res: int) -> int:
    return int(encode_cell(np.array([lat]), np.array([lon]), res)[0])


# --------------------------------------------------------------------------
# decode: cell -> center / boundary
# --------------------------------------------------------------------------

def center_xy(cell):
    """Projected center (x in [-180, 180), y) of each cell.  Batch must
    share one resolution (the operator-side layout everywhere)."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, q, r = unpack(cell)
    res_i = int(res[0])
    if not np.all(res == res_i):
        raise ValueError("center_xy() requires a single-resolution batch")
    x = x_scale(res_i) * (q + r / 2.0)
    y = y_step(res_i) * r
    x = ((x + 180.0) % 360.0) - 180.0
    return x, y


def center_latlon(cell):
    """(lat, lon) degrees of each cell center.  Top/bottom lattice rows
    can have projected centers beyond the pole lines; their latitude
    clamps to +-90 (the cells still partition the sphere exactly)."""
    x, y = center_xy(cell)
    sin_lat = np.clip(np.asarray(y, dtype=np.float64) / Y_SCALE, -1.0, 1.0)
    lat = np.degrees(np.arcsin(sin_lat))
    return lat, x


def boundary_latlon(cell: int):
    """6 (lat, lon) vertices of one cell, counter-clockwise, for GeoJSON
    emission.  Pointy-top: vertex angles 30 + 60*k degrees."""
    res, q, r = unpack(np.array([int(cell)]))
    s = size(int(res[0]))
    cx = x_scale(int(res[0])) * (float(q[0]) + float(r[0]) / 2.0)
    cy = y_step(int(res[0])) * float(r[0])
    out = []
    for k in range(6):
        ang = (30.0 + 60.0 * k) * RAD
        x = cx + s * np.cos(ang)
        y = cy + s * np.sin(ang)
        x = ((x + 180.0 + 360.0) % 360.0) - 180.0
        lat = float(np.degrees(np.arcsin(np.clip(y / Y_SCALE, -1.0, 1.0))))
        out.append((lat, float(x)))
    return out


# --------------------------------------------------------------------------
# k-ring / gridDisk / distance
# --------------------------------------------------------------------------

def grid_disk_offsets(k: int) -> list[tuple[int, int]]:
    """All (dq, dr) axial offsets at hex distance <= k — exactly
    3k(k+1)+1 of them (no pentagon exceptions on this lattice).
    Deterministic (dq, dr) sort order."""
    if k < 0:
        raise ValueError("k must be >= 0")
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return out


def hex_distance_offsets(dq, dr):
    """Hex (cube) distance of axial offsets."""
    dq = np.asarray(dq, dtype=np.int64)
    dr = np.asarray(dr, dtype=np.int64)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def grid_disk(cell: int, k: int) -> list[int]:
    """All cell ids within hex distance k of ``cell`` (gridDisk),
    longitude wrap included.  Sorted, deterministic."""
    res, q, r = unpack(np.array([int(cell)]))
    res_i = int(res[0])
    n = ncols(res_i)
    offs = np.array(grid_disk_offsets(k), dtype=np.int64)
    qq = (int(q[0]) + offs[:, 0]) % n
    rr = int(r[0]) + offs[:, 1]
    return sorted(int(v) for v in pack(res_i, qq, rr))


def grid_ring(cell: int, k: int) -> list[int]:
    """Cells at hex distance EXACTLY k (6k cells for k >= 1)."""
    if k == 0:
        return [int(cell)]
    inner = set(grid_disk(cell, k - 1))
    return sorted(set(grid_disk(cell, k)) - inner)


def grid_distance(cell_a: int, cell_b: int) -> int:
    """Hex steps between two same-res cells, via the nearest longitude
    wrap image (min over dq and dq - ncols / dq + ncols)."""
    res_a, qa, ra = unpack(np.array([int(cell_a)]))
    res_b, qb, rb = unpack(np.array([int(cell_b)]))
    if int(res_a[0]) != int(res_b[0]):
        raise ValueError("grid_distance requires same-resolution cells")
    n = ncols(int(res_a[0]))
    dr = int(rb[0]) - int(ra[0])
    dq0 = (int(qb[0]) - int(qa[0])) % n
    best = None
    for dq in (dq0, dq0 - n):
        d = int(hex_distance_offsets(dq, dr))
        best = d if best is None else min(best, d)
    return best


# --------------------------------------------------------------------------
# aperture-4 hierarchy
# --------------------------------------------------------------------------

def parent(cell):
    """res-1 cell containing each cell's PROJECTED center (center
    containment, the same convention H3 uses for its aperture-7
    pyramid).  Vectorized; all inputs must share one resolution."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, q, r = unpack(cell)
    res_i = int(res[0])
    if not np.all(res == res_i):
        raise ValueError("parent() requires a single-resolution batch")
    if res_i == 0:
        raise ValueError("res 0 cells have no parent")
    x = x_scale(res_i) * (q + r / 2.0)
    y = y_step(res_i) * r
    x = ((x + 180.0) % 360.0) - 180.0
    pq, pr = _axial_from_xy(x, y, res_i - 1)
    return pack(res_i - 1, pq, pr)


def parent_at(cell, res: int):
    """Ancestor at resolution ``res`` (repeated center containment)."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    cur = int(unpack(cell)[0][0])
    while cur > res:
        cell = parent(cell)
        cur -= 1
    return cell


def children(cell: int) -> list[int]:
    """All res+1 cells whose :func:`parent` is ``cell`` — the exact
    inverse of center containment (enumerates the res+1 disk around the
    cell center and filters; 4 children on average, 3..5 in general)."""
    res, q, r = unpack(np.array([int(cell)]))
    res_i = int(res[0])
    if res_i >= MAX_RES:
        raise ValueError(f"res {MAX_RES} cells have no children")
    x = float(x_scale(res_i) * (float(q[0]) + float(r[0]) / 2.0))
    x = ((x + 180.0) % 360.0) - 180.0
    y = float(y_step(res_i) * float(r[0]))
    cq, cr = _axial_from_xy(np.array([x]), np.array([y]), res_i + 1)
    cand = grid_disk(int(pack(res_i + 1, cq, cr)[0]), 2)
    cand = np.array(cand, dtype=np.int64)
    par = parent(cand)
    return sorted(int(v) for v in cand[par == int(cell)])


# --------------------------------------------------------------------------
# radius -> ring-count sizing (covering guarantees for join operators)
# --------------------------------------------------------------------------

def k_for_radius(lat: float, radius_m: float, res: int) -> int:
    """Ring count k such that gridDisk(cell(query), k) covers every
    point within ``radius_m`` meters of a query at latitude ``lat``.

    Proof sketch: a ground disk of radius R maps into a projected disk
    of radius rho = R / (M_PER_DEG * cos(phi_max)) around the query,
    where phi_max is the worst |latitude| the radius can reach (x is
    the min-scale direction poleward).  A point P at projected
    distance <= rho from the query has its cell center within
    rho + 2s of the query's cell center (two circumradius hops), and
    two cells at hex distance d have centers >= 1.5*d*s apart
    (equality along the vertex direction, offsets (m, m)) — so
    hexdist <= (rho + 2s) / (1.5s).  [The tempting (2k+1)*inradius
    bound is FALSE: the k-disk union's measured inradius is only
    ~1.5*k*s + 0.5*s, jagged in the vertex direction.]  Returns a
    large k near the poles — callers cap it and route capped queries
    to the polar fallback rather than under-covering (policy of
    knn.py:300)."""
    phi_max = min(89.999999, abs(lat) + radius_m / M_PER_DEG)
    scale = M_PER_DEG * float(np.cos(phi_max * RAD))
    rho = radius_m / scale
    s = size(res)
    k = int(np.ceil((rho + 2.0 * s) / (1.5 * s)))
    return max(1, k)


def res_for_radius(lat: float, radius_m: float, max_k: int = 8) -> int:
    """Finest resolution whose :func:`k_for_radius` stays <= max_k —
    the auto-res policy for radius joins (finer cells = fewer false
    candidates, but more ring cells; max_k bounds the explode)."""
    for res in range(MAX_RES, -1, -1):
        if k_for_radius(lat, radius_m, res) <= max_k:
            return res
    return 0


def covered_ground_radius_m(qlat: float, ring_k: int, res: int) -> float:
    """LOWER bound on the ground distance from a query at ``qlat`` to
    any point OUTSIDE gridDisk(cell(query), ring_k) — the kNN
    ring-expansion stop bound.  A point within projected distance
    rho = 1.5*k*s - 2s of the query provably lies inside the k-disk
    (inverse of the :func:`k_for_radius` bound), so every outside
    point P has max(|dx|, |dy|) >= rho/sqrt(2).  Case |dy|: |d sin(phi)|
    >= dy/Y_SCALE and |d phi| >= |d sin(phi)|, so ground >=
    M_PER_DEG * rho/sqrt(2).  Case |dx|: any path to P either stays
    below a cap latitude phi_c — then its ground length is >=
    M_PER_DEG * cos(phi_c) * rho/sqrt(2) (dlambda accumulates at x-scale
    >= cos(phi_c)) — or crosses phi_c, costing >= M_PER_DEG *
    (phi_c - |qlat|) just in latitude; the cap is chosen to maximize
    the min of the two, which keeps the bound POSITIVE even when the
    projected disk reaches the pole line (a naive cos(phi_max) factor
    degenerates to 0 there and kNN could never certify)."""
    s = size(res)
    rho = 1.5 * ring_k * s - 2.0 * s
    if rho <= 0:
        return 0.0
    half = rho / float(np.sqrt(2.0))
    bound_a = M_PER_DEG * half
    caps = np.linspace(abs(qlat), 90.0, 721)
    b1 = M_PER_DEG * np.cos(caps * RAD) * half
    b2 = M_PER_DEG * (caps - abs(qlat))
    bound_b = float(np.max(np.minimum(b1, b2)))
    return min(bound_a, bound_b)


# --------------------------------------------------------------------------
# polygon covering (build side of the hex PIP join)
# --------------------------------------------------------------------------

def _cell_boxes(q, r, res: int):
    """Lat/lon bounding boxes of cells given UNWRAPPED axial coords
    (q may lie outside [0, ncols) near the seam so boxes stay on the
    ring's side of the antimeridian).  Pointy-top vertex extremes:
    lon = cx +- (sqrt(3)/2)*s, y = cy +- s — the bbox is a conservative
    SUPERSET of the hex, so interior classification through it stays
    safe."""
    s = size(res)
    cx = x_scale(res) * (q + r / 2.0)
    cy = y_step(res) * r
    half_w = SQRT3 * s / 2.0
    w = cx - half_w
    e = cx + half_w
    lo = np.clip((cy - s) / Y_SCALE, -1.0, 1.0)
    hi = np.clip((cy + s) / Y_SCALE, -1.0, 1.0)
    south = np.degrees(np.arcsin(lo))
    north = np.degrees(np.arcsin(hi))
    return w, south, e, north


def _candidate_cells(ring: np.ndarray, res: int):
    """Unwrapped (q, r) candidates whose rows/columns intersect the
    ring's bbox (pad one cell each side)."""
    lon = ring[:, 0]
    lat = ring[:, 1]
    y = np.sin(lat * RAD) * Y_SCALE
    rf = y * r_scale(res)
    r_lo = int(np.floor(rf.min())) - 1
    r_hi = int(np.ceil(rf.max())) + 1
    qs_scale = q_scale(res)
    w, e = lon.min(), lon.max()
    qq = []
    rr = []
    for r in range(r_lo, r_hi + 1):
        yr = y_step(res) * r
        q_lo = int(np.floor((w - yr / SQRT3) * qs_scale)) - 1
        q_hi = int(np.ceil((e - yr / SQRT3) * qs_scale)) + 1
        qq.append(np.arange(q_lo, q_hi + 1, dtype=np.int64))
        rr.append(np.full(q_hi - q_lo + 1, r, dtype=np.int64))
    return np.concatenate(qq), np.concatenate(rr)


def cover_res_for_rings(
    rings_list: list[list[np.ndarray]], max_cells: int = 2048
) -> int:
    """GLOBAL covering resolution for a polygon set: the finest res
    where every polygon's candidate grid stays under ``max_cells``.
    One global res because hex children only approximately tile their
    parent (center containment), so the geohash trick of expanding a
    coarse interior cell into exact children does NOT preserve the
    interior guarantee here — mixed-scale sets settle on the coarsest
    need and small polygons simply classify as border (exact re-check
    catches them; correctness is never res-dependent)."""
    best = 0
    for res in range(MAX_RES + 1):
        ok = True
        for rings in rings_list:
            ring = np.asarray(rings[0], dtype=np.float64)
            q, _ = _candidate_cells(ring, res)
            if q.size > max_cells:
                ok = False
                break
        if not ok:
            break
        best = res
    return best


def hex_cover_with_borders(
    rings: list[np.ndarray], res: int
) -> tuple[set[int], set[int]]:
    """(interior_cells, border_cells) covering rings[0] at ``res`` —
    the hex twin of covering.cover_with_borders (geohash) and the S2
    polygon covering: a point whose cell is interior is inside the
    outer ring with NO exact re-check; border cells require the exact
    hole-aware ray-cast.  Holes demote interior cells they touch.

    Classification runs on each cell's lat/lon bbox (a superset of the
    hex): interior = all 4 corners inside the ring AND no ring vertex
    in the box AND no edge crossing (sufficient for simple rings);
    overlap reuses the covering module's vectorized box-vs-ring test.
    Rings crossing the antimeridian must be pre-split by the caller
    (the geohash covering's documented posture, GeoHashUtils.kt:507).
    """
    from .covering import _overlap_boxes_vs_ring
    from .geometry import lines_cross_vec, polygon_contains
    from .overlay import polygon_contains_batch

    ring = np.asarray(rings[0], dtype=np.float64)
    if not np.allclose(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    q, r = _candidate_cells(ring, res)
    w, s_, e, n = _cell_boxes(q, r, res)
    c = q.size
    hit = _overlap_boxes_vs_ring(w, s_, e, n, ring)
    # interior: 4 corners inside
    corners_lon = np.stack([w, e, e, w], axis=1).ravel()
    corners_lat = np.stack([s_, s_, n, n], axis=1).ravel()
    inside4 = (
        polygon_contains(corners_lat, corners_lon, ring).reshape(c, 4).all(axis=1)
    )
    # no ring vertex strictly inside the box
    m = ring.shape[0]
    vx = ring[None, :, 0]
    vy = ring[None, :, 1]
    vert_in = (
        (vx > w[:, None]) & (vx < e[:, None])
        & (vy > s_[:, None]) & (vy < n[:, None])
    ).any(axis=1)
    # no box edge x ring edge crossing
    from .covering import _box_rings

    boxes = _box_rings(w, s_, e, n)
    bx1 = boxes[:, :-1, 0][:, :, None]
    by1 = boxes[:, :-1, 1][:, :, None]
    bx2 = boxes[:, 1:, 0][:, :, None]
    by2 = boxes[:, 1:, 1][:, :, None]
    rx1 = ring[:-1, 0][None, None, :]
    ry1 = ring[:-1, 1][None, None, :]
    rx2 = ring[1:, 0][None, None, :]
    ry2 = ring[1:, 1][None, None, :]
    crosses = lines_cross_vec(bx1, by1, bx2, by2, rx1, ry1, rx2, ry2).any(
        axis=(1, 2)
    )
    interior = inside4 & (~vert_in) & (~crosses)
    border = hit & ~interior
    # holes demote (exact check handles hole membership)
    if len(rings) > 1:
        for hole in rings[1:]:
            h = np.asarray(hole, dtype=np.float64)
            if not np.allclose(h[0], h[-1]):
                h = np.vstack([h, h[:1]])
            sel = np.flatnonzero(interior)
            if sel.size == 0:
                break
            touch = _overlap_boxes_vs_ring(w[sel], s_[sel], e[sel], n[sel], h)
            border[sel[touch]] = True
            interior[sel[touch]] = False
    nq = np.int64(ncols(res))
    qw = ((q % nq) + nq) % nq
    ids = pack(res, qw, r)
    return (
        set(int(v) for v in ids[interior]),
        set(int(v) for v in ids[border]),
    )
