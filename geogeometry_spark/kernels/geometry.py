"""Core geometry kernels, bit-for-bit with reference GeoGeometry.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/GeoGeometry.kt
- constants:            GeoGeometry.kt:62-67
- boundingBox:          GeoGeometry.kt:84-100 (multipoint fold)
- bboxContains:         GeoGeometry.kt:181-184
- polygonContains:      GeoGeometry.kt:237-295 (ray cast, eps=1e-9)
- haversine distance:   GeoGeometry.kt:565-580
- equirectangular:      GeoGeometry.kt:599-608
- point-to-line:        GeoGeometry.kt:642-690
- polygonCenter:        GeoGeometry.kt:777-792
- circle2polygon:       GeoGeometry.kt:807-856
- linesCross:           GeoGeometry.kt:345-420
- overlap (ring x ring):GeoGeometry.kt:894-925
- translate family:     GeoGeometry.kt:430-493
- headingFromTwoPoints: GeoGeometry.kt:1121-1139
- validate:             GeoGeometry.kt:1208-1220
- area (shoelace):      GeoGeometry.kt:1236-1260
- wrap/mod:             GeoGeometry.kt:1106-1112

Rings are numpy arrays of shape (m, 2) in GeoJSON [lon, lat] order; point
batches are parallel float64 arrays (lat, lon) — mirroring the reference's
"arrays are [lon,lat], split args are (lat, lon)" convention (README.md:125).
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_METERS = 6371000.0  # GeoGeometry.kt:62
WGS84_RADIUS = 6378137  # GeoGeometry.kt:63
EARTH_CIRCUMFERENCE_METERS = EARTH_RADIUS_METERS * math.pi * 2.0
DEGREE_LATITUDE_METERS = EARTH_RADIUS_METERS * math.pi / 180.0
DEGREES_TO_RADIANS = math.pi / 180.0
RADIANS_TO_DEGREES = 1.0 / DEGREES_TO_RADIANS


def to_radians(deg):
    """degrees * (PI/180) — exact op order of GeoGeometry.toRadians."""
    return deg * DEGREES_TO_RADIANS


def from_radians(rad):
    return rad * RADIANS_TO_DEGREES


def validate(lat: float, lon: float, strict: bool = False) -> None:
    """GeoGeometry.kt:1208-1220 (0.0002 tolerance unless strict)."""
    min_lat, max_lat = (-90.0, 90.0) if strict else (-90.0002, 90.0002)
    min_lon, max_lon = (-180.0, 180.0) if strict else (-180.0002, 180.0002)
    if lat < min_lat or lat > max_lat:
        raise ValueError(f"Latitude {lat} is outside legal range of -90,90")
    if lon < min_lon or lon > max_lon:
        raise ValueError(f"Longitude {lon} is outside legal range of -180,180")


def is_valid(lat, lon, strict: bool = False):
    """Vectorized non-throwing validate (quarantine predicate)."""
    tol = 0.0 if strict else 0.0002
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    return (
        (lat >= -90.0 - tol)
        & (lat <= 90.0 + tol)
        & (lon >= -180.0 - tol)
        & (lon <= 180.0 + tol)
    )


def bounding_box(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(west, south, east, north) min/max fold. GeoGeometry.kt:84-100."""
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def bbox_contains(bbox, lat, lon):
    """Inclusive bbox membership. GeoGeometry.kt:181-184."""
    w, s, e, n = bbox
    return (s <= lat) & (lat <= n) & (w <= lon) & (lon <= e)


def polygon_center(ring: np.ndarray) -> tuple[float, float]:
    """bbox midpoint (lon, lat) — NOT a mass centroid. GeoGeometry.kt:777-792."""
    w, s, e, n = bounding_box(ring)
    return (w + e) / 2.0, (s + n) / 2.0


def _wrap_longitude(diff: np.ndarray) -> np.ndarray:
    """GeoGeometry.kt:243-247 (normalize lon difference into [-180, 180])."""
    return np.where(diff > 180, diff - 360, np.where(diff < -180, diff + 360, diff))


def polygon_contains(
    lat, lon, ring: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """Vectorized ray-casting PIP, exact reference semantics.

    GeoGeometry.kt:237-295: per test point, ring longitudes are normalized
    around the point (±360 wrap), then: bbox early-out -> eps=1e-9 vertex
    match -> segment-bbox edge match (onSegment, GeoGeometry.kt:682-690)
    -> eastward ray cast with crossing rule ``lat > lower && lat <= upper``
    and intersection ``xInt > 0``; odd parity = inside.

    ``ring`` is (m, 2) [lon, lat] (open or closed — edges use modular
    wrap like the reference's ``(i + 1) % size``).
    """
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 3:
        raise ValueError("a polygon must have at least three points")
    out = np.zeros(lat.shape[0], dtype=bool)
    rx = ring[:, 0]  # (m,)
    ry = ring[:, 1]
    ry_next = np.roll(ry, -1)
    eps = 1e-9
    for start in range(0, lat.shape[0], chunk):
        pl = lat[start : start + chunk][:, None]  # (c,1)
        po = lon[start : start + chunk][:, None]
        # normalized ring x per point: (c, m)
        nx = _wrap_longitude(rx[None, :] - po)
        nx_next = np.roll(nx, -1, axis=1)
        # bbox early-out on the normalized ring vs point (lat, 0)
        inside_bbox = (
            (ry.min() <= pl[:, 0])
            & (pl[:, 0] <= ry.max())
            & (nx.min(axis=1) <= 0.0)
            & (0.0 <= nx.max(axis=1))
        )
        # direct vertex match (on RAW coordinates, GeoGeometry.kt:263)
        vertex_hit = (
            (np.abs(ry[None, :] - pl) < eps) & (np.abs(rx[None, :] - po) < eps)
        ).any(axis=1)
        # edge match: point (0, lat) inside the normalized segment bbox
        y1 = ry[None, :]
        y2 = ry_next[None, :]
        seg_minx = np.minimum(nx, nx_next)
        seg_maxx = np.maximum(nx, nx_next)
        seg_miny = np.minimum(y1, y2)
        seg_maxy = np.maximum(y1, y2)
        nondegenerate = (nx != nx_next) | (y1 != y2)
        edge_hit = (
            nondegenerate
            & (seg_minx <= 0.0)
            & (0.0 <= seg_maxx)
            & (seg_miny <= pl)
            & (pl <= seg_maxy)
        ).any(axis=1)
        # eastward ray cast from (0, lat)
        nonhoriz = np.abs(y1 - y2) >= eps
        lower = np.minimum(y1, y2)
        upper = np.maximum(y1, y2)
        crossing = nonhoriz & (pl > lower) & (pl <= upper)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = nx + (pl - y1) * (nx_next - nx) / (y2 - y1)
        hits = (crossing & (x_int > 0)).sum(axis=1)
        out[start : start + chunk] = inside_bbox & (
            vertex_hit | edge_hit | (hits % 2 == 1)
        )
    return out


def polygon_contains_scalar(lat: float, lon: float, ring: np.ndarray) -> bool:
    return bool(polygon_contains(np.array([lat]), np.array([lon]), ring)[0])


def polygon_with_holes_contains(
    lat, lon, outer: np.ndarray, holes: list[np.ndarray]
) -> np.ndarray:
    """Hole-aware containment: inside outer AND NOT inside any hole.
    geojson/geojson.kt:187-192."""
    inside = polygon_contains(lat, lon, outer)
    for hole in holes:
        inside &= ~polygon_contains(lat, lon, hole)
    return inside


def haversine(lat1, lon1, lat2, lon2):
    """Spherical distance in meters, exact op order of GeoGeometry.kt:565-580."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    delta_lat = to_radians(lat2 - lat1)
    delta_lon = to_radians(lon2 - lon1)
    a = np.sin(delta_lat / 2) * np.sin(delta_lat / 2) + np.cos(
        to_radians(lat1)
    ) * np.cos(to_radians(lat2)) * np.sin(delta_lon / 2) * np.sin(delta_lon / 2)
    c = 2 * np.arcsin(np.sqrt(a))
    return EARTH_RADIUS_METERS * c


def haversine_scalar(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    return float(haversine(lat1, lon1, lat2, lon2))


def equirectangular(lat1, lon1, lat2, lon2):
    """Cheap flat-earth approximation. GeoGeometry.kt:599-608."""
    x = to_radians(np.asarray(lon2) - lon1) * np.cos(to_radians((np.asarray(lat1) + lat2) / 2))
    y = to_radians(np.asarray(lat2) - lat1)
    return np.sqrt(x * x + y * y) * EARTH_RADIUS_METERS


def _on_segment(x, y, x1, y1, x2, y2):
    """Segment-bbox membership. GeoGeometry.kt:682-690."""
    return (
        (np.minimum(x1, x2) <= x)
        & (x <= np.maximum(x1, x2))
        & (y >= np.minimum(y1, y2))
        & (y <= np.maximum(y1, y2))
    )


def distance_to_segment(x1, y1, x2, y2, x, y):
    """Distance (m) of point (x=lat, y=lon) to segment — argument order
    follows the reference exactly: GeoGeometry.kt:642-680 where x* are
    latitudes and y* are longitudes.  Vectorized over points."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    if y1 == y2:  # horizontal line (constant lon)
        xx = x
        yy = np.full_like(x, y1)
    elif x1 == x2:  # vertical
        xx = np.full_like(x, x1)
        yy = y
    else:
        s = (y2 - y1) / (x2 - x1)
        c = y1 - s * x1
        ps = -1 / s
        pc = y - ps * x
        xx = (c - pc) / (ps - s)
        yy = s * xx + c
    on = _on_segment(xx, yy, x1, y1, x2, y2)
    d_foot = haversine(x, y, xx, yy)
    d_ends = np.minimum(haversine(x, y, x1, y1), haversine(x, y, x2, y2))
    return np.where(on, d_foot, d_ends)


def distance_to_linestring(lat, lon, line: np.ndarray):
    """Min over segments. GeoGeometry.kt:708-724. line is (m,2) [lon,lat]."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    best = np.full(lat.shape[0], np.inf)
    for i in range(line.shape[0] - 1):
        d = distance_to_segment(
            line[i, 1], line[i, 0], line[i + 1, 1], line[i + 1, 0], lat, lon
        )
        best = np.minimum(best, d)
    return best


def distance_to_polygon(lat, lon, ring: np.ndarray):
    """0 if inside else distance to ring. GeoGeometry.kt:731-750."""
    inside = polygon_contains(lat, lon, ring)
    d = distance_to_linestring(lat, lon, ring)
    return np.where(inside, 0.0, d)


def heading_from_two_points(lat1, lon1, lat2, lon2):
    """Initial compass bearing in degrees. GeoGeometry.kt:1121-1139."""
    latitude1 = to_radians(np.asarray(lat1, dtype=np.float64))
    latitude2 = to_radians(np.asarray(lat2, dtype=np.float64))
    long_diff = to_radians(np.asarray(lon2, dtype=np.float64) - lon1)
    y = np.sin(long_diff) * np.cos(latitude2)
    x = np.cos(latitude1) * np.sin(latitude2) - np.sin(latitude1) * np.cos(
        latitude2
    ) * np.cos(long_diff)
    return (from_radians(np.arctan2(y, x)) + 360) % 360


def length_of_longitude_degree_at_latitude(latitude: float) -> float:
    """GeoGeometry.kt:430-433."""
    return math.cos(to_radians(latitude)) * EARTH_CIRCUMFERENCE_METERS / 360.0


def translate_longitude(lat, lon, meters):
    """GeoGeometry.kt:445-451 -> (lon', lat)."""
    lat_arr = np.asarray(lat, dtype=np.float64)
    return (
        np.asarray(lon, dtype=np.float64)
        + meters / (np.cos(to_radians(lat_arr)) * EARTH_CIRCUMFERENCE_METERS / 360.0),
        lat_arr,
    )


def translate_latitude(lat, lon, meters):
    """GeoGeometry.kt:463-465 -> (lon, lat')."""
    return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64) + meters / DEGREE_LATITUDE_METERS


def translate(lat, lon, latitudinal_meters, longitudinal_meters):
    """GeoGeometry.kt:477-487 -> (lon', lat')."""
    lon2, lat2 = translate_longitude(lat, lon, longitudinal_meters)
    return translate_latitude(lat2, lon2, latitudinal_meters)


def rectangle_around_centroid(
    lat: float, lon: float, latitudinal_meters: float, longitudinal_meters: float
) -> tuple[float, float, float, float]:
    """(west, south, east, north). GeoGeometry.kt:504-515."""
    tr_lon, tr_lat = translate(lat, lon, latitudinal_meters / 2, longitudinal_meters / 2)
    bl_lon, bl_lat = translate(lat, lon, -latitudinal_meters / 2, -longitudinal_meters / 2)
    return float(bl_lon), float(bl_lat), float(tr_lon), float(tr_lat)


def circle_to_polygon(segments: int, center_lat: float, center_lon: float, radius: float) -> np.ndarray:
    """Circle -> closed n-gon ring (m+1, 2) [lon, lat]. GeoGeometry.kt:807-856."""
    validate(center_lat, center_lon, False)
    if segments < 3:
        raise ValueError("you need a minimum of 5 segments")
    relative_latitude = radius / EARTH_RADIUS_METERS * 180 / math.pi
    relative_longitude = relative_latitude / math.cos(to_radians(center_lat)) % 90
    points = []
    for i in range(segments):
        theta = 2.0 * math.pi * float(i) / segments
        theta += 0.001  # pole-avoidance, GeoGeometry.kt:827
        if theta >= 2 * math.pi:
            theta -= 2 * math.pi
        lat_on = center_lat + relative_latitude * math.sin(theta)
        lon_on = center_lon + relative_longitude * math.cos(theta)
        if lon_on > 180:
            lon_on = -180 + (lon_on - 180)
        elif lon_on < -180:
            lon_on = 180 - (lon_on + 180)
        if lat_on > 90:
            lat_on = 90 - (lat_on - 90)
        elif lat_on < -90:
            lat_on = -90 - (lat_on + 90)
        points.append((lon_on, lat_on))
    points.append(points[0])
    return np.asarray(points, dtype=np.float64)


def _is_between(x1: float, x2: float, value: float) -> bool:
    """GeoGeometry.kt:423-428."""
    return (x2 <= value <= x1) if x1 > x2 else (x1 <= value <= x2)


def lines_cross(
    x1: float, y1: float, x2: float, y2: float,
    u1: float, v1: float, u2: float, v2: float,
) -> bool:
    """Segment intersection. GeoGeometry.kt:345-420 verbatim."""
    line1_vertical = x1 == x2
    line2_vertical = u1 == u2
    if line1_vertical and line2_vertical:
        if x1 == u1:
            l1_min, l1_max = min(y1, y2), max(y1, y2)
            l2_min, l2_max = min(v1, v2), max(v1, v2)
            return l1_min <= l2_max and l2_min <= l1_max
        return False
    if line1_vertical:
        gradient2 = (v2 - v1) / (u2 - u1)
        a2 = v1 - gradient2 * u1
        yi = a2 + gradient2 * x1
        return _is_between(y1, y2, yi) and _is_between(v1, v2, yi)
    if line2_vertical:
        gradient1 = (y2 - y1) / (x2 - x1)
        a1 = y1 - gradient1 * x1
        yi = a1 + gradient1 * u1
        return _is_between(y1, y2, yi) and _is_between(v1, v2, yi)
    gradient1 = (y2 - y1) / (x2 - x1)
    gradient2 = (v2 - v1) / (u2 - u1)
    a1 = y1 - gradient1 * x1
    a2 = v1 - gradient2 * u1
    if gradient1 - gradient2 == 0.0:
        if abs(a1 - a2) < 0.0000001:
            return _is_between(x1, x2, u1) or _is_between(x1, x2, u2)
        return False
    xi = -(a1 - a2) / (gradient1 - gradient2)
    yi = a1 + gradient1 * xi
    return (
        (x1 - xi) * (xi - x2) >= 0
        and (u1 - xi) * (xi - u2) >= 0
        and (y1 - yi) * (yi - y2) >= 0
        and (v1 - yi) * (yi - v2) >= 0
    )


def overlap(left: np.ndarray, right: np.ndarray) -> bool:
    """Ring-vs-ring overlap (convex-only caveat). GeoGeometry.kt:894-925."""
    lc = polygon_center(left)
    rc = polygon_center(right)
    if polygon_contains_scalar(rc[1], rc[0], left) or polygon_contains_scalar(
        lc[1], lc[0], right
    ):
        return True
    if polygon_contains(right[:, 1], right[:, 0], left).any():
        return True
    if polygon_contains(left[:, 1], left[:, 0], right).any():
        return True
    for i in range(left.shape[0] - 1):
        for j in range(right.shape[0] - 1):
            if lines_cross(
                left[i, 0], left[i, 1], left[i + 1, 0], left[i + 1, 1],
                right[j, 0], right[j, 1], right[j + 1, 0], right[j + 1, 1],
            ):
                return True
    return False


def ring_contains_ring(containing: np.ndarray, contained: np.ndarray) -> bool:
    """All vertices of ``contained`` inside ``containing``. GeoGeometry.kt:932-939."""
    return bool(polygon_contains(contained[:, 1], contained[:, 0], containing).all())


def area_ring(ring: np.ndarray) -> float:
    """Planar shoelace in a local-meter frame. GeoGeometry.kt:1236-1260."""
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] <= 3:
        raise ValueError("polygon should have at least three elements")
    x_ref, y_ref = polygon_center(ring)
    x = (ring[:, 0] - x_ref) * (WGS84_RADIUS * math.pi / 180) * math.cos(y_ref * math.pi / 180)
    y = (ring[:, 1] - y_ref) * to_radians(6378137.0)
    total = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return 0.5 * abs(total)


def area_polygon(rings: list[np.ndarray]) -> float:
    """Outer minus holes. GeoGeometry.kt:1282-1290."""
    a = area_ring(rings[0])
    for hole in rings[1:]:
        a -= area_ring(hole)
    return a


def area_bbox(bbox) -> float:
    """GeoGeometry.kt:1266-1273."""
    w, s, e, n = bbox
    lat_dist = haversine_scalar(s, w, n, w)
    lon_dist = haversine_scalar(n, w, n, e)
    return lat_dist * lon_dist


def wrap(n, min_v: float, max_v: float):
    """Periodic wrap into [min, max). GeoGeometry.kt:1106-1112."""
    n = np.asarray(n, dtype=np.float64)
    span = max_v - min_v
    wrapped = ((n - min_v) % span + span) % span + min_v
    return np.where((n >= min_v) & (n < max_v), n, wrapped)


def lines_cross_vec(x1, y1, x2, y2, u1, v1, u2, v2):
    """Vectorized lines_cross: segment 1 per-row arrays, segment 2
    scalar or arrays (GeoGeometry.kt:345-420 semantics, all branches
    evaluated under np.errstate and selected per-row)."""
    args = [np.atleast_1d(np.asarray(a, dtype=np.float64))
            for a in (x1, y1, x2, y2, u1, v1, u2, v2)]
    shape = np.broadcast_shapes(*(a.shape for a in args))
    x1, y1, x2, y2, u1, v1, u2, v2 = (
        np.broadcast_to(a, shape) for a in args
    )

    def between(a, b, val):
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return (lo <= val) & (val <= hi)

    l1v = x1 == x2
    l2v = u1 == u2
    with np.errstate(divide="ignore", invalid="ignore"):
        # both vertical
        both = (
            l1v & l2v & (x1 == u1)
            & (np.minimum(y1, y2) <= np.maximum(v1, v2))
            & (np.minimum(v1, v2) <= np.maximum(y1, y2))
        )
        # line1 vertical only
        g2 = (v2 - v1) / (u2 - u1)
        a2 = v1 - g2 * u1
        yi1 = a2 + g2 * x1
        only1 = l1v & ~l2v & between(y1, y2, yi1) & between(v1, v2, yi1)
        # line2 vertical only
        g1 = (y2 - y1) / (x2 - x1)
        a1 = y1 - g1 * x1
        yi2 = a1 + g1 * u1
        only2 = ~l1v & l2v & between(y1, y2, yi2) & between(v1, v2, yi2)
        # general
        same_grad = (g1 - g2) == 0.0
        colinear = same_grad & (np.abs(a1 - a2) < 1e-7) & (
            between(x1, x2, u1) | between(x1, x2, u2)
        )
        xi = -(a1 - a2) / (g1 - g2)
        yi = a1 + g1 * xi
        general = (
            ~same_grad
            & ((x1 - xi) * (xi - x2) >= 0)
            & ((u1 - xi) * (xi - u2) >= 0)
            & ((y1 - yi) * (yi - y2) >= 0)
            & ((v1 - yi) * (yi - v2) >= 0)
        )
    neither = ~l1v & ~l2v
    return both | only1 | only2 | (neither & (colinear | general))


def segment_intersects_ring(lat1, lon1, lat2, lon2, ring: np.ndarray):
    """LineString-vs-Polygon intersects (geojson-intersect.kt:55-131
    composition): endpoint containment OR any edge crossing; vectorized
    over segments against one closure ring."""
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    hit = polygon_contains(lat1, lon1, ring) | polygon_contains(lat2, lon2, ring)
    for i in range(ring.shape[0] - 1):
        todo = ~hit
        if not todo.any():
            break
        hit[todo] = lines_cross_vec(
            lon1[todo], lat1[todo], lon2[todo], lat2[todo],
            ring[i, 0], ring[i, 1], ring[i + 1, 0], ring[i + 1, 1],
        )
    return hit


def _normalize_lon_vec(ref, lon):
    """normalizedLongitude (geojson-intersect.kt:146-157) vectorized —
    one adjustment suffices for inputs within one wrap of ±180."""
    ref = np.asarray(ref, dtype=np.float64)
    lon = np.broadcast_to(np.asarray(lon, dtype=np.float64), ref.shape).copy()
    d = lon - ref
    lon = np.where(d > 180.0, lon - 360.0, lon)
    lon = np.where(d < -180.0, lon + 360.0, lon)
    return lon


def _bboxes_intersect_vec(w1, s1, e1, n1, poly_bbox) -> np.ndarray:
    """Vectorized twin of the reference's bboxesIntersect
    (geojson-intersect.kt:21-53): per bbox pick the shorter east-going
    longitude arc (span mod 360 > 180 -> swap), split wrap-around arcs
    at ±180, interval-overlap any pair; plain latitude interval."""
    pw, ps, pe, pn = (float(v) for v in poly_bbox)

    def norm(w, e):
        span = (e - w + 360.0) % 360.0
        swap = span > 180.0
        return np.where(swap, e, w), np.where(swap, w, e)

    def arcs(w, e):
        nw, ne = norm(w, e)
        wrapped = nw > ne
        # arc1 always [nw, min(ne, 180)-ish]; arc2 only when wrapped
        a1 = (nw, np.where(wrapped, 180.0, ne))
        a2 = (np.where(wrapped, -180.0, nw), ne)
        return a1, a2, wrapped

    (l1a, l1b), (l2a, l2b), lwrap = arcs(
        np.asarray(w1, dtype=np.float64), np.asarray(e1, dtype=np.float64)
    )
    (p1a, p1b), (p2a, p2b), pwrap = arcs(np.float64(pw), np.float64(pe))

    def overlap(a0, a1_, b0, b1_):
        return ~((a0 > b1_) | (a1_ < b0))

    lon_ok = overlap(l1a, l1b, p1a, p1b)
    lon_ok |= pwrap & overlap(l1a, l1b, p2a, p2b)
    lon_ok |= lwrap & overlap(l2a, l2b, p1a, p1b)
    lon_ok |= lwrap & pwrap & overlap(l2a, l2b, p2a, p2b)
    lat_ok = ~((np.asarray(n1) < ps) | (np.asarray(s1) > pn))
    return lon_ok & lat_ok


def line_intersects_polygon(lat1, lon1, lat2, lon2, rings: list[np.ndarray]):
    """Vectorized Geometry.intersects(LineString[p1,p2], Polygon) with
    the FULL dispatch semantics (geojson-intersect.kt:5-19 + 55-71):
    the shorter-arc bbox prefilter (which is SEMANTIC, not just a
    shortcut — a polygon whose raw lon span exceeds 180° is read as
    antimeridian-crossing and can veto pairs a planar reading would
    accept), then any antimeridian-normalized crossing of an outer-ring
    edge OR hole-aware containment of the segment start.  Parity with
    kernels.intersect.intersects is pytest-pinned incl. a >180°-span
    polygon.  This is the uniform-type hot path; the per-row JSON
    dispatch (functions.udfs.make_intersects_udf) remains the
    generality path."""
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    outer = np.asarray(rings[0], dtype=np.float64)
    holes = [np.asarray(h, dtype=np.float64) for h in rings[1:]]
    pts = np.concatenate([outer] + holes)
    poly_bbox = (
        pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
    )
    in_bbox = _bboxes_intersect_vec(
        np.minimum(lon1, lon2), np.minimum(lat1, lat2),
        np.maximum(lon1, lon2), np.maximum(lat1, lat2), poly_bbox,
    )
    # hole-aware contains of the segment start (geojson.kt:186-191)
    hit = in_bbox & polygon_with_holes_contains(lat1, lon1, outer, holes)
    # antimeridian-normalized crossing per outer edge (zipWithNext —
    # closed GeoJSON rings supply the closing edge themselves)
    nlon2 = _normalize_lon_vec(lon1, lon2)
    for i in range(outer.shape[0] - 1):
        todo = in_bbox & ~hit
        if not todo.any():
            break
        u1 = _normalize_lon_vec(lon1[todo], outer[i, 0])
        u2 = _normalize_lon_vec(lon1[todo], outer[i + 1, 0])
        hit[todo] = lines_cross_vec(
            lon1[todo], lat1[todo], nlon2[todo], lat2[todo],
            u1, outer[i, 1], u2, outer[i + 1, 1],
        )
    return hit


def random_points_in_polygon(rings: list, n: int, seed: int = 42) -> np.ndarray:
    """Seeded, hole-aware rejection sampler over a polygon's bbox —
    the engine's deterministic take on Geometry.randomPoints
    (geojson.kt:886-924: sample bbox-uniform, keep points the polygon
    contains and no hole contains).  Returns (n, 2) [lon, lat]."""
    rng = np.random.default_rng(seed)
    outer = np.asarray(rings[0], dtype=np.float64)
    holes = [np.asarray(h, dtype=np.float64) for h in rings[1:]]
    w, s, e, n_ = bounding_box(outer)
    out = []
    while len(out) < n:
        batch = max(64, 2 * (n - len(out)))
        lon = rng.uniform(w, e, batch)
        lat = rng.uniform(s, n_, batch)
        keep = polygon_contains(lat, lon, outer)
        for h in holes:
            keep &= ~polygon_contains(lat, lon, h)
        for lo, la in zip(lon[keep], lat[keep]):
            out.append((lo, la))
            if len(out) == n:
                break
    return np.asarray(out)


def distance_to_multipolygon(lat, lon, polygons: list[list[np.ndarray]]):
    """Min distance over polygons (GeoGeometry.kt:757-763); each polygon
    is [outer, holes...] and only the outer ring bounds distance (the
    reference dispatches to distanceToPolygon per outer ring)."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    best = np.full(lat.shape[0], np.inf)
    for rings in polygons:
        best = np.minimum(best, distance_to_polygon(lat, lon, rings[0]))
    return best
