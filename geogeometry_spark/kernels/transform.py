"""Geometry ETL transforms: convex hull, Douglas-Peucker simplify,
rotate/scale, polygon expansion, right-hand-rule normalization, DMS.

References:
- convex hull (Andrew's monotone chain): GeoGeometry.kt:995-1071
  (`polygonForPoints`), rightTurn GeoGeometry.kt:1079-1081
- DP simplify: GeoGeometry.kt:1376-1410 (incl. its copyOfRange
  endpoint quirks, replicated verbatim)
- rotateAround: GeoGeometry.kt:863-887
- scaleX/scaleY: geojson-extensions.kt:92-188 (bbox-midpoint centroid,
  geojson-extensions.kt:5-21)
- expandPolygon: GeoGeometry.kt:952-988
- right-hand rule / isClockWise: GeoGeometry.kt:1421-1515
- DMS accessors: geojson.kt:349-367; toDecimalDegree GeoGeometry.kt:1092-1104
"""

from __future__ import annotations

import numpy as np

from .geometry import (
    distance_to_segment,
    haversine_scalar,
    translate,
    translate_latitude,
    translate_longitude,
)

DEG2RAD = np.pi / 180.0


# --------------------------------------------------------------------------
# convex hull
# --------------------------------------------------------------------------

def _right_turn(a, b, c) -> bool:
    # GeoGeometry.kt:1079-1081 (strict >)
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0


def convex_hull(points: np.ndarray) -> np.ndarray:
    """polygonForPoints (GeoGeometry.kt:995-1071): points (n,2) [lon,lat]
    -> closed hull ring.  Sort by (lon, lat); upper+lower chains via
    rightTurn; closes the ring."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.shape[0] < 3:
        raise ValueError("need at least 3 points for a polygon")
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    s = pts[order]
    n = s.shape[0]

    upper = [s[0], s[1]]
    for i in range(2, n):
        upper.append(s[i])
        while len(upper) > 2 and not _right_turn(upper[-3], upper[-2], upper[-1]):
            del upper[-2]
    lower = [s[n - 1], s[n - 2]]
    for i in range(n - 3, -1, -1):
        lower.append(s[i])
        while len(lower) > 2 and not _right_turn(lower[-3], lower[-2], lower[-1]):
            del lower[-2]
    result = upper + lower[1:-1]
    result.append(result[0])
    return np.array(result)


# --------------------------------------------------------------------------
# Douglas-Peucker simplify
# --------------------------------------------------------------------------

def _distance_to_line(l1, l2, p) -> float:
    # distanceToLine (GeoGeometry.kt:699-701): args are [lon,lat] points,
    # passed to distance(x=lat, y=lon, ...)
    return float(
        distance_to_segment(l1[1], l1[0], l2[1], l2[0], p[1], p[0])[0]
    )


def simplify_line(points: np.ndarray, tolerance_m: float) -> np.ndarray:
    """simplifyLine (GeoGeometry.kt:1376-1410), replicated verbatim
    including the copyOfRange(index, size-1) right-split bound."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    dmax = 0.0
    index = 0
    if n == 3:
        dmax = _distance_to_line(pts[0], pts[n - 1], pts[1])
    for i in range(2, n - 1):
        d = _distance_to_line(pts[0], pts[n - 1], pts[i])
        if d > dmax:
            index = i
            dmax = d
    if dmax > tolerance_m and n > 3:
        left = simplify_line(pts[0:index], tolerance_m)
        right = simplify_line(pts[index : n - 1], tolerance_m)
        return np.concatenate([left, right])
    if dmax > tolerance_m and n <= 3:
        return pts
    if n > 2:
        return np.array([pts[0], pts[n - 1]])
    return pts


def simplify_polygon(rings: list[np.ndarray], tolerance_m: float) -> list[np.ndarray]:
    return [simplify_line(r, tolerance_m) for r in rings]


def simplify_multipolygon(
    polygons: list[list[np.ndarray]], tolerance_m: float
) -> list[list[np.ndarray]]:
    """simplifyMultiPolygon (GeoGeometry.kt:1335-1346): per-polygon
    simplifyPolygon, order preserved."""
    return [simplify_polygon(p, tolerance_m) for p in polygons]


# --------------------------------------------------------------------------
# rotate / scale / expand
# --------------------------------------------------------------------------

def rotate_around(anchor_lat, anchor_lon, lat, lon, degrees: float):
    """rotateAround (GeoGeometry.kt:863-887), vectorized over points.
    Returns (lat, lon) arrays.  Counter-clockwise for positive degrees."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    from .geometry import haversine

    x = haversine(
        np.full_like(lat, anchor_lat), np.full_like(lon, anchor_lon),
        np.full_like(lat, anchor_lat), lon,
    )
    x = np.where(anchor_lon > lon, -x, x)
    y = haversine(
        np.full_like(lat, anchor_lat), np.full_like(lon, anchor_lon),
        lat, np.full_like(lon, anchor_lon),
    )
    y = np.where(anchor_lat > lat, -y, y)
    r = degrees * DEG2RAD
    new_x = x * np.cos(r) - y * np.sin(r)
    new_y = x * np.sin(r) + y * np.cos(r)
    # translate(anchor, newX, newY) = translate(lat, lon, latM=newY, lonM=newX)
    lon2, lat2 = translate(
        np.full_like(lat, anchor_lat), np.full_like(lon, anchor_lon), new_y, new_x
    )
    return lat2, lon2


def bbox_centroid(points: np.ndarray) -> tuple[float, float]:
    """centroid (geojson-extensions.kt:5-21): bbox midpoint, (lon, lat)."""
    pts = np.asarray(points, dtype=np.float64)
    return (
        (pts[:, 0].min() + pts[:, 0].max()) / 2.0,
        (pts[:, 1].min() + pts[:, 1].max()) / 2.0,
    )


def scale_x(points: np.ndarray, percent: float) -> np.ndarray:
    """scaleX (geojson-extensions.kt:106-118): horizontal scale about the
    bbox centroid; distances via haversine, translate along lon."""
    pts = np.asarray(points, dtype=np.float64)
    c_lon, _ = bbox_centroid(pts)
    from .geometry import haversine

    dist_x = haversine(pts[:, 1], pts[:, 0], pts[:, 1], np.full(len(pts), c_lon))
    translate_x = dist_x - dist_x * (percent / 100.0)
    direction = np.where(pts[:, 0] <= c_lon, 1.0, -1.0)
    lon2, lat2 = translate(pts[:, 1], pts[:, 0], 0.0, translate_x * direction)
    return np.stack([lon2, lat2], axis=1)


def scale_y(points: np.ndarray, percent: float) -> np.ndarray:
    """scaleY (geojson-extensions.kt:154-166)."""
    pts = np.asarray(points, dtype=np.float64)
    _, c_lat = bbox_centroid(pts)
    from .geometry import haversine

    dist_y = haversine(pts[:, 1], pts[:, 0], np.full(len(pts), c_lat), pts[:, 0])
    translate_y = dist_y - dist_y * (percent / 100.0)
    direction = np.where(pts[:, 1] >= c_lat, -1.0, 1.0)
    lon2, lat2 = translate(pts[:, 1], pts[:, 0], translate_y * direction, 0.0)
    return np.stack([lon2, lat2], axis=1)


def expand_polygon(meters: float, ring: np.ndarray) -> np.ndarray:
    """expandPolygon (GeoGeometry.kt:952-973): 8 translated copies of
    each vertex -> convex hull."""
    pts = np.asarray(ring, dtype=np.float64)
    lat = pts[:, 1]
    lon = pts[:, 0]
    lon_pos, _ = translate_longitude(lat, lon, meters)
    lon_neg, _ = translate_longitude(lat, lon, -meters)
    _, lat_pos = translate_latitude(lat, lon, meters)
    _, lat_neg = translate_latitude(lat, lon, -meters)
    cloud = np.concatenate(
        [
            np.stack([lon_pos, lat_pos], axis=1),
            np.stack([lon_pos, lat_neg], axis=1),
            np.stack([lon_neg, lat_pos], axis=1),
            np.stack([lon_neg, lat_neg], axis=1),
            np.stack([lon_pos, lat], axis=1),
            np.stack([lon_neg, lat], axis=1),
            np.stack([lon, lat_pos], axis=1),
            np.stack([lon, lat_neg], axis=1),
        ]
    )
    return convex_hull(cloud)


# --------------------------------------------------------------------------
# winding / right-hand rule
# --------------------------------------------------------------------------

def is_clockwise(ring: np.ndarray) -> bool:
    """isClockWise (GeoGeometry.kt:1503-1515): shoelace-sign sum > 0."""
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] < 2:
        return True
    s = np.sum(
        (pts[1:, 0] - pts[:-1, 0]) * (pts[1:, 1] + pts[:-1, 1])
    )
    return bool(s > 0)


def ensure_rhr(rings: list[np.ndarray]) -> list[np.ndarray]:
    """ensureFollowsRightHandSideRule (GeoGeometry.kt:1421-1446): outer
    ring counter-clockwise, holes clockwise."""
    if not rings:
        return rings
    out = []
    outer = np.asarray(rings[0], dtype=np.float64)
    out.append(outer if not is_clockwise(outer) else outer[::-1].copy())
    for hole in rings[1:]:
        h = np.asarray(hole, dtype=np.float64)
        out.append(h if is_clockwise(h) else h[::-1].copy())
    return out


# --------------------------------------------------------------------------
# DMS
# --------------------------------------------------------------------------

def to_decimal_degree(direction: str | None, degrees: int, minutes: int,
                      seconds: float) -> float:
    """GeoGeometry.kt:1092-1104."""
    factor = -1.0 if direction and direction[0] in "wWsS" else 1.0
    return (degrees + minutes / 60.0 + seconds / 60.0 / 60.0) * factor


def dms(value: float) -> tuple[int, int, float]:
    """Degree.degree/minutes/seconds (geojson.kt:349-353)."""
    a = abs(value)
    d = int(np.floor(a))
    m = int(np.floor((a - d) * 60))
    s = (a - d - m / 60.0) * 60.0 * 60.0
    return d, m, s


def human_readable(lat: float, lon: float) -> str:
    """PointCoordinates.humanReadable (geojson.kt:356-367); seconds
    rounded half-up to 2 decimals (roundToDecimals)."""
    def fmt(v: float, pos: str, neg: str) -> str:
        d, m, s = dms(v)
        s2 = np.floor(s * 100.0 + 0.5) / 100.0
        letter = pos if v >= 0 else neg
        return f"{d}° {m}' {s2!r}\" {letter}"

    return f"{fmt(lat, 'N', 'S')}, {fmt(lon, 'E', 'W')}"
