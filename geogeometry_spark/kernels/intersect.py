"""Full Geometry x Geometry intersects / contains dispatch.

Faithful re-implementation of the reference's geometry predicates over
GeoJSON-shaped dicts ({"type": ..., "coordinates": ...} or
{"type": "GeometryCollection", "geometries": [...]}):

- on_line_segment:          geojson/geojson.kt:202-213 (cross/dot, eps 1e-10)
- contains (point-in-geom): geojson/geojson.kt:165-199
- bboxes_intersect:         geojson/geojson-intersect.kt:21-53
  (shorter-arc longitude normalization, wrap-aware interval overlap)
- intersects dispatch:      geojson/geojson-intersect.kt:5-19
- line-vs-*:                geojson/geojson-intersect.kt:55-88
- polygon-vs-*:             geojson/geojson-intersect.kt:90-131
- antimeridian-normalized line crossing: geojson-intersect.kt:146-171

All containment used by the intersect matrix is the OUTER-ring-only
ray-cast (GeoGeometry.kt:216-223 dispatches to ring[0]); only
Geometry.contains on a Polygon is hole-aware (geojson.kt:186-191).
Test matrix pinned by GeojsonTest.kt:157-390.

The hot distributed paths (segment-vs-ring, PIP join) have dedicated
vectorized kernels; this module is the generality path used by the
geometry-pair pandas UDF (functions.udfs.make_intersects_udf) where
each Arrow batch row may carry a different geometry type.
"""

from __future__ import annotations

import numpy as np

from . import geometry as kgeo

ON_SEGMENT_EPS = 1e-10

Geom = dict


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def on_line_segment(point, start, end) -> bool:
    """Point on segment via cross (collinearity, eps 1e-10) then dot
    (projection within [0, |seg|^2]).  geojson.kt:202-213."""
    px, py = point[0], point[1]
    sx, sy = start[0], start[1]
    ex, ey = end[0], end[1]
    cross = (py - sy) * (ex - sx) - (px - sx) * (ey - sy)
    if abs(cross) > ON_SEGMENT_EPS:
        return False
    dot = (px - sx) * (ex - sx) + (py - sy) * (ey - sy)
    if dot < 0:
        return False
    sq_len = (ex - sx) ** 2 + (ey - sy) ** 2
    return dot <= sq_len


def _points_of(geom: Geom):
    """Yield every [lon, lat] vertex of a geometry (for bbox)."""
    t = geom["type"]
    if t == "GeometryCollection":
        for g in geom["geometries"]:
            yield from _points_of(g)
        return
    c = geom.get("coordinates")
    if c is None:
        return
    if t == "Point":
        yield c
    elif t in ("MultiPoint", "LineString"):
        yield from c
    elif t in ("MultiLineString", "Polygon"):
        for ring in c:
            yield from ring
    elif t == "MultiPolygon":
        for poly in c:
            for ring in poly:
                yield from ring


def bbox(geom: Geom) -> tuple[float, float, float, float]:
    """(west, south, east, north) = coordinate min/max (the reference's
    Geometry.bbox() -> GeoGeometry.boundingBox, geojson.kt:290-309; a
    GeometryCollection folds member bboxes and errors when empty)."""
    pts = list(_points_of(geom))
    if not pts:
        raise ValueError(f"cannot compute bbox of empty {geom['type']}")
    lons = [p[0] for p in pts]
    lats = [p[1] for p in pts]
    return min(lons), min(lats), max(lons), max(lats)


def bboxes_intersect(b1, b2) -> bool:
    """geojson-intersect.kt:21-53: per bbox pick the shorter east-going
    longitude arc, split wrap-around arcs at +-180, then plain interval
    overlap; latitude is a plain interval check."""

    def normalize(w: float, e: float) -> tuple[float, float]:
        span = (e - w + 360.0) % 360.0
        return (e, w) if span > 180.0 else (w, e)

    def arcs(w: float, e: float):
        nw, ne = normalize(w, e)
        if nw <= ne:
            return [(nw, ne)]
        return [(nw, 180.0), (-180.0, ne)]

    w1, s1, e1, n1 = b1
    w2, s2, e2, n2 = b2
    lon_overlap = any(
        not (a0 > b1_ or a1 < b0)
        for a0, a1 in arcs(w1, e1)
        for b0, b1_ in arcs(w2, e2)
    )
    lat_overlap = not (n1 < s2 or s1 > n2)
    return lon_overlap and lat_overlap


def _ring_np(ring) -> np.ndarray:
    return np.asarray(ring, dtype=np.float64)


def _outer_contains(lat: float, lon: float, poly_coords) -> bool:
    """GeoGeometry.polygonContains(lat, lon, PolygonCoordinates) uses
    ONLY ring[0] — holes are ignored (GeoGeometry.kt:216-223)."""
    return bool(
        kgeo.polygon_contains(
            np.array([lat]), np.array([lon]), _ring_np(poly_coords[0])
        )[0]
    )


def _segments(line):
    return [(line[i], line[i + 1]) for i in range(len(line) - 1)]


def _normalized_longitude(reference: float, longitude: float) -> float:
    """geojson-intersect.kt:146-157."""
    adjusted = longitude
    diff = adjusted - reference
    while diff > 180:
        adjusted -= 360
        diff = adjusted - reference
    while diff < -180:
        adjusted += 360
        diff = adjusted - reference
    return adjusted


def _lines_cross_am(p1, p2, o1, o2) -> bool:
    """Antimeridian-aware crossing: normalize all longitudes to the
    first point's frame, then the planar linesCross
    (geojson-intersect.kt:163-171)."""
    ref = p1[0]

    def norm(p):
        return (_normalized_longitude(ref, p[0]), p[1])

    a, b, c, d = norm(p1), norm(p2), norm(o1), norm(o2)
    return kgeo.lines_cross(
        a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1]
    )


# --------------------------------------------------------------------------
# Geometry.contains(point)  — geojson.kt:165-199
# --------------------------------------------------------------------------

def contains(geom: Geom, point) -> bool:
    t = geom["type"]
    if t == "GeometryCollection":
        return any(contains(g, point) for g in geom["geometries"])
    c = geom.get("coordinates")
    if c is None:
        return False
    px, py = point[0], point[1]
    if t == "Point":
        return c[0] == px and c[1] == py
    if t == "MultiPoint":
        return any(p[0] == px and p[1] == py for p in c)
    if t == "LineString":
        return any(on_line_segment(point, s, e) for s, e in _segments(c))
    if t == "MultiLineString":
        return any(
            on_line_segment(point, s, e)
            for line in c
            for s, e in _segments(line)
        )
    if t == "Polygon":
        # hole-aware: outer contains AND no hole contains (geojson.kt:186-191)
        if not c:
            return False
        if not _outer_contains(py, px, c):
            return False
        return not any(_outer_contains(py, px, [hole]) for hole in c[1:])
    if t == "MultiPolygon":
        # per-polygon OUTER ring only (dispatches through
        # polygonContains(.., PolygonCoordinates), geojson.kt:194-197)
        return any(_outer_contains(py, px, poly) for poly in c)
    raise ValueError(f"unknown geometry type {t!r}")


# --------------------------------------------------------------------------
# Geometry.intersects(other)  — geojson-intersect.kt:5-19
# --------------------------------------------------------------------------

def intersects(a: Geom, b: Geom) -> bool:
    if not bboxes_intersect(bbox(a), bbox(b)):
        return False
    return _intersects_no_bbox(a, b)


def _intersects_no_bbox(a: Geom, b: Geom) -> bool:
    t = a["type"]
    if t == "GeometryCollection":
        return any(intersects(g, b) for g in a["geometries"])
    c = a.get("coordinates")
    if c is None:
        return False
    if t == "Point":
        return contains(b, c)
    if t == "MultiPoint":
        return any(contains(b, p) for p in c)
    if t == "LineString":
        return _intersects_line(c, b)
    if t == "MultiLineString":
        return any(_intersects_line(line, b) for line in c)
    if t == "Polygon":
        return _intersects_polygon(c, b)
    if t == "MultiPolygon":
        return any(_intersects_polygon(poly, b) for poly in c)
    raise ValueError(f"unknown geometry type {t!r}")


def _intersects_line(line, other: Geom) -> bool:
    """geojson-intersect.kt:55-88: per segment, dispatch on the other
    geometry's type."""
    ot = other["type"]
    oc = other.get("coordinates")
    if ot == "GeometryCollection":
        # the reference re-evaluates this whole-line recursion inside
        # its per-segment any{} (geojson-intersect.kt:79) — the member
        # check is segment-independent, so hoisting is result-identical
        # (both yield false for a segmentless line) and avoids
        # O(segments^2) duplicated work
        if len(line) < 2:
            return False
        return any(_intersects_line(line, g) for g in other["geometries"])
    for start, end in _segments(line):
        if ot == "Point":
            if oc is not None and on_line_segment(oc, start, end):
                return True
        elif ot == "MultiPoint":
            if oc is not None and any(
                on_line_segment(p, start, end) for p in oc
            ):
                return True
        elif ot == "LineString":
            if oc is not None and any(
                _lines_cross_am(start, end, os, oe)
                for os, oe in _segments(oc)
            ):
                return True
        elif ot == "MultiLineString":
            if oc is not None and any(
                _lines_cross_am(start, end, os, oe)
                for oline in oc
                for os, oe in _segments(oline)
            ):
                return True
        elif ot == "Polygon":
            # outer-ring edge crossing OR segment start inside
            # (hole-aware Geometry.contains, geojson-intersect.kt:69-71)
            if oc and (
                any(
                    _lines_cross_am(start, end, os, oe)
                    for os, oe in _segments(oc[0])
                )
                or contains(other, start)
            ):
                return True
        elif ot == "MultiPolygon":
            # per polygon: first-ring crossing OR outer-only containment
            # of the segment start (geojson-intersect.kt:73-77)
            if oc is not None and any(
                any(
                    _lines_cross_am(start, end, os, oe)
                    for os, oe in _segments(poly[0])
                )
                or _outer_contains(start[1], start[0], poly)
                for poly in oc
            ):
                return True
        else:
            # GeometryCollection handled by the hoisted early return
            raise ValueError(f"unknown geometry type {ot!r}")
    return False


def _intersects_polygon(poly, other: Geom) -> bool:
    """geojson-intersect.kt:90-131: any outer edge intersects the other
    geometry, else the vertex-containment shortcuts per type."""
    outer = poly[0]
    if any(
        _intersects_line([start, end], other)
        for start, end in _segments(outer)
    ):
        return True
    ot = other["type"]
    oc = other.get("coordinates")
    if ot == "Point":
        return oc is not None and _outer_contains(oc[1], oc[0], poly)
    if ot == "MultiPoint":
        return oc is not None and any(
            _outer_contains(p[1], p[0], poly) for p in oc
        )
    if ot == "GeometryCollection":
        return any(_intersects_polygon(poly, g) for g in other["geometries"])
    if ot == "LineString":
        return oc is not None and any(
            _outer_contains(p[1], p[0], poly) for p in oc
        )
    if ot == "MultiLineString":
        return oc is not None and any(
            _outer_contains(p[1], p[0], poly) for line in oc for p in line
        )
    if ot == "Polygon":
        if oc is None:
            return False
        # either polygon contains the other's first outer vertex
        # (geojson-intersect.kt:113-122)
        return _outer_contains(oc[0][0][1], oc[0][0][0], poly) or _outer_contains(
            outer[0][1], outer[0][0], oc
        )
    if ot == "MultiPolygon":
        return oc is not None and any(
            _outer_contains(op[0][0][1], op[0][0][0], poly)
            or _outer_contains(outer[0][1], outer[0][0], op)
            for op in oc
        )
    raise ValueError(f"unknown geometry type {ot!r}")


# --------------------------------------------------------------------------
# debug formatters — GeoGeometry.kt:1305-1323, geojson.kt:215-218
# --------------------------------------------------------------------------

def point_to_string(p) -> str:
    """"(longitude,latitude)" with Kotlin double rendering
    (GeoGeometry.kt:1309-1311)."""
    return f"({_kt_double(p[0])},{_kt_double(p[1])})"


def line_to_string(line) -> str:
    """"(x1,y1),(x2,y2),..." (GeoGeometry.kt:1317-1323)."""
    return ",".join(point_to_string(p) for p in line)


def stringify(coords) -> str:
    """geojson.kt:215-218: "[lon,lat]" for a point, recursively
    "[a, b, ...]" (joinToString ", ") for nested coordinate arrays."""
    if not isinstance(coords[0], (list, tuple, np.ndarray)):
        return f"[{_kt_double(coords[0])},{_kt_double(coords[1])}]"
    return "[" + ", ".join(stringify(c) for c in coords) + "]"


_URL_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = "0123456789ABCDEF"


def url_encode(s: str) -> str:
    """RFC 3986 percent-encode over UTF-8 bytes, byte-for-byte the
    reference's String.urlEncode (json-helpers.kt:17-33): unreserved
    ASCII kept, everything else %XX uppercase-hex."""
    out = []
    for b in s.encode("utf-8"):
        c = chr(b)
        if c in _URL_UNRESERVED:
            out.append(c)
        else:
            out.append("%" + _HEX[b >> 4] + _HEX[b & 0x0F])
    return "".join(out)


def geojson_io_url(feature_collection_json: str) -> str:
    """geojson.io inspection URL for a FeatureCollection JSON string
    (json-helpers.kt:6-12)."""
    return (
        "https://geojson.io/#data="
        + url_encode("data:application/json," + feature_collection_json)
    )


def _kt_double(v: float) -> str:
    """Kotlin/JVM Double.toString: shortest digits (JDK 19+ semantics,
    same digits python repr produces), rendered plain for 1e-3 <= |v| <
    1e7 and as computerized scientific notation ('5.0E-4', '1.23E7' —
    uppercase E, no '+', one digit before the point) outside — python
    repr switches at 1e-4/1e16, so plain repr would diverge there."""
    import math as _math
    from decimal import Decimal

    f = float(v)
    if _math.isnan(f):
        return "NaN"
    if _math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    sign = "-" if _math.copysign(1.0, f) < 0 else ""
    if f == 0.0:
        return sign + "0.0"
    d = Decimal(repr(abs(f))).normalize()
    tup = d.as_tuple()
    digits = "".join(map(str, tup.digits))
    e = len(digits) - 1 + tup.exponent  # decimal exponent of the value
    if -3 <= e <= 6:
        if e >= 0:
            int_part = digits[: e + 1].ljust(e + 1, "0")
            frac = digits[e + 1 :] or "0"
            return f"{sign}{int_part}.{frac}"
        return sign + "0." + "0" * (-e - 1) + digits
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{e}"


def ensure_has_altitude(geom: Geom) -> Geom:
    """Append altitude 0.0 to every 2d position (geojson.kt:241-288);
    3d positions pass through unchanged."""

    def fix_pt(p):
        return list(p) if len(p) == 3 else list(p) + [0.0]

    t = geom["type"]
    if t == "GeometryCollection":
        return {
            "type": t,
            "geometries": [ensure_has_altitude(g) for g in geom["geometries"]],
        }
    c = geom.get("coordinates")
    if c is None:
        return dict(geom)
    if t == "Point":
        c2 = fix_pt(c)
    elif t in ("MultiPoint", "LineString"):
        c2 = [fix_pt(p) for p in c]
    elif t in ("MultiLineString", "Polygon"):
        c2 = [[fix_pt(p) for p in ring] for ring in c]
    elif t == "MultiPolygon":
        c2 = [[[fix_pt(p) for p in ring] for ring in poly] for poly in c]
    else:
        raise ValueError(f"unknown geometry type {t!r}")
    return {"type": t, "coordinates": c2}
