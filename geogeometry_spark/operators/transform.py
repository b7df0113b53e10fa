"""Geometry ETL operators: DMS, translate, rectangle, noise filter,
rotate/scale (native Columns), grouped convex hull / DP simplify
(applyInPandas grouped maps).

Native ops mirror GeoGeometry.kt / geojson.kt arithmetic exactly so the
DuckDB oracles run the same float64 op order; grouped maps wrap the
transform kernels (one geometry per group — the reference's unit of
work, distributed per-group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C

EARTH_CIRCUMFERENCE_METERS = C.EARTH_RADIUS_METERS * np.pi * 2.0
DEGREE_LATITUDE_METERS = C.EARTH_RADIUS_METERS * np.pi / 180.0


# --------------------------------------------------------------------------
# DMS (geojson.kt:349-367, GeoGeometry.kt:1092-1104) — native
# --------------------------------------------------------------------------

def dms_cols(v, pos: str, neg: str) -> dict:
    a = F.abs(v)
    d = F.floor(a)
    m = F.floor((a - d) * 60)
    s = (a - d - m / F.lit(60.0)) * F.lit(60.0) * F.lit(60.0)
    s2 = F.floor(s * 100.0 + 0.5) / 100.0  # roundToDecimals(s, 2)
    letter = F.when(v >= 0, F.lit(pos)).otherwise(F.lit(neg))
    return {"d": d.cast("int"), "m": m.cast("int"), "s": s, "s2": s2,
            "letter": letter}


def human_readable_col(lat, lon):
    """humanReadable (geojson.kt:356-367): 52° 31' 47.39" N, ..."""
    la = dms_cols(lat, "N", "S")
    lo = dms_cols(lon, "E", "W")
    q = F.lit('" ')
    return F.concat(
        la["d"].cast("string"), F.lit("° "), la["m"].cast("string"), F.lit("' "),
        la["s2"].cast("string"), q, la["letter"], F.lit(", "),
        lo["d"].cast("string"), F.lit("° "), lo["m"].cast("string"), F.lit("' "),
        lo["s2"].cast("string"), q, lo["letter"],
    )


def dms_sql(v: str, pos: str, neg: str) -> dict:
    a = f"abs({v})"
    d = f"floor({a})"
    m = f"floor(({a} - {d}) * 60)"
    s = f"(({a} - {d} - {m} / 60.0) * 60.0 * 60.0)"
    s2 = f"(floor({s} * 100.0 + 0.5) / 100.0)"
    letter = f"(CASE WHEN ({v}) >= 0 THEN '{pos}' ELSE '{neg}' END)"
    return {"d": f"CAST({d} AS INT)", "m": f"CAST({m} AS INT)", "s": s,
            "s2": s2, "letter": letter}


def human_readable_sql(lat: str, lon: str) -> str:
    la = dms_sql(lat, "N", "S")
    lo = dms_sql(lon, "E", "W")
    return (
        f"(CAST({la['d']} AS VARCHAR) || '° ' || CAST({la['m']} AS VARCHAR)"
        f" || chr(39) || ' ' || CAST({la['s2']} AS VARCHAR) || '\" ' || {la['letter']}"
        f" || ', ' || CAST({lo['d']} AS VARCHAR) || '° ' || CAST({lo['m']} AS VARCHAR)"
        f" || chr(39) || ' ' || CAST({lo['s2']} AS VARCHAR) || '\" ' || {lo['letter']})"
    )


# --------------------------------------------------------------------------
# translate / rectangle (GeoGeometry.kt:430-515) — native
# --------------------------------------------------------------------------

def translate_cols(lat, lon, lat_meters, lon_meters):
    """translate (GeoGeometry.kt:479-487): lon first, then lat."""
    lon2 = lon + lon_meters / (
        F.cos(lat * F.lit(C.DEG2RAD)) * F.lit(EARTH_CIRCUMFERENCE_METERS / 360.0)
    )
    lat2 = lat + lat_meters / F.lit(DEGREE_LATITUDE_METERS)
    return lat2, lon2


def translate_sql(lat: str, lon: str, lat_m: str, lon_m: str) -> tuple[str, str]:
    lon2 = (
        f"(({lon}) + ({lon_m}) / (cos(({lat}) * {C.DEG2RAD!r})"
        f" * {EARTH_CIRCUMFERENCE_METERS / 360.0!r}))"
    )
    lat2 = f"(({lat}) + ({lat_m}) / {DEGREE_LATITUDE_METERS!r})"
    return lat2, lon2


def rectangle_cols(lat, lon, lat_meters: float, lon_meters: float) -> dict:
    """rectangleAroundCentroid (GeoGeometry.kt:504-515) -> w/s/e/n."""
    n_lat, e_lon = translate_cols(
        lat, lon, F.lit(lat_meters / 2), F.lit(lon_meters / 2)
    )
    s_lat, w_lon = translate_cols(
        lat, lon, F.lit(-lat_meters / 2), F.lit(-lon_meters / 2)
    )
    return {"west": w_lon, "south": s_lat, "east": e_lon, "north": n_lat}


# --------------------------------------------------------------------------
# rotate (GeoGeometry.kt:863-887) — native (haversine x2 + translate)
# --------------------------------------------------------------------------

def rotate_around_cols(anchor_lat: float, anchor_lon: float, lat, lon,
                       degrees: float):
    alat = F.lit(anchor_lat)
    alon = F.lit(anchor_lon)
    x = C.haversine(alat, alon, alat, lon)
    x = F.when(alon > lon, -x).otherwise(x)
    y = C.haversine(alat, alon, lat, alon)
    y = F.when(alat > lat, -y).otherwise(y)
    r = degrees * C.DEG2RAD
    new_x = x * F.lit(np.cos(r)) - y * F.lit(np.sin(r))
    new_y = x * F.lit(np.sin(r)) + y * F.lit(np.cos(r))
    return translate_cols(alat, alon, new_y, new_x)


def rotate_around_sql(anchor_lat: str, anchor_lon: str, lat: str, lon: str,
                      degrees: float) -> tuple[str, str]:
    x = C.haversine_sql(anchor_lat, anchor_lon, anchor_lat, lon)
    x = f"(CASE WHEN ({anchor_lon}) > ({lon}) THEN -{x} ELSE {x} END)"
    y = C.haversine_sql(anchor_lat, anchor_lon, lat, anchor_lon)
    y = f"(CASE WHEN ({anchor_lat}) > ({lat}) THEN -{y} ELSE {y} END)"
    r = degrees * C.DEG2RAD
    new_x = f"({x} * {np.cos(r)!r} - {y} * {np.sin(r)!r})"
    new_y = f"({x} * {np.sin(r)!r} + {y} * {np.cos(r)!r})"
    return translate_sql(anchor_lat, anchor_lon, new_y, new_x)


# --------------------------------------------------------------------------
# noise filter (GeoGeometry.kt:158-172) — window trim
# --------------------------------------------------------------------------

def filter_noise(df: DataFrame, percentage: float, lat_col: str = "lat",
                 lon_col: str = "lon",
                 group_cols: list[str] | None = None,
                 tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Sort by (lon, lat), discard int(n*p/2) rows from each end —
    per group when group_cols given (the distributed shape: one point
    cloud per group).

    The reference sorts by (lon, lat) only (GeoGeometry.kt:158-172),
    leaving WHICH of several coordinate-tied rows is trimmed at the
    boundary unspecified; pass ``tiebreak_cols`` (e.g. a unique id) to
    pin it — required for run-to-run determinism whenever duplicate
    coordinates can reach the trim cut (the sf0.1 oracle sweep caught
    exactly such a tie)."""
    part = group_cols or []
    w = Window.partitionBy(*part).orderBy(
        lon_col, lat_col, *(tiebreak_cols or [])
    )
    wn = Window.partitionBy(*part)
    out = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    discard = F.floor(F.col("_n") * F.lit(float(percentage)) / 2).cast("long")
    return out.where(
        (F.col("_rn") > discard) & (F.col("_rn") <= F.col("_n") - discard)
    ).drop("_rn", "_n")


# --------------------------------------------------------------------------
# grouped hull / simplify (applyInPandas)
# --------------------------------------------------------------------------

def grouped_convex_hull(df: DataFrame, group_col: str,
                        lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Convex hull per group (polygonForPoints, GeoGeometry.kt:995-1071)
    -> one row per hull vertex (group, vertex_idx, lon, lat)."""
    from ..kernels.transform import convex_hull

    schema = (
        f"{group_col} string, vertex_idx int, lon double, lat double"
    )

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 3:
            return pd.DataFrame(
                columns=[group_col, "vertex_idx", "lon", "lat"]
            )
        pts = np.stack(
            [pdf[lon_col].to_numpy(np.float64), pdf[lat_col].to_numpy(np.float64)],
            axis=1,
        )
        ring = convex_hull(pts)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "vertex_idx": np.arange(len(ring), dtype=np.int32),
                "lon": ring[:, 0],
                "lat": ring[:, 1],
            }
        )

    return df.groupBy(group_col).applyInPandas(hull, schema=schema)


def grouped_simplify(df: DataFrame, group_col: str, order_col: str,
                     tolerance_m: float, lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """Douglas-Peucker per group over order_col-sorted points
    (simplifyLine, GeoGeometry.kt:1376-1410)."""
    from ..kernels.transform import simplify_line

    schema = f"{group_col} string, vertex_idx int, lon double, lat double"

    def simp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pts = np.stack(
            [pdf[lon_col].to_numpy(np.float64), pdf[lat_col].to_numpy(np.float64)],
            axis=1,
        )
        out = simplify_line(pts, tolerance_m) if len(pts) >= 2 else pts
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "vertex_idx": np.arange(len(out), dtype=np.int32),
                "lon": out[:, 0],
                "lat": out[:, 1],
            }
        )

    return df.groupBy(group_col).applyInPandas(simp, schema=schema)


def grouped_concave_hull(df: DataFrame, group_col: str, k: int = 3,
                         lat_col: str = "lat", lon_col: str = "lon",
                         max_recurse: int = 60,
                         max_points: int = 300) -> DataFrame:
    """Concave hull per group (calculateConcaveHull,
    concave-hull.kt:361-389) -> one row per hull vertex.

    ``max_recurse`` is the reference's own attempt/cleanup budget knob
    (concave-hull.kt:361); ``max_points`` caps the per-group cloud with
    a deterministic stride sample — the heuristic is O(attempts * n^2)
    worst case, so unbounded groups would stall an executor core."""
    from ..kernels.concave_hull import concave_hull

    schema = f"{group_col} string, vertex_idx int, lon double, lat double"

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 3:
            return pd.DataFrame(columns=[group_col, "vertex_idx", "lon", "lat"])
        if len(pdf) > max_points:
            pdf = pdf.sort_values([lon_col, lat_col]).iloc[
                :: max(1, len(pdf) // max_points)
            ]
        pts = np.stack(
            [pdf[lon_col].to_numpy(np.float64), pdf[lat_col].to_numpy(np.float64)],
            axis=1,
        )
        ring = concave_hull(pts, k=k, max_recurse=max_recurse)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "vertex_idx": np.arange(len(ring), dtype=np.int32),
                "lon": ring[:, 0],
                "lat": ring[:, 1],
            }
        )

    return df.groupBy(group_col).applyInPandas(hull, schema=schema)
