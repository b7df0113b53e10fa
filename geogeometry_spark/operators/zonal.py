"""Raster <-> vector zonal statistics: per-polygon rollups over a tile
raster.

The reference's raster<->vector surface is tile assignment
(Tile.kt:212-228 coordinateToTile, Tile.kt:50-101 bbox/corners) plus
point-in-polygon (GeoGeometry.kt:237-295).  This operator composes the
two into the classic GIS "zonal statistics" rollup: given a RASTER
relation — one row per occupied WebMercator tile at a fixed zoom,
carrying an aggregate value (count, sum, ...) — and a config-scale set
of polygon ZONES, report each zone's tile count, total value, and mean.

Membership rule (deterministic, oracle-exact): a tile belongs to a zone
iff its CENTER is inside the zone polygon, tested in CONTINUOUS TILE
COORDINATES with the standard even-odd crossing rule.  Working in tile
space is what makes the twin bit-exact: the zone ring is projected to
tile coordinates ONCE, driver-side (numpy), and the resulting float64
constants are embedded verbatim in BOTH the Spark plan and the DuckDB
SQL; the per-row test is then pure IEEE-754 add/sub/mul/div/compare on
(tile_x + 0.5, tile_y + 0.5) — no trig, no logarithms, no libm calls
whose last-ulp behavior could differ between the JVM and DuckDB.  (The
lat/lon-space twin would need sinh/atan per tile center, where
java.lang.Math and C libm may disagree by 1 ulp.)

Scale design: the raster is the relation-scale side (10^12 documents
rasterize to at most 4^zoom occupied tiles, still billions at z15+);
zones ride the plan as literal constants exactly like the broadcast PIP
form (operators/pip_join.py).  The membership test is native Columns —
whole-stage codegen, zero Python in the hot path — and the rollup is
one partial aggregate keyed by zone_id: each task emits at most
|zones| partial rows, so the only shuffle is config-scale regardless of
raster size.  :func:`rasterize` itself is a single groupBy over the
point relation (map-side combine; tile keys are dense integers, so the
exchange carries one row per occupied tile per task).

Not supported: zones spanning the antimeridian (tile x wraps mod 2^z;
split such zones at lon 180 first — the covering operators
(kernels/covering.py) handle the split the same way).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C

__all__ = [
    "rasterize",
    "zonal_stats",
    "zonal_stats_oracle_sql",
]

# Tile.kt:212 — WebMercator latitude clamp
_MAX_LAT = 85.05112878


def _tile_space_ring(ring, zoom: int) -> list[tuple[float, float]]:
    """Project a closed [lon, lat] ring to CONTINUOUS tile coordinates
    at ``zoom`` (Tile.kt:212-228 without the int truncation).  Raises
    on antimeridian-spanning rings (x would wrap mod 2^zoom)."""
    n = float(1 << zoom)
    pts = []
    for lon, lat in ring:
        la = max(-_MAX_LAT, min(_MAX_LAT, float(lat)))
        fx = (float(lon) + 180.0) / 360.0 * n
        rad = math.radians(la)
        fy = (
            (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
            / 2.0
            * n
        )
        pts.append((fx, fy))
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    xs = [p[0] for p in pts]
    if max(xs) - min(xs) > n / 2.0:
        raise ValueError(
            "zone ring spans the antimeridian; split it at lon 180 first"
        )
    return pts


def _edges(pts: list[tuple[float, float]]):
    """(x1, y1, dx, dy) per non-horizontal edge; dx/dy precomputed in
    Python so both engines see the SAME literal doubles and the per-row
    expression is dx*(py-y1)/dy + x1 — identical IEEE op order."""
    m = len(pts)
    out = []
    for i in range(m):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % m]
        if y1 == y2:
            continue  # horizontal edge never satisfies the parity test
        out.append((x1, y1, x2 - x1, y2 - y1, y2))
    return out


def _crossing_col(px: Column, py: Column, pts) -> Column:
    """Even-odd crossing parity as ONE native boolean Column."""
    total = F.lit(0)
    for x1, y1, dx, dy, y2 in _edges(pts):
        straddles = (F.lit(y1) > py) != (F.lit(y2) > py)
        xint = F.lit(dx) * (py - F.lit(y1)) / F.lit(dy) + F.lit(x1)
        total = total + F.when(straddles & (px < xint), 1).otherwise(0)
    return total % 2 == 1


def _crossing_sql(px: str, py: str, pts) -> str:
    """DuckDB twin of :func:`_crossing_col` — same edges, same literal
    constants (repr), same op order."""
    terms = []
    for x1, y1, dx, dy, y2 in _edges(pts):
        straddles = f"(({y1!r} > {py}) <> ({y2!r} > {py}))"
        xint = f"({dx!r} * (({py}) - {y1!r}) / {dy!r} + {x1!r})"
        terms.append(
            f"CASE WHEN {straddles} AND (({px}) < {xint}) "
            f"THEN 1 ELSE 0 END"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def rasterize(
    points: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Points -> occupied-tile raster at ``zoom``: (tile_x, tile_y,
    n_points).  One groupBy with map-side combine; the exchange carries
    at most one row per occupied tile per task."""
    tx, ty = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    return (
        points.select(tx.alias("tile_x"), ty.alias("tile_y"))
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def zonal_stats(
    raster: DataFrame,
    zones: list,
    zoom: int,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    val_col: str = "n_points",
) -> DataFrame:
    """``zones`` is a list of (zone_id, ring) with rings as closed
    (lon, lat) vertex sequences (the geofence convention).  Returns
    (zone_id, n_tiles, total_val, mean_val_r3) — one row per zone with
    at least one member tile.

    The membership array per tile is built from |zones| native boolean
    crossing tests (codegen'd arithmetic, no UDF); explode drops tiles
    outside every zone before the config-scale final aggregate."""
    px = F.col(x_col).cast("double") + F.lit(0.5)
    py = F.col(y_col).cast("double") + F.lit(0.5)
    # array_except (native set expression) drops the null slots of
    # non-member zones; array_compact would rewrite to an interpreted
    # higher-order filter() per raster row — the house rule bans that
    # on relation-scale paths (zone ids are unique, so the dedup
    # behavior of array_except cannot change membership)
    members = F.array_except(
        F.array(
            *[
                F.when(
                    _crossing_col(px, py, _tile_space_ring(ring, zoom)),
                    F.lit(str(zid)),
                )
                for zid, ring in zones
            ]
        ),
        F.array(F.lit(None).cast("string")),
    )
    tagged = raster.select(
        F.col(val_col).alias("_v"),
        F.explode(members).alias("zone_id"),
    )
    agg = tagged.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("_v").alias("total_val"),
    )
    return agg.select(
        "zone_id",
        "n_tiles",
        "total_val",
        F.round(
            F.col("total_val").cast("double")
            / F.col("n_tiles").cast("double"),
            3,
        ).alias("mean_val_r3"),
    )


def zonal_stats_oracle_sql(
    points_subq: str,
    zones: list,
    zoom: int,
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of rasterize + zonal_stats over the same point
    relation: the tile_xy_sql raster CTE, then one branch per zone with
    the identical tile-space crossing boolean; UNION ALL (zones are
    config-scale).  Aggregates are exact BIGINTs with the same single
    rounded division."""
    xs, ys = C.tile_xy_sql(lat, lon, zoom)
    raster = (
        f"SELECT {xs} AS tile_x, {ys} AS tile_y, "
        f"count(*) AS n_points FROM {points_subq} "
        f"GROUP BY tile_x, tile_y"
    )
    px = "(CAST(tile_x AS DOUBLE) + 0.5)"
    py = "(CAST(tile_y AS DOUBLE) + 0.5)"
    branches = []
    for zid, ring in zones:
        cross = _crossing_sql(px, py, _tile_space_ring(ring, zoom))
        branches.append(
            f"SELECT '{zid}' AS zone_id, count(*) AS n_tiles, "
            f"sum(n_points) AS total_val, "
            f"round(CAST(sum(n_points) AS DOUBLE) "
            f"/ CAST(count(*) AS DOUBLE), 3) AS mean_val_r3 "
            f"FROM raster WHERE {cross} HAVING count(*) > 0"
        )
    return f"WITH raster AS ({raster}) " + " UNION ALL ".join(branches)
