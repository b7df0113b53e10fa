"""Tile assignment — raster<->vector half of the flagship job.

The zoom-22 tile is computed once with native Mercator Column math
(Tile.kt:212-228); every ancestor is a pair of right-shifts
(Tile.kt:259-272), so the 23-assignments-per-point explode
(Tile.kt:284-285, TileTest.kt:180-190) is `explode(sequence)` +
`shiftright` — whole-stage codegen end to end, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C


def with_tile(df: DataFrame, zoom: int, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    x, y = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    return (
        df.withColumn("zoom", F.lit(zoom))
        .withColumn("tile_x", x)
        .withColumn("tile_y", y)
    )


def assign_tiles(
    df: DataFrame,
    zooms: list[int] | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_zoom: int = 22,
) -> DataFrame:
    """One output row per (input row, zoom): tile_x/tile_y at each zoom.

    ``zooms=None`` reproduces the reference's PointCoordinates.tiles()
    (zoom 22 + all parents = 23 rows/point).  Parents derive from the
    max-zoom tile by shiftright(dz) — exactly x/2^dz (Tile.kt:274-282).
    """
    if zooms is None:
        zooms = list(range(max_zoom, -1, -1))
    x22, y22 = C.tile_xy(F.col(lat_col), F.col(lon_col), max_zoom)
    df = df.withColumn("_x22", x22).withColumn("_y22", y22)
    df = df.withColumn("zoom", F.explode(F.array(*[F.lit(z) for z in zooms])))
    # pyspark's F.shiftright only takes a literal shift; the SQL form
    # accepts a column expression for the shift amount
    return (
        df.withColumn(
            "tile_x", F.expr(f"cast(shiftright(_x22, {max_zoom} - zoom) as int)")
        )
        .withColumn(
            "tile_y", F.expr(f"cast(shiftright(_y22, {max_zoom} - zoom) as int)")
        )
        .drop("_x22", "_y22")
    )


def tile_heatmap(
    df: DataFrame,
    zooms: list[int],
    lat_col: str = "lat",
    lon_col: str = "lon",
    count_distinct_col: str | None = None,
) -> DataFrame:
    """Per-tile aggregation pyramid: count (+ approx distinct) per
    (zoom, tile_x, tile_y).  Catalyst runs this as partial+final hash
    aggregation (map-side combine), so the shuffle carries only one row
    per tile per task — skew-safe for counts."""
    tiles = assign_tiles(df, zooms=zooms, lat_col=lat_col, lon_col=lon_col)
    aggs = [F.count(F.lit(1)).alias("n")]
    if count_distinct_col:
        aggs.append(
            F.approx_count_distinct(F.col(count_distinct_col)).alias("approx_distinct")
        )
    return tiles.groupBy("zoom", "tile_x", "tile_y").agg(*aggs)


def tile_top_left_cols(x, y, zoom: int, fix_lon_lat: bool = False):
    """NW corner of a tile as native Columns (Tile.kt:187-207):
    lon = x/n*360-180, lat = clamp(atan(sinh(pi*(1-2y/n))) * 180/pi)."""
    n = float(1 << zoom)
    lon = x.cast("double") / F.lit(n) * 360.0 - 180.0
    lat = F.atan(F.sinh(F.lit(float(__import__("math").pi)) * (
        F.lit(1.0) - F.lit(2.0) * y.cast("double") / F.lit(n)
    ))) * F.lit(180.0) / F.lit(float(__import__("math").pi))
    lat = F.greatest(
        F.lit(C.TILE_MIN_LAT), F.least(F.lit(C.TILE_MAX_LAT), lat)
    )
    if fix_lon_lat:
        lon = F.when(lon <= -180.0, F.lit(180.0)).otherwise(lon)
        lat = F.when(lat >= 85.051128, F.lit(C.TILE_MIN_LAT)).otherwise(lat)
    return lon, lat


def with_tile_bbox(df: DataFrame, zoom: int,
                   x_col: str = "tile_x", y_col: str = "tile_y") -> DataFrame:
    """(west, south, east, north) of each tile (Tile.kt:91-102:
    bottom-right = topLeft of ((x+1)%n,(y+1)%n) with fixLonLat)."""
    n = 1 << zoom
    tl_lon, tl_lat = tile_top_left_cols(F.col(x_col), F.col(y_col), zoom)
    br_lon, br_lat = tile_top_left_cols(
        (F.col(x_col) + 1) % F.lit(n), (F.col(y_col) + 1) % F.lit(n),
        zoom, fix_lon_lat=True,
    )
    return df.withColumns(
        {"west": tl_lon, "south": br_lat, "east": br_lon, "north": tl_lat}
    )
