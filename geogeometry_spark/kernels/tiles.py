"""Slippy-map tile kernels, bit-for-bit with reference Tile.kt.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/tiles/Tile.kt
- MIN/MAX_LATITUDE, MAX_ZOOM: Tile.kt:126-129
- coordinateToTile:           Tile.kt:212-228
- topLeft (inverse Mercator): Tile.kt:187-207
- bbox:                       Tile.kt:91-102
- quadkey str/long:           Tile.kt:51-74, 149-178
- neighbors:                  Tile.kt:104-123
- parentTiles/parentAtZoom:   Tile.kt:259-282
- BoundingBox.tiles:          Tile.kt:244-257
- PointCoordinates.tiles:     Tile.kt:284-285
"""

from __future__ import annotations

import math

import numpy as np

MAX_ZOOM = 22
MIN_LATITUDE = -85.05112878
MAX_LATITUDE = 85.05112878


def coordinate_to_tile(lat, lon, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) int32 arrays. Tile.kt:212-228: lat clamped to Mercator
    bounds, x wraps modulo n, y truncates toward zero (Kotlin .toInt())."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    clamped = np.clip(lat, MIN_LATITUDE, MAX_LATITUDE)
    n = 1 << zoom
    x = ((lon + 180.0) / 360.0 * n) % n
    rad = clamped * math.pi / 180.0  # Tile.kt:20 toRadians: deg * PI / 180.0
    y = (1.0 - np.log(np.tan(rad) + 1 / np.cos(rad)) / math.pi) / 2.0 * n
    return x.astype(np.int32), np.trunc(y).astype(np.int32)


def top_left(x, y, zoom: int, fix_lon_lat: bool = False):
    """NW corner (lon, lat) of tile. Tile.kt:187-207."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    max_coords = 1 << zoom
    lon = x / max_coords * 360.0 - 180.0
    lat = np.clip(
        # Tile.kt:19 toDegrees: this * 180.0 / PI (left-to-right op order)
        np.arctan(np.sinh(math.pi * (1 - 2 * y / max_coords))) * 180.0 / math.pi,
        MIN_LATITUDE,
        MAX_LATITUDE,
    )
    if fix_lon_lat:
        lon = np.where(lon <= -180.0, 180.0, lon)
        lat = np.where(lat >= 85.051128, MIN_LATITUDE, lat)
    return lon, lat


def tile_bbox(x: int, y: int, zoom: int) -> tuple[float, float, float, float]:
    """(west, south, east, north). Tile.kt:91-102: bottomRight is the
    topLeft of ((x+1)%n, (y+1)%n) with fixLonLat=true."""
    if zoom == 0:
        return -180.0, MAX_LATITUDE, 180.0, MIN_LATITUDE  # Tile.kt:99-101 verbatim
    n = 1 << zoom
    tl_lon, tl_lat = top_left(x, y, zoom)
    br_lon, br_lat = top_left((x + 1) % n, (y + 1) % n, zoom, fix_lon_lat=True)
    return float(tl_lon[0]), float(br_lat[0]), float(br_lon[0]), float(tl_lat[0])


def quadkey(x, y, zoom: int) -> np.ndarray:
    """Base-4 quadkey strings of length ``zoom``. Tile.kt:51-61."""
    x = np.atleast_1d(np.asarray(x, dtype=np.int64))
    y = np.atleast_1d(np.asarray(y, dtype=np.int64))
    if zoom == 0:
        return np.full(x.shape[0], "", dtype="U1")
    digits = np.empty((x.shape[0], zoom), dtype=np.uint8)
    for i, z in enumerate(range(zoom, 0, -1)):
        mask = 1 << (z - 1)
        d = ((x & mask) != 0).astype(np.uint8) + 2 * ((y & mask) != 0).astype(np.uint8)
        digits[:, i] = d + ord("0")
    return digits.view(f"S{zoom}").reshape(x.shape[0]).astype(f"U{zoom}")


def quadkey_long(x, y, zoom: int) -> np.ndarray:
    """Packed-long quadkey (2 bits per level). Tile.kt:68-74."""
    x = np.atleast_1d(np.asarray(x, dtype=np.int64))
    y = np.atleast_1d(np.asarray(y, dtype=np.int64))
    v = np.zeros(x.shape[0], dtype=np.int64)
    for z in range(zoom, 0, -1):
        mask = 1 << (z - 1)
        digit = ((x & mask) != 0).astype(np.int64) + 2 * ((y & mask) != 0).astype(np.int64)
        v = (v << 2) | digit
    return v


def from_quadkey(qk: str) -> tuple[int, int, int]:
    """Tile.kt:149-166."""
    x = y = 0
    zoom = len(qk)
    for i, c in enumerate(qk):
        mask = 1 << (zoom - i - 1)
        if c == "1":
            x |= mask
        elif c == "2":
            y |= mask
        elif c == "3":
            x |= mask
            y |= mask
    return x, y, zoom


def from_quadkey_long(value: int, zoom: int) -> tuple[int, int, int]:
    """Tile.kt:171-178."""
    digits = []
    v = value
    for _ in range(zoom):
        digits.append(str(v & 3))
        v >>= 2
    return from_quadkey("".join(reversed(digits)))


NEIGHBOR_DIRECTIONS = (
    "east", "west", "north", "south",
    "north_west", "south_west", "south_east", "north_east",
)


def neighbors(x: int, y: int, zoom: int) -> dict[str, tuple[int, int, int]]:
    """8-neighborhood of a tile. Tile.kt:104-123: east/west wrap
    longitude mod 2^zoom; north clamps at y=0, south clamps at
    y=2^zoom-1 (no latitude wrap); diagonals compose the two moves
    (northWest = north.west, etc.).  At zoom 0 every neighbor is the
    tile itself.  Matrix pinned by TileTest.kt:122-177."""
    n = 1 << zoom
    east_x = (x + 1) % n
    west_x = (x - 1 + n) % n
    north_y = y - 1 if y > 0 else 0
    south_y = y + 1 if y < n - 1 else n - 1
    return {
        "east": (east_x, y, zoom),
        "west": (west_x, y, zoom),
        "north": (x, north_y, zoom),
        "south": (x, south_y, zoom),
        "north_west": (west_x, north_y, zoom),
        "south_west": (west_x, south_y, zoom),
        "south_east": (east_x, south_y, zoom),
        "north_east": (east_x, north_y, zoom),
    }


def parent_tiles(x: int, y: int, zoom: int) -> list[tuple[int, int, int]]:
    """Ancestor chain zoom-1 .. 0 by halving. Tile.kt:259-272."""
    out = []
    cx, cy = x, y
    for z in range(zoom - 1, -1, -1):
        cx //= 2
        cy //= 2
        out.append((cx, cy, z))
    return out


def parent_at_zoom(x: int, y: int, zoom: int, target: int) -> tuple[int, int, int]:
    """Tile.kt:274-282."""
    if not (0 <= target < zoom):
        raise ValueError("target zoom must be less than current zoom")
    scale = 1 << (zoom - target)
    return x // scale, y // scale, target


def bbox_tiles(bbox, zoom: int) -> set[tuple[int, int, int]]:
    """All tiles covering bbox (w,s,e,n) at zoom. Tile.kt:244-257."""
    w, s, e, n = bbox
    tlx, tly = coordinate_to_tile(n, w, zoom)
    brx, bry = coordinate_to_tile(s, e, zoom)
    return {
        (x, y, zoom)
        for x in range(int(tlx[0]), int(brx[0]) + 1)
        for y in range(int(tly[0]), int(bry[0]) + 1)
    }


def point_tiles(lat: float, lon: float) -> list[tuple[int, int, int]]:
    """Tile at MAX_ZOOM plus its 22 parents (23 assignments).
    Tile.kt:284-285."""
    x, y = coordinate_to_tile(lat, lon, MAX_ZOOM)
    x, y = int(x[0]), int(y[0])
    return [(x, y, MAX_ZOOM)] + parent_tiles(x, y, MAX_ZOOM)


def zoom_level(bbox, height: int = 512, width: int = 512,
               min_zoom: float = 22.0) -> float:
    """Viewport-fit zoom for a bbox (geojson.kt:412-430).
    bbox = (west, south, east, north)."""
    w, s, e, n = bbox

    def zoom(map_px: int, world_px: int, fraction: float) -> float:
        return math.floor(math.log(map_px / world_px / fraction) / math.log(2.0))

    lat_fraction = (n * math.pi / 180.0 - s * math.pi / 180.0) / math.pi
    lng_diff = e - w
    lng_fraction = (lng_diff + 360) / 360 if lng_diff < 0 else lng_diff / 360
    globe_px = 256
    return min(zoom(height, globe_px, lat_fraction),
               zoom(width, globe_px, lng_fraction), min_zoom)


def tile_bboxes_for_bbox(bbox, height: int = 512, width: int = 512,
                         min_zoom: float = 22.0) -> list[tuple]:
    """Chop a bbox into the lat/lon grid at its viewport zoom
    (GeoGeometry.kt:517-536).  Returns [(w, s, e, n)] cells."""
    w, s, e, n = bbox
    z = zoom_level(bbox, height, width, min_zoom)
    factor = 2.0 ** z
    lon_angle = 360.0 / factor
    lat_angle = 180.0 / factor
    most_west = w - w % lon_angle
    cells = []
    lat = s - s % lat_angle
    while lat < n:
        lon = most_west
        while lon < e:
            cells.append((lon, lat, lon + lon_angle, lat + lat_angle))
            lon += lon_angle
        lat += lat_angle
    return cells


def tile_path(x: int, y: int, zoom: int) -> str:
    """Canonical "z/x/y" form (Tile.kt:42)."""
    return f"{zoom}/{x}/{y}"


def from_path(path: str) -> tuple[int, int, int]:
    """Parse "z/x/y" (Tile.kt:133-144)."""
    z, x, y = path.split("/")
    return int(x), int(y), int(z)


def all_tiles_at(zoom: int):
    """Iterator over the full (x, y) grid at ``zoom`` (Tile.kt:230-240).
    Distributed twin: spark.range(4**zoom) + bit math."""
    n = 1 << zoom
    for x in range(n):
        for y in range(n):
            yield x, y


def all_tiles_df(spark, zoom: int):
    """Distributed full tile grid: spark.range(4^zoom) -> (x, y) via
    interleaved index split — test/bench data generation at scale."""
    from pyspark.sql import functions as F

    n = 1 << zoom
    return spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("tile_x"),
        (F.col("id") / n).cast("int").alias("tile_y"),
        F.lit(zoom).alias("zoom"),
    )
