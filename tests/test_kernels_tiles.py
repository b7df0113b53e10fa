"""Tile kernel parity with reference vectors (TileTest.kt)."""

import numpy as np

from geogeometry_spark.kernels import tiles
from geogeometry_spark.kernels import tiles as ktiles

# OSM-verified, TileTest.kt:95-99 — (zoom, x, y, lat, lon)
OSM_CASES = [
    (13, 4399, 2687, 52.49867, 13.34169),
    (14, 8802, 5373, 52.5200, 13.4050),
    (18, 232797, 103246, 35.659062, 139.698054),
]


def test_coordinate_to_tile_osm_vectors():
    for zoom, x, y, lat, lon in OSM_CASES:
        gx, gy = tiles.coordinate_to_tile(lat, lon, zoom)
        assert (int(gx[0]), int(gy[0])) == (x, y)
        tl_lon, tl_lat = tiles.top_left(x, y, zoom)
        assert tl_lat[0] >= lat
        assert tl_lon[0] <= lon


def test_roundtrip_random():
    # TileTest.kt:42-81 — 10k random coord<->tile round trips (reduced)
    rng = np.random.default_rng(42)
    lat = rng.uniform(tiles.MIN_LATITUDE + 0.01, tiles.MAX_LATITUDE - 0.01, 2000)
    lon = rng.uniform(-179.99, 179.99, 2000)
    for zoom in (1, 5, 10, 19, 22):
        x, y = tiles.coordinate_to_tile(lat, lon, zoom)
        n = 1 << zoom
        assert ((x >= 0) & (x < n)).all()
        assert ((y >= 0) & (y < n)).all()
        # the tile bbox contains the point
        tl_lon, tl_lat = tiles.top_left(x, y, zoom)
        br_lon, br_lat = tiles.top_left(x + 1, y + 1, zoom)
        assert (tl_lon <= lon).all() and (lon <= br_lon + 1e-9).all()
        assert (br_lat - 1e-9 <= lat).all() and (lat <= tl_lat).all()


def test_neighbors():
    # TileTest.kt:122-177 — wrap/clamp matrices are exercised through the
    # same modular arithmetic our Column builders use
    n = 1 << 5
    assert ((10 + 1) % n, 10) == (11, 10)
    assert ((0 - 1 + n) % n, 0) == (31, 0)  # west wrap at x=0


def test_quadkey_roundtrip():
    # TileTest.kt:255-269 (reduced count)
    rng = np.random.default_rng(42)
    for zoom in (1, 7, 13, 22):
        n = 1 << zoom
        xs = rng.integers(0, n, 200)
        ys = rng.integers(0, n, 200)
        qks = tiles.quadkey(xs, ys, zoom)
        for x, y, qk in zip(xs, ys, qks):
            assert tiles.from_quadkey(str(qk)) == (x, y, zoom)
        longs = tiles.quadkey_long(xs, ys, zoom)
        for x, y, v in zip(xs, ys, longs):
            assert tiles.from_quadkey_long(int(v), zoom) == (x, y, zoom)


def test_quadkey_prefix_is_ancestor():
    # TileTest.kt:272-282 — parent quadkey is a prefix of the child's
    x, y, zoom = 8802, 5373, 14
    qk = str(tiles.quadkey(x, y, zoom)[0])
    for px, py, pz in tiles.parent_tiles(x, y, zoom):
        pqk = str(tiles.quadkey(px, py, pz)[0]) if pz > 0 else ""
        assert qk.startswith(pqk)


def test_point_tiles_has_23_assignments():
    # TileTest.kt:180-190
    out = tiles.point_tiles(52.530888, 13.394904)
    assert len(out) == 23
    assert out[0][2] == 22
    assert out[-1][2] == 0
    # each is the parent of the previous
    for (cx, cy, cz), (px, py, pz) in zip(out, out[1:]):
        assert pz == cz - 1
        assert px == cx // 2 and py == cy // 2


def test_bbox_tiles():
    # TileTest.kt:285-295 — a bbox spans >= 2 tiles
    got = tiles.bbox_tiles((13.2, 52.4, 13.6, 52.6), 10)
    assert len(got) >= 2
    assert all(z == 10 for _, _, z in got)


def test_zoom_level_and_bbox_grid():
    from geogeometry_spark.kernels import tiles as kt

    # whole-world bbox at 512px -> zoom 0-1
    assert kt.zoom_level((-180.0, -85.0, 180.0, 85.0)) <= 1.0
    # tiny bbox clamps at the min_zoom cap (minOf, geojson.kt:429)
    assert kt.zoom_level((13.0, 52.0, 13.0000001, 52.0000001),
                         min_zoom=22.0) == 22.0
    # moderate bbox sits below the cap
    assert kt.zoom_level((13.0, 52.0, 13.001, 52.001)) == 18
    # grid chop covers the bbox (GeoGeometry.kt:517-536)
    cells = kt.tile_bboxes_for_bbox((13.0, 52.0, 13.5, 52.5), min_zoom=8)
    assert len(cells) >= 2
    w = min(c[0] for c in cells)
    e = max(c[2] for c in cells)
    s = min(c[1] for c in cells)
    n = max(c[3] for c in cells)
    assert w <= 13.0 and e >= 13.5 and s <= 52.0 and n >= 52.5


def test_tile_path_roundtrip():
    from geogeometry_spark.kernels import tiles as kt

    assert kt.tile_path(2200, 1343, 12) == "12/2200/1343"
    assert kt.from_path("12/2200/1343") == (2200, 1343, 12)
    assert len(list(kt.all_tiles_at(3))) == 64


def test_distance_to_multipolygon():
    import numpy as np

    from geogeometry_spark.kernels import geometry as kg

    p1 = np.array([[13.0, 52.0], [13.1, 52.0], [13.1, 52.1], [13.0, 52.1], [13.0, 52.0]])
    p2 = np.array([[14.0, 52.0], [14.1, 52.0], [14.1, 52.1], [14.0, 52.1], [14.0, 52.0]])
    d = kg.distance_to_multipolygon([52.05], [13.95], [[p1], [p2]])
    # nearer to p2's west edge (~0.05 deg) than p1's east edge (~0.85)
    expected = kg.distance_to_polygon([52.05], [13.95], p2)
    assert d[0] == expected[0]
    inside = kg.distance_to_multipolygon([52.05], [14.05], [[p1], [p2]])
    assert inside[0] == 0.0


class TestNeighbors:
    """Tile.kt:104-123 neighbor semantics, pinned by TileTest.kt:121-177."""

    def test_general_positions(self):
        nb = ktiles.neighbors(10, 10, 5)
        assert nb["east"] == (11, 10, 5)
        assert nb["west"] == (9, 10, 5)
        assert nb["north"] == (10, 9, 5)
        assert nb["south"] == (10, 11, 5)
        assert nb["north_west"] == (9, 9, 5)
        assert nb["south_west"] == (9, 11, 5)
        assert nb["south_east"] == (11, 11, 5)
        assert nb["north_east"] == (11, 9, 5)

    def test_min_bounds(self):
        nb = ktiles.neighbors(0, 0, 5)
        assert nb["east"] == (1, 0, 5)
        assert nb["west"] == (31, 0, 5)   # wrap around longitude
        assert nb["north"] == (0, 0, 5)   # latitude already at min
        assert nb["south"] == (0, 1, 5)
        assert nb["north_west"] == (31, 0, 5)
        assert nb["south_west"] == (31, 1, 5)
        assert nb["south_east"] == (1, 1, 5)
        assert nb["north_east"] == (1, 0, 5)

    def test_max_bounds(self):
        m = (1 << 5) - 1
        nb = ktiles.neighbors(m, m, 5)
        assert nb["east"] == (0, m, 5)    # wrap around longitude
        assert nb["west"] == (m - 1, m, 5)
        assert nb["north"] == (m, m - 1, 5)
        assert nb["south"] == (m, m, 5)   # latitude already at max
        assert nb["north_west"] == (m - 1, m - 1, 5)
        assert nb["south_west"] == (m - 1, m, 5)
        assert nb["south_east"] == (0, m, 5)
        assert nb["north_east"] == (0, m - 1, 5)

    def test_zoom_zero(self):
        nb = ktiles.neighbors(0, 0, 0)
        assert all(v == (0, 0, 0) for v in nb.values())

    def test_native_columns_match_kernel(self, spark):
        from pyspark.sql import functions as F

        from geogeometry_spark.functions import columns as C

        rows = [(10, 10), (0, 0), (31, 31), (31, 0), (0, 31)]
        df = spark.createDataFrame(rows, "x int, y int")
        nb_cols = C.tile_neighbors(F.col("x"), F.col("y"), 5)
        out = df.select(
            "x", "y",
            *[
                c.cast("int").alias(f"{d}_{ax}")
                for d, (cx, cy) in nb_cols.items()
                for ax, c in (("x", cx), ("y", cy))
            ],
        ).collect()
        for r in out:
            expect = ktiles.neighbors(r["x"], r["y"], 5)
            for d, (ex, ey, _z) in expect.items():
                assert (r[f"{d}_x"], r[f"{d}_y"]) == (ex, ey), (r["x"], r["y"], d)
