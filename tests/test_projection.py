"""Spark-side UTM/UPS/MGRS operator tests (UTMTest.kt / MGRSTest.kt
acceptance bounds driven through the DataFrame surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pts(spark):
    # spread across bands incl. polar rows (UPS) and Norway/Svalbard
    rows = [
        ("bbg", 52.516279, 13.377157),
        ("oslo", 59.912415229244004, 10.733866394995035),
        ("svalbard", 78.222378, 15.652313),
        ("north_cape", 71.169817, 25.783432),
        ("null_island", 0.0, 0.0),
        ("sydney", -33.859972, 151.211111),
        ("south_pole_ish", -85.5, 44.0),
        ("north_polar", 87.25, -123.0),
    ]
    return spark.createDataFrame(rows, "name string, lat double, lon double")


def test_utm_roundtrip_under_1m(spark, pts):
    from geogeometry_spark.operators.projection import utm_roundtrip

    out = utm_roundtrip(pts).select("name", "err_m").collect()
    assert len(out) == 8
    for r in out:
        assert r["err_m"] < 1.0, r


def test_utm_golden_through_spark(spark, pts):
    from geogeometry_spark.operators.projection import with_utm

    row = {
        r["name"]: r
        for r in with_utm(pts).collect()
    }
    bbg = row["bbg"]
    assert (bbg["longitude_zone"], bbg["latitude_zone_letter"]) == (33, "U")
    assert bbg["easting"] == pytest.approx(389880.94, abs=0.005)
    assert bbg["northing"] == pytest.approx(5819700.41, abs=0.005)
    assert row["north_polar"]["latitude_zone_letter"] == "Y"
    assert row["south_pole_ish"]["latitude_zone_letter"] == "B"


def test_mgrs_roundtrip_under_2m(spark, pts):
    from geogeometry_spark.operators.projection import mgrs_roundtrip

    utm_only = pts.where(F.col("lat").between(-80.0, 84.0))
    out = mgrs_roundtrip(utm_only).collect()
    assert len(out) == 6
    for r in out:
        assert r["err_easting"] < 2.0 and r["err_northing"] < 2.0, r
    bbg = next(r for r in out if r["name"] == "bbg")
    assert bbg["usng"] == "33U UU 89880 19700"


def test_find_utm_in_text(spark):
    from geogeometry_spark.operators.projection import find_utm_in_text

    # UTMTest.kt:66-76 detection cases
    df = spark.createDataFrame(
        [
            (1, "33 U 389880.94 5819700.4 bla bla"),
            (2, "bla bla 33\tU\t\t389880.94\t\t5819700.4"),
            (3, "33U 3898 5819"),
            (4, "Here are two UTM coordinates: 17 T 630084 4833438 "
                "and 18 S 233445 1948392."),
            (5, "This text has no UTM coordinates."),
        ],
        "id long, text string",
    )
    out = find_utm_in_text(df, "text", keep=["id"])
    counts = {
        r["id"]: r["cnt"]
        for r in out.groupBy("id").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {1: 1, 2: 1, 3: 1, 4: 2}
    two = {
        (r["longitude_zone"], r["latitude_zone_letter"], r["easting"], r["northing"])
        for r in out.where(F.col("id") == 4).collect()
    }
    assert two == {(17, "T", 630084.0, 4833438.0), (18, "S", 233445.0, 1948392.0)}


def test_grouped_hull_matches_kernel(spark):
    import numpy as np

    from geogeometry_spark.kernels.transform import convex_hull
    from geogeometry_spark.operators.transform import grouped_convex_hull

    rng = np.random.default_rng(9)
    pts = [
        ("g1", float(52.4 + rng.random() * 0.2), float(13.3 + rng.random() * 0.2))
        for _ in range(50)
    ]
    df = spark.createDataFrame(pts, "g string, lat double, lon double")
    out = grouped_convex_hull(df, "g").orderBy("vertex_idx").collect()
    arr = np.array([[p[2], p[1]] for p in pts])
    expected = convex_hull(arr)
    got = np.array([[r["lon"], r["lat"]] for r in out])
    assert np.array_equal(got, expected)


def test_noise_filter_trims(spark):
    from geogeometry_spark.operators.transform import filter_noise

    # GeoGeometryMigratedTests.kt:328-358 shouldFilterPoints: 1000 points
    # around (52, 13), four planted outliers at lon/lat ±100, percentage
    # 0.005 -> int(1000*0.005/2)=2 trimmed per end -> 996 survivors and
    # the outliers gone from the bbox.
    import random

    rng = random.Random(42)
    rows = [
        (str(i), 52.0 + rng.random(), 13.0 + rng.random()) for i in range(1000)
    ]
    for j, (la, lo) in zip(
        (50, 100, 150, 200),
        ((100.0, 100.0), (100.0, -100.0), (-100.0, 100.0), (-100.0, -100.0)),
    ):
        rows[j] = (str(j), la, lo)
    df = spark.createDataFrame(rows, "id string, lat double, lon double")
    out = filter_noise(df, 0.005)
    kept = out.collect()
    assert len(kept) == 996
    lats = [r["lat"] for r in kept]
    lons = [r["lon"] for r in kept]
    assert 52.0 < min(lats) and max(lats) < 53.0
    assert 13.0 < min(lons) and max(lons) < 14.0
