"""UTM/UPS/MGRS kernel parity with reference vectors.

Vectors from UTMTest.kt:28-51 (coordinates-converter.com verified),
UTMTest.kt:57-60 (toString), UTMTest.kt:122-148 (round-trip < 1 m),
UTMTest.kt:149-188 (random UTM round trips + MGRS precision ladder),
MGRSTest.kt:49-71 (parse table).
"""

from __future__ import annotations

import numpy as np
import pytest

from geogeometry_spark.kernels import geometry as kg
from geogeometry_spark.kernels import mgrs as km
from geogeometry_spark.kernels import utm as ku

# UTMTest.kt:28-51 — reference rounds easting/northing to 2 decimals
# (roundDecimals(2), utm.kt:390-391), so compare at 2dp against the
# 3dp converter strings.
CASES = [
    ("svalbard", 78.222378, 15.652313, 33, "X", 514863.281, 8683270.114),
    ("oslo", 59.912415229244004, 10.733866394995035, 32, "V", 596959.207, 6642926.686),
    ("brandenburger_tor", 52.516279, 13.377157, 33, "U", 389880.937, 5819700.412),
    ("north_cape", 71.169817, 25.783432, 35, "W", 456177.242, 7896776.959),
]


@pytest.mark.parametrize("name,lat,lon,zone,letter,e,n", CASES)
def test_utm_golden_vectors(name, lat, lon, zone, letter, e, n):
    z, l, ee, nn = ku.to_utm(lat, lon)
    assert int(z[0]) == zone
    assert chr(l[0]) == letter
    assert ee[0] == pytest.approx(e, abs=0.005)
    assert nn[0] == pytest.approx(n, abs=0.005)


def test_utm_tostring_vector():
    # UTMTest.kt:57-58: "33 U 389880.94 5819700.41"
    z, l, e, n = ku.to_utm(52.516279, 13.377157)
    assert ku.format_utm(z, l, e, n)[0] == "33 U 389880.94 5819700.41"


def test_utm_edge_cases_roundtrip():
    # UTMTest.kt:122-148: null island, Greenwich, band limits; < 1 m
    for lat, lon in [(0.0, 0.0), (51.4778, -0.0014), (84.0, 0.0), (-80.0, 0.0)]:
        z, l, e, n = ku.to_utm(lat, lon)
        lon2, lat2 = ku.from_utm(z, l, e, n)
        assert kg.haversine(np.array([lat]), np.array([lon]), lat2, lon2)[0] < 1.0


def test_utm_random_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-79.99, 83.99, 20000)
    lon = rng.uniform(-179.99, 179.99, 20000)
    z, l, e, n = ku.to_utm(lat, lon)
    lon2, lat2 = ku.from_utm(z, l, e, n)
    assert kg.haversine(lat, lon, lat2, lon2).max() < 1.0


def test_ups_random_roundtrip():
    rng = np.random.default_rng(7)
    lat = np.concatenate(
        [rng.uniform(84.01, 89.99, 5000), rng.uniform(-89.99, -80.01, 5000)]
    )
    lon = rng.uniform(-179.99, 179.99, 10000)
    z, l, e, n = ku.to_ups(lat, lon)
    lon2, lat2 = ku.from_ups(z, l, e, n)
    assert kg.haversine(lat, lon, lat2, lon2).max() < 1e-3


def test_ups_letters():
    # utm.kt:168-180: Y/Z north polar by lon sign, A/B south polar
    for lat, lon, letter in [
        (85.0, -10.0, "Y"),
        (85.0, 10.0, "Z"),
        (-85.0, -10.0, "A"),
        (-85.0, 10.0, "B"),
    ]:
        z, l, e, n = ku.to_utm_or_ups(lat, lon)
        assert chr(l[0]) == letter


def test_norway_svalbard_exceptions():
    # utm.kt:230-258: V band 3<=lon<12 -> zone 32; X band exceptions
    assert int(ku.longitude_zone(60.0, 5.0)[0]) == 32
    assert int(ku.longitude_zone(60.0, 2.0)[0]) == 31
    assert int(ku.longitude_zone(75.0, 8.0)[0]) == 31
    assert int(ku.longitude_zone(75.0, 15.0)[0]) == 33
    assert int(ku.longitude_zone(75.0, 25.0)[0]) == 35
    assert int(ku.longitude_zone(75.0, 38.0)[0]) == 37


def test_mgrs_roundtrip_random():
    # UTMTest.kt:149-188 analogue: UTM -> MGRS -> UTM within 2 m
    rng = np.random.default_rng(11)
    lat = rng.uniform(-79.5, 83.5, 20000)
    lon = rng.uniform(-179.99, 179.99, 20000)
    z, l, e, n = ku.to_utm(lat, lon)
    f, s, me, mn = km.to_mgrs(z, l, e, n)
    ue, un = km.mgrs_to_utm(z, l, f, s, me, mn)
    assert np.abs(ue - np.floor(e)).max() < 2.0
    assert np.abs(un - np.floor(n)).max() < 2.0


def test_mgrs_precision_ladder():
    # precision p -> error < 2 * p meters (UTMTest.kt:175-186)
    z, l, e, n = ku.to_utm(52.516279, 13.377157)
    f, s, me, mn = km.to_mgrs(z, l, e, n)
    for digits, meters in km.PRECISION_METERS.items():
        txt = km.format_mgrs(z, l, f, s, me, mn, digits=digits)[0]
        parsed = km.parse_mgrs(txt)
        assert parsed is not None
        _, _, _, _, pe, pn = parsed
        assert abs(pe - int(me[0])) < 2 * meters
        assert abs(pn - int(mn[0])) < 2 * meters


@pytest.mark.parametrize(
    "compact,expanded",
    [
        ("23KPQ8238365269", "23K PQ 82383 65269"),
        ("23KPQ823652", "23K PQ 82300 65200"),
        ("23KPQ8265", "23K PQ 82000 65000"),
    ],
)
def test_mgrs_parse_table(compact, expanded):
    # MGRSTest.kt:49-71 precision-inference
    a = km.parse_mgrs(compact)
    b = km.parse_mgrs(expanded)
    assert a == b
    z, lt, f, s, e, n = a
    out = km.format_mgrs(
        np.array([z]),
        np.array([ord(lt)], dtype=np.uint8),
        np.array([ord(f)], dtype=np.uint8),
        np.array([ord(s)], dtype=np.uint8),
        np.array([e]),
        np.array([n]),
        digits=5,
    )[0]
    assert out == expanded


def test_normalize_lonlat():
    lon, lat = ku.normalize_lonlat(np.array([190.0]), np.array([95.0]))
    assert lon[0] == pytest.approx(-170.0)
    assert lat[0] == pytest.approx(85.0)
