"""UTM / UPS projection kernels (vectorized numpy, float64).

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/utm.kt
(toUtmCoordinate power series utm.kt:314-393, utmToPointCoordinates
utm.kt:396-485, UPS utm.kt:498-585, zone logic utm.kt:150-297,
ReferenceEllipsoid utm.kt:622-691).  Operation order mirrors the
reference so golden vectors (UTMTest.kt:28-51) match to the same 2-dp
rounding.

Convention: separated args are (lat, lon); outputs are plain numpy
arrays; letters are handled as uint8 char codes for vectorization.
"""

from __future__ import annotations

import numpy as np

# ellipsoid: WGS84 (utm.kt:690)
_A = 6378137.0
_INVF = 298.257223563
_F = 1.0 / _INVF
_E2 = _F * (2.0 - _F)  # eccentricitySquared (utm.kt:635)
_EB2 = _E2 / (1.0 - _E2)  # secondEccentricitySquared (utm.kt:638)
_E = np.sqrt(_E2)

UTM_SCALE_FACTOR = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING = 10000000.0
UTM_NORTHERN_LIMIT = 84.0
UTM_SOUTHERN_LIMIT = -80.0
UPS_SCALE_FACTOR = 0.994
UPS_FALSE_EASTING = 2000000.0
UPS_FALSE_NORTHING = 2000000.0

_K0 = UTM_SCALE_FACTOR
_K02 = _K0 * _K0
_K03 = _K02 * _K0
_K04 = _K03 * _K0
_K05 = _K04 * _K0
_K06 = _K05 * _K0
_K07 = _K06 * _K0
_K08 = _K07 * _K0

_DEG2RAD = np.pi / 180.0  # GeoGeometry.kt:66

# latitude band letters C..X skipping I and O (utm.kt:183-205)
_BAND_LETTERS = np.frombuffer(b"CDEFGHJKLMNPQRSTUVWX", dtype=np.uint8)


def _as1d(x):
    return np.atleast_1d(np.asarray(x, dtype=np.float64))


def round_decimals(x: np.ndarray, decimals: int) -> np.ndarray:
    """GeoGeometry.roundToDecimals (GeoGeometry.kt:305-311):
    (d * factor).roundToLong() / factor — Kotlin roundToLong is
    round-half-up toward +inf (Math.round), i.e. floor(x + 0.5)."""
    factor = 10.0 ** decimals
    return np.floor(x * factor + 0.5) / factor


def normalize_lonlat(lon: np.ndarray, lat: np.ndarray):
    """PointCoordinates.normalize (geojson.kt:319-342)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    need = (lon < -180.0) | (lon > 180.0) | (lat < -90.0) | (lat > 90.0)
    nlon = ((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    nlat = ((lat + 90.0) % 360.0 + 360.0) % 360.0 - 90.0
    nlat = np.where((nlat >= 90.0) & (nlat <= 180.0), 180.0 - nlat, nlat)
    nlat = np.where((nlat >= -180.0) & (nlat < -90.0), -180.0 - nlat, nlat)
    return np.where(need, nlon, lon), np.where(need, nlat, lat)


_BAND_EDGES = np.array(
    [-72.0, -64.0, -56.0, -48.0, -40.0, -32.0, -24.0, -16.0, -8.0, 0.0,
     8.0, 16.0, 24.0, 32.0, 40.0, 48.0, 56.0, 64.0, 72.0]
)


def latitude_zone_letter(lat, lon) -> np.ndarray:
    """utm.kt:168-208 → uint8 char codes.  Band selection uses the
    reference's exact raw-threshold comparisons (``latitude < 0 -> 'M'``
    etc.) — arithmetic like floor((lat+80)/8) rounds at band edges
    (e.g. -2.2e-16 + 80 == 80.0 in float64, flipping M to N)."""
    lat = _as1d(lat)
    lon = _as1d(lon)
    band = np.searchsorted(_BAND_EDGES, lat, side="right")
    letters = _BAND_LETTERS[np.clip(band, 0, 19)]
    north = lat > 84.0
    south = lat < -80.0
    letters = np.where(north, np.where(lon < 0, ord("Y"), ord("Z")), letters)
    letters = np.where(south, np.where(lon < 0, ord("A"), ord("B")), letters)
    return letters.astype(np.uint8)


def longitude_zone(lat, lon) -> np.ndarray:
    """utm.kt:217-265 (X/Svalbard and V/Norway exceptions)."""
    lat = _as1d(lat)
    lon = _as1d(lon)
    zone = ((lon + 180.0) / 6.0).astype(np.int64) + 1
    letters = latitude_zone_letter(lat, lon)
    x_exc = (letters == ord("X")) & (lon > 0.0) & (lon < 42.0)
    x_zone = np.where(
        lon < 9.0, 31, np.where(lon < 21.0, 33, np.where(lon < 33.0, 35, 37))
    )
    v_exc = (letters == ord("V")) & (lon > 0.0) & (lon < 12.0)
    v_zone = np.where(lon < 3.0, 31, 32)
    zone = np.where(x_exc, x_zone, np.where(v_exc, v_zone, zone))
    polar = (lat > 84.0) | (lat < -80.0)
    return np.where(polar, np.where(lon < 0.0, 30, 31), zone)


def central_meridian(lon_zone: np.ndarray, letters: np.ndarray) -> np.ndarray:
    """utm.kt:274-297 (radians)."""
    lz = np.asarray(lon_zone, dtype=np.int64)
    lt = np.asarray(letters, dtype=np.uint8)
    base = ((lz - 1) * 6 - 180 + 3).astype(np.float64) * _DEG2RAD
    polar = (lt < ord("C")) | (lt > ord("X"))
    x = lt == ord("X")
    v = lt == ord("V")
    base = np.where(x & (lz == 31), 9.0 * _DEG2RAD, base)
    base = np.where(x & (lz == 33), 15.0 * _DEG2RAD, base)
    base = np.where(x & (lz == 35), 27.0 * _DEG2RAD, base)
    base = np.where(x & (lz == 37), 33.0 * _DEG2RAD, base)
    base = np.where(v & (lz == 31), 3.0 * _DEG2RAD, base)
    base = np.where(v & (lz == 32), 9.0 * _DEG2RAD, base)
    return np.where(polar, 0.0, base)


def _nu(phi):  # verticalRadiusOfCurvatureRadians (utm.kt:648-650)
    return _A / np.sqrt(1.0 - _E2 * np.sin(phi) ** 2)


def _rho(phi):  # meridionalRadiusOfCurvatureRadians (utm.kt:656-658)
    return _nu(phi) / (1.0 + _EB2 * np.cos(phi) ** 2)


def _meridional_arc(phi):  # meridionalArcRadians (utm.kt:664-684)
    sin2 = np.sin(2.0 * phi)
    sin4 = np.sin(4.0 * phi)
    sin6 = np.sin(6.0 * phi)
    sin8 = np.sin(8.0 * phi)
    n = _F / (2.0 - _F)
    n2 = n * n
    n3 = n2 * n
    n4 = n3 * n
    n5 = n4 * n
    n1n2 = n - n2
    n2n3 = n2 - n3
    n3n4 = n3 - n4
    n4n5 = n4 - n5
    ap = _A * (1.0 - n + 5.0 / 4.0 * n2n3 + 81.0 / 64.0 * n4n5)
    bp = 3.0 / 2.0 * _A * (n1n2 + 7.0 / 8.0 * n3n4 + 55.0 / 64.0 * n5)
    cp = 15.0 / 16.0 * _A * (n2n3 + 3.0 / 4.0 * n4n5)
    dp = 35.0 / 48.0 * _A * (n3n4 + 11.0 / 16.0 * n5)
    ep = 315.0 / 512.0 * _A * n4n5
    return ap * phi - bp * sin2 + cp * sin4 - dp * sin6 + ep * sin8


def to_utm(lat, lon):
    """WGS84 -> UTM (utm.kt:314-393).  Latitudes must lie in
    [-80, 84]; rows outside get NaN easting/northing (quarantine, no
    throw).  Returns (lon_zone int64, letter uint8, easting, northing)."""
    lat = _as1d(lat)
    lon = _as1d(lon)
    ok = (lat >= UTM_SOUTHERN_LIMIT) & (lat <= UTM_NORTHERN_LIMIT)
    letters = latitude_zone_letter(lat, lon)
    zones = longitude_zone(lat, lon)
    phi = lat * _DEG2RAD
    cos_phi = np.cos(phi)
    cos2 = cos_phi * cos_phi
    cos3 = cos2 * cos_phi
    cos5 = cos3 * cos2
    cos7 = cos5 * cos2
    tan_phi = np.tan(phi)
    tan2 = tan_phi * tan_phi
    tan4 = tan2 * tan2
    tan6 = tan4 * tan2
    eb2 = _EB2
    eb4 = eb2 * eb2
    eb6 = eb4 * eb2
    eb8 = eb6 * eb2
    e2c2 = eb2 * cos2
    e4c4 = eb4 * cos2 * cos2
    e6c6 = eb6 * cos2 * cos2 * cos2
    e8c8 = eb8 * cos2 * cos2 * cos2 * cos2
    t2e2c2 = tan2 * e2c2
    t2e4c4 = tan2 * e4c4
    t2e6c6 = tan2 * e6c6
    t2e8c8 = tan2 * e8c8
    nu = _nu(phi)
    kn1 = _K0 * nu * np.sin(phi)
    t1 = _K0 * _meridional_arc(phi)
    t2 = kn1 * cos_phi / 2.0
    t3 = kn1 * cos3 / 24.0 * (5.0 - tan2 + 9.0 * e2c2 + 4.0 * e4c4)
    t4 = (
        kn1
        * cos5
        / 720.0
        * (
            61.0
            - 58.0 * tan2
            + tan4
            + 270.0 * e2c2
            - 330.0 * t2e2c2
            + 445.0 * e4c4
            - 680.0 * t2e4c4
            + 324.0 * e6c6
            - 600.0 * t2e6c6
            + 88.0 * e8c8
            - 192.0 * t2e8c8
        )
    )
    t5 = kn1 * cos7 / 40320.0 * (1385.0 - 3111.0 * tan2 + 543.0 * tan4 - tan6)
    kn2 = _K0 * nu
    t6 = kn2 * cos_phi
    t7 = kn2 * cos3 / 6.0 * (1.0 - tan2 + e2c2)
    t8 = (
        kn2
        * cos5
        / 120.0
        * (
            5.0
            - 18.0 * tan2
            + tan4
            + 14.0 * e2c2
            - 58.0 * t2e2c2
            + 13.0 * e4c4
            - 64.0 * t2e4c4
            + 4.0 * e6c6
            - 24.0 * t2e6c6
        )
    )
    t9 = kn2 * cos7 / 50.40 * (61.0 - 479.0 * tan2 + 179.0 * tan4 - tan6)
    lam = lon * _DEG2RAD
    lam0 = central_meridian(zones, letters)
    dl = lam - lam0
    dl2 = dl * dl
    dl3 = dl2 * dl
    dl4 = dl3 * dl
    dl5 = dl4 * dl
    dl6 = dl5 * dl
    dl7 = dl6 * dl
    dl8 = dl7 * dl
    false_northing = np.where(phi < 0.0, UTM_FALSE_NORTHING, 0.0)
    northing = false_northing + t1 + dl2 * t2 + dl4 * t3 + dl6 * t4 + dl8 * t5
    easting = UTM_FALSE_EASTING + dl * t6 + dl3 * t7 + dl5 * t8 + dl7 * t9
    easting = np.where(ok, round_decimals(easting, 2), np.nan)
    northing = np.where(ok, round_decimals(northing, 2), np.nan)
    return zones, letters, easting, northing


def from_utm(lon_zone, letters, easting, northing):
    """UTM -> WGS84 (utm.kt:396-485).  Returns (lon, lat)."""
    lz = np.atleast_1d(np.asarray(lon_zone, dtype=np.int64))
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    e = _as1d(easting)
    n = _as1d(northing)
    n = np.where(lt < ord("N"), n - UTM_FALSE_NORTHING, n)
    arc0 = n / _K0
    rho = np.full_like(arc0, _rho(0.0))
    phi = arc0 / rho
    active = np.ones(phi.shape, dtype=bool)
    for _ in range(5):
        arc = _meridional_arc(phi)
        rho_new = _rho(phi)
        rho = np.where(active, rho_new, rho)
        diff = (arc0 - arc) / rho
        step = active & (np.abs(diff) >= np.spacing(np.abs(phi)))
        phi = np.where(step, phi + diff, phi)
        active = step
    cos_phi = np.cos(phi)
    cos2 = cos_phi * cos_phi
    tan_phi = np.tan(phi)
    tan2 = tan_phi * tan_phi
    tan4 = tan2 * tan2
    tan6 = tan4 * tan2
    eb2 = _EB2
    eb4 = eb2 * eb2
    eb6 = eb4 * eb2
    eb8 = eb6 * eb2
    e2c2 = eb2 * cos2
    e4c4 = eb4 * cos2 * cos2
    e6c6 = eb6 * cos2 * cos2 * cos2
    e8c8 = eb8 * cos2 * cos2 * cos2 * cos2
    t2e2c2 = tan2 * e2c2
    t2e4c4 = tan2 * e4c4
    t2e6c6 = tan2 * e6c6
    t2e8c8 = tan2 * e8c8
    t4e2c2 = tan4 * e2c2
    t4e4c4 = tan4 * e4c4
    nu = _nu(phi)
    nu2 = nu * nu
    nu3 = nu2 * nu
    nu5 = nu3 * nu2
    nu7 = nu5 * nu2
    lam0 = central_meridian(lz, lt)
    de = e - UTM_FALSE_EASTING
    de2 = de * de
    de3 = de2 * de
    de4 = de3 * de
    de5 = de4 * de
    de6 = de5 * de
    de7 = de6 * de
    de8 = de7 * de
    t10 = tan_phi / (2.0 * rho * nu * _K02)
    t11 = tan_phi / (24.0 * rho * nu3 * _K04) * (
        5.0 + 3.0 * tan2 + e2c2 - 9.0 * t2e2c2 - 4.0 * e4c4
    )
    t12 = (
        tan_phi
        / (720.0 * rho * nu5 * _K06)
        * (
            61.0
            + 90.0 * tan2
            + 45.0 * tan4
            + 46.0 * e2c2
            - 252.0 * t2e2c2
            - 90.0 * t4e2c2
            - 3.0 * e4c4
            - 66.0 * t2e4c4
            + 225.0 * t4e4c4
            + 100.0 * e6c6
            + 84.0 * t2e6c6
            + 88.0 * e8c8
            - 192.0 * t2e8c8
        )
    )
    t13 = tan_phi / (40320.0 * rho * nu7 * _K08) * (
        1385.0 + 3633.0 * tan2 + 4095.0 * tan4 + 1575.0 * tan6
    )
    t14 = 1.0 / (cos_phi * nu * _K0)
    t15 = 1.0 / (6.0 * cos_phi * nu3 * _K03) * (1.0 + 2.0 * tan2 + e2c2)
    t16 = (
        1.0
        / (120.0 * cos_phi * nu5 * _K05)
        * (
            5.0
            + 28.0 * tan2
            + 24.0 * tan4
            + 6.0 * e2c2
            + 8.0 * t2e2c2
            - 3.0 * e4c4
            + 4.0 * t2e4c4
            - 4.0 * e6c6
            + 24.0 * t2e6c6
        )
    )
    t17 = 1.0 / (5040.0 * cos_phi * nu7 * _K07) * (
        61.0 + 662.0 * tan2 + 1320.0 * tan4 + 720.0 * tan6
    )
    latitude = phi - de2 * t10 + de4 * t11 - de6 * t12 + de8 * t13
    longitude = lam0 + de * t14 - de3 * t15 + de5 * t16 - de7 * t17
    return normalize_lonlat(longitude / _DEG2RAD, latitude / _DEG2RAD)


def to_ups(lat, lon):
    """WGS84 -> UPS (utm.kt:498-528).  Rows inside the UTM band get
    NaN (no throw).  Returns (lon_zone, letter, easting, northing)."""
    lat = _as1d(lat)
    lon = _as1d(lon)
    ok = (lat < UTM_SOUTHERN_LIMIT) | (lat > UTM_NORTHERN_LIMIT)
    letters = latitude_zone_letter(lat, lon)
    zones = longitude_zone(lat, lon)
    latr = lat * _DEG2RAD
    sign = np.sign(latr)
    phi = np.abs(latr)
    lam = lon * _DEG2RAD
    c0 = 2.0 * _A / np.sqrt(1.0 - _E2) * ((1.0 - _E) / (1.0 + _E)) ** (_E / 2.0)
    e_sin_phi = _E * np.sin(phi)
    tz = ((1 + e_sin_phi) / (1 - e_sin_phi)) ** (_E / 2.0) * np.tan(
        np.pi / 4.0 - phi / 2.0
    )
    radius = UPS_SCALE_FACTOR * c0 * tz
    northing = np.where(
        sign > 0,
        UPS_FALSE_NORTHING - radius * np.cos(lam),
        UPS_FALSE_NORTHING + radius * np.cos(lam),
    )
    easting = UPS_FALSE_EASTING + radius * np.sin(lam)
    return (
        zones,
        letters,
        np.where(ok, easting, np.nan),
        np.where(ok, northing, np.nan),
    )


def from_ups(lon_zone, letters, easting, northing):
    """UPS -> WGS84 (utm.kt:530-585)."""
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    e = _as1d(easting)
    n = _as1d(northing)
    northern = lt > ord("N")
    dn = n - UPS_FALSE_NORTHING
    de = e - UPS_FALSE_EASTING
    pole = (de == 0.0) & (dn == 0.0)
    lon = np.where(northern, np.arctan2(de, -dn), np.arctan2(de, dn))
    e2, e4 = _E2, _E2 * _E2
    e6 = e4 * _E2
    e8 = e6 * _E2
    a_bar = e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13 * e8 / 360.0
    b_bar = 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0
    c_bar = 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0
    d_bar = 4279 * e8 / 161280.0
    c0 = 2.0 * _A / np.sqrt(1.0 - _E2) * ((1.0 - _E) / (1.0 + _E)) ** (_E / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(
            de == 0.0,
            dn,
            np.where(
                dn == 0.0, de, np.where(dn < de, de / np.sin(lon), dn / np.cos(lon))
            ),
        )
    radius = np.abs(r)
    chi = np.pi / 2.0 - 2.0 * np.arctan2(radius, UPS_SCALE_FACTOR * c0)
    phi = (
        chi
        + a_bar * np.sin(2.0 * chi)
        + b_bar * np.sin(4.0 * chi)
        + c_bar * np.sin(6.0 * chi)
        + d_bar * np.sin(8.0 * chi)
    )
    lat = np.where(northern, phi, -phi)
    lon_deg, lat_deg = normalize_lonlat(lon / _DEG2RAD, lat / _DEG2RAD)
    lon_deg = np.where(pole, 0.0, lon_deg)
    lat_deg = np.where(pole, np.where(northern, 90.0, -90.0), lat_deg)
    return lon_deg, lat_deg


def to_utm_or_ups(lat, lon):
    """utm.kt:302-308: select UTM or UPS by latitude."""
    lat = _as1d(lat)
    lon = _as1d(lon)
    polar = (lat < UTM_SOUTHERN_LIMIT) | (lat > UTM_NORTHERN_LIMIT)
    zu, lu, eu, nu_ = to_utm(np.where(polar, 0.0, lat), lon)
    zp, lp, ep, np_ = to_ups(np.where(polar, lat, 89.0), lon)
    zones = np.where(polar, zp, zu)
    letters = latitude_zone_letter(lat, lon)
    return (
        zones,
        letters,
        np.where(polar, ep, eu),
        np.where(polar, np_, nu_),
    )


def from_utm_or_ups(lon_zone, letters, easting, northing):
    """utm.kt:310-312: UPS letters are A/B/Y/Z (utm.kt:114)."""
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    is_ups = (
        (lt == ord("A")) | (lt == ord("B")) | (lt == ord("Y")) | (lt == ord("Z"))
    )
    lon_u, lat_u = from_utm(lon_zone, letters, easting, northing)
    lon_p, lat_p = from_ups(lon_zone, letters, easting, northing)
    return np.where(is_ups, lon_p, lon_u), np.where(is_ups, lat_p, lat_u)


def format_utm(lon_zone, letters, easting, northing) -> np.ndarray:
    """UtmCoordinate.toString (utm.kt:109-111): '33 U 389880.94 5819700.41'
    with Kotlin Double.toString semantics (shortest repr; integral values
    end in .0)."""
    lz = np.atleast_1d(np.asarray(lon_zone))
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    e = _as1d(easting)
    n = _as1d(northing)

    def dbl(x: float) -> str:
        return repr(float(x))

    return np.array(
        [
            f"{int(z)} {chr(c)} {dbl(ee)} {dbl(nn)}"
            for z, c, ee, nn in zip(lz, lt, e, n)
        ],
        dtype=object,
    )


# --------------------------------------------------------------------------
# DuckDB oracle twin (UTM band only)
# --------------------------------------------------------------------------

def _arc_sql(phi: str) -> str:
    """meridionalArcRadians (utm.kt:664-684) with the series constants
    precomputed in python float64 (same ops as the numpy scalar path)."""
    n = _F / (2.0 - _F)
    n2 = n * n
    n3 = n2 * n
    n4 = n3 * n
    n5 = n4 * n
    n1n2 = n - n2
    n2n3 = n2 - n3
    n3n4 = n3 - n4
    n4n5 = n4 - n5
    ap = _A * (1.0 - n + 5.0 / 4.0 * n2n3 + 81.0 / 64.0 * n4n5)
    bp = 3.0 / 2.0 * _A * (n1n2 + 7.0 / 8.0 * n3n4 + 55.0 / 64.0 * n5)
    cp = 15.0 / 16.0 * _A * (n2n3 + 3.0 / 4.0 * n4n5)
    dp = 35.0 / 48.0 * _A * (n3n4 + 11.0 / 16.0 * n5)
    ep = 315.0 / 512.0 * _A * n4n5
    return (
        f"(CAST({ap!r} AS DOUBLE) * ({phi}) - CAST({bp!r} AS DOUBLE) * sin(2.0 * ({phi}))"
        f" + CAST({cp!r} AS DOUBLE) * sin(4.0 * ({phi}))"
        f" - CAST({dp!r} AS DOUBLE) * sin(6.0 * ({phi}))"
        f" + CAST({ep!r} AS DOUBLE) * sin(8.0 * ({phi})))"
    )


def _nu_sql(phi: str) -> str:
    return f"({_A!r} / sqrt(1.0 - {_E2!r} * sin({phi}) * sin({phi})))"


def _rho_sql(phi: str) -> str:
    return f"({_nu_sql(phi)} / (1.0 + {_EB2!r} * cos({phi}) * cos({phi})))"


def _letter_sql(lat: str) -> str:
    """CASE-ladder twin of latitude_zone_letter for the UTM band
    [-80, 84] (utm.kt:168-208; polar Y/Z/A/B rows are filtered out)."""
    letters = "CDEFGHJKLMNPQRSTUVWX"
    parts = [
        f"WHEN ({lat}) < {edge!r} THEN '{letters[i]}'"
        for i, edge in enumerate(_BAND_EDGES)
    ]
    return f"(CASE {' '.join(parts)} ELSE 'X' END)"


def utm_roundtrip_oracle_sql(src: str, footpoint_iters: int = 5) -> str:
    """DuckDB twin of to_utm -> from_utm (utm.kt:314-485) for rows in
    the UTM validity band lat in [-80, 84] (``src`` must pre-filter;
    UPS stays pytest-covered).  Yields (doc_id, lat, lon,
    longitude_zone, latitude_zone_letter, easting, northing, lat2,
    lon2); easting/northing carry the kernel's roundToDecimals(2).

    The footpoint iteration's ulp-based stop (np.spacing) is emulated
    with power(2, floor(log2(|phi|)) - 52); like the vincenty twin,
    numpy-vs-libm trig drift keeps exact-double parity only to ~1e-9,
    so consumers compare at r2/r4 rounding."""
    d2r = repr(_DEG2RAD)
    letters = _letter_sql("lat")
    zone_base = "(CAST(trunc((lon + 180.0) / 6.0) AS BIGINT) + 1)"
    x_zone = (
        "(CASE WHEN lon < 9.0 THEN 31 WHEN lon < 21.0 THEN 33"
        " WHEN lon < 33.0 THEN 35 ELSE 37 END)"
    )
    v_zone = "(CASE WHEN lon < 3.0 THEN 31 ELSE 32 END)"
    zone = (
        f"(CASE WHEN letter = 'X' AND lon > 0.0 AND lon < 42.0 THEN {x_zone}"
        f" WHEN letter = 'V' AND lon > 0.0 AND lon < 12.0 THEN {v_zone}"
        f" ELSE {zone_base} END)"
    )
    # central meridian (utm.kt:274-297), polar branch unreachable here
    lam0 = (
        "(CASE"
        f" WHEN letter = 'X' AND zone = 31 THEN 9.0 * {d2r}"
        f" WHEN letter = 'X' AND zone = 33 THEN 15.0 * {d2r}"
        f" WHEN letter = 'X' AND zone = 35 THEN 27.0 * {d2r}"
        f" WHEN letter = 'X' AND zone = 37 THEN 33.0 * {d2r}"
        f" WHEN letter = 'V' AND zone = 31 THEN 3.0 * {d2r}"
        f" WHEN letter = 'V' AND zone = 32 THEN 9.0 * {d2r}"
        f" ELSE CAST((zone - 1) * 6 - 180 + 3 AS DOUBLE) * {d2r} END)"
    )
    q = (
        f"SELECT doc_id, lat, lon, {letters} AS letter FROM {src}"
    )
    q = f"SELECT *, {zone} AS zone FROM ({q})"
    q = (
        f"SELECT *, (lat * {d2r}) AS phi, (lon * {d2r}) AS lam, "
        f"{lam0} AS lam0 FROM ({q})"
    )
    q = (
        "SELECT *, cos(phi) AS cos_phi, tan(phi) AS tan_phi, "
        f"{_nu_sql('phi')} AS nu, {_arc_sql('phi')} AS arc, "
        "(lam - lam0) AS dl FROM (" + q + ")"
    )
    q = (
        "SELECT *, (cos_phi * cos_phi) AS cos2, (tan_phi * tan_phi) AS tan2, "
        f"({_K0!r} * nu * sin(phi)) AS kn1, ({_K0!r} * nu) AS kn2, "
        "(dl * dl) AS dl2 FROM (" + q + ")"
    )
    eb2, eb4, eb6, eb8 = _EB2, _EB2 * _EB2, _EB2**2 * _EB2, _EB2**2 * _EB2 * _EB2
    q = (
        "SELECT *, (cos2 * cos_phi) AS cos3, (tan2 * tan2) AS tan4, "
        f"({eb2!r} * cos2) AS e2c2, ({eb4!r} * cos2 * cos2) AS e4c4, "
        f"({eb6!r} * cos2 * cos2 * cos2) AS e6c6, "
        f"({eb8!r} * cos2 * cos2 * cos2 * cos2) AS e8c8 FROM (" + q + ")"
    )
    q = (
        "SELECT *, (cos3 * cos2) AS cos5, (tan4 * tan2) AS tan6, "
        "(tan2 * e2c2) AS t2e2c2, (tan2 * e4c4) AS t2e4c4, "
        "(tan2 * e6c6) AS t2e6c6, (tan2 * e8c8) AS t2e8c8 FROM (" + q + ")"
    )
    q = "SELECT *, (cos5 * cos2) AS cos7 FROM (" + q + ")"
    # forward series terms (utm.kt:314-393)
    q = (
        "SELECT *, "
        f"({_K0!r} * arc) AS t1, "
        "(kn1 * cos_phi / 2.0) AS t2, "
        "(kn1 * cos3 / 24.0 * (5.0 - tan2 + 9.0 * e2c2 + 4.0 * e4c4)) AS t3, "
        "(kn1 * cos5 / 720.0 * (61.0 - 58.0 * tan2 + tan4 + 270.0 * e2c2"
        " - 330.0 * t2e2c2 + 445.0 * e4c4 - 680.0 * t2e4c4 + 324.0 * e6c6"
        " - 600.0 * t2e6c6 + 88.0 * e8c8 - 192.0 * t2e8c8)) AS t4, "
        "(kn1 * cos7 / 40320.0 * (1385.0 - 3111.0 * tan2 + 543.0 * tan4 - tan6)) AS t5, "
        "(kn2 * cos_phi) AS t6, "
        "(kn2 * cos3 / 6.0 * (1.0 - tan2 + e2c2)) AS t7, "
        "(kn2 * cos5 / 120.0 * (5.0 - 18.0 * tan2 + tan4 + 14.0 * e2c2"
        " - 58.0 * t2e2c2 + 13.0 * e4c4 - 64.0 * t2e4c4 + 4.0 * e6c6"
        " - 24.0 * t2e6c6)) AS t8, "
        "(kn2 * cos7 / 50.40 * (61.0 - 479.0 * tan2 + 179.0 * tan4 - tan6)) AS t9, "
        "(dl2 * dl) AS dl3 FROM (" + q + ")"
    )
    # chained products in kernel op order (dl4=dl3*dl, dl5=dl4*dl, ...)
    # via DuckDB lateral column references — a different association
    # would drift by ulps from the claimed same-op-order parity
    q = (
        "SELECT *, (dl3 * dl) AS dl4, ((dl3 * dl) * dl) AS dl5, "
        "(((dl3 * dl) * dl) * dl) AS dl6, "
        "((((dl3 * dl) * dl) * dl) * dl) AS dl7, "
        "(((((dl3 * dl) * dl) * dl) * dl) * dl) AS dl8 FROM (" + q + ")"
    )
    rnd2 = "(floor(({x}) * 100.0 + 0.5) / 100.0)"
    northing_raw = (
        f"((CASE WHEN phi < 0.0 THEN {UTM_FALSE_NORTHING!r} ELSE 0.0 END)"
        " + t1 + dl2 * t2 + dl4 * t3 + dl6 * t4 + dl8 * t5)"
    )
    easting_raw = (
        f"({UTM_FALSE_EASTING!r} + dl * t6 + dl3 * t7 + dl5 * t8 + dl7 * t9)"
    )
    q = (
        "SELECT doc_id, lat, lon, letter, zone, "
        f"{rnd2.format(x=easting_raw)} AS easting, "
        f"{rnd2.format(x=northing_raw)} AS northing, lam0 FROM (" + q + ")"
    )
    # ---- inverse (utm.kt:396-485): footpoint iteration then series ----
    rho0 = float(_A / np.sqrt(1.0 - _E2 * np.sin(0.0) ** 2) / (1.0 + _EB2 * np.cos(0.0) ** 2))
    q = (
        "SELECT *, "
        f"((CASE WHEN letter < 'N' THEN northing - {UTM_FALSE_NORTHING!r}"
        f" ELSE northing END) / {_K0!r}) AS arc0 FROM (" + q + ")"
    )
    q = (
        f"SELECT *, (arc0 / {rho0!r}) AS fphi, CAST({rho0!r} AS DOUBLE) AS frho, "
        "TRUE AS factive FROM (" + q + ")"
    )
    spacing = "power(2.0, floor(log2(abs(fphi))) - 52)"
    for _ in range(footpoint_iters):
        q = (
            "SELECT * EXCLUDE (fphi, frho, factive, _arc, _rhon, _diff, _step), "
            "(CASE WHEN _step THEN fphi + _diff ELSE fphi END) AS fphi, "
            "(CASE WHEN factive THEN _rhon ELSE frho END) AS frho, "
            "_step AS factive FROM ("
            "SELECT *, (factive AND abs(_diff) >= " + spacing + ") AS _step FROM ("
            "SELECT *, ((arc0 - _arc) / (CASE WHEN factive THEN _rhon ELSE frho END)) AS _diff FROM ("
            f"SELECT *, {_arc_sql('fphi')} AS _arc, {_rho_sql('fphi')} AS _rhon "
            "FROM (" + q + "))))"
        )
    q = (
        "SELECT *, cos(fphi) AS fcos, tan(fphi) AS ftan, "
        f"{_nu_sql('fphi')} AS fnu, (easting - {UTM_FALSE_EASTING!r}) AS de "
        "FROM (" + q + ")"
    )
    q = (
        "SELECT *, (fcos * fcos) AS fcos2, (ftan * ftan) AS ftan2, "
        "(fnu * fnu) AS fnu2, (de * de) AS de2 FROM (" + q + ")"
    )
    q = (
        "SELECT *, (ftan2 * ftan2) AS ftan4, (fnu2 * fnu) AS fnu3, "
        f"({eb2!r} * fcos2) AS fe2c2, ({eb4!r} * fcos2 * fcos2) AS fe4c4, "
        f"({eb6!r} * fcos2 * fcos2 * fcos2) AS fe6c6, "
        f"({eb8!r} * fcos2 * fcos2 * fcos2 * fcos2) AS fe8c8, "
        "(de2 * de) AS de3 FROM (" + q + ")"
    )
    q = (
        "SELECT *, (ftan4 * ftan2) AS ftan6, (fnu3 * fnu2) AS fnu5, "
        "(ftan2 * fe2c2) AS ft2e2c2, (ftan2 * fe4c4) AS ft2e4c4, "
        "(ftan2 * fe6c6) AS ft2e6c6, (ftan2 * fe8c8) AS ft2e8c8, "
        "(ftan4 * fe2c2) AS ft4e2c2, (ftan4 * fe4c4) AS ft4e4c4, "
        "(de3 * de) AS de4, ((de3 * de) * de) AS de5, (((de3 * de) * de) * de) AS de6 "
        "FROM (" + q + ")"
    )
    q = (
        "SELECT *, (fnu5 * fnu2) AS fnu7, (de6 * de) AS de7, ((de6 * de) * de) AS de8 "
        "FROM (" + q + ")"
    )
    q = (
        "SELECT *, "
        f"(ftan / (2.0 * frho * fnu * {_K02!r})) AS t10, "
        f"(ftan / (24.0 * frho * fnu3 * {_K04!r})"
        " * (5.0 + 3.0 * ftan2 + fe2c2 - 9.0 * ft2e2c2 - 4.0 * fe4c4)) AS t11, "
        f"(ftan / (720.0 * frho * fnu5 * {_K06!r})"
        " * (61.0 + 90.0 * ftan2 + 45.0 * ftan4 + 46.0 * fe2c2 - 252.0 * ft2e2c2"
        " - 90.0 * ft4e2c2 - 3.0 * fe4c4 - 66.0 * ft2e4c4 + 225.0 * ft4e4c4"
        " + 100.0 * fe6c6 + 84.0 * ft2e6c6 + 88.0 * fe8c8 - 192.0 * ft2e8c8)) AS t12, "
        f"(ftan / (40320.0 * frho * fnu7 * {_K08!r})"
        " * (1385.0 + 3633.0 * ftan2 + 4095.0 * ftan4 + 1575.0 * ftan6)) AS t13, "
        f"(1.0 / (fcos * fnu * {_K0!r})) AS t14, "
        f"(1.0 / (6.0 * fcos * fnu3 * {_K03!r}) * (1.0 + 2.0 * ftan2 + fe2c2)) AS t15, "
        f"(1.0 / (120.0 * fcos * fnu5 * {_K05!r})"
        " * (5.0 + 28.0 * ftan2 + 24.0 * ftan4 + 6.0 * fe2c2 + 8.0 * ft2e2c2"
        " - 3.0 * fe4c4 + 4.0 * ft2e4c4 - 4.0 * fe6c6 + 24.0 * ft2e6c6)) AS t16, "
        f"(1.0 / (5040.0 * fcos * fnu7 * {_K07!r})"
        " * (61.0 + 662.0 * ftan2 + 1320.0 * ftan4 + 720.0 * ftan6)) AS t17 "
        "FROM (" + q + ")"
    )
    q = (
        "SELECT *, "
        "((fphi - de2 * t10 + de4 * t11 - de6 * t12 + de8 * t13)"
        f" / {_DEG2RAD!r}) AS lat2_raw, "
        "((lam0 + de * t14 - de3 * t15 + de5 * t16 - de7 * t17)"
        f" / {_DEG2RAD!r}) AS lon2_raw FROM (" + q + ")"
    )
    # normalize_lonlat (geojson.kt:319-342)
    nlon = "(((lon2_raw + 180.0) % 360.0 + 360.0) % 360.0 - 180.0)"
    nlat0 = "(((lat2_raw + 90.0) % 360.0 + 360.0) % 360.0 - 90.0)"
    nlat = (
        f"(CASE WHEN {nlat0} >= 90.0 AND {nlat0} <= 180.0 THEN 180.0 - {nlat0}"
        f" WHEN {nlat0} >= -180.0 AND {nlat0} < -90.0 THEN -180.0 - {nlat0}"
        f" ELSE {nlat0} END)"
    )
    need = (
        "(lon2_raw < -180.0 OR lon2_raw > 180.0"
        " OR lat2_raw < -90.0 OR lat2_raw > 90.0)"
    )
    return (
        "SELECT doc_id, lat, lon, zone AS longitude_zone, "
        "letter AS latitude_zone_letter, easting, northing, "
        f"(CASE WHEN {need} THEN {nlat} ELSE lat2_raw END) AS lat2, "
        f"(CASE WHEN {need} THEN {nlon} ELSE lon2_raw END) AS lon2 "
        "FROM (" + q + ")"
    )
