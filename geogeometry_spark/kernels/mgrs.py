"""MGRS / USNG grid-reference kernels (vectorized numpy).

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/mgrs.kt
(toMgrs mgrs.kt:146-161 + lookupGridLetters mgrs.kt:107-135, toUtm
mgrs.kt:202-225, parse mgrs.kt:230-255, precision enum mgrs.kt:32-38,
formats mgrs.kt:65-78).  UTM-range latitudes only (the reference's UPS
path is one-way and marked FIXME, mgrs.kt:271-312; we mirror the
supported surface).
"""

from __future__ import annotations

import re

import numpy as np

HUNDRED_KM = 100_000
TWO_MILLION = 2_000_000

# MgrsPrecision (mgrs.kt:32-38): digits -> meters
PRECISION_METERS = {1: 10000, 2: 1000, 3: 100, 4: 10, 5: 1}

_COL_LETTERS = {  # mgrs.kt:95-103, keyed by set number
    1: "ABCDEFGH",
    2: "JKLMNPQR",
    3: "STUVWXYZ",
    4: "ABCDEFGH",
    5: "JKLMNPQR",
    6: "STUVWXYZ",
}
_ROW_EVEN = "FGHJKLMNPQRSTUVABCDE"  # mgrs.kt:105 (set % 2 == 0)
_ROW_ODD = "ABCDEFGHJKLMNPQRSTUV"

# LatitudeBandConstants (mgrs.kt:172-193): letter -> (minNorthing, northingOffset)
_BAND = {
    "C": (1100000.0, 0.0),
    "D": (2000000.0, 2000000.0),
    "E": (2800000.0, 2000000.0),
    "F": (3700000.0, 2000000.0),
    "G": (4600000.0, 4000000.0),
    "H": (5500000.0, 4000000.0),
    "J": (6400000.0, 6000000.0),
    "K": (7300000.0, 6000000.0),
    "L": (8200000.0, 8000000.0),
    "M": (9100000.0, 8000000.0),
    "N": (0.0, 0.0),
    "P": (800000.0, 0.0),
    "Q": (1700000.0, 0.0),
    "R": (2600000.0, 2000000.0),
    "S": (3500000.0, 2000000.0),
    "T": (4400000.0, 4000000.0),
    "U": (5300000.0, 4000000.0),
    "V": (6200000.0, 6000000.0),
    "W": (7000000.0, 6000000.0),
    "X": (7900000.0, 6000000.0),
}

_EASTING_ARRAY = ["", "AJS", "BKT", "CLU", "DMV", "ENW", "FPX", "GQY", "HRZ"]

MGRS_REGEX = re.compile(
    r"([0-9]+)\s*([A-Z])\s*([A-Z])\s*([A-Z])\s*([0-9]{1,5}\s*[0-9]{1,5})"
)


def _set_for_zone(zone: np.ndarray) -> np.ndarray:
    """mgrs.kt:81-91: zone % 6 with 0 -> 6."""
    s = np.asarray(zone, dtype=np.int64) % 6
    return np.where(s == 0, 6, s)


def to_mgrs(lon_zone, letters, easting, northing):
    """UtmCoordinate.toMgrs (mgrs.kt:107-161).  Returns
    (first_letter uint8, second_letter uint8, easting int, northing int)."""
    lz = np.atleast_1d(np.asarray(lon_zone, dtype=np.int64))
    e = np.atleast_1d(np.asarray(easting, dtype=np.float64))
    n = np.atleast_1d(np.asarray(northing, dtype=np.float64))
    row = (1 + np.floor(n).astype(np.int64) // HUNDRED_KM) % 20
    col = (np.floor(e).astype(np.int64) // HUNDRED_KM) % 8
    actual_col = np.where(col == 0, 7, col - 1)
    actual_row = np.where(row == 0, 19, row - 1)
    sets = _set_for_zone(lz)
    col_tab = np.array(
        [[ord(c) for c in _COL_LETTERS[s]] for s in range(1, 7)], dtype=np.uint8
    )
    row_tab = np.array(
        [
            [ord(c) for c in (_ROW_EVEN if s % 2 == 0 else _ROW_ODD)]
            for s in range(1, 7)
        ],
        dtype=np.uint8,
    )
    first = col_tab[sets - 1, actual_col]
    second = row_tab[sets - 1, actual_row]
    mgrs_e = np.floor(e % HUNDRED_KM).astype(np.int64)
    mgrs_n = np.floor(n % HUNDRED_KM).astype(np.int64)
    return first, second, mgrs_e, mgrs_n


def mgrs_to_utm(lon_zone, letters, first, second, easting, northing):
    """MgrsCoordinate.toUtm (mgrs.kt:202-225).  Returns (easting,
    northing) doubles; lon_zone/letters pass through unchanged."""
    lz = np.atleast_1d(np.asarray(lon_zone, dtype=np.int64))
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    f = np.atleast_1d(np.asarray(first, dtype=np.uint8))
    s = np.atleast_1d(np.asarray(second, dtype=np.uint8))
    e = np.atleast_1d(np.asarray(easting, dtype=np.int64))
    n = np.atleast_1d(np.asarray(northing, dtype=np.int64))

    col_idx = np.zeros(f.shape, dtype=np.int64)
    for i, letters_s in enumerate(_EASTING_ARRAY):
        if not letters_s:
            continue
        hit = np.isin(f, [ord(c) for c in letters_s])
        col_idx = np.where((col_idx == 0) & hit, i, col_idx)
    utm_e = (col_idx * HUNDRED_KM + e).astype(np.float64)

    sets = _set_for_zone(lz)
    row_tab = np.full((7, 256), -1, dtype=np.int64)
    for snum in range(1, 7):
        rl = _ROW_EVEN if snum % 2 == 0 else _ROW_ODD
        for idx, ch in enumerate(rl):
            row_tab[snum, ord(ch)] = idx
    row_idx = row_tab[sets, s]
    utm_n = (row_idx * HUNDRED_KM).astype(np.float64)

    # UPS letters (A/B/Y/Z) are unsupported (reference FIXME,
    # mgrs.kt:203) -> NaN instead of raising
    band = [_BAND.get(chr(c), (np.nan, np.nan)) for c in lt]
    min_n = np.array([b[0] for b in band])
    off_n = np.array([b[1] for b in band])
    utm_n = utm_n + off_n
    # while utm_n < min_n: += 2_000_000 (mgrs.kt:218-220); bounded loop
    for _ in range(6):
        low = utm_n < min_n  # NaN min_n -> False, passes through
        if not low.any():
            break
        utm_n = np.where(low, utm_n + TWO_MILLION, utm_n)
    utm_n = utm_n + n
    return utm_e, utm_n


def format_mgrs(lon_zone, letters, first, second, easting, northing,
                digits: int = 5, spaces: bool = True) -> np.ndarray:
    """usng (spaces) / mgrs (compact) formats (mgrs.kt:65-78)."""
    meters = PRECISION_METERS[digits]
    lz = np.atleast_1d(np.asarray(lon_zone, dtype=np.int64))
    lt = np.atleast_1d(np.asarray(letters, dtype=np.uint8))
    f = np.atleast_1d(np.asarray(first, dtype=np.uint8))
    s = np.atleast_1d(np.asarray(second, dtype=np.uint8))
    e = np.atleast_1d(np.asarray(easting, dtype=np.int64)) // meters
    n = np.atleast_1d(np.asarray(northing, dtype=np.int64)) // meters
    sep = " " if spaces else ""
    return np.array(
        [
            f"{z}{chr(a)}{sep}{chr(b)}{chr(c)}{sep}"
            f"{str(ee).zfill(digits)}{sep}{str(nn).zfill(digits)}"
            for z, a, b, c, ee, nn in zip(lz, lt, f, s, e, n)
        ],
        dtype=object,
    )


def parse_mgrs(text: str):
    """String.parseMgrs (mgrs.kt:237-255): first match in free text ->
    (lon_zone, letter, first, second, easting_m, northing_m) or None."""
    m = MGRS_REGEX.search(text)
    if m is None:
        return None
    numbers = m.group(5).replace(" ", "")
    if len(numbers) % 2 != 0:
        return None
    mid = len(numbers) // 2
    meters = PRECISION_METERS[mid]
    return (
        int(m.group(1)),
        m.group(2),
        m.group(3),
        m.group(4),
        int(numbers[:mid]) * meters,
        int(numbers[mid:]) * meters,
    )
