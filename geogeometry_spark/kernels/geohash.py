"""Geohash kernels, bit-for-bit with reference GeoHashUtils.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/GeoHashUtils.kt
- alphabet (no a,i,l,o): GeoHashUtils.kt:29-62
- encode bisection:      GeoHashUtils.kt:97-140
- decodeBbox:            GeoHashUtils.kt:158-191
- decode (center):       GeoHashUtils.kt:206-213
- north/south/east/west: GeoHashUtils.kt:220-280
- contains:              GeoHashUtils.kt:289-291
- subHashes:             GeoHashUtils.kt:344-352
- isWest/isEast:         GeoHashUtils.kt:727-748
- suitableHashLength:    GeoHashUtils.kt:851-870

All vectorized functions accept/return numpy arrays; scalar convenience
wrappers are provided for driver-side planning code (covering).
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA = np.frombuffer(BASE32.encode("ascii"), dtype=np.uint8)
# char-code -> value decode table (255 = invalid)
_DECODE = np.full(128, 255, dtype=np.uint8)
for _i, _c in enumerate(BASE32):
    _DECODE[ord(_c)] = _i

DEFAULT_LENGTH = 12


def _as1d(x) -> np.ndarray:
    return np.atleast_1d(np.asarray(x, dtype=np.float64))


def encode(lat, lon, length: int = DEFAULT_LENGTH) -> np.ndarray:
    """Vectorized geohash encode replaying the reference bisection loop.

    Exact op order of GeoHashUtils.kt:102-139: interval midpoints are
    computed as (lo+hi)/2 in float64 and the comparison is strict ``>``.
    Returns an array of dtype ``<U{length}``.
    """
    if length < 1 or length > 12:
        raise ValueError("length must be between 1 and 12")
    lat = _as1d(lat)
    lon = _as1d(lon)
    n = lat.shape[0]
    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lon_lo = np.full(n, -180.0)
    lon_hi = np.full(n, 180.0)
    nbits = length * 5
    chars = np.zeros((length, n), dtype=np.uint8)
    ch = np.zeros(n, dtype=np.uint8)
    bit_vals = np.array([16, 8, 4, 2, 1], dtype=np.uint8)  # BITS, GeoHashUtils.kt:25
    pos = 0
    for b in range(nbits):
        if b % 2 == 0:  # even bit -> longitude
            mid = (lon_lo + lon_hi) / 2
            hi_mask = lon > mid
            lon_lo = np.where(hi_mask, mid, lon_lo)
            lon_hi = np.where(hi_mask, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            hi_mask = lat > mid
            lat_lo = np.where(hi_mask, mid, lat_lo)
            lat_hi = np.where(hi_mask, lat_hi, mid)
        ch = ch | np.where(hi_mask, bit_vals[b % 5], 0).astype(np.uint8)
        if b % 5 == 4:
            chars[pos] = ch
            pos += 1
            ch = np.zeros(n, dtype=np.uint8)
    codes = _ALPHA[chars.T.copy()]  # (n, length) of ascii codes
    return codes.view(f"S{length}").reshape(n).astype(f"U{length}")


def encode_with_bbox(lat: float, lon: float, length: int):
    """Scalar encode + final-interval bbox. GeoHashUtils.kt:771-818.

    Returns (hash, (west, south, east, north)).
    """
    h = encode(lat, lon, length)[0]
    w, s, e, n = decode_bbox_scalar(h)
    return h, (w, s, e, n)


def _decoded_values(hashes: np.ndarray, maxlen: int) -> np.ndarray:
    """(n, maxlen) uint8 char values, 255-padded past each hash's length."""
    n = hashes.shape[0]
    b = np.frombuffer(
        hashes.astype(f"S{maxlen}").tobytes(), dtype=np.uint8
    ).reshape(n, maxlen)
    vals = _DECODE[np.minimum(b, 127)]
    vals[b == 0] = 255  # padding bytes
    return vals


def decode_bbox(hashes) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decodeBbox. GeoHashUtils.kt:158-191.

    Returns (west, south, east, north) float64 arrays; replays the
    bisection with the exact (lo+hi)/2 float64 op order.
    """
    hashes = np.atleast_1d(np.asarray(hashes, dtype="U"))
    lengths = np.char.str_len(hashes)
    maxlen = int(lengths.max()) if hashes.size else 0
    n = hashes.shape[0]
    south = np.full(n, -90.0)
    north = np.full(n, 90.0)
    west = np.full(n, -180.0)
    east = np.full(n, 180.0)
    if maxlen == 0:
        return west, south, east, north
    vals = _decoded_values(hashes, maxlen)
    for i in range(maxlen):
        active = vals[:, i] != 255
        cur = np.where(active, vals[:, i], 0).astype(np.int32)
        for bpos, mask in enumerate((16, 8, 4, 2, 1)):
            bit = (cur & mask) != 0
            if (i * 5 + bpos) % 2 == 0:  # even -> longitude
                mid = (west + east) / 2
                west = np.where(active & bit, mid, west)
                east = np.where(active & ~bit, mid, east)
            else:
                mid = (south + north) / 2
                south = np.where(active & bit, mid, south)
                north = np.where(active & ~bit, mid, north)
    return west, south, east, north


def decode_bbox_scalar(h: str) -> tuple[float, float, float, float]:
    w, s, e, n = decode_bbox(np.array([h]))
    return float(w[0]), float(s[0]), float(e[0]), float(n[0])


def decode(hashes) -> tuple[np.ndarray, np.ndarray]:
    """Geohash center (lon, lat) — bbox midpoints, no rounding.
    GeoHashUtils.kt:206-213."""
    w, s, e, n = decode_bbox(hashes)
    return (e + w) / 2, (s + n) / 2


def north(hashes) -> np.ndarray:
    """Same-length hash directly north. GeoHashUtils.kt:237-243."""
    hashes = np.atleast_1d(np.asarray(hashes, dtype="U"))
    w, s, e, n = decode_bbox(hashes)
    lat = n + (n - s) / 2
    lon = (e + w) / 2
    return _encode_same_len(lat, lon, hashes)


def south(hashes) -> np.ndarray:
    """GeoHashUtils.kt:225-231."""
    hashes = np.atleast_1d(np.asarray(hashes, dtype="U"))
    w, s, e, n = decode_bbox(hashes)
    lat = s - (n - s) / 2
    lon = (e + w) / 2
    return _encode_same_len(lat, lon, hashes)


def west(hashes) -> np.ndarray:
    """Antimeridian-wrapping west neighbor. GeoHashUtils.kt:249-263."""
    hashes = np.atleast_1d(np.asarray(hashes, dtype="U"))
    w, s, e, n = decode_bbox(hashes)
    lat = (s + n) / 2
    lon = w - (e - w) / 2
    lon = np.where(lon < -180, 180 - (lon + 180), lon)
    lon = np.where(lon > 180, 180.0, lon)
    return _encode_same_len(lat, lon, hashes)


def east(hashes) -> np.ndarray:
    """Antimeridian-wrapping east neighbor. GeoHashUtils.kt:269-283."""
    hashes = np.atleast_1d(np.asarray(hashes, dtype="U"))
    w, s, e, n = decode_bbox(hashes)
    lat = (s + n) / 2
    lon = e + (e - w) / 2
    lon = np.where(lon > 180, -180 + (lon - 180), lon)
    lon = np.where(lon < -180, -180.0, lon)
    return _encode_same_len(lat, lon, hashes)


def _encode_same_len(lat: np.ndarray, lon: np.ndarray, ref: np.ndarray) -> np.ndarray:
    lengths = np.char.str_len(ref)
    out = np.empty(ref.shape[0], dtype=ref.dtype)
    for ln in np.unique(lengths):
        m = lengths == ln
        out[m] = encode(lat[m], lon[m], int(ln))
    return out


def neighbors_scalar(h: str) -> dict[str, str]:
    a = np.array([h])
    return {
        "north": str(north(a)[0]),
        "south": str(south(a)[0]),
        "east": str(east(a)[0]),
        "west": str(west(a)[0]),
    }


def contains(h: str, lat: float, lon: float) -> bool:
    """Point in geohash bbox (inclusive). GeoHashUtils.kt:289-291."""
    w, s, e, n = decode_bbox_scalar(h)
    return s <= lat <= n and w <= lon <= e


def sub_hashes(h: str) -> list[str]:
    """The 32 children, alphabetical. GeoHashUtils.kt:344-352."""
    return [h + c for c in BASE32]


def is_west(l1: float, l2: float) -> bool:
    """True if longitude l1 is west of l2 (shortest-arc rule).
    GeoHashUtils.kt:727-734."""
    ll1 = l1 + 180
    ll2 = l2 + 180
    if ll1 < ll2 and ll2 - ll1 < 180:
        return True
    return ll1 > ll2 and ll2 + 360 - ll1 < 180


def is_east(l1: float, l2: float) -> bool:
    """GeoHashUtils.kt:741-748."""
    ll1 = l1 + 180
    ll2 = l2 + 180
    if ll1 > ll2 and ll1 - ll2 < 180:
        return True
    return ll1 < ll2 and ll1 + 360 - ll2 < 180


def suitable_hash_length(granularity_m: float, lat: float, lon: float) -> int:
    """Largest hash length whose cell is narrower than granularity_m.
    GeoHashUtils.kt:851-870 — the reference's shrink-until-wider loop
    replayed over ONE batched decode of every prefix (the per-prefix
    scalar decodes were half the residual cost of a small covering)."""
    from .geometry import haversine

    h = str(encode(lat, lon, DEFAULT_LENGTH)[0])
    prefixes = [h[:k] for k in range(len(h), 0, -1)]
    w, s, e, n = decode_bbox(np.array(prefixes))
    widths = haversine(n, w, n, e)
    width = 0.0
    length = len(h)
    i = 0
    while width < granularity_m and i < len(prefixes):
        length = len(prefixes[i])
        width = float(widths[i])
        i += 1
    return min(length + 1, DEFAULT_LENGTH)


# --- scaled-integer (Morton) encode: the Spark-native fast path ----------
# The bisection with strict ``>`` places t=(lon+180)/360 in the cell
# I = ceil(t * 2^k) - 1 (clamped to [0, 2^k-1]).  These helpers exist to
# cross-check the native Column implementation in functions/columns.py
# against the reference bisection (parity tested in tests/).

def cell_index(value: np.ndarray, lo: float, span: float, bits: int) -> np.ndarray:
    t = (np.asarray(value, dtype=np.float64) - lo) / span
    idx = np.ceil(t * float(1 << bits)) - 1
    return np.clip(idx, 0, (1 << bits) - 1).astype(np.int64)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def encode_morton(lat, lon, length: int = DEFAULT_LENGTH) -> np.ndarray:
    """Geohash via scaled-integer + bit interleave (no per-bit loop).

    Semantically identical to :func:`encode` (strict-``>`` bisection);
    used to validate the Spark-native Column expression.
    """
    nbits = length * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    ilon = cell_index(_as1d(lon), -180.0, 360.0, lon_bits).astype(np.uint64)
    ilat = cell_index(_as1d(lat), -90.0, 180.0, lat_bits).astype(np.uint64)
    if lon_bits > lat_bits:
        # odd nbits: stream ends on a lon bit, so lon bit k sits at LSB
        # position 2k and lat bit k at 2k+1, with lon's extra top bit at
        # position 2*lat_bits.
        v = _spread_bits(ilon & np.uint64((1 << lat_bits) - 1)) | (
            _spread_bits(ilat) << np.uint64(1)
        )
        v |= (ilon >> np.uint64(lat_bits)) << np.uint64(2 * lat_bits)
    else:
        # even nbits: lon bit k at position 2k+1, lat bit k at 2k.
        v = (_spread_bits(ilon) << np.uint64(1)) | _spread_bits(ilat)
    n = v.shape[0]
    codes = np.empty((n, length), dtype=np.uint8)
    for i in range(length):
        shift = np.uint64(nbits - 5 * (i + 1))
        codes[:, i] = _ALPHA[((v >> shift) & np.uint64(31)).astype(np.int64)]
    return codes.view(f"S{length}").reshape(n).astype(f"U{length}")


def sub_hashes_north(h: str) -> list[str]:
    """GeoHashUtils.kt:357-365: children with char <= 'g'."""
    return [h + c for c in BASE32 if c <= "g"]


def sub_hashes_south(h: str) -> list[str]:
    """GeoHashUtils.kt:372-380: children with char >= 'h'."""
    return [h + c for c in BASE32 if c >= "h"]


def sub_hashes_north_west(h: str) -> list[str]:
    """GeoHashUtils.kt:387-395: char <= '7'."""
    return [h + c for c in BASE32 if c <= "7"]


def sub_hashes_north_east(h: str) -> list[str]:
    """GeoHashUtils.kt:402-410: '8' <= char <= 'g'."""
    return [h + c for c in BASE32 if "8" <= c <= "g"]


def sub_hashes_south_west(h: str) -> list[str]:
    """GeoHashUtils.kt:417-425: 'h' <= char <= 'r'."""
    return [h + c for c in BASE32 if "h" <= c <= "r"]


def sub_hashes_south_east(h: str) -> list[str]:
    """GeoHashUtils.kt:432-440: char >= 's'."""
    return [h + c for c in BASE32 if c >= "s"]


def is_north(l1: float, l2: float) -> bool:
    """GeoHashUtils.kt:757-759."""
    return l1 > l2


def is_south(l1: float, l2: float) -> bool:
    """GeoHashUtils.kt:766-768."""
    return l1 < l2
