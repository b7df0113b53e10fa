"""Vincenty ellipsoidal distance + bearings, vectorized with numpy masks.

Reference: /root/reference/src/commonMain/kotlin/com/jillesvangurp/geo/vicenty.kt:63-140
(WGS84 a=6378137, b=6356752.314245, f=1/298.257223563; lambda convergence
1e-12, max 100 iterations; co-incident points -> (0,0,0)).
"""

from __future__ import annotations

import math

import numpy as np

from .geometry import to_radians, from_radians

_B = 6356752.314245  # vicenty.kt:63 EARTH_RADIUS (polar, "b")
_A = 6378137.0  # vicenty.kt:64 RADIUS_AT_EQUATOR
_F = 1 / 298.257223563  # vicenty.kt:77


def vincenty(lat1, lon1, lat2, lon2) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (distance_m, initial_bearing_deg, final_bearing_deg).

    Vectorized port of vicenty.kt:72-140; all rows iterate together with a
    convergence mask (converged rows freeze their lambda), which preserves
    per-row float64 results because each row's update sequence is
    unchanged.
    """
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))

    lon_diff = to_radians(lon2) - to_radians(lon1)
    tan_u1 = (1 - _F) * np.tan(to_radians(lat1))
    cos_u1 = 1 / np.sqrt(1 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    tan_u2 = (1 - _F) * np.tan(to_radians(lat2))
    cos_u2 = 1 / np.sqrt(1 + tan_u2 * tan_u2)
    sin_u2 = tan_u2 * cos_u2

    lam = lon_diff.copy()
    n = lat1.shape[0]
    active = np.ones(n, dtype=bool)
    coincident = np.zeros(n, dtype=bool)
    sin_sigma = np.zeros(n)
    cos_sigma = np.ones(n)
    sigma = np.zeros(n)
    cos_sq_alpha = np.ones(n)
    cos2_sigma_m = np.zeros(n)
    sin_lambda = np.zeros(n)
    cos_lambda = np.ones(n)

    for _ in range(100):
        if not active.any():
            break
        sl = np.sin(lam)
        cl = np.cos(lam)
        t = cos_u1 * sin_u2 - sin_u1 * cos_u2 * cl
        sin_sq_sigma = cos_u2 * sl * (cos_u2 * sl) + t * t
        ss = np.sqrt(sin_sq_sigma)
        newly_coincident = active & (ss == 0.0)
        coincident |= newly_coincident
        active &= ~newly_coincident
        cs = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cl
        sig = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = cos_u1 * cos_u2 * sl / ss
            csa = 1 - sin_alpha * sin_alpha
            c2sm = cs - 2 * sin_u1 * sin_u2 / csa
        c2sm = np.where(np.isnan(c2sm), 0.0, c2sm)  # equatorial line
        c = _F / 16 * csa * (4 + _F * (4 - 3 * csa))
        lam_new = lon_diff + (1 - c) * _F * sin_alpha * (
            sig + c * ss * (c2sm + c * cs * (-1 + 2 * c2sm * c2sm))
        )
        # commit state for active rows
        sin_lambda = np.where(active, sl, sin_lambda)
        cos_lambda = np.where(active, cl, cos_lambda)
        sin_sigma = np.where(active, ss, sin_sigma)
        cos_sigma = np.where(active, cs, cos_sigma)
        sigma = np.where(active, sig, sigma)
        cos_sq_alpha = np.where(active, csa, cos_sq_alpha)
        cos2_sigma_m = np.where(active, c2sm, cos2_sigma_m)
        done = active & (np.abs(lam_new - lam) <= 1e-12)
        lam = np.where(active, lam_new, lam)
        active &= ~done

    u_sq = cos_sq_alpha * (_A * _A - _B * _B) / (_B * _B)
    a_term = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    b_term = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = b_term * sin_sigma * (
        cos2_sigma_m
        + b_term / 4 * (
            cos_sigma * (-1 + 2 * cos2_sigma_m * cos2_sigma_m)
            - b_term / 6 * cos2_sigma_m * (-3 + 4 * sin_sigma * sin_sigma)
            * (-3 + 4 * cos2_sigma_m * cos2_sigma_m)
        )
    )
    distance = _B * a_term * (sigma - delta_sigma)
    initial = np.arctan2(cos_u2 * sin_lambda, cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lambda)
    initial = (initial + 2 * math.pi) % (2 * math.pi)
    final = np.arctan2(cos_u1 * sin_lambda, -sin_u1 * cos_u2 + cos_u1 * sin_u2 * cos_lambda)
    final = (final + 2 * math.pi) % (2 * math.pi)
    distance = np.where(coincident, 0.0, distance)
    initial = np.where(coincident, 0.0, from_radians(initial))
    final = np.where(coincident, 0.0, from_radians(final))
    return distance, initial, final


def vincenty_distance(lat1, lon1, lat2, lon2) -> np.ndarray:
    return vincenty(lat1, lon1, lat2, lon2)[0]
