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
        # equatorial line; NaN ONLY — the reference (vicenty.kt:110)
        # leaves a ±inf c2sm (cosSqAlpha rounds to 0 while
        # sinU1*sinU2 != 0, i.e. both points within float rounding of
        # the equator) unguarded and returns NaN; kept bit-faithful
        c2sm = np.where(np.isnan(c2sm), 0.0, c2sm)
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


_STATE_COLS = (
    "doc_id, lat, lon, lon_diff, tan_u1, cos_u1, sin_u1, lam, active, coin, "
    "sl_f, cl_f, ss_f, cs_f, sig_f, csa_f, c2sm_f"
)


def vincenty_oracle_sql(src: str, lat2: float, lon2: float,
                        iters: int = 100) -> str:
    """DuckDB twin of :func:`vincenty` against a constant destination:
    the lambda iteration is unrolled as ``iters`` chained CTEs, each
    guarded by the same convergence/coincidence freezing as the kernel
    (converged rows stop updating, so extra layers are no-ops and the
    100-layer unroll is semantically identical to the loop).

    ``src`` must yield (doc_id, lat, lon).  Exact-double parity is not
    guaranteed — numpy's vectorized trig and DuckDB's libm differ by an
    ulp, drifting the result by <= ~4e-9 m / ~1e-12 deg (measured over a
    global sample incl. near-antipodal) — so consumers should compare at
    centimeter precision (round 2) where a boundary flip needs a true
    value within 4e-9 of a 5e-3 grid edge.
    """
    d2r = repr(math.pi / 180.0)
    r2d = repr(1.0 / (math.pi / 180.0))
    tan_u2 = (1 - _F) * math.tan(lat2 * (math.pi / 180.0))
    cos_u2 = 1 / math.sqrt(1 + tan_u2 * tan_u2)
    sin_u2 = tan_u2 * cos_u2
    su2, cu2 = repr(sin_u2), repr(cos_u2)
    f = repr(_F)
    c_expr = f"({f} / 16 * _csa * (4 + {f} * (4 - 3 * _csa)))"
    ctes = [
        f"it0 AS (SELECT {_STATE_COLS} FROM (SELECT *, "
        f"(tan_u1 * cos_u1) AS sin_u1, lon_diff AS lam, "
        f"TRUE AS active, FALSE AS coin, 0.0 AS sl_f, 1.0 AS cl_f, "
        f"0.0 AS ss_f, 1.0 AS cs_f, 0.0 AS sig_f, 1.0 AS csa_f, "
        f"0.0 AS c2sm_f FROM ("
        f"SELECT *, (1 / sqrt(1 + tan_u1 * tan_u1)) AS cos_u1 FROM ("
        f"SELECT doc_id, lat, lon, "
        f"(({lon2!r} * {d2r}) - (lon * {d2r})) AS lon_diff, "
        f"((1 - {f}) * tan(lat * {d2r})) AS tan_u1 FROM {src}))))"
    ]
    for i in range(iters):
        ctes.append(f"""it{i + 1} AS (
  SELECT doc_id, lat, lon, lon_diff, tan_u1, cos_u1, sin_u1,
    (CASE WHEN _act2 THEN _lamn ELSE lam END) AS lam,
    (_act2 AND abs(_lamn - lam) > 1e-12) AS active,
    (coin OR _newcoin) AS coin,
    (CASE WHEN _act2 THEN _sl ELSE sl_f END) AS sl_f,
    (CASE WHEN _act2 THEN _cl ELSE cl_f END) AS cl_f,
    (CASE WHEN _act2 THEN _ss ELSE ss_f END) AS ss_f,
    (CASE WHEN _act2 THEN _cs ELSE cs_f END) AS cs_f,
    (CASE WHEN _act2 THEN _sig ELSE sig_f END) AS sig_f,
    (CASE WHEN _act2 THEN _csa ELSE csa_f END) AS csa_f,
    (CASE WHEN _act2 THEN _c2sm ELSE c2sm_f END) AS c2sm_f
  FROM (
    SELECT *,
      (lon_diff + (1 - {c_expr}) * {f} * _sina *
        (_sig + {c_expr} * _ss *
         (_c2sm + {c_expr} * _cs * (-1 + 2 * _c2sm * _c2sm)))) AS _lamn
    FROM (
      SELECT *,
        (CASE WHEN isnan(_cs - 2 * sin_u1 * {su2} / _csa) THEN 0.0
              ELSE _cs - 2 * sin_u1 * {su2} / _csa END) AS _c2sm
      FROM (
        SELECT *, (1 - _sina * _sina) AS _csa
        FROM (
          SELECT *,
            (active AND _ss = 0.0) AS _newcoin,
            (active AND _ss <> 0.0) AS _act2,
            (sin_u1 * {su2} + cos_u1 * {cu2} * _cl) AS _cs,
            atan2(_ss, _cs) AS _sig,
            (cos_u1 * {cu2} * _sl / _ss) AS _sina
          FROM (
            SELECT *, sqrt(({cu2} * _sl) * ({cu2} * _sl) + _t * _t) AS _ss
            FROM (
              SELECT *, (cos_u1 * {su2} - sin_u1 * {cu2} * _cl) AS _t
              FROM (SELECT *, sin(lam) AS _sl, cos(lam) AS _cl FROM it{i})
            )
          )
        )
      )
    )
  )
)""")
    a2 = f"CAST({_A!r} AS DOUBLE)"
    b2 = f"CAST({_B!r} AS DOUBLE)"
    two_pi = repr(2 * math.pi)
    final = f"""SELECT doc_id,
  (CASE WHEN coin THEN 0.0 ELSE {b2} * _aterm * (sig_f - _dsig) END) AS distance_m,
  (CASE WHEN coin THEN 0.0 ELSE
    (((atan2({cu2} * sl_f, cos_u1 * {su2} - sin_u1 * {cu2} * cl_f) + {two_pi})
      % {two_pi}) * {r2d}) END) AS initial_bearing
FROM (
  SELECT *,
    (_bterm * ss_f * (c2sm_f + _bterm / 4 * (cs_f * (-1 + 2 * c2sm_f * c2sm_f)
      - _bterm / 6 * c2sm_f * (-3 + 4 * ss_f * ss_f)
        * (-3 + 4 * c2sm_f * c2sm_f)))) AS _dsig
  FROM (
    SELECT *,
      (1 + _usq / 16384 * (4096 + _usq * (-768 + _usq * (320 - 175 * _usq)))) AS _aterm,
      (_usq / 1024 * (256 + _usq * (-128 + _usq * (74 - 47 * _usq)))) AS _bterm
    FROM (SELECT *, (csa_f * ({a2} * {a2} - {b2} * {b2}) / ({b2} * {b2})) AS _usq
          FROM it{iters})
  )
)"""
    return "WITH " + ", ".join(ctes) + " " + final
