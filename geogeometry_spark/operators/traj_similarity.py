"""Trajectory-similarity join: discrete Hausdorff distance ≤ τ.

The reference measures single geometries (haversine, distanceToLine —
Geometry.kt distance family); this lifts them to TRIP-pair similarity:
which trips travel "the same route"?  Similarity is the symmetric
discrete Hausdorff distance H(A,B) = max(h(A,B), h(B,A)) with
h(A,B) = max_a min_b d(a,b) over geodesic fix distances — the standard
route-matching measure — thresholded at ``tau_m``.

Scale design:
- Trips come from :func:`.trajectory.sessionize` (the one user-keyed
  exchange the whole trajectory family shares).
- **Candidates** use a provable necessary condition: if H(A,B) ≤ τ,
  then A's HEAD fix is within τ of some B fix (min_b d(head_a, b) ≤
  h(A,B) ≤ τ).  So each trip's head explodes a 3×3 tile ring at the
  finest zoom whose cells are ≥ τ everywhere in the study band
  (:func:`.cluster.dbscan_zoom_for_eps` — the DBSCAN/colocation
  argument), joins the fix relation on the cell key, and candidate
  trip pairs are a superset of every qualifying pair.  Nothing is
  ever all-pairs: the join is head×fix, not fix×fix.
- **Exact phase**: candidate pairs attach both trips' fixes (two
  equi-joins on the trip key), distances quantize to mm BIGINTs
  (trajectory.py's pattern — partial-agg order can't move integer
  min/max), and two map-side-combinable aggregations produce
  max-of-min in each direction.  Cost is Σ|A|·|B| over CANDIDATE
  pairs only; trips longer than ``max_trip_fixes`` are EXCLUDED, not
  truncated (radius_join_bulk's convention) — run
  :func:`.trajectory.simplify_trips` first to compress long tracks.

Output: one row per unordered qualifying pair (user_a, session_a,
user_b, session_b, n_a, n_b, hausdorff_mm), trip keys normalized so
(user_a, session_a) < (user_b, session_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from .cluster import dbscan_zoom_for_eps
from .trajectory import sessionize, sessionize_oracle_sql

__all__ = [
    "hausdorff_join",
    "hausdorff_join_oracle_sql",
    "frechet_join",
    "frechet_join_oracle_sql",
    "dtw_join",
    "dtw_join_oracle_sql",
    "route_clusters",
    "route_clusters_oracle_sql",
    "lcss_join",
    "lcss_join_oracle_sql",
    "edr_join",
    "edr_join_oracle_sql",
]

_RING = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def hausdorff_join(
    points: DataFrame,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> DataFrame:
    zoom = dbscan_zoom_for_eps(tau_m, max_abs_lat)
    if zoom < 2:
        raise ValueError(
            f"tau {tau_m} m needs zoom {zoom} (< 2): planetary-scale "
            "similarity radii degenerate to all-pairs; reduce tau."
        )
    n_tiles = 1 << zoom
    tau_mm = round(tau_m * 1000.0)

    fx = sessionize(
        points, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    ).select(
        F.col(user_col).alias("_u"),
        F.col("session_id").alias("_s"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_la"),
        F.col(lon_col).alias("_lo"),
    )
    # over-cap trips excluded (documented), and the fix relation is
    # reused three times below — checkpoint the filtered relation once
    sizes = fx.groupBy("_u", "_s").agg(F.count(F.lit(1)).alias("_n"))
    fx = (
        fx.join(
            sizes.where(F.col("_n") <= max_trip_fixes), ["_u", "_s"]
        ).localCheckpoint()
    )

    x, y = C.tile_xy(F.col("_la"), F.col("_lo"), zoom)
    cells = fx.select("_u", "_s", "_la", "_lo", x.alias("_tx"), y.alias("_ty"))
    heads = (
        fx.groupBy("_u", "_s")
        .agg(
            F.min_by(
                F.struct("_la", "_lo"), F.struct("_t", "_id")
            ).alias("_h")
        )
        .select(
            "_u", "_s", F.col("_h._la").alias("_hla"),
            F.col("_h._lo").alias("_hlo"),
        )
    )
    hx, hy = C.tile_xy(F.col("_hla"), F.col("_hlo"), zoom)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _RING
        ]
    )
    probe = (
        heads.select("_u", "_s", hx.alias("_hx"), hy.alias("_hy"))
        .withColumn("_o", F.explode(offs))
        .select(
            F.col("_u").alias("_ua"),
            F.col("_s").alias("_sa"),
            F.pmod(F.col("_hx") + F.col("_o.dx"), F.lit(n_tiles)).alias(
                "_tx"
            ),
            (F.col("_hy") + F.col("_o.dy")).alias("_ty"),
        )
        .dropDuplicates(["_ua", "_sa", "_tx", "_ty"])
    )
    build = cells.select(
        F.col("_u").alias("_ub"), F.col("_s").alias("_sb"), "_tx", "_ty"
    )
    # unordered trip-pair normalization AFTER the match: H is symmetric
    # and the head-ring condition holds from BOTH heads when H <= tau,
    # so keeping (A, B) with A < B loses nothing
    a_lt_b = (F.col("_ua") < F.col("_ub")) | (
        (F.col("_ua") == F.col("_ub")) & (F.col("_sa") < F.col("_sb"))
    )
    cand = (
        probe.join(build, ["_tx", "_ty"])
        .where(a_lt_b)
        .select("_ua", "_sa", "_ub", "_sb")
        .dropDuplicates(["_ua", "_sa", "_ub", "_sb"])
    )

    fa = fx.select(
        F.col("_u").alias("_ua"), F.col("_s").alias("_sa"),
        F.col("_id").alias("_ida"), F.col("_la").alias("_laa"),
        F.col("_lo").alias("_loa"),
    )
    fb = fx.select(
        F.col("_u").alias("_ub"), F.col("_s").alias("_sb"),
        F.col("_id").alias("_idb"), F.col("_la").alias("_lab"),
        F.col("_lo").alias("_lob"),
    )
    d_mm = F.round(
        C.haversine(
            F.col("_laa"), F.col("_loa"), F.col("_lab"), F.col("_lob")
        )
        * F.lit(1000.0)
    ).cast("long")
    pf = (
        cand.join(fa, ["_ua", "_sa"])
        .join(fb, ["_ub", "_sb"])
        .select("_ua", "_sa", "_ub", "_sb", "_ida", "_idb",
                d_mm.alias("_d"))
    )
    keys = ["_ua", "_sa", "_ub", "_sb"]
    h_ab = (
        pf.groupBy(*keys, "_ida").agg(F.min("_d").alias("_m"))
        .groupBy(*keys)
        .agg(F.max("_m").alias("_hab"), F.count(F.lit(1)).alias("n_a"))
    )
    h_ba = (
        pf.groupBy(*keys, "_idb").agg(F.min("_d").alias("_m"))
        .groupBy(*keys)
        .agg(F.max("_m").alias("_hba"), F.count(F.lit(1)).alias("n_b"))
    )
    out = (
        h_ab.join(h_ba, keys)
        .where(F.greatest(F.col("_hab"), F.col("_hba")) <= F.lit(tau_mm))
        .select(
            F.col("_ua").alias("user_a"),
            F.col("_sa").alias("session_a"),
            F.col("_ub").alias("user_b"),
            F.col("_sb").alias("session_b"),
            "n_a",
            "n_b",
            F.greatest(F.col("_hab"), F.col("_hba")).alias(
                "hausdorff_mm"
            ),
        )
    )
    return out


def hausdorff_join_oracle_sql(
    subq: str,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> str:
    """DuckDB twin: same sessionize CTE, same over-cap exclusion, same
    head-ring candidate membership (Chebyshev tile distance ≤ 1 with
    x-wrap at the same zoom), same mm quantization and min/max order.
    ``subq`` exposes (user_id, event_id, ts_sec, lat, lon)."""
    zoom = dbscan_zoom_for_eps(tau_m, max_abs_lat)
    n = 1 << zoom
    tau_mm = round(tau_m * 1000.0)
    sess = sessionize_oracle_sql(
        subq, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    )
    tx, ty = C.tile_xy_sql(lat, lon, zoom)
    htx, hty = C.tile_xy_sql("hla", "hlo", zoom)
    hav = C.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    return (
        f"WITH sess AS ({sess}), "
        f"fx AS (SELECT s.* FROM sess s JOIN (SELECT user_id, "
        f"session_id FROM sess GROUP BY user_id, session_id "
        f"HAVING count(*) <= {max_trip_fixes}) k "
        f"USING (user_id, session_id)), "
        f"cells AS (SELECT user_id, session_id, {lat} AS lat, "
        f"{lon} AS lon, {tx} AS tx, {ty} AS ty FROM fx), "
        f"heads AS (SELECT user_id, session_id, {lat} AS hla, "
        f"{lon} AS hlo FROM fx QUALIFY row_number() OVER "
        f"(PARTITION BY user_id, session_id ORDER BY {ts_col}, "
        f"{id_col}) = 1), "
        f"hcells AS (SELECT user_id, session_id, {htx} AS hx, "
        f"{hty} AS hy FROM heads), "
        "cand AS (SELECT DISTINCT h.user_id AS ua, h.session_id AS sa, "
        "c.user_id AS ub, c.session_id AS sb "
        "FROM hcells h JOIN cells c ON "
        f"least((c.tx - h.hx + {n}) % {n}, (h.hx - c.tx + {n}) % {n}) "
        "<= 1 AND abs(c.ty - h.hy) <= 1 "
        "WHERE (h.user_id, h.session_id) < (c.user_id, c.session_id)), "
        "pf AS (SELECT p.ua, p.sa, p.ub, p.sb, "
        f"a.{id_col} AS ida, b.{id_col} AS idb, "
        f"CAST(round(({hav}) * 1000.0) AS BIGINT) AS d "
        "FROM cand p "
        "JOIN (SELECT user_id, session_id, event_id, "
        f"{lat} AS lat, {lon} AS lon FROM fx) a "
        "ON a.user_id = p.ua AND a.session_id = p.sa "
        "JOIN (SELECT user_id, session_id, event_id, "
        f"{lat} AS lat, {lon} AS lon FROM fx) b "
        "ON b.user_id = p.ub AND b.session_id = p.sb), "
        "hab AS (SELECT ua, sa, ub, sb, max(m) AS hab, count(*) AS n_a "
        "FROM (SELECT ua, sa, ub, sb, ida, min(d) AS m FROM pf "
        "GROUP BY ua, sa, ub, sb, ida) GROUP BY ua, sa, ub, sb), "
        "hba AS (SELECT ua, sa, ub, sb, max(m) AS hba, count(*) AS n_b "
        "FROM (SELECT ua, sa, ub, sb, idb, min(d) AS m FROM pf "
        "GROUP BY ua, sa, ub, sb, idb) GROUP BY ua, sa, ub, sb) "
        "SELECT hab.ua AS user_a, hab.sa AS session_a, "
        "hab.ub AS user_b, hab.sb AS session_b, n_a, n_b, "
        "greatest(hab, hba) AS hausdorff_mm "
        "FROM hab JOIN hba ON hab.ua = hba.ua AND hab.sa = hba.sa "
        "AND hab.ub = hba.ub AND hab.sb = hba.sb "
        f"WHERE greatest(hab, hba) <= {tau_mm}"
    )


def _frechet_dp_mm(d: "np.ndarray") -> int:
    """Exact discrete Fréchet value over an (n, m) int64 mm-distance
    matrix: c(i,j) = max(d[i,j], min(c(i-1,j), c(i,j-1), c(i-1,j-1))).

    The recurrence is sequential along rows AND columns, but every cell
    of one anti-diagonal depends only on the previous two diagonals, so
    the sweep vectorizes as n+m-1 numpy steps over INF-filled
    per-diagonal arrays indexed by absolute row i (INF marks off-diagonal
    cells, so predecessor validity needs no masks beyond index clamps).
    """
    import numpy as np

    n, m = d.shape
    inf = np.int64(1) << 62
    prev = np.full(n, inf, np.int64)   # diagonal k-1, indexed by i
    prev2 = np.full(n, inf, np.int64)  # diagonal k-2
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)
        ii = np.arange(i_lo, i_hi + 1)
        dk = d[ii, k - ii]
        cur = np.full(n, inf, np.int64)
        if k == 0:
            cur[0] = d[0, 0]
        else:
            im1 = np.maximum(ii - 1, 0)
            up = np.where(ii > 0, prev[im1], inf)      # c(i-1, j)
            left = prev[ii]                             # c(i,  j-1)
            diag = np.where(ii > 0, prev2[im1], inf)    # c(i-1, j-1)
            cur[i_lo : i_hi + 1] = np.maximum(
                dk, np.minimum(np.minimum(up, left), diag)
            )
        prev2, prev = prev, cur
    return int(prev[n - 1])


def _dtw_dp_mm(d: "np.ndarray") -> int:
    """Exact DTW total cost over an (n, m) int64 mm-distance matrix:
    c(i,j) = d[i,j] + min(c(i-1,j), c(i,j-1), c(i-1,j-1)).

    Same anti-diagonal vectorization as :func:`_frechet_dp_mm` (sum
    combine instead of max), with one extra rule: every computed cell
    clamps to the INF marker (``min(INF, d + min(...))``) — unlike
    max-combine, sum-combine lets the garbage values in off-diagonal
    cells GROW by INF per sweep (INF + INF + ...), which would overflow
    int64 after ~128 diagonals; the clamp pins them to exactly INF, and
    no valid path can reach INF = 2^56 mm (72 billion km)."""
    import numpy as np

    n, m = d.shape
    inf = np.int64(1) << 56
    prev = np.full(n, inf, np.int64)   # diagonal k-1, indexed by i
    prev2 = np.full(n, inf, np.int64)  # diagonal k-2
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)
        ii = np.arange(i_lo, i_hi + 1)
        dk = d[ii, k - ii]
        cur = np.full(n, inf, np.int64)
        if k == 0:
            cur[0] = d[0, 0]
        else:
            im1 = np.maximum(ii - 1, 0)
            up = np.where(ii > 0, prev[im1], inf)      # c(i-1, j)
            left = prev[ii]                             # c(i,  j-1)
            diag = np.where(ii > 0, prev2[im1], inf)    # c(i-1, j-1)
            cur[i_lo : i_hi + 1] = np.minimum(
                dk + np.minimum(np.minimum(up, left), diag), inf
            )
        prev2, prev = prev, cur
    return int(prev[n - 1])


def frechet_join(
    points: DataFrame,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> DataFrame:
    """Order-aware trajectory-similarity join: unordered trip pairs
    whose DISCRETE FRÉCHET distance is ≤ ``tau_m`` — the dog-leash
    measure that distinguishes "same route, same direction" from mere
    point-set overlap (reference distance kernels GeoGeometry.kt:565-580
    lifted to coupled-walk sequence similarity; Hausdorff's unordered
    twin lives in :func:`hausdorff_join`).

    Scale design — strictly cheaper candidates than Hausdorff:
    - Any coupling starts at (a₁, b₁) and ends at (a_n, b_m), so
      d(head_a, head_b) ≤ dF and d(tail_a, tail_b) ≤ dF are BOTH
      necessary.  Candidates are a head×head cell equi-join at the
      τ-safe zoom (3×3 ring, x-wrap) — one row per trip on each side,
      never touching the fix relation — then an exact native
      mm-quantized head AND tail prefilter.  Every comparison is on
      rounded BIGINT mm (the final dF is a max of rounded cell values,
      so rounded head/tail distances are exactly ≤ the rounded dF).
    - The exact phase attaches each surviving pair's ordered coordinate
      arrays (two slim equi-joins against a per-trip array relation;
      shuffle carries Σ(n+m) doubles per pair, not the n×m grid) and
      runs the DP in an Arrow batch kernel (:func:`_frechet_dp_mm`),
      n+m-1 vectorized anti-diagonal sweeps per pair — embarrassingly
      parallel across pairs.  Trips over ``max_trip_fixes`` are
      EXCLUDED, not truncated (run .trajectory.simplify_trips first).

    Output: (user_a, session_a, user_b, session_b, n_a, n_b,
    frechet_mm) with (user_a, session_a) < (user_b, session_b); dF is
    symmetric so the one-sided pair order loses nothing.
    """
    return _coupled_dp_join(
        points, _frechet_dp_mm, "frechet_mm", tau_m, gap_s, user_col,
        ts_col, id_col, lat_col, lon_col, max_abs_lat, max_trip_fixes,
    )


def dtw_join(
    points: DataFrame,
    tau_m: float = 2500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> DataFrame:
    """Dynamic-time-warping trajectory-similarity join: unordered trip
    pairs whose DTW total cost (sum of geodesic fix distances along the
    optimal monotone alignment, Sakoe & Chiba 1978) is ≤ ``tau_m``
    meters — the third member of the similarity trio: Hausdorff ignores
    order, Fréchet takes the worst coupled step, DTW integrates the
    whole alignment, separating "same route walked tightly" from "same
    route with one brief detour".

    Candidates and exact phase share :func:`frechet_join`'s machinery
    (``tau_m`` is a TOTAL budget, so the same head/tail necessity holds:
    every warping path visits (a₁,b₁) and (a_n,b_m), and all cell costs
    are non-negative, hence d(head,head) ≤ DTW and d(tail,tail) ≤ DTW);
    the DP kernel swaps max-combine for clamped sum-combine
    (:func:`_dtw_dp_mm`).  Note the ring zoom derives from the TOTAL
    budget — a generous budget coarsens the candidate grid, which is
    correct but admits more candidate pairs; keep ``tau_m`` as tight as
    the analysis allows.

    Output: (user_a, session_a, user_b, session_b, n_a, n_b, dtw_mm)
    with (user_a, session_a) < (user_b, session_b); DTW is symmetric so
    the one-sided pair order loses nothing.
    """
    return _coupled_dp_join(
        points, _dtw_dp_mm, "dtw_mm", tau_m, gap_s, user_col,
        ts_col, id_col, lat_col, lon_col, max_abs_lat, max_trip_fixes,
    )


def _coupled_dp_join(
    points: DataFrame,
    kernel,
    out_col: str,
    tau_m: float,
    gap_s: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    lat_col: str,
    lon_col: str,
    max_abs_lat: float,
    max_trip_fixes: int,
) -> DataFrame:
    """Shared body of :func:`frechet_join` / :func:`dtw_join`: head-ring
    candidates, exact head+tail mm prefilter, per-pair coordinate-array
    attach, anti-diagonal DP via ``kernel`` in one mapInPandas stage,
    final ``out_col <= tau_mm`` filter."""
    import numpy as np
    import pandas as pd

    from ..kernels.geometry import haversine as _hav

    zoom = dbscan_zoom_for_eps(tau_m, max_abs_lat)
    if zoom < 2:
        raise ValueError(
            f"tau {tau_m} m needs zoom {zoom} (< 2): planetary-scale "
            "similarity radii degenerate to all-pairs; reduce tau."
        )
    n_tiles = 1 << zoom
    tau_mm = round(tau_m * 1000.0)

    fx = sessionize(
        points, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    ).select(
        F.col(user_col).alias("_u"),
        F.col("session_id").alias("_s"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_la"),
        F.col(lon_col).alias("_lo"),
    )
    sizes = fx.groupBy("_u", "_s").agg(F.count(F.lit(1)).alias("_n"))
    fx = (
        fx.join(
            sizes.where(F.col("_n") <= max_trip_fixes), ["_u", "_s"]
        ).localCheckpoint()
    )

    # one tiny row per trip: head + tail coordinates (Catalyst prunes
    # the array agg out of this projection's plan)
    okey = F.struct("_t", "_id")
    ht = fx.groupBy("_u", "_s").agg(
        F.min_by(F.struct("_la", "_lo"), okey).alias("_h"),
        F.max_by(F.struct("_la", "_lo"), okey).alias("_e"),
    ).select(
        "_u", "_s",
        F.col("_h._la").alias("_hla"), F.col("_h._lo").alias("_hlo"),
        F.col("_e._la").alias("_tla"), F.col("_e._lo").alias("_tlo"),
    )
    hx, hy = C.tile_xy(F.col("_hla"), F.col("_hlo"), zoom)
    keyed = ht.select("_u", "_s", "_hla", "_hlo", "_tla", "_tlo",
                      hx.alias("_hx"), hy.alias("_hy"))
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _RING
        ]
    )
    probe = (
        keyed.select(
            F.col("_u").alias("_ua"), F.col("_s").alias("_sa"),
            F.col("_hla").alias("_hla_a"), F.col("_hlo").alias("_hlo_a"),
            F.col("_tla").alias("_tla_a"), F.col("_tlo").alias("_tlo_a"),
            "_hx", "_hy",
        )
        .withColumn("_o", F.explode(offs))
        .select(
            "_ua", "_sa", "_hla_a", "_hlo_a", "_tla_a", "_tlo_a",
            F.pmod(F.col("_hx") + F.col("_o.dx"), F.lit(n_tiles)).alias(
                "_tx"
            ),
            (F.col("_hy") + F.col("_o.dy")).alias("_ty"),
        )
        .dropDuplicates(["_ua", "_sa", "_tx", "_ty"])
    )
    build = keyed.select(
        F.col("_u").alias("_ub"), F.col("_s").alias("_sb"),
        F.col("_hla").alias("_hla_b"), F.col("_hlo").alias("_hlo_b"),
        F.col("_tla").alias("_tla_b"), F.col("_tlo").alias("_tlo_b"),
        F.col("_hx").alias("_tx"), F.col("_hy").alias("_ty"),
    )
    a_lt_b = (F.col("_ua") < F.col("_ub")) | (
        (F.col("_ua") == F.col("_ub")) & (F.col("_sa") < F.col("_sb"))
    )
    mm = lambda la1, lo1, la2, lo2: F.round(  # noqa: E731
        C.haversine(F.col(la1), F.col(lo1), F.col(la2), F.col(lo2))
        * F.lit(1000.0)
    ).cast("long")
    # build's head occupies ONE cell and probe addresses are distinct,
    # so each pair matches at most once — no pair dedup needed
    cand = (
        probe.join(build, ["_tx", "_ty"])
        .where(a_lt_b)
        .where(mm("_hla_a", "_hlo_a", "_hla_b", "_hlo_b") <= tau_mm)
        .where(mm("_tla_a", "_tlo_a", "_tla_b", "_tlo_b") <= tau_mm)
        .select("_ua", "_sa", "_ub", "_sb")
    )

    seq = F.array_sort(F.collect_list(F.struct("_t", "_id", "_la", "_lo")))
    seqs = fx.groupBy("_u", "_s").agg(seq.alias("_q")).select(
        "_u", "_s",
        F.col("_q._la").alias("_las"), F.col("_q._lo").alias("_los"),
    )
    pairs = (
        cand.join(
            seqs.select(
                F.col("_u").alias("_ua"), F.col("_s").alias("_sa"),
                F.col("_las").alias("_laa"), F.col("_los").alias("_loa"),
            ),
            ["_ua", "_sa"],
        )
        .join(
            seqs.select(
                F.col("_u").alias("_ub"), F.col("_s").alias("_sb"),
                F.col("_las").alias("_lab"), F.col("_los").alias("_lob"),
            ),
            ["_ub", "_sb"],
        )
        .select("_ua", "_sa", "_ub", "_sb", "_laa", "_loa", "_lab", "_lob")
    )

    utype = points.schema[user_col].dataType.simpleString()
    out_schema = (
        f"user_a {utype}, session_a long, user_b {utype}, "
        f"session_b long, n_a long, n_b long, {out_col} long"
    )
    cols = ["user_a", "session_a", "user_b", "session_b",
            "n_a", "n_b", out_col]

    def run(batches):
        for pdf in batches:
            rows = []
            for ua, sa, ub, sb, laa, loa, lab, lob in zip(
                pdf["_ua"], pdf["_sa"], pdf["_ub"], pdf["_sb"],
                pdf["_laa"], pdf["_loa"], pdf["_lab"], pdf["_lob"],
            ):
                a_la = np.asarray(laa, np.float64)
                a_lo = np.asarray(loa, np.float64)
                b_la = np.asarray(lab, np.float64)
                b_lo = np.asarray(lob, np.float64)
                # floor(v+0.5) == Spark/DuckDB HALF_UP for the
                # non-negative distances here (np.round is banker's)
                d = np.floor(
                    _hav(
                        a_la[:, None], a_lo[:, None],
                        b_la[None, :], b_lo[None, :],
                    )
                    * 1000.0
                    + 0.5
                ).astype(np.int64)
                rows.append(
                    (ua, sa, ub, sb, len(a_la), len(b_la), kernel(d))
                )
            yield pd.DataFrame(rows, columns=cols)

    return (
        pairs.mapInPandas(run, out_schema)
        .where(F.col(out_col) <= F.lit(tau_mm))
    )


def frechet_join_oracle_sql(
    subq: str,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> str:
    """DuckDB twin with the FULL exact Fréchet value: same sessionize
    CTE, cap exclusion, head-ring candidates + integer head/tail
    prefilter, then the anti-diagonal DP as a recursive CTE — each
    iteration's row carries one pair's current AND previous diagonal as
    INF-filled lists, the next diagonal is a pure ``list_transform``
    over a pre-aggregated per-diagonal distance list (no aggregate in
    the recursive term, single self-reference), and dF pops out of the
    last diagonal's final element.  Every compared value is the same
    rounded BIGINT mm as the Spark kernel."""
    inf = 1 << 62
    combine = (
        "greatest(d.dl[x], least("
        f"CASE WHEN x > 1 THEN r.c_cur[x - 1] ELSE {inf} END, "
        "r.c_cur[x], "
        f"CASE WHEN x > 1 THEN r.c_prev[x - 1] ELSE {inf} END))"
    )
    return _coupled_dp_oracle_sql(
        subq, combine, "frechet_mm", inf, tau_m, gap_s, user_col,
        ts_col, id_col, lat, lon, max_abs_lat, max_trip_fixes,
    )


def dtw_join_oracle_sql(
    subq: str,
    tau_m: float = 2500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> str:
    """DuckDB twin of :func:`dtw_join`: the Fréchet recursive-CTE
    harness with sum-combine — and the same clamp the numpy kernel
    needs (``least(d + least(...), INF)``): without it the garbage
    values in off-diagonal cells grow by INF per diagonal and overflow
    BIGINT (DuckDB raises on overflow), so INF is 2^56 (headroom for
    INF + INF inside one step) and every computed cell pins back to
    exactly INF."""
    inf = 1 << 56
    combine = (
        "least(d.dl[x] + least("
        f"CASE WHEN x > 1 THEN r.c_cur[x - 1] ELSE {inf} END, "
        "r.c_cur[x], "
        f"CASE WHEN x > 1 THEN r.c_prev[x - 1] ELSE {inf} END), "
        f"{inf})"
    )
    return _coupled_dp_oracle_sql(
        subq, combine, "dtw_mm", inf, tau_m, gap_s, user_col,
        ts_col, id_col, lat, lon, max_abs_lat, max_trip_fixes,
    )


def _coupled_dp_oracle_sql(
    subq: str,
    combine: str,
    out_col: str,
    inf: int,
    tau_m: float,
    gap_s: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    lat: str,
    lon: str,
    max_abs_lat: float,
    max_trip_fixes: int,
) -> str:
    zoom = dbscan_zoom_for_eps(tau_m, max_abs_lat)
    n = 1 << zoom
    tau_mm = round(tau_m * 1000.0)
    sess = sessionize_oracle_sql(
        subq, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    )
    htx, hty = C.tile_xy_sql("hla", "hlo", zoom)
    hh = C.haversine_sql("a.hla", "a.hlo", "b.hla", "b.hlo")
    tt = C.haversine_sql("a.tla", "a.tlo", "b.tla", "b.tlo")
    gv = C.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    mm = "CAST(round(({0}) * 1000.0) AS BIGINT)"
    return (
        f"WITH RECURSIVE sess AS ({sess}), "
        f"fx AS MATERIALIZED (SELECT s.*, row_number() OVER (PARTITION BY user_id, "
        f"session_id ORDER BY {ts_col}, {id_col}) - 1 AS pos "
        f"FROM sess s JOIN (SELECT user_id, session_id FROM sess "
        f"GROUP BY user_id, session_id "
        f"HAVING count(*) <= {max_trip_fixes}) k "
        f"USING (user_id, session_id)), "
        f"trips AS (SELECT user_id, session_id, count(*) AS nf, "
        f"arg_min({lat}, pos) AS hla, arg_min({lon}, pos) AS hlo, "
        f"arg_max({lat}, pos) AS tla, arg_max({lon}, pos) AS tlo "
        f"FROM fx GROUP BY user_id, session_id), "
        f"keyed AS (SELECT t.*, {htx} AS hx, {hty} AS hy "
        f"FROM trips t), "
        "cand AS MATERIALIZED (SELECT a.user_id AS ua, a.session_id AS sa, "
        "b.user_id AS ub, b.session_id AS sb, a.nf AS n_a, b.nf AS n_b "
        "FROM keyed a JOIN keyed b ON "
        f"least((b.hx - a.hx + {n}) % {n}, (a.hx - b.hx + {n}) % {n}) "
        "<= 1 AND abs(b.hy - a.hy) <= 1 "
        "AND (a.user_id, a.session_id) < (b.user_id, b.session_id) "
        f"AND {mm.format(hh)} <= {tau_mm} "
        f"AND {mm.format(tt)} <= {tau_mm}), "
        "grid AS (SELECT p.ua, p.sa, p.ub, p.sb, a.pos AS i, "
        f"b.pos AS j, {mm.format(gv)} AS d FROM cand p "
        "JOIN (SELECT user_id, session_id, pos, "
        f"{lat} AS lat, {lon} AS lon FROM fx) a "
        "ON a.user_id = p.ua AND a.session_id = p.sa "
        "JOIN (SELECT user_id, session_id, pos, "
        f"{lat} AS lat, {lon} AS lon FROM fx) b "
        "ON b.user_id = p.ub AND b.session_id = p.sb), "
        "diags AS (SELECT ua, sa, ub, sb, n_a, n_b, "
        "unnest(range(0, n_a + n_b - 1)) AS k FROM cand), "
        "lattice AS (SELECT ua, sa, ub, sb, k, "
        "unnest(range(0, n_a)) AS i FROM diags), "
        "dgrid AS (SELECT l.ua, l.sa, l.ub, l.sb, l.k, l.i, "
        f"coalesce(g.d, {inf}) AS d FROM lattice l LEFT JOIN grid g "
        "ON g.ua = l.ua AND g.sa = l.sa AND g.ub = l.ub "
        "AND g.sb = l.sb AND g.i = l.i AND g.j = l.k - l.i), "
        "dlists AS MATERIALIZED (SELECT ua, sa, ub, sb, k, list(d ORDER BY i) AS dl "
        "FROM dgrid GROUP BY ua, sa, ub, sb, k), "
        "rec AS ("
        "SELECT p.ua, p.sa, p.ub, p.sb, p.n_a, p.n_b, "
        "p.n_a + p.n_b - 2 AS kmax, 0 AS k, d0.dl AS c_cur, "
        f"list_transform(range(1, p.n_a + 1), x -> {inf}::BIGINT) "
        "AS c_prev "
        "FROM cand p JOIN dlists d0 ON d0.ua = p.ua AND d0.sa = p.sa "
        "AND d0.ub = p.ub AND d0.sb = p.sb AND d0.k = 0 "
        "UNION ALL "
        "SELECT r.ua, r.sa, r.ub, r.sb, r.n_a, r.n_b, r.kmax, r.k + 1, "
        "list_transform(range(1, r.n_a + 1), x -> "
        f"{combine}), "
        "r.c_cur "
        "FROM rec r JOIN dlists d ON d.ua = r.ua AND d.sa = r.sa "
        "AND d.ub = r.ub AND d.sb = r.sb AND d.k = r.k + 1 "
        "WHERE r.k < r.kmax) "
        "SELECT ua AS user_a, sa AS session_a, ub AS user_b, "
        f"sb AS session_b, n_a, n_b, c_cur[n_a] AS {out_col} "
        f"FROM rec WHERE k = kmax AND c_cur[n_a] <= {tau_mm}"
    )


def route_clusters(
    points: DataFrame,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    **kw,
) -> DataFrame:
    """Composed route clustering: trips that run the same route (in the
    same direction) get one shared route id.  Pipeline =
    :func:`frechet_join` (order-aware similarity edges) → distributed
    connected components (.dedup.connected_components — the Kiveris
    alternating-star algorithm, which is id-type-generic: labels are
    the MIN trip key, lexicographic for the string keys used here).

    Trip keys ride as ``user:session`` strings — overflow-free for any
    id width, deterministic, and identical in the SQL twin (CAST ||
    ':' || CAST).  Output: (trip, route_id), one row per trip that has
    at least one qualifying route twin (singleton trips are absent, the
    dedup_groups convention)."""
    from .dedup import connected_components

    pairs = frechet_join(points, tau_m=tau_m, gap_s=gap_s, **kw)
    edges = pairs.select(
        F.concat_ws(
            ":", F.col("user_a"), F.col("session_a")
        ).alias("id_a"),
        F.concat_ws(
            ":", F.col("user_b"), F.col("session_b")
        ).alias("id_b"),
    )
    return connected_components(edges).select(
        F.col("node").alias("trip"), F.col("component").alias("route_id")
    )


def route_clusters_oracle_sql(
    subq: str,
    tau_m: float = 500.0,
    gap_s: int = 43200,
    **kw,
) -> str:
    """DuckDB twin: the frechet twin (its own recursive DP CTE) embeds
    as a CTE body, followed by the symmetric-closure reach recursion
    (the grid_dbscan oracle pattern) with least-string labels."""
    fr = frechet_join_oracle_sql(subq, tau_m=tau_m, gap_s=gap_s, **kw)
    return (
        f"WITH RECURSIVE pairs AS MATERIALIZED ({fr}), "
        "edges0 AS (SELECT CAST(user_a AS VARCHAR) || ':' || "
        "CAST(session_a AS VARCHAR) AS u, "
        "CAST(user_b AS VARCHAR) || ':' || "
        "CAST(session_b AS VARCHAR) AS v FROM pairs), "
        "edges AS MATERIALIZED (SELECT u, v FROM edges0 "
        "UNION SELECT v, u FROM edges0), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) "
        "SELECT u AS trip, least(u, min(v)) AS route_id "
        "FROM reach GROUP BY u"
    )


# --------------------------------------------------------------------------
# Threshold-match sequence DPs: LCSS and EDR
# --------------------------------------------------------------------------

def _lcss_dp_len(d: "np.ndarray", eps_mm: int) -> int:
    """Exact LCSS length over an (n, m) int64 mm-distance matrix with
    the eps threshold match (Vlachos et al. 2002):
    c(i,j) = max(c(i-1,j), c(i,j-1), c(i-1,j-1) + [d(i,j) <= eps]).

    (The max-of-three form equals the textbook two-case recurrence by
    the monotone property |c(i,j) - c(i-1,j)| <= 1.)  Same
    anti-diagonal vectorization as :func:`_frechet_dp_mm`, but with
    ZERO-filled garbage: the LCSS boundary value is 0, and off-
    diagonal cells provably stay 0 (their predecessors are all 0 and
    their match term tests the INF-free out-of-range read as False),
    so no masks are needed at all."""
    import numpy as np

    n, m = d.shape
    match = (d <= eps_mm)
    prev = np.zeros(n, np.int64)   # diagonal k-1, indexed by i
    prev2 = np.zeros(n, np.int64)  # diagonal k-2
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)
        ii = np.arange(i_lo, i_hi + 1)
        mk = match[ii, k - ii].astype(np.int64)
        cur = np.zeros(n, np.int64)
        im1 = np.maximum(ii - 1, 0)
        up = np.where(ii > 0, prev[im1], 0)     # c(i-1, j)
        left = prev[ii]                          # c(i,  j-1)
        diag = np.where(ii > 0, prev2[im1], 0)   # c(i-1, j-1)
        cur[i_lo : i_hi + 1] = np.maximum(
            np.maximum(up, left), diag + mk
        )
        prev2, prev = prev, cur
    return int(prev[n - 1])


def _edr_dp_edits(d: "np.ndarray", eps_mm: int) -> int:
    """Exact EDR edit count over an (n, m) int64 mm-distance matrix
    (Chen, Ozsu & Oria 2005): c(i,0) = i, c(0,j) = j,
    c(i,j) = min(c(i-1,j) + 1, c(i,j-1) + 1,
                 c(i-1,j-1) + [d(i,j) > eps]).

    Anti-diagonal sweep over the (n+1) x (m+1) grid INCLUDING the
    boundary row/column (set explicitly each diagonal); INF-filled
    garbage with the DTW clamp (min-combine grows garbage by +1 per
    sweep, the clamp pins it; INF = 2^56 leaves headroom)."""
    import numpy as np

    n, m = d.shape
    cost = (d > eps_mm).astype(np.int64)
    inf = np.int64(1) << 56
    prev = np.full(n + 1, inf, np.int64)   # diagonal kk-1, indexed by i
    prev2 = np.full(n + 1, inf, np.int64)  # diagonal kk-2
    for kk in range(n + m + 1):
        i_lo = max(0, kk - m)
        i_hi = min(n, kk)
        ii = np.arange(i_lo, i_hi + 1)
        jj = kk - ii
        cur = np.full(n + 1, inf, np.int64)
        im1 = np.maximum(ii - 1, 0)
        up = np.where(ii > 0, prev[im1], inf)    # c(i-1, j)
        left = prev[ii]                           # c(i,  j-1)
        diag = np.where(ii > 0, prev2[im1], inf)  # c(i-1, j-1)
        inter = (ii > 0) & (jj > 0)
        ci = np.zeros(len(ii), np.int64)
        ci[inter] = cost[ii[inter] - 1, jj[inter] - 1]
        val = np.minimum(
            np.minimum(up + 1, left + 1), diag + ci
        )
        val = np.minimum(val, inf)
        val = np.where(ii == 0, jj, val)  # c(0, j) = j
        val = np.where(jj == 0, ii, val)  # c(i, 0) = i
        cur[i_lo : i_hi + 1] = val
        prev2, prev = prev, cur
    return int(prev[n])


def _overlap_match_join(
    points: DataFrame,
    kernel,
    out_col: str,
    eps_m: float,
    gap_s: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    lat_col: str,
    lon_col: str,
    max_abs_lat: float,
    max_trip_fixes: int,
) -> DataFrame:
    """Shared body of :func:`lcss_join` / :func:`edr_join`.

    Candidates differ from the coupled-walk trio: an eps-threshold
    match can happen ANYWHERE along the trips (heads need not be
    close), so the correct necessity is "the trips share at least one
    eps-close fix pair" — generated as a CELL-OVERLAP equi-join: each
    trip collapses to its DISTINCT occupied cells at the eps-safe zoom
    (bounded by trip length, usually far smaller), one side spreads to
    the 3x3 ring (x-wrap), and the distinct pair set comes off the
    cell equi-join.  Any eps-match implies ring-adjacent cells, so no
    qualifying pair is missed; pairs with NO eps-close fix pair are by
    construction excluded (for LCSS that is exactly sim > 0; for EDR
    it is the documented at-least-one-match restriction).

    The exact phase is the :func:`_coupled_dp_join` shape: per-pair
    ordered coordinate arrays attach via two slim equi-joins, the DP
    runs as an Arrow batch kernel over mm-quantized distances."""
    import numpy as np
    import pandas as pd

    from ..kernels.geometry import haversine as _hav

    zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    if zoom < 2:
        raise ValueError(
            f"eps {eps_m} m needs zoom {zoom} (< 2): planetary-scale "
            "match radii degenerate to all-pairs; reduce eps."
        )
    n_tiles = 1 << zoom
    eps_mm = round(eps_m * 1000.0)

    fx = sessionize(
        points, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    ).select(
        F.col(user_col).alias("_u"),
        F.col("session_id").alias("_s"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_la"),
        F.col(lon_col).alias("_lo"),
    )
    sizes = fx.groupBy("_u", "_s").agg(F.count(F.lit(1)).alias("_n"))
    fx = (
        fx.join(
            sizes.where(F.col("_n") <= max_trip_fixes), ["_u", "_s"]
        ).localCheckpoint()
    )

    cx, cy = C.tile_xy(F.col("_la"), F.col("_lo"), zoom)
    cells = fx.select(
        "_u", "_s", cx.alias("_cx"), cy.alias("_cy")
    ).dropDuplicates(["_u", "_s", "_cx", "_cy"])
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _RING
        ]
    )
    probe = (
        cells.select(
            F.col("_u").alias("_ua"), F.col("_s").alias("_sa"),
            "_cx", "_cy",
        )
        .withColumn("_o", F.explode(offs))
        .select(
            "_ua", "_sa",
            F.pmod(F.col("_cx") + F.col("_o.dx"), F.lit(n_tiles)).alias(
                "_jx"
            ),
            (F.col("_cy") + F.col("_o.dy")).alias("_jy"),
        )
        .dropDuplicates(["_ua", "_sa", "_jx", "_jy"])
    )
    build = cells.select(
        F.col("_u").alias("_ub"), F.col("_s").alias("_sb"),
        F.col("_cx").alias("_jx"), F.col("_cy").alias("_jy"),
    )
    a_lt_b = (F.col("_ua") < F.col("_ub")) | (
        (F.col("_ua") == F.col("_ub")) & (F.col("_sa") < F.col("_sb"))
    )
    cand = (
        probe.join(build, ["_jx", "_jy"])
        .where(a_lt_b)
        .select("_ua", "_sa", "_ub", "_sb")
        .distinct()
    )

    seq = F.array_sort(F.collect_list(F.struct("_t", "_id", "_la", "_lo")))
    seqs = fx.groupBy("_u", "_s").agg(seq.alias("_q")).select(
        "_u", "_s",
        F.col("_q._la").alias("_las"), F.col("_q._lo").alias("_los"),
    )
    pairs = (
        cand.join(
            seqs.select(
                F.col("_u").alias("_ua"), F.col("_s").alias("_sa"),
                F.col("_las").alias("_laa"), F.col("_los").alias("_loa"),
            ),
            ["_ua", "_sa"],
        )
        .join(
            seqs.select(
                F.col("_u").alias("_ub"), F.col("_s").alias("_sb"),
                F.col("_las").alias("_lab"), F.col("_los").alias("_lob"),
            ),
            ["_ub", "_sb"],
        )
        .select("_ua", "_sa", "_ub", "_sb", "_laa", "_loa", "_lab", "_lob")
    )

    utype = points.schema[user_col].dataType.simpleString()
    out_schema = (
        f"user_a {utype}, session_a long, user_b {utype}, "
        f"session_b long, n_a long, n_b long, {out_col} long"
    )
    cols = ["user_a", "session_a", "user_b", "session_b",
            "n_a", "n_b", out_col]

    def run(batches):
        for pdf in batches:
            rows = []
            for ua, sa, ub, sb, laa, loa, lab, lob in zip(
                pdf["_ua"], pdf["_sa"], pdf["_ub"], pdf["_sb"],
                pdf["_laa"], pdf["_loa"], pdf["_lab"], pdf["_lob"],
            ):
                a_la = np.asarray(laa, np.float64)
                a_lo = np.asarray(loa, np.float64)
                b_la = np.asarray(lab, np.float64)
                b_lo = np.asarray(lob, np.float64)
                d = np.floor(
                    _hav(
                        a_la[:, None], a_lo[:, None],
                        b_la[None, :], b_lo[None, :],
                    )
                    * 1000.0
                    + 0.5
                ).astype(np.int64)
                rows.append(
                    (ua, sa, ub, sb, len(a_la), len(b_la),
                     kernel(d, eps_mm))
                )
            yield pd.DataFrame(rows, columns=cols)

    return pairs.mapInPandas(run, out_schema)


def lcss_join(
    points: DataFrame,
    eps_m: float = 250.0,
    min_sim: float = 0.5,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> DataFrame:
    """LCSS trajectory-similarity join (Vlachos, Kollios & Gunopulos
    2002): unordered trip pairs whose longest common subsequence under
    the eps-threshold match, normalized by the shorter trip, is
    >= ``min_sim`` — the noise-ROBUST member of the similarity family
    (outlier fixes simply fail to match; DTW/Fréchet force every fix
    into the alignment).

    ``min_sim`` must be > 0: a positive similarity requires at least
    one eps-close fix pair, which is exactly the cell-overlap
    candidate necessity (:func:`_overlap_match_join`).

    Output: (user_a, session_a, user_b, session_b, n_a, n_b, lcss,
    lcss_sim_r6) with (user_a, session_a) < (user_b, session_b); the
    similarity is the single pinned division lcss / min(n_a, n_b),
    rounded to 6."""
    if not (0.0 < min_sim <= 1.0):
        raise ValueError("min_sim must be in (0, 1]")
    out = _overlap_match_join(
        points, _lcss_dp_len, "lcss", eps_m, gap_s, user_col,
        ts_col, id_col, lat_col, lon_col, max_abs_lat, max_trip_fixes,
    )
    sim = F.round(
        F.col("lcss") / F.least(F.col("n_a"), F.col("n_b")), 6
    )
    return out.withColumn("lcss_sim_r6", sim).where(
        F.col("lcss_sim_r6") >= F.lit(float(min_sim))
    )


def edr_join(
    points: DataFrame,
    eps_m: float = 250.0,
    max_edits: int = 10,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> DataFrame:
    """EDR trajectory-similarity join (Chen, Ozsu & Oria 2005, "Edit
    Distance on Real sequence"): unordered trip pairs needing at most
    ``max_edits`` insert/delete/substitute operations to align under
    the eps-threshold match — the edit-model member of the family
    (counts HOW MANY fixes disagree, where DTW integrates how far).

    Candidate restriction (documented semantics): pairs must share at
    least one eps-close fix pair (the cell-overlap necessity).  A pair
    of short trips with NO close fixes trivially satisfies
    ``edr = max(n_a, n_b) <= max_edits`` but is excluded — "similar
    yet never near" is noise for a mobility pipeline, and the oracle
    twin applies the identical rule.

    Output: (user_a, session_a, user_b, session_b, n_a, n_b, edr)
    with (user_a, session_a) < (user_b, session_b)."""
    if int(max_edits) < 0:
        raise ValueError("max_edits must be >= 0")
    out = _overlap_match_join(
        points, _edr_dp_edits, "edr", eps_m, gap_s, user_col,
        ts_col, id_col, lat_col, lon_col, max_abs_lat, max_trip_fixes,
    )
    return out.where(F.col("edr") <= F.lit(int(max_edits)))


def _overlap_base_sql(
    subq: str,
    eps_m: float,
    gap_s: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    lat: str,
    lon: str,
    max_abs_lat: float,
    max_trip_fixes: int,
) -> tuple[list[str], int]:
    """Shared WITH-parts for the cell-overlap DP twins, through the
    per-diagonal distance lists (same grid/diags/dgrid/dlists shape as
    :func:`_coupled_dp_oracle_sql`, with cell-overlap candidates
    instead of head-ring ones).  Returns (parts, eps_mm)."""
    zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    n = 1 << zoom
    eps_mm = round(eps_m * 1000.0)
    sess = sessionize_oracle_sql(
        subq, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    )
    ctx, cty = C.tile_xy_sql(lat, lon, zoom)
    gv = C.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _RING
    )
    inf = 1 << 62
    parts = [
        f"sess AS ({sess})",
        "fx AS MATERIALIZED (SELECT s.*, row_number() OVER "
        "(PARTITION BY user_id, session_id "
        f"ORDER BY {ts_col}, {id_col}) - 1 AS pos "
        "FROM sess s JOIN (SELECT user_id, session_id FROM sess "
        "GROUP BY user_id, session_id "
        f"HAVING count(*) <= {max_trip_fixes}) k "
        "USING (user_id, session_id))",
        "trips AS (SELECT user_id, session_id, count(*) AS nf "
        "FROM fx GROUP BY user_id, session_id)",
        f"cells AS (SELECT DISTINCT user_id, session_id, {ctx} AS cx, "
        f"{cty} AS cy FROM fx)",
        f"offsets(dx, dy) AS (VALUES {offs})",
        "probe AS (SELECT DISTINCT user_id, session_id, "
        f"((cx + dx) % {n} + {n}) % {n} AS jx, cy + dy AS jy "
        "FROM cells CROSS JOIN offsets)",
        "cand0 AS MATERIALIZED (SELECT DISTINCT a.user_id AS ua, "
        "a.session_id AS sa, b.user_id AS ub, b.session_id AS sb "
        "FROM probe a JOIN cells b ON a.jx = b.cx AND a.jy = b.cy "
        "WHERE (a.user_id, a.session_id) < (b.user_id, b.session_id))",
        "cand AS MATERIALIZED (SELECT c.ua, c.sa, c.ub, c.sb, "
        "ta.nf AS n_a, tb.nf AS n_b FROM cand0 c "
        "JOIN trips ta ON ta.user_id = c.ua AND ta.session_id = c.sa "
        "JOIN trips tb ON tb.user_id = c.ub AND tb.session_id = c.sb)",
        "grid AS (SELECT p.ua, p.sa, p.ub, p.sb, a.pos AS i, "
        f"b.pos AS j, CAST(round(({gv}) * 1000.0) AS BIGINT) AS d "
        "FROM cand p "
        "JOIN (SELECT user_id, session_id, pos, "
        f"{lat} AS lat, {lon} AS lon FROM fx) a "
        "ON a.user_id = p.ua AND a.session_id = p.sa "
        "JOIN (SELECT user_id, session_id, pos, "
        f"{lat} AS lat, {lon} AS lon FROM fx) b "
        "ON b.user_id = p.ub AND b.session_id = p.sb)",
        "diags AS (SELECT ua, sa, ub, sb, n_a, n_b, "
        "unnest(range(0, n_a + n_b - 1)) AS k FROM cand)",
        "lattice AS (SELECT ua, sa, ub, sb, k, "
        "unnest(range(0, n_a)) AS i FROM diags)",
        "dgrid AS (SELECT l.ua, l.sa, l.ub, l.sb, l.k, l.i, "
        f"coalesce(g.d, {inf}) AS d FROM lattice l LEFT JOIN grid g "
        "ON g.ua = l.ua AND g.sa = l.sa AND g.ub = l.ub "
        "AND g.sb = l.sb AND g.i = l.i AND g.j = l.k - l.i)",
        "dlists AS MATERIALIZED (SELECT ua, sa, ub, sb, k, "
        "list(d ORDER BY i) AS dl "
        "FROM dgrid GROUP BY ua, sa, ub, sb, k)",
    ]
    return parts, eps_mm


def lcss_join_oracle_sql(
    subq: str,
    eps_m: float = 250.0,
    min_sim: float = 0.5,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> str:
    """DuckDB twin of :func:`lcss_join`: same sessionize / cap /
    cell-overlap candidates, then the anti-diagonal LCSS DP as a
    recursive CTE with ZERO boundaries (the max-of-three recurrence;
    off-diagonal garbage provably stays 0 — see :func:`_lcss_dp_len`),
    same pinned similarity division and filter."""
    parts, eps_mm = _overlap_base_sql(
        subq, eps_m, gap_s, user_col, ts_col, id_col, lat, lon,
        max_abs_lat, max_trip_fixes,
    )
    z = "CAST(0 AS BIGINT)"
    combine = (
        "greatest("
        f"CASE WHEN x > 1 THEN r.c_cur[x - 1] ELSE {z} END, "
        "r.c_cur[x], "
        f"(CASE WHEN x > 1 THEN r.c_prev[x - 1] ELSE {z} END) + "
        f"(CASE WHEN d.dl[x] <= {eps_mm} THEN 1 ELSE 0 END))"
    )
    parts.append(
        "rec AS ("
        "SELECT p.ua, p.sa, p.ub, p.sb, p.n_a, p.n_b, "
        "p.n_a + p.n_b - 2 AS kmax, 0 AS k, "
        f"list_transform(d0.dl, v -> CASE WHEN v <= {eps_mm} "
        f"THEN CAST(1 AS BIGINT) ELSE {z} END) AS c_cur, "
        f"list_transform(range(1, p.n_a + 1), x -> {z}) AS c_prev "
        "FROM cand p JOIN dlists d0 ON d0.ua = p.ua AND d0.sa = p.sa "
        "AND d0.ub = p.ub AND d0.sb = p.sb AND d0.k = 0 "
        "UNION ALL "
        "SELECT r.ua, r.sa, r.ub, r.sb, r.n_a, r.n_b, r.kmax, r.k + 1, "
        f"list_transform(range(1, r.n_a + 1), x -> {combine}), "
        "r.c_cur "
        "FROM rec r JOIN dlists d ON d.ua = r.ua AND d.sa = r.sa "
        "AND d.ub = r.ub AND d.sb = r.sb AND d.k = r.k + 1 "
        "WHERE r.k < r.kmax)"
    )
    return (
        "WITH RECURSIVE " + ", ".join(parts)
        + " SELECT ua AS user_a, sa AS session_a, ub AS user_b, "
        "sb AS session_b, n_a, n_b, c_cur[n_a] AS lcss, "
        "round(CAST(c_cur[n_a] AS DOUBLE) / least(n_a, n_b), 6) "
        "AS lcss_sim_r6 "
        "FROM rec WHERE k = kmax AND "
        "round(CAST(c_cur[n_a] AS DOUBLE) / least(n_a, n_b), 6) "
        f">= {float(min_sim)!r}"
    )


def edr_join_oracle_sql(
    subq: str,
    eps_m: float = 250.0,
    max_edits: int = 10,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = 85.05112878,
    max_trip_fixes: int = 512,
) -> str:
    """DuckDB twin of :func:`edr_join`: the cell-overlap harness with
    the EDR DP over the (n+1) x (m+1) grid INCLUDING boundaries —
    lists carry n_a + 1 entries (x = 1 is the i = 0 boundary row, set
    per diagonal by CASE alongside the j = 0 column), the distance
    list joins one diagonal BEHIND (cost(i,j) lives on match-grid
    diagonal i + j - 2), and min-combine garbage clamps to INF = 2^56
    exactly like :func:`_edr_dp_edits`."""
    parts, eps_mm = _overlap_base_sql(
        subq, eps_m, gap_s, user_col, ts_col, id_col, lat, lon,
        max_abs_lat, max_trip_fixes,
    )
    inf = 1 << 56
    iz = f"CAST({inf} AS BIGINT)"
    combine = (
        "CASE WHEN x = 1 THEN (CASE WHEN r.k + 1 <= r.n_b "
        f"THEN CAST(r.k + 1 AS BIGINT) ELSE {iz} END) "
        "WHEN x - 1 = r.k + 1 THEN CAST(r.k + 1 AS BIGINT) "
        "ELSE least("
        f"(CASE WHEN x > 1 THEN r.c_cur[x - 1] ELSE {iz} END) + 1, "
        "r.c_cur[x] + 1, "
        f"(CASE WHEN x > 1 THEN r.c_prev[x - 1] ELSE {iz} END) + "
        f"(CASE WHEN coalesce(d.dl[x - 1], {inf}) <= {eps_mm} "
        "THEN 0 ELSE 1 END), "
        f"{iz}) END"
    )
    parts.append(
        "rec AS ("
        "SELECT p.ua, p.sa, p.ub, p.sb, p.n_a, p.n_b, "
        "p.n_a + p.n_b AS kmax, 0 AS k, "
        "list_transform(range(1, p.n_a + 2), x -> "
        f"CASE WHEN x = 1 THEN CAST(0 AS BIGINT) ELSE {iz} END) "
        "AS c_cur, "
        f"list_transform(range(1, p.n_a + 2), x -> {iz}) AS c_prev "
        "FROM cand p "
        "UNION ALL "
        "SELECT r.ua, r.sa, r.ub, r.sb, r.n_a, r.n_b, r.kmax, r.k + 1, "
        f"list_transform(range(1, r.n_a + 2), x -> {combine}), "
        "r.c_cur "
        "FROM rec r LEFT JOIN dlists d ON d.ua = r.ua AND d.sa = r.sa "
        "AND d.ub = r.ub AND d.sb = r.sb AND d.k = r.k - 1 "
        "WHERE r.k < r.kmax)"
    )
    return (
        "WITH RECURSIVE " + ", ".join(parts)
        + " SELECT ua AS user_a, sa AS session_a, ub AS user_b, "
        "sb AS session_b, n_a, n_b, c_cur[n_a + 1] AS edr "
        "FROM rec WHERE k = kmax AND "
        f"c_cur[n_a + 1] <= {int(max_edits)}"
    )
