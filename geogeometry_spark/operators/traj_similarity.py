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

__all__ = ["hausdorff_join", "hausdorff_join_oracle_sql"]

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
