"""Contract queries: trajectory analytics (sessionize/trips/stays/OD/resample), colocation/convoys, clustering, point-pattern density, trip similarity, and the shared road-segment fixture.

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# --------------------------------------------------------------------------
# §2.14 trajectory analytics (sessionize / trips / glitch / stays)
# --------------------------------------------------------------------------

# Deterministic fix stream derived from events by pure BIGINT
# arithmetic (same doctrine as the documents coordinates): each user
# has a home base; during 3 of every 4 hours (phase-shifted per user)
# fixes jitter +/-0.02 deg around it, in the 4th hour the user is
# parked at the exact base — so sessions, speeds, and stay runs all
# have known structure both engines reproduce bit-for-bit.

def _traj_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = src.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_sec")
    )
    uid, eid, ts = F.col("user_id"), F.col("event_id"), F.col("ts_sec")
    base_lat = ((uid * 7919) % 170001 - 85000) / F.lit(1000.0)
    base_lon = ((uid * 104729) % 350001 - 175000) / F.lit(1000.0)
    moving = ((ts + uid * 977) % 14400) < 10800
    jlat = ((eid * 31 + uid * 17) % 4001 - 2000).cast("double") / F.lit(1e5)
    jlon = ((eid * 37 + uid * 23) % 4001 - 2000).cast("double") / F.lit(1e5)
    zero = F.lit(0.0)
    return ev.withColumns(
        {
            "lat": base_lat + F.when(moving, jlat).otherwise(zero),
            "lon": base_lon + F.when(moving, jlon).otherwise(zero),
        }
    )


_TS_SEC_SQL = "CAST(floor(epoch(ts)) AS BIGINT)"
_TRAJ_MOVING_SQL = f"(({_TS_SEC_SQL} + user_id * 977) % 14400) < 10800"
_TRAJ_SUBQ = (
    "(SELECT event_id, user_id, "
    f"{_TS_SEC_SQL} AS ts_sec, "
    "(((user_id * 7919) % 170001 - 85000) / 1000.0) + "
    f"(CASE WHEN {_TRAJ_MOVING_SQL} THEN "
    "CAST((event_id * 31 + user_id * 17) % 4001 - 2000 AS DOUBLE) / 100000.0 "
    "ELSE 0.0 END) AS lat, "
    "(((user_id * 104729) % 350001 - 175000) / 1000.0) + "
    f"(CASE WHEN {_TRAJ_MOVING_SQL} THEN "
    "CAST((event_id * 37 + user_id * 23) % 4001 - 2000 AS DOUBLE) / 100000.0 "
    "ELSE 0.0 END) AS lon "
    "FROM events)"
)


def q_traj_sessions(spark, sf_dir):
    """Sessionize each user's fix stream on a 12 h gap (trajectory.py):
    gaps-and-islands over ONE user-partitioned window, integer-exact."""
    pts = _traj_points(spark, sf_dir)
    return traj.sessionize(pts, gap_s=43200).select(
        "event_id", "user_id", "session_id"
    )


def _traj_sessions_oracle() -> str:
    inner = traj.sessionize_oracle_sql(_TRAJ_SUBQ, gap_s=43200)
    return f"SELECT event_id, user_id, session_id FROM ({inner})"


def q_traj_trips(spark, sf_dir):
    """Per-trip rollup: fix count, window, geodesic path length
    (millimeter-quantized legs -> exact integer sum), average speed.
    The aggregate reuses the sessionize window's user_id hash exchange."""
    return traj.trip_stats(_traj_points(spark, sf_dir), gap_s=43200)


def q_traj_speed(spark, sf_dir):
    """GPS-glitch classification at 0.5 m/s: per-fix implied speed from
    the previous fix (343 glitches / 9657 clean at sf0.01 — a
    calibrated, nontrivial split)."""
    out = traj.speed_filter(_traj_points(spark, sf_dir), max_speed_ms=0.5)
    return out.select(
        "event_id",
        "user_id",
        F.round("speed_ms", 3).alias("speed_r3"),
        "is_glitch",
    )


def _traj_speed_oracle() -> str:
    inner = traj.speed_filter_oracle_sql(_TRAJ_SUBQ, max_speed_ms=0.5)
    return (
        "SELECT event_id, user_id, round(speed_ms, 3) AS speed_r3, "
        f"is_glitch FROM ({inner})"
    )


def q_traj_stays(spark, sf_dir):
    """Stay points: maximal runs of consecutive fixes with every leg
    under 100 m, >= 2 fixes; centroid via integer micro-degree sums
    (exact cross-engine).  The parked hours of the synthetic stream
    guarantee zero-length legs, so stays exist by construction."""
    return traj.stay_points(
        _traj_points(spark, sf_dir), radius_m=100.0, min_fixes=2
    )


def q_traj_od(spark, sf_dir):
    """Origin-destination trip matrix at z6 tiles: sessionize -> first/
    last fix per trip -> tile-bin both ends -> count flows.  Same
    single user-keyed exchange as the rest of the family."""
    return traj.od_matrix(_traj_points(spark, sf_dir), gap_s=43200, zoom=6)


def q_traj_simplify(spark, sf_dir):
    """Per-trip Douglas-Peucker simplification (rows-only: DP's
    recursive split is not SQL-expressible, same class as the simplify/
    hull family; semantics pinned by test_trajectory.py against the
    golden simplify_line kernel).  Emits trip vertex counts before/
    after plus the simplified [lon,lat] line."""
    return traj.simplify_trips(
        _traj_points(spark, sf_dir), tolerance_m=500.0, gap_s=43200
    ).select("user_id", "session_id", "n_in", "n_out")


# Metro-box variant of the fix stream for co-location: the global
# stream scatters home bases over the whole planet, so no two users
# ever meet; this one packs them into a 1 x 2 degree Berlin-ish box
# (same moving/parked jitter), which makes contact pairs exist by
# construction at every sf.

def _metro_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = src.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_sec")
    )
    uid, eid, ts = F.col("user_id"), F.col("event_id"), F.col("ts_sec")
    base_lat = F.lit(52.0) + ((uid * 7919) % 1001) / F.lit(1000.0)
    base_lon = F.lit(13.0) + ((uid * 104729) % 2001) / F.lit(1000.0)
    moving = ((ts + uid * 977) % 14400) < 10800
    jlat = ((eid * 31 + uid * 17) % 4001 - 2000).cast("double") / F.lit(1e5)
    jlon = ((eid * 37 + uid * 23) % 4001 - 2000).cast("double") / F.lit(1e5)
    zero = F.lit(0.0)
    return ev.withColumns(
        {
            "lat": base_lat + F.when(moving, jlat).otherwise(zero),
            "lon": base_lon + F.when(moving, jlon).otherwise(zero),
        }
    )


_METRO_SUBQ = (
    "(SELECT event_id, user_id, "
    f"{_TS_SEC_SQL} AS ts_sec, "
    "(52.0 + ((user_id * 7919) % 1001) / 1000.0) + "
    f"(CASE WHEN {_TRAJ_MOVING_SQL} THEN "
    "CAST((event_id * 31 + user_id * 17) % 4001 - 2000 AS DOUBLE) / 100000.0 "
    "ELSE 0.0 END) AS lat, "
    "(13.0 + ((user_id * 104729) % 2001) / 1000.0) + "
    f"(CASE WHEN {_TRAJ_MOVING_SQL} THEN "
    "CAST((event_id * 37 + user_id * 23) % 4001 - 2000 AS DOUBLE) / 100000.0 "
    "ELSE 0.0 END) AS lon "
    "FROM events)"
)


def q_colocation(spark, sf_dir):
    """Spatiotemporal co-location join at eps=5 km / tau=1 h over the
    metro fix stream (operators/colocation.py): composite
    (time-bucket, tile) bucketing, 27-address probe spread, exact
    |dt| + geodesic filters, unordered-pair contact rollup.
    max_abs_lat=54 keeps the bucketing zoom honest for the fixture's
    latitude band (z12, ~5.9 km ground cells at 53N) instead of the
    full-Mercator default's z9."""
    from ..operators.colocation import colocation_join

    return colocation_join(
        _metro_points(spark, sf_dir),
        eps_m=5000.0,
        tau_s=3600,
        max_abs_lat=54.0,
    )


def _colocation_oracle() -> str:
    from ..operators.colocation import colocation_join_oracle_sql

    return colocation_join_oracle_sql(
        _METRO_SUBQ, eps_m=5000.0, tau_s=3600
    )


def q_convoys(spark, sf_dir):
    """Composed convoy mining over the metro stream: colocation_join
    (eps 5 km / tau 1 h) -> repeat filter (>= 3 contact events) ->
    distributed connected components -> convoy labels.  The trajectory
    family's pipeline_near_dup analogue: pairs alone under-group
    (a-b + b-c convoys keep a and c apart unless the chain closes)."""
    from ..operators.colocation import convoy_groups

    return convoy_groups(
        _metro_points(spark, sf_dir),
        eps_m=5000.0,
        tau_s=3600,
        min_contacts=3,
        max_abs_lat=54.0,
    )


def _convoys_oracle() -> str:
    from ..operators.colocation import convoy_groups_oracle_sql

    return convoy_groups_oracle_sql(
        _METRO_SUBQ, eps_m=5000.0, tau_s=3600, min_contacts=3
    )


def q_hotspot_gi(spark, sf_dir):
    """Getis-Ord Gi* hot/cold z-scores over z8 tile bins of the fix
    stream (operators/hotspot.py): occupied-cell lattice, 9-address
    neighbor spread, pinned-order scalar stats."""
    from ..operators.hotspot import getis_ord_gi

    return getis_ord_gi(_traj_points(spark, sf_dir), zoom=8)


def q_traj_hausdorff(spark, sf_dir):
    """Trajectory-similarity join (operators/traj_similarity.py):
    unordered trip pairs with discrete Hausdorff <= 500 m; head-ring
    candidates at the tau-safe zoom, mm-quantized exact max-of-min in
    both directions."""
    from ..operators.traj_similarity import hausdorff_join

    return hausdorff_join(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _traj_hausdorff_oracle() -> str:
    from ..operators.traj_similarity import hausdorff_join_oracle_sql

    return hausdorff_join_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_asof_snap(spark, sf_dir):
    """As-of join (operators/asof.py): for each probe (user, t+737s),
    the user's latest fix at-or-before t within a 1 h horizon — one
    union-tag window pass, no per-key loops; the DuckDB twin is the
    engine-native ASOF JOIN."""
    from ..operators.asof import asof_join

    pts = _traj_points(spark, sf_dir)
    qs = pts.where(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("query_id"),
        "user_id",
        (F.col("ts_sec") + F.lit(737)).alias("qts"),
    )
    return asof_join(pts, qs, ["lat", "lon"], horizon_s=3600)


def _asof_snap_oracle() -> str:
    from ..operators.asof import asof_join_oracle_sql

    qsub = (
        "(SELECT event_id AS query_id, user_id, ts_sec + 737 AS qts "
        f"FROM {_TRAJ_SUBQ} WHERE event_id % 10 = 0)"
    )
    return asof_join_oracle_sql(
        _TRAJ_SUBQ, qsub, ["lat", "lon"], horizon_s=3600
    )


_DWELL_FENCES = [
    ("berlin_big_ring", BIG_RING),
    ("berlin_small_ring", SMALL_RING),
    ("berlin_concave", CONCAVE_RING),
    # metro-scale pentagon so the sf0.01 oracle sees dozens of users
    # (the Berlin rings are ~0.03 deg and catch only a handful)
    (
        "metro_pentagon",
        [
            (13.2, 52.2), (13.9, 52.25), (13.85, 52.7),
            (13.5, 52.65), (13.15, 52.6), (13.2, 52.2),
        ],
    ),
]


def q_geofence_dwell(spark, sf_dir):
    """Batch geofence dwell rollup (operators/geofence.py): per
    (user, fence) total seconds-inside (both-endpoint leg rule within
    sessions) + number of enters, over the metro fix stream against
    the three Berlin fixture rings.  One map-side Arrow ray-cast pass,
    one session-window exchange, explode bounded by fences-per-fix."""
    from ..operators.geofence import geofence_dwell

    return geofence_dwell(
        _metro_points(spark, sf_dir), _DWELL_FENCES, gap_s=43200
    )


def _geofence_dwell_oracle() -> str:
    from ..operators.geofence import geofence_dwell_oracle_sql

    return geofence_dwell_oracle_sql(
        _METRO_SUBQ, _DWELL_FENCES, gap_s=43200
    )


# zones sized for the metro fixture's 1 x 2 degree footprint: two
# overlapping quadrant boxes, a diamond, the dwell pentagon, and the
# (tiny) Berlin big ring — overlap is deliberate, a tile may belong to
# several zones (the explode is per-membership, like geofence)
_ZONAL_ZONES = [
    ("nw_box", [(13.0, 52.5), (14.0, 52.5), (14.0, 53.0),
                (13.0, 53.0), (13.0, 52.5)]),
    ("se_box", [(13.8, 52.0), (15.0, 52.0), (15.0, 52.6),
                (13.8, 52.6), (13.8, 52.0)]),
    ("center_diamond", [(13.5, 52.5), (14.0, 52.2), (14.5, 52.5),
                        (14.0, 52.8), (13.5, 52.5)]),
    ("metro_pentagon", _DWELL_FENCES[3][1]),
    ("berlin_big_ring", _DWELL_FENCES[0][1]),
]


def q_hmm_match(spark, sf_dir):
    """HMM (Viterbi min-sum) map matching (operators/hmm_match.py):
    per-trip optimal segment sequence under mm-integer emissions +
    flat switch penalty; contract projection is the unique optimal
    VALUE per trip (paths can tie, the value cannot).  Covering
    candidates on the SMALL side, windowless top-k via partial
    collect, one grouped-map exchange for the DP."""
    from ..operators.hmm_match import hmm_trip_costs

    return hmm_trip_costs(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        k_candidates=3,
        switch_penalty_m=60.0,
        max_abs_lat=53.2,
    )


def _hmm_match_oracle() -> str:
    from ..operators.hmm_match import hmm_match_oracle_sql

    return hmm_match_oracle_sql(
        _METRO_SUBQ,
        _ROADS_SUBQ,
        max_dist_m=150.0,
        k_candidates=3,
        switch_penalty_m=60.0,
    )


def q_zonal_stats(spark, sf_dir):
    """Raster<->vector zonal statistics (operators/zonal.py): metro
    fixes rasterized to z15 WebMercator tiles (one groupBy, map-side
    combine), then per-zone tile count / total / mean via the exact
    tile-space even-odd crossing test on tile centers — native Columns
    only, zone rings projected driver-side so both engines evaluate
    identical IEEE arithmetic (no libm in the per-row path)."""
    from ..operators.zonal import rasterize, zonal_stats

    return zonal_stats(
        rasterize(_metro_points(spark, sf_dir), 15), _ZONAL_ZONES, 15
    )


def _zonal_stats_oracle() -> str:
    from ..operators.zonal import zonal_stats_oracle_sql

    return zonal_stats_oracle_sql(_METRO_SUBQ, _ZONAL_ZONES, 15)


def q_traj_resample(spark, sf_dir):
    """Fixed-interval trajectory resampling (operators/trajectory.py):
    one time-lerped position per trip every 6 h, grid anchored at each
    trip's first fix; per-leg integer-k explode through the single
    session-window exchange."""
    return traj.resample_trips(
        _traj_points(spark, sf_dir), step_s=21600, gap_s=43200
    )


def _traj_resample_oracle() -> str:
    return traj.resample_trips_oracle_sql(
        _TRAJ_SUBQ, step_s=21600, gap_s=43200
    )


def q_traj_frechet(spark, sf_dir):
    """Order-aware trajectory-similarity join (operators/
    traj_similarity.py): unordered trip pairs with discrete Fréchet
    <= 500 m.  Head-ring candidates on trip HEADS only, exact
    mm-integer head+tail prefilter, anti-diagonal DP in an Arrow batch
    kernel; the DuckDB twin runs the same DP as a recursive CTE over
    per-diagonal lists."""
    from ..operators.traj_similarity import frechet_join

    return frechet_join(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _traj_frechet_oracle() -> str:
    from ..operators.traj_similarity import frechet_join_oracle_sql

    return frechet_join_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_route_clusters(spark, sf_dir):
    """Composed route clustering (operators/traj_similarity.py):
    Fréchet similarity edges → distributed connected components; trip
    keys ride as user:session strings, labels are min-string per
    component.  Oracle embeds the recursive Fréchet DP CTE inside the
    reach-closure recursion."""
    from ..operators.traj_similarity import route_clusters

    return route_clusters(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _route_clusters_oracle() -> str:
    from ..operators.traj_similarity import route_clusters_oracle_sql

    return route_clusters_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_morans_i(spark, sf_dir):
    """Global Moran's I autocorrelation of fix counts over z8 tile
    bins (operators/hotspot.py): binary queen adjacency on occupied
    cells, exact integer aggregates, pinned-order scalar combine;
    one-row result (I, E[I], z under normality)."""
    from ..operators.hotspot import morans_i

    return morans_i(_traj_points(spark, sf_dir), zoom=8)


def _morans_i_oracle() -> str:
    from ..operators.hotspot import morans_i_oracle_sql

    return morans_i_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_grid_dbscan(spark, sf_dir):
    """Grid-bucketed DBSCAN (min_pts=1 / eps-linkage) at eps=50 m over
    the fix stream: coincident-fix collapse -> z16 tile bucketing ->
    9-cell candidate join -> geodesic cutoff -> distributed connected
    components (operators/cluster.py).  Parked fixes give every user a
    base-position clique by construction; jitter adds sparse bridges."""
    from ..operators.cluster import grid_dbscan

    out = grid_dbscan(_traj_points(spark, sf_dir), eps_m=50.0)
    return out.select("event_id", "user_id", "cluster_id")


def _hotspot_gi_oracle() -> str:
    from ..operators.hotspot import getis_ord_gi_oracle_sql

    return getis_ord_gi_oracle_sql(_TRAJ_SUBQ, zoom=8)


def _grid_dbscan_oracle() -> str:
    from ..operators.cluster import grid_dbscan_oracle_sql

    return grid_dbscan_oracle_sql(
        _TRAJ_SUBQ, eps_m=50.0, select_cols="k.event_id, k.user_id"
    )


def q_st_dbscan(spark, sf_dir):
    """Spatiotemporal DBSCAN (operators/cluster.py st_dbscan — Birant
    & Kut 2007, min_pts=1 eps-linkage) at eps 1 km / 6 h over the fix
    stream: a user's parked clique splits into per-revisit clusters
    wherever the 6 h time gate cuts the chain that plain grid_dbscan
    would merge."""
    from ..operators.cluster import st_dbscan

    out = st_dbscan(
        _traj_points(spark, sf_dir), eps_m=1000.0, eps_t=21600
    )
    return out.select("event_id", "user_id", "cluster_id")


def _st_dbscan_oracle() -> str:
    from ..operators.cluster import st_dbscan_oracle_sql

    return st_dbscan_oracle_sql(
        _TRAJ_SUBQ,
        eps_m=1000.0,
        eps_t=21600,
        select_cols="k.event_id, k.user_id",
    )


def q_kde(spark, sf_dir):
    """Truncated-Gaussian KDE surface over z8 tiles of the fix stream
    (operators/density.py): occupied-cell collapse, 29-address integer
    stencil spread (weights quantized driver-side to ppb BIGINTs so
    every shuffled value is exact), one re-aggregation."""
    from ..operators.density import kde_grid

    return kde_grid(
        _traj_points(spark, sf_dir), zoom=8,
        radius_cells=3, sigma_cells=1.5,
    )


def _kde_oracle() -> str:
    from ..operators.density import kde_grid_oracle_sql

    return kde_grid_oracle_sql(
        _TRAJ_SUBQ, zoom=8, radius_cells=3, sigma_cells=1.5
    )


# nominal metro study area (1 deg lat x 2 deg lon at ~52.5N), a
# modelling input to the K estimator — both engines get this literal
_RIPLEY_AREA_M2 = 1.5e10
_RIPLEY_RADII_M = [250.0, 500.0, 1000.0, 2000.0]


def q_ripley(spark, sf_dir):
    """Ripley's K / L point-pattern statistic over the metro fix
    stream (operators/density.py): coincident fixes collapse to
    multiplicity-weighted reps, 9-address grid candidate pairs at the
    r_max-safe zoom (never all-pairs in either engine), exact BIGINT
    pair counts per radius, pinned-order K/L floats."""
    from ..operators.density import ripley_k

    return ripley_k(
        _metro_points(spark, sf_dir),
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _ripley_oracle() -> str:
    from ..operators.density import ripley_k_oracle_sql

    return ripley_k_oracle_sql(
        _METRO_SUBQ,
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def q_pcf(spark, sf_dir):
    """Binned pair correlation function g(r) (operators/density.py
    pair_correlation — Stoyan & Stoyan 1994): the non-cumulative
    derivative reading of Ripley's K over the same metro ladder;
    exact BIGINT cumulative counts difference into rings driver-side,
    pinned K-difference / ring-area chain, lag-window twin."""
    from ..operators.density import pair_correlation

    return pair_correlation(
        _metro_points(spark, sf_dir),
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _pcf_oracle() -> str:
    from ..operators.density import pair_correlation_oracle_sql

    return pair_correlation_oracle_sql(
        _METRO_SUBQ,
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def q_clark_evans(spark, sf_dir):
    """Clark-Evans nearest-neighbor index over the metro fix stream
    (operators/density.py): coincident fixes collapse to
    multiplicity-weighted reps (their NN distance is exactly 0),
    singleton reps probe the 3x3 grid neighborhood for their
    mm-quantized NN within r_max=500 m (truncated estimator, censored
    count reported), pinned R-index / z scalars."""
    from ..operators.density import clark_evans

    return clark_evans(
        _metro_points(spark, sf_dir),
        r_max_m=500.0,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _clark_evans_oracle() -> str:
    from ..operators.density import clark_evans_oracle_sql

    return clark_evans_oracle_sql(
        _METRO_SUBQ,
        r_max_m=500.0,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


# integer "sensor reading" attached to each metro fix — a deterministic
# 8-level measurement both engines derive identically from event_id
_VARIO_VALUE_SQL = "(event_id * 31) % 8"
_VARIO_EDGES_M = [250.0, 500.0, 1000.0, 2000.0]


def q_variogram(spark, sf_dir):
    """Empirical semivariogram of an 8-level integer measurement over
    the metro fix stream (operators/density.py): (position, value) rep
    collapse, forward-halved 5-offset grid candidate pairs, exact
    BIGINT per-bin N / squared-difference sums, one pinned gamma
    division per lag bin."""
    from ..operators.density import variogram

    pts = _metro_points(spark, sf_dir).withColumn(
        "reading", (F.col("event_id") * 31) % 8
    )
    return variogram(
        pts,
        value_col="reading",
        lag_edges_m=_VARIO_EDGES_M,
        max_abs_lat=54.0,
    )


def _variogram_oracle() -> str:
    from ..operators.density import variogram_oracle_sql

    return variogram_oracle_sql(
        _METRO_SUBQ,
        value_sql=_VARIO_VALUE_SQL,
        lag_edges_m=_VARIO_EDGES_M,
        max_abs_lat=54.0,
    )


def q_traj_dtw(spark, sf_dir):
    """DTW trajectory-similarity join (operators/traj_similarity.py):
    unordered trip pairs whose DTW total cost <= 10 km — the
    alignment-integral member of the Hausdorff/Fréchet/DTW trio; same
    head-ring candidates + exact head/tail prefilter, clamped sum-
    combine anti-diagonal Arrow DP, recursive-CTE DuckDB twin."""
    from ..operators.traj_similarity import dtw_join

    return dtw_join(
        _traj_points(spark, sf_dir), tau_m=10000.0, gap_s=43200
    )


def _traj_dtw_oracle() -> str:
    from ..operators.traj_similarity import dtw_join_oracle_sql

    return dtw_join_oracle_sql(
        _TRAJ_SUBQ, tau_m=10000.0, gap_s=43200
    )


def q_traj_lcss(spark, sf_dir):
    """LCSS trajectory-similarity join (operators/traj_similarity.py
    lcss_join — Vlachos et al. 2002): trip pairs whose eps=250m
    longest-common-subsequence similarity >= 0.5; cell-overlap
    candidates (a match can happen anywhere along the trips, so the
    necessity is shared occupied cells, not close heads), zero-
    boundary anti-diagonal Arrow DP, recursive-CTE DuckDB twin."""
    from ..operators.traj_similarity import lcss_join

    return lcss_join(
        _traj_points(spark, sf_dir), eps_m=250.0, min_sim=0.5,
        gap_s=43200,
    )


def _traj_lcss_oracle() -> str:
    from ..operators.traj_similarity import lcss_join_oracle_sql

    return lcss_join_oracle_sql(
        _TRAJ_SUBQ, eps_m=250.0, min_sim=0.5, gap_s=43200
    )


def q_traj_edr(spark, sf_dir):
    """EDR trajectory-similarity join (operators/traj_similarity.py
    edr_join — Chen, Ozsu & Oria 2005): trip pairs within 12 edits
    under the eps=250m match, sharing >= 1 eps-close fix pair (the
    documented cell-overlap restriction); boundary-row anti-diagonal
    Arrow DP with the INF clamp, recursive-CTE DuckDB twin joining
    the distance list one diagonal behind."""
    from ..operators.traj_similarity import edr_join

    return edr_join(
        _traj_points(spark, sf_dir), eps_m=250.0, max_edits=12,
        gap_s=43200,
    )


def _traj_edr_oracle() -> str:
    from ..operators.traj_similarity import edr_join_oracle_sql

    return edr_join_oracle_sql(
        _TRAJ_SUBQ, eps_m=250.0, max_edits=12, gap_s=43200
    )


# Deterministic 20x20 road-network lattice for routing: node n sits at
# (52 + floor(n/20)*0.05, 13 + (n%20)*0.05); the 760 undirected lattice
# links become 1520 directed edges whose cost is the geodesic length
# times a direction-dependent congestion factor 1 + ((src*31+dst)%7)*.05
# (so reverse edges differ and shortest paths are not Manhattan-
# symmetric), mm-quantized to BIGINT so both engines sum exact integers.


_N_ROAD_SEGS = 400


def _road_segments(spark: SparkSession) -> DataFrame:
    s = F.col("id").cast("int")
    horiz = s < 200
    r = F.floor(s / F.lit(20.0)).cast("double")
    b = (s % 20).cast("double")
    sv = (s - 200).cast("int")
    vcol = (sv % 20).cast("double")
    vblk = F.floor(sv / F.lit(20.0)).cast("double")
    return spark.range(_N_ROAD_SEGS).select(
        s.alias("seg_id"),
        F.when(horiz, F.lit(52.0) + r * F.lit(0.1) + F.lit(0.050003))
        .otherwise(F.lit(52.0) + vblk * F.lit(0.1))
        .alias("alat"),
        F.when(horiz, F.lit(13.0) + b * F.lit(0.1))
        .otherwise(F.lit(13.0) + vcol * F.lit(0.1) + F.lit(0.050003))
        .alias("alon"),
        F.when(horiz, F.lit(52.0) + r * F.lit(0.1) + F.lit(0.050003))
        .otherwise(F.lit(52.0) + (vblk + F.lit(1.0)) * F.lit(0.1))
        .alias("blat"),
        F.when(horiz, F.lit(13.0) + (b + F.lit(1.0)) * F.lit(0.1))
        .otherwise(F.lit(13.0) + vcol * F.lit(0.1) + F.lit(0.050003))
        .alias("blon"),
    )


_ROADS_SUBQ = (
    "(SELECT CAST(s AS INT) AS seg_id, "
    "CASE WHEN s < 200 THEN 52.0 + CAST(floor(s / 20.0) AS DOUBLE) * 0.1 "
    "+ 0.050003 ELSE 52.0 + CAST(floor((s - 200) / 20.0) AS DOUBLE) * 0.1 "
    "END AS alat, "
    "CASE WHEN s < 200 THEN 13.0 + CAST(s % 20 AS DOUBLE) * 0.1 "
    "ELSE 13.0 + CAST((s - 200) % 20 AS DOUBLE) * 0.1 + 0.050003 "
    "END AS alon, "
    "CASE WHEN s < 200 THEN 52.0 + CAST(floor(s / 20.0) AS DOUBLE) * 0.1 "
    "+ 0.050003 ELSE 52.0 + (CAST(floor((s - 200) / 20.0) AS DOUBLE) + 1.0) "
    "* 0.1 END AS blat, "
    "CASE WHEN s < 200 THEN 13.0 + (CAST(s % 20 AS DOUBLE) + 1.0) * 0.1 "
    "ELSE 13.0 + CAST((s - 200) % 20 AS DOUBLE) * 0.1 + 0.050003 "
    "END AS blon "
    f"FROM range({_N_ROAD_SEGS}) t(s))"
)
