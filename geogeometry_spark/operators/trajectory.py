"""Trajectory analytics over per-entity point streams.

The reference library computes per-pair geodesic primitives (haversine,
headings, translate — GeoGeometry.kt:565-608, 1121-1139); this module
lifts them to the *sequence* level a fleet/mobility corpus needs at
100 TB: sessionization (split a user's stream into trips on a time
gap), per-trip stats (geodesic length, duration, average speed),
GPS-glitch filtering (impossible inter-fix speeds), and stay-point
detection (runs of consecutive fixes inside a radius).

Scale design: every operator here is pure native Column algebra over
ONE window partitioned by the entity key — a single hash shuffle on
``user_col``, no UDFs, no driver loops, full whole-stage codegen.
Per-trip aggregates ride the same partitioning (group keys start with
``user_col``), so Catalyst reuses the exchange instead of adding a
second one.  Nothing in this file is sensitive to per-user fix counts
except linearly, and skewed users are bounded by the corpus (a user
emits fixes at human rates), so no salting is needed.

Float determinism: geodesic leg lengths go through libm trig, so
cross-engine-exact aggregates quantize each leg to integer millimeters
(``round(m * 1000)`` as BIGINT) BEFORE summing — integer sums are
associative, immune to Spark's partial-agg reassociation, and the
DuckDB oracle twin can reproduce them bit-for-bit.  The same trick
makes stay-point centroids exact (integer micro-degree sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C

__all__ = [
    "sessionize",
    "trip_stats",
    "speed_filter",
    "stay_points",
    "od_matrix",
    "simplify_trips",
    "resample_trips",
    "mobility_metrics",
    "heading_stats",
    "cell_transitions",
    "deviational_ellipse",
    "deviational_ellipse_oracle_sql",
]


def _seq_window(user_col: str, ts_col: str, id_col: str) -> Window:
    # id_col breaks ties when two fixes share a (truncated-to-second)
    # timestamp, so both engines see the same total order.
    return Window.partitionBy(user_col).orderBy(ts_col, id_col)


def sessionize(
    points: DataFrame,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
) -> DataFrame:
    """Split each user's ordered fix stream into sessions (trips): a new
    session starts at the first fix and whenever the gap to the previous
    fix exceeds ``gap_s`` seconds.  Adds ``session_id`` (1-based per
    user, BIGINT) — the gaps-and-islands cumulative-break-count pattern,
    one partitioned window, no shuffle beyond the user_col exchange.

    ``ts_col`` must be integer epoch seconds (exact comparisons; no FP).
    """
    w = _seq_window(user_col, ts_col, id_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    brk = F.when(gap.isNull() | (gap > F.lit(gap_s)), F.lit(1)).otherwise(
        F.lit(0)
    )
    return points.withColumn(
        "session_id",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize_oracle_sql(
    subq: str,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`sessionize`: same break flag, same running
    sum, same (ts, id) total order.  ``subq`` is any relation exposing
    the three columns (plus whatever payload should ride along)."""
    return (
        f"SELECT *, sum(CASE WHEN gap_s_prev IS NULL OR gap_s_prev > {gap_s} "
        f"THEN 1 ELSE 0 END) OVER (PARTITION BY {user_col} "
        f"ORDER BY {ts_col}, {id_col} ROWS UNBOUNDED PRECEDING) AS session_id "
        f"FROM (SELECT *, {ts_col} - lag({ts_col}) OVER "
        f"(PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}) AS gap_s_prev "
        f"FROM {subq})"
    )


def _leg_mm(
    lat_col: str, lon_col: str, w: Window
) -> Column:
    """Geodesic distance from the previous fix, quantized to integer
    millimeters (NULL on each user's first fix).  Quantizing per leg —
    a deterministic per-row value — makes downstream SUMs exact integer
    arithmetic, so trip distances hash-match the oracle regardless of
    Spark's partial-aggregate combine order."""
    plat = F.lag(lat_col).over(w)
    plon = F.lag(lon_col).over(w)
    leg = C.haversine(plat, plon, F.col(lat_col), F.col(lon_col))
    return F.round(leg * F.lit(1000.0)).cast("long")


def _leg_mm_sql(lat: str, lon: str, part: str) -> str:
    plat = f"lag({lat}) OVER ({part})"
    plon = f"lag({lon}) OVER ({part})"
    hav = C.haversine_sql(plat, plon, lat, lon)
    return f"CAST(round(({hav}) * 1000.0) AS BIGINT)"


def trip_stats(
    points: DataFrame,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Sessionize, then aggregate each session into one trip row:
    fix count, start/end epoch, duration, geodesic path length (sum of
    consecutive-fix haversine legs, millimeter-exact), and average
    moving speed in m/s (NULL for zero-duration trips instead of a
    divide-by-zero).  Legs are computed WITHIN a session — the first
    fix of each session contributes no carry-over leg from the previous
    trip.  Group keys start with ``user_col`` so the aggregate reuses
    the window's hash partitioning (one exchange total)."""
    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    ws = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    sess = sess.withColumn("_leg_mm", _leg_mm(lat_col, lon_col, ws))
    out = sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.min(ts_col).alias("start_s"),
        F.max(ts_col).alias("end_s"),
        F.coalesce(F.sum("_leg_mm"), F.lit(0).cast("long")).alias("dist_mm"),
    )
    dur = F.col("end_s") - F.col("start_s")
    dist_m = F.col("dist_mm") / F.lit(1000.0)
    return out.select(
        user_col,
        "session_id",
        "n_fixes",
        "start_s",
        "end_s",
        dur.alias("duration_s"),
        F.round(dist_m, 3).alias("dist_m_r3"),
        F.round(
            F.when(dur > 0, dist_m / dur.cast("double")), 3
        ).alias("speed_ms_r3"),
    )


def trip_stats_oracle_sql(
    subq: str,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    part = (
        f"PARTITION BY {user_col}, session_id ORDER BY {ts_col}, {id_col}"
    )
    leg = _leg_mm_sql(lat, lon, part)
    return (
        f"SELECT {user_col}, session_id, count(*) AS n_fixes, "
        f"min({ts_col}) AS start_s, max({ts_col}) AS end_s, "
        f"max({ts_col}) - min({ts_col}) AS duration_s, "
        f"round(coalesce(sum(leg_mm), 0) / 1000.0, 3) AS dist_m_r3, "
        f"round(CASE WHEN max({ts_col}) > min({ts_col}) THEN "
        f"(coalesce(sum(leg_mm), 0) / 1000.0) / "
        f"CAST(max({ts_col}) - min({ts_col}) AS DOUBLE) END, 3) "
        f"AS speed_ms_r3 "
        f"FROM (SELECT *, {leg} AS leg_mm FROM ({sess})) "
        f"GROUP BY {user_col}, session_id"
    )


def speed_filter(
    points: DataFrame,
    max_speed_ms: float = 50.0,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """GPS-glitch classifier: a fix is a glitch when the speed implied
    by the leg from the previous fix exceeds ``max_speed_ms`` (a jump no
    plausible motion explains).  Adds ``speed_ms`` (NULL on each user's
    first fix; gaps clamped to >= 1 s so same-second double fixes don't
    divide by zero) and ``is_glitch``.  Classification only — callers
    drop or keep; a cleaning pipeline typically re-runs trip_stats on
    ``~is_glitch`` fixes.  Speed is millimeter-quantized before the
    divide so the threshold compare is exact cross-engine.  The 50 m/s
    default is the conventional glitch bound for ground mobility;
    sparse low-rate streams want a calibrated threshold (the contract
    fixture passes 0.5 m/s explicitly for its hours-apart fixes)."""
    w = _seq_window(user_col, ts_col, id_col)
    leg_mm = _leg_mm(lat_col, lon_col, w)
    gap = F.greatest(
        F.col(ts_col) - F.lag(ts_col).over(w), F.lit(1).cast("long")
    )
    speed = leg_mm.cast("double") / F.lit(1000.0) / gap.cast("double")
    return points.withColumns(
        {
            "speed_ms": speed,
            "is_glitch": F.coalesce(
                speed > F.lit(max_speed_ms), F.lit(False)
            ),
        }
    )


def speed_filter_oracle_sql(
    subq: str,
    max_speed_ms: float = 50.0,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    part = f"PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}"
    leg = _leg_mm_sql(lat, lon, part)
    gap = (
        f"greatest({ts_col} - lag({ts_col}) OVER ({part}), CAST(1 AS BIGINT))"
    )
    return (
        f"SELECT *, "
        f"coalesce(speed_ms > {max_speed_ms!r}, false) AS is_glitch "
        f"FROM (SELECT *, CAST({leg} AS DOUBLE) / 1000.0 / "
        f"CAST({gap} AS DOUBLE) AS speed_ms FROM {subq})"
    )


def stay_points(
    points: DataFrame,
    radius_m: float = 100.0,
    min_fixes: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive fixes where
    every consecutive leg is under ``radius_m``, reported when the run
    has at least ``min_fixes`` fixes.  Emits one row per stay with the
    dwell window and the centroid (integer micro-degree mean — exact
    cross-engine; 1 µdeg ≈ 0.11 m, far inside any stay radius).

    This is the chained-leg (consecutive-pair) formulation — O(n) with
    one window pass, the scalable choice; the classic Li et al. 2008
    anchor formulation (every fix within radius of the FIRST fix) needs
    per-anchor lookahead and is not a window expression.  A chained run
    can drift farther than ``radius_m`` end-to-end; callers needing the
    anchor semantics post-filter stays by centroid distance."""
    w = _seq_window(user_col, ts_col, id_col)
    leg_mm = _leg_mm(lat_col, lon_col, w)
    brk = F.when(
        leg_mm.isNull() | (leg_mm >= F.lit(float(radius_m) * 1000.0)),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = points.withColumn(
        "_run",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    udeg_lat = F.round(F.col(lat_col) * F.lit(1e6)).cast("long")
    udeg_lon = F.round(F.col(lon_col) * F.lit(1e6)).cast("long")
    out = (
        runs.withColumns({"_ula": udeg_lat, "_ulo": udeg_lon})
        .groupBy(user_col, "_run")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.min(ts_col).alias("start_s"),
            F.max(ts_col).alias("end_s"),
            F.sum("_ula").alias("_sla"),
            F.sum("_ulo").alias("_slo"),
        )
        .where(F.col("n_fixes") >= F.lit(min_fixes))
    )
    n = F.col("n_fixes").cast("double")
    return out.select(
        user_col,
        F.col("_run").alias("stay_seq"),
        "n_fixes",
        "start_s",
        "end_s",
        (F.col("end_s") - F.col("start_s")).alias("dwell_s"),
        F.round(F.col("_sla") / n / F.lit(1e6), 6).alias("clat_r6"),
        F.round(F.col("_slo") / n / F.lit(1e6), 6).alias("clon_r6"),
    )


def od_matrix(
    points: DataFrame,
    gap_s: int = 43200,
    zoom: int = 6,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Origin-destination matrix: sessionize into trips, take each
    trip's first and last fix, bin both to WebMercator tiles at
    ``zoom``, count trips per (origin tile, destination tile) cell
    pair.  The mobility-analytics staple (flow maps, demand matrices).

    Origin/destination ride the SAME per-session window as the
    sessionize pass (running first / reversed-frame last + row_number
    pick), so the whole query is still one user-keyed exchange followed
    by one small aggregate over trip rows."""
    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    ws = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    tail = ws.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    trips = (
        sess.withColumns(
            {
                "_olat": F.first(lat_col).over(ws),
                "_olon": F.first(lon_col).over(ws),
                "_dlat": F.last(lat_col).over(tail),
                "_dlon": F.last(lon_col).over(tail),
                "_rn": F.row_number().over(ws),
            }
        )
        .where(F.col("_rn") == 1)
    )
    ox, oy = C.tile_xy(F.col("_olat"), F.col("_olon"), zoom)
    dx, dy = C.tile_xy(F.col("_dlat"), F.col("_dlon"), zoom)
    return (
        trips.select(
            ox.alias("o_tx"), oy.alias("o_ty"),
            dx.alias("d_tx"), dy.alias("d_ty"),
        )
        .groupBy("o_tx", "o_ty", "d_tx", "d_ty")
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )


def od_matrix_oracle_sql(
    subq: str,
    gap_s: int = 43200,
    zoom: int = 6,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    part = f"PARTITION BY {user_col}, session_id ORDER BY {ts_col}, {id_col}"
    ox, oy = C.tile_xy_sql("olat", "olon", zoom)
    dx, dy = C.tile_xy_sql("dlat", "dlon", zoom)
    return (
        f"SELECT {ox} AS o_tx, {oy} AS o_ty, {dx} AS d_tx, {dy} AS d_ty, "
        "count(*) AS n_trips FROM ("
        f"SELECT first_value({lat}) OVER ({part}) AS olat, "
        f"first_value({lon}) OVER ({part}) AS olon, "
        f"last_value({lat}) OVER ({part} ROWS BETWEEN CURRENT ROW AND "
        "UNBOUNDED FOLLOWING) AS dlat, "
        f"last_value({lon}) OVER ({part} ROWS BETWEEN CURRENT ROW AND "
        "UNBOUNDED FOLLOWING) AS dlon, "
        f"row_number() OVER ({part}) AS rn FROM ({sess})) "
        "WHERE rn = 1 GROUP BY 1, 2, 3, 4"
    )


def stay_points_oracle_sql(
    subq: str,
    radius_m: float = 100.0,
    min_fixes: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    part = f"PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}"
    leg = _leg_mm_sql(lat, lon, part)
    thresh = repr(float(radius_m) * 1000.0)
    return (
        f"SELECT {user_col}, run AS stay_seq, count(*) AS n_fixes, "
        f"min({ts_col}) AS start_s, max({ts_col}) AS end_s, "
        f"max({ts_col}) - min({ts_col}) AS dwell_s, "
        f"round(sum(ula) / CAST(count(*) AS DOUBLE) / 1e6, 6) AS clat_r6, "
        f"round(sum(ulo) / CAST(count(*) AS DOUBLE) / 1e6, 6) AS clon_r6 "
        f"FROM (SELECT *, sum(CASE WHEN leg_mm IS NULL OR "
        f"leg_mm >= {thresh} THEN 1 ELSE 0 END) OVER "
        f"({part} ROWS UNBOUNDED PRECEDING) AS run "
        f"FROM (SELECT *, {leg} AS leg_mm, "
        f"CAST(round(({lat}) * 1e6) AS BIGINT) AS ula, "
        f"CAST(round(({lon}) * 1e6) AS BIGINT) AS ulo FROM {subq})) "
        f"GROUP BY {user_col}, run HAVING count(*) >= {min_fixes}"
    )


def simplify_trips(
    points: DataFrame,
    tolerance_m: float = 500.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-trip Douglas-Peucker polyline simplification: sessionize,
    then reduce each trip's fix sequence to the vertices that matter at
    ``tolerance_m`` (kernels.transform.simplify_line — the reference's
    simplifyLine, GeoGeometry.kt:1376-1410, bit-identical split rule).

    DP is recursive over an ORDERED sequence, so this is the one
    trajectory operator that is not window algebra; it runs as an
    Arrow-batched grouped map (``applyInPandas``) over (user, session)
    groups — bounded by the longest single trip, embarrassingly
    parallel across trips, the §2.13 pattern for set-mutating geometry
    (same doctrine as the hull/simplify batch operators).

    Returns one row per trip: (user, session_id, n_in, n_out, line)
    where ``line`` is the simplified [lon, lat] vertex list."""
    import numpy as np
    import pandas as pd

    from ..kernels.transform import simplify_line

    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    # key type follows the input (string device ids work, not just
    # bigints) — a hardcoded 'long' would break Arrow serialization
    utype = points.schema[user_col].dataType.simpleString()
    schema = (
        f"{user_col} {utype}, session_id long, n_in long, n_out long, "
        "line array<array<double>>"
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        pts = np.column_stack(
            [pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy()]
        )
        simp = simplify_line(pts, tolerance_m) if len(pts) > 2 else pts
        return pd.DataFrame(
            {
                user_col: [key[0]],
                "session_id": [key[1]],
                "n_in": [len(pts)],
                "n_out": [len(simp)],
                "line": [simp.tolist()],
            }
        )

    return sess.groupBy(user_col, "session_id").applyInPandas(run, schema)


def resample_trips(
    points: DataFrame,
    step_s: int = 1800,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Fixed-interval trajectory resampling: emit one time-linearly
    interpolated position per trip every ``step_s`` seconds, anchored
    at each trip's first fix (sample grid t₀, t₀+S, t₀+2S, … ≤ t_end) —
    the uniform-cadence view batch analytics want over raggedly sampled
    GPS streams (reference per-pair lerp analogue: translate/heading
    kernels, GeoGeometry.kt:565-640, lifted to the sequence level).

    Scale design: NO per-trip collect, NO union, NO second scan — each
    fix row sees its previous fix (lag) and the trip start (running
    first_value) through the ONE session-window exchange, so each LEG
    independently emits the grid points that land inside it via an
    integer-k sequence explode.  The explode factor per leg is bounded
    by gap_s/step_s (longer gaps start a new session by construction),
    so output never blows up on sparse tracks.  Interpolation arithmetic
    is pinned: integer grid timestamps, one double division for the
    fraction, ``plat + (lat - plat) * frac`` in that exact order —
    bit-identical in the DuckDB twin.

    Output: (user, session_id, sample_ts, lat, lon), one row per grid
    point; a trip's first fix is always emitted verbatim (k = 0).
    """
    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    step = int(step_s)
    base = sess.select(
        F.col(user_col),
        "session_id",
        F.col(ts_col).alias("_ct"),
        F.col(lat_col).alias("_cla"),
        F.col(lon_col).alias("_clo"),
        F.lag(ts_col).over(w).alias("_pt"),
        F.lag(lat_col).over(w).alias("_pla"),
        F.lag(lon_col).over(w).alias("_plo"),
        F.first(ts_col).over(run).alias("_t0"),
    )
    k_lo = F.expr(
        f"CASE WHEN _pt IS NULL THEN 0L "
        f"ELSE (_pt - _t0) DIV {step} + 1 END"
    )
    k_hi = F.expr(f"(_ct - _t0) DIV {step}")
    ks = base.withColumn(
        "_k",
        F.explode(
            F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    st = (F.col("_t0") + F.col("_k") * F.lit(step)).cast("long")
    frac = (st - F.col("_pt")).cast("double") / (
        F.col("_ct") - F.col("_pt")
    ).cast("double")
    lerp = lambda p, c: F.when(  # noqa: E731
        F.col("_pt").isNull(), F.col(c)
    ).otherwise(F.col(p) + (F.col(c) - F.col(p)) * frac)
    return ks.select(
        F.col(user_col),
        "session_id",
        st.alias("sample_ts"),
        lerp("_pla", "_cla").alias("lat"),
        lerp("_plo", "_clo").alias("lon"),
    )


def resample_trips_oracle_sql(
    subq: str,
    step_s: int = 1800,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`resample_trips`: same session CTE, same
    integer-division k bounds (``//`` on BIGINTs ↔ Spark ``DIV``), same
    single-division lerp op order; ``generate_series(lo, hi)`` is empty
    when lo > hi exactly like the guarded Spark ``sequence``."""
    step = int(step_s)
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    win = f"(PARTITION BY {user_col}, session_id ORDER BY {ts_col}, {id_col})"
    st = f"t0 + k * {step}"
    lerp = (
        "CASE WHEN pt IS NULL THEN {c} ELSE {p} + ({c} - {p}) * "
        f"(CAST({st} - pt AS DOUBLE) / CAST(ct - pt AS DOUBLE)) END"
    )
    return (
        f"WITH sess AS ({sess}), "
        f"legs AS (SELECT {user_col}, session_id, "
        f"{ts_col} AS ct, {lat} AS cla, {lon} AS clo, "
        f"lag({ts_col}) OVER {win} AS pt, "
        f"lag({lat}) OVER {win} AS pla, "
        f"lag({lon}) OVER {win} AS plo, "
        f"first_value({ts_col}) OVER ({win[1:-1]} "
        f"ROWS UNBOUNDED PRECEDING) AS t0 FROM sess), "
        f"ks AS (SELECT *, unnest(generate_series("
        f"CASE WHEN pt IS NULL THEN 0 ELSE (pt - t0) // {step} + 1 END, "
        f"(ct - t0) // {step})) AS k FROM legs) "
        f"SELECT {user_col}, session_id, {st} AS sample_ts, "
        f"{lerp.format(p='pla', c='cla')} AS lat, "
        f"{lerp.format(p='plo', c='clo')} AS lon FROM ks"
    )


def mobility_metrics(
    points: DataFrame,
    zoom: int = 14,
    user_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-user mobility features (González, Hidalgo & Barabási 2008;
    Pappalardo et al. 2015): the standard per-entity summary a
    mobility / fleet training corpus attaches to every user before
    modeling.

    Emits one row per user:

    - ``n_fixes``, ``n_cells`` — fix count and distinct zoom-``zoom``
      tiles visited (exact integers);
    - ``hhi_num`` BIGINT and ``hhi`` DOUBLE — Simpson concentration
      (Herfindahl index) over visited cells, Σc²/n²: the exact-rational
      stand-in for location entropy (entropy needs per-row ``ln``
      whose libm rounding is not pinned; 1/hhi is the standard
      "effective number of locations" diversity measure);
    - ``rgyr_m`` DOUBLE, ``sum_sq_m`` BIGINT, ``max_d_m`` BIGINT —
      radius of gyration sqrt(Σd²/n) with d = integer-meter geodesic
      distance to the user's integer-µdeg centroid (the stay_points
      centroid doctrine), plus the exact building blocks.

    Exactness: every aggregate is an exact BIGINT (Σµdeg, counts,
    Σc², Σd², max d); the only float ops are ONE floor-div-exact
    centroid decode, the shared haversine expression (green across the
    whole trajectory family), and final single divisions / sqrt —
    IEEE-correctly-rounded, so bit-identical to the DuckDB twin.

    Plan shape: two bounded passes over the fix relation — a
    (user, cell) pre-aggregate that collapses to ≤ cells-per-user rows
    before the per-user rollup (both map-side combinable), and one
    user-partitioned window to attach the centroid sums followed by a
    groupBy on the SAME key, which reuses the window's hash exchange
    (the trajectory-family doctrine: the fix relation is exchanged
    once per pass, never exploded).

    Overflow bound: requires n_fixes_per_user x max_d_m² < 2^63 —
    ~23k fixes/user at antipodal spread, unbounded for any city- or
    country-scale user footprint (d ≤ 10^6 m allows 9.2e6 fixes/user).
    Quantize to coarser units upstream for globe-spanning entities.
    """
    ula = F.round(F.col(lat_col) * F.lit(1e6)).cast("long")
    ulo = F.round(F.col(lon_col) * F.lit(1e6)).cast("long")
    tx, ty = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)

    cells = points.select(
        user_col, (tx * F.lit(1 << zoom) + ty).alias("_cell")
    )
    per_cell = cells.groupBy(user_col, "_cell").agg(
        F.count(F.lit(1)).alias("_c")
    )
    a = per_cell.groupBy(user_col).agg(
        F.sum("_c").alias("n_fixes"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("_c") * F.col("_c")).alias("hhi_num"),
    )

    wu = Window.partitionBy(user_col)
    cent = points.select(
        user_col,
        F.col(lat_col).alias("_la"),
        F.col(lon_col).alias("_lo"),
        F.sum(ula).over(wu).alias("_sla"),
        F.sum(ulo).over(wu).alias("_slo"),
        F.count(F.lit(1)).over(wu).alias("_n"),
    )
    clat = (F.expr("_sla div _n") / F.lit(1e6)).cast("double")
    clon = (F.expr("_slo div _n") / F.lit(1e6)).cast("double")
    d_m = F.round(C.haversine(F.col("_la"), F.col("_lo"), clat, clon)).cast(
        "long"
    )
    b = (
        cent.withColumn("_d", d_m)
        .groupBy(user_col)
        .agg(
            F.sum(F.col("_d") * F.col("_d")).alias("sum_sq_m"),
            F.max("_d").alias("max_d_m"),
        )
    )
    n2 = (F.col("n_fixes") * F.col("n_fixes")).cast("double")
    return a.join(b, user_col).select(
        user_col,
        "n_fixes",
        "n_cells",
        "hhi_num",
        (F.col("hhi_num").cast("double") / n2).alias("hhi"),
        F.sqrt(F.col("sum_sq_m").cast("double") / F.col("n_fixes").cast(
            "double"
        )).alias("rgyr_m"),
        "sum_sq_m",
        "max_d_m",
    )


def mobility_metrics_oracle_sql(
    subq: str,
    zoom: int = 14,
    user_col: str = "user_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`mobility_metrics`: identical integer
    aggregates, identical floor-div centroid decode, the shared
    haversine expression, and the same final IEEE divisions/sqrt."""
    tx, ty = C.tile_xy_sql(lat, lon, zoom)
    cell = f"({tx} * {1 << zoom} + {ty})"
    a = (
        f"SELECT {user_col}, SUM(c) AS n_fixes, COUNT(*) AS n_cells, "
        f"SUM(c * c) AS hhi_num FROM "
        f"(SELECT {user_col}, {cell} AS cell, COUNT(*) AS c "
        f"FROM {subq} GROUP BY 1, 2) GROUP BY 1"
    )
    ula = f"CAST(round(({lat}) * 1000000.0) AS BIGINT)"
    ulo = f"CAST(round(({lon}) * 1000000.0) AS BIGINT)"
    part = f"OVER (PARTITION BY {user_col})"
    cent = (
        f"SELECT {user_col}, {lat} AS _la, {lon} AS _lo, "
        f"SUM({ula}) {part} AS _sla, SUM({ulo}) {part} AS _slo, "
        f"COUNT(*) {part} AS _n FROM {subq}"
    )
    hav = C.haversine_sql(
        "_la", "_lo",
        "CAST((_sla // _n) / 1000000.0 AS DOUBLE)",
        "CAST((_slo // _n) / 1000000.0 AS DOUBLE)",
    )
    b = (
        f"SELECT {user_col}, SUM(_d * _d) AS sum_sq_m, MAX(_d) AS max_d_m "
        f"FROM (SELECT {user_col}, CAST(round({hav}) AS BIGINT) AS _d "
        f"FROM ({cent})) GROUP BY 1"
    )
    return (
        f"SELECT a.{user_col}, n_fixes, n_cells, hhi_num, "
        "CAST(hhi_num AS DOUBLE) / "
        "(CAST(n_fixes * n_fixes AS DOUBLE)) AS hhi, "
        "sqrt(CAST(sum_sq_m AS DOUBLE) / CAST(n_fixes AS DOUBLE)) "
        "AS rgyr_m, sum_sq_m, max_d_m "
        f"FROM ({a}) a JOIN ({b}) b USING ({user_col})"
    )


def heading_stats(
    points: DataFrame,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-trip circular heading statistics (Mardia & Jupp 2000,
    directional statistics): mean direction, mean resultant length R,
    and circular variance 1-R over the trip's leg bearings — the
    straightness/tortuosity feature a trajectory corpus attaches to
    every trip (R→1 = beeline, R→0 = random walk / loop).

    Directions are the reference bearing (GeoGeometry.kt:1121-1139 via
    functions/columns.heading — the expression already oracle-green in
    the distances family).  Zero-displacement legs (parked duplicate
    fixes) carry no direction and are excluded by the exact integer
    predicate ``leg_mm > 0``; trips with no moving leg emit no row.

    Exactness doctrine: per-leg cos/sin quantize to ppb BIGINTs (the
    kde stencil rule) so the per-trip sums are exact integers in any
    combine order; R and the mean direction are then single IEEE
    ops (mul/add/sqrt/div, one atan2) on the exact sums — identical
    in the twin.  ONE user-hash exchange: the session window, the leg
    window, and the (user, session) groupBy all share it.
    """
    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    leg_mm = F.round(
        C.haversine(plat, plon, F.col(lat_col), F.col(lon_col))
        * F.lit(1000.0)
    ).cast("long")
    theta = C.heading(plat, plon, F.col(lat_col), F.col(lon_col))
    rad = theta * F.lit(C.DEG2RAD)
    legs = (
        sess.withColumns(
            {
                "_leg": leg_mm,
                "_c": F.round(F.cos(rad) * F.lit(1e9)).cast("long"),
                "_s": F.round(F.sin(rad) * F.lit(1e9)).cast("long"),
            }
        )
        .where(F.col("_leg") > 0)
    )
    agg = legs.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum("_c").alias("c_ppb"),
        F.sum("_s").alias("s_ppb"),
    )
    cd, sd = F.col("c_ppb").cast("double"), F.col("s_ppb").cast("double")
    r = F.sqrt(cd * cd + sd * sd) / (
        F.col("n_legs").cast("double") * F.lit(1e9)
    )
    mean_dir = (
        F.atan2(sd, cd) * F.lit(1.0 / C.DEG2RAD) + F.lit(360.0)
    ) % F.lit(360.0)
    return agg.select(
        user_col,
        "session_id",
        "n_legs",
        "c_ppb",
        "s_ppb",
        r.alias("resultant_r"),
        (F.lit(1.0) - r).alias("circ_var"),
        # atan2 is the one libm call whose last ulp differs between
        # the JVM and C library on some inputs (unlike sqrt/div, it is
        # not IEEE-correctly-rounded): round to 7 decimals (~1 cm of
        # arc at Earth scale) — the speed_ms_r3 pinning rule
        F.round(mean_dir, 7).alias("mean_dir_r7"),
    )


def heading_stats_oracle_sql(
    subq: str,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`heading_stats`: same sessionize, same leg
    predicate, same ppb quantization, same single-IEEE-op finals."""
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    part = (
        f"PARTITION BY {user_col}, session_id ORDER BY {ts_col}, {id_col}"
    )
    plat, plon = f"lag({lat}) OVER ({part})", f"lag({lon}) OVER ({part})"
    hav = C.haversine_sql(plat, plon, lat, lon)
    theta = C.heading_sql(plat, plon, lat, lon)
    rad = f"(({theta}) * {C.DEG2RAD!r})"
    legs = (
        f"SELECT {user_col}, session_id, "
        f"CAST(round(({hav}) * 1000.0) AS BIGINT) AS _leg, "
        f"CAST(round(cos({rad}) * 1000000000.0) AS BIGINT) AS _c, "
        f"CAST(round(sin({rad}) * 1000000000.0) AS BIGINT) AS _s "
        f"FROM ({sess})"
    )
    return (
        f"SELECT {user_col}, session_id, COUNT(*) AS n_legs, "
        "SUM(_c) AS c_ppb, SUM(_s) AS s_ppb, "
        "sqrt(CAST(SUM(_c) AS DOUBLE) * CAST(SUM(_c) AS DOUBLE) + "
        "CAST(SUM(_s) AS DOUBLE) * CAST(SUM(_s) AS DOUBLE)) / "
        "(CAST(COUNT(*) AS DOUBLE) * 1000000000.0) AS resultant_r, "
        "1.0 - sqrt(CAST(SUM(_c) AS DOUBLE) * CAST(SUM(_c) AS DOUBLE) + "
        "CAST(SUM(_s) AS DOUBLE) * CAST(SUM(_s) AS DOUBLE)) / "
        "(CAST(COUNT(*) AS DOUBLE) * 1000000000.0) AS circ_var, "
        "round(((atan2(CAST(SUM(_s) AS DOUBLE), CAST(SUM(_c) AS DOUBLE)) * "
        f"{1.0 / C.DEG2RAD!r}) + 360.0) % 360.0, 7) AS mean_dir_r7 "
        f"FROM ({legs}) WHERE _leg > 0 GROUP BY {user_col}, session_id"
    )


def cell_transitions(
    points: DataFrame,
    zoom: int = 12,
    gap_s: int = 43200,
    min_count: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """First-order Markov mobility model over grid cells (Gambs et
    al. 2012 next-place prediction; Song et al. 2010 predictability):
    count every transition between consecutive DISTINCT zoom-``zoom``
    cells within a trip, and the per-origin transition probability —
    the travel-pattern matrix a next-location model trains on.

    Semantics: fixes order by (ts, id) within each (user, session);
    runs of consecutive fixes in the SAME cell collapse to one visit
    (a parked user generates no self-transitions); each adjacent visit
    pair contributes one (from_cell, to_cell) count.  Transitions
    never cross a session boundary.  Rows with fewer than
    ``min_count`` observations are dropped (exact integer predicate).

    Exactness: cell ids, counts, and origin totals are exact integers;
    ``p`` is ONE IEEE division of exact BIGINTs — bit-identical in the
    twin.  Plan: the session window, the visit-collapse filter, and
    the second lag window all ride ONE user-hash exchange; the
    (from, to) count is a map-side-combinable aggregate over visit
    pairs (≤ one row per retained fix), and the origin total is a
    window over the AGGREGATED matrix (|cells|² at worst, in practice
    the sparse observed-transition set)."""
    tx, ty = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    cell = tx * F.lit(1 << zoom) + ty
    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    visits = (
        sess.withColumn("_cell", cell)
        .withColumn("_prev_fix_cell", F.lag("_cell").over(w))
        .where(
            F.col("_prev_fix_cell").isNull()
            | (F.col("_prev_fix_cell") != F.col("_cell"))
        )
    )
    trans = (
        visits.withColumn("_from", F.lag("_cell").over(w))
        .where(F.col("_from").isNotNull())
        .groupBy(
            F.col("_from").alias("from_cell"),
            F.col("_cell").alias("to_cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
        .where(F.col("n_trans") >= F.lit(int(min_count)))
    )
    wo = Window.partitionBy("from_cell")
    return trans.select(
        "from_cell",
        "to_cell",
        "n_trans",
        F.sum("n_trans").over(wo).alias("from_total"),
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wo).cast("double")
        ).alias("p"),
    )


def cell_transitions_oracle_sql(
    subq: str,
    zoom: int = 12,
    gap_s: int = 43200,
    min_count: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`cell_transitions`: same visit collapse,
    same windows, same exact counts and single IEEE division.

    Caveat: ``min_count`` filters BEFORE the origin total (both
    engines), so ``from_total`` is the total over RETAINED rows."""
    tx, ty = C.tile_xy_sql(lat, lon, zoom)
    cell = f"({tx} * {1 << zoom} + {ty})"
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    part = (
        f"PARTITION BY {user_col}, session_id ORDER BY {ts_col}, {id_col}"
    )
    cells = f"SELECT *, {cell} AS _cell FROM ({sess})"
    visits = (
        f"SELECT * FROM (SELECT *, lag(_cell) OVER ({part}) "
        f"AS _prev_fix_cell FROM ({cells})) "
        "WHERE _prev_fix_cell IS NULL OR _prev_fix_cell != _cell"
    )
    pairs = (
        f"SELECT lag(_cell) OVER ({part}) AS from_cell, _cell AS to_cell "
        f"FROM ({visits})"
    )
    trans = (
        f"SELECT from_cell, to_cell, COUNT(*) AS n_trans FROM ({pairs}) "
        "WHERE from_cell IS NOT NULL GROUP BY 1, 2 "
        f"HAVING COUNT(*) >= {int(min_count)}"
    )
    return (
        "SELECT from_cell, to_cell, n_trans, "
        "SUM(n_trans) OVER (PARTITION BY from_cell) AS from_total, "
        "CAST(n_trans AS DOUBLE) / CAST(SUM(n_trans) "
        "OVER (PARTITION BY from_cell) AS DOUBLE) AS p "
        f"FROM ({trans})"
    )


def deviational_ellipse(
    points: DataFrame,
    user_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-user standard deviational ellipse (Lefever 1926; Yuill 1971
    — ArcGIS "Directional Distribution"): the directional dispersion
    summary a mobility corpus attaches to every entity — center, the
    major-axis orientation, and the two axis lengths of the 1-σ
    ellipse of the user's fixes in degree space (x = lon, y = lat,
    population n in the denominators).

    Rather than the textbook rotate-and-resum form (which needs
    per-row sin/cos of the fitted angle), the axes come from the
    closed-form eigenvalues of the 2x2 covariance matrix —
    λ± = ((Cxx+Cyy) ± sqrt((Cxx−Cyy)² + 4Cxy²))/2 — and the
    orientation from θ = ½·atan2(2Cxy, Cxx−Cyy): algebraically the
    same ellipse, but the only libm call left is ONE atan2 (pinned by
    the heading_stats r7-rounding doctrine); everything else is
    IEEE-exact +−*/sqrt.

    Exactness: fixes quantize to integer µdeg; the user's integer
    anchor (Σµdeg div n — the mobility centroid decode) recenters
    per-row deviations so all five moment sums (Σdx, Σdy, Σdx²,
    Σdy², Σdxdy) are exact BIGINTs with NO overflow for any
    continental-scale footprint (bound: n·max|dµdeg|² < 2^63, ~1e4
    antipodal fixes — quantize coarser upstream for globe-spanning
    entities); central moments then shift off the anchor in pinned
    float ops.  ONE user-hash exchange: the anchor window and the
    moment groupBy share it (the trajectory-family doctrine).

    Returns one row per user: (user, n_fixes, c_lat_r7, c_lon_r7,
    angle_r7 — major-axis orientation in degrees CCW from east in
    (−90, 90] — major_deg_r7, minor_deg_r7); degenerate users
    (n = 1 or zero spread) get 0.0 axes and angle."""
    ula = F.round(F.col(lat_col) * F.lit(1e6)).cast("long")
    ulo = F.round(F.col(lon_col) * F.lit(1e6)).cast("long")
    wu = Window.partitionBy(user_col)
    base = points.select(
        user_col,
        ula.alias("_ula"),
        ulo.alias("_ulo"),
        F.sum(ula).over(wu).alias("_sla"),
        F.sum(ulo).over(wu).alias("_slo"),
        F.count(F.lit(1)).over(wu).alias("_n"),
    ).select(
        user_col,
        "_ula",
        "_ulo",
        F.expr("_sla div _n").alias("_ay"),
        F.expr("_slo div _n").alias("_ax"),
    )
    dx = F.col("_ulo") - F.col("_ax")
    dy = F.col("_ula") - F.col("_ay")
    g = base.groupBy(user_col, "_ax", "_ay").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.sum(dx).alias("sdx"),
        F.sum(dy).alias("sdy"),
        F.sum(dx * dx).alias("sdx2"),
        F.sum(dy * dy).alias("sdy2"),
        F.sum(dx * dy).alias("sdxy"),
    )
    n_d = F.col("n_fixes").cast("double")
    mx = F.col("sdx").cast("double") / n_d
    my = F.col("sdy").cast("double") / n_d
    cxx = F.col("sdx2").cast("double") / n_d - mx * mx
    cyy = F.col("sdy2").cast("double") / n_d - my * my
    cxy = F.col("sdxy").cast("double") / n_d - mx * my
    tr = cxx + cyy
    df = cxx - cyy
    disc = F.sqrt(df * df + F.lit(4.0) * (cxy * cxy))
    l1 = (tr + disc) / F.lit(2.0)
    l2 = (tr - disc) / F.lit(2.0)
    major = F.when(l1 > 0, F.sqrt(l1) / F.lit(1e6)).otherwise(F.lit(0.0))
    minor = F.when(l2 > 0, F.sqrt(l2) / F.lit(1e6)).otherwise(F.lit(0.0))
    angle = (
        F.atan2(F.lit(2.0) * cxy, df) / F.lit(2.0)
    ) * F.lit(1.0 / C.DEG2RAD)
    c_lat = (F.col("_ay").cast("double") + my) / F.lit(1e6)
    c_lon = (F.col("_ax").cast("double") + mx) / F.lit(1e6)
    return g.select(
        F.col(user_col),
        "n_fixes",
        # centers stay UNROUNDED: they are rationals (exact-int sums /
        # n) whose decimal expansion can land exactly on a rounding
        # boundary where Spark's BigDecimal HALF_UP and DuckDB's
        # multiply-then-round disagree; the pre-round doubles are
        # bit-identical (pure IEEE + and /), so raw is the exact form
        c_lat.alias("c_lat"),
        c_lon.alias("c_lon"),
        F.round(angle, 7).alias("angle_r7"),
        F.round(major, 7).alias("major_deg_r7"),
        F.round(minor, 7).alias("minor_deg_r7"),
    )


def deviational_ellipse_oracle_sql(
    subq: str,
    user_col: str = "user_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`deviational_ellipse`: identical µdeg
    anchor decode, exact moment sums, eigenvalue combine, and the
    same single atan2 under r7 rounding."""
    ula = f"CAST(round(({lat}) * 1000000.0) AS BIGINT)"
    ulo = f"CAST(round(({lon}) * 1000000.0) AS BIGINT)"
    part = f"OVER (PARTITION BY {user_col})"
    base = (
        f"SELECT {user_col}, {ula} AS _ula, {ulo} AS _ulo, "
        f"(SUM({ula}) {part}) // (COUNT(*) {part}) AS _ay, "
        f"(SUM({ulo}) {part}) // (COUNT(*) {part}) AS _ax "
        f"FROM {subq}"
    )
    g = (
        f"SELECT {user_col}, _ax, _ay, COUNT(*) AS n_fixes, "
        "SUM(_ulo - _ax) AS sdx, SUM(_ula - _ay) AS sdy, "
        "SUM((_ulo - _ax) * (_ulo - _ax)) AS sdx2, "
        "SUM((_ula - _ay) * (_ula - _ay)) AS sdy2, "
        "SUM((_ulo - _ax) * (_ula - _ay)) AS sdxy "
        f"FROM ({base}) GROUP BY 1, 2, 3"
    )
    mx = "(CAST(sdx AS DOUBLE) / CAST(n_fixes AS DOUBLE))"
    my = "(CAST(sdy AS DOUBLE) / CAST(n_fixes AS DOUBLE))"
    cxx = f"(CAST(sdx2 AS DOUBLE) / CAST(n_fixes AS DOUBLE) - {mx} * {mx})"
    cyy = f"(CAST(sdy2 AS DOUBLE) / CAST(n_fixes AS DOUBLE) - {my} * {my})"
    cxy = f"(CAST(sdxy AS DOUBLE) / CAST(n_fixes AS DOUBLE) - {mx} * {my})"
    scal = (
        f"SELECT {user_col}, n_fixes, _ax, _ay, {mx} AS mx, {my} AS my, "
        f"{cxx} AS cxx, {cyy} AS cyy, {cxy} AS cxy FROM ({g})"
    )
    return (
        f"WITH s AS ({scal}), "
        "e AS (SELECT *, cxx + cyy AS tr, cxx - cyy AS df, "
        "sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * (cxy * cxy)) AS disc "
        "FROM s) "
        f"SELECT {user_col}, n_fixes, "
        "(CAST(_ay AS DOUBLE) + my) / 1000000.0 AS c_lat, "
        "(CAST(_ax AS DOUBLE) + mx) / 1000000.0 AS c_lon, "
        f"round((atan2(2.0 * cxy, df) / 2.0) * {1.0 / C.DEG2RAD!r}, 7) "
        "AS angle_r7, "
        "CASE WHEN (tr + disc) / 2.0 > 0 THEN "
        "round(sqrt((tr + disc) / 2.0) / 1000000.0, 7) ELSE 0.0 END "
        "AS major_deg_r7, "
        "CASE WHEN (tr - disc) / 2.0 > 0 THEN "
        "round(sqrt((tr - disc) / 2.0) / 1000000.0, 7) ELSE 0.0 END "
        "AS minor_deg_r7 FROM e"
    )
