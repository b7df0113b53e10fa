"""Map-matching join: snap every GPS point to its nearest road
segment within ``max_dist_m`` meters — the trajectory family's
point x linestring join (the reference exposes the scalar form as
``distanceToLineString`` / ``distanceToSegment``, GeoGeometry.kt:642-724;
this operator is its relation-scale nearest-neighbor composition).

Scale design — expand the SMALL side, never the point stream:

1. segments (the road network — a dimension relation next to a 100 TB
   fix stream) are covered with WebMercator tiles at a zoom whose cell
   ground size stays >= ``max_dist_m`` up to ``max_abs_lat`` (the
   grid_dbscan zoom rule): sample the segment every half-cell plus both
   endpoints, then expand each covered cell to its 8-neighborhood.  Any
   point within ``max_dist_m`` of the segment therefore shares a cell
   address with the expanded covering — the candidate guarantee lives
   entirely on the build side;
2. each point computes ONE tile address (native Column math, no
   explode) and equi-joins the covering — broadcast when the covering
   is small (auto-probed with a bounded ``limit(cap+1).count()`` job,
   the ann_join doctrine: a stats-barrier relation must never rely on a
   manual hint), shuffle hash join on the cell key otherwise;
3. the exact geodesic point-to-segment distance
   (functions/columns.py distance_to_segment — native, codegen) filters
   candidates to true hits;
4. per-point argmin via groupBy + min_by on the (distance, seg_id)
   struct — map-side partial aggregation collapses each point's
   candidates before the exchange, so the shuffle carries at most one
   row per matched point (a window row_number would sort-shuffle every
   candidate instead).

Nothing all-pairs, nothing per-row Python: the candidate volume is
bounded by cell co-location, and the big side is never exploded,
re-keyed, or shuffled beyond the final 1-row-per-point partial agg.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from .cluster import _EARTH_CIRCUMFERENCE_M, dbscan_zoom_for_eps

__all__ = [
    "segment_covering",
    "map_match",
    "map_match_oracle_sql",
    "segment_speeds",
    "segment_speeds_oracle_sql",
    "segment_speed_percentiles",
    "segment_speed_percentiles_oracle_sql",
]

# auto-broadcast cap for the expanded covering relation (rows); ~9x the
# raw cell count, each row a handful of scalars -> well under Spark's
# 10 MB default broadcast threshold at this cap.
_BROADCAST_CAP = 200_000

_SEG_COLS = ("seg_id", "alat", "alon", "blat", "blon")


def _validated_zoom(
    max_dist_m: float, max_abs_lat: float, zoom: int | None
) -> int:
    if zoom is None:
        return dbscan_zoom_for_eps(max_dist_m, max_abs_lat)
    cell_m = (
        _EARTH_CIRCUMFERENCE_M
        * math.cos(math.radians(max_abs_lat))
        / float(1 << zoom)
    )
    if cell_m < max_dist_m:
        raise ValueError(
            f"zoom {zoom} has {cell_m:.1f} m cells at lat {max_abs_lat}, "
            f"smaller than max_dist {max_dist_m} m: near points could "
            "skip past the covering's 8-neighborhood. Use a coarser zoom."
        )
    return zoom


def segment_covering(
    segments: DataFrame,
    max_dist_m: float,
    zoom: int,
    max_abs_lat: float,
) -> DataFrame:
    """Distinct (segment, cell) rows whose cells are the 9-neighborhood
    of every tile the segment passes through at ``zoom``.

    The segment is sampled every half-cell of ground distance (plus
    both endpoints) with lat/lon-linear interpolation — for segments
    short enough that the loxodrome/great-circle gap stays inside the
    one-ring slack this hits every crossed cell.  Expansion happens
    HERE (the small side) so the point stream joins on its own single
    address.  Carries ``_nx``/``_ny`` cell keys plus the segment
    endpoint columns."""
    n_tiles = 1 << zoom
    cell_m = _EARTH_CIRCUMFERENCE_M * math.cos(
        math.radians(max_abs_lat)
    ) / float(n_tiles)
    seg_len = C.haversine(
        F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
    )
    n_steps = F.greatest(
        F.lit(1), F.ceil(seg_len / F.lit(cell_m / 2.0)).cast("int")
    )
    t = F.col("_i").cast("double") / F.col("_n").cast("double")
    slat = F.col("alat") + (F.col("blat") - F.col("alat")) * t
    slon = F.col("alon") + (F.col("blon") - F.col("alon")) * t
    tx, ty = C.tile_xy(slat, slon, zoom)
    sampled = (
        segments.withColumn("_n", n_steps)
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_n"))))
        .select(*_SEG_COLS, tx.alias("_cx"), ty.alias("_cy"))
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    expanded = sampled.withColumn("_o", F.explode(offs)).select(
        *_SEG_COLS,
        F.pmod(F.col("_cx") + F.col("_o.dx"), F.lit(n_tiles)).alias("_nx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_ny"),
    )
    # y has no wrap (Mercator clamps at the poles); drop out-of-range
    # ring cells rather than clamping them onto real rows
    return expanded.where(
        (F.col("_ny") >= 0) & (F.col("_ny") < n_tiles)
    ).dropDuplicates(["seg_id", "_nx", "_ny"])


def map_match(
    points: DataFrame,
    segments: DataFrame,
    max_dist_m: float = 150.0,
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    carry_cols: tuple[str, ...] = ("user_id",),
    seg_id_col: str = "seg_id",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
    broadcast_segments: bool | None = None,
) -> DataFrame:
    """Nearest-segment match: one output row per input point that lies
    within ``max_dist_m`` meters of at least one segment, carrying
    ``id_col`` + ``carry_cols`` + the winning ``seg_id`` + ``dist_m``.

    ``segments`` needs columns (``seg_id_col``, alat, alon, blat, blon).
    Ties (a point exactly equidistant to two segments, e.g. at a shared
    corner where both distances ARE the same endpoint haversine) break
    to the lower seg_id.  Points with NULL coordinates are dropped (they
    cannot be matched).  ``broadcast_segments=None`` auto-probes the
    expanded covering with a bounded count and broadcasts iff it is
    under ~200k rows — the road network is a dimension next to a fix
    stream, so this is the expected path; pass False to force the
    shuffle hash join for continent-scale networks."""
    zoom = _validated_zoom(max_dist_m, max_abs_lat, zoom)
    segs = segments.select(
        F.col(seg_id_col).alias("seg_id"), "alat", "alon", "blat", "blon"
    )
    cover = segment_covering(segs, max_dist_m, zoom, max_abs_lat)
    if broadcast_segments is None:
        broadcast_segments = (
            cover.limit(_BROADCAST_CAP + 1).count() <= _BROADCAST_CAP
        )
    if broadcast_segments:
        cover = F.broadcast(cover)

    px, py = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    pts = points.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(
        F.col(id_col).alias("_pid"),
        *[F.col(c) for c in carry_cols],
        F.col(lat_col).alias("_plat"),
        F.col(lon_col).alias("_plon"),
        px.alias("_nx"),
        py.alias("_ny"),
    )
    dist = C.distance_to_segment(
        F.col("_plat"),
        F.col("_plon"),
        F.col("alat"),
        F.col("alon"),
        F.col("blat"),
        F.col("blon"),
    )
    cand = (
        pts.join(cover, ["_nx", "_ny"])
        .withColumn("_d", dist)
        .where(F.col("_d") <= F.lit(float(max_dist_m)))
    )
    best = F.min_by(
        F.struct(F.col("seg_id"), F.col("_d")),
        F.struct(F.col("_d"), F.col("seg_id")),
    ).alias("_best")
    out = cand.groupBy(F.col("_pid"), *[F.col(c) for c in carry_cols]).agg(
        best
    )
    return out.select(
        F.col("_pid").alias(id_col),
        *carry_cols,
        F.col("_best.seg_id").alias(seg_id_col),
        F.col("_best._d").alias("dist_m"),
    )


def map_match_oracle_sql(
    points_subq: str,
    segments_subq: str,
    max_dist_m: float = 150.0,
    id_col: str = "event_id",
    carry_cols: tuple[str, ...] = ("user_id",),
) -> str:
    """Brute-force DuckDB twin: cross join pruned by a conservative
    degree bbox (0.01 deg > max_dist at any latitude the fixtures use,
    so no true hit is pruned), exact pairwise segment distance
    (functions/columns.py distance_to_segment_sql — same op order as
    the Column), ROW_NUMBER argmin with the same (dist, seg_id) order.
    Emits raw dist_m; round at the SELECT for hashing like the Spark
    side."""
    # conservative degree margin: max_dist in longitude degrees at
    # |lat| = 60 (the widest the fixtures reach is 53), x1.2 slack —
    # never prunes a true hit, floor of 0.01 deg keeps tiny radii cheap
    margin = max(0.01, max_dist_m / 55660.0 * 1.2)
    carry = "".join(f", p.{c}" for c in carry_cols)
    dist = C.distance_to_segment_sql(
        "p.lat", "p.lon", "s.alat", "s.alon", "s.blat", "s.blon"
    )
    return (
        f"WITH pts AS (SELECT * FROM {points_subq} "
        "WHERE lat IS NOT NULL AND lon IS NOT NULL), "
        f"segs AS (SELECT * FROM {segments_subq}), "
        f"cand AS (SELECT p.{id_col}{carry}, s.seg_id, {dist} AS dist_m "
        "FROM pts p JOIN segs s ON "
        f"p.lat >= least(s.alat, s.blat) - {margin!r} AND "
        f"p.lat <= greatest(s.alat, s.blat) + {margin!r} AND "
        f"p.lon >= least(s.alon, s.blon) - {margin!r} AND "
        f"p.lon <= greatest(s.alon, s.blon) + {margin!r}), "
        "hit AS (SELECT *, ROW_NUMBER() OVER ("
        f"PARTITION BY {id_col} ORDER BY dist_m, seg_id) AS rn "
        f"FROM cand WHERE dist_m <= {float(max_dist_m)!r}) "
        f"SELECT {id_col}{carry.replace('p.', '')}, seg_id, dist_m "
        "FROM hit WHERE rn = 1"
    )


def segment_speeds(
    points: DataFrame,
    segments: DataFrame,
    max_dist_m: float = 150.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    **mm_kw,
) -> DataFrame:
    """Composed per-segment speed profile — the fleet-analytics rollup
    on top of :func:`map_match`: for every road segment, how many
    trajectory legs ended on it, total leg distance/duration, and the
    aggregate speed.

    A leg (consecutive same-session fix pair) is attributed to the
    segment its END fix snaps to.  Scale shape: the leg columns
    (mm-quantized geodesic + integer duration) are computed FIRST on
    the session window and then ride ``map_match``'s ``carry_cols``
    through the covering probe — so the big relation is exchanged ONCE
    (the user window); the match argmin stays a map-side-partial
    min_by and the final per-segment aggregate shuffles one partial
    row per (task, segment).  No fix-by-fix rejoin.

    Speed is exact integer sums with one final double division:
    ``round((Σmm / 1000.0) / Σs, 3)`` — bit-identical in the twin.
    Zero-duration legs (same-second fixes) are excluded BEFORE the
    probe, as is each session's first fix (no leg)."""
    from pyspark.sql import Window

    from .trajectory import _leg_mm, sessionize

    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    legs = sess.select(
        F.col(id_col),
        F.col(lat_col),
        F.col(lon_col),
        _leg_mm(lat_col, lon_col, w).alias("_mm"),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("_dt"),
    ).where(F.col("_mm").isNotNull() & (F.col("_dt") > 0))
    matched = map_match(
        legs,
        segments,
        max_dist_m=max_dist_m,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=("_mm", "_dt"),
        **mm_kw,
    )
    agg = matched.groupBy("seg_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum("_mm").alias("dist_mm"),
        F.sum("_dt").alias("dur_s"),
    )
    return agg.select(
        "seg_id",
        "n_legs",
        "dist_mm",
        "dur_s",
        F.round(
            (F.col("dist_mm") / F.lit(1000.0))
            / F.col("dur_s").cast("double"),
            3,
        ).alias("speed_ms_r3"),
    )


def segment_speeds_oracle_sql(
    points_subq: str,
    segments_subq: str,
    max_dist_m: float = 150.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin: sessionize CTE + the same mm/integer-second leg
    window, legs-as-points through the brute-force map_match twin
    (leg columns as carry_cols), identical integer sums and the same
    single-division rounded speed."""
    from .trajectory import _leg_mm_sql, sessionize_oracle_sql

    sess = sessionize_oracle_sql(
        points_subq, gap_s, user_col, ts_col, id_col
    )
    part = (
        f"PARTITION BY {user_col}, session_id "
        f"ORDER BY {ts_col}, {id_col}"
    )
    leg = _leg_mm_sql(lat, lon, part)
    legs_subq = (
        f"(SELECT * FROM (SELECT {id_col}, {lat} AS lat, {lon} AS lon, "
        f"{leg} AS leg_mm, "
        f"{ts_col} - lag({ts_col}) OVER ({part}) AS dt "
        f"FROM ({sess})) "
        f"WHERE leg_mm IS NOT NULL AND dt > 0)"
    )
    inner = map_match_oracle_sql(
        legs_subq,
        segments_subq,
        max_dist_m=max_dist_m,
        id_col=id_col,
        carry_cols=("leg_mm", "dt"),
    )
    return (
        f"SELECT seg_id, count(*) AS n_legs, sum(leg_mm) AS dist_mm, "
        f"sum(dt) AS dur_s, "
        f"round((sum(leg_mm) / 1000.0) / CAST(sum(dt) AS DOUBLE), 3) "
        f"AS speed_ms_r3 FROM ({inner}) GROUP BY seg_id"
    )


def segment_speed_percentiles(
    points: DataFrame,
    segments: DataFrame,
    max_dist_m: float = 150.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    **mm_kw,
) -> DataFrame:
    """Per-segment speed DISTRIBUTION profile — the traffic-engineering
    companion to :func:`segment_speeds`: median (v50), 85th-percentile
    (v85 — the standard speed-limit-setting statistic, e.g. FHWA
    speed-zoning guidance), and max leg speed per road segment.

    Percentiles are EXACT order statistics under the nearest-rank
    definition (value at row_number ``ceil(p * n)`` when legs sort by
    (speed, id)): no interpolation, no approximation — the pick is an
    actual observed leg speed, deterministic in both engines because
    the sort key (an IEEE-division double + the integer id tiebreak)
    is bit-identical.  ``percentile_approx`` is deliberately NOT used
    (approximate ⇒ engine-dependent); this is the one member of the
    segment family whose aggregate requires per-group ORDER, so the
    plan shuffles the matched-leg relation once on ``seg_id`` and
    sorts within partitions — bounded by matched legs (≤ one row per
    in-range fix), never the raw point stream, and the window's
    partition key is the output key so the final aggregate reuses the
    exchange.

    Leg attribution and exclusions are identical to segment_speeds
    (END-fix snap, zero-duration and first-of-session legs dropped
    before the probe).  Returns
    (seg_id, n_legs, v50_r3, v85_r3, vmax_r3)."""
    from pyspark.sql import Window

    from .trajectory import _leg_mm, sessionize

    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    legs = sess.select(
        F.col(id_col),
        F.col(lat_col),
        F.col(lon_col),
        _leg_mm(lat_col, lon_col, w).alias("_mm"),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("_dt"),
    ).where(F.col("_mm").isNotNull() & (F.col("_dt") > 0))
    matched = map_match(
        legs,
        segments,
        max_dist_m=max_dist_m,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=("_mm", "_dt"),
        **mm_kw,
    )
    v = (F.col("_mm") / F.lit(1000.0)) / F.col("_dt").cast("double")
    ws = Window.partitionBy("seg_id").orderBy("_v", id_col)
    ranked = matched.select(
        "seg_id", F.col(id_col), v.alias("_v")
    ).withColumns(
        {
            "_rk": F.row_number().over(ws),
            "_n": F.count(F.lit(1)).over(Window.partitionBy("seg_id")),
        }
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("_rk")
            == F.ceil(F.col("_n").cast("double") * F.lit(p)).cast("long"),
            F.col("_v"),
        )
    )
    return ranked.groupBy("seg_id").agg(
        F.max("_n").alias("n_legs"),
        F.round(pick(0.5), 3).alias("v50_r3"),
        F.round(pick(0.85), 3).alias("v85_r3"),
        F.round(F.max("_v"), 3).alias("vmax_r3"),
    )


def segment_speed_percentiles_oracle_sql(
    points_subq: str,
    segments_subq: str,
    max_dist_m: float = 150.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`segment_speed_percentiles`: same legs,
    same brute-force match twin, same nearest-rank picks over the
    identical (speed, id) order."""
    from .trajectory import _leg_mm_sql, sessionize_oracle_sql

    sess = sessionize_oracle_sql(
        points_subq, gap_s, user_col, ts_col, id_col
    )
    part = (
        f"PARTITION BY {user_col}, session_id "
        f"ORDER BY {ts_col}, {id_col}"
    )
    leg = _leg_mm_sql(lat, lon, part)
    legs_subq = (
        f"(SELECT * FROM (SELECT {id_col}, {lat} AS lat, {lon} AS lon, "
        f"{leg} AS leg_mm, "
        f"{ts_col} - lag({ts_col}) OVER ({part}) AS dt "
        f"FROM ({sess})) "
        f"WHERE leg_mm IS NOT NULL AND dt > 0)"
    )
    inner = map_match_oracle_sql(
        legs_subq,
        segments_subq,
        max_dist_m=max_dist_m,
        id_col=id_col,
        carry_cols=("leg_mm", "dt"),
    )
    ranked = (
        "SELECT seg_id, "
        "(leg_mm / 1000.0) / CAST(dt AS DOUBLE) AS v, "
        f"row_number() OVER (PARTITION BY seg_id ORDER BY "
        f"(leg_mm / 1000.0) / CAST(dt AS DOUBLE), {id_col}) AS rk, "
        "count(*) OVER (PARTITION BY seg_id) AS n "
        f"FROM ({inner})"
    )

    def pick(p: float) -> str:
        return (
            "MAX(CASE WHEN rk = CAST(ceil(CAST(n AS DOUBLE) * "
            f"{p!r}) AS BIGINT) THEN v END)"
        )

    return (
        "SELECT seg_id, MAX(n) AS n_legs, "
        f"round({pick(0.5)}, 3) AS v50_r3, "
        f"round({pick(0.85)}, 3) AS v85_r3, "
        "round(MAX(v), 3) AS vmax_r3 "
        f"FROM ({ranked}) GROUP BY seg_id"
    )
