"""Density clustering of geo points: grid-bucketed DBSCAN (min_pts=1
form, i.e. single-linkage with an ``eps`` cutoff) composed from the
engine's own primitives — tile bucketing (kernels/tiles.py, the
reference's Tile.kt:212-228 math), geodesic distance
(GeoGeometry.kt:565-580), and the distributed connected-components
operator (operators/dedup.py).

The classic sequential DBSCAN neighborhood scan is inherently
point-at-a-time; the scalable reformulation is the standard
grid-partitioned one (e.g. Han et al., "MR-DBSCAN", ICPADS 2011):

1. collapse exactly-coincident fixes (micro-degree quantization — at
   1 µdeg ≈ 0.11 m, far inside any sane eps) to one representative
   carrying ``min(id)`` — a boilerplate-location clique of m points
   becomes ONE node instead of m(m-1)/2 edges, the same hot-key
   doctrine as dedup_exact-before-MinHash;
2. bucket representatives into WebMercator tiles at a zoom whose cell
   ground size is >= eps everywhere in the data's latitude band, so any
   eps-pair lands in the same or 8-adjacent cells (x wraps modulo 2^z
   at the antimeridian, y needs no wrap — Mercator has no cells at the
   poles);
3. one equi-join on the 9 neighbor addresses + a geodesic filter
   produces the eps-graph — candidate pairs are bounded by cell
   co-location, never all-pairs;
4. alternating large-star/small-star connected components labels the
   clusters in O(log n) rounds.

Every eps-connected cluster gets the MIN member id as its label;
singletons label themselves.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from .dedup import connected_components

__all__ = ["grid_dbscan", "grid_dbscan_oracle_sql", "st_dbscan", "st_dbscan_oracle_sql"]

_EARTH_CIRCUMFERENCE_M = 2.0 * math.pi * C.EARTH_RADIUS_METERS


def dbscan_zoom_for_eps(eps_m: float, max_abs_lat: float) -> int:
    """Finest zoom whose cell ground size stays >= eps up to
    ``max_abs_lat`` (Mercator cell ground size ~ equator_width *
    cos(lat), conformal so x and y shrink together).  Finer cells mean
    fewer candidate pairs, so finest-valid is the efficient choice."""
    max_cells = _EARTH_CIRCUMFERENCE_M * math.cos(
        math.radians(max_abs_lat)
    ) / eps_m
    zoom = int(math.floor(math.log2(max_cells))) if max_cells >= 1 else 0
    return max(0, min(30, zoom))


def grid_dbscan(
    points: DataFrame,
    eps_m: float = 50.0,
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
) -> DataFrame:
    """Label every input row with its eps-connected cluster id
    (MIN ``id_col`` in the cluster).  Rows with |lat| > ``max_abs_lat``
    would break the adjacent-cell guarantee, so they are rejected with
    a ValueError at plan time if ``zoom`` is forced too fine; with the
    default auto zoom they are merely clustered conservatively (the
    Mercator clamp parks them in the edge row — document your own
    ``max_abs_lat`` if you have near-pole data and a large eps).

    Returns the input columns plus ``cluster_id`` (same type as
    ``id_col``).  Rows with NULL coordinates are excluded from the
    output (they cannot be clustered; the oracle twin's equi-joins
    drop them identically)."""
    if zoom is None:
        zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    else:
        cell_m = _EARTH_CIRCUMFERENCE_M * math.cos(
            math.radians(max_abs_lat)
        ) / float(1 << zoom)
        if cell_m < eps_m:
            raise ValueError(
                f"zoom {zoom} has {cell_m:.1f} m cells at lat "
                f"{max_abs_lat}, smaller than eps {eps_m} m: eps-pairs "
                "could skip past the 8-neighborhood. Use a coarser zoom."
            )
    n_tiles = 1 << zoom

    ula = F.round(F.col(lat_col) * F.lit(1e6)).cast("long")
    ulo = F.round(F.col(lon_col) * F.lit(1e6)).cast("long")
    # NULL coordinates cannot be clustered; drop them EXPLICITLY rather
    # than letting the null-unsafe label join back silently eat them
    # (the SQL twin's equi-join drops them the same way)
    keyed = points.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).withColumns({"_ula": ula, "_ulo": ulo})
    reps = keyed.groupBy("_ula", "_ulo").agg(
        F.min(id_col).alias("_pos")
    )
    rlat = F.col("_ula").cast("double") / F.lit(1e6)
    rlon = F.col("_ulo").cast("double") / F.lit(1e6)
    tx, ty = C.tile_xy(rlat, rlon, zoom)
    reps = reps.select(
        "_pos", "_ula", "_ulo",
        rlat.alias("_rlat"), rlon.alias("_rlon"),
        tx.alias("_tx"), ty.alias("_ty"),
    )

    # forward-neighbor halving: each unordered cell pair is probed from
    # exactly ONE side — (0,0) within-cell (deduped by pos order) plus
    # the four forward directions E/NE/N/NW (one of {v, -v} per axis) —
    # so the candidate join ships 5/9 of the naive 3x3 spread.  The
    # edge SET is identical; connected_components treats edges as
    # undirected, so labels are unchanged (and the 9-offset oracle twin
    # closes over the same graph).
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dx == 0 and dy == 0).alias("same"),
            )
            for dx, dy in ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1))
        ]
    )
    probe = reps.withColumn("_o", F.explode(offs)).select(
        F.col("_pos").alias("_pa"),
        F.col("_rlat").alias("_lata"),
        F.col("_rlon").alias("_lona"),
        F.col("_o.same").alias("_same"),
        F.pmod(F.col("_tx") + F.col("_o.dx"), F.lit(n_tiles)).alias("_nx"),
        (F.col("_ty") + F.col("_o.dy")).alias("_ny"),
    )
    build = reps.select(
        F.col("_pos").alias("_pb"),
        F.col("_rlat").alias("_latb"),
        F.col("_rlon").alias("_lonb"),
        F.col("_tx").alias("_nx"),
        F.col("_ty").alias("_ny"),
    )
    dist = C.haversine(
        F.col("_lata"), F.col("_lona"), F.col("_latb"), F.col("_lonb")
    )
    pair_ok = F.when(F.col("_same"), F.col("_pa") < F.col("_pb")).otherwise(
        F.col("_pa") != F.col("_pb")
    )
    edges = (
        probe.join(build, ["_nx", "_ny"])
        .where(pair_ok & (dist <= F.lit(float(eps_m))))
        .select(F.col("_pa").alias("id_a"), F.col("_pb").alias("id_b"))
    )
    comp = connected_components(edges)
    labeled = reps.join(
        comp, F.col("_pos") == F.col("node"), "left"
    ).select(
        "_ula", "_ulo",
        F.coalesce(F.col("component"), F.col("_pos")).alias("cluster_id"),
    )
    return keyed.join(labeled, ["_ula", "_ulo"]).drop("_ula", "_ulo")


def grid_dbscan_oracle_sql(
    subq: str,
    eps_m: float = 50.0,
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
    select_cols: str = "event_id, user_id",
) -> str:
    """Recursive-CTE twin (same shape as the dedup_groups oracle):
    identical rep collapse, identical 9-address candidate join and
    geodesic cutoff, transitive closure to the same min-label fixed
    point the star rounds converge to."""
    if zoom is None:
        zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    n_tiles = 1 << zoom
    rlat, rlon = "CAST(ula AS DOUBLE) / 1e6", "CAST(ulo AS DOUBLE) / 1e6"
    tx, ty = C.tile_xy_sql(rlat, rlon, zoom)
    hav = C.haversine_sql("a.rlat", "a.rlon", "b.rlat", "b.rlon")
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    return (
        f"WITH RECURSIVE keyed AS (SELECT *, "
        f"CAST(round(({lat}) * 1e6) AS BIGINT) AS ula, "
        f"CAST(round(({lon}) * 1e6) AS BIGINT) AS ulo FROM {subq}), "
        f"reps AS MATERIALIZED (SELECT ula, ulo, min({id_col}) AS pos, "
        f"{rlat} AS rlat, {rlon} AS rlon, {tx} AS tx, {ty} AS ty "
        "FROM keyed GROUP BY ula, ulo), "
        f"offsets(dx, dy) AS (VALUES {offs}), "
        "edges0 AS (SELECT a.pos AS u, b.pos AS v FROM "
        "(SELECT r.*, "
        f"((r.tx + o.dx) % {n_tiles} + {n_tiles}) % {n_tiles} AS nx, "
        "r.ty + o.dy AS ny FROM reps r CROSS JOIN offsets o) a "
        "JOIN reps b ON a.nx = b.tx AND a.ny = b.ty "
        f"AND a.pos < b.pos AND ({hav}) <= {float(eps_m)!r}), "
        "edges AS MATERIALIZED (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "labels AS (SELECT u AS node, least(u, min(v)) AS comp "
        "FROM reach GROUP BY u) "
        f"SELECT {select_cols}, coalesce(l.comp, r.pos) AS cluster_id "
        "FROM keyed k JOIN reps r ON k.ula = r.ula AND k.ulo = r.ulo "
        "LEFT JOIN labels l ON r.pos = l.node"
    )


_ST_FWD = [
    (dt, dx, dy)
    for dt in (-1, 0, 1)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dt, dx, dy) > (0, 0, 0)
]


def st_dbscan(
    points: DataFrame,
    eps_m: float = 500.0,
    eps_t: int = 3600,
    id_col: str = "event_id",
    ts_col: str = "ts_sec",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
) -> DataFrame:
    """Spatiotemporal DBSCAN (Birant & Kut 2007, "ST-DBSCAN: An
    algorithm for clustering spatial-temporal data"; the min_pts=1
    eps-linkage form like :func:`grid_dbscan`): two fixes link iff
    they are within ``eps_m`` meters AND ``eps_t`` seconds — so a
    place revisited next week is a NEW cluster (event detection,
    gathering detection, disaster footprints), where plain DBSCAN
    would merge the visits.

    Composition is :func:`grid_dbscan` with one more bucketing axis
    (the :mod:`colocation` composite key): representatives collapse on
    exact (µdeg, µdeg, second) triples, bucket on (ts div eps_t,
    tile@zoom), and every eps-pair lands within one bucket step on
    each axis — the candidate join probes the 13 lexicographically
    FORWARD space-time addresses plus the in-bucket half (pos order),
    shipping 14/27 of the naive spread while closing over the
    identical undirected edge set.  Exact predicates: |Δt| ≤ eps_t is
    integer, the geodesic cutoff is the shared haversine expression.
    Connected components labels clusters with the MIN member id.

    Returns the input rows (NULL coordinates dropped, like
    grid_dbscan) plus ``cluster_id``."""
    if zoom is None:
        zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    else:
        cell_m = _EARTH_CIRCUMFERENCE_M * math.cos(
            math.radians(max_abs_lat)
        ) / float(1 << zoom)
        if cell_m < eps_m:
            raise ValueError(
                f"zoom {zoom} has {cell_m:.1f} m cells at lat "
                f"{max_abs_lat}, smaller than eps {eps_m} m: eps-pairs "
                "could skip past the 8-neighborhood. Use a coarser zoom."
            )
    n_tiles = 1 << zoom

    ula = F.round(F.col(lat_col) * F.lit(1e6)).cast("long")
    ulo = F.round(F.col(lon_col) * F.lit(1e6)).cast("long")
    keyed = points.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).withColumns({"_ula": ula, "_ulo": ulo})
    reps = keyed.groupBy("_ula", "_ulo", ts_col).agg(
        F.min(id_col).alias("_pos")
    )
    rlat = F.col("_ula").cast("double") / F.lit(1e6)
    rlon = F.col("_ulo").cast("double") / F.lit(1e6)
    tx, ty = C.tile_xy(rlat, rlon, zoom)
    tb = F.expr(f"{ts_col} div {int(eps_t)}")
    reps = reps.select(
        "_pos", "_ula", "_ulo",
        F.col(ts_col).alias("_ts"),
        rlat.alias("_rlat"), rlon.alias("_rlon"),
        tx.alias("_tx"), ty.alias("_ty"), tb.alias("_tb"),
    )

    offs = F.array(
        *[
            F.struct(
                F.lit(dt).alias("dt"),
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit((dt, dx, dy) == (0, 0, 0)).alias("same"),
            )
            for dt, dx, dy in [(0, 0, 0)] + _ST_FWD
        ]
    )
    probe = reps.withColumn("_o", F.explode(offs)).select(
        F.col("_pos").alias("_pa"),
        F.col("_ts").alias("_tsa"),
        F.col("_rlat").alias("_lata"),
        F.col("_rlon").alias("_lona"),
        F.col("_o.same").alias("_same"),
        (F.col("_tb") + F.col("_o.dt")).alias("_nb"),
        F.pmod(F.col("_tx") + F.col("_o.dx"), F.lit(n_tiles)).alias("_nx"),
        (F.col("_ty") + F.col("_o.dy")).alias("_ny"),
    )
    build = reps.select(
        F.col("_pos").alias("_pb"),
        F.col("_ts").alias("_tsb"),
        F.col("_rlat").alias("_latb"),
        F.col("_rlon").alias("_lonb"),
        F.col("_tb").alias("_nb"),
        F.col("_tx").alias("_nx"),
        F.col("_ty").alias("_ny"),
    )
    dist = C.haversine(
        F.col("_lata"), F.col("_lona"), F.col("_latb"), F.col("_lonb")
    )
    dt_ok = F.abs(F.col("_tsa") - F.col("_tsb")) <= F.lit(int(eps_t))
    pair_ok = F.when(F.col("_same"), F.col("_pa") < F.col("_pb")).otherwise(
        F.col("_pa") != F.col("_pb")
    )
    edges = (
        probe.join(build, ["_nb", "_nx", "_ny"])
        .where(pair_ok & dt_ok & (dist <= F.lit(float(eps_m))))
        .select(F.col("_pa").alias("id_a"), F.col("_pb").alias("id_b"))
    )
    comp = connected_components(edges)
    labeled = reps.join(
        comp, F.col("_pos") == F.col("node"), "left"
    ).select(
        "_ula", "_ulo", F.col("_ts").alias(ts_col),
        F.coalesce(F.col("component"), F.col("_pos")).alias("cluster_id"),
    )
    return keyed.join(labeled, ["_ula", "_ulo", ts_col]).drop(
        "_ula", "_ulo"
    )


def st_dbscan_oracle_sql(
    subq: str,
    eps_m: float = 500.0,
    eps_t: int = 3600,
    id_col: str = "event_id",
    ts_col: str = "ts_sec",
    lat: str = "lat",
    lon: str = "lon",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
    select_cols: str = "event_id, user_id",
) -> str:
    """Recursive-CTE twin of :func:`st_dbscan` (grid_dbscan's shape
    plus the time axis): identical space-time rep collapse, 27-address
    closure over the same undirected edge set, min-label fixed
    point."""
    if zoom is None:
        zoom = dbscan_zoom_for_eps(eps_m, max_abs_lat)
    n_tiles = 1 << zoom
    rlat, rlon = "CAST(ula AS DOUBLE) / 1e6", "CAST(ulo AS DOUBLE) / 1e6"
    tx, ty = C.tile_xy_sql(rlat, rlon, zoom)
    hav = C.haversine_sql("a.rlat", "a.rlon", "b.rlat", "b.rlon")
    offs = ", ".join(
        f"({dt}, {dx}, {dy})"
        for dt in (-1, 0, 1)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    return (
        f"WITH RECURSIVE keyed AS (SELECT *, "
        f"CAST(round(({lat}) * 1e6) AS BIGINT) AS ula, "
        f"CAST(round(({lon}) * 1e6) AS BIGINT) AS ulo FROM {subq}), "
        f"reps AS MATERIALIZED (SELECT ula, ulo, {ts_col} AS ts, "
        f"min({id_col}) AS pos, "
        f"{rlat} AS rlat, {rlon} AS rlon, {tx} AS tx, {ty} AS ty, "
        f"{ts_col} // {int(eps_t)} AS tb "
        f"FROM keyed GROUP BY ula, ulo, {ts_col}), "
        f"offsets(dt, dx, dy) AS (VALUES {offs}), "
        "edges0 AS (SELECT a.pos AS u, b.pos AS v FROM "
        "(SELECT r.*, r.tb + o.dt AS nb, "
        f"((r.tx + o.dx) % {n_tiles} + {n_tiles}) % {n_tiles} AS nx, "
        "r.ty + o.dy AS ny FROM reps r CROSS JOIN offsets o) a "
        "JOIN reps b ON a.nb = b.tb AND a.nx = b.tx AND a.ny = b.ty "
        f"AND a.pos < b.pos AND abs(a.ts - b.ts) <= {int(eps_t)} "
        f"AND ({hav}) <= {float(eps_m)!r}), "
        "edges AS MATERIALIZED (SELECT u, v FROM edges0 "
        "UNION SELECT v, u FROM edges0), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "labels AS (SELECT u AS node, least(u, min(v)) AS comp "
        "FROM reach GROUP BY u) "
        f"SELECT {select_cols}, coalesce(l.comp, r.pos) AS cluster_id "
        f"FROM keyed k JOIN reps r ON k.ula = r.ula AND k.ulo = r.ulo "
        f"AND k.{ts_col} = r.ts "
        "LEFT JOIN labels l ON r.pos = l.node"
    )
