"""Inverse-distance-weighted (IDW) spatial interpolation.

The reference library stops at distance primitives (haversine,
distance-to-segment — Geometry.kt distance family); this composes them
into the standard surface-estimation operator (Shepard 1968): each
target location gets the weighted average of nearby sample values with
weights 1/d^p, over the samples inside a search radius.

Scale design: candidates come from :func:`..knn.radius_join_bulk` —
per-target ring explosion sized by its own radius, ONE shuffle
equi-join on the cell key, exact haversine cut — so the pair relation
is radius-bounded, never |targets|×|samples|.  The estimate itself is
a plain groupBy(query_id) aggregation (map-side combinable).

Float determinism (the house mm/fixed-point pattern, trajectory.py):
distances quantize to mm BIGINTs, weights and weighted values to 1e-9
fixed point BEFORE summing — integer sums are order-independent across
partial-aggregate schedules, so the DuckDB twin is hash-identical.
Samples closer than ``near_mm`` (default 1 m) count as coincident with
the target: the estimate is their MIN value (deterministic tie-break),
sidestepping the 1/0 weight and bounding every quantized weight by
1e9 (overflow-safe: 1e6 near-floor samples sum to ~1e17 « 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from ..kernels import geometry as kgeo
from .knn import radius_join_bulk

__all__ = ["idw_interpolate", "idw_oracle_sql"]

_W_SCALE = 1_000_000_000  # 1e-9 fixed point for weights


def _w_expr(dm, power: int):
    # 1/d^p via chained multiplication (pow() is not IEEE-pinned
    # cross-engine; * and / are correctly rounded everywhere)
    acc = dm
    for _ in range(power - 1):
        acc = acc * dm
    return F.lit(1.0) / acc


def idw_interpolate(
    samples: DataFrame,
    targets: DataFrame,
    value_col: str = "val",
    power: int = 2,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_id_col: str = "cell_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    radius_col: str = "radius_m",
    precision: int = 5,
    max_ring: int = 3,
    near_mm: int = 1000,
) -> DataFrame:
    """IDW estimate at every target: (query_id, n_samples, est_r6).

    ``samples`` carries (lat, lon, cell_id, value); ``targets`` is the
    bulk-circle relation (query_id, qlat, qlon, radius_m) — same shape
    and same over-cap exclusion as :func:`..knn.radius_join_bulk`
    (targets whose ring extent exceeds ``max_ring`` produce no row; use
    a coarser ``precision``).  Targets with in-radius samples but whose
    quantized weights all collapse to 0 return NULL est (documented
    underflow guard; with p=2 that needs every sample beyond ~44.7 km,
    where round(1e9/d²) = 0)."""
    if power < 1:
        raise ValueError("power must be a positive integer")
    pairs = radius_join_bulk(
        samples,
        targets,
        lat_col=lat_col,
        lon_col=lon_col,
        cell_id_col=cell_id_col,
        query_id_col=query_id_col,
        qlat_col=qlat_col,
        qlon_col=qlon_col,
        radius_col=radius_col,
        precision=precision,
        max_ring=max_ring,
    )
    d_mm = F.round(F.col("dist_m") * F.lit(1000.0)).cast("long")
    near = d_mm < F.lit(near_mm)
    dm = d_mm.cast("double") / F.lit(1000.0)
    w = _w_expr(dm, power)
    wq = F.round(w * F.lit(float(_W_SCALE))).cast("long")
    wvq = F.round(w * F.col(value_col) * F.lit(float(_W_SCALE))).cast(
        "long"
    )
    zero = F.lit(0).cast("long")
    agg = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.when(near, 1).otherwise(0)).alias("_n_near"),
        F.min(F.when(near, F.col(value_col))).alias("_v_near"),
        F.sum(F.when(near, zero).otherwise(wq)).alias("_sw"),
        F.sum(F.when(near, zero).otherwise(wvq)).alias("_swv"),
    )
    est = F.when(F.col("_n_near") > 0, F.col("_v_near")).when(
        F.col("_sw") > 0,
        F.col("_swv").cast("double") / F.col("_sw").cast("double"),
    )
    return agg.select(
        "query_id", "n_samples", F.round(est, 6).alias("est_r6")
    )


def idw_oracle_sql(
    samples_subq: str,
    targets_subq: str,
    value_expr: str = "val",
    power: int = 2,
    precision: int = 5,
    max_ring: int = 3,
    near_mm: int = 1000,
) -> str:
    """DuckDB twin: identical ring membership (Chebyshev index distance
    with longitude wrap, per-target extent from its own radius — the
    radius_join_bulk oracle shape), identical mm/1e-9 quantization and
    integer sums, same scalar op order.

    ``samples_subq`` exposes (id, lat, lon, <value_expr>);
    ``targets_subq`` exposes (query_id, qlat, qlon, radius_m)."""
    deg_m = kgeo.DEGREE_LATITUDE_METERS
    lat_bits, lon_bits = C.cell_bits(precision)
    n_lon = 1 << lon_bits
    height_m = (180.0 / (1 << lat_bits)) * deg_m
    ia = C.cell_index_sql("lat", -90.0, 180.0, lat_bits)
    io = C.cell_index_sql("lon", -180.0, 360.0, lon_bits)
    qia = C.cell_index_sql("qlat", -90.0, 180.0, lat_bits)
    qio = C.cell_index_sql("qlon", -180.0, 360.0, lon_bits)
    worst_lat = f"least(90.0, abs(qlat) + radius_m / {deg_m!r})"
    width = f"({360.0 / n_lon * deg_m!r} * cos(radians({worst_lat})))"
    raw_ext = f"ceil(radius_m / least({height_m!r}, {width}))"
    hav = C.haversine_sql("p.lat", "p.lon", "q.qlat", "q.qlon")
    dm_chain = " * ".join(["dm"] * power)
    return (
        f"WITH pts AS (SELECT lat, lon, {value_expr} AS v, "
        f"{ia} AS ia, {io} AS io FROM {samples_subq}), "
        f"qs AS (SELECT query_id, qlat, qlon, radius_m, "
        f"{qia} AS qia, {qio} AS qio, CAST({raw_ext} AS INT) AS ext "
        f"FROM {targets_subq} WHERE {raw_ext} <= {max_ring}), "
        "pairs AS (SELECT q.query_id, p.v, "
        f"CAST(round(({hav}) * 1000.0) AS BIGINT) AS d_mm "
        "FROM qs q JOIN pts p ON abs(p.ia - q.qia) <= q.ext "
        f"AND least((p.io - q.qio + {n_lon}) % {n_lon}, "
        f"(q.qio - p.io + {n_lon}) % {n_lon}) <= q.ext "
        f"WHERE {hav} <= q.radius_m), "
        "wpairs AS (SELECT query_id, v, "
        f"d_mm < {near_mm} AS near, "
        "CAST(d_mm AS DOUBLE) / 1000.0 AS dm FROM pairs), "
        "agg AS (SELECT query_id, count(*) AS n_samples, "
        "sum(CASE WHEN near THEN 1 ELSE 0 END) AS n_near, "
        "min(CASE WHEN near THEN v END) AS v_near, "
        f"sum(CASE WHEN near THEN 0 ELSE CAST(round(1.0 / ({dm_chain}) "
        f"* {float(_W_SCALE)!r}) AS BIGINT) END) AS sw, "
        f"sum(CASE WHEN near THEN 0 ELSE CAST(round(1.0 / ({dm_chain}) "
        f"* v * {float(_W_SCALE)!r}) AS BIGINT) END) AS swv "
        "FROM wpairs GROUP BY query_id) "
        "SELECT query_id, n_samples, "
        "round(CASE WHEN n_near > 0 THEN v_near WHEN sw > 0 THEN "
        "CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) END, 6) AS est_r6 "
        "FROM agg"
    )
