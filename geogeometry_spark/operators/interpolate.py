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

__all__ = ["idw_interpolate", "idw_oracle_sql", "trend_surface", "trend_surface_oracle_sql"]

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


def trend_surface(
    points: DataFrame,
    value_col: str,
    ref_lat: float,
    ref_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """First-order trend surface z = a + b*x + c*y by least squares
    (Unwin 1975; the classic "regional trend vs local residual" split
    in geostatistics) — the global-polynomial companion to the local
    :func:`idw_interpolate`: ONE pass of exact moment sums, a 3x3
    normal-equation solve, and the goodness-of-fit R^2.

    Coordinates enter as INTEGER millidegree offsets from the caller's
    reference point (round((lon - ref_lon) * 1000), ~111 m grain —
    plenty for a first-order trend, and what keeps every moment an
    exact BIGINT); ``value_col`` must be integral (pre-quantize
    continuous measurements upstream, the variogram rule).  All nine
    moments (n, Sx, Sy, Sz, Sxx, Sxy, Syy, Sxz, Syz + Szz for R^2)
    are map-side-combinable BIGINT sums — no float ever shuffles.
    Overflow bound: |x|,|y| <= ~200,000 (a +/-200 deg window) and
    |z| <= 10^6 keep Sxx and the cross sums under 2^63 past 10^8
    points; wider windows or values need a coarser offset unit.

    The solve happens ONCE driver-side: the BIGINT moments cast to
    IEEE doubles (same nearest-even rounding in both engines) and run
    a pinned Cramer's-rule expression mirrored literally by the twin;
    SSE folds algebraically (SSE = Szz - a*Sz - b*Sxz - c*Syz) so no
    second data pass is needed.

    Returns one row: (n, a_r6, b_r6, c_r6, r2_r6) — slope units are
    value per millidegree; NULLs when the system is singular (det = 0:
    fewer than 3 non-collinear sites) or variance is zero."""
    x = F.round((F.col(lon_col) - F.lit(float(ref_lon))) * 1000).cast("long")
    y = F.round((F.col(lat_col) - F.lit(float(ref_lat))) * 1000).cast("long")
    z = F.col(value_col).cast("long")
    keyed = points.where(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(x.alias("_x"), y.alias("_y"), z.alias("_z"))
    # try_multiply/try_sum: overflow yields NULL in BOTH ANSI and
    # legacy mode, so the one-pass aggregate always completes and the
    # guard below raises a uniform, actionable error instead of either
    # an ANSI ArithmeticException mid-job or a silent legacy wrap.
    tm = F.try_multiply
    row = keyed.agg(
        F.count(F.lit(1)),
        F.sum("_x"), F.sum("_y"), F.sum("_z"),
        F.try_sum(tm(F.col("_x"), F.col("_x"))),
        F.try_sum(tm(F.col("_x"), F.col("_y"))),
        F.try_sum(tm(F.col("_y"), F.col("_y"))),
        F.try_sum(tm(F.col("_x"), F.col("_z"))),
        F.try_sum(tm(F.col("_y"), F.col("_z"))),
        F.try_sum(tm(F.col("_z"), F.col("_z"))),
        F.max(F.abs(F.col("_x"))),
        F.max(F.abs(F.col("_y"))),
        F.max(F.abs(F.col("_z"))),
    ).first()
    # Guard the documented overflow bound (the segregation_indices
    # pattern): past it the BIGINT moments would wrap silently in Spark
    # while the DuckDB twin sums to HUGEINT — a silent cross-engine
    # divergence.  Raise instead; the extra maxes ride the same one-pass
    # aggregate, no second scan.
    mx, my, mz = (int(row[i] or 0) for i in (10, 11, 12))
    n = int(row[0])
    if mx > 200_000 or my > 200_000 or mz > 1_000_000 or (
        n > 0 and any(row[i] is None for i in range(4, 10))
    ):
        raise ValueError(
            "trend_surface: coordinate/value bounds exceeded "
            f"(max |x|={mx}, |y|={my} millideg offsets, |z|={mz}; "
            "documented bounds are 200000/200000/1000000) — BIGINT "
            "moments would overflow. Use a coarser offset unit or "
            "pre-scale the value column."
        )
    sx, sy, sz = (float(row[i] or 0) for i in (1, 2, 3))
    sxx, sxy, syy = (float(row[i] or 0) for i in (4, 5, 6))
    sxz, syz, szz = (float(row[i] or 0) for i in (7, 8, 9))
    nf = float(n)
    a = b = c = r2 = None
    if n >= 3:
        # pinned Cramer's rule on the normal matrix
        # [[n, Sx, Sy], [Sx, Sxx, Sxy], [Sy, Sxy, Syy]] — the twin
        # mirrors this exact expression order
        det = (
            nf * (sxx * syy - sxy * sxy)
            - sx * (sx * syy - sxy * sy)
            + sy * (sx * sxy - sxx * sy)
        )
        if det != 0.0:
            det_a = (
                sz * (sxx * syy - sxy * sxy)
                - sx * (sxz * syy - sxy * syz)
                + sy * (sxz * sxy - sxx * syz)
            )
            det_b = (
                nf * (sxz * syy - sxy * syz)
                - sz * (sx * syy - sxy * sy)
                + sy * (sx * syz - sxz * sy)
            )
            det_c = (
                nf * (sxx * syz - sxz * sxy)
                - sx * (sx * syz - sxz * sy)
                + sz * (sx * sxy - sxx * sy)
            )
            a = det_a / det
            b = det_b / det
            c = det_c / det
            sst = szz - (sz * sz) / nf
            if sst > 0:
                sse = szz - a * sz - b * sxz - c * syz
                r2 = 1.0 - sse / sst
    spark = points.sparkSession
    rnd = lambda v: F.round(F.lit(v).cast("double"), 6)  # noqa: E731
    return spark.range(1).select(
        F.lit(n).alias("n"),
        rnd(a).alias("a_r6"),
        rnd(b).alias("b_r6"),
        rnd(c).alias("c_r6"),
        rnd(r2).alias("r2_r6"),
    )


def trend_surface_oracle_sql(
    subq: str,
    value_sql: str,
    ref_lat: float,
    ref_lon: float,
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`trend_surface`: the same exact BIGINT
    moments, the same BIGINT->DOUBLE casts, and literally the same
    Cramer expression order."""
    return (
        f"WITH keyed AS (SELECT "
        f"CAST(round(({lon} - {float(ref_lon)!r}) * 1000) AS BIGINT) AS x, "
        f"CAST(round(({lat} - {float(ref_lat)!r}) * 1000) AS BIGINT) AS y, "
        f"CAST(({value_sql}) AS BIGINT) AS z FROM {subq} "
        f"WHERE {lat} IS NOT NULL AND {lon} IS NOT NULL "
        f"AND ({value_sql}) IS NOT NULL), "
        "m AS (SELECT count(*) AS n, "
        "CAST(coalesce(sum(x), 0) AS DOUBLE) AS sx, "
        "CAST(coalesce(sum(y), 0) AS DOUBLE) AS sy, "
        "CAST(coalesce(sum(z), 0) AS DOUBLE) AS sz, "
        "CAST(coalesce(sum(x * x), 0) AS DOUBLE) AS sxx, "
        "CAST(coalesce(sum(x * y), 0) AS DOUBLE) AS sxy, "
        "CAST(coalesce(sum(y * y), 0) AS DOUBLE) AS syy, "
        "CAST(coalesce(sum(x * z), 0) AS DOUBLE) AS sxz, "
        "CAST(coalesce(sum(y * z), 0) AS DOUBLE) AS syz, "
        "CAST(coalesce(sum(z * z), 0) AS DOUBLE) AS szz FROM keyed), "
        "s AS (SELECT m.*, CAST(n AS DOUBLE) AS nf, "
        "CAST(n AS DOUBLE) * (sxx * syy - sxy * sxy) "
        "- sx * (sx * syy - sxy * sy) "
        "+ sy * (sx * sxy - sxx * sy) AS det FROM m), "
        "sol AS (SELECT s.*, "
        "CASE WHEN n >= 3 AND det <> 0 THEN "
        "(sz * (sxx * syy - sxy * sxy) - sx * (sxz * syy - sxy * syz) "
        "+ sy * (sxz * sxy - sxx * syz)) / det END AS a, "
        "CASE WHEN n >= 3 AND det <> 0 THEN "
        "(nf * (sxz * syy - sxy * syz) - sz * (sx * syy - sxy * sy) "
        "+ sy * (sx * syz - sxz * sy)) / det END AS b, "
        "CASE WHEN n >= 3 AND det <> 0 THEN "
        "(nf * (sxx * syz - sxz * sxy) - sx * (sx * syz - sxz * sy) "
        "+ sz * (sx * sxy - sxx * sy)) / det END AS c FROM s) "
        "SELECT n, round(a, 6) AS a_r6, round(b, 6) AS b_r6, "
        "round(c, 6) AS c_r6, "
        "CASE WHEN a IS NOT NULL AND szz - (sz * sz) / nf > 0 THEN "
        "round(1.0 - (szz - a * sz - b * sxz - c * syz) / "
        "(szz - (sz * sz) / nf), 6) END AS r2_r6 FROM sol"
    )
