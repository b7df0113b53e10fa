"""Hexgrid k-ring join operators: radius join, bulk radius join, kNN,
multi-resolution heatmap.

BASELINE.json north_star names "kNN queries resolved via H3 k-ring
candidate generation plus exact haversine re-rank" — these operators
deliver exactly that composition on the hexgrid index
(kernels/hexgrid.py), the engine's hex twin of the geohash
(operators/knn.py) and S2 (operators/s2_join.py) join families:

1. candidate generation = gridDisk(query cell, k) with k sized by the
   PROVABLE covering bound (hexgrid.k_for_radius: two circumradius
   hops + minimal center separation 1.5*s per hex step), never a
   heuristic — a missed candidate is an oracle mismatch, so recall is
   contract-tested, not hoped for;
2. candidates equi-join points on the native-Column cell id
   (functions/hexcell.py — sin + fixed-order arithmetic, zero Python);
3. exact native haversine re-rank / filter.

Scale notes (the 100 TB story, same as the geohash/S2 twins): the big
points side is never shuffled — bulk joins explode the SMALL query
side into (query, cell) candidates (3k(k+1)+1 rows per query, k
per-query from its own latitude + radius) and equi-join; the explode
is two nested ``sequence()`` explodes (the axial disk loop), all
JVM-side.  Near-polar queries are not silently under-covered: with an
explicit ``res`` they are excluded (count-observable, the geohash
radius_join_bulk policy, knn.py:268), with auto-res the resolution is
chosen so the WORST query latitude still fits ``max_k`` rings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C
from ..functions import hexcell as HX
from ..kernels import geometry as kgeo
from ..kernels import hexgrid as hg


def _points_with_cell(
    points: DataFrame, lat_col: str, lon_col: str, res: int, cell_col: str | None
) -> tuple[DataFrame, F.Column]:
    """Points keyed by hex cell: reuse an EXPLICIT precomputed column
    (caller names it — no auto-detection, per the s2_join s2_30 advice)
    or compute via the Arrow kernel UDF.

    The UDF, not the native Column, on purpose: under a join the
    optimizer inlines the native encode into the join-side Project
    with every subtree duplicated (~30 SIN per row) and no
    cross-operator CSE — measured 8.5 s vs 1.9 s at 125M join output
    rows on the bench fixture.  The UDF materializes the key as an
    attribute so the join stage stays lean (the s2_cell_udf
    precedent; see functions/udfs.py hex_cell_udf)."""
    if cell_col is not None:
        return points, F.col(cell_col)
    from ..functions.udfs import hex_cell_udf

    return points, hex_cell_udf(res)(F.col(lat_col), F.col(lon_col))


def _require_res_with_cell_col(res, cell_col) -> None:
    """Ids embed their resolution in the top bits, so a precomputed
    column at a different res than the probe side joins to NOTHING —
    silently empty results (the s2_30 stale-column advice, one class
    worse).  Auto-res + cell_col is therefore rejected outright."""
    if cell_col is not None and res is None:
        raise ValueError(
            "cell_col requires an explicit res matching the stored "
            "column (auto-res could silently pick a different one and "
            "the join would return no rows)"
        )


def hex_radius_join(
    points: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    res: int | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
) -> DataFrame:
    """All points within ``radius_m`` of ONE driver-side center.

    The gridDisk cell ids are computed on the driver (kernel) and
    pushed as an IN-list on the native cell id — a scan-level filter
    (no join, no shuffle of the points side), then the exact haversine
    keeps true matches.  ``res=None`` auto-picks the finest resolution
    with <= 8 rings (hexgrid.res_for_radius)."""
    _require_res_with_cell_col(res, cell_col)
    if res is None:
        res = hg.res_for_radius(center_lat, radius_m)
    k = hg.k_for_radius(center_lat, radius_m, res)
    center_cell = hg.encode_cell_scalar(center_lat, center_lon, res)
    disk = hg.grid_disk(center_cell, k)
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.lit(center_lat), F.lit(center_lon)
    )
    return (
        pts.where(cell.isin(disk))
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.lit(radius_m))
    )


def _rho_col(qlat: F.Column, radius: F.Column) -> F.Column:
    """Projected covering radius for a ground circle — the ONE shared
    form of hexgrid.k_for_radius's bound (band selection and ring
    sizing both call this; a tweak to the pole clamp or scale must
    move both together or the covering guarantee desynchronizes)."""
    phi_max = F.least(
        F.lit(89.999999), F.abs(qlat) + radius / F.lit(hg.M_PER_DEG)
    )
    scale = F.lit(hg.M_PER_DEG) * F.cos(phi_max * F.lit(hg.RAD))
    return radius / scale


def _k_col(qlat: F.Column, radius: F.Column, res: int) -> F.Column:
    """Native-Column twin of hexgrid.k_for_radius (same formula; any
    k >= the kernel's k keeps the covering guarantee)."""
    s = hg.size(res)
    rho = _rho_col(qlat, radius)
    k = F.ceil((rho + F.lit(2.0 * s)) / F.lit(1.5 * s)).cast("int")
    return F.greatest(F.lit(1), k)


def hex_radius_join_bulk(
    points: DataFrame,
    queries: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    radius_col: str = "radius_m",
    res: int | None = None,
    max_k: int = 12,
    target_k: int = 6,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Radius join for a DATAFRAME of circles — the hexgrid twin of
    knn.radius_join_bulk.  Each query explodes its own gridDisk (two
    nested ``sequence`` explodes over the axial loop, k per-row from
    the query's latitude + radius), candidates equi-join points on the
    cell id, exact haversine filters.

    ``res=None`` groups queries into PER-RESOLUTION BANDS: each query
    natively computes the finest res whose ring count lands near
    ``target_k`` (s >= rho / (1.5*target_k - 2), one log2), the
    bounded distinct-res set (<= 21 values, 2-3 in practice) comes
    back to the driver, and one equi-join runs per band, unioned.  A
    single global res sized by the WORST query latitude was measured
    3x slower on the skewed bench fixture: near-polar outliers forced
    ~5.6 km cells onto 2 km equatorial queries (~40x area
    over-coverage feeding the join); banding keeps every query's
    covered area within ~2-3x of its true disk while the query-side
    explode stays 3k(k+1)+1-bounded.  No earthly query is dropped
    (k <= target_k holds by construction per band; only
    polar-degenerate circles whose required res-0 rho exceeds ~208
    projected units — |lat| -> 90 with cos -> 0 — fall out, the same
    count-observable exclusion as below).  With an
    explicit ``res``, queries needing k > max_k are excluded
    (count-observable, the documented geohash-bulk policy) rather
    than under-served.

    ``broadcast_queries=None`` AUTO-decides with a bounded probe
    (limit(N+1).count(), the ann_join policy, similarity.py:632): the
    exploded candidate relation is per-query-bounded by 3k(k+1)+1 so
    query count is the only unknown."""
    _require_res_with_cell_col(res, cell_col)
    if res is None:
        if broadcast_queries is None:
            cap = 100_000
            broadcast_queries = queries.limit(cap + 1).count() <= cap
        rho = _rho_col(F.col(qlat_col), F.col(radius_col))
        s_needed = rho / F.lit(1.5 * target_k - 2.0)
        s0 = hg.size(0)
        rcol = F.greatest(
            F.lit(0),
            F.least(
                F.lit(hg.MAX_RES),
                F.floor(F.log2(F.lit(s0) / s_needed) - F.lit(1e-9)).cast(
                    "int"
                ),
            ),
        )
        tagged = queries.withColumn("_hexres", rcol)
        bands = sorted(
            r["_hexres"]
            for r in tagged.select("_hexres").distinct().collect()
        )
        if not bands:
            bands = [hg.MAX_RES]  # empty query relation: typed empty out
        parts = [
            hex_radius_join_bulk(
                points,
                tagged.where(F.col("_hexres") == b).drop("_hexres"),
                lat_col=lat_col,
                lon_col=lon_col,
                cell_col=cell_col,
                query_id_col=query_id_col,
                qlat_col=qlat_col,
                qlon_col=qlon_col,
                radius_col=radius_col,
                res=int(b),
                max_k=max_k,
                broadcast_queries=broadcast_queries,
            )
            for b in bands
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    n = hg.ncols(res)
    kcol = _k_col(F.col(qlat_col), F.col(radius_col), res)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qlat_col).alias("_qlat"),
        F.col(qlon_col).alias("_qlon"),
        F.col(radius_col).alias("_radius"),
        kcol.alias("_k"),
        HX.hex_cell(F.col(qlat_col), F.col(qlon_col), res).alias("_qcell"),
    ).where(F.col("_k") <= F.lit(max_k))
    q = q.select(
        "*",
        F.explode(F.sequence(-F.col("_k"), F.col("_k"))).alias("_dq"),
    )
    q = q.select(
        "*",
        F.explode(
            F.sequence(
                F.greatest(-F.col("_k"), (-F.col("_dq")) - F.col("_k")),
                F.least(F.col("_k"), (-F.col("_dq")) + F.col("_k")),
            )
        ).alias("_dr"),
    )
    nl = F.lit(n).cast("long")
    cq = ((HX.hex_q(F.col("_qcell")) + F.col("_dq")) % nl + nl) % nl
    cr = HX.hex_r(F.col("_qcell")) + F.col("_dr")
    cand = q.select(
        "query_id",
        "_qlat",
        "_qlon",
        "_radius",
        HX.hex_pack(res, cq, cr).alias("_ccell"),
    ).dropDuplicates(["query_id", "_ccell"])
    # the dedup is load-bearing when 2k+1 > ncols(res) (coarse res +
    # huge radius): distinct (dq, dr) offsets wrap onto the same cell
    # and would otherwise duplicate every matching (query, point) pair
    if broadcast_queries is None:
        cap = 100_000
        broadcast_queries = queries.limit(cap + 1).count() <= cap
    if broadcast_queries:
        cand = F.broadcast(cand)
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.col("_qlat"), F.col("_qlon")
    )
    return (
        pts.withColumn("_pcell", cell)
        .join(cand, F.col("_pcell") == F.col("_ccell"), "inner")
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.col("_radius"))
        .drop("_pcell", "_ccell", "_qlat", "_qlon", "_radius")
    )


def hex_knn(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    res: int = 7,
    max_ring: int = 128,
) -> DataFrame:
    """k nearest points per query via hex k-ring expansion + exact
    haversine re-rank — the north star's "H3 k-ring" kNN, structured
    exactly like the geohash knn (knn.py:75): ALL pending queries run
    in one pass per ring radius (one broadcast candidate relation, one
    equi-join, one window top-k), and a query is certified done when
    its kth candidate distance <= hexgrid.covered_ground_radius_m
    (provable stop bound) — otherwise it retries with a doubled ring.
    Interactive path: collects k x pending rows per round; pass a
    cached ``points`` when multiple rounds are expected.  Ring counts
    double up to ``max_ring`` (disk(128) is ~49.5k broadcast rows per
    still-pending query — fine interactively); for SPARSE data where
    the kth neighbor is far, prefer a coarser ``res`` over a huge
    ring so candidates stay bounded."""
    spark = points.sparkSession
    id_col = points.columns[0]
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    pts = pts.withColumn("_pcell", cell)

    meta = {
        qid: (qlat, qlon, hg.encode_cell_scalar(qlat, qlon, res))
        for qid, qlat, qlon in queries
    }
    answers: dict[str, list] = {}
    pending = list(queries)
    ring = 2
    while pending and ring <= max_ring:
        rel = []
        for qid, qlat, qlon in pending:
            for c in hg.grid_disk(meta[qid][2], ring):
                rel.append((qid, qlat, qlon, c))
        cells = spark.createDataFrame(
            rel, "query_id string, _qlat double, _qlon double, _ccell long"
        )
        dist = C.haversine(
            F.col(lat_col), F.col(lon_col), F.col("_qlat"), F.col("_qlon")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist_m").asc(), F.col(id_col).asc()
        )
        got = (
            pts.join(F.broadcast(cells), F.col("_pcell") == F.col("_ccell"))
            .withColumn("dist_m", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", id_col, lat_col, lon_col, "dist_m")
            .collect()
        )
        by_q: dict[str, list] = {}
        for row in got:
            by_q.setdefault(row["query_id"], []).append(row)
        nxt = []
        for qid, qlat, qlon in pending:
            rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
            bound = hg.covered_ground_radius_m(qlat, ring, res)
            if len(rows) == k and rows[-1]["dist_m"] <= bound:
                answers[qid] = rows
            else:
                nxt.append((qid, qlat, qlon))
        pending = nxt
        if ring >= max_ring:
            break
        ring = min(ring * 2, max_ring)  # land ON max_ring, not past it
    if pending:
        raise ValueError(
            f"hex_knn: {len(pending)} queries unresolved at max_ring="
            f"{max_ring}; use a coarser res or raise max_ring"
        )
    out = [tuple(r) for rows in answers.values() for r in rows]
    id_type = points.schema[id_col].dataType.simpleString()
    schema = (
        f"query_id string, rank int, {id_col} {id_type}, "
        f"{lat_col} double, {lon_col} double, dist_m double"
    )
    return spark.createDataFrame(out, schema)


def hex_heatmap(
    points: DataFrame,
    resolutions: list[int],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-cell point counts at each resolution, with center
    coordinates for rendering.  Each resolution is an INDEPENDENT
    native encode + partial-agg groupBy (cheaper and exact vs an
    approximate parent-chain rollup: hex parents only approximately
    contain children, so re-encoding per res is the correct pyramid
    — the s2_heatmap precedent applies only to true prefix
    hierarchies)."""
    outs = []
    for res in resolutions:
        cell = HX.hex_cell(F.col(lat_col), F.col(lon_col), res)
        agg = (
            points.select(cell.alias("hex_id"))
            .groupBy("hex_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        clat, clon = HX.hex_center_latlon(F.col("hex_id"), res)
        outs.append(
            agg.select(
                F.lit(res).alias("res"),
                "hex_id",
                "n",
                F.round(clat, 6).alias("center_lat"),
                F.round(clon, 6).alias("center_lon"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def write_hex_sorted(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    res: int = 12,
    partition_res: int = 3,
) -> None:
    """Persist hexgrid-clustered parquet: the hex twin of
    ``write_s2_sorted`` (s2_join.py) / ``write_cell_sorted``
    (prefix_scan.py).

    Layout: directory partition = the row's cell at ``partition_res``
    (a DIRECT coarse encode of the same point — no parent-chain
    needed, so a reader derives the exact partition set for any query
    disk from the same covering bound it uses for cells); rows sorted
    by the fine cell id within files.  Ids at one resolution order by
    (r, q) — latitude-row-major — so a query disk's rows cluster into
    few row groups and parquet min/max skipping prunes the rest."""
    fine = HX.hex_cell(F.col(lat_col), F.col(lon_col), res)
    part = HX.hex_cell(F.col(lat_col), F.col(lon_col), partition_res)
    (
        df.withColumn("hex_id", fine)
        .withColumn("hex_part", part)
        .repartition(F.col("hex_part"))
        .sortWithinPartitions("hex_id")
        .write.mode("overwrite")
        .partitionBy("hex_part")
        .parquet(path)
    )


def hex_radius_join_stored(
    points: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    res: int = 12,
    partition_res: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str = "hex_id",
    part_col: str = "hex_part",
) -> DataFrame:
    """:func:`hex_radius_join` over a :func:`write_hex_sorted` table:
    the gridDisk at ``partition_res`` becomes a PartitionFilters
    IN-list (directories never opened), the fine disk an ordinary
    pushed IN-filter over the sorted cell column (row-group skipping),
    then the exact haversine.  Columns are EXPLICIT parameters — no
    auto-detection of stale cell columns (the s2_30 advice)."""
    part_center = hg.encode_cell_scalar(center_lat, center_lon, partition_res)
    pk = hg.k_for_radius(center_lat, radius_m, partition_res)
    part_cells = hg.grid_disk(part_center, pk)
    k = hg.k_for_radius(center_lat, radius_m, res)
    disk = hg.grid_disk(hg.encode_cell_scalar(center_lat, center_lon, res), k)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.lit(center_lat), F.lit(center_lon)
    )
    return (
        points.where(F.col(part_col).isin(part_cells))
        .where(F.col(cell_col).isin(disk))
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.lit(radius_m))
    )


def hex_pip_join(
    points: DataFrame,
    polygons: dict[str, list] | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    res: int | None = None,
    max_cells: int = 2048,
) -> DataFrame:
    """Point-in-polygon broadcast join through the hexgrid index — the
    hex twin of pip_join (geohash) / s2_pip_join, same plan shape:

    1. driver: hex covering per polygon (hexgrid.hex_cover_with_borders
       — bbox-conservative interior/border classification, holes
       demote);
    2. broadcast (polygon_id, cell, is_border) at ONE global res —
       hex children only approximately tile their parent, so there is
       no per-polygon-length normalization like the geohash expand;
       cover_res_for_rings picks the finest res every polygon's
       candidate grid affords (small polygons in mixed-scale sets
       classify as border and fall through to the exact check —
       correctness never depends on res);
    3. points keyed by the Arrow kernel cell (hot-path posture of
       _points_with_cell), ONE broadcast hash equi-join;
    4. interior-cell rows match with no Python; border-cell rows run
       the exact hole-aware ray-cast pandas UDF — the same exactness
       contract as the other two families, so all three share the PIP
       oracle.
    """
    from ..fixtures import polygons_np
    from ..functions.udfs import make_pip_udf

    _require_res_with_cell_col(res, cell_col)
    spark = points.sparkSession
    polys = polygons_np(polygons)
    rings_list = [
        [np.asarray(r, dtype=np.float64) for r in rings]
        for rings in polys.values()
    ]
    if res is None:
        res = hg.cover_res_for_rings(rings_list, max_cells=max_cells)
    rows = []
    for pid, rings in polys.items():
        rr = [np.asarray(r, dtype=np.float64) for r in rings]
        interior, border = hg.hex_cover_with_borders(rr, res)
        rows.extend((pid, c, False) for c in interior)
        rows.extend((pid, c, True) for c in border)
    cells = spark.createDataFrame(
        rows, "polygon_id string, _ccell long, is_border boolean"
    )
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    pip = make_pip_udf(polys)
    return (
        pts.withColumn("_pcell", cell)
        .join(F.broadcast(cells), F.col("_pcell") == F.col("_ccell"), "inner")
        .where(
            (~F.col("is_border"))
            | pip(F.col("polygon_id"), F.col(lat_col), F.col(lon_col))
        )
        .drop("_pcell", "_ccell", "is_border")
    )


def hex_knn_bulk(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    res: int = 7,
    ring: int = 2,
) -> DataFrame:
    """kNN for a DATAFRAME of queries through the hex index — the
    millions-of-queries twin of :func:`hex_knn` (which drives an
    interactive loop), mirroring knn.knn_bulk's shape: each query
    explodes its fixed gridDisk(ring) (two nested ``sequence``
    explodes), candidates equi-join points on the cell id (Arrow
    kernel key on the big side), native haversine, window top-k PER
    QUERY (partitionBy(query_id), never a global sort).

    Fixed rings make the margin approximate: the ``guaranteed`` column
    is true when the kth candidate is provably exact (closer than the
    native lower bound rho*M_PER_DEG*cos(phi_max), the pre-pole form
    of hexgrid.covered_ground_radius_m — conservative, degenerating to
    false near the poles); callers re-run false rows through
    :func:`hex_knn`, which certifies with the pole-safe bound."""
    n = hg.ncols(res)
    s = hg.size(res)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qlat_col).alias("_qlat"),
        F.col(qlon_col).alias("_qlon"),
        HX.hex_cell(F.col(qlat_col), F.col(qlon_col), res).alias("_qcell"),
    )
    q = q.select(
        "*", F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("_dq")
    )
    q = q.select(
        "*",
        F.explode(
            F.sequence(
                F.greatest(F.lit(-ring), (-F.col("_dq")) - F.lit(ring)),
                F.least(F.lit(ring), (-F.col("_dq")) + F.lit(ring)),
            )
        ).alias("_dr"),
    )
    nl = F.lit(n).cast("long")
    cq = ((HX.hex_q(F.col("_qcell")) + F.col("_dq")) % nl + nl) % nl
    cr = HX.hex_r(F.col("_qcell")) + F.col("_dr")
    cand = q.select(
        "query_id", "_qlat", "_qlon", HX.hex_pack(res, cq, cr).alias("_ccell")
    ).dropDuplicates(["query_id", "_ccell"])  # wrap collisions, see bulk
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.col("_qlat"), F.col("_qlon")
    )
    id_col = points.columns[0]
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col(id_col).asc()
    )
    rho = 1.5 * ring * s - 2.0 * s
    sin_max = F.least(
        F.lit(1.0),
        F.abs(F.sin(F.col("_qlat") * F.lit(hg.RAD))) + F.lit(rho / hg.Y_SCALE),
    )
    bound = (
        F.lit(rho * hg.M_PER_DEG)
        * F.sqrt(F.lit(1.0) - sin_max * sin_max)
    )
    return (
        pts.withColumn("_pcell", cell)
        .join(cand, F.col("_pcell") == F.col("_ccell"), "inner")
        .withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .withColumn("guaranteed", F.col("dist_m") <= bound)
        .drop("_pcell", "_ccell", "_qlat", "_qlon")
    )


def hex_pip_semi_anti(
    points: DataFrame,
    how: str,
    polygons: dict[str, list] | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    res: int | None = None,
    max_cells: int = 2048,
) -> DataFrame:
    """One-pass semi/anti PIP through the hex index — the hex twin of
    pip_join(how='left_semi'/'left_anti') (pip_join.py:120): the
    driver-side cell relation is PRE-GROUPED by cell so every point
    meets AT MOST ONE broadcast row (the join cannot duplicate — no
    distinct(), no second scan of the big side); matched = some
    polygon holds the whole cell (interior_any) OR some border polygon
    contains the exact point (pandas UDF over the short border-pid
    list)."""
    from ..fixtures import polygons_np
    from ..functions.udfs import make_pip_any_udf

    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"unsupported how={how!r}")
    _require_res_with_cell_col(res, cell_col)
    spark = points.sparkSession
    polys = polygons_np(polygons)
    rings_list = [
        [np.asarray(r, dtype=np.float64) for r in rings]
        for rings in polys.values()
    ]
    if res is None:
        res = hg.cover_res_for_rings(rings_list, max_cells=max_cells)
    by_key: dict[int, tuple[bool, set[str]]] = {}
    for pid, rings in polys.items():
        rr = [np.asarray(r, dtype=np.float64) for r in rings]
        interior, border = hg.hex_cover_with_borders(rr, res)
        for c in interior:
            ia, b = by_key.setdefault(c, (False, set()))
            by_key[c] = (True, b)
        for c in border:
            ia, b = by_key.setdefault(c, (False, set()))
            b.add(pid)
            by_key[c] = (ia, b)
    grouped = [
        (k, interior, sorted(border) if not interior else [])
        for k, (interior, border) in by_key.items()
    ]
    cells_g = spark.createDataFrame(
        grouped, "_ccell long, interior_any boolean, border_pids array<string>"
    )
    pts, cell = _points_with_cell(points, lat_col, lon_col, res, cell_col)
    pip_any = make_pip_any_udf(polys)
    matched = F.coalesce(
        F.col("interior_any")
        | pip_any(F.col("border_pids"), F.col(lat_col), F.col(lon_col)),
        F.lit(False),
    )
    joined = pts.withColumn("_pcell", cell).join(
        F.broadcast(cells_g), F.col("_pcell") == F.col("_ccell"), "left"
    )
    keep = matched if how == "left_semi" else ~matched
    return joined.where(keep).select(*points.columns)
