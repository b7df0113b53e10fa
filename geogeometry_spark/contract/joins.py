"""Contract queries: bbox filters, PIP joins (broadcast/big/semi/anti), radius joins, kNN, IDW, and the segment-crossing join.

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# --------------------------------------------------------------------------
# §2.2 / §2.8 filters and joins
# --------------------------------------------------------------------------

def q_bbox_filter(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    return df.where(
        C.bbox_contains(F.col("lat"), F.col("lon"), 170.0, -30.0, -170.0, 30.0)
    ).select("doc_id", "lat", "lon")


O_BBOX = (
    f"SELECT doc_id, lat, lon FROM {_COORD_SUBQ} WHERE "
    + C.bbox_contains_sql("lat", "lon", 170.0, -30.0, -170.0, 30.0)
)


def q_pip_join(spark, sf_dir):
    df = _with_cell(_docs_coords(spark, sf_dir))
    return pip_join(df, max_length=6).select("doc_id", "polygon_id")


def q_pip_join_big(spark, sf_dir):
    """PIP join where the polygons are a RELATION, not a broadcast dict
    (operators.pip_join.pip_join_distributed): distributed covering via
    mapInPandas, shuffle equi-join on the cell key, border re-check
    joining each row's own rings — the 10^5+-polygon path.  Same answer
    as pip_join on the fixture set, so it shares the pip oracle."""
    from ..operators.pip_join import pip_join_distributed, polygons_as_df

    df = _with_cell(_docs_coords(spark, sf_dir))
    polys = polygons_as_df(spark)
    return pip_join_distributed(df, polys, cell_length=6).select(
        "doc_id", "polygon_id"
    )


def _pip_oracle() -> str:
    selects = [
        f"SELECT doc_id, '{pid}' AS polygon_id FROM {_COORD_SUBQ} "
        f"WHERE {C.pip_sql('lat', 'lon', ring)}"
        for pid, ring in (
            ("berlin_big_ring", BIG_RING),
            ("berlin_small_ring", SMALL_RING),
            ("berlin_concave", CONCAVE_RING),
        )
    ]
    return " UNION ALL ".join(selects)


def q_pip_semi(spark, sf_dir):
    """Semi-join form: documents inside ANY fixture polygon (same
    broadcast cell plan, how='left_semi' — SURVEY §2.8)."""
    df = _with_cell(_docs_coords(spark, sf_dir))
    return pip_join(df, max_length=6, how="left_semi").select(
        "doc_id", "lat", "lon"
    )


def q_pip_anti(spark, sf_dir):
    """Anti-join form: documents in NO fixture polygon (geofence
    exclusion)."""
    df = _with_cell(_docs_coords(spark, sf_dir))
    return pip_join(df, max_length=6, how="left_anti").select(
        "doc_id", "lat", "lon"
    )


def _pip_pred() -> str:
    return " OR ".join(
        C.pip_sql("lat", "lon", ring)
        for ring in (BIG_RING, SMALL_RING, CONCAVE_RING)
    )


O_PIP_SEMI = (
    f"SELECT doc_id, lat, lon FROM {_COORD_SUBQ} WHERE ({_pip_pred()})"
)
O_PIP_ANTI = (
    f"SELECT doc_id, lat, lon FROM {_COORD_SUBQ} WHERE NOT ({_pip_pred()})"
)


def q_events_tile_hourly(spark, sf_dir):
    """Time-windowed geo analytics over the events stream table:
    hourly tumbling window x z8 tile x event_type counts + value sums
    (native F.window; coordinates derived from user_id by the same
    integer arithmetic as documents)."""
    ev = src.load_table(spark, sf_dir, "events")
    lat = (((F.col("user_id") * 7919) % 170001 - 85000) / F.lit(1000.0))
    lon = (((F.col("user_id") * 104729) % 350001 - 175000) / F.lit(1000.0))
    x, y = C.tile_xy(lat, lon, 8)
    win = F.window(F.col("ts"), "1 hour")
    out = (
        ev.withColumns({"tile_x": x, "tile_y": y, "win": win})
        .groupBy(
            F.unix_timestamp(F.col("win.start")).alias("hour_epoch"),
            "tile_x",
            "tile_y",
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
        )
    )
    return out


def _events_oracle() -> str:
    lat = "(((user_id * 7919) % 170001 - 85000) / 1000.0)"
    lon = "(((user_id * 104729) % 350001 - 175000) / 1000.0)"
    x, y = C.tile_xy_sql(lat, lon, 8)
    return (
        "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, "
        f"{x} AS tile_x, {y} AS tile_y, event_type, count(*) AS n, "
        "round(sum(value), 6) AS sum_value_r6 FROM events "
        "GROUP BY 1, 2, 3, 4"
    )


def q_radius_join(spark, sf_dir):
    df = _with_cell(_docs_coords(spark, sf_dir))
    out = radius_join(df, BERLIN[0], BERLIN[1], 4000.0, max_length=6)
    return out.select("doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3"))


O_RADIUS = (
    f"SELECT doc_id, round(d, 3) AS dist_r3 FROM (SELECT doc_id, "
    f"{C.haversine_sql('lat', 'lon', repr(BERLIN[0]), repr(BERLIN[1]))} AS d "
    f"FROM {_COORD_SUBQ}) WHERE d <= 4000.0"
)


def q_knn(spark, sf_dir):
    df = _with_cell(_docs_coords(spark, sf_dir))
    out = knn(df, [("berlin", BERLIN[0], BERLIN[1])], k=10, precision=5)
    return out.select(
        "query_id", "rank", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


O_KNN = (
    "SELECT 'berlin' AS query_id, rank, doc_id, round(d, 3) AS dist_r3 FROM ("
    "SELECT doc_id, d, CAST(ROW_NUMBER() OVER (ORDER BY d ASC, doc_id ASC) AS INT) AS rank "
    f"FROM (SELECT doc_id, {C.haversine_sql('lat', 'lon', repr(BERLIN[0]), repr(BERLIN[1]))} AS d "
    f"FROM {_COORD_SUBQ})) WHERE rank <= 10"
)


def q_knn_window(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    queries = [
        ("brandenburger_tor", 52.516279, 13.377157),
        ("moritzplatz", 52.503663, 13.410717),
    ]
    out = knn_window(df, queries, k=5)
    return out.select(
        "query_id", "rank", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def q_radius_join_bulk(spark, sf_dir):
    """Bulk radius join: every 40th doc is a circle of doc-dependent
    radius (2-6 km); per-query ring extent from its own radius, shuffle
    equi-join on the cell key, exact haversine filter (operators.knn.
    radius_join_bulk — the many-circles path; radius_join serves one
    driver-side center).  Oracle mirrors the ring membership (Chebyshev
    index distance with the same per-query extent formula) + haversine."""
    from ..operators.knn import radius_join_bulk

    pts = _with_cell(_docs_coords(spark, sf_dir))
    qs = _docs_coords(spark, sf_dir).where(
        F.col("doc_id").cast("long") % 40 == 0
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
        (
            F.lit(2000.0) + (F.col("doc_id").cast("long") % 5) * F.lit(1000.0)
        ).alias("radius_m"),
    )
    out = radius_join_bulk(pts, qs, precision=5, max_ring=3)
    return out.select(
        "query_id", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def _radius_join_bulk_oracle() -> str:
    from ..kernels.geometry import DEGREE_LATITUDE_METERS as deg_m

    lat_bits, lon_bits = C.cell_bits(5)
    n_lon = 1 << lon_bits
    height_m = (180.0 / (1 << lat_bits)) * deg_m
    ia = C.cell_index_sql("lat", -90.0, 180.0, lat_bits)
    io = C.cell_index_sql("lon", -180.0, 360.0, lon_bits)
    worst_lat = f"least(90.0, abs(qlat) + radius_m / {deg_m!r})"
    width = f"({360.0 / n_lon * deg_m!r} * cos(radians({worst_lat})))"
    raw_ext = f"ceil(radius_m / least({height_m!r}, {width}))"
    # over-cap queries are filtered out below, so the extent needs no cap
    ext = f"CAST({raw_ext} AS INT)"
    hav = C.haversine_sql("p.lat", "p.lon", "q.qlat", "q.qlon")
    return (
        f"WITH pts AS (SELECT doc_id, lat, lon, {ia} AS ia, {io} AS io "
        f"FROM {_COORD_SUBQ}), "
        "qs0 AS (SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "ia AS qia, io AS qio, "
        "2000.0 + (CAST(doc_id AS BIGINT) % 5) * 1000.0 AS radius_m "
        "FROM pts WHERE CAST(doc_id AS BIGINT) % 40 = 0), "
        f"qs AS (SELECT *, {ext} AS ext FROM qs0 WHERE {raw_ext} <= 3) "
        f"SELECT q.query_id, p.doc_id, round({hav}, 3) AS dist_r3 "
        "FROM qs q JOIN pts p ON abs(p.ia - q.qia) <= q.ext "
        f"AND least((p.io - q.qio + {n_lon}) % {n_lon}, "
        f"(q.qio - p.io + {n_lon}) % {n_lon}) <= q.ext "
        f"WHERE {hav} <= q.radius_m"
    )


def q_segment_join(spark, sf_dir):
    """Relation-scale segment-crossing join (operators/segment_join.py):
    two doc-derived segment relations (deterministic ~0.01-0.02 deg
    deltas), bbox-cell-covering candidates at precision 6, then the
    verbatim reference linesCross formula as the exact join predicate
    in BOTH engines."""
    from ..operators.segment_join import segment_join

    did = F.col("doc_id").cast("long")
    base = _docs_coords(spark, sf_dir)
    a = base.select(
        F.col("doc_id").alias("id_a"),
        F.col("lat").alias("alat1"),
        F.col("lon").alias("alon1"),
        (F.col("lat") + ((did * 7) % 21 - 10).cast("double") / F.lit(1000.0)
         ).alias("alat2"),
        (F.col("lon") + ((did * 11) % 21 - 10).cast("double") / F.lit(1000.0)
         ).alias("alon2"),
    )
    b = base.where(did % 3 == 0).select(
        F.col("doc_id").alias("id_b"),
        (F.col("lat") + F.lit(0.002)).alias("blat1"),
        (F.col("lon") - F.lit(0.004)).alias("blon1"),
        (F.col("lat") + ((did * 13) % 25 - 12).cast("double") / F.lit(1000.0)
         ).alias("blat2"),
        (F.col("lon") + ((did * 17) % 25 - 12).cast("double") / F.lit(1000.0)
         ).alias("blon2"),
    )
    return segment_join(a, b, precision=6)


def _segment_join_oracle() -> str:
    from ..operators.segment_join import segment_join_oracle_sql

    did = "CAST(doc_id AS BIGINT)"
    a = (
        f"(SELECT doc_id AS id_a, lat AS alat1, lon AS alon1, "
        f"lat + CAST(({did} * 7) % 21 - 10 AS DOUBLE) / 1000.0 AS alat2, "
        f"lon + CAST(({did} * 11) % 21 - 10 AS DOUBLE) / 1000.0 AS alon2 "
        f"FROM {_COORD_SUBQ})"
    )
    b = (
        f"(SELECT doc_id AS id_b, lat + 0.002 AS blat1, "
        f"lon - 0.004 AS blon1, "
        f"lat + CAST(({did} * 13) % 25 - 12 AS DOUBLE) / 1000.0 AS blat2, "
        f"lon + CAST(({did} * 17) % 25 - 12 AS DOUBLE) / 1000.0 AS blon2 "
        f"FROM {_COORD_SUBQ} WHERE {did} % 3 = 0)"
    )
    return segment_join_oracle_sql(a, b, precision=6)


def q_idw(spark, sf_dir):
    """IDW interpolation (operators/interpolate.py): every 5th doc is
    a target circle (3-5 km), samples carry a deterministic value;
    candidates via radius_join_bulk's per-target ring explosion, then
    mm/1e-9 fixed-point weights summed as BIGINTs (order-independent)
    with min-value tie-break for sub-meter-coincident samples."""
    from ..operators.interpolate import idw_interpolate

    did = F.col("doc_id").cast("long")
    pts = _with_cell(_docs_coords(spark, sf_dir)).withColumn(
        "val", ((did * 13) % 1000).cast("double") / F.lit(10.0)
    )
    qs = _docs_coords(spark, sf_dir).where(did % 5 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
        (F.lit(3000.0) + (did % 3) * F.lit(1000.0)).alias("radius_m"),
    )
    return idw_interpolate(pts, qs, value_col="val", power=2, precision=5)


def _idw_oracle() -> str:
    from ..operators.interpolate import idw_oracle_sql

    samples = (
        "(SELECT lat, lon, "
        "CAST((CAST(doc_id AS BIGINT) * 13) % 1000 AS DOUBLE) / 10.0 "
        f"AS val FROM {_COORD_SUBQ})"
    )
    targets = (
        "(SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "3000.0 + (CAST(doc_id AS BIGINT) % 3) * 1000.0 AS radius_m "
        f"FROM {_COORD_SUBQ} WHERE CAST(doc_id AS BIGINT) % 5 = 0)"
    )
    return idw_oracle_sql(samples, targets, value_expr="val", power=2)


def q_knn_bulk(spark, sf_dir):
    """Distributed bulk kNN: every 50th doc is a query; ring-2
    precision-5 candidate cells via pure index arithmetic, shuffle
    equi-join on the cell key, window top-k per query (operators.knn.
    knn_bulk — the millions-of-queries path with no driver loop).
    Oracle expresses the identical ring membership as Chebyshev index
    distance with longitude wrap."""
    from ..operators.knn import knn_bulk

    pts = _with_cell(_docs_coords(spark, sf_dir))
    qs = _docs_coords(spark, sf_dir).where(
        F.col("doc_id").cast("long") % 50 == 0
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    out = knn_bulk(pts, qs, k=5, precision=5, ring=2)
    return out.select(
        "query_id", "rank", "doc_id",
        F.round(F.col("dist_m"), 3).alias("dist_r3"),
    )


def _knn_bulk_oracle() -> str:
    lat_bits, lon_bits = C.cell_bits(5)
    n_lon = 1 << lon_bits
    ia = C.cell_index_sql("lat", -90.0, 180.0, lat_bits)
    io = C.cell_index_sql("lon", -180.0, 360.0, lon_bits)
    hav = C.haversine_sql("p.lat", "p.lon", "q.qlat", "q.qlon")
    return (
        f"WITH pts AS (SELECT doc_id, lat, lon, {ia} AS ia, {io} AS io "
        f"FROM {_COORD_SUBQ}), "
        "qs AS (SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "ia AS qia, io AS qio FROM pts WHERE CAST(doc_id AS BIGINT) % 50 = 0) "
        "SELECT query_id, rank, doc_id, dist_r3 FROM ("
        f"SELECT q.query_id, p.doc_id, round({hav}, 3) AS dist_r3, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id "
        f"ORDER BY {hav} ASC, p.doc_id ASC) AS INT) AS rank "
        "FROM qs q JOIN pts p ON abs(p.ia - q.qia) <= 2 "
        f"AND least((p.io - q.qio + {n_lon}) % {n_lon}, "
        f"(q.qio - p.io + {n_lon}) % {n_lon}) <= 2"
        ") WHERE rank <= 5"
    )


O_KNN_WINDOW = " UNION ALL ".join(
    "SELECT query_id, rank, doc_id, round(d, 3) AS dist_r3 FROM ("
    f"SELECT '{qid}' AS query_id, doc_id, d, "
    "CAST(ROW_NUMBER() OVER (ORDER BY d ASC, doc_id ASC) AS INT) AS rank "
    f"FROM (SELECT doc_id, {C.haversine_sql('lat', 'lon', repr(qlat), repr(qlon))} AS d "
    f"FROM {_COORD_SUBQ})) WHERE rank <= 5"
    for qid, qlat, qlon in (
        ("brandenburger_tor", 52.516279, 13.377157),
        ("moritzplatz", 52.503663, 13.410717),
    )
)
