"""Contract queries: distances (haversine/vincenty/rhumb/DMS), geometry ETL transforms, heatmap/skew aggregations, intersects, GeoJSON round-trips, and areas.

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# --------------------------------------------------------------------------
# §2.6 distances
# --------------------------------------------------------------------------

def q_distances(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    qlat, qlon = F.lit(BERLIN[0]), F.lit(BERLIN[1])
    return df.select(
        "doc_id",
        F.round(C.haversine(F.col("lat"), F.col("lon"), qlat, qlon), 3).alias(
            "hav_r3"
        ),
        F.round(C.equirectangular(F.col("lat"), F.col("lon"), qlat, qlon), 3).alias(
            "eq_r3"
        ),
        F.round(C.heading(F.col("lat"), F.col("lon"), qlat, qlon), 3).alias(
            "heading_r3"
        ),
    )


def q_rhumb(spark, sf_dir):
    """Rhumb-line (loxodrome) navigation family
    (functions/columns.py rhumb_*): constant-bearing distance and
    course to the Berlin vector point, plus the destination of a
    100 km leg at course 45 — the navigation pair the reference's
    great-circle family (GeoGeometry.kt:565-608) stops short of.
    Transcendental (JVM vs libm ~1 ulp), so r3 on both sides."""
    df = _docs_coords(spark, sf_dir)
    qlat, qlon = F.lit(BERLIN[0]), F.lit(BERLIN[1])
    dlat, dlon = C.rhumb_destination(
        F.col("lat"), F.col("lon"), F.lit(45.0), F.lit(100000.0)
    )
    return df.select(
        "doc_id",
        F.round(
            C.rhumb_distance(F.col("lat"), F.col("lon"), qlat, qlon), 3
        ).alias("rhumb_m_r3"),
        F.round(
            C.rhumb_bearing(F.col("lat"), F.col("lon"), qlat, qlon), 3
        ).alias("course_r3"),
        F.round(dlat, 3).alias("dest_lat_r3"),
        F.round(dlon, 3).alias("dest_lon_r3"),
    )


def _rhumb_oracle() -> str:
    qlat, qlon = repr(BERLIN[0]), repr(BERLIN[1])
    dist = C.rhumb_distance_sql("lat", "lon", qlat, qlon)
    course = C.rhumb_bearing_sql("lat", "lon", qlat, qlon)
    dlat, dlon = C.rhumb_destination_sql("lat", "lon", "45.0", "100000.0")
    return (
        f"SELECT doc_id, round({dist}, 3) AS rhumb_m_r3, "
        f"round({course}, 3) AS course_r3, "
        f"round({dlat}, 3) AS dest_lat_r3, "
        f"round({dlon}, 3) AS dest_lon_r3 FROM {_COORD_SUBQ}"
    )


def _distances_oracle() -> str:
    qlat, qlon = repr(BERLIN[0]), repr(BERLIN[1])
    hav = C.haversine_sql("lat", "lon", qlat, qlon)
    deg2rad = repr(C.DEG2RAD)
    x = f"((({qlon}) - lon) * {deg2rad} * cos(((lat + ({qlat})) / 2) * {deg2rad}))"
    y = f"((({qlat}) - lat) * {deg2rad})"
    eq = f"(sqrt({x} * {x} + {y} * {y}) * {C.EARTH_RADIUS_METERS!r})"
    head = C.heading_sql("lat", "lon", qlat, qlon)
    return (
        f"SELECT doc_id, round({hav}, 3) AS hav_r3, round({eq}, 3) AS eq_r3, "
        f"round({head}, 3) AS heading_r3 FROM {_COORD_SUBQ}"
    )


def q_vincenty(spark, sf_dir):
    """Vincenty distance + initial bearing to the Berlin vector point.
    Oracle unrolls the lambda iteration as 100 convergence-guarded CTE
    layers (kernels.vincenty.vincenty_oracle_sql).  Distance compared at
    centimeter precision: numpy trig and DuckDB libm drift by <= ~4e-9 m
    through the iteration, so r2 keeps boundary flips at ~1e-6/row."""
    df = _docs_coords(spark, sf_dir)
    v = vincenty_full(
        F.col("lat"), F.col("lon"), F.lit(BERLIN[0]), F.lit(BERLIN[1])
    )
    return df.select(
        "doc_id",
        F.round(v["distance_m"], 2).alias("vincenty_r2"),
        F.round(v["initial_bearing"], 3).alias("bearing_r3"),
    )


def _vincenty_oracle() -> str:
    from ..kernels.vincenty import vincenty_oracle_sql

    inner = vincenty_oracle_sql(_COORD_SUBQ, BERLIN[0], BERLIN[1])
    return (
        "SELECT doc_id, round(distance_m, 2) AS vincenty_r2, "
        f"round(initial_bearing, 3) AS bearing_r3 FROM ({inner})"
    )


# --------------------------------------------------------------------------
# §2.7 geometry ETL transforms
# --------------------------------------------------------------------------

def q_dms(spark, sf_dir):
    """DMS components + humanReadable string (geojson.kt:349-367)."""
    from ..operators import transform as tr

    df = _docs_coords(spark, sf_dir)
    la = tr.dms_cols(F.col("lat"), "N", "S")
    lo = tr.dms_cols(F.col("lon"), "E", "W")
    return df.select(
        "doc_id",
        la["d"].alias("lat_d"),
        la["m"].alias("lat_m"),
        la["s2"].alias("lat_s2"),
        lo["d"].alias("lon_d"),
        lo["m"].alias("lon_m"),
        lo["s2"].alias("lon_s2"),
        tr.human_readable_col(F.col("lat"), F.col("lon")).alias("human"),
    )


def _dms_oracle() -> str:
    from ..operators import transform as tr

    la = tr.dms_sql("lat", "N", "S")
    lo = tr.dms_sql("lon", "E", "W")
    human = tr.human_readable_sql("lat", "lon")
    return (
        f"SELECT doc_id, {la['d']} AS lat_d, {la['m']} AS lat_m, "
        f"{la['s2']} AS lat_s2, {lo['d']} AS lon_d, {lo['m']} AS lon_m, "
        f"{lo['s2']} AS lon_s2, {human} AS human FROM {_COORD_SUBQ}"
    )


def q_translate(spark, sf_dir):
    """translate + rectangleAroundCentroid (GeoGeometry.kt:430-515)."""
    from ..operators import transform as tr

    df = _docs_coords(spark, sf_dir)
    lat2, lon2 = tr.translate_cols(
        F.col("lat"), F.col("lon"), F.lit(250.0), F.lit(-150.0)
    )
    rect = tr.rectangle_cols(F.col("lat"), F.col("lon"), 300.0, 200.0)
    return df.select(
        "doc_id",
        lat2.alias("lat_t"),
        lon2.alias("lon_t"),
        rect["west"].alias("west"),
        rect["south"].alias("south"),
        rect["east"].alias("east"),
        rect["north"].alias("north"),
    )


def _translate_oracle() -> str:
    from ..operators import transform as tr

    lat2, lon2 = tr.translate_sql("lat", "lon", "250.0", "-150.0")
    n_lat, e_lon = tr.translate_sql("lat", "lon", "150.0", "100.0")
    s_lat, w_lon = tr.translate_sql("lat", "lon", "-150.0", "-100.0")
    return (
        f"SELECT doc_id, {lat2} AS lat_t, {lon2} AS lon_t, "
        f"{w_lon} AS west, {s_lat} AS south, {e_lon} AS east, "
        f"{n_lat} AS north FROM {_COORD_SUBQ}"
    )


def q_rotate(spark, sf_dir):
    """rotateAround Berlin by 45° CCW (GeoGeometry.kt:863-887), native
    Columns; r6-rounded (haversine/cos are libm-derived)."""
    from ..operators import transform as tr

    df = _docs_coords(spark, sf_dir)
    lat2, lon2 = tr.rotate_around_cols(
        BERLIN[0], BERLIN[1], F.col("lat"), F.col("lon"), 45.0
    )
    return df.select(
        "doc_id",
        F.round(lat2, 6).alias("lat_r6"),
        F.round(lon2, 6).alias("lon_r6"),
    )


def _rotate_oracle() -> str:
    from ..operators import transform as tr

    lat2, lon2 = tr.rotate_around_sql(
        repr(BERLIN[0]), repr(BERLIN[1]), "lat", "lon", 45.0
    )
    return (
        f"SELECT doc_id, round({lat2}, 6) AS lat_r6, "
        f"round({lon2}, 6) AS lon_r6 FROM {_COORD_SUBQ}"
    )


def q_noise_filter(spark, sf_dir):
    """filterNoiseFromPointCloud per cell3 group (GeoGeometry.kt:158-172)."""
    from ..operators.transform import filter_noise

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell3", C.geohash(F.col("lat"), F.col("lon"), 3))
    # doc_id tiebreak: coordinate ties DO reach the trim boundary at
    # sf0.1 (caught by the full sf0.1 sweep) and the reference leaves
    # tie order unspecified — pin it identically on both engines
    out = filter_noise(df, 0.2, group_cols=["cell3"],
                       tiebreak_cols=["doc_id"])
    return out.select("doc_id", "cell3", "lat", "lon")


O_NOISE = (
    "SELECT doc_id, cell3, lat, lon FROM ("
    "SELECT doc_id, cell3, lat, lon, "
    "ROW_NUMBER() OVER (PARTITION BY cell3 ORDER BY lon, lat, doc_id) AS rn, "
    "COUNT(*) OVER (PARTITION BY cell3) AS n FROM ("
    f"SELECT doc_id, lat, lon, {C.geohash_sql('lat', 'lon', 3)} AS cell3 "
    f"FROM {_COORD_SUBQ})) "
    "WHERE rn > CAST(floor(n * 0.2 / 2) AS BIGINT) "
    "AND rn <= n - CAST(floor(n * 0.2 / 2) AS BIGINT)"
)


def q_bbox_agg(spark, sf_dir):
    """boundingBox + polygonCenter as partial+final min/max aggregation
    (GeoGeometry.kt:75-147, 777-792) per cell3."""
    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell3", C.geohash(F.col("lat"), F.col("lon"), 3))
    return df.groupBy("cell3").agg(
        F.min("lon").alias("west"),
        F.min("lat").alias("south"),
        F.max("lon").alias("east"),
        F.max("lat").alias("north"),
        F.count(F.lit(1)).alias("n"),
        ((F.min("lon") + F.max("lon")) / 2).alias("center_lon"),
        ((F.min("lat") + F.max("lat")) / 2).alias("center_lat"),
    )


O_BBOX_AGG = (
    "SELECT cell3, min(lon) AS west, min(lat) AS south, max(lon) AS east, "
    "max(lat) AS north, count(*) AS n, "
    "(min(lon) + max(lon)) / 2 AS center_lon, "
    "(min(lat) + max(lat)) / 2 AS center_lat FROM ("
    f"SELECT lat, lon, {C.geohash_sql('lat', 'lon', 3)} AS cell3 "
    f"FROM {_COORD_SUBQ}) GROUP BY cell3"
)


def q_convex_hull(spark, sf_dir):
    """polygonForPoints per cell1 group via applyInPandas
    (GeoGeometry.kt:995-1071; verified against the kernel in pytest)."""
    from ..operators.transform import grouped_convex_hull

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    return grouped_convex_hull(df, "cell1")


def q_concave_hull(spark, sf_dir):
    """calculateConcaveHull per cell1 group (concave-hull.kt:361-389;
    heuristic — invariants pytest-checked, rows-only for the driver)."""
    from ..operators.transform import grouped_concave_hull

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    return grouped_concave_hull(df, "cell1", k=5, max_recurse=40,
                                max_points=150)


def q_simplify(spark, sf_dir):
    """Douglas-Peucker per cell1 path (points ordered by doc_id;
    GeoGeometry.kt:1376-1410)."""
    from ..operators.transform import grouped_simplify

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    return grouped_simplify(df, "cell1", "doc_id", tolerance_m=5000.0)


# --------------------------------------------------------------------------
# §2.9 aggregations / skew
# --------------------------------------------------------------------------

def q_tile_heatmap(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    return tile_heatmap(df, zooms=[8, 12]).select("zoom", "tile_x", "tile_y", "n")


def _heatmap_oracle() -> str:
    x22, y22 = C.tile_xy_sql("lat", "lon", 22)
    sub = f"(SELECT doc_id, {x22} AS x22, {y22} AS y22 FROM {_COORD_SUBQ})"
    selects = [
        f"SELECT {z} AS zoom, CAST(x22 >> {22 - z} AS INT) AS tile_x, "
        f"CAST(y22 >> {22 - z} AS INT) AS tile_y, count(*) AS n FROM {sub} "
        "GROUP BY 1, 2, 3"
        for z in (8, 12)
    ]
    return " UNION ALL ".join(selects)


def q_salted_cell_counts(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell5", C.geohash(F.col("lat"), F.col("lon"), 5))
    out = salted_agg(
        df,
        "cell5",
        {"n": (F.count(F.lit(1)), F.sum)},
        target_rows_per_task=100,  # force salting of the Berlin hot cell
        seed_col="doc_id",
    )
    return out.select("cell5", F.col("n").cast("long").alias("n"))


O_SALTED = (
    f"SELECT cell5, count(*) AS n FROM (SELECT "
    f"{C.geohash_sql('lat', 'lon', 5)} AS cell5 FROM {_COORD_SUBQ}) GROUP BY cell5"
)


# --------------------------------------------------------------------------
# §2.8 intersects / §2.1 GeoJSON / areas
# --------------------------------------------------------------------------

def _berlin_geom() -> dict:
    from ..fixtures import polygons_np

    ring = polygons_np(None)["berlin_big_ring"][0]
    return {
        "type": "Polygon",
        "coordinates": [[[float(p[0]), float(p[1])] for p in ring]],
    }


def _berlin_edges() -> list[tuple[float, float, float, float]]:
    ring = _berlin_geom()["coordinates"][0]
    return [
        (ring[i][0], ring[i][1], ring[i + 1][0], ring[i + 1][1])
        for i in range(len(ring) - 1)
    ]


def q_intersects(spark, sf_dir):
    """LineString-vs-Polygon via the FULL Geometry.intersects dispatch
    (geojson-intersect.kt:5-171): each doc's ~400m eastward segment as a
    GeoJSON LineString against the Berlin big ring — bbox prefilter,
    antimeridian-normalized linesCross per edge, hole-aware containment
    of the segment start.  Runs the VECTORIZED uniform-type kernel
    (line_intersects_polygon; parity with the per-row JSON dispatch is
    pytest-pinned, incl. the shorter-arc bbox prefilter).  The oracle
    unrolls crossing+containment only: for THIS fixture (Berlin polygon
    span << 180°, segments <= 400 m) a true crossing or containment
    implies bbox overlap, so the prefilter never changes a verdict —
    it is semantic only for polygons whose raw lon span exceeds 180°
    (see the wide-span kernel test)."""
    from ..functions.udfs import make_line_poly_intersects_udf
    from ..operators import transform as tr

    df = _docs_coords(spark, sf_dir)
    lat2, lon2 = tr.translate_cols(
        F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(400.0)
    )
    df = df.withColumns({"lat2": lat2, "lon2": lon2})
    udf = make_line_poly_intersects_udf(_berlin_geom()["coordinates"])
    return df.select(
        "doc_id",
        udf(
            F.col("lat"), F.col("lon"), F.col("lat2"), F.col("lon2")
        ).alias("intersects"),
    ).where(F.col("intersects"))


def _intersects_oracle() -> str:
    from ..operators import transform as tr

    lat2, lon2 = tr.translate_sql("lat", "lon", "0.0", "400.0")
    crossings = " OR ".join(
        C.lines_cross_am_sql(
            "lon", "lat", lon2, lat2, repr(u1), repr(v1), repr(u2), repr(v2)
        )
        for u1, v1, u2, v2 in _berlin_edges()
    )
    from ..fixtures import polygons_np

    ring = polygons_np(None)["berlin_big_ring"][0]
    pip = C.pip_sql("lat", "lon", ring)
    return (
        f"SELECT doc_id, TRUE AS intersects FROM {_COORD_SUBQ} "
        f"WHERE ({crossings}) OR {pip}"
    )


def q_poly_intersects(spark, sf_dir):
    """Polygon-vs-Polygon via the full dispatch
    (geojson-intersect.kt:90-131): a 0.1 x 0.06 degree query box around
    each doc's coordinate against the Berlin big ring — per box edge the
    line dispatch (edge crossings + hole-aware containment of the edge
    start), then the mutual first-vertex containment shortcuts.

    Hot form: ring arrays through Arrow into the batch pair-intersects
    kernel against the broadcast geometry (kernels/overlay.py —
    bit-exact vs the per-row json dispatch, which remains the
    mixed-geometry-type generality path in make_intersects_udf)."""
    from ..functions.udfs import make_polygon_vs_fixed_intersects_udf

    df = _docs_coords(spark, sf_dir)
    w, e = F.col("lon") - F.lit(0.05), F.col("lon") + F.lit(0.05)
    s, n = F.col("lat") - F.lit(0.03), F.col("lat") + F.lit(0.03)
    corner = lambda x, y: F.array(x, y)  # noqa: E731
    rings = F.array(
        F.array(
            corner(w, s), corner(e, s), corner(e, n),
            corner(w, n), corner(w, s),
        )
    )
    udf = make_polygon_vs_fixed_intersects_udf(
        _berlin_geom()["coordinates"]
    )
    return df.select("doc_id", udf(rings).alias("intersects")).where(
        F.col("intersects")
    )


def _box_poly_intersects_cond(ring) -> str:
    """SQL condition: does the per-doc 0.1 x 0.06 degree query box
    intersect the (closed, hole-free) polygon ``ring`` — the
    geojson-intersect.kt:90-131 dispatch expressed over literals:
    per box edge the line dispatch (edge crossings + containment of the
    edge start), plus the mutual first-vertex shortcuts (:113-122)."""
    import numpy as np

    ring = np.asarray(ring, dtype=np.float64)
    w, e = "(lon - 0.05)", "(lon + 0.05)"
    s, n = "(lat - 0.03)", "(lat + 0.03)"
    # OPEN box ring, edges close modularly — identical to the
    # reference's zipWithNextCompat over the closed 5-point ring, whose
    # last pair (corner3, closing-duplicate-of-corner0) IS the modular
    # 4th edge
    corners = [(w, s), (e, s), (e, n), (w, n)]
    box_edges = [
        (*corners[i], *corners[(i + 1) % 4]) for i in range(4)
    ]
    poly_edges = [
        (
            float(ring[i][0]), float(ring[i][1]),
            float(ring[i + 1][0]), float(ring[i + 1][1]),
        )
        for i in range(len(ring) - 1)
    ]
    per_edge = []
    for bx1, by1, bx2, by2 in box_edges:
        crossings = " OR ".join(
            C.lines_cross_am_sql(
                bx1, by1, bx2, by2, repr(u1), repr(v1), repr(u2), repr(v2)
            )
            for u1, v1, u2, v2 in poly_edges
        )
        start_inside = C.pip_sql(by1, bx1, ring)
        per_edge.append(f"(({crossings}) OR {start_inside})")
    v0 = ring[0]
    poly_v0_in_box = C.pip_expr_sql(
        repr(float(v0[1])), repr(float(v0[0])), corners
    )
    box_c0_in_poly = C.pip_sql(s, w, ring)
    return (
        f"({' OR '.join(per_edge)}) OR {poly_v0_in_box} OR {box_c0_in_poly}"
    )


def _poly_intersects_oracle() -> str:
    from ..fixtures import polygons_np

    cond = _box_poly_intersects_cond(polygons_np(None)["berlin_big_ring"][0])
    return (
        f"SELECT doc_id, TRUE AS intersects FROM {_COORD_SUBQ} "
        f"WHERE {cond}"
    )


def q_overlay_join(spark, sf_dir):
    """Polygon-relation x polygon-relation OVERLAY join: per-doc query
    boxes (a data-derived polygon relation) against the fixture
    polygon set, candidates via shared S2 covering cells, exact
    geojson-intersect.kt dispatch only for boundary-touching pairs
    (both-interior cells accept map-side).  The relation-scale twin of
    poly_intersects' one-fixed-geometry scan."""
    from ..operators.pip_join import polygons_as_df
    from ..operators.s2_join import s2_overlay_join

    df = _docs_coords(spark, sf_dir)
    w, e = F.col("lon") - F.lit(0.05), F.col("lon") + F.lit(0.05)
    s, n = F.col("lat") - F.lit(0.03), F.col("lat") + F.lit(0.03)
    pt = lambda x, y: F.array(x, y)  # noqa: E731
    ring = F.array(pt(w, s), pt(e, s), pt(e, n), pt(w, n), pt(w, s))
    boxes = df.select(
        F.col("doc_id").cast("string").alias("polygon_id"),
        F.array(ring).alias("rings"),
    )
    out = s2_overlay_join(
        boxes, polygons_as_df(spark), level=13,
        id_a="doc_id", id_b="polygon_id",
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "polygon_id"
    )


def _overlay_oracle() -> str:
    """UNION ALL of the box-vs-polygon condition over every fixture
    polygon — brute force over the full cross product, which the Spark
    side must reproduce through covering-cell candidates + exact
    re-check."""
    from ..fixtures import polygons_np

    parts = [
        f"SELECT doc_id, '{pid}' AS polygon_id FROM {_COORD_SUBQ} "
        f"WHERE {_box_poly_intersects_cond(rings[0])}"
        for pid, rings in polygons_np(None).items()
    ]
    return " UNION ALL ".join(parts)


# Adversarial overlay fixtures (VERDICT r3 item 1): a holed polygon, an
# antimeridian-crossing polygon (raw lon span > 180 reads as the shorter
# arc), and a multi-ring polygon (two holes) — the shapes that route
# through the exact pair kernel's per-pair fallback branches, now in the
# ORACLE path rather than pytest only.  All rings are axis-aligned
# rectangles at *.0005/*.9995 offsets so no data-derived box edge (3
# decimals +-0.05/0.03) can land exactly on a fixture boundary and make
# the closed-form SQL diverge from the kernel on a tie.
_ADV_POLYS: dict[str, list[list[list[float]]]] = {
    "holed": [
        [[30.0005, -25.0005], [70.0005, -25.0005], [70.0005, 25.0005],
         [30.0005, 25.0005], [30.0005, -25.0005]],
        [[40.0005, -12.0005], [60.0005, -12.0005], [60.0005, 12.0005],
         [40.0005, 12.0005], [40.0005, -12.0005]],
    ],
    "am": [
        [[178.9995, -30.0005], [-178.9995, -30.0005],
         [-178.9995, 30.0005], [178.9995, 30.0005], [178.9995, -30.0005]],
    ],
    "multi": [
        [[-120.0005, -40.0005], [-60.0005, -40.0005], [-60.0005, 40.0005],
         [-120.0005, 40.0005], [-120.0005, -40.0005]],
        [[-110.0005, -30.0005], [-90.0005, -30.0005], [-90.0005, -10.0005],
         [-110.0005, -10.0005], [-110.0005, -30.0005]],
        [[-85.0005, 5.0005], [-70.0005, 5.0005], [-70.0005, 30.0005],
         [-85.0005, 30.0005], [-85.0005, 5.0005]],
    ],
}


def q_overlay_adversarial(spark, sf_dir):
    """Overlay join against the adversarial fixture set (holes /
    antimeridian / multi-ring).  The A side shifts each doc's longitude
    by 180 deg (mod 360) so data-derived boxes populate the
    antimeridian neighborhood, clamped to never cross it themselves —
    only the fixture polygon crosses, exercising the covering's
    shorter-arc split and the pair kernel's per-pair dispatch."""
    from ..operators.s2_join import s2_overlay_join

    df = _docs_coords(spark, sf_dir)
    lon_s = F.when(F.col("lon") <= 0, F.col("lon") + 180).otherwise(
        F.col("lon") - 180
    )
    w = F.greatest(lon_s - F.lit(0.05), F.lit(-180.0))
    e = F.least(lon_s + F.lit(0.05), F.lit(180.0))
    s, n = F.col("lat") - F.lit(0.03), F.col("lat") + F.lit(0.03)
    pt = lambda x, y: F.array(x, y)  # noqa: E731
    ring = F.array(pt(w, s), pt(e, s), pt(e, n), pt(w, n), pt(w, s))
    boxes = df.select(
        F.col("doc_id").cast("string").alias("polygon_id"),
        F.array(ring).alias("rings"),
    )
    adv = spark.createDataFrame(
        [(pid, rings) for pid, rings in _ADV_POLYS.items()],
        "polygon_id string, rings array<array<array<double>>>",
    )
    out = s2_overlay_join(
        boxes, adv, level=6, id_a="doc_id", id_b="polygon_id"
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "polygon_id"
    )


def _overlay_adversarial_oracle() -> str:
    """Closed-form DuckDB twin: every fixture ring is an axis-aligned
    rectangle, so box-vs-polygon is rect-intersects(OUTER).  Holes are
    deliberately NOT excluded: the reference's Polygon x Polygon
    intersects shortcut is GeoGeometry.polygonContains(...,
    PolygonCoordinates), whose doc says "polygon holes are ignored
    currently" (GeoGeometry.kt:213, geojson-intersect.kt:110-117) —
    so a box strictly inside a hole still intersects per reference
    semantics (verified: the first sf0.1 sweep flagged exactly the 5
    in-hole boxes when this oracle excluded holes).  The hole rings
    still matter: they route those pairs through the covering's holed
    path and the pair kernel's per-pair dispatch.  The antimeridian
    polygon is the union of its two shorter-arc pieces."""

    def rect(r):
        xs = [p[0] for p in r]
        ys = [p[1] for p in r]
        return min(xs), min(ys), max(xs), max(ys)

    def rint(W, S, E, N):
        return f"NOT (w > {E!r} OR e < {W!r} OR s > {N!r} OR n < {S!r})"

    boxes = (
        "(SELECT doc_id, GREATEST(ls - 0.05, -180.0) AS w, "
        "LEAST(ls + 0.05, 180.0) AS e, lat - 0.03 AS s, lat + 0.03 AS n "
        "FROM (SELECT doc_id, lat, CASE WHEN lon <= 0 THEN lon + 180 "
        f"ELSE lon - 180 END AS ls FROM {_COORD_SUBQ}))"
    )
    parts = []
    for pid, rings in _ADV_POLYS.items():
        if pid == "am":
            lons = [p[0] for p in rings[0]]
            lats = [p[1] for p in rings[0]]
            we = min(x for x in lons if x >= 0)
            ee = max(x for x in lons if x < 0)
            S, N = min(lats), max(lats)
            cond = (
                f"(({rint(we, S, 180.0, N)}) OR "
                f"({rint(-180.0, S, ee, N)}))"
            )
        else:
            cond = f"({rint(*rect(rings[0]))})"
        parts.append(
            f"SELECT doc_id, '{pid}' AS polygon_id FROM {boxes} "
            f"WHERE {cond}"
        )
    return " UNION ALL ".join(parts)


def q_geojson_roundtrip(spark, sf_dir):
    """GeoJSON Point emit (to_json) + parse back (geojson.kt:487-728);
    oracle rebuilds the identical JSON string by concatenation (both
    engines print float64 shortest-repr)."""
    from ..operators.geojson import parse_points, point_geojson

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("gj", point_geojson(F.col("lat"), F.col("lon")))
    return parse_points(df, "gj", keep=["doc_id", "gj"])


O_GEOJSON = (
    "SELECT doc_id, '{\"type\":\"Point\",\"coordinates\":['"
    " || CAST(lon AS VARCHAR) || ',' || CAST(lat AS VARCHAR) || ']}' AS gj, "
    f"lat, lon FROM {_COORD_SUBQ}"
)


def q_geojson_io_url(spark, sf_dir):
    """Per-doc geojson.io URL (json-helpers.kt:6-33): Point GeoJSON ->
    'https://geojson.io/#data=' + RFC3986('data:application/json,'+json).
    Oracle encodes the same alphabet with a replace chain (the JSON
    payload only ever contains : / , { } " [ ] and unreserved chars)."""
    from ..operators.geojson import geojson_io_url_col, point_geojson

    df = _docs_coords(spark, sf_dir)
    gj = point_geojson(F.col("lat"), F.col("lon"))
    return df.select(
        "doc_id", geojson_io_url_col(gj).alias("url")
    )


def _geojson_io_url_oracle() -> str:
    gj = (
        "'{\"type\":\"Point\",\"coordinates\":['"
        " || CAST(lon AS VARCHAR) || ',' || CAST(lat AS VARCHAR) || ']}'"
    )
    enc = f"('data:application/json,' || {gj})"
    for ch, code in (
        (":", "%3A"), ("/", "%2F"), (",", "%2C"), ("{", "%7B"),
        ("}", "%7D"), ('"', "%22"), ("[", "%5B"), ("]", "%5D"),
        ("+", "%2B"),
    ):
        enc = f"replace({enc}, '{ch}', '{code}')"
    return (
        f"SELECT doc_id, 'https://geojson.io/#data=' || {enc} AS url "
        f"FROM {_COORD_SUBQ}"
    )


def q_ndjson_features(spark, sf_dir):
    """Bulk GeoJSON sink shape (sources/geojson_file.py feature_line):
    one NDJSON Feature string per doc — native concat around the
    geometry JSON, properties via to_json(struct).  Oracle rebuilds the
    byte-identical line (both engines print float64 shortest-repr,
    proven by geojson_roundtrip)."""
    from ..operators.geojson import point_geojson
    from ..sources.geojson_file import feature_line

    df = src.with_true_coords(
        src.load_table(spark, sf_dir, "documents")
    ).select("doc_id", "lang", "lat", "lon")
    df = df.withColumn("gj", point_geojson(F.col("lat"), F.col("lon")))
    return df.select(
        "doc_id", feature_line("gj", ["doc_id", "lang"]).alias("feature")
    )


O_NDJSON = (
    "SELECT doc_id, "
    "'{\"type\":\"Feature\",\"geometry\":{\"type\":\"Point\",\"coordinates\":['"
    " || CAST(lon AS VARCHAR) || ',' || CAST(lat AS VARCHAR) || "
    "']},\"properties\":{\"doc_id\":' || CAST(doc_id AS VARCHAR) || "
    "',\"lang\":\"' || lang || '\"}}' AS feature "
    f"FROM (SELECT doc_id, lang, {src.LAT_SQL} AS lat, {src.LON_SQL} AS lon "
    "FROM documents)"
)


def q_fc_explode(spark, sf_dir):
    """FeatureCollection round trip: per-lang FeatureCollection string
    (deterministic doc_id order, the fromGeoHashes-style sink,
    geojson.kt:783-823) exploded back to one row per Feature via the
    native Spark 4 VARIANT path (sources/geojson_file.py
    explode_feature_collection — variant_explode, no Python workers).

    Oracle: variant re-rendering is canonical — object keys sort
    alphabetically and numbers re-print from the parsed value — so the
    SQL twin rebuilds that canonical form directly; pos must equal the
    doc_id rank within lang.

    Scale note: the per-lang FC build is the SMALL-OUTPUT sink pattern
    (same contract as operators.geojson.feature_collection — a handful
    of collection rows, thousands of features each); the operator under
    test is the exploder, whose lateral variant path is per-row and
    shuffle-free.  Bulk data stays NDJSON (ndjson_features)."""
    from ..operators.geojson import point_geojson
    from ..sources.geojson_file import explode_feature_collection, feature_line

    df = src.with_true_coords(
        src.load_table(spark, sf_dir, "documents")
    ).select("doc_id", "lang", "lat", "lon")
    feat = feature_line(
        point_geojson(F.col("lat"), F.col("lon")), ["doc_id"]
    )
    fc = df.select("lang", "doc_id", feat.alias("f")).groupBy("lang").agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "f"))),
                    lambda s: s["f"],
                ),
                ",",
            ),
            F.lit("]}"),
        ).alias("fc")
    )
    return explode_feature_collection(fc, "fc", keep=["lang"]).select(
        "lang", "pos", "feature"
    )


def _fc_explode_oracle() -> str:
    # canonical variant rendering: keys alphabetical within each
    # object, and INTEGRAL doubles print without the trailing ".0"
    # (Spark's variant number re-render; DuckDB's CAST keeps it — the
    # sf0.1 sweep caught lon=168 rendering as "168" vs "168.0";
    # sf0.01 happens to contain no integral coordinate)
    def num(col: str) -> str:
        return (
            f"CASE WHEN {col} = trunc({col}) "
            f"THEN CAST(CAST({col} AS BIGINT) AS VARCHAR) "
            f"ELSE CAST({col} AS VARCHAR) END"
        )

    feat = (
        "'{\"geometry\":{\"coordinates\":[' || " + num("lon") + " || ',' "
        "|| " + num("lat") + " || '],\"type\":\"Point\"},"
        "\"properties\":{\"doc_id\":' || CAST(doc_id AS VARCHAR) || "
        "'},\"type\":\"Feature\"}'"
    )
    return (
        "SELECT lang, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS pos, "
        f"{feat} AS feature "
        f"FROM (SELECT doc_id, lang, {src.LAT_SQL} AS lat, {src.LON_SQL} AS lon "
        "FROM documents)"
    )


def q_bbox_area(spark, sf_dir):
    """Bbox area via two haversines (GeoGeometry.kt:1266-1273), per
    cell3 bbox from the min/max aggregation — native end to end."""
    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell3", C.geohash(F.col("lat"), F.col("lon"), 3))
    agg = df.groupBy("cell3").agg(
        F.min("lon").alias("west"),
        F.min("lat").alias("south"),
        F.max("lon").alias("east"),
        F.max("lat").alias("north"),
    )
    lat_dist = C.haversine(
        F.col("south"), F.col("west"), F.col("north"), F.col("west")
    )
    lon_dist = C.haversine(
        F.col("north"), F.col("west"), F.col("north"), F.col("east")
    )
    return agg.select(
        "cell3", F.round(lat_dist * lon_dist, 3).alias("area_m2_r3")
    )


def _bbox_area_oracle() -> str:
    lat_d = C.haversine_sql("south", "west", "north", "west")
    lon_d = C.haversine_sql("north", "west", "north", "east")
    return (
        f"SELECT cell3, round({lat_d} * {lon_d}, 3) AS area_m2_r3 FROM ("
        "SELECT cell3, min(lon) AS west, min(lat) AS south, max(lon) AS east, "
        "max(lat) AS north FROM ("
        f"SELECT lat, lon, {C.geohash_sql('lat', 'lon', 3)} AS cell3 "
        f"FROM {_COORD_SUBQ}) GROUP BY cell3)"
    )


def q_hull_area(spark, sf_dir):
    """Shoelace ring area (GeoGeometry.kt:1236-1260) of each cell1
    convex hull (grouped-map -> collect ring -> pandas UDF)."""
    from ..functions.udfs import make_ring_area_udf
    from ..operators.transform import grouped_convex_hull

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    hull = grouped_convex_hull(df, "cell1")
    # collect_list order is NOT guaranteed across the aggregation
    # shuffle — aggregate (vertex_idx, lon, lat) structs and sort inside
    # the agg, then project the ring back out, so the shoelace walks the
    # hull in vertex order at any parallelism.
    verts = F.array_sort(
        F.collect_list(F.struct("vertex_idx", "lon", "lat"))
    )
    rings = hull.groupBy("cell1").agg(
        F.transform(verts, lambda v: v["lon"]).alias("lons"),
        F.transform(verts, lambda v: v["lat"]).alias("lats"),
    )
    area = make_ring_area_udf()
    return rings.select(
        "cell1", F.round(area(F.col("lons"), F.col("lats")), 3).alias("area_r3")
    )
