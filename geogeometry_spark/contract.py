"""Driver-contract queries and their DuckDB oracles.

Every entry in QUERIES is a Spark implementation of an operator from
SURVEY.md §2 (or a training-data-pipeline operator); ORACLES holds the
equivalent ANSI SQL DuckDB runs on the same parquet views.  Both sides
compute the same float64 operation order, so value hashes match exactly
for pure-arithmetic results; results derived through libm transcendentals
(sin/cos/ln/atan2 — not bit-specified across JVM and C libm) are rounded
to 3 decimals on BOTH sides (1 ulp at 1e7 magnitude is ~1e-9, so the
only mismatch risk is a value within 1e-9 of a 0.0005 rounding boundary).

Ground-truth coordinates derive from doc_id by pure BIGINT arithmetic
(sources.tables), identical in both engines, so oracles never need the
lookaround regex (DuckDB's RE2 doesn't support it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import BIG_RING, CONCAVE_RING, SMALL_RING
from .functions import columns as C
from .functions import hexcell as HX
from .functions import s2cell as S2
from .kernels import hexgrid as hgk
from .kernels import s2 as s2k
from .operators import dedup, similarity, text
from .operators import trajectory as traj
from .operators.extract import extract_coordinates
from .operators.knn import knn, knn_window
from .operators.pip_join import pip_join, radius_join
from .operators.prefix_scan import prefix_filter_long
from .operators.skew import salted_agg
from .operators.tiling import assign_tiles, tile_heatmap
from .operators.multimodal import extract_media_features, media_spans
from .functions.udfs import vincenty_full
from .sources import tables as src

BERLIN = (52.530888, 13.394904)  # GeoHashUtilsTest.kt:30 vector point

_COORD_SUBQ = (
    f"(SELECT doc_id, {src.LAT_SQL} AS lat, {src.LON_SQL} AS lon FROM documents)"
)


def _docs_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return src.with_true_coords(src.load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lat", "lon"
    )


def _with_cell(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "cell_id", C.geohash_interleaved(F.col("lat"), F.col("lon"), 12)
    )


# --------------------------------------------------------------------------
# §2.3 extraction
# --------------------------------------------------------------------------

def q_extract_coords(spark, sf_dir):
    docs = src.documents_with_spans(spark, sf_dir)
    return extract_coordinates(docs, keep_spans=False).select("doc_id", "lat", "lon")


O_EXTRACT = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    f"{src.LAT_SQL} AS lat, {src.LON_SQL} AS lon "
    "FROM documents WHERE doc_id % 10 < 6"
)


# --------------------------------------------------------------------------
# §2.4 cell indexing
# --------------------------------------------------------------------------

def q_geohash_encode(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    return df.select(
        "doc_id",
        C.geohash(F.col("lat"), F.col("lon"), 12).alias("cell12"),
        C.geohash(F.col("lat"), F.col("lon"), 5).alias("cell5"),
        C.geohash_interleaved(F.col("lat"), F.col("lon"), 12).alias("cell_id"),
    )


O_GEOHASH = (
    "SELECT doc_id, "
    f"{C.geohash_sql('lat', 'lon', 12)} AS cell12, "
    f"{C.geohash_sql('lat', 'lon', 5)} AS cell5, "
    f"{C.geohash_long_sql('lat', 'lon', 12)} AS cell_id "
    f"FROM {_COORD_SUBQ}"
)


def q_tile_assign(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    return assign_tiles(df, zooms=[8, 12, 16, 22]).select(
        "doc_id", "zoom", "tile_x", "tile_y"
    )


def _tile_oracle() -> str:
    x22, y22 = C.tile_xy_sql("lat", "lon", 22)
    sub = f"(SELECT doc_id, {x22} AS x22, {y22} AS y22 FROM {_COORD_SUBQ})"
    selects = [
        f"SELECT doc_id, {z} AS zoom, "
        f"CAST(x22 >> {22 - z} AS INT) AS tile_x, "
        f"CAST(y22 >> {22 - z} AS INT) AS tile_y FROM {sub}"
        for z in (8, 12, 16, 22)
    ]
    return " UNION ALL ".join(selects)


def q_quadkey(spark, sf_dir):
    df = _docs_coords(spark, sf_dir)
    x, y = C.tile_xy(F.col("lat"), F.col("lon"), 12)
    df = df.select("doc_id", x.alias("tx"), y.alias("ty"))
    return df.select(
        "doc_id",
        F.col("tx").alias("tile_x"),
        F.col("ty").alias("tile_y"),
        C.quadkey(F.col("tx"), F.col("ty"), 12).alias("qk"),
        C.quadkey_long(F.col("tx"), F.col("ty"), 12).alias("qk_long"),
    )


def _quadkey_oracle() -> str:
    x, y = C.tile_xy_sql("lat", "lon", 12)
    sub = f"(SELECT doc_id, {x} AS tx, {y} AS ty FROM {_COORD_SUBQ})"
    return (
        "SELECT doc_id, tx AS tile_x, ty AS tile_y, "
        f"{C.quadkey_sql('tx', 'ty', 12)} AS qk, "
        f"{C.quadkey_long_sql('tx', 'ty', 12)} AS qk_long FROM {sub}"
    )


def q_tile_bbox(spark, sf_dir):
    """Tile NW corner + bbox via inverse Mercator (Tile.kt:76-102,
    187-207), all native Columns; r9-rounded (atan/sinh are libm;
    DuckDB lacks sinh so the oracle uses (exp(t)-exp(-t))/2)."""
    from .operators.tiling import with_tile, with_tile_bbox

    df = _docs_coords(spark, sf_dir)
    t = with_tile(df, 12)
    out = with_tile_bbox(t, 12)
    return out.select(
        "doc_id",
        "tile_x",
        "tile_y",
        F.round("west", 9).alias("west_r9"),
        F.round("south", 9).alias("south_r9"),
        F.round("east", 9).alias("east_r9"),
        F.round("north", 9).alias("north_r9"),
    )


def _tile_bbox_oracle() -> str:
    import math

    n = 1 << 12
    x, y = C.tile_xy_sql("lat", "lon", 12)
    sub = f"(SELECT doc_id, {x} AS tx, {y} AS ty FROM {_COORD_SUBQ})"

    def top_left(xe: str, ye: str, fix: bool) -> tuple[str, str]:
        lon = f"(CAST({xe} AS DOUBLE) / {float(n)!r} * 360.0 - 180.0)"
        t = f"({math.pi!r} * (1.0 - 2.0 * CAST({ye} AS DOUBLE) / {float(n)!r}))"
        sinh = f"((exp({t}) - exp(-{t})) / 2.0)"
        lat = (
            f"greatest({C.TILE_MIN_LAT!r}, least({C.TILE_MAX_LAT!r}, "
            f"atan({sinh}) * 180.0 / {math.pi!r}))"
        )
        if fix:
            lon = f"(CASE WHEN {lon} <= -180.0 THEN 180.0 ELSE {lon} END)"
            lat = (
                f"(CASE WHEN {lat} >= 85.051128 THEN {C.TILE_MIN_LAT!r} "
                f"ELSE {lat} END)"
            )
        return lon, lat

    tl_lon, tl_lat = top_left("tx", "ty", False)
    br_lon, br_lat = top_left(f"((tx + 1) % {n})", f"((ty + 1) % {n})", True)
    return (
        f"SELECT doc_id, tx AS tile_x, ty AS tile_y, "
        f"round({tl_lon}, 9) AS west_r9, round({br_lat}, 9) AS south_r9, "
        f"round({br_lon}, 9) AS east_r9, round({tl_lat}, 9) AS north_r9 "
        f"FROM {sub}"
    )


def q_tile_neighbors(spark, sf_dir):
    """8-neighborhood per doc tile at zoom 6 (Tile.kt:104-123: E/W wrap
    mod 2^z, N/S clamp; diagonals compose) — the tile k-ring expansion
    primitive, all native int Columns.  Low zoom so fixture coords near
    x=0/x=n-1 actually exercise the wrap in the oracle comparison."""
    df = _docs_coords(spark, sf_dir)
    x, y = C.tile_xy(F.col("lat"), F.col("lon"), 6)
    df = df.select("doc_id", x.alias("tile_x"), y.alias("tile_y"))
    nb = C.tile_neighbors(F.col("tile_x"), F.col("tile_y"), 6)
    return df.select(
        "doc_id",
        "tile_x",
        "tile_y",
        *[
            c.cast("int").alias(f"{d}_{ax}")
            for d, (cx, cy) in nb.items()
            for ax, c in (("x", cx), ("y", cy))
        ],
    )


def _tile_neighbors_oracle() -> str:
    x, y = C.tile_xy_sql("lat", "lon", 6)
    sub = f"(SELECT doc_id, {x} AS tile_x, {y} AS tile_y FROM {_COORD_SUBQ})"
    nb = C.tile_neighbors_sql("tile_x", "tile_y", 6)
    cols = ", ".join(
        f"CAST({c} AS INT) AS {d}_{ax}"
        for d, (cx, cy) in nb.items()
        for ax, c in (("x", cx), ("y", cy))
    )
    return f"SELECT doc_id, tile_x, tile_y, {cols} FROM {sub}"


def q_cover_cells(spark, sf_dir):
    """The covering family exposed as a relation: per fixture polygon,
    the (cell, is_border) set from geoHashesForPolygon
    (GeoHashUtils.kt:442-607) — the broadcast build side of the PIP
    join.  Driver-side iterative algorithm -> rows-only check (the
    covering invariants are pytest-pinned in test_covering.py)."""
    from .operators.pip_join import build_cell_relation
    from .fixtures import polygons_np

    rows, cell_len = build_cell_relation(polygons_np(None), max_length=6)
    df = spark.createDataFrame(
        rows, "polygon_id string, cell_key long, is_border boolean"
    )
    return df.select(
        "polygon_id",
        C.geohash_render(F.col("cell_key"), cell_len).alias("cell"),
        "is_border",
    ).orderBy("polygon_id", "cell")


def q_prefix_scan(spark, sf_dir):
    df = _with_cell(_docs_coords(spark, sf_dir))
    return prefix_filter_long(df, "u33").select(
        "doc_id", C.geohash_render(F.col("cell_id"), 12).alias("cell12")
    )


O_PREFIX = (
    f"SELECT doc_id, cell12 FROM (SELECT doc_id, "
    f"{C.geohash_sql('lat', 'lon', 12)} AS cell12 FROM {_COORD_SUBQ}) "
    "WHERE substr(cell12, 1, 3) = 'u33'"
)


# --------------------------------------------------------------------------
# §2.4bis S2 cell index (north-rule "H3/S2 index"; kernels/s2.py +
# functions/s2cell.py — native Column encode, no UDF)
# --------------------------------------------------------------------------

_S2_LSB12 = 1 << (2 * (30 - 12))
# level-8 ancestor covering the Berlin hot cluster (sources.tables puts
# 20% of docs at lat 52.45-52.57, lon 13.35-13.43)
_S2_BERLIN8 = int(s2k.cell_id(52.5, 13.39, 8)[0])
_S2_SCAN_LO = int(s2k.sortable(s2k.range_min(_S2_BERLIN8))[0])
_S2_SCAN_HI = int(s2k.sortable(s2k.range_max(_S2_BERLIN8))[0])


def q_s2_encode(spark, sf_dir):
    """Leaf via the Arrow-batched encode UDF (the hot path — 8.4M
    rows/s; the native F.aggregate fold is 430x slower, see
    udfs.s2_cell_udf), then ancestor/token/sortable as native bit
    algebra on the leaf column."""
    from .functions.udfs import s2_cell_udf

    df = _docs_coords(spark, sf_dir).withColumn(
        "s2_30", s2_cell_udf(30)(F.col("lat"), F.col("lon"))
    )
    parent12 = S2.s2_parent(F.col("s2_30"), 12)
    return df.select(
        "doc_id",
        "s2_30",
        parent12.alias("s2_12"),
        S2.s2_token(parent12).alias("token12"),
        S2.s2_sortable(F.col("s2_30")).alias("sort30"),
    )


def _s2_encode_oracle() -> str:
    inner = S2.s2_encode_oracle(_COORD_SUBQ, 30, id_alias="s2_30")
    return (
        "SELECT doc_id, s2_30, s2_12, "
        "rtrim(lpad(lower(hex(s2_12)), 16, '0'), '0') AS token12, "
        "xor(s2_30, (-9223372036854775807 - 1)) AS sort30 FROM "
        f"(SELECT doc_id, s2_30, (s2_30 & {-_S2_LSB12}) | {_S2_LSB12} AS s2_12 "
        f"FROM ({inner}))"
    )


def q_s2_range_scan(spark, sf_dir):
    """All docs inside one ancestor cell = ONE integer range predicate on
    the leaf id (sign-bit-flipped so BETWEEN is unsigned order).  On a
    leaf-sorted/partitioned table this is the S2 analogue of the geohash
    prefix scan: pure min/max row-group + partition pruning."""
    from .functions.udfs import s2_cell_udf

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("s2_30", s2_cell_udf(30)(F.col("lat"), F.col("lon")))
    return df.where(
        S2.s2_sortable(F.col("s2_30")).between(_S2_SCAN_LO, _S2_SCAN_HI)
    ).select("doc_id", "s2_30")


def _s2_range_oracle() -> str:
    inner = S2.s2_encode_oracle(_COORD_SUBQ, 30, id_alias="s2_30")
    return (
        f"SELECT doc_id, s2_30 FROM ({inner}) "
        "WHERE xor(s2_30, (-9223372036854775807 - 1)) "
        f"BETWEEN {_S2_SCAN_LO} AND {_S2_SCAN_HI}"
    )


def q_s2_radius_join(spark, sf_dir):
    """Same result set as ``radius_join`` (the oracle is the bare
    distance predicate), pruned through the S2 cap covering instead of
    the geohash circle cover — so a hash mismatch here would mean the
    covering dropped a true match."""
    from .operators.s2_join import s2_radius_join

    df = _docs_coords(spark, sf_dir)
    out = s2_radius_join(df, BERLIN[0], BERLIN[1], 4000.0)
    return out.select("doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3"))


_S2_HEAT_LEVELS = (4, 8, 12)


def q_s2_heatmap(spark, sf_dir):
    """Multi-level S2 cell counts (the pyramid rollup of tile_heatmap on
    the S2 index): leaf once via the Arrow UDF, ancestors by native bit
    algebra, one explode + one hash aggregation (map-side partial)."""
    from .functions.udfs import s2_cell_udf

    df = _docs_coords(spark, sf_dir).withColumn(
        "s2_30", s2_cell_udf(30)(F.col("lat"), F.col("lon"))
    )
    levels = F.array(
        *[
            F.struct(
                F.lit(lv).alias("level"),
                S2.s2_parent(F.col("s2_30"), lv).alias("cell"),
            )
            for lv in _S2_HEAT_LEVELS
        ]
    )
    return (
        df.select(F.explode(levels).alias("lc"))
        .groupBy(F.col("lc.level").alias("level"), F.col("lc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _s2_heatmap_oracle() -> str:
    inner = S2.s2_encode_oracle(_COORD_SUBQ, 30, id_alias="s2_30")
    parts = []
    for lv in _S2_HEAT_LEVELS:
        lsb = 1 << (2 * (30 - lv))
        parts.append(
            f"SELECT {lv} AS level, (s2_30 & {-lsb}) | {lsb} AS cell "
            f"FROM ({inner})"
        )
    return (
        "SELECT level, cell, COUNT(*) AS n_docs FROM ("
        + " UNION ALL ".join(parts)
        + ") GROUP BY level, cell"
    )


def q_s2_pip_join(spark, sf_dir):
    """PIP join through the S2 index (polygon_covering + border
    re-check); shares the pip oracle — identical answer to the
    geohash-path pip_join on the same fixture polygons."""
    from .operators.s2_join import s2_pip_join

    df = _docs_coords(spark, sf_dir)
    return s2_pip_join(df).select("doc_id", "polygon_id")


def q_s2_radius_join_bulk(spark, sf_dir):
    """Bulk radius join via distributed per-query S2 cap coverings; the
    covering is a conservative cap superset, so the oracle is the bare
    per-query distance predicate — no ring/extent mirroring needed."""
    from .operators.s2_join import s2_radius_join_bulk

    pts = _docs_coords(spark, sf_dir)
    qs = (
        _docs_coords(spark, sf_dir)
        .where(F.col("doc_id").cast("long") % 40 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
            (
                F.lit(2000.0)
                + (F.col("doc_id").cast("long") % 5) * F.lit(1000.0)
            ).alias("radius_m"),
        )
    )
    out = s2_radius_join_bulk(pts, qs)  # level auto-derived from radii
    return out.select(
        "query_id", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def _s2_radius_bulk_oracle() -> str:
    hav = C.haversine_sql("p.lat", "p.lon", "q.qlat", "q.qlon")
    return (
        f"WITH pts AS (SELECT doc_id, lat, lon FROM {_COORD_SUBQ}), "
        "qs AS (SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "2000.0 + (CAST(doc_id AS BIGINT) % 5) * 1000.0 AS radius_m "
        "FROM pts WHERE CAST(doc_id AS BIGINT) % 40 = 0) "
        f"SELECT q.query_id, p.doc_id, round({hav}, 3) AS dist_r3 "
        f"FROM qs q JOIN pts p ON {hav} <= q.radius_m"
    )


def q_s2_pip_join_big(spark, sf_dir):
    """PIP join vs a polygon RELATION through the S2 index (distributed
    mapInPandas covering, border rows ray-cast against their own rings
    — the 10^5+-polygon path).  Same answer as s2_pip_join/pip_join on
    the fixtures, so it shares the pip oracle."""
    from .operators.pip_join import polygons_as_df
    from .operators.s2_join import s2_pip_join_distributed

    df = _docs_coords(spark, sf_dir)
    polys = polygons_as_df(spark)
    return s2_pip_join_distributed(df, polys, level=13).select(
        "doc_id", "polygon_id"
    )


def q_s2_pip_semi(spark, sf_dir):
    """One-pass broadcast semi join on the S2 index (same grouped-cell
    shape as the geohash pip_semi; shares its oracle)."""
    from .operators.s2_join import s2_pip_semi_anti

    df = _docs_coords(spark, sf_dir)
    return s2_pip_semi_anti(df, how="left_semi").select("doc_id", "lat", "lon")


def q_s2_pip_anti(spark, sf_dir):
    from .operators.s2_join import s2_pip_semi_anti

    df = _docs_coords(spark, sf_dir)
    return s2_pip_semi_anti(df, how="left_anti").select("doc_id", "lat", "lon")


def q_s2_knn(spark, sf_dir):
    """Expanding-cap S2 kNN; the oracle is the same exact top-k by
    haversine as the geohash-ring knn (O_KNN), so a hash mismatch means
    the cap expansion stopped before the true kth neighbor."""
    from .operators.s2_join import s2_knn

    df = _docs_coords(spark, sf_dir)
    out = s2_knn(df, [("berlin", BERLIN[0], BERLIN[1])], k=10)
    return out.select(
        "query_id", "rank", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def q_gh_decode(spark, sf_dir):
    """Geohash decode: cell12 -> bbox + center (GeoHashUtils.kt:158-213;
    bisection kernel == closed-form dyadic grid bit-for-bit, so the SQL
    oracle uses the closed form at full float64 precision)."""
    from .functions.udfs import gh_decode, gh_decode_bbox

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell12", C.geohash(F.col("lat"), F.col("lon"), 12))
    bbox = gh_decode_bbox(F.col("cell12"))
    ctr = gh_decode(F.col("cell12"))
    return df.select(
        "doc_id",
        "cell12",
        bbox["west"].alias("west"),
        bbox["south"].alias("south"),
        bbox["east"].alias("east"),
        bbox["north"].alias("north"),
        ctr["lon"].alias("center_lon"),
        ctr["lat"].alias("center_lat"),
    )


def _gh_decode_oracle() -> str:
    ilat = C.cell_index_sql("lat", -90.0, 180.0, 30)
    ilon = C.cell_index_sql("lon", -180.0, 360.0, 30)
    sub = (
        f"(SELECT doc_id, lat, lon, {ilat} AS ia, {ilon} AS io FROM {_COORD_SUBQ})"
    )
    span_lat = repr(180.0 / (1 << 30))
    span_lon = repr(360.0 / (1 << 30))
    cell = C.geohash_render_sql(
        C.geohash_long_from_indices_sql("ia", "io", 12), 12
    )
    return (
        f"SELECT doc_id, {cell} AS cell12, "
        f"io * {span_lon} - 180.0 AS west, "
        f"ia * {span_lat} - 90.0 AS south, "
        f"(io + 1) * {span_lon} - 180.0 AS east, "
        f"(ia + 1) * {span_lat} - 90.0 AS north, "
        f"((io * {span_lon} - 180.0) + ((io + 1) * {span_lon} - 180.0)) / 2 "
        "AS center_lon, "
        f"((ia * {span_lat} - 90.0) + ((ia + 1) * {span_lat} - 90.0)) / 2 "
        f"AS center_lat FROM {sub}"
    )


def q_gh_neighbors(spark, sf_dir):
    """N/E/S/W same-length neighbor hashes (GeoHashUtils.kt:220-280) of
    the length-5 cell.  Oracle addresses neighbors by cell-index ±1
    (equivalent to the reference's displace-center-and-re-encode for all
    non-pole cells).  The oracle's index±1 addressing is undefined in the
    top/bottom latitude row, so BOTH sides filter to |lat| <= 85 — the
    invariant is enforced, not assumed (no-op on the sandbox fixture,
    whose coords stay within ±85)."""
    from .functions.udfs import gh_neighbors

    df = _docs_coords(spark, sf_dir).where(F.abs(F.col("lat")) <= 85.0)
    df = df.withColumn("cell5", C.geohash(F.col("lat"), F.col("lon"), 5))
    nb = gh_neighbors(F.col("cell5"))
    return df.select(
        "doc_id",
        "cell5",
        F.element_at(nb, 1).alias("n"),
        F.element_at(nb, 2).alias("e"),
        F.element_at(nb, 3).alias("s"),
        F.element_at(nb, 4).alias("w"),
    )


def _gh_neighbors_oracle() -> str:
    lat_bits, lon_bits = 12, 13
    ilat = C.cell_index_sql("lat", -90.0, 180.0, lat_bits)
    ilon = C.cell_index_sql("lon", -180.0, 360.0, lon_bits)
    sub = (
        f"(SELECT doc_id, {ilat} AS ia, {ilon} AS io FROM {_COORD_SUBQ} "
        "WHERE abs(lat) <= 85.0)"
    )

    def cell(ia: str, io: str) -> str:
        return C.geohash_render_sql(
            C.geohash_long_from_indices_sql(ia, io, 5), 5
        )

    return (
        f"SELECT doc_id, {cell('ia', 'io')} AS cell5, "
        f"{cell('ia + 1', 'io')} AS n, "
        f"{cell('ia', f'(io + 1) % {1 << lon_bits}')} AS e, "
        f"{cell('ia - 1', 'io')} AS s, "
        f"{cell('ia', f'(io - 1 + {1 << lon_bits}) % {1 << lon_bits}')} AS w "
        f"FROM {sub}"
    )


# --------------------------------------------------------------------------
# §2.3 / §2.7 UTM / UPS / MGRS projections
# --------------------------------------------------------------------------

def q_utm_roundtrip(spark, sf_dir):
    """WGS84 -> UTM -> WGS84 over the UTM validity band lat in [-80, 84]
    (both sides filter; UPS rows stay pytest-covered).  Oracle unrolls
    the forward/inverse power series and the ulp-guarded footpoint
    iteration in SQL (kernels.utm.utm_roundtrip_oracle_sql); err_m
    compared at r4 where numpy-vs-libm trig drift (~1e-9 m) is
    negligible."""
    from .operators.projection import utm_roundtrip

    df = _docs_coords(spark, sf_dir).where(
        (F.col("lat") >= -80.0) & (F.col("lat") <= 84.0)
    )
    out = utm_roundtrip(df)
    return out.select(
        "doc_id",
        "longitude_zone",
        "latitude_zone_letter",
        F.round(F.col("easting"), 2).alias("easting_r2"),
        F.round(F.col("northing"), 2).alias("northing_r2"),
        F.round(F.col("err_m"), 4).alias("err_m_r4"),
    )


def _utm_roundtrip_oracle() -> str:
    from .kernels.utm import utm_roundtrip_oracle_sql

    src = (
        f"(SELECT doc_id, lat, lon FROM {_COORD_SUBQ} "
        "WHERE lat >= -80.0 AND lat <= 84.0)"
    )
    inner = utm_roundtrip_oracle_sql(src)
    err = C.haversine_sql("lat", "lon", "lat2", "lon2")
    return (
        "SELECT doc_id, longitude_zone, latitude_zone_letter, "
        "round(easting, 2) AS easting_r2, round(northing, 2) AS northing_r2, "
        f"round({err}, 4) AS err_m_r4 FROM ({inner})"
    )


def q_mgrs(spark, sf_dir):
    """UTM -> MGRS grid letters + USNG string + back-conversion error
    (mgrs.kt:107-225).  Oracle = the UTM SQL twin plus the grid-letter
    table lookups, 100km modular arithmetic, and the banded-northing
    while-loop unrolled (mgrs.kt:218-220 adds 2,000,000 at most a few
    times)."""
    from .operators.projection import mgrs_roundtrip

    # MGRS supports the UTM band only (mgrs.kt:12, FIXME at :203)
    df = _docs_coords(spark, sf_dir).where(F.col("lat").between(-80.0, 84.0))
    out = mgrs_roundtrip(df)
    return out.select(
        "doc_id",
        "longitude_zone",
        "latitude_zone_letter",
        "grid_col",
        "grid_row",
        "usng",
        "err_easting",
        "err_northing",
    )


def _mgrs_oracle() -> str:
    from .kernels import mgrs as kmgrs
    from .kernels.utm import utm_roundtrip_oracle_sql

    src = (
        f"(SELECT doc_id, lat, lon FROM {_COORD_SUBQ} "
        "WHERE lat >= -80.0 AND lat <= 84.0)"
    )
    utm = utm_roundtrip_oracle_sql(src)
    q = (
        "SELECT doc_id, longitude_zone, latitude_zone_letter, easting, "
        f"northing FROM ({utm})"
    )
    # forward: toMgrs (mgrs.kt:107-161)
    q = (
        "SELECT *, "
        "((1 + CAST(floor(northing) AS BIGINT) // 100000) % 20) AS _row, "
        "((CAST(floor(easting) AS BIGINT) // 100000) % 8) AS _col, "
        "(CASE WHEN longitude_zone % 6 = 0 THEN 6 ELSE longitude_zone % 6 END) AS _set, "
        "CAST(floor(easting % 100000) AS BIGINT) AS grid_easting, "
        "CAST(floor(northing % 100000) AS BIGINT) AS grid_northing "
        "FROM (" + q + ")"
    )
    q = (
        "SELECT *, "
        "(CASE WHEN _col = 0 THEN 7 ELSE _col - 1 END) AS _acol, "
        "(CASE WHEN _row = 0 THEN 19 ELSE _row - 1 END) AS _arow "
        "FROM (" + q + ")"
    )
    col_cases = " ".join(
        f"WHEN _set = {s} THEN substr('{kmgrs._COL_LETTERS[s]}', "
        "CAST(_acol AS INT) + 1, 1)"
        for s in range(1, 7)
    )
    row_cases = " ".join(
        f"WHEN _set = {s} THEN "
        f"substr('{kmgrs._ROW_EVEN if s % 2 == 0 else kmgrs._ROW_ODD}', "
        "CAST(_arow AS INT) + 1, 1)"
        for s in range(1, 7)
    )
    q = (
        f"SELECT *, (CASE {col_cases} END) AS grid_col, "
        f"(CASE {row_cases} END) AS grid_row FROM (" + q + ")"
    )
    # inverse: MgrsCoordinate.toUtm (mgrs.kt:202-225)
    col_idx_cases = " ".join(
        f"WHEN grid_col IN ({', '.join(repr(c) for c in letters)}) THEN {i}"
        for i, letters in enumerate(kmgrs._EASTING_ARRAY)
        if letters
    )
    row_idx_cases = " ".join(
        f"WHEN _set = {s} THEN "
        f"(strpos('{kmgrs._ROW_EVEN if s % 2 == 0 else kmgrs._ROW_ODD}', "
        "grid_row) - 1)"
        for s in range(1, 7)
    )
    min_n_cases = " ".join(
        f"WHEN latitude_zone_letter = '{ch}' THEN CAST({mn!r} AS DOUBLE)"
        for ch, (mn, _off) in kmgrs._BAND.items()
    )
    off_n_cases = " ".join(
        f"WHEN latitude_zone_letter = '{ch}' THEN CAST({off!r} AS DOUBLE)"
        for ch, (_mn, off) in kmgrs._BAND.items()
    )
    q = (
        f"SELECT *, (CASE {col_idx_cases} ELSE 0 END) AS _colidx, "
        f"(CASE {row_idx_cases} END) AS _rowidx, "
        f"(CASE {min_n_cases} END) AS _minn, "
        f"(CASE {off_n_cases} END) AS _offn FROM (" + q + ")"
    )
    q = (
        "SELECT *, "
        "(CAST(_colidx * 100000 + grid_easting AS DOUBLE)) AS easting_back, "
        "(CAST(_rowidx * 100000 AS DOUBLE) + _offn) AS _nb FROM (" + q + ")"
    )
    for _ in range(6):  # bounded while utm_n < min_n: += 2_000_000
        q = (
            "SELECT * EXCLUDE (_nb), "
            "(CASE WHEN _nb < _minn THEN _nb + 2000000 ELSE _nb END) AS _nb "
            "FROM (" + q + ")"
        )
    q = (
        "SELECT *, (_nb + grid_northing) AS northing_back FROM (" + q + ")"
    )
    usng = (
        "(CAST(longitude_zone AS VARCHAR) || latitude_zone_letter || ' ' || "
        "grid_col || grid_row || ' ' || "
        "lpad(CAST(grid_easting AS VARCHAR), 5, '0') || ' ' || "
        "lpad(CAST(grid_northing AS VARCHAR), 5, '0'))"
    )
    return (
        "SELECT doc_id, longitude_zone, latitude_zone_letter, grid_col, "
        f"grid_row, {usng} AS usng, "
        "abs(floor(easting) - easting_back) AS err_easting, "
        "abs(floor(northing) - northing_back) AS err_northing "
        "FROM (" + q + ")"
    )


def q_utm_parse(spark, sf_dir):
    """findUTMCoordinates over free text (utm.kt:120-142) — UTM strings
    synthesized from doc_id by integer arithmetic so the oracle can
    reproduce them without regex."""
    from .operators.projection import find_utm_in_text

    docs = src.load_table(spark, sf_dir, "documents").select("doc_id")
    txt = F.concat(
        F.lit("at "),
        (F.col("doc_id") % 60 + 1).cast("string"),
        F.lit(" "),
        F.substring(
            F.lit("CDEFGHJKLMNPQRSTUVWX"),
            (F.col("doc_id") % 20 + 1).cast("int"),
            1,
        ),
        F.lit(" "),
        (100000 + (F.col("doc_id") * 37) % 400000).cast("string"),
        F.lit(" "),
        ((F.col("doc_id") * 53) % 9000000).cast("string"),
        F.lit(" ok"),
    )
    df = docs.withColumn("text", txt)
    return find_utm_in_text(df, "text", keep=["doc_id"]).select(
        "doc_id", "longitude_zone", "latitude_zone_letter", "easting", "northing"
    )


O_UTM_PARSE = (
    "SELECT doc_id, CAST(doc_id % 60 + 1 AS INT) AS longitude_zone, "
    "substr('CDEFGHJKLMNPQRSTUVWX', CAST(doc_id % 20 + 1 AS INT), 1) "
    "AS latitude_zone_letter, "
    "CAST(100000 + (doc_id * 37) % 400000 AS DOUBLE) AS easting, "
    "CAST((doc_id * 53) % 9000000 AS DOUBLE) AS northing FROM documents"
)


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
    from .operators.pip_join import pip_join_distributed, polygons_as_df

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
    from .operators.knn import radius_join_bulk

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
    from .kernels.geometry import DEGREE_LATITUDE_METERS as deg_m

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
    from .operators.segment_join import segment_join

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
    from .operators.segment_join import segment_join_oracle_sql

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
    from .operators.interpolate import idw_interpolate

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
    from .operators.interpolate import idw_oracle_sql

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
    from .operators.knn import knn_bulk

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
    from .kernels.vincenty import vincenty_oracle_sql

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
    from .operators import transform as tr

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
    from .operators import transform as tr

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
    from .operators import transform as tr

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
    from .operators import transform as tr

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
    from .operators import transform as tr

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
    from .operators import transform as tr

    lat2, lon2 = tr.rotate_around_sql(
        repr(BERLIN[0]), repr(BERLIN[1]), "lat", "lon", 45.0
    )
    return (
        f"SELECT doc_id, round({lat2}, 6) AS lat_r6, "
        f"round({lon2}, 6) AS lon_r6 FROM {_COORD_SUBQ}"
    )


def q_noise_filter(spark, sf_dir):
    """filterNoiseFromPointCloud per cell3 group (GeoGeometry.kt:158-172)."""
    from .operators.transform import filter_noise

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
    from .operators.transform import grouped_convex_hull

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    return grouped_convex_hull(df, "cell1")


def q_concave_hull(spark, sf_dir):
    """calculateConcaveHull per cell1 group (concave-hull.kt:361-389;
    heuristic — invariants pytest-checked, rows-only for the driver)."""
    from .operators.transform import grouped_concave_hull

    df = _docs_coords(spark, sf_dir)
    df = df.withColumn("cell1", C.geohash(F.col("lat"), F.col("lon"), 1))
    return grouped_concave_hull(df, "cell1", k=5, max_recurse=40,
                                max_points=150)


def q_simplify(spark, sf_dir):
    """Douglas-Peucker per cell1 path (points ordered by doc_id;
    GeoGeometry.kt:1376-1410)."""
    from .operators.transform import grouped_simplify

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
    from .fixtures import polygons_np

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
    from .functions.udfs import make_line_poly_intersects_udf
    from .operators import transform as tr

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
    from .operators import transform as tr

    lat2, lon2 = tr.translate_sql("lat", "lon", "0.0", "400.0")
    crossings = " OR ".join(
        C.lines_cross_am_sql(
            "lon", "lat", lon2, lat2, repr(u1), repr(v1), repr(u2), repr(v2)
        )
        for u1, v1, u2, v2 in _berlin_edges()
    )
    from .fixtures import polygons_np

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
    from .functions.udfs import make_polygon_vs_fixed_intersects_udf

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
    from .fixtures import polygons_np

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
    from .operators.pip_join import polygons_as_df
    from .operators.s2_join import s2_overlay_join

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
    from .fixtures import polygons_np

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
    from .operators.s2_join import s2_overlay_join

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
    from .operators.geojson import parse_points, point_geojson

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
    from .operators.geojson import geojson_io_url_col, point_geojson

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
    from .operators.geojson import point_geojson
    from .sources.geojson_file import feature_line

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
    from .operators.geojson import point_geojson
    from .sources.geojson_file import explode_feature_collection, feature_line

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
    from .functions.udfs import make_ring_area_udf
    from .operators.transform import grouped_convex_hull

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


# --------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity / multimodal
# --------------------------------------------------------------------------

def q_dedup_head(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    heads = docs.select(
        F.md5(F.substring(F.col("text"), 1, 16)).alias("head_md5"), "doc_id"
    )
    return (
        heads.groupBy("head_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


O_DEDUP_HEAD = (
    "SELECT md5(substr(text, 1, 16)) AS head_md5, count(*) AS n_dups, "
    "min(doc_id) AS keeper_id FROM documents GROUP BY 1 HAVING count(*) > 1"
)


def q_dedup_exact(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs)


O_DEDUP_EXACT = (
    "SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keeper_id "
    "FROM documents GROUP BY 1 HAVING count(*) > 1"
)


def q_tfidf_sim(spark, sf_dir):
    """Top-20 TF-IDF-cosine document pairs (operators/text.py
    tfidf_topk_pairs): rare-term-blocked candidates, milli-idf /
    ppm-weight floor quantization so pair dots are exact BIGINT sums,
    deterministic (dot DESC, id_a, id_b) TakeOrderedAndProject
    top-k."""
    return text.tfidf_topk_pairs(
        src.load_table(spark, sf_dir, "documents"), k=20
    )


def _tfidf_sim_oracle() -> str:
    return text.tfidf_topk_pairs_oracle_sql("documents", k=20)


def q_token_stats(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_token_stats(docs).select(
        "doc_id",
        "n_tokens",
        "n_chars_m",
        "avg_token_len",
        "bpe_tokens",
        "est_subwords",
    )


O_TOKEN_STATS = (
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "length(text) AS n_chars_m, "
    "CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)"
    " / len(string_split(text, ' ')) AS avg_token_len, "
    "CAST(len(regexp_extract_all(text, '"
    + text.BPE_SPLIT_PATTERN.replace("'", "''")
    + "')) AS BIGINT) AS bpe_tokens, "
    "CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_subwords FROM documents"
)


def q_text_quality(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_quality(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "distinct_ratio"
    )


_SW = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])
O_TEXT_QUALITY = (
    "SELECT doc_id, len(toks) AS n_tokens, "
    f"CAST(len(list_filter(toks, t -> t IN ({_SW}))) AS DOUBLE) / len(toks)"
    " AS stopword_ratio, "
    "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio "
    "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"
)


def q_lang_id(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_lang_score(docs).select(
        "doc_id", "lang_pred", "score_de", "score_en", "score_es", "score_fr"
    )


def _lang_oracle() -> str:
    langs = sorted(text.STOPWORDS)
    score_exprs = {
        lang: (
            "len(list_intersect(list_distinct(string_split(text, ' ')), "
            f"[{', '.join(repr(w) for w in text.STOPWORDS[lang])}]))"
        )
        for lang in langs
    }
    sub = "SELECT doc_id, " + ", ".join(
        f"{e} AS score_{lang}" for lang, e in score_exprs.items()
    ) + " FROM documents"
    case = "CASE "
    for i, lang in enumerate(langs):
        conds = [f"score_{lang} >= score_{o}" for o in langs[i + 1 :]]
        if conds:
            case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
        else:
            case += f"ELSE '{lang}' END"
    return (
        f"SELECT doc_id, {case} AS lang_pred, score_de, score_en, score_es, "
        f"score_fr FROM ({sub})"
    )


def q_fingerprint(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_fingerprint(docs).select("doc_id", "fp_full", "fp_head")


O_FINGERPRINT = (
    "SELECT doc_id, md5(text) AS fp_full, md5(substr(text, 1, 64)) AS fp_head "
    "FROM documents"
)


def q_winnow(spark, sf_dir):
    """Winnowing fingerprint selection (operators/text.py
    winnow_fingerprint, md5_oracle variant — the DuckDB-replayable twin
    of the production rolling-hash path; identical window-min selection
    semantics, pinned equal on selection positions by pytest)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return text.winnow_fingerprint(docs, k=8, w=4, variant="md5_oracle")


def _winnow_oracle(k: int = 8, w: int = 4) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, CAST(gs.i AS BIGINT) AS i,
         substr(md5(substr(text, CAST(gs.i AS INT) + 1, {k})), 1, 8) AS h
  FROM documents,
       LATERAL (SELECT unnest(range(0, length(text) - {k} + 1)) AS i) gs
),
wins AS (
  SELECT doc_id, CAST(ws.s AS BIGINT) AS s
  FROM documents,
       LATERAL (SELECT unnest(range(0, length(text) - {k} - {w} + 2)) AS s) ws
),
ranked AS (
  SELECT w.doc_id, w.s, g.i AS pos, g.h,
         ROW_NUMBER() OVER (
           PARTITION BY w.doc_id, w.s ORDER BY g.h, g.i
         ) AS rn
  FROM wins w
  JOIN grams g ON g.doc_id = w.doc_id AND g.i BETWEEN w.s AND w.s + {w} - 1
)
SELECT DISTINCT doc_id, pos, h FROM ranked WHERE rn = 1
"""


def q_winnow_pairs(spark, sf_dir):
    """Overlap-candidate pairs from winnowing fingerprints
    (operators/text.py winnow_candidates, md5_oracle variant): equi-join
    on selected hashes, hot-hash cap, n_shared >= 4.  k=16 grams: the
    synthetic corpus shares vocabulary so short grams match everywhere
    (k=8 pairs ~80% of all doc pairs); 16-char grams select genuine
    shared passages (47 pairs at sf0.01)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return text.winnow_candidates(
        docs, k=16, w=8, variant="md5_oracle",
        max_bucket_width=256, min_shared=4,
    )


def _winnow_pairs_oracle(
    k: int = 16, w: int = 8, max_width: int = 256, min_shared: int = 4
) -> str:
    sel = _winnow_oracle(k, w)
    return f"""
WITH fp AS (
  SELECT DISTINCT doc_id, h FROM ({sel})
),
guarded AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS _w FROM fp
  ) WHERE _w <= {max_width}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM guarded a JOIN guarded b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
"""


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        src.load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_ann_brute(spark, sf_dir):
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


O_ANN_BRUTE = (
    "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
    "scored AS (SELECT vec_id, "
    " list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
    "    * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))))"
    " AS cos_sim FROM embeddings, q) "
    "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
    "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank "
    "FROM scored) WHERE rank <= 10"
)


def q_embed_quantize(spark, sf_dir):
    """int8 scalar quantization (operators/similarity.py
    quantize_embeddings), exploded to scalar rows for robust hashing.
    Quantization rule floor(v/scale + 0.5) is chosen because numpy,
    Spark SQL, and DuckDB all express it identically (round() differs:
    half-even vs half-away)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    return q.select(
        "vec_id", "scale", F.posexplode("qvec").alias("dim", "q")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "q", "scale")


O_EMBED_QUANTIZE = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127
           AS scale
  FROM embeddings
)
SELECT vec_id, CAST(gs.i AS BIGINT) AS dim,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(CAST(embedding[CAST(gs.i AS INT) + 1] AS DOUBLE)
                            / scale + 0.5) AS INT)
       END AS q,
       scale
FROM s, LATERAL (SELECT unnest(range(0, len(embedding))) AS i) gs
"""


def q_ann_quant(spark, sf_dir):
    """Brute-force top-10 over the int8-quantized store, scored by
    dequantized cosine (quantized_topk) — the oracle re-derives the
    quantization AND the dequantized left-fold score in SQL."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    out = similarity.quantized_topk(q, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


O_ANN_QUANT = (
    "WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
    "s AS (SELECT vec_id, embedding, "
    " list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale"
    " FROM embeddings), "
    "deq AS (SELECT vec_id, list_transform(embedding, x -> "
    " CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) "
    " ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) * scale END) AS d FROM s), "
    "scored AS (SELECT vec_id, "
    " list_sum(list_transform(range(1, 65), i -> d[i] * CAST(qe[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> d[i] * d[i])))"
    "    * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))))"
    " AS cos_sim FROM deq, qv) "
    "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
    "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank "
    "FROM scored) WHERE rank <= 10"
)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-10 — now hash-checked: the hyperplanes are
    deterministic constants (similarity.lsh_planes), so the oracle
    recomputes every bucket in SQL and expresses the multi-probe set as
    bit_count(xor(bucket, query_bucket)) <= probe_hamming."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.ann_topk(emb, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


_COS_64 = (
    "list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)


def _ann_lsh_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    qbucket = similarity.hyperplane_bucket_sql("qe", planes)
    cos = _COS_64.format(a="c.embedding", b="q.qe")
    return (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
        f"b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings), "
        f"qb AS (SELECT {qbucket} AS qbucket FROM q), "
        "cand AS (SELECT b.vec_id, b.embedding FROM b, qb "
        "WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 2), "
        f"scored AS (SELECT c.vec_id, {cos} AS cos_sim FROM cand c, q) "
        "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank FROM scored) "
        "WHERE rank <= 10"
    )


def q_embed_near_dups(spark, sf_dir):
    """Embedding near-dup pairs at threshold via LSH bucket self-join +
    exact cosine verify (similarity.embedding_near_dup_pairs — the
    scale path of the brute-force embed_pairs_topk; no O(n^2) stage).
    Sandbox embeddings are random, so a low threshold keeps the checked
    result non-trivial."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.3)
    return out.select(
        "id_a", "id_b", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


def _embed_near_dups_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    cos = _COS_64.format(a="a.embedding", b="c.embedding")
    return (
        f"WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket "
        "FROM embeddings) "
        f"SELECT id_a, id_b, round(cos_sim, 9) AS cos_r9 FROM ("
        f"SELECT a.vec_id AS id_a, c.vec_id AS id_b, {cos} AS cos_sim "
        "FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) "
        "WHERE cos_sim >= 0.3"
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard over candidate pairs (docs sharing a
    16-char head hash) — the verification stage after LSH."""
    docs = src.load_table(spark, sf_dir, "documents")
    heads = docs.select(
        F.md5(F.substring(F.col("text"), 1, 16)).alias("h"), "doc_id"
    )
    pairs = (
        heads.alias("a")
        .join(heads.alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    out = dedup.ngram_jaccard(docs, pairs)
    return out.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 9).alias("jaccard_r9")
    )


O_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id, md5(substr(text, 1, 16)) AS h,
    list_distinct(list_transform(
      range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
      i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3], ' ')
    )) AS sh
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(a.sh || b.sh)), 9) AS jaccard_r9
FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
"""


def q_embed_pairs_topk(spark, sf_dir):
    """Embedding-cosine near-dup: exact top-20 most-similar pairs
    (brute-force O(n^2) verification twin of the LSH path — sandbox
    embeddings carry no planted dups, so top-k replaces a threshold)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = similarity.cosine(F.col("ea"), F.col("eb"))
    scored = pairs.select("id_a", "id_b", cos.alias("cos_sim"))
    return similarity.ranked_topk(scored, 20, "cos_sim", "id_a", "id_b").select(
        "rank", "id_a", "id_b", F.round("cos_sim", 9).alias("cos_r9")
    )


O_EMBED_PAIRS = """
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
    AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT rank, id_a, id_b, round(cos_sim, 9) AS cos_r9 FROM (
  SELECT id_a, id_b, cos_sim,
    CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id_a ASC, id_b ASC) AS INT)
    AS rank FROM scored) WHERE rank <= 20
"""


def q_ann_ivf(spark, sf_dir):
    """IVF ANN: seeded k-means coarse quantizer + exact cosine inside
    nprobe lists (the second scale path besides hyperplane LSH).  The
    contract query trains on the md5-ordered sample so the oracle
    builder can re-derive the identical sample (and therefore identical
    centroids/probes) without Spark; production default stays xxhash64
    ordering."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=10,
        n_clusters=16,
        nprobe=6,
        sample_hash="md5_60",
    )
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


def _ann_ivf_oracle() -> str | None:
    """Re-derives the training sample (md5-ordered, identical to the
    Spark query's), runs the same driver-side k-means, and bakes the
    centroids into SQL: per-row list assignment = argmax of normalized
    dot over the 16 centroid constants, candidate filter on the probed
    lists, cosine top-10.  Returns None (rows-only fallback) when the
    sf0.01 embeddings parquet isn't where the sandbox puts it.

    COUPLING: the baked constants are only valid for the table the SQL
    will be run against — the driver contract pins the oracle gate to
    sf=0.01, and SPARK_GRAFT_SF_DIR overrides the path for local runs
    at other scales (tools/check_correctness.py sets it)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    import duckdb
    import numpy as np

    con = duckdb.connect()
    sample = con.execute(
        f"SELECT embedding FROM '{path}' ORDER BY "
        "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT "
        "LIMIT 4096"
    ).fetchall()
    qrow = con.execute(
        f"SELECT embedding FROM '{path}' WHERE vec_id = 0"
    ).fetchone()
    con.close()
    vecs = np.array([list(r[0]) for r in sample], dtype=np.float64)
    cent = similarity._kmeans(vecs, min(16, len(vecs)), 42)
    probes = similarity.ivf_probes(cent, [float(x) for x in qrow[0]], 6)

    def dot_norm(c: np.ndarray) -> str:
        lst = ", ".join(repr(float(x)) for x in c)
        return (
            "list_sum(list_transform(range(1, 65), "
            f"j -> (CAST(embedding[j] AS DOUBLE) / nrm) * ([{lst}]::DOUBLE[])[j]))"
        )

    dl = ", ".join(dot_norm(c) for c in cent)
    probe_list = ", ".join(str(p) for p in probes)
    cos = _COS_64.format(a="c.embedding", b="q.qe")
    return (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
        "n AS (SELECT vec_id, embedding, sqrt(list_sum(list_transform("
        "range(1, 65), j -> CAST(embedding[j] AS DOUBLE) "
        "* CAST(embedding[j] AS DOUBLE)))) AS nrm FROM embeddings), "
        f"dls AS (SELECT vec_id, embedding, [{dl}] AS dl FROM n), "
        "assigned AS (SELECT vec_id, embedding, "
        "(list_position(dl, list_max(dl)) - 1) AS ivf_list FROM dls), "
        f"cand AS (SELECT vec_id, embedding FROM assigned "
        f"WHERE ivf_list IN ({probe_list})), "
        f"scored AS (SELECT c.vec_id, {cos} AS cos_sim FROM cand c, q) "
        "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank FROM scored) "
        "WHERE rank <= 10"
    )


def q_ann_join(spark, sf_dir):
    """ANN top-k JOIN: every 50th vector is a QUERY (a relation, not a
    driver-side constant — the bulk twin of ann_lsh): multi-probe
    hyperplane buckets both sides, one equi-join, Arrow cosine, window
    top-5 per query.  The oracle replays buckets + probes in SQL
    (bit_count(xor) <= hamming) and ranks per query."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qvec_id"),
        F.col("embedding").alias("qembedding"),
    )
    out = similarity.ann_join(emb, qs, k=5, n_planes=8, probe_hamming=1)
    return out.select(
        "qvec_id", "rank", "vec_id",
        F.round(F.col("cos_sim"), 9).alias("cos_r9"),
    )


def _ann_join_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    qbucket = similarity.hyperplane_bucket_sql("qe", planes)
    cos = _COS_64.format(a="c.embedding", b="c.qe")
    return (
        f"WITH q AS (SELECT vec_id AS qvec_id, embedding AS qe, "
        f"{qbucket} AS qb FROM embeddings WHERE vec_id % 50 = 0), "
        f"b AS (SELECT vec_id, embedding, {bucket} AS bucket "
        "FROM embeddings), "
        "cand AS (SELECT q.qvec_id, q.qe, b.vec_id, b.embedding "
        "FROM q JOIN b ON bit_count(xor(q.qb, b.bucket)) <= 1), "
        f"scored AS (SELECT qvec_id, vec_id, {cos} AS cos_sim "
        "FROM cand c) "
        "SELECT qvec_id, rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT qvec_id, vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY qvec_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) "
        "AS rank FROM scored) WHERE rank <= 5"
    )


def q_minhash_candidates(spark, sf_dir):
    """LSH candidate pairs with the md5_60 token hash so DuckDB can
    replay the full shingle -> minhash -> band -> bucket-join pipeline
    (production default stays xxhash64 — same plan shape, cheaper hash;
    pytest covers both paths)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.minhash_candidates(
        docs, num_hashes=16, bands=4, token_hash="md5_60"
    )


def q_simhash(spark, sf_dir):
    """One-pass SimHash (explode -> 60 conditional-sum bit votes).  The
    md5_60 token hash is bit-for-bit reproducible in DuckDB, so this
    query is oracle-checked; production defaults to xxhash64 (same vote
    logic, cheaper hash — parity pytest covers both)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, token_hash="md5_60")


def q_pipeline_near_dup(spark, sf_dir):
    """END-TO-END training-data dedup pipeline as ONE composed query —
    the shape a 100 TB corpus job actually runs: exact dedup (hash
    groupBy keeper) -> quality gate (native token count) -> MinHash LSH
    candidates (banded bucket join, hot-bucket cap) -> exact n-gram
    Jaccard verification of the candidate pairs.  Every stage is an
    existing operator; this query pins their COMPOSITION with a single
    DuckDB oracle."""
    docs = src.load_table(spark, sf_dir, "documents")
    survivors = dedup.dedup_exact(docs).where(
        F.size(F.split(F.col("text"), " ")) >= 8
    )
    cands = dedup.minhash_candidates(
        survivors, num_hashes=16, bands=4, token_hash="md5_60"
    )
    verified = dedup.ngram_jaccard(survivors, cands.select("id_a", "id_b"))
    return (
        cands.join(verified, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            F.round(F.col("jaccard"), 9).alias("jaccard_r9"),
        )
    )


def _pipeline_near_dup_oracle() -> str:
    """Composes the stage oracles: exact-dedup + quality CTE feeds the
    (parenthesized, WITH-bearing) minhash twin as its source table; the
    Jaccard twin re-derives shingles from the same survivors."""
    minhash = dedup.minhash_candidates_oracle_sql(table="base")
    toks = "string_split(text, ' ')"
    shingles = (
        "list_distinct(list_transform("
        f"range(0, greatest(len({toks}) - 3, 0) + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + 3], ' ')))"
    )
    return (
        "WITH base AS ("
        " SELECT d.doc_id, d.text FROM documents d"
        " JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper"
        "       FROM documents GROUP BY md5(text)) k"
        "   ON md5(d.text) = k.h AND d.doc_id = k.keeper"
        f" WHERE len({toks}) >= 8), "
        f"cand AS (SELECT * FROM ({minhash})), "
        f"sh AS (SELECT doc_id, {shingles} AS sh FROM base) "
        "SELECT c.id_a, c.id_b, c.n_shared_bands, "
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
        " / len(list_distinct(a.sh || b.sh)), 9) AS jaccard_r9 "
        "FROM cand c JOIN sh a ON c.id_a = a.doc_id "
        "JOIN sh b ON c.id_b = b.doc_id"
    )


def q_dedup_groups(spark, sf_dir):
    """Near-dup GROUPS: minhash LSH candidate pairs -> distributed
    connected components (alternating large-star/small-star, Kiveris
    et al. 2014) -> every document labeled with its duplicate-group id
    (min doc_id in the component; singletons label themselves).  The
    stage a real corpus dedup runs AFTER pair generation, so keepers
    are chosen per GROUP, not per pair (pairs alone under-delete:
    a-b + b-c near-dups keep both a and c unless the chain is
    closed)."""
    docs = src.load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidates(
        docs, num_hashes=16, bands=4, token_hash="md5_60"
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("group_id"),
        )
    )


def _dedup_groups_oracle() -> str:
    """Transitive closure by recursive CTE over the minhash-pair twin;
    component label = min reachable node — the same fixed point the
    alternating large-star/small-star rounds converge to."""
    minhash = dedup.minhash_candidates_oracle_sql()
    return (
        f"WITH RECURSIVE pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({minhash})), "
        "edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "labels AS (SELECT u AS node, least(u, min(v)) AS grp "
        "FROM reach GROUP BY u) "
        "SELECT d.doc_id, coalesce(l.grp, d.doc_id) AS group_id "
        "FROM documents d LEFT JOIN labels l ON d.doc_id = l.node"
    )


def q_media_features(spark, sf_dir):
    docs = src.documents_with_spans(spark, sf_dir)
    return extract_media_features(media_spans(docs)).select(
        "doc_id", "media_ref", "width", "height", F.size("feature").alias("dim")
    )


def q_frame_sample(spark, sf_dir):
    """Video frame sampling plumbing (mapInPandas UDTF shape, stub
    decode): 4 frames per media span at a 4-frame stride, 25 fps
    timestamps."""
    from .operators.multimodal import sample_frames

    docs = src.documents_with_spans(spark, sf_dir)
    frames = sample_frames(media_spans(docs), every_n=4, total_frames=16)
    return frames.select(
        "doc_id", "media_ref", "frame_idx", "ts_ms",
        F.size("frame").alias("frame_dim"),
    )


O_FRAME_SAMPLE = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "'media://' || lpad(CAST((doc_id * 2654435761) % 4294967296 AS VARCHAR), 16, '0')"
    " AS media_ref, CAST(f AS INT) AS frame_idx, CAST(f * 40 AS INT) AS ts_ms, "
    "16 AS frame_dim FROM documents, (SELECT unnest([0, 4, 8, 12]) AS f)"
)


O_MEDIA = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "'media://' || lpad(CAST((doc_id * 2654435761) % 4294967296 AS VARCHAR), 16, '0')"
    " AS media_ref, 8 AS width, 8 AS height, 8 AS dim FROM documents"
)


# --------------------------------------------------------------------------
# §2.4ter hexgrid cell index (the north star's "H3 k-ring" noun;
# kernels/hexgrid.py, operators/hex_join.py)
# --------------------------------------------------------------------------

_HEX_KRING_RES = 8
_HEX_HEAT_RES = [5, 8]


def q_hex_encode(spark, sf_dir):
    """Hexgrid encode at two resolutions + the aperture-4 parent of the
    finer one — all native Columns (functions/hexcell.py), zero
    Python; the oracle recomputes the identical fixed-order float64
    chain in DuckDB so the cell ASSIGNMENT (not a rounded value) is
    hash-checked cross-engine."""
    df = _docs_coords(spark, sf_dir)
    h12 = HX.hex_cell(F.col("lat"), F.col("lon"), 12)
    return df.select(
        "doc_id",
        h12.alias("hex12"),
        HX.hex_cell(F.col("lat"), F.col("lon"), 7).alias("hex7"),
        HX.hex_parent(h12, 12).alias("hex11p"),
    )


def _hex_encode_oracle() -> str:
    stages_a, last_a, _ = HX.hex_axial_stages_from("base", 12, "a")
    stages_b, last_b, _ = HX.hex_axial_stages_from(last_a, 7, "b")
    stages_p, last_p, _ = HX.hex_parent_oracle_stages(
        f"(SELECT *, qwa AS cq, rxa AS cr FROM {last_b})", 12, "p"
    )
    return (
        f"WITH base AS (SELECT * FROM {_COORD_SUBQ}), "
        + ", ".join(stages_a + stages_b + stages_p)
        + " SELECT doc_id, "
        + HX.hex_pack_sql(12, "qwa", "rxa")
        + " AS hex12, "
        + HX.hex_pack_sql(7, "qwb", "rxb")
        + " AS hex7, "
        + HX.hex_pack_sql(11, "qwp", "rxp")
        + " AS hex11p "
        + f"FROM {last_p}"
    )


def q_hex_kring(spark, sf_dir):
    """gridDisk(cell, 2) for every 97th document's cell: one literal
    19-offset explode + native wrap/pack/hex-distance bit math —
    pentagon-free so the disk is exactly 19 rows per cell (H3 k-ring
    semantics, the candidate generator under hex_radius_join_bulk)."""
    df = _docs_coords(spark, sf_dir).where(
        F.col("doc_id").cast("long") % 97 == 0
    )
    cell = HX.hex_cell(F.col("lat"), F.col("lon"), _HEX_KRING_RES)
    df = df.select("doc_id", cell.alias("hex_id"))
    offs = F.array(
        *[
            F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
            for dq, dr in hgk.grid_disk_offsets(2)
        ]
    )
    df = df.select("doc_id", "hex_id", F.explode(offs).alias("o"))
    nl = F.lit(hgk.ncols(_HEX_KRING_RES)).cast("long")
    cq = ((HX.hex_q(F.col("hex_id")) + F.col("o.dq")) % nl + nl) % nl
    cr = HX.hex_r(F.col("hex_id")) + F.col("o.dr")
    hd = F.shiftright(
        F.abs(F.col("o.dq"))
        + F.abs(F.col("o.dr"))
        + F.abs(F.col("o.dq") + F.col("o.dr")),
        1,
    )
    return df.select(
        "doc_id",
        "hex_id",
        HX.hex_pack(_HEX_KRING_RES, cq, cr).alias("neighbor_id"),
        hd.cast("int").alias("hexdist"),
    )


def _hex_kring_oracle() -> str:
    n = hgk.ncols(_HEX_KRING_RES)
    stages, last, tag = HX.hex_axial_stages_from("base", _HEX_KRING_RES, "0")
    nq = f"(((qw{tag} + o.dq) % {n}) + {n}) % {n}"
    nr = f"(rx{tag} + o.dr)"
    return (
        f"WITH base AS (SELECT * FROM {_COORD_SUBQ} "
        "WHERE CAST(doc_id AS BIGINT) % 97 = 0), "
        + ", ".join(stages)
        + ", offs AS (SELECT dq.v AS dq, dr.v AS dr "
        "FROM generate_series(-2, 2) dq(v), generate_series(-2, 2) dr(v) "
        "WHERE (abs(dq.v) + abs(dr.v) + abs(dq.v + dr.v)) // 2 <= 2) "
        f"SELECT doc_id, {HX.hex_pack_sql(_HEX_KRING_RES, f'qw{tag}', f'rx{tag}')} AS hex_id, "
        f"{HX.hex_pack_sql(_HEX_KRING_RES, nq, nr)} AS neighbor_id, "
        "CAST((abs(o.dq) + abs(o.dr) + abs(o.dq + o.dr)) // 2 AS INT) "
        f"AS hexdist FROM {last}, offs o"
    )


def q_hex_radius_join(spark, sf_dir):
    """All docs within 4 km of Berlin through the hexgrid index: the
    driver-side gridDisk becomes an IN-list on the native cell id
    (scan-level pushdown, no join), exact haversine re-rank.  Shares
    the geohash/S2 radius oracle — identical answers across all three
    cell systems on the same predicate."""
    from .operators.hex_join import hex_radius_join

    df = _docs_coords(spark, sf_dir)
    out = hex_radius_join(df, BERLIN[0], BERLIN[1], 4000.0)
    return out.select("doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3"))


def q_hex_radius_join_bulk(spark, sf_dir):
    """Bulk hex radius join: every 40th doc is a circle of
    doc-dependent radius (2-6 km) — the same circle fixture as the
    geohash radius_join_bulk so the two index families are directly
    comparable.  Auto-res (worst query latitude), per-query ring count
    from the provable covering bound, nested-sequence gridDisk
    explode, cell equi-join, exact haversine.  NOTHING is dropped
    (auto-res guarantees k <= max_k), so the oracle is the pure
    distance predicate — stronger than mirroring ring membership."""
    from .operators.hex_join import hex_radius_join_bulk

    pts = _docs_coords(spark, sf_dir)
    qs = pts.where(F.col("doc_id").cast("long") % 40 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
        (
            F.lit(2000.0) + (F.col("doc_id").cast("long") % 5) * F.lit(1000.0)
        ).alias("radius_m"),
    )
    out = hex_radius_join_bulk(pts, qs)
    return out.select(
        "query_id", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def _hex_radius_bulk_oracle() -> str:
    hav = C.haversine_sql("p.lat", "p.lon", "q.qlat", "q.qlon")
    return (
        f"WITH pts AS (SELECT doc_id, lat, lon FROM {_COORD_SUBQ}), "
        "qs AS (SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "2000.0 + (CAST(doc_id AS BIGINT) % 5) * 1000.0 AS radius_m "
        "FROM pts WHERE CAST(doc_id AS BIGINT) % 40 = 0) "
        "SELECT query_id, doc_id, round(d, 3) AS dist_r3 FROM ("
        f"SELECT q.query_id, p.doc_id, {hav} AS d, q.radius_m FROM qs q "
        "JOIN pts p ON p.lat BETWEEN q.qlat - q.radius_m / 111000.0 "
        "AND q.qlat + q.radius_m / 111000.0) WHERE d <= radius_m"
    )


def q_hex_knn(spark, sf_dir):
    """North-star kNN: hex k-ring candidate generation + exact
    haversine re-rank (operators/hex_join.py:hex_knn), certified by
    the provable ring stop bound.  Shares the exact-kNN oracle with
    the geohash knn — identical top-10."""
    from .operators.hex_join import hex_knn

    df = _docs_coords(spark, sf_dir)
    out = hex_knn(df, [("berlin", BERLIN[0], BERLIN[1])], k=10, res=7)
    return out.select(
        "query_id", "rank", "doc_id", F.round(F.col("dist_m"), 3).alias("dist_r3")
    )


def q_hex_knn_bulk(spark, sf_dir):
    """Distributed bulk kNN through the hex index: every 50th doc is a
    query, fixed gridDisk(2) candidates at res 7, cell equi-join,
    window top-5 per query (operators.hex_join.hex_knn_bulk — the
    millions-of-queries path, no driver loop).  Oracle mirrors the
    identical disk membership (generate_series offsets + hex distance
    + the same packed-cell arithmetic)."""
    from .operators.hex_join import hex_knn_bulk

    pts = _docs_coords(spark, sf_dir)
    qs = pts.where(F.col("doc_id").cast("long") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    out = hex_knn_bulk(pts, qs, k=5, res=7, ring=2)
    return out.select(
        "query_id",
        "rank",
        "doc_id",
        F.round(F.col("dist_m"), 3).alias("dist_r3"),
    )


def _hex_knn_bulk_oracle() -> str:
    res, ring = 7, 2
    n = hgk.ncols(res)
    prefix, last, tag = HX.hex_axial_with_stages(_COORD_SUBQ, res)
    hav = C.haversine_sql("p.lat", "p.lon", "c.qlat", "c.qlon")
    wrap_q = f"((((pq + dq) % {n}) + {n}) % {n})"
    return (
        prefix
        + f", pts AS (SELECT doc_id, lat, lon, "
        f"{HX.hex_pack_sql(res, f'qw{tag}', f'rx{tag}')} AS cell, "
        f"qw{tag} AS pq, rx{tag} AS pr FROM {last}), "
        "qs AS (SELECT doc_id AS query_id, lat AS qlat, lon AS qlon, "
        "pq, pr FROM pts WHERE CAST(doc_id AS BIGINT) % 50 = 0), "
        f"offs AS (SELECT dq.v AS dq, dr.v AS dr FROM "
        f"generate_series(-{ring}, {ring}) dq(v), "
        f"generate_series(-{ring}, {ring}) dr(v) "
        f"WHERE (abs(dq.v) + abs(dr.v) + abs(dq.v + dr.v)) // 2 <= {ring}), "
        "cand AS (SELECT query_id, qlat, qlon, "
        f"{HX.hex_pack_sql(res, wrap_q, '(pr + dr)')} AS cell FROM qs, offs), "
        f"j AS (SELECT c.query_id, c.qlat, c.qlon, p.doc_id, {hav} AS d "
        "FROM cand c JOIN pts p ON p.cell = c.cell) "
        "SELECT query_id, rank, doc_id, round(d, 3) AS dist_r3 FROM ("
        "SELECT query_id, doc_id, d, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY d ASC, doc_id ASC) AS INT) AS rank "
        "FROM j) WHERE rank <= 5"
    )


def q_hex_adversarial(spark, sf_dir):
    """Hex encode + aperture parent over ADVERSARIAL coordinates the
    test data never reaches: every doc's longitude shifts 180 deg (the
    overlay_adversarial trick) so points populate the antimeridian
    seam where q wraps, and latitude stretches toward the poles
    (|lat| up to 89.999) where the top lattice rows clamp — the wrap
    and pole branches are hash-checked cross-engine instead of only
    pytest-pinned."""
    df = _docs_coords(spark, sf_dir)
    lon_s = F.when(F.col("lon") <= 0, F.col("lon") + 180).otherwise(
        F.col("lon") - 180
    )
    lat_p = F.greatest(
        F.lit(-89.999), F.least(F.lit(89.999), F.col("lat") * F.lit(1.0588))
    )
    df = df.select("doc_id", lat_p.alias("alat"), lon_s.alias("alon"))
    h9 = HX.hex_cell(F.col("alat"), F.col("alon"), 9)
    return df.select(
        "doc_id",
        h9.alias("hex9"),
        HX.hex_cell(F.col("alat"), F.col("alon"), 4).alias("hex4"),
        HX.hex_parent(h9, 9).alias("hex8p"),
    )


def _hex_adversarial_oracle() -> str:
    lat_p = (
        f"greatest(-89.999, least(89.999, ({src.LAT_SQL} * 1.0588)))"
    )
    lon_s = (
        f"CASE WHEN {src.LON_SQL} <= 0 THEN {src.LON_SQL} + 180 "
        f"ELSE {src.LON_SQL} - 180 END"
    )
    base = (
        f"(SELECT doc_id, {lat_p} AS lat, {lon_s} AS lon FROM documents)"
    )
    stages_a, last_a, _ = HX.hex_axial_stages_from("base", 9, "a")
    stages_b, last_b, _ = HX.hex_axial_stages_from(last_a, 4, "b")
    stages_p, last_p, _ = HX.hex_parent_oracle_stages(
        f"(SELECT *, qwa AS cq, rxa AS cr FROM {last_b})", 9, "p"
    )
    return (
        f"WITH base AS (SELECT * FROM {base}), "
        + ", ".join(stages_a + stages_b + stages_p)
        + " SELECT doc_id, "
        + HX.hex_pack_sql(9, "qwa", "rxa")
        + " AS hex9, "
        + HX.hex_pack_sql(4, "qwb", "rxb")
        + " AS hex4, "
        + HX.hex_pack_sql(8, "qwp", "rxp")
        + " AS hex8p "
        + f"FROM {last_p}"
    )


def q_hex_pip_join(spark, sf_dir):
    """PIP join through the hexgrid index (hex polygon covering with
    interior/border classification + exact border re-check); shares
    the pip oracle — identical answer to the geohash- and S2-path PIP
    joins on the same fixture polygons, making all THREE cell families
    interchangeable on the flagship operator."""
    from .operators.hex_join import hex_pip_join

    df = _docs_coords(spark, sf_dir)
    return hex_pip_join(df).select("doc_id", "polygon_id")


def q_hex_pip_semi(spark, sf_dir):
    """One-pass semi PIP through the hex index (grouped broadcast cell
    relation, no duplicate risk); shares the semi oracle with the
    geohash and S2 paths."""
    from .operators.hex_join import hex_pip_semi_anti

    df = _docs_coords(spark, sf_dir)
    return hex_pip_semi_anti(df, "left_semi").select("doc_id", "lat", "lon")


def q_hex_pip_anti(spark, sf_dir):
    """Anti twin of q_hex_pip_semi (set-ops family on the hex index)."""
    from .operators.hex_join import hex_pip_semi_anti

    df = _docs_coords(spark, sf_dir)
    return hex_pip_semi_anti(df, "left_anti").select("doc_id", "lat", "lon")


def q_hex_heatmap(spark, sf_dir):
    """Multi-resolution hex density pyramid: independent native encode
    + partial-agg groupBy per res (exact, unlike approximate
    parent-chain rollup), cell centers decoded natively for
    rendering."""
    from .operators.hex_join import hex_heatmap

    df = _docs_coords(spark, sf_dir)
    return hex_heatmap(df, _HEX_HEAT_RES)


def _hex_heatmap_oracle() -> str:
    parts = []
    for res in _HEX_HEAT_RES:
        inner = HX.hex_encode_oracle(_COORD_SUBQ, res)
        lat, lon = HX.hex_center_sql("hex_id", res)
        parts.append(
            f"SELECT {res} AS res, hex_id, COUNT(*) AS n, "
            f"round({lat}, 6) AS center_lat, round({lon}, 6) AS center_lon "
            f"FROM ({inner}) GROUP BY hex_id"
        )
    return " UNION ALL ".join(parts)


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
    from .operators.colocation import colocation_join

    return colocation_join(
        _metro_points(spark, sf_dir),
        eps_m=5000.0,
        tau_s=3600,
        max_abs_lat=54.0,
    )


def _colocation_oracle() -> str:
    from .operators.colocation import colocation_join_oracle_sql

    return colocation_join_oracle_sql(
        _METRO_SUBQ, eps_m=5000.0, tau_s=3600
    )


def q_convoys(spark, sf_dir):
    """Composed convoy mining over the metro stream: colocation_join
    (eps 5 km / tau 1 h) -> repeat filter (>= 3 contact events) ->
    distributed connected components -> convoy labels.  The trajectory
    family's pipeline_near_dup analogue: pairs alone under-group
    (a-b + b-c convoys keep a and c apart unless the chain closes)."""
    from .operators.colocation import convoy_groups

    return convoy_groups(
        _metro_points(spark, sf_dir),
        eps_m=5000.0,
        tau_s=3600,
        min_contacts=3,
        max_abs_lat=54.0,
    )


def _convoys_oracle() -> str:
    from .operators.colocation import convoy_groups_oracle_sql

    return convoy_groups_oracle_sql(
        _METRO_SUBQ, eps_m=5000.0, tau_s=3600, min_contacts=3
    )


def q_hotspot_gi(spark, sf_dir):
    """Getis-Ord Gi* hot/cold z-scores over z8 tile bins of the fix
    stream (operators/hotspot.py): occupied-cell lattice, 9-address
    neighbor spread, pinned-order scalar stats."""
    from .operators.hotspot import getis_ord_gi

    return getis_ord_gi(_traj_points(spark, sf_dir), zoom=8)


def q_traj_hausdorff(spark, sf_dir):
    """Trajectory-similarity join (operators/traj_similarity.py):
    unordered trip pairs with discrete Hausdorff <= 500 m; head-ring
    candidates at the tau-safe zoom, mm-quantized exact max-of-min in
    both directions."""
    from .operators.traj_similarity import hausdorff_join

    return hausdorff_join(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _traj_hausdorff_oracle() -> str:
    from .operators.traj_similarity import hausdorff_join_oracle_sql

    return hausdorff_join_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_asof_snap(spark, sf_dir):
    """As-of join (operators/asof.py): for each probe (user, t+737s),
    the user's latest fix at-or-before t within a 1 h horizon — one
    union-tag window pass, no per-key loops; the DuckDB twin is the
    engine-native ASOF JOIN."""
    from .operators.asof import asof_join

    pts = _traj_points(spark, sf_dir)
    qs = pts.where(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("query_id"),
        "user_id",
        (F.col("ts_sec") + F.lit(737)).alias("qts"),
    )
    return asof_join(pts, qs, ["lat", "lon"], horizon_s=3600)


def _asof_snap_oracle() -> str:
    from .operators.asof import asof_join_oracle_sql

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
    from .operators.geofence import geofence_dwell

    return geofence_dwell(
        _metro_points(spark, sf_dir), _DWELL_FENCES, gap_s=43200
    )


def _geofence_dwell_oracle() -> str:
    from .operators.geofence import geofence_dwell_oracle_sql

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
    from .operators.hmm_match import hmm_trip_costs

    return hmm_trip_costs(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        k_candidates=3,
        switch_penalty_m=60.0,
        max_abs_lat=53.2,
    )


def _hmm_match_oracle() -> str:
    from .operators.hmm_match import hmm_match_oracle_sql

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
    from .operators.zonal import rasterize, zonal_stats

    return zonal_stats(
        rasterize(_metro_points(spark, sf_dir), 15), _ZONAL_ZONES, 15
    )


def _zonal_stats_oracle() -> str:
    from .operators.zonal import zonal_stats_oracle_sql

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
    from .operators.traj_similarity import frechet_join

    return frechet_join(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _traj_frechet_oracle() -> str:
    from .operators.traj_similarity import frechet_join_oracle_sql

    return frechet_join_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_route_clusters(spark, sf_dir):
    """Composed route clustering (operators/traj_similarity.py):
    Fréchet similarity edges → distributed connected components; trip
    keys ride as user:session strings, labels are min-string per
    component.  Oracle embeds the recursive Fréchet DP CTE inside the
    reach-closure recursion."""
    from .operators.traj_similarity import route_clusters

    return route_clusters(
        _traj_points(spark, sf_dir), tau_m=500.0, gap_s=43200
    )


def _route_clusters_oracle() -> str:
    from .operators.traj_similarity import route_clusters_oracle_sql

    return route_clusters_oracle_sql(
        _TRAJ_SUBQ, tau_m=500.0, gap_s=43200
    )


def q_morans_i(spark, sf_dir):
    """Global Moran's I autocorrelation of fix counts over z8 tile
    bins (operators/hotspot.py): binary queen adjacency on occupied
    cells, exact integer aggregates, pinned-order scalar combine;
    one-row result (I, E[I], z under normality)."""
    from .operators.hotspot import morans_i

    return morans_i(_traj_points(spark, sf_dir), zoom=8)


def _morans_i_oracle() -> str:
    from .operators.hotspot import morans_i_oracle_sql

    return morans_i_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_grid_dbscan(spark, sf_dir):
    """Grid-bucketed DBSCAN (min_pts=1 / eps-linkage) at eps=50 m over
    the fix stream: coincident-fix collapse -> z16 tile bucketing ->
    9-cell candidate join -> geodesic cutoff -> distributed connected
    components (operators/cluster.py).  Parked fixes give every user a
    base-position clique by construction; jitter adds sparse bridges."""
    from .operators.cluster import grid_dbscan

    out = grid_dbscan(_traj_points(spark, sf_dir), eps_m=50.0)
    return out.select("event_id", "user_id", "cluster_id")


def _hotspot_gi_oracle() -> str:
    from .operators.hotspot import getis_ord_gi_oracle_sql

    return getis_ord_gi_oracle_sql(_TRAJ_SUBQ, zoom=8)


def _grid_dbscan_oracle() -> str:
    from .operators.cluster import grid_dbscan_oracle_sql

    return grid_dbscan_oracle_sql(
        _TRAJ_SUBQ, eps_m=50.0, select_cols="k.event_id, k.user_id"
    )


def q_st_dbscan(spark, sf_dir):
    """Spatiotemporal DBSCAN (operators/cluster.py st_dbscan — Birant
    & Kut 2007, min_pts=1 eps-linkage) at eps 1 km / 6 h over the fix
    stream: a user's parked clique splits into per-revisit clusters
    wherever the 6 h time gate cuts the chain that plain grid_dbscan
    would merge."""
    from .operators.cluster import st_dbscan

    out = st_dbscan(
        _traj_points(spark, sf_dir), eps_m=1000.0, eps_t=21600
    )
    return out.select("event_id", "user_id", "cluster_id")


def _st_dbscan_oracle() -> str:
    from .operators.cluster import st_dbscan_oracle_sql

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
    from .operators.density import kde_grid

    return kde_grid(
        _traj_points(spark, sf_dir), zoom=8,
        radius_cells=3, sigma_cells=1.5,
    )


def _kde_oracle() -> str:
    from .operators.density import kde_grid_oracle_sql

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
    from .operators.density import ripley_k

    return ripley_k(
        _metro_points(spark, sf_dir),
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _ripley_oracle() -> str:
    from .operators.density import ripley_k_oracle_sql

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
    from .operators.density import pair_correlation

    return pair_correlation(
        _metro_points(spark, sf_dir),
        radii_m=_RIPLEY_RADII_M,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _pcf_oracle() -> str:
    from .operators.density import pair_correlation_oracle_sql

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
    from .operators.density import clark_evans

    return clark_evans(
        _metro_points(spark, sf_dir),
        r_max_m=500.0,
        area_m2=_RIPLEY_AREA_M2,
        max_abs_lat=54.0,
    )


def _clark_evans_oracle() -> str:
    from .operators.density import clark_evans_oracle_sql

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
    from .operators.density import variogram

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
    from .operators.density import variogram_oracle_sql

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
    from .operators.traj_similarity import dtw_join

    return dtw_join(
        _traj_points(spark, sf_dir), tau_m=10000.0, gap_s=43200
    )


def _traj_dtw_oracle() -> str:
    from .operators.traj_similarity import dtw_join_oracle_sql

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
    from .operators.traj_similarity import lcss_join

    return lcss_join(
        _traj_points(spark, sf_dir), eps_m=250.0, min_sim=0.5,
        gap_s=43200,
    )


def _traj_lcss_oracle() -> str:
    from .operators.traj_similarity import lcss_join_oracle_sql

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
    from .operators.traj_similarity import edr_join

    return edr_join(
        _traj_points(spark, sf_dir), eps_m=250.0, max_edits=12,
        gap_s=43200,
    )


def _traj_edr_oracle() -> str:
    from .operators.traj_similarity import edr_join_oracle_sql

    return edr_join_oracle_sql(
        _TRAJ_SUBQ, eps_m=250.0, max_edits=12, gap_s=43200
    )


# Deterministic 20x20 road-network lattice for routing: node n sits at
# (52 + floor(n/20)*0.05, 13 + (n%20)*0.05); the 760 undirected lattice
# links become 1520 directed edges whose cost is the geodesic length
# times a direction-dependent congestion factor 1 + ((src*31+dst)%7)*.05
# (so reverse edges differ and shortest paths are not Manhattan-
# symmetric), mm-quantized to BIGINT so both engines sum exact integers.
_GRID_NODES_PER_SIDE = 20


def _grid_lat_sql(n: str) -> str:
    return f"(52.0 + floor(({n}) / 20.0) * 0.05)"


def _grid_lon_sql(n: str) -> str:
    return f"(13.0 + CAST(({n}) % 20 AS DOUBLE) * 0.05)"


def _road_graph_edges(spark: SparkSession) -> DataFrame:
    e = F.col("id").cast("int")
    horiz = e < 380
    hsrc = F.floor(e / F.lit(19.0)).cast("int") * 20 + (e % 19).cast("int")
    ve = e - 380
    vsrc = F.floor(ve / F.lit(20.0)).cast("int") * 20 + (ve % 20).cast("int")
    und = spark.range(760).select(
        F.when(horiz, hsrc).otherwise(vsrc).alias("src"),
        F.when(horiz, hsrc + 1).otherwise(vsrc + 20).alias("dst"),
    )
    both = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def _lat(n):
        return F.lit(52.0) + F.floor(n / F.lit(20.0)).cast("double") * F.lit(
            0.05
        )

    def _lon(n):
        return F.lit(13.0) + (n % 20).cast("double") * F.lit(0.05)

    hav = C.haversine(
        _lat(F.col("src")), _lon(F.col("src")),
        _lat(F.col("dst")), _lon(F.col("dst")),
    )
    factor = (
        F.lit(1.0)
        + ((F.col("src") * 31 + F.col("dst")) % 7).cast("double") * F.lit(0.05)
    )
    return both.select(
        "src",
        "dst",
        F.round(hav * factor * F.lit(1000.0)).cast("long").alias("w_mm"),
    )


def _road_graph_edges_sql() -> str:
    hav = C.haversine_sql(
        _grid_lat_sql("src"), _grid_lon_sql("src"),
        _grid_lat_sql("dst"), _grid_lon_sql("dst"),
    )
    return (
        "(WITH und AS (SELECT "
        "CASE WHEN e < 380 THEN CAST(floor(e / 19.0) AS INT) * 20 "
        "+ CAST(e % 19 AS INT) ELSE CAST(floor((e - 380) / 20.0) AS INT) "
        "* 20 + CAST((e - 380) % 20 AS INT) END AS src, "
        "CASE WHEN e < 380 THEN CAST(floor(e / 19.0) AS INT) * 20 "
        "+ CAST(e % 19 AS INT) + 1 ELSE CAST(floor((e - 380) / 20.0) AS INT) "
        "* 20 + CAST((e - 380) % 20 AS INT) + 20 END AS dst "
        "FROM range(760) t(e)), "
        "bidir AS (SELECT src, dst FROM und "
        "UNION ALL SELECT dst AS src, src AS dst FROM und) "
        f"SELECT src, dst, CAST(round(({hav}) * "
        "(1.0 + CAST((src * 31 + dst) % 7 AS DOUBLE) * 0.05) * 1000.0) "
        "AS BIGINT) AS w_mm FROM bidir)"
    )


# Unrolled Bellman-Ford depth for the DuckDB twin: any shortest path's
# cost is bounded by the direct staircase to the far corner, 19+19
# edges at the max per-edge cost (vertical 0.05 deg ~ 5560 m, factor
# <= 1.3 -> 7228 m/edge; horizontal <= 4450 m/edge) ~ 221.9 km; the
# cheapest edge is a factor-1.0 horizontal at the top row, ~3351 m, so
# an optimal path can use at most ~67 hops.  72 adds margin; the Spark
# side iterates to its own fixed point and needs no bound.
_SSSP_ROUNDS = 72


def q_sssp(spark, sf_dir):
    """Multi-round frontier Bellman-Ford SSSP (operators/routing.py)
    from lattice corner node 0 over the congestion-weighted road graph:
    per-round shuffle bounded by frontier adjacency, per-round
    localCheckpoint + Observation convergence (the connected_components
    loop hygiene), exact BIGINT mm costs end to end."""
    from .operators.routing import sssp

    return sssp(
        _road_graph_edges(spark),
        spark.range(1).select(F.lit(0).cast("int").alias("node")),
    )


def _sssp_oracle() -> str:
    from .operators.routing import sssp_oracle_sql

    return sssp_oracle_sql(
        _road_graph_edges_sql(),
        "(SELECT CAST(0 AS INT) AS node)",
        rounds=_SSSP_ROUNDS,
    )


def q_isochrone(spark, sf_dir):
    """Isochrone band rollup composed over the SSSP fixed point:
    reachable nodes bucket into 20 km travel-cost bands (exact BIGINT
    `div`), keeping bands < 8 — reach count + min/max cost per band."""
    from .operators.routing import sssp

    d = sssp(
        _road_graph_edges(spark),
        spark.range(1).select(F.lit(0).cast("int").alias("node")),
    )
    band = F.expr("dist_mm div 20000000").cast("int")
    return (
        d.select(band.alias("band"), "dist_mm")
        .where(F.col("band") < 8)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("dist_mm").alias("min_mm"),
            F.max("dist_mm").alias("max_mm"),
        )
    )


def _isochrone_oracle() -> str:
    from .operators.routing import isochrone_oracle_sql

    return isochrone_oracle_sql(
        _sssp_oracle(), band_mm=20_000_000, max_bands=8
    )


# four facilities at the lattice corners; exact-cost catchment ties
# break to the smaller facility id in both engines
_FACILITY_NODES = (0, 19, 380, 399)


def q_nearest_facility(spark, sf_dir):
    """Catchment assignment (operators/routing.py nearest_facility):
    ONE multi-source frontier sweep labels every node with its
    network-nearest corner facility and the exact mm travel cost —
    the graph analogue of knn_bulk's nearest-site join, without
    |facilities| separate runs."""
    from .operators.routing import nearest_facility

    return nearest_facility(
        _road_graph_edges(spark),
        spark.createDataFrame(
            [(n,) for n in _FACILITY_NODES], "node int"
        ),
    )


def _nearest_facility_oracle() -> str:
    from .operators.routing import nearest_facility_oracle_sql

    vals = ", ".join(f"({n})" for n in _FACILITY_NODES)
    return nearest_facility_oracle_sql(
        _road_graph_edges_sql(),
        f"(SELECT CAST(n AS INT) AS node FROM (VALUES {vals}) t(n))",
        rounds=_SSSP_ROUNDS,
    )


def q_mobility(spark, sf_dir):
    """Per-user mobility features (operators/trajectory.py
    mobility_metrics — González et al. 2008): fix/cell counts, exact
    Simpson location concentration (the rational stand-in for location
    entropy), and radius of gyration to the integer-µdeg centroid.
    Two bounded passes over the fix relation; every distributed
    aggregate an exact BIGINT."""
    from .operators.trajectory import mobility_metrics

    return mobility_metrics(_traj_points(spark, sf_dir), zoom=14)


def _mobility_oracle() -> str:
    from .operators.trajectory import mobility_metrics_oracle_sql

    return mobility_metrics_oracle_sql(_TRAJ_SUBQ, zoom=14)


def q_heading_stats(spark, sf_dir):
    """Per-trip circular heading statistics (operators/trajectory.py
    heading_stats — Mardia & Jupp directional stats): mean direction,
    resultant length R, circular variance over leg bearings; ppb-
    quantized cos/sin sums so every distributed aggregate is exact."""
    from .operators.trajectory import heading_stats

    return heading_stats(_traj_points(spark, sf_dir), gap_s=43200)


def _heading_stats_oracle() -> str:
    from .operators.trajectory import heading_stats_oracle_sql

    return heading_stats_oracle_sql(_TRAJ_SUBQ, gap_s=43200)


def q_cell_transitions(spark, sf_dir):
    """First-order Markov mobility matrix (operators/trajectory.py
    cell_transitions — Gambs 2012 / Song 2010): consecutive distinct
    z12-cell visit pairs within each trip, with exact counts and
    single-IEEE-division transition probabilities."""
    from .operators.trajectory import cell_transitions

    return cell_transitions(
        _traj_points(spark, sf_dir), zoom=12, gap_s=43200
    )


def _cell_transitions_oracle() -> str:
    from .operators.trajectory import cell_transitions_oracle_sql

    return cell_transitions_oracle_sql(_TRAJ_SUBQ, zoom=12, gap_s=43200)


# Mann-Kendall window: 12 six-hour buckets from 2024-01-01T00:00Z —
# covers the sf0.01 event stream (~2.7 days) and fronts the sf0.1
# stream, so both scales yield nontrivial dense series.
_MK_T0 = 1704067200
_MK_BUCKET_S = 21600
_MK_BUCKETS = 12


def q_mann_kendall(spark, sf_dir):
    """Per-cell Mann-Kendall trend over dense 6-hour tile-count
    series (operators/hotspot.py mann_kendall_trend — the
    emerging-hot-spot trend step): exact integer S + tie-corrected
    variance, IEEE-pinned z, 5% trend classification."""
    from .operators.hotspot import mann_kendall_trend

    return mann_kendall_trend(
        _traj_points(spark, sf_dir),
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


def _mann_kendall_oracle() -> str:
    from .operators.hotspot import mann_kendall_trend_oracle_sql

    return mann_kendall_trend_oracle_sql(
        _TRAJ_SUBQ,
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


def q_quadrat(spark, sf_dir):
    """Quadrat variance-mean-ratio CSR test (operators/hotspot.py
    quadrat_dispersion — Fisher 1925 index of dispersion): one-row
    global clustered/dispersed verdict over occupied z6 tiles, exact
    BIGINT scalars + pinned IEEE combine."""
    from .operators.hotspot import quadrat_dispersion

    return quadrat_dispersion(_traj_points(spark, sf_dir), zoom=6)


def _quadrat_oracle() -> str:
    from .operators.hotspot import quadrat_dispersion_oracle_sql

    return quadrat_dispersion_oracle_sql(_TRAJ_SUBQ, zoom=6)


def q_sde(spark, sf_dir):
    """Per-user standard deviational ellipse (operators/trajectory.py
    deviational_ellipse — Lefever 1926 / Yuill 1971 directional
    distribution): covariance eigen-decomposition in closed form, one
    pinned atan2, exact microdeg moment sums off the integer anchor."""
    from .operators.trajectory import deviational_ellipse

    return deviational_ellipse(_traj_points(spark, sf_dir))


def _sde_oracle() -> str:
    from .operators.trajectory import deviational_ellipse_oracle_sql

    return deviational_ellipse_oracle_sql(_TRAJ_SUBQ)


# moving-fix predicate: EXACT integer recomputation of the fixture's
# own jitter gate, usable identically in both engines
def _moving_flag():
    return ((F.col("ts_sec") + F.col("user_id") * 977) % 14400) < 10800


_MOVING_FLAG_SQL = "((ts_sec + user_id * 977) % 14400) < 10800"


def q_bimoran(spark, sf_dir):
    """Bivariate cross Moran's I (operators/hotspot.py
    bivariate_morans_i — Wartenberg 1985): do cells dense in MOVING
    fixes neighbor cells dense in PARKED fixes, over the z8 occupied
    lattice; all distributed aggregates exact BIGINTs."""
    from .operators.hotspot import bivariate_morans_i

    return bivariate_morans_i(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _bimoran_oracle() -> str:
    from .operators.hotspot import bivariate_morans_i_oracle_sql

    return bivariate_morans_i_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_clq(spark, sf_dir):
    """Nearest-neighbor colocation quotient (operators/density.py
    colocation_quotient — Leslie & Kronenfeld 2011) between moving
    and parked fixes over the metro stream: rep-granular NN with the
    (d_mm, rep id) total order (coincident piles see distance-0
    siblings), truncated at r_max=500 m, four pinned CLQ chains."""
    from .operators.density import colocation_quotient

    return colocation_quotient(
        _metro_points(spark, sf_dir),
        _moving_flag(),
        r_max_m=500.0,
        max_abs_lat=54.0,
    )


def _clq_oracle() -> str:
    from .operators.density import colocation_quotient_oracle_sql

    return colocation_quotient_oracle_sql(
        _METRO_SUBQ, _MOVING_FLAG_SQL, r_max_m=500.0, max_abs_lat=54.0
    )


def q_median_center(spark, sf_dir):
    """Weiszfeld median center (operators/hotspot.py median_center —
    the center of minimum travel distance) of the metro fix stream:
    fixed 10-round iteration on integer microdegree coordinates,
    exact 1e9 // d weights with DECIMAL/HUGEINT sums, floor-division
    center updates mirrored by the unrolled twin."""
    from .operators.hotspot import median_center

    return median_center(_metro_points(spark, sf_dir), iters=10)


def _median_center_oracle() -> str:
    from .operators.hotspot import median_center_oracle_sql

    return median_center_oracle_sql(_METRO_SUBQ, iters=10)


def q_segregation(spark, sf_dir):
    """Two-group spatial segregation indices (operators/hotspot.py
    segregation_indices — Duncan & Duncan 1955 dissimilarity, Massey
    & Denton exposure/isolation) between moving and parked fixes over
    z8 cells: exact integer |a_i*B - b_i*A| evenness numerator, ppm
    integer-division shares, three pinned final chains."""
    from .operators.hotspot import segregation_indices

    return segregation_indices(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _segregation_oracle() -> str:
    from .operators.hotspot import segregation_indices_oracle_sql

    return segregation_indices_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_lq(spark, sf_dir):
    """Per-cell location quotient (operators/hotspot.py
    location_quotient — Haig 1926) of moving-fix share vs the global
    share: ratio-of-ratios form so no integer product can overflow."""
    from .operators.hotspot import location_quotient

    return location_quotient(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _lq_oracle() -> str:
    from .operators.hotspot import location_quotient_oracle_sql

    return location_quotient_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_gini(spark, sf_dir):
    """Spatial Gini of fix counts over occupied z8 cells
    (operators/hotspot.py spatial_gini): exact-integer grouped-
    histogram numerator, one pinned final division."""
    from .operators.hotspot import spatial_gini

    return spatial_gini(_traj_points(spark, sf_dir), zoom=8)


def _gini_oracle() -> str:
    from .operators.hotspot import spatial_gini_oracle_sql

    return spatial_gini_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_stkde(spark, sf_dir):
    """Space-time kernel density over the (z8 cell, daily bucket)
    cube (operators/density.py stkde_cube — Nakaya & Yano 2010): the
    temporal extension of the KDE stencil; occupied-bin collapse,
    bounded separable space x time integer stencil (ppb literals
    shared by both engines), exact BIGINT mass sums."""
    from .operators.density import stkde_cube

    return stkde_cube(_traj_points(spark, sf_dir), zoom=8, bucket_s=86400)


def _stkde_oracle() -> str:
    from .operators.density import stkde_cube_oracle_sql

    return stkde_cube_oracle_sql(_TRAJ_SUBQ, zoom=8, bucket_s=86400)


def q_focal_stats(spark, sf_dir):
    """Focal 3x3 neighborhood statistics of z8 cell counts
    (operators/density.py focal_stats — Tomlin map algebra): the
    order-statistics companion to the KDE stencil sum; occupied-cell
    collapse, 9-address spread, exact BIGINT min/max/sum + one pinned
    mean division."""
    from .operators.density import focal_stats

    return focal_stats(_traj_points(spark, sf_dir), zoom=8)


def _focal_stats_oracle() -> str:
    from .operators.density import focal_stats_oracle_sql

    return focal_stats_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_ht_breaks(spark, sf_dir):
    """Head/tail-breaks classification of z8 cell counts
    (operators/hotspot.py head_tail_breaks — Jiang 2013): mean-split
    recursion on the head while it stays a minority; thresholds are
    exact (S, N) rationals compared by integer cross-products, twin
    unrolls the same fixed depth."""
    from .operators.hotspot import head_tail_breaks

    return head_tail_breaks(_traj_points(spark, sf_dir), zoom=8)


def _ht_breaks_oracle() -> str:
    from .operators.hotspot import head_tail_breaks_oracle_sql

    return head_tail_breaks_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_trend_surface(spark, sf_dir):
    """First-order least-squares trend surface (operators/
    interpolate.py trend_surface — Unwin 1975) of a deterministic
    integer reading with a real latitude gradient over the metro fix
    stream: exact BIGINT moment sums in one pass, pinned Cramer solve
    + algebraic R^2 driver-side."""
    from .operators.interpolate import trend_surface

    pts = _metro_points(spark, sf_dir).withColumn(
        "reading",
        F.floor((F.col("lat") - F.lit(52.0)) * 50) + F.col("event_id") % 7,
    )
    return trend_surface(
        pts, value_col="reading", ref_lat=52.5, ref_lon=14.0
    )


def _trend_surface_oracle() -> str:
    from .operators.interpolate import trend_surface_oracle_sql

    return trend_surface_oracle_sql(
        _METRO_SUBQ,
        value_sql="CAST(floor((lat - 52.0) * 50) AS BIGINT) + "
        "(event_id % 7)",
        ref_lat=52.5,
        ref_lon=14.0,
    )


def q_entropy(spark, sf_dir):
    """Shannon spatial entropy / evenness / Theil concentration of fix
    counts over occupied z8 cells (operators/hotspot.py
    spatial_entropy): grouped-histogram collapse, ppb-quantized BIGINT
    term sum (order-free in both engines), pinned scalar combine."""
    from .operators.hotspot import spatial_entropy

    return spatial_entropy(_traj_points(spark, sf_dir), zoom=8)


def _entropy_oracle() -> str:
    from .operators.hotspot import spatial_entropy_oracle_sql

    return spatial_entropy_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_general_g(spark, sf_dir):
    """Getis-Ord General G high/low clustering (operators/hotspot.py
    general_g — Getis & Ord 1992, randomization z validated by 200k-
    permutation Monte-Carlo) over z8 tile bins."""
    from .operators.hotspot import general_g

    return general_g(_traj_points(spark, sf_dir), zoom=8)


def _general_g_oracle() -> str:
    from .operators.hotspot import general_g_oracle_sql

    return general_g_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_knox(spark, sf_dir):
    """Knox space-time interaction test (operators/colocation.py
    knox_test — Knox 1964, Poisson z per David & Barton 1966) at
    delta 1 km / tau 6 h over the fix stream: exact pair counts from
    the composite-bucket forward joins + the distinct-timestamp
    histogram range window."""
    from .operators.colocation import knox_test

    return knox_test(
        _traj_points(spark, sf_dir), delta_m=1000.0, tau_s=21600
    )


def _knox_oracle() -> str:
    from .operators.colocation import knox_test_oracle_sql

    return knox_test_oracle_sql(
        _TRAJ_SUBQ, delta_m=1000.0, tau_s=21600
    )


def q_gearys_c(spark, sf_dir):
    """Global Geary's C autocorrelation (operators/hotspot.py
    gearys_c — Geary 1954, z under normality per Cliff & Ord 1981)
    over z8 tile bins: pairwise-contrast companion to morans_i, all
    distributed aggregates exact BIGINTs, pinned scalar combine."""
    from .operators.hotspot import gearys_c

    return gearys_c(_traj_points(spark, sf_dir), zoom=8)


def _gearys_c_oracle() -> str:
    from .operators.hotspot import gearys_c_oracle_sql

    return gearys_c_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_join_counts(spark, sf_dir):
    """Black-white join-count statistics (operators/hotspot.py
    join_counts — Moran 1948, free-sampling moments per Cliff & Ord
    1981 / Sokal & Oden 1978) over z8 tile bins: exact-integer
    above-mean marks, BB/WW/BW joins, z tests for both BB and BW."""
    from .operators.hotspot import join_counts

    return join_counts(_traj_points(spark, sf_dir), zoom=8)


def _join_counts_oracle() -> str:
    from .operators.hotspot import join_counts_oracle_sql

    return join_counts_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_lisa(spark, sf_dir):
    """Local Moran's I / LISA (operators/hotspot.py local_morans_i —
    Anselin 1995): per-z8-cell local autocorrelation of fix counts
    with HH/LL/HL/LH quadrant labels, exact-BIGINT moment sums +
    pinned per-row IEEE combine, 8-address cell-relation spread."""
    from .operators.hotspot import local_morans_i

    return local_morans_i(_traj_points(spark, sf_dir), zoom=8)


def _lisa_oracle() -> str:
    from .operators.hotspot import local_morans_i_oracle_sql

    return local_morans_i_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_emerging_hotspots(spark, sf_dir):
    """Emerging-hot-spot analysis (operators/hotspot.py
    emerging_hotspots — Getis-Ord Gi* per space-time-cube bin, then
    Mann-Kendall trend over each cell's Gi* z series): classifies
    every occupied z6 cell as intensifying / diminishing / persistent
    hot or cold over twelve 6-hour buckets."""
    from .operators.hotspot import emerging_hotspots

    return emerging_hotspots(
        _traj_points(spark, sf_dir),
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


def _emerging_hotspots_oracle() -> str:
    from .operators.hotspot import emerging_hotspots_oracle_sql

    return emerging_hotspots_oracle_sql(
        _TRAJ_SUBQ,
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


# PageRank round count for the contract: the output is a pure
# function of (input, K) on both sides — K trades gate wall for
# settled mass (residual ~0.85^K), it cannot affect parity.  12
# rounds settles 86% of the mass and keeps the Spark loop's fixed
# per-round cost (~1.2 s at lattice scale) inside the gate budget.
_PAGERANK_ROUNDS = 12


def _braced_road_edges(spark: SparkSession) -> DataFrame:
    """The 20x20 lattice plus one diagonal brace (n, n+21) per grid
    cell — diagonal avenues through each block.  The pure lattice is
    bipartite (triangle-free), so the braces are what give the
    triangle/clustering fixture its known structure: every brace
    closes exactly 2 triangles with its cell's corner, 361 cells ->
    722 triangles, hand-checkable."""
    und = _road_graph_edges(spark).select("src", "dst")
    c = F.col("id").cast("int")
    diag = spark.range(361).select(
        (F.floor(c / F.lit(19.0)).cast("int") * 20 + (c % 19).cast("int"))
        .alias("src"),
    ).select(
        "src", (F.col("src") + 21).alias("dst")
    )
    return und.union(diag)


_BRACED_SUBQ = (
    "(SELECT src, dst FROM " + "{road}"
    " UNION ALL SELECT CAST(floor(c / 19.0) AS INT) * 20 "
    "+ CAST(c % 19 AS INT) AS src, "
    "CAST(floor(c / 19.0) AS INT) * 20 + CAST(c % 19 AS INT) + 21 AS dst "
    "FROM range(361) t(c))"
)


def q_triangles(spark, sf_dir):
    """Exact triangle count + transitivity (operators/graph.py
    triangle_stats — Suri & Vassilvitskii 2011 degree-oriented wedge
    join, Newman 2003 clustering coefficient) over the braced road
    lattice: 722 triangles by construction."""
    from .operators.graph import triangle_stats

    return triangle_stats(_braced_road_edges(spark))


def _triangles_oracle() -> str:
    from .operators.graph import triangle_stats_oracle_sql

    return triangle_stats_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql())
    )


def q_assortativity(spark, sf_dir):
    """Degree assortativity (operators/graph.py degree_assortativity
    — Newman 2002 eq. 4) of the braced road lattice: exact BIGINT
    edge-end sums, pinned Pearson combine."""
    from .operators.graph import degree_assortativity

    return degree_assortativity(_braced_road_edges(spark))


def _assortativity_oracle() -> str:
    from .operators.graph import degree_assortativity_oracle_sql

    return degree_assortativity_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql())
    )


# Huff facilities: the four lattice-corner facility nodes with
# deterministic attractiveness 1.0 + (node % 3) * 0.5 — two ties in
# weight, distinct positions, so both the gravity pull and the
# strict-> argmax tie rule are exercised.
_HUFF_FACILITIES = [
    (n, 52.0 + (n // 20) * 0.05, 13.0 + (n % 20) * 0.05,
     1.0 + (n % 3) * 0.5)
    for n in _FACILITY_NODES
]


def q_huff(spark, sf_dir):
    """Huff gravity catchment probabilities (operators/routing.py
    huff_catchment — Huff 1963, λ=2) over z12 metro demand cells vs
    the four corner facilities: integer-µdeg cell centroids,
    meter-quantized distances, pinned unrolled score sum + argmax."""
    from .operators.routing import huff_catchment

    return huff_catchment(
        _metro_points(spark, sf_dir), _HUFF_FACILITIES, zoom=12
    )


def _huff_oracle() -> str:
    from .operators.routing import huff_catchment_oracle_sql

    return huff_catchment_oracle_sql(
        _METRO_SUBQ, _HUFF_FACILITIES, zoom=12
    )


def q_kcore(spark, sf_dir):
    """3-core of the braced road lattice (operators/graph.py k_core —
    Seidman 1983; synchronous distributed peeling, Batagelj &
    Zaveršnik 2003): the two brace-less lattice corners peel, the
    remaining 398 nodes hold within-core degree >= 3."""
    from .operators.graph import k_core

    return k_core(_braced_road_edges(spark), k=3)


def _kcore_oracle() -> str:
    from .operators.graph import k_core_oracle_sql

    # peeling depth of the fixture is 2 rounds (measured); 6 is the
    # _SSSP_ROUNDS-style margin — exact whenever rounds >= depth
    return k_core_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql()),
        k=3,
        twin_rounds=6,
    )


def q_mst(spark, sf_dir):
    """Minimum spanning forest of the congestion-weighted road lattice
    by distributed Boruvka (operators/graph.py boruvka_mst): per-round
    component-min outgoing edge under the (w, a, b) total order,
    merges via the alternating-star connected-components loop.
    Nested iteration is not SQL-expressible -> rows-only driver check;
    Kruskal-parity pytests pin the exact edge set."""
    from .operators.graph import boruvka_mst

    return boruvka_mst(_road_graph_edges(spark))


def q_closeness(spark, sf_dir):
    """Landmark harmonic closeness centrality (operators/routing.py
    harmonic_closeness — Marchiori & Latora 2000, Eppstein & Wang 2004
    sampling) from the four corner facilities over the road lattice:
    ONE product-graph sssp sweep relaxes all four landmark replicas
    together, reciprocals quantize as exact 1e12 // dist_mm integer
    divisions, order-free BIGINT centrality sums."""
    from .operators.routing import harmonic_closeness

    return harmonic_closeness(
        _road_graph_edges(spark),
        spark.createDataFrame([(n,) for n in _FACILITY_NODES], "node int"),
    )


def _closeness_oracle() -> str:
    from .operators.routing import harmonic_closeness_oracle_sql

    return harmonic_closeness_oracle_sql(
        _road_graph_edges_sql(),
        list(_FACILITY_NODES),
        rounds=_SSSP_ROUNDS,
    )


def q_betweenness(spark, sf_dir):
    """K-source Brandes betweenness centrality (operators/routing.py
    betweenness — Brandes 2001, source-sampled per Brandes & Pich
    2007) from the four corner facilities over the road lattice: one
    product-graph sssp sweep, exact BIGINT shortest-path counts over
    the SP-DAG, and the ppm-quantized integer dependency accumulation
    — bit-identical to the fully unrolled DuckDB twin."""
    from .operators.routing import betweenness

    return betweenness(
        _road_graph_edges(spark),
        spark.createDataFrame([(n,) for n in _FACILITY_NODES], "node int"),
        rounds=_BETWEENNESS_ROUNDS,
    )


_BETWEENNESS_ROUNDS = 48


def _betweenness_oracle() -> str:
    from .operators.routing import betweenness_oracle_sql

    return betweenness_oracle_sql(
        _road_graph_edges_sql(),
        list(_FACILITY_NODES),
        sssp_rounds=_SSSP_ROUNDS,
        rounds=_BETWEENNESS_ROUNDS,
    )


def q_pagerank(spark, sf_dir):
    """Exact fixed-point PageRank (operators/pagerank.py) over the
    congestion-weighted lattice road graph: intersection centrality
    after exactly 12 rounds, classic uniform out-degree split, ranks
    as BIGINTs in 1e-12 units of total mass so every round is pure
    integer multiply / floor-div / sum — bit-identical to the
    unrolled DuckDB twin (Page et al. 1999; Jiang 2009 for street
    networks)."""
    from .operators.pagerank import pagerank

    return pagerank(_road_graph_edges(spark), rounds=_PAGERANK_ROUNDS)


def _pagerank_oracle() -> str:
    from .operators.pagerank import pagerank_oracle_sql

    return pagerank_oracle_sql(
        _road_graph_edges_sql(), rounds=_PAGERANK_ROUNDS
    )


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (operators/pagerank.py hits — Kleinberg
    1999) after 8 rounds over a one-way-street subset of the road
    lattice (dropping (src*13+dst)%3==0 arcs makes the graph
    genuinely asymmetric, so hub != authority): L1-normalized scores
    as BIGINTs in 1e-9 units, every round pure integer multiply /
    floor-div / sum — bit-identical to the unrolled DuckDB twin."""
    from .operators.pagerank import hits

    e = _road_graph_edges(spark).where(
        (F.col("src") * 13 + F.col("dst")) % 3 != 0
    )
    return hits(e, rounds=_HITS_ROUNDS)


_HITS_ROUNDS = 8


def _hits_oracle() -> str:
    from .operators.pagerank import hits_oracle_sql

    e_sql = (
        f"(SELECT src, dst FROM {_road_graph_edges_sql()} "
        "WHERE (src * 13 + dst) % 3 <> 0)"
    )
    return hits_oracle_sql(e_sql, rounds=_HITS_ROUNDS)


def q_ppr(spark, sf_dir):
    """Personalized PageRank (operators/pagerank.py pagerank with
    seeds — Jeh & Widom 2003 random walk with restart) from the four
    corner facilities: seed-relative network proximity scores, same
    exact fixed-point integer arithmetic with the teleport terms
    concentrated on the seed set."""
    from .operators.pagerank import pagerank

    return pagerank(
        _road_graph_edges(spark),
        rounds=_PAGERANK_ROUNDS,
        seeds=spark.createDataFrame(
            [(n,) for n in _FACILITY_NODES], "node int"
        ),
    )


def _ppr_oracle() -> str:
    from .operators.pagerank import pagerank_oracle_sql

    vals = ", ".join(f"({n})" for n in _FACILITY_NODES)
    return pagerank_oracle_sql(
        _road_graph_edges_sql(),
        rounds=_PAGERANK_ROUNDS,
        seeds_subq=f"(SELECT CAST(n AS INT) AS node FROM "
        f"(VALUES {vals}) t(n))",
    )


# Deterministic Manhattan street grid over the metro box for
# map-matching: 200 horizontal segments (10 rows x 20 blocks) + 200
# vertical (20 columns x 10 blocks), axis-aligned so the pairwise
# segment-distance kernel's exact branches fire.  Street offsets carry
# SIX decimals (0.050003) against the fixture's 1e-5-quantized point
# lattice, so no point can sit exactly midway between two parallel
# streets — the only distance ties left are shared-corner endpoint
# ties, which both engines compute as the identical haversine
# expression and break identically by seg_id.

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


def q_map_match(spark, sf_dir):
    """Map-matching join (operators/map_match.py): snap each metro fix
    to its nearest street segment within 150 m.  Segment covering is
    expanded 1 ring on the SMALL side and auto-broadcast, so each point
    joins on its single z17 tile address; per-point argmin is a
    map-side-partial min_by, not a window sort.  max_abs_lat=53.2
    matches the fixture band (z17, ~183 m ground cells)."""
    from .operators.map_match import map_match

    out = map_match(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )
    return out.select(
        "event_id",
        "user_id",
        "seg_id",
        F.round(F.col("dist_m"), 2).alias("dist_r2"),
    )


def q_segment_speeds(spark, sf_dir):
    """Composed per-segment speed profile (operators/map_match.py):
    session-window legs (mm + integer seconds) ride map_match's
    carry_cols through the covering probe, then one per-segment
    integer-sum aggregate — the big relation is exchanged once."""
    from .operators.map_match import segment_speeds

    return segment_speeds(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )


def _segment_speeds_oracle() -> str:
    from .operators.map_match import segment_speeds_oracle_sql

    return segment_speeds_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )


def q_segment_v85(spark, sf_dir):
    """Per-segment exact speed percentiles (operators/map_match.py
    segment_speed_percentiles): median / v85 (the FHWA speed-zoning
    statistic) / max leg speed as exact nearest-rank order statistics
    — no percentile_approx; one seg_id window whose exchange the final
    aggregate reuses."""
    from .operators.map_match import segment_speed_percentiles

    return segment_speed_percentiles(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )


def _segment_v85_oracle() -> str:
    from .operators.map_match import segment_speed_percentiles_oracle_sql

    return segment_speed_percentiles_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )


def _map_match_oracle() -> str:
    from .operators.map_match import map_match_oracle_sql

    inner = map_match_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )
    return (
        "SELECT event_id, user_id, seg_id, round(dist_m, 2) AS dist_r2 "
        f"FROM ({inner})"
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "extract_coords": q_extract_coords,
    "geohash_encode": q_geohash_encode,
    "gh_decode": q_gh_decode,
    "gh_neighbors": q_gh_neighbors,
    "utm_roundtrip": q_utm_roundtrip,
    "mgrs": q_mgrs,
    "utm_parse": q_utm_parse,
    "tile_assign": q_tile_assign,
    "quadkey": q_quadkey,
    "tile_bbox": q_tile_bbox,
    "tile_neighbors": q_tile_neighbors,
    "cover_cells": q_cover_cells,
    "prefix_scan": q_prefix_scan,
    "s2_encode": q_s2_encode,
    "s2_range_scan": q_s2_range_scan,
    "s2_radius_join": q_s2_radius_join,
    "s2_knn": q_s2_knn,
    "s2_heatmap": q_s2_heatmap,
    "s2_pip_join": q_s2_pip_join,
    "s2_pip_semi": q_s2_pip_semi,
    "s2_pip_anti": q_s2_pip_anti,
    "s2_pip_join_big": q_s2_pip_join_big,
    "s2_radius_join_bulk": q_s2_radius_join_bulk,
    "bbox_filter": q_bbox_filter,
    "pip_join": q_pip_join,
    "pip_join_big": q_pip_join_big,
    "pip_semi": q_pip_semi,
    "pip_anti": q_pip_anti,
    "events_tile_hourly": q_events_tile_hourly,
    "radius_join": q_radius_join,
    "knn": q_knn,
    "knn_window": q_knn_window,
    "knn_bulk": q_knn_bulk,
    "radius_join_bulk": q_radius_join_bulk,
    "idw": q_idw,
    "segment_join": q_segment_join,
    "hex_encode": q_hex_encode,
    "hex_kring": q_hex_kring,
    "hex_radius_join": q_hex_radius_join,
    "hex_radius_join_bulk": q_hex_radius_join_bulk,
    "hex_knn": q_hex_knn,
    "hex_knn_bulk": q_hex_knn_bulk,
    "hex_adversarial": q_hex_adversarial,
    "hex_pip_join": q_hex_pip_join,
    "hex_pip_semi": q_hex_pip_semi,
    "hex_pip_anti": q_hex_pip_anti,
    "hex_heatmap": q_hex_heatmap,
    "distances": q_distances,
    "rhumb": q_rhumb,
    "vincenty": q_vincenty,
    "dms": q_dms,
    "translate": q_translate,
    "rotate": q_rotate,
    "noise_filter": q_noise_filter,
    "bbox_agg": q_bbox_agg,
    "convex_hull": q_convex_hull,
    "concave_hull": q_concave_hull,
    "simplify": q_simplify,
    "tile_heatmap": q_tile_heatmap,
    "salted_cell_counts": q_salted_cell_counts,
    "dedup_exact": q_dedup_exact,
    "dedup_head": q_dedup_head,
    "intersects": q_intersects,
    "poly_intersects": q_poly_intersects,
    "geojson_roundtrip": q_geojson_roundtrip,
    "geojson_io_url": q_geojson_io_url,
    "ndjson_features": q_ndjson_features,
    "fc_explode": q_fc_explode,
    "bbox_area": q_bbox_area,
    "hull_area": q_hull_area,
    "ngram_jaccard": q_ngram_jaccard,
    "embed_pairs_topk": q_embed_pairs_topk,
    "token_stats": q_token_stats,
    "tfidf_sim": q_tfidf_sim,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "winnow": q_winnow,
    "winnow_pairs": q_winnow_pairs,
    "ann_brute": q_ann_brute,
    "embed_quantize": q_embed_quantize,
    "ann_quant": q_ann_quant,
    "ann_lsh": q_ann_lsh,
    "embed_near_dups": q_embed_near_dups,
    "ann_ivf": q_ann_ivf,
    "ann_join": q_ann_join,
    "minhash_candidates": q_minhash_candidates,
    "simhash": q_simhash,
    "pipeline_near_dup": q_pipeline_near_dup,
    "dedup_groups": q_dedup_groups,
    "overlay_join": q_overlay_join,
    "overlay_adversarial": q_overlay_adversarial,
    "media_features": q_media_features,
    "frame_sample": q_frame_sample,
    "traj_sessions": q_traj_sessions,
    "traj_trips": q_traj_trips,
    "traj_speed": q_traj_speed,
    "traj_stays": q_traj_stays,
    "traj_od": q_traj_od,
    "traj_simplify": q_traj_simplify,
    "colocation": q_colocation,
    "convoys": q_convoys,
    "hotspot_gi": q_hotspot_gi,
    "morans_i": q_morans_i,
    "traj_hausdorff": q_traj_hausdorff,
    "traj_frechet": q_traj_frechet,
    "traj_resample": q_traj_resample,
    "geofence_dwell": q_geofence_dwell,
    "asof_snap": q_asof_snap,
    "route_clusters": q_route_clusters,
    "segment_speeds": q_segment_speeds,
    "zonal_stats": q_zonal_stats,
    "hmm_match": q_hmm_match,
    "grid_dbscan": q_grid_dbscan,
    "map_match": q_map_match,
    "kde": q_kde,
    "ripley": q_ripley,
    "clark_evans": q_clark_evans,
    "pcf": q_pcf,
    "variogram": q_variogram,
    "traj_dtw": q_traj_dtw,
    "traj_lcss": q_traj_lcss,
    "traj_edr": q_traj_edr,
    "sssp": q_sssp,
    "isochrone": q_isochrone,
    "nearest_facility": q_nearest_facility,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "closeness": q_closeness,
    "betweenness": q_betweenness,
    "mst": q_mst,
    "mobility": q_mobility,
    "heading_stats": q_heading_stats,
    "cell_transitions": q_cell_transitions,
    "mann_kendall": q_mann_kendall,
    "emerging_hotspots": q_emerging_hotspots,
    "segment_v85": q_segment_v85,
    "ppr": q_ppr,
    "quadrat": q_quadrat,
    "lisa": q_lisa,
    "gearys_c": q_gearys_c,
    "join_counts": q_join_counts,
    "triangles": q_triangles,
    "assortativity": q_assortativity,
    "huff": q_huff,
    "kcore": q_kcore,
    "sde": q_sde,
    "bimoran": q_bimoran,
    "lq": q_lq,
    "st_dbscan": q_st_dbscan,
    "gini": q_gini,
    "entropy": q_entropy,
    "focal_stats": q_focal_stats,
    "stkde": q_stkde,
    "ht_breaks": q_ht_breaks,
    "trend_surface": q_trend_surface,
    "segregation": q_segregation,
    "median_center": q_median_center,
    "clq": q_clq,
    "general_g": q_general_g,
    "knox": q_knox,
}


def build_oracles() -> dict[str, str]:
    oracles = _static_oracles()
    ivf = _ann_ivf_oracle()
    if ivf is not None:
        oracles["ann_ivf"] = ivf
    return oracles


def _static_oracles() -> dict[str, str]:
    return {
        "extract_coords": O_EXTRACT,
        "geohash_encode": O_GEOHASH,
        "gh_decode": _gh_decode_oracle(),
        "gh_neighbors": _gh_neighbors_oracle(),
        "utm_parse": O_UTM_PARSE,
        "tile_assign": _tile_oracle(),
        "quadkey": _quadkey_oracle(),
        "tile_bbox": _tile_bbox_oracle(),
        "tile_neighbors": _tile_neighbors_oracle(),
        "prefix_scan": O_PREFIX,
        "s2_encode": _s2_encode_oracle(),
        "s2_range_scan": _s2_range_oracle(),
        "s2_radius_join": O_RADIUS,
        "s2_knn": O_KNN,
        "s2_heatmap": _s2_heatmap_oracle(),
        "s2_pip_join": _pip_oracle(),
        "s2_pip_semi": O_PIP_SEMI,
        "s2_pip_anti": O_PIP_ANTI,
        "s2_pip_join_big": _pip_oracle(),
        "s2_radius_join_bulk": _s2_radius_bulk_oracle(),
        "bbox_filter": O_BBOX,
        "pip_join": _pip_oracle(),
        "pip_join_big": _pip_oracle(),
        "pip_semi": O_PIP_SEMI,
        "pip_anti": O_PIP_ANTI,
        "events_tile_hourly": _events_oracle(),
        "radius_join": O_RADIUS,
        "knn": O_KNN,
        "knn_window": O_KNN_WINDOW,
        "knn_bulk": _knn_bulk_oracle(),
        "radius_join_bulk": _radius_join_bulk_oracle(),
        "idw": _idw_oracle(),
        "segment_join": _segment_join_oracle(),
        "hex_encode": _hex_encode_oracle(),
        "hex_kring": _hex_kring_oracle(),
        "hex_radius_join": O_RADIUS,
        "hex_radius_join_bulk": _hex_radius_bulk_oracle(),
        "hex_knn": O_KNN,
        "hex_knn_bulk": _hex_knn_bulk_oracle(),
        "hex_adversarial": _hex_adversarial_oracle(),
        "hex_pip_join": _pip_oracle(),
        "hex_pip_semi": O_PIP_SEMI,
        "hex_pip_anti": O_PIP_ANTI,
        "hex_heatmap": _hex_heatmap_oracle(),
        "distances": _distances_oracle(),
        "rhumb": _rhumb_oracle(),
        "dms": _dms_oracle(),
        "translate": _translate_oracle(),
        "rotate": _rotate_oracle(),
        "noise_filter": O_NOISE,
        "bbox_agg": O_BBOX_AGG,
        "tile_heatmap": _heatmap_oracle(),
        "salted_cell_counts": O_SALTED,
        "dedup_exact": O_DEDUP_EXACT,
        "dedup_head": O_DEDUP_HEAD,
        "geojson_roundtrip": O_GEOJSON,
        "geojson_io_url": _geojson_io_url_oracle(),
        "ndjson_features": O_NDJSON,
        "fc_explode": _fc_explode_oracle(),
        "bbox_area": _bbox_area_oracle(),
        "ngram_jaccard": O_NGRAM_JACCARD,
        "embed_pairs_topk": O_EMBED_PAIRS,
        "token_stats": O_TOKEN_STATS,
        "tfidf_sim": _tfidf_sim_oracle(),
        "text_quality": O_TEXT_QUALITY,
        "lang_id": _lang_oracle(),
        "fingerprint": O_FINGERPRINT,
        "winnow": _winnow_oracle(),
        "winnow_pairs": _winnow_pairs_oracle(),
        "ann_brute": O_ANN_BRUTE,
        "embed_quantize": O_EMBED_QUANTIZE,
        "ann_quant": O_ANN_QUANT,
        "ann_lsh": _ann_lsh_oracle(),
        "embed_near_dups": _embed_near_dups_oracle(),
        "ann_join": _ann_join_oracle(),
        "media_features": O_MEDIA,
        "frame_sample": O_FRAME_SAMPLE,
        "simhash": dedup.simhash_oracle_sql(),
        "minhash_candidates": dedup.minhash_candidates_oracle_sql(),
        "pipeline_near_dup": _pipeline_near_dup_oracle(),
        "dedup_groups": _dedup_groups_oracle(),
        "intersects": _intersects_oracle(),
        "poly_intersects": _poly_intersects_oracle(),
        "overlay_join": _overlay_oracle(),
        "overlay_adversarial": _overlay_adversarial_oracle(),
        "vincenty": _vincenty_oracle(),
        "utm_roundtrip": _utm_roundtrip_oracle(),
        "mgrs": _mgrs_oracle(),
        "traj_sessions": _traj_sessions_oracle(),
        "traj_trips": traj.trip_stats_oracle_sql(_TRAJ_SUBQ, gap_s=43200),
        "traj_speed": _traj_speed_oracle(),
        "traj_stays": traj.stay_points_oracle_sql(
            _TRAJ_SUBQ, radius_m=100.0, min_fixes=2
        ),
        "traj_od": traj.od_matrix_oracle_sql(_TRAJ_SUBQ, gap_s=43200, zoom=6),
        "colocation": _colocation_oracle(),
        "convoys": _convoys_oracle(),
        "grid_dbscan": _grid_dbscan_oracle(),
        "hotspot_gi": _hotspot_gi_oracle(),
        "morans_i": _morans_i_oracle(),
        "traj_hausdorff": _traj_hausdorff_oracle(),
        "traj_frechet": _traj_frechet_oracle(),
        "traj_resample": _traj_resample_oracle(),
        "geofence_dwell": _geofence_dwell_oracle(),
        "asof_snap": _asof_snap_oracle(),
        "route_clusters": _route_clusters_oracle(),
        "segment_speeds": _segment_speeds_oracle(),
        "zonal_stats": _zonal_stats_oracle(),
        "hmm_match": _hmm_match_oracle(),
        "map_match": _map_match_oracle(),
        "kde": _kde_oracle(),
        "ripley": _ripley_oracle(),
        "clark_evans": _clark_evans_oracle(),
        "pcf": _pcf_oracle(),
        "variogram": _variogram_oracle(),
        "traj_dtw": _traj_dtw_oracle(),
        "traj_lcss": _traj_lcss_oracle(),
        "traj_edr": _traj_edr_oracle(),
        "sssp": _sssp_oracle(),
        "isochrone": _isochrone_oracle(),
        "nearest_facility": _nearest_facility_oracle(),
        "pagerank": _pagerank_oracle(),
        "hits": _hits_oracle(),
        "closeness": _closeness_oracle(),
        "betweenness": _betweenness_oracle(),
        "mobility": _mobility_oracle(),
        "heading_stats": _heading_stats_oracle(),
        "cell_transitions": _cell_transitions_oracle(),
        "mann_kendall": _mann_kendall_oracle(),
        "emerging_hotspots": _emerging_hotspots_oracle(),
        "segment_v85": _segment_v85_oracle(),
        "ppr": _ppr_oracle(),
        "quadrat": _quadrat_oracle(),
        "lisa": _lisa_oracle(),
        "gearys_c": _gearys_c_oracle(),
        "join_counts": _join_counts_oracle(),
        "triangles": _triangles_oracle(),
        "assortativity": _assortativity_oracle(),
        "huff": _huff_oracle(),
        "kcore": _kcore_oracle(),
        "sde": _sde_oracle(),
        "bimoran": _bimoran_oracle(),
        "lq": _lq_oracle(),
        "st_dbscan": _st_dbscan_oracle(),
        "gini": _gini_oracle(),
        "entropy": _entropy_oracle(),
        "focal_stats": _focal_stats_oracle(),
        "stkde": _stkde_oracle(),
        "ht_breaks": _ht_breaks_oracle(),
        "trend_surface": _trend_surface_oracle(),
        "segregation": _segregation_oracle(),
        "median_center": _median_center_oracle(),
        "clq": _clq_oracle(),
        "general_g": _general_g_oracle(),
        "knox": _knox_oracle(),
        # rows-only (set-mutating iterative geometry, no SQL twin):
        # cover_cells, convex_hull, concave_hull, simplify, hull_area.
        # ann_ivf's oracle is added dynamically in build_oracles()
        # (centroids re-derived from the sf0.01 parquet).
    }
