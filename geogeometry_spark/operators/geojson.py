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
