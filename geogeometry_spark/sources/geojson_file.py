"""Newline-delimited GeoJSON file source / sink.

The reference serializes whole ``FeatureCollection`` documents
(geojson.kt:783-823).  That is the right interchange unit for a map
viewer and the wrong one for a 100 TB table: one JSON document is one
unsplittable blob — a single reader parses it and a single writer
concatenates it (``operators.geojson.feature_collection`` keeps that
shape, guarded, for small outputs).

The bulk format here is **NDJSON Features** — one GeoJSON ``Feature``
object per line:

- *writes* are partition-parallel ``df.write.text`` (one file per task,
  no single-reducer concat, any text-capable FS/committer);
- *reads* are ``spark.read.text`` — line-splittable, so a 1 TB feature
  dump scans with full parallelism, and the per-line JSON field pulls
  (``get_json_object``) stay inside whole-stage codegen;
- a stored ``FeatureCollection`` column still converts losslessly via
  ``explode_feature_collection`` (Spark 4 VARIANT ``variant_explode`` —
  native JVM, no Python workers).

Feature lines are built by string concatenation around the
geometry-JSON column rather than ``to_json(struct(...))`` so any
geometry type (whose coordinate nesting depth varies, geojson.kt:25-36)
passes through byte-exact without a per-type schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def feature_line(geometry_json: Column | str, props: list[str]) -> Column:
    """One GeoJSON Feature object (RFC 7946 §3.2) as a string Column:
    ``{"type":"Feature","geometry":<g>,"properties":{...}}``.

    ``geometry_json`` is a column already holding geometry JSON (e.g.
    from ``operators.geojson.point_geojson`` or a parsed source);
    ``props`` are column names carried into ``properties``.  A NULL
    geometry renders as JSON ``null`` (the reference's Feature allows a
    null geometry, geojson.kt:738-774)."""
    geom = F.col(geometry_json) if isinstance(geometry_json, str) else geometry_json
    props_json = (
        F.to_json(F.struct(*[F.col(p) for p in props])) if props else F.lit("{}")
    )
    return F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(geom, F.lit("null")),
        F.lit(',"properties":'),
        props_json,
        F.lit("}"),
    )


def write_geojson_features(
    df: DataFrame,
    geometry_json_col: str,
    props: list[str],
    path: str,
    mode: str = "overwrite",
) -> None:
    """Bulk GeoJSON sink: NDJSON Feature lines, one text file per
    partition (no shuffle, no single reducer)."""
    df.select(
        feature_line(geometry_json_col, props).alias("value")
    ).write.mode(mode).text(path)


def read_geojson_features(
    spark: SparkSession, path: str, props: list[str] | None = None
) -> DataFrame:
    """Bulk GeoJSON source: read NDJSON Feature lines into
    (feature, geom_type, geometry[, *props]).

    ``geometry`` is the raw geometry JSON string — feed it to
    ``operators.geojson.parse_geojson`` / ``parse_points`` for typed
    coordinates.  Property values come back as strings
    (``get_json_object``); cast at the call site.  Blank lines and
    non-Feature lines yield NULL geom_type (quarantine downstream, the
    engine's invalid-input rule)."""
    lines = spark.read.text(path)
    cols = [
        F.col("value").alias("feature"),
        F.get_json_object("value", "$.geometry.type").alias("geom_type"),
        F.get_json_object("value", "$.geometry").alias("geometry"),
    ]
    for p in props or []:
        cols.append(F.get_json_object("value", f"$.properties.{p}").alias(p))
    return lines.select(*cols)


def stream_geojson_features(
    spark: SparkSession, path: str, props: list[str] | None = None
) -> DataFrame:
    """Streaming twin of ``read_geojson_features``: a Structured
    Streaming text source over the same NDJSON Feature directory, with
    the identical native projection — so an ingest pipeline can tail a
    feature-dump directory (availableNow for catch-up batches, default
    trigger for continuous ingest) and feed the exact columns the batch
    reader produces.  Text streaming needs no user schema; new files
    are discovered per micro-batch and split by line."""
    lines = spark.readStream.text(path)
    cols = [
        F.col("value").alias("feature"),
        F.get_json_object("value", "$.geometry.type").alias("geom_type"),
        F.get_json_object("value", "$.geometry").alias("geometry"),
    ]
    for p in props or []:
        cols.append(F.get_json_object("value", f"$.properties.{p}").alias(p))
    return lines.select(*cols)


def explode_feature_collection(
    df: DataFrame, fc_col: str, keep: list[str] | None = None
) -> DataFrame:
    """FeatureCollection string column -> one row per Feature:
    (*keep, pos, feature).

    Native Spark 4 VARIANT path: ``parse_json`` -> ``variant_explode``
    over ``$.features`` — a JVM generator, no Python workers and no
    per-type coordinate schema.  ``feature`` is the Feature's JSON
    string (``to_json`` of the variant), so the output composes with
    ``read_geojson_features``-style field pulls.  Malformed JSON or a
    missing/non-array ``features`` field yields zero rows for that
    input row (``try_variant_get`` + ``try_parse_json`` quarantine
    semantics) instead of failing the job."""
    keep = list(keep or [])
    spark = df.sparkSession
    feats = F.expr(
        f"try_variant_get(try_parse_json(`{fc_col}`), '$.features')"
    )
    exploded = df.lateralJoin(spark.tvf.variant_explode(feats.outer()))
    return exploded.select(
        *keep, "pos", F.to_json(F.col("value")).alias("feature")
    )
