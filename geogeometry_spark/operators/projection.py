"""UTM / UPS / MGRS projection operators + UTM-string extraction.

SURVEY.md §2.3 / §2.7: the reference's WGS84↔UTM/UPS chain (utm.kt) and
MGRS grid refs (mgrs.kt) as DataFrame operators.  Conversions run in
vectorized pandas UDFs (power series, iterative footpoint latitude);
the UTM-string scan (utm.kt:120-142) is pure JVM regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import (
    mgrs_from_utm,
    mgrs_to_utm_en,
    utm_from_wgs84,
    utm_to_wgs84,
)

# utmRegex (utm.kt:120) — Java-compatible as-is
UTM_REGEX = r"(([0-9]{1,2})\s*([a-zA-Z])\s+(\d*\.?\d+)\s+(\d*\.?\d+))"


def with_utm(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Adds longitude_zone / latitude_zone_letter / easting / northing
    (UTM in [-80,84], UPS beyond — utm.kt:302-308)."""
    u = utm_from_wgs84(F.col(lat_col), F.col(lon_col))
    return df.withColumns(
        {
            "longitude_zone": u["longitude_zone"],
            "latitude_zone_letter": u["latitude_zone_letter"],
            "easting": u["easting"],
            "northing": u["northing"],
        }
    )


def utm_roundtrip(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """WGS84 -> UTM/UPS -> WGS84, with the reconstructed point and the
    haversine error in meters (UTMTest.kt:122-140 asserts < 1 m)."""
    from ..functions import columns as C

    out = with_utm(df, lat_col, lon_col)
    back = utm_to_wgs84(
        F.col("longitude_zone"),
        F.col("latitude_zone_letter"),
        F.col("easting"),
        F.col("northing"),
    )
    out = out.withColumns({"lat2": back["lat"], "lon2": back["lon"]})
    return out.withColumn(
        "err_m",
        C.haversine(F.col(lat_col), F.col(lon_col), F.col("lat2"), F.col("lon2")),
    )


def with_mgrs(df_utm: DataFrame) -> DataFrame:
    """UTM columns -> MGRS grid letters + in-grid easting/northing +
    1 m USNG string (mgrs.kt:107-161)."""
    m = mgrs_from_utm(
        F.col("longitude_zone"),
        F.col("latitude_zone_letter"),
        F.col("easting"),
        F.col("northing"),
    )
    return df_utm.withColumns(
        {
            "grid_col": m["first_letter"],
            "grid_row": m["second_letter"],
            "grid_easting": m["easting"],
            "grid_northing": m["northing"],
            "usng": m["usng"],
        }
    )


def mgrs_roundtrip(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """point -> UTM -> MGRS -> UTM, reporting easting/northing deltas
    (MGRSTest.kt:30-46 asserts < 2 m)."""
    out = with_mgrs(with_utm(df, lat_col, lon_col))
    back = mgrs_to_utm_en(
        F.col("longitude_zone"),
        F.col("latitude_zone_letter"),
        F.col("grid_col"),
        F.col("grid_row"),
        F.col("grid_easting"),
        F.col("grid_northing"),
    )
    return out.withColumns(
        {
            "easting_back": back["easting"],
            "northing_back": back["northing"],
            "err_easting": F.abs(F.floor(F.col("easting")) - back["easting"]),
            "err_northing": F.abs(F.floor(F.col("northing")) - back["northing"]),
        }
    )


def find_utm_in_text(
    df: DataFrame, text_col: str, keep: list[str] | None = None
) -> DataFrame:
    """All UTM strings in free text -> one row per hit with parsed
    fields (findUTMCoordinates, utm.kt:133-142).  JVM regex, no Python."""
    hits = df.select(
        *(keep or df.columns),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(UTM_REGEX), 1)
        ).alias("utm_str"),
    )
    return hits.withColumns(
        {
            "longitude_zone": F.regexp_extract(
                F.col("utm_str"), UTM_REGEX, 2
            ).cast("int"),
            "latitude_zone_letter": F.upper(
                F.regexp_extract(F.col("utm_str"), UTM_REGEX, 3)
            ),
            "easting": F.regexp_extract(F.col("utm_str"), UTM_REGEX, 4).cast(
                "double"
            ),
            "northing": F.regexp_extract(F.col("utm_str"), UTM_REGEX, 5).cast(
                "double"
            ),
        }
    )
