"""Radius join through the S2 index — the cap-covering analogue of
``radius_join`` (operators/pip_join.py), which prunes with geohash
circle covers (GeoHashUtils.kt:829-843).

Plan shape (identical scale story as the geohash path):
one broadcast of the few-dozen-cell covering relation, points compute
their level-L cell natively (functions/s2cell.py — no UDF, no shuffle),
broadcast hash equi-join on the cell id, then the exact haversine
(GeoGeometry.kt:565-580 op order) re-checks every survivor with native
codegen'd Columns.  Zero exchanges on the points side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from ..functions import s2cell as S2
from ..kernels import s2 as ks2


def s2_radius_join(
    points: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    level: int | None = None,
) -> DataFrame:
    """Points within ``radius_m`` of the center, pruned by a conservative
    S2 cap covering (kernels/s2.py cap_covering) before the exact
    distance predicate.  Output = input columns + ``dist_m``."""
    spark = points.sparkSession
    if level is None:
        level = ks2.suitable_level(radius_m)
    ids, _interior = ks2.cap_covering(center_lat, center_lon, radius_m, level)
    cells = spark.createDataFrame([(int(i),) for i in ids], "cell_key long")
    key = S2.s2_cell_id(F.col(lat_col), F.col(lon_col), level)
    dist = C.haversine(
        F.col(lat_col), F.col(lon_col), F.lit(center_lat), F.lit(center_lon)
    )
    return (
        points.join(F.broadcast(cells), key == F.col("cell_key"), "inner")
        .drop("cell_key")
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.lit(radius_m))
    )
