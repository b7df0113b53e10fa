"""Shared imports and tiny helpers for the contract family modules.

Driver-contract queries and their DuckDB oracles.

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

from ..fixtures import BIG_RING, CONCAVE_RING, SMALL_RING
from ..functions import columns as C
from ..functions import hexcell as HX
from ..functions import s2cell as S2
from ..kernels import hexgrid as hgk
from ..kernels import s2 as s2k
from ..operators import dedup, similarity, text
from ..operators import trajectory as traj
from ..operators.extract import extract_coordinates
from ..operators.knn import knn, knn_window
from ..operators.pip_join import pip_join, radius_join
from ..operators.prefix_scan import prefix_filter_long
from ..operators.skew import salted_agg
from ..operators.tiling import assign_tiles, tile_heatmap
from ..operators.multimodal import extract_media_features, media_spans
from ..functions.udfs import vincenty_full
from ..sources import tables as src

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


#: everything the family modules pull in via ``from ._shared import *``
__all__ = [
    'BERLIN',
    'BIG_RING',
    'C',
    'CONCAVE_RING',
    'DataFrame',
    'F',
    'HX',
    'S2',
    'SMALL_RING',
    'SparkSession',
    '_COORD_SUBQ',
    '_docs_coords',
    '_with_cell',
    'assign_tiles',
    'dedup',
    'extract_coordinates',
    'extract_media_features',
    'hgk',
    'knn',
    'knn_window',
    'media_spans',
    'pip_join',
    'prefix_filter_long',
    'radius_join',
    's2k',
    'salted_agg',
    'similarity',
    'src',
    'text',
    'tile_heatmap',
    'traj',
    'vincenty_full',
]
