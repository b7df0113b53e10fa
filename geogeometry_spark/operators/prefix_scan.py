"""Geohash-prefix range scans.

The geohash prefix property (a cell's children share its prefix,
GeoHashUtils.kt:289-291, README.md:72/109) turns "all points inside this
cell" into a sortable range predicate.  On a cell-sorted / cell-
partitioned table, Catalyst prunes row groups and partitions from the
parquet min/max stats — expressed as a BETWEEN on the cell column so the
filter pushes into the scan (checked in tests via the explain plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# '~' sorts after every base32 geohash character (z < ~ in ASCII)
_HIGH = "~"


def prefix_filter_long(
    df: DataFrame, prefix: str, cell_id_col: str = "cell_id", full_length: int = 12
) -> DataFrame:
    """Prefix scan on the interleaved-long cell key: the prefix becomes a
    closed integer range [p << b, ((p+1) << b) - 1] — a pure long BETWEEN
    that pushes into parquet min/max row-group stats (the preferred hot
    path; string prefixes are for the API edge)."""
    from ..functions.columns import string_cell_to_long

    bits = 5 * (full_length - len(prefix))
    p = string_cell_to_long(prefix)
    lo = p << bits
    hi = ((p + 1) << bits) - 1
    return df.where(F.col(cell_id_col).between(F.lit(lo), F.lit(hi)))


def prefix_filter(df: DataFrame, prefix: str, cell_col: str = "cell12") -> DataFrame:
    """Rows whose cell starts with ``prefix``, as a pushdown-friendly
    range predicate (startswith compiles to the same, but BETWEEN makes
    the row-group skipping obvious in the plan)."""
    return df.where(
        F.col(cell_col).between(F.lit(prefix), F.lit(prefix + _HIGH))
    )


def prefix_filter_many(
    df: DataFrame, prefixes: list[str], cell_col: str = "cell12"
) -> DataFrame:
    """OR of prefix ranges (e.g. a covering's cell set as a scan filter)."""
    pred = None
    for p in prefixes:
        clause = F.col(cell_col).between(F.lit(p), F.lit(p + _HIGH))
        pred = clause if pred is None else (pred | clause)
    return df.where(pred) if pred is not None else df


def write_cell_bucketed(
    df: DataFrame,
    table_name: str,
    cell_length: int = 6,
    n_buckets: int = 32,
    cell_id_col: str = "cell_id",
) -> None:
    """Persist the points bucketed (and sorted) by the precision-p cell
    key — the co-located-join layout: every spatial equi-join on the
    cell key (PIP cover join, radius cover join, knn_bulk ring join)
    then reads pre-hashed buckets and Spark drops the points-side
    Exchange entirely (asserted in tests).  At 100 TB this converts the
    biggest shuffle of every query into a one-time write cost.

    Parquet bucketed tables require saveAsTable (bucket metadata lives
    in the catalog; on Iceberg use ``bucket(n, cell_key)`` hidden
    partitioning for the same effect)."""
    from ..functions.columns import cell_prefix

    (
        df.withColumn("cell_key", cell_prefix(F.col(cell_id_col), cell_length))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "cell_key")
        .sortBy("cell_key")
        .saveAsTable(table_name)
    )


def write_cell_sorted(
    df: DataFrame, path: str, cell_col: str = "cell12", prefix_len: int = 3
) -> None:
    """Persist cell-sorted + cell-prefix-partitioned parquet so future
    prefix scans prune partitions AND row groups (Iceberg hidden
    partitioning truncate(cell, k) equivalent)."""
    (
        df.withColumn("cell_prefix", F.substring(F.col(cell_col), 1, prefix_len))
        .repartition(F.col("cell_prefix"))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )
