"""Relation-scale segment-intersection (line-crossing) join.

The reference tests one segment pair at a time (``linesCross``,
GeoGeometry.kt:345-420 — the gradient/intercept formulation); this is
its distributed join form: two relations of segments (road networks,
trajectories legs, cable routes), all crossing pairs.

Candidates: each segment explodes the grid cells its planar bounding
box touches at ``precision`` (the geohash bisection lattice the other
joins use), and candidates are ONE shuffle equi-join on the cell key —
two segments that intersect have overlapping bboxes, and two
overlapping bboxes share at least one touched cell, so the candidate
set is a superset of the answer.  The exact test then mirrors the
reference's linesCross formula LITERALLY — same branches, same op
order, both as native Spark Columns and as the DuckDB oracle twin, so
every float decision is bit-identical across engines (verbatim means
verbatim: the reference's quirks are preserved and documented below).

Scale notes: the join ships only (id, 4 coords) per side; output pairs
dedup on (id_a, id_b) bounded by true bbox-cell co-occupancy.  Segments
whose bbox touches more than ``max_cells`` cells at ``precision`` are
EXCLUDED, not silently truncated (radius_join_bulk's convention:
re-run the long ones at a coarser precision).  Everything is planar,
exactly like the reference formula — split antimeridian-crossing
segments upstream if they should wrap rather than span the map.

Reference quirks preserved (both engines, by construction):
- vertical×horizontal: the vertical-line branch never checks that the
  vertical x lies inside the horizontal segment's x-extent (its
  y-interval check degenerates to always-true for v1 == v2);
- parallel non-vertical segments: collinearity is an intercept
  tolerance (|a1 − a2| < 1e-7), then x-interval overlap is tested on
  u endpoints only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C

__all__ = ["lines_cross_col", "lines_cross_sql", "segment_join"]


def _between(a: Column, b: Column, v: Column) -> Column:
    # GeoGeometry.kt:423-428 via least/greatest (equivalent for the
    # non-NaN doubles this operates on)
    return (v >= F.least(a, b)) & (v <= F.greatest(a, b))


def lines_cross_col(
    x1: Column, y1: Column, x2: Column, y2: Column,
    u1: Column, v1: Column, u2: Column, v2: Column,
) -> Column:
    """Native-Column twin of kernels.geometry.lines_cross
    (GeoGeometry.kt:345-420 verbatim), for join-predicate use."""
    g2 = (v2 - v1) / (u2 - u1)
    a2 = v1 - g2 * u1
    yi_1v = a2 + g2 * x1
    g1 = (y2 - y1) / (x2 - x1)
    a1 = y1 - g1 * x1
    yi_2v = a1 + g1 * u1
    xi = -(a1 - a2) / (g1 - g2)
    yi = a1 + g1 * xi
    both_vertical = F.when(
        x1 == u1,
        (F.least(y1, y2) <= F.greatest(v1, v2))
        & (F.least(v1, v2) <= F.greatest(y1, y2)),
    ).otherwise(F.lit(False))
    parallel = F.when(
        F.abs(a1 - a2) < F.lit(0.0000001),
        _between(x1, x2, u1) | _between(x1, x2, u2),
    ).otherwise(F.lit(False))
    general = (
        ((x1 - xi) * (xi - x2) >= 0)
        & ((u1 - xi) * (xi - u2) >= 0)
        & ((y1 - yi) * (yi - y2) >= 0)
        & ((v1 - yi) * (yi - v2) >= 0)
    )
    return (
        F.when((x1 == x2) & (u1 == u2), both_vertical)
        .when(x1 == x2, _between(y1, y2, yi_1v) & _between(v1, v2, yi_1v))
        .when(u1 == u2, _between(y1, y2, yi_2v) & _between(v1, v2, yi_2v))
        .when(g1 - g2 == 0.0, parallel)
        .otherwise(general)
    )


def lines_cross_sql(
    x1: str, y1: str, x2: str, y2: str,
    u1: str, v1: str, u2: str, v2: str,
) -> str:
    """SQL twin of :func:`lines_cross_col` — delegates to the existing
    :func:`..functions.columns.lines_cross_expr_sql` (same verbatim
    branches), re-exported here so the Column/SQL pair lives together
    at the join call sites."""
    return C.lines_cross_expr_sql(x1, y1, x2, y2, u1, v1, u2, v2)


def _cells(
    df: DataFrame,
    lat1: str, lon1: str, lat2: str, lon2: str,
    precision: int,
    max_cells: int,
    keep: list,
) -> DataFrame:
    ia1, io1 = C.cell_indices(F.col(lat1), F.col(lon1), precision)
    ia2, io2 = C.cell_indices(F.col(lat2), F.col(lon2), precision)
    lo_a, hi_a = F.least(ia1, ia2), F.greatest(ia1, ia2)
    lo_o, hi_o = F.least(io1, io2), F.greatest(io1, io2)
    n = (hi_a - lo_a + 1) * (hi_o - lo_o + 1)
    d = (
        df.select(*keep, lo_a.alias("_la"), hi_a.alias("_ha"),
                  lo_o.alias("_lo"), hi_o.alias("_ho"))
        .where(n <= F.lit(max_cells))
        .withColumn("_ia", F.explode(F.sequence(F.col("_la"), F.col("_ha"))))
        .withColumn("_io", F.explode(F.sequence(F.col("_lo"), F.col("_ho"))))
    )
    return d.select(
        *keep,
        C.interleave_indices(F.col("_ia"), F.col("_io"), precision).alias(
            "_cell"
        ),
    )


def segment_join(
    a: DataFrame,
    b: DataFrame,
    a_id: str = "id_a",
    b_id: str = "id_b",
    a_cols: tuple = ("alat1", "alon1", "alat2", "alon2"),
    b_cols: tuple = ("blat1", "blon1", "blat2", "blon2"),
    precision: int = 6,
    max_cells: int = 64,
) -> DataFrame:
    """All (id_a, id_b) pairs whose segments intersect (reference
    linesCross semantics).  Coordinates are passed to the formula as
    (x=lat, y=lon), matching kernels/intersect.py's call convention."""
    ac = _cells(a, *a_cols, precision, max_cells, [a_id, *a_cols])
    bc = _cells(b, *b_cols, precision, max_cells, [b_id, *b_cols])
    cross = lines_cross_col(
        F.col(a_cols[0]), F.col(a_cols[1]),
        F.col(a_cols[2]), F.col(a_cols[3]),
        F.col(b_cols[0]), F.col(b_cols[1]),
        F.col(b_cols[2]), F.col(b_cols[3]),
    )
    return (
        ac.join(bc, "_cell")
        .where(cross)
        .select(a_id, b_id)
        .dropDuplicates([a_id, b_id])
    )


def segment_join_oracle_sql(
    a_subq: str,
    b_subq: str,
    precision: int = 6,
    max_cells: int = 64,
) -> str:
    """DuckDB twin: candidate set = bbox cell-range overlap in both
    index dimensions (identical to 'the exploded cell sets intersect'),
    same over-cap exclusion, then the verbatim linesCross twin.
    ``a_subq`` exposes (id_a, alat1, alon1, alat2, alon2); ``b_subq``
    exposes (id_b, blat1, blon1, blat2, blon2)."""
    lat_bits, lon_bits = C.cell_bits(precision)

    def rng(sub, lat1, lon1, lat2, lon2, tag):
        ia1 = C.cell_index_sql(lat1, -90.0, 180.0, lat_bits)
        ia2 = C.cell_index_sql(lat2, -90.0, 180.0, lat_bits)
        io1 = C.cell_index_sql(lon1, -180.0, 360.0, lon_bits)
        io2 = C.cell_index_sql(lon2, -180.0, 360.0, lon_bits)
        return (
            f"{tag} AS (SELECT * FROM (SELECT *, least({ia1}, {ia2}) "
            f"AS la, greatest({ia1}, {ia2}) AS ha, "
            f"least({io1}, {io2}) AS lo, greatest({io1}, {io2}) AS ho "
            f"FROM {sub}) "
            f"WHERE (ha - la + 1) * (ho - lo + 1) <= {max_cells})"
        )

    cross = lines_cross_sql(
        "a.alat1", "a.alon1", "a.alat2", "a.alon2",
        "b.blat1", "b.blon1", "b.blat2", "b.blon2",
    )
    return (
        "WITH "
        + rng(a_subq, "alat1", "alon1", "alat2", "alon2", "sa")
        + ", "
        + rng(b_subq, "blat1", "blon1", "blat2", "blon2", "sb")
        + " SELECT DISTINCT a.id_a, b.id_b FROM sa a JOIN sb b "
        "ON a.la <= b.ha AND b.la <= a.ha "
        "AND a.lo <= b.ho AND b.lo <= a.ho "
        f"WHERE {cross}"
    )
