"""Getis-Ord Gi* hot-spot statistics over WebMercator tile bins.

The reference stops at heat-map COUNTS per cell (the tile/geohash/S2/
hex heatmap pyramid family); this adds the standard next analytics
step — a z-score per cell telling whether its count is significantly
hot or cold relative to the study area (Getis & Ord 1992, "The Analysis
of Spatial Association by Use of Distance Statistics"), with binary
8-neighborhood-plus-self weights on the tile lattice.

Scale design: points aggregate to occupied cells (map-side combinable
count), each occupied cell explodes to its 9 neighbor addresses
(bounded 9x blowup of the CELL relation, not the point relation), and
one equi-join + re-aggregation produces neighbor sums.  The global
mean/std come from a scalar aggregate collected to the driver (3
numbers — the house pattern for plan-time scalars, same as IVF's
training stats; a broadcast-join form would plan a
BroadcastNestedLoopJoin for a 1-row relation for no benefit).

Study-area convention: n is the number of OCCUPIED cells and neighbor
sums only see occupied neighbors — empty lattice cells are not imputed
as zero observations.  This is the convention that stays meaningful at
100 TB (the full z-lattice at zoom 16 has 4.3e9 addresses, almost all
structurally empty ocean/void; imputing them would swamp the statistic)
— callers wanting a bounded dense lattice can pre-generate it and union
zero counts in.

Float determinism: counts and neighbor sums are BIGINTs; mean/std/z use
only IEEE-correctly-rounded ops (+ - * / sqrt) in a pinned order, so
the DuckDB oracle twin reproduces z bit-for-bit before rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C

__all__ = ["getis_ord_gi", "getis_ord_gi_oracle_sql"]

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def getis_ord_gi(
    points: DataFrame,
    zoom: int = 8,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-tile Gi* z-score of point counts at ``zoom``.

    Returns (tx, ty, cnt, w_n, g_sum, gi_r3): the cell, its count, the
    number of occupied cells in its 3x3 neighborhood (self included),
    their summed counts, and the Gi* z-score rounded to 3 decimals —
    NULL when it is undefined (fewer than 2 occupied cells, zero count
    variance, or the neighborhood covering the whole study area).
    Neighbor x-addresses wrap modulo 2^zoom (antimeridian adjacency);
    y runs off the pole edges and simply finds no occupied cell."""
    n_tiles = 1 << zoom
    x, y = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    cells = (
        points.groupBy(x.alias("tx"), y.alias("ty"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the expensive points scan runs ONCE: the stats job below and
        # the cells/spread self-join both read the checkpointed cell
        # relation (tiny: occupied cells only) instead of re-aggregating
        # the full point relation per consumer
        .localCheckpoint()
    )
    # plan-time scalars (3 numbers): occupied-cell count, sum, sum sq
    stats = cells.agg(
        F.count(F.lit(1)),
        F.sum("cnt"),
        F.sum(F.col("cnt") * F.col("cnt")),
    ).first()
    n, s1, s2 = int(stats[0]), int(stats[1] or 0), int(stats[2] or 0)
    # pinned float op order — mirrored literally by the oracle twin
    xbar = s1 / n if n else 0.0
    var = s2 / n - xbar * xbar if n else 0.0
    # math.sqrt, not **0.5: pow(x, 0.5) is not IEEE-pinned to sqrt(x),
    # and the oracle twin uses SQL sqrt()
    sdev = math.sqrt(var) if var > 0 else 0.0

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS
        ]
    )
    spread = (
        cells.withColumn("_o", F.explode(offs))
        .select(
            F.pmod(F.col("tx") + F.col("_o.dx"), F.lit(n_tiles)).alias("nx"),
            (F.col("ty") + F.col("_o.dy")).alias("ny"),
            F.col("cnt").alias("src_cnt"),
        )
        .groupBy("nx", "ny")
        .agg(
            F.count(F.lit(1)).alias("w_n"),
            F.sum("src_cnt").alias("g_sum"),
        )
    )
    joined = cells.join(
        spread,
        (F.col("tx") == F.col("nx")) & (F.col("ty") == F.col("ny")),
    )
    w = F.col("w_n").cast("double")
    g = F.col("g_sum").cast("double")
    n_d = F.lit(float(n))
    num = g - F.lit(xbar) * w
    den = F.lit(sdev) * F.sqrt(
        (n_d * w - w * w) / F.lit(float(n - 1) if n > 1 else 1.0)
    )
    z = F.when(F.lit(n > 1) & F.lit(sdev > 0) & (den > 0), num / den)
    return joined.select(
        "tx", "ty", "cnt", "w_n", "g_sum", F.round(z, 3).alias("gi_r3")
    )


def getis_ord_gi_oracle_sql(
    subq: str, zoom: int = 8, lat: str = "lat", lon: str = "lon"
) -> str:
    """DuckDB twin: same occupied-cell lattice, same 9-address spread,
    same pinned scalar op order (stats computed in a CTE — DuckDB's
    + - * / sqrt are IEEE-correctly-rounded like Python's, so the
    pre-round z doubles are identical)."""
    n_tiles = 1 << zoom
    tx, ty = C.tile_xy_sql(lat, lon, zoom)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFSETS)
    return (
        f"WITH cells AS (SELECT {tx} AS tx, {ty} AS ty, "
        f"count(*) AS cnt FROM {subq} GROUP BY 1, 2), "
        "stats AS (SELECT count(*) AS n, "
        "CAST(sum(cnt) AS DOUBLE) / count(*) AS xbar, "
        "sqrt(CAST(sum(cnt * cnt) AS DOUBLE) / count(*) - "
        "(CAST(sum(cnt) AS DOUBLE) / count(*)) * "
        "(CAST(sum(cnt) AS DOUBLE) / count(*))) AS sdev FROM cells), "
        f"offsets(dx, dy) AS (VALUES {offs}), "
        "spread AS (SELECT "
        f"((tx + dx) % {n_tiles} + {n_tiles}) % {n_tiles} AS nx, "
        "ty + dy AS ny, count(*) AS w_n, sum(cnt) AS g_sum "
        "FROM cells CROSS JOIN offsets GROUP BY 1, 2) "
        "SELECT tx, ty, cnt, w_n, g_sum, "
        "round(CASE WHEN n > 1 AND sdev > 0 AND "
        "(sdev * sqrt((CAST(n AS DOUBLE) * CAST(w_n AS DOUBLE) - "
        "CAST(w_n AS DOUBLE) * CAST(w_n AS DOUBLE)) / "
        "CAST(n - 1 AS DOUBLE))) > 0 THEN "
        "(CAST(g_sum AS DOUBLE) - xbar * CAST(w_n AS DOUBLE)) / "
        "(sdev * sqrt((CAST(n AS DOUBLE) * CAST(w_n AS DOUBLE) - "
        "CAST(w_n AS DOUBLE) * CAST(w_n AS DOUBLE)) / "
        "CAST(n - 1 AS DOUBLE))) END, 3) AS gi_r3 "
        "FROM cells JOIN spread ON tx = nx AND ty = ny CROSS JOIN stats"
    )
