"""Contract queries: road-network routing (SSSP/isochrone/catchment), mobility features, and the spatial-statistics canon (Moran/LISA/Geary/Gi*/Knox/KDE/variogram and friends).

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .trajectory import (  # noqa: F401
    _METRO_SUBQ,
    _TRAJ_SUBQ,
    _metro_points,
    _traj_points,
)

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
    from ..operators.routing import sssp

    return sssp(
        _road_graph_edges(spark),
        spark.range(1).select(F.lit(0).cast("int").alias("node")),
    )


def _sssp_oracle() -> str:
    from ..operators.routing import sssp_oracle_sql

    return sssp_oracle_sql(
        _road_graph_edges_sql(),
        "(SELECT CAST(0 AS INT) AS node)",
        rounds=_SSSP_ROUNDS,
    )


def q_isochrone(spark, sf_dir):
    """Isochrone band rollup composed over the SSSP fixed point:
    reachable nodes bucket into 20 km travel-cost bands (exact BIGINT
    `div`), keeping bands < 8 — reach count + min/max cost per band."""
    from ..operators.routing import sssp

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
    from ..operators.routing import isochrone_oracle_sql

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
    from ..operators.routing import nearest_facility

    return nearest_facility(
        _road_graph_edges(spark),
        spark.createDataFrame(
            [(n,) for n in _FACILITY_NODES], "node int"
        ),
    )


def _nearest_facility_oracle() -> str:
    from ..operators.routing import nearest_facility_oracle_sql

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
    from ..operators.trajectory import mobility_metrics

    return mobility_metrics(_traj_points(spark, sf_dir), zoom=14)


def _mobility_oracle() -> str:
    from ..operators.trajectory import mobility_metrics_oracle_sql

    return mobility_metrics_oracle_sql(_TRAJ_SUBQ, zoom=14)


def q_heading_stats(spark, sf_dir):
    """Per-trip circular heading statistics (operators/trajectory.py
    heading_stats — Mardia & Jupp directional stats): mean direction,
    resultant length R, circular variance over leg bearings; ppb-
    quantized cos/sin sums so every distributed aggregate is exact."""
    from ..operators.trajectory import heading_stats

    return heading_stats(_traj_points(spark, sf_dir), gap_s=43200)


def _heading_stats_oracle() -> str:
    from ..operators.trajectory import heading_stats_oracle_sql

    return heading_stats_oracle_sql(_TRAJ_SUBQ, gap_s=43200)


def q_cell_transitions(spark, sf_dir):
    """First-order Markov mobility matrix (operators/trajectory.py
    cell_transitions — Gambs 2012 / Song 2010): consecutive distinct
    z12-cell visit pairs within each trip, with exact counts and
    single-IEEE-division transition probabilities."""
    from ..operators.trajectory import cell_transitions

    return cell_transitions(
        _traj_points(spark, sf_dir), zoom=12, gap_s=43200
    )


def _cell_transitions_oracle() -> str:
    from ..operators.trajectory import cell_transitions_oracle_sql

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
    from ..operators.hotspot import mann_kendall_trend

    return mann_kendall_trend(
        _traj_points(spark, sf_dir),
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


def _mann_kendall_oracle() -> str:
    from ..operators.hotspot import mann_kendall_trend_oracle_sql

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
    from ..operators.hotspot import quadrat_dispersion

    return quadrat_dispersion(_traj_points(spark, sf_dir), zoom=6)


def _quadrat_oracle() -> str:
    from ..operators.hotspot import quadrat_dispersion_oracle_sql

    return quadrat_dispersion_oracle_sql(_TRAJ_SUBQ, zoom=6)


def q_sde(spark, sf_dir):
    """Per-user standard deviational ellipse (operators/trajectory.py
    deviational_ellipse — Lefever 1926 / Yuill 1971 directional
    distribution): covariance eigen-decomposition in closed form, one
    pinned atan2, exact microdeg moment sums off the integer anchor."""
    from ..operators.trajectory import deviational_ellipse

    return deviational_ellipse(_traj_points(spark, sf_dir))


def _sde_oracle() -> str:
    from ..operators.trajectory import deviational_ellipse_oracle_sql

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
    from ..operators.hotspot import bivariate_morans_i

    return bivariate_morans_i(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _bimoran_oracle() -> str:
    from ..operators.hotspot import bivariate_morans_i_oracle_sql

    return bivariate_morans_i_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_clq(spark, sf_dir):
    """Nearest-neighbor colocation quotient (operators/density.py
    colocation_quotient — Leslie & Kronenfeld 2011) between moving
    and parked fixes over the metro stream: rep-granular NN with the
    (d_mm, rep id) total order (coincident piles see distance-0
    siblings), truncated at r_max=500 m, four pinned CLQ chains."""
    from ..operators.density import colocation_quotient

    return colocation_quotient(
        _metro_points(spark, sf_dir),
        _moving_flag(),
        r_max_m=500.0,
        max_abs_lat=54.0,
    )


def _clq_oracle() -> str:
    from ..operators.density import colocation_quotient_oracle_sql

    return colocation_quotient_oracle_sql(
        _METRO_SUBQ, _MOVING_FLAG_SQL, r_max_m=500.0, max_abs_lat=54.0
    )


def q_median_center(spark, sf_dir):
    """Weiszfeld median center (operators/hotspot.py median_center —
    the center of minimum travel distance) of the metro fix stream:
    fixed 10-round iteration on integer microdegree coordinates,
    exact 1e9 // d weights with DECIMAL/HUGEINT sums, floor-division
    center updates mirrored by the unrolled twin."""
    from ..operators.hotspot import median_center

    return median_center(_metro_points(spark, sf_dir), iters=10)


def _median_center_oracle() -> str:
    from ..operators.hotspot import median_center_oracle_sql

    return median_center_oracle_sql(_METRO_SUBQ, iters=10)


def q_segregation(spark, sf_dir):
    """Two-group spatial segregation indices (operators/hotspot.py
    segregation_indices — Duncan & Duncan 1955 dissimilarity, Massey
    & Denton exposure/isolation) between moving and parked fixes over
    z8 cells: exact integer |a_i*B - b_i*A| evenness numerator, ppm
    integer-division shares, three pinned final chains."""
    from ..operators.hotspot import segregation_indices

    return segregation_indices(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _segregation_oracle() -> str:
    from ..operators.hotspot import segregation_indices_oracle_sql

    return segregation_indices_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_lq(spark, sf_dir):
    """Per-cell location quotient (operators/hotspot.py
    location_quotient — Haig 1926) of moving-fix share vs the global
    share: ratio-of-ratios form so no integer product can overflow."""
    from ..operators.hotspot import location_quotient

    return location_quotient(
        _traj_points(spark, sf_dir), _moving_flag(), zoom=8
    )


def _lq_oracle() -> str:
    from ..operators.hotspot import location_quotient_oracle_sql

    return location_quotient_oracle_sql(
        _TRAJ_SUBQ, _MOVING_FLAG_SQL, zoom=8
    )


def q_gini(spark, sf_dir):
    """Spatial Gini of fix counts over occupied z8 cells
    (operators/hotspot.py spatial_gini): exact-integer grouped-
    histogram numerator, one pinned final division."""
    from ..operators.hotspot import spatial_gini

    return spatial_gini(_traj_points(spark, sf_dir), zoom=8)


def _gini_oracle() -> str:
    from ..operators.hotspot import spatial_gini_oracle_sql

    return spatial_gini_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_stkde(spark, sf_dir):
    """Space-time kernel density over the (z8 cell, daily bucket)
    cube (operators/density.py stkde_cube — Nakaya & Yano 2010): the
    temporal extension of the KDE stencil; occupied-bin collapse,
    bounded separable space x time integer stencil (ppb literals
    shared by both engines), exact BIGINT mass sums."""
    from ..operators.density import stkde_cube

    return stkde_cube(_traj_points(spark, sf_dir), zoom=8, bucket_s=86400)


def _stkde_oracle() -> str:
    from ..operators.density import stkde_cube_oracle_sql

    return stkde_cube_oracle_sql(_TRAJ_SUBQ, zoom=8, bucket_s=86400)


def q_focal_stats(spark, sf_dir):
    """Focal 3x3 neighborhood statistics of z8 cell counts
    (operators/density.py focal_stats — Tomlin map algebra): the
    order-statistics companion to the KDE stencil sum; occupied-cell
    collapse, 9-address spread, exact BIGINT min/max/sum + one pinned
    mean division."""
    from ..operators.density import focal_stats

    return focal_stats(_traj_points(spark, sf_dir), zoom=8)


def _focal_stats_oracle() -> str:
    from ..operators.density import focal_stats_oracle_sql

    return focal_stats_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_ht_breaks(spark, sf_dir):
    """Head/tail-breaks classification of z8 cell counts
    (operators/hotspot.py head_tail_breaks — Jiang 2013): mean-split
    recursion on the head while it stays a minority; thresholds are
    exact (S, N) rationals compared by integer cross-products, twin
    unrolls the same fixed depth."""
    from ..operators.hotspot import head_tail_breaks

    return head_tail_breaks(_traj_points(spark, sf_dir), zoom=8)


def _ht_breaks_oracle() -> str:
    from ..operators.hotspot import head_tail_breaks_oracle_sql

    return head_tail_breaks_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_trend_surface(spark, sf_dir):
    """First-order least-squares trend surface (operators/
    interpolate.py trend_surface — Unwin 1975) of a deterministic
    integer reading with a real latitude gradient over the metro fix
    stream: exact BIGINT moment sums in one pass, pinned Cramer solve
    + algebraic R^2 driver-side."""
    from ..operators.interpolate import trend_surface

    pts = _metro_points(spark, sf_dir).withColumn(
        "reading",
        F.floor((F.col("lat") - F.lit(52.0)) * 50) + F.col("event_id") % 7,
    )
    return trend_surface(
        pts, value_col="reading", ref_lat=52.5, ref_lon=14.0
    )


def _trend_surface_oracle() -> str:
    from ..operators.interpolate import trend_surface_oracle_sql

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
    from ..operators.hotspot import spatial_entropy

    return spatial_entropy(_traj_points(spark, sf_dir), zoom=8)


def _entropy_oracle() -> str:
    from ..operators.hotspot import spatial_entropy_oracle_sql

    return spatial_entropy_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_general_g(spark, sf_dir):
    """Getis-Ord General G high/low clustering (operators/hotspot.py
    general_g — Getis & Ord 1992, randomization z validated by 200k-
    permutation Monte-Carlo) over z8 tile bins."""
    from ..operators.hotspot import general_g

    return general_g(_traj_points(spark, sf_dir), zoom=8)


def _general_g_oracle() -> str:
    from ..operators.hotspot import general_g_oracle_sql

    return general_g_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_knox(spark, sf_dir):
    """Knox space-time interaction test (operators/colocation.py
    knox_test — Knox 1964, Poisson z per David & Barton 1966) at
    delta 1 km / tau 6 h over the fix stream: exact pair counts from
    the composite-bucket forward joins + the distinct-timestamp
    histogram range window."""
    from ..operators.colocation import knox_test

    return knox_test(
        _traj_points(spark, sf_dir), delta_m=1000.0, tau_s=21600
    )


def _knox_oracle() -> str:
    from ..operators.colocation import knox_test_oracle_sql

    return knox_test_oracle_sql(
        _TRAJ_SUBQ, delta_m=1000.0, tau_s=21600
    )


def q_gearys_c(spark, sf_dir):
    """Global Geary's C autocorrelation (operators/hotspot.py
    gearys_c — Geary 1954, z under normality per Cliff & Ord 1981)
    over z8 tile bins: pairwise-contrast companion to morans_i, all
    distributed aggregates exact BIGINTs, pinned scalar combine."""
    from ..operators.hotspot import gearys_c

    return gearys_c(_traj_points(spark, sf_dir), zoom=8)


def _gearys_c_oracle() -> str:
    from ..operators.hotspot import gearys_c_oracle_sql

    return gearys_c_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_join_counts(spark, sf_dir):
    """Black-white join-count statistics (operators/hotspot.py
    join_counts — Moran 1948, free-sampling moments per Cliff & Ord
    1981 / Sokal & Oden 1978) over z8 tile bins: exact-integer
    above-mean marks, BB/WW/BW joins, z tests for both BB and BW."""
    from ..operators.hotspot import join_counts

    return join_counts(_traj_points(spark, sf_dir), zoom=8)


def _join_counts_oracle() -> str:
    from ..operators.hotspot import join_counts_oracle_sql

    return join_counts_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_lisa(spark, sf_dir):
    """Local Moran's I / LISA (operators/hotspot.py local_morans_i —
    Anselin 1995): per-z8-cell local autocorrelation of fix counts
    with HH/LL/HL/LH quadrant labels, exact-BIGINT moment sums +
    pinned per-row IEEE combine, 8-address cell-relation spread."""
    from ..operators.hotspot import local_morans_i

    return local_morans_i(_traj_points(spark, sf_dir), zoom=8)


def _lisa_oracle() -> str:
    from ..operators.hotspot import local_morans_i_oracle_sql

    return local_morans_i_oracle_sql(_TRAJ_SUBQ, zoom=8)


def q_emerging_hotspots(spark, sf_dir):
    """Emerging-hot-spot analysis (operators/hotspot.py
    emerging_hotspots — Getis-Ord Gi* per space-time-cube bin, then
    Mann-Kendall trend over each cell's Gi* z series): classifies
    every occupied z6 cell as intensifying / diminishing / persistent
    hot or cold over twelve 6-hour buckets."""
    from ..operators.hotspot import emerging_hotspots

    return emerging_hotspots(
        _traj_points(spark, sf_dir),
        t0=_MK_T0,
        bucket_s=_MK_BUCKET_S,
        n_buckets=_MK_BUCKETS,
        zoom=6,
    )


def _emerging_hotspots_oracle() -> str:
    from ..operators.hotspot import emerging_hotspots_oracle_sql

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
