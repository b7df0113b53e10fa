"""Contract queries: graph analytics (triangles/k-core/MST/centralities/PageRank/HITS/PPR) and map-matching queries.

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .stats import (  # noqa: F401
    _FACILITY_NODES,
    _SSSP_ROUNDS,
    _road_graph_edges,
    _road_graph_edges_sql,
)
from .trajectory import (  # noqa: F401
    _METRO_SUBQ,
    _N_ROAD_SEGS,
    _ROADS_SUBQ,
    _metro_points,
    _road_segments,
)

_PAGERANK_ROUNDS = 12


def _braced_road_edges(spark: SparkSession) -> DataFrame:
    """The 20x20 lattice plus one diagonal brace (n, n+21) per grid
    cell — diagonal avenues through each block.  The pure lattice is
    bipartite (triangle-free), so the braces are what give the
    triangle/clustering fixture its known structure: every brace
    closes exactly 2 triangles with its cell's corner, 361 cells ->
    722 triangles, hand-checkable."""
    und = _road_graph_edges(spark).select("src", "dst")
    c = F.col("id").cast("int")
    diag = spark.range(361).select(
        (F.floor(c / F.lit(19.0)).cast("int") * 20 + (c % 19).cast("int"))
        .alias("src"),
    ).select(
        "src", (F.col("src") + 21).alias("dst")
    )
    return und.union(diag)


_BRACED_SUBQ = (
    "(SELECT src, dst FROM " + "{road}"
    " UNION ALL SELECT CAST(floor(c / 19.0) AS INT) * 20 "
    "+ CAST(c % 19 AS INT) AS src, "
    "CAST(floor(c / 19.0) AS INT) * 20 + CAST(c % 19 AS INT) + 21 AS dst "
    "FROM range(361) t(c))"
)


def q_triangles(spark, sf_dir):
    """Exact triangle count + transitivity (operators/graph.py
    triangle_stats — Suri & Vassilvitskii 2011 degree-oriented wedge
    join, Newman 2003 clustering coefficient) over the braced road
    lattice: 722 triangles by construction."""
    from ..operators.graph import triangle_stats

    return triangle_stats(_braced_road_edges(spark))


def _triangles_oracle() -> str:
    from ..operators.graph import triangle_stats_oracle_sql

    return triangle_stats_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql())
    )


def q_assortativity(spark, sf_dir):
    """Degree assortativity (operators/graph.py degree_assortativity
    — Newman 2002 eq. 4) of the braced road lattice: exact BIGINT
    edge-end sums, pinned Pearson combine."""
    from ..operators.graph import degree_assortativity

    return degree_assortativity(_braced_road_edges(spark))


def _assortativity_oracle() -> str:
    from ..operators.graph import degree_assortativity_oracle_sql

    return degree_assortativity_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql())
    )


# Huff facilities: the four lattice-corner facility nodes with
# deterministic attractiveness 1.0 + (node % 3) * 0.5 — two ties in
# weight, distinct positions, so both the gravity pull and the
# strict-> argmax tie rule are exercised.
_HUFF_FACILITIES = [
    (n, 52.0 + (n // 20) * 0.05, 13.0 + (n % 20) * 0.05,
     1.0 + (n % 3) * 0.5)
    for n in _FACILITY_NODES
]


def q_huff(spark, sf_dir):
    """Huff gravity catchment probabilities (operators/routing.py
    huff_catchment — Huff 1963, λ=2) over z12 metro demand cells vs
    the four corner facilities: integer-µdeg cell centroids,
    meter-quantized distances, pinned unrolled score sum + argmax."""
    from ..operators.routing import huff_catchment

    return huff_catchment(
        _metro_points(spark, sf_dir), _HUFF_FACILITIES, zoom=12
    )


def _huff_oracle() -> str:
    from ..operators.routing import huff_catchment_oracle_sql

    return huff_catchment_oracle_sql(
        _METRO_SUBQ, _HUFF_FACILITIES, zoom=12
    )


def q_kcore(spark, sf_dir):
    """3-core of the braced road lattice (operators/graph.py k_core —
    Seidman 1983; synchronous distributed peeling, Batagelj &
    Zaveršnik 2003): the two brace-less lattice corners peel, the
    remaining 398 nodes hold within-core degree >= 3."""
    from ..operators.graph import k_core

    return k_core(_braced_road_edges(spark), k=3)


def _kcore_oracle() -> str:
    from ..operators.graph import k_core_oracle_sql

    # peeling depth of the fixture is 2 rounds (measured); 6 is the
    # _SSSP_ROUNDS-style margin — exact whenever rounds >= depth
    return k_core_oracle_sql(
        _BRACED_SUBQ.format(road=_road_graph_edges_sql()),
        k=3,
        twin_rounds=6,
    )


def q_mst(spark, sf_dir):
    """Minimum spanning forest of the congestion-weighted road lattice
    by distributed Boruvka (operators/graph.py boruvka_mst): per-round
    component-min outgoing edge under the (w, a, b) total order,
    merges via the alternating-star connected-components loop.
    Nested iteration is not SQL-expressible -> rows-only driver check;
    Kruskal-parity pytests pin the exact edge set."""
    from ..operators.graph import boruvka_mst

    return boruvka_mst(_road_graph_edges(spark))


def q_closeness(spark, sf_dir):
    """Landmark harmonic closeness centrality (operators/routing.py
    harmonic_closeness — Marchiori & Latora 2000, Eppstein & Wang 2004
    sampling) from the four corner facilities over the road lattice:
    ONE product-graph sssp sweep relaxes all four landmark replicas
    together, reciprocals quantize as exact 1e12 // dist_mm integer
    divisions, order-free BIGINT centrality sums."""
    from ..operators.routing import harmonic_closeness

    return harmonic_closeness(
        _road_graph_edges(spark),
        spark.createDataFrame([(n,) for n in _FACILITY_NODES], "node int"),
    )


def _closeness_oracle() -> str:
    from ..operators.routing import harmonic_closeness_oracle_sql

    return harmonic_closeness_oracle_sql(
        _road_graph_edges_sql(),
        list(_FACILITY_NODES),
        rounds=_SSSP_ROUNDS,
    )


def q_betweenness(spark, sf_dir):
    """K-source Brandes betweenness centrality (operators/routing.py
    betweenness — Brandes 2001, source-sampled per Brandes & Pich
    2007) from the four corner facilities over the road lattice: one
    product-graph sssp sweep, exact BIGINT shortest-path counts over
    the SP-DAG, and the ppm-quantized integer dependency accumulation
    — bit-identical to the fully unrolled DuckDB twin."""
    from ..operators.routing import betweenness

    return betweenness(
        _road_graph_edges(spark),
        spark.createDataFrame([(n,) for n in _FACILITY_NODES], "node int"),
        rounds=_BETWEENNESS_ROUNDS,
    )


_BETWEENNESS_ROUNDS = 48


def _betweenness_oracle() -> str:
    from ..operators.routing import betweenness_oracle_sql

    return betweenness_oracle_sql(
        _road_graph_edges_sql(),
        list(_FACILITY_NODES),
        sssp_rounds=_SSSP_ROUNDS,
        rounds=_BETWEENNESS_ROUNDS,
    )


def q_pagerank(spark, sf_dir):
    """Exact fixed-point PageRank (operators/pagerank.py) over the
    congestion-weighted lattice road graph: intersection centrality
    after exactly 12 rounds, classic uniform out-degree split, ranks
    as BIGINTs in 1e-12 units of total mass so every round is pure
    integer multiply / floor-div / sum — bit-identical to the
    unrolled DuckDB twin (Page et al. 1999; Jiang 2009 for street
    networks)."""
    from ..operators.pagerank import pagerank

    return pagerank(_road_graph_edges(spark), rounds=_PAGERANK_ROUNDS)


def _pagerank_oracle() -> str:
    from ..operators.pagerank import pagerank_oracle_sql

    return pagerank_oracle_sql(
        _road_graph_edges_sql(), rounds=_PAGERANK_ROUNDS
    )


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (operators/pagerank.py hits — Kleinberg
    1999) after 8 rounds over a one-way-street subset of the road
    lattice (dropping (src*13+dst)%3==0 arcs makes the graph
    genuinely asymmetric, so hub != authority): L1-normalized scores
    as BIGINTs in 1e-9 units, every round pure integer multiply /
    floor-div / sum — bit-identical to the unrolled DuckDB twin."""
    from ..operators.pagerank import hits

    e = _road_graph_edges(spark).where(
        (F.col("src") * 13 + F.col("dst")) % 3 != 0
    )
    return hits(e, rounds=_HITS_ROUNDS)


_HITS_ROUNDS = 8


def _hits_oracle() -> str:
    from ..operators.pagerank import hits_oracle_sql

    e_sql = (
        f"(SELECT src, dst FROM {_road_graph_edges_sql()} "
        "WHERE (src * 13 + dst) % 3 <> 0)"
    )
    return hits_oracle_sql(e_sql, rounds=_HITS_ROUNDS)


def q_ppr(spark, sf_dir):
    """Personalized PageRank (operators/pagerank.py pagerank with
    seeds — Jeh & Widom 2003 random walk with restart) from the four
    corner facilities: seed-relative network proximity scores, same
    exact fixed-point integer arithmetic with the teleport terms
    concentrated on the seed set."""
    from ..operators.pagerank import pagerank

    return pagerank(
        _road_graph_edges(spark),
        rounds=_PAGERANK_ROUNDS,
        seeds=spark.createDataFrame(
            [(n,) for n in _FACILITY_NODES], "node int"
        ),
    )


def _ppr_oracle() -> str:
    from ..operators.pagerank import pagerank_oracle_sql

    vals = ", ".join(f"({n})" for n in _FACILITY_NODES)
    return pagerank_oracle_sql(
        _road_graph_edges_sql(),
        rounds=_PAGERANK_ROUNDS,
        seeds_subq=f"(SELECT CAST(n AS INT) AS node FROM "
        f"(VALUES {vals}) t(n))",
    )


# Deterministic Manhattan street grid over the metro box for
# map-matching: 200 horizontal segments (10 rows x 20 blocks) + 200
# vertical (20 columns x 10 blocks), axis-aligned so the pairwise
# segment-distance kernel's exact branches fire.  Street offsets carry
# SIX decimals (0.050003) against the fixture's 1e-5-quantized point
# lattice, so no point can sit exactly midway between two parallel
# streets — the only distance ties left are shared-corner endpoint
# ties, which both engines compute as the identical haversine
# expression and break identically by seg_id.


def q_map_match(spark, sf_dir):
    """Map-matching join (operators/map_match.py): snap each metro fix
    to its nearest street segment within 150 m.  Segment covering is
    expanded 1 ring on the SMALL side and auto-broadcast, so each point
    joins on its single z17 tile address; per-point argmin is a
    map-side-partial min_by, not a window sort.  max_abs_lat=53.2
    matches the fixture band (z17, ~183 m ground cells)."""
    from ..operators.map_match import map_match

    out = map_match(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )
    return out.select(
        "event_id",
        "user_id",
        "seg_id",
        F.round(F.col("dist_m"), 2).alias("dist_r2"),
    )


def q_segment_speeds(spark, sf_dir):
    """Composed per-segment speed profile (operators/map_match.py):
    session-window legs (mm + integer seconds) ride map_match's
    carry_cols through the covering probe, then one per-segment
    integer-sum aggregate — the big relation is exchanged once."""
    from ..operators.map_match import segment_speeds

    return segment_speeds(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )


def _segment_speeds_oracle() -> str:
    from ..operators.map_match import segment_speeds_oracle_sql

    return segment_speeds_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )


def q_segment_v85(spark, sf_dir):
    """Per-segment exact speed percentiles (operators/map_match.py
    segment_speed_percentiles): median / v85 (the FHWA speed-zoning
    statistic) / max leg speed as exact nearest-rank order statistics
    — no percentile_approx; one seg_id window whose exchange the final
    aggregate reuses."""
    from ..operators.map_match import segment_speed_percentiles

    return segment_speed_percentiles(
        _metro_points(spark, sf_dir),
        _road_segments(spark),
        max_dist_m=150.0,
        max_abs_lat=53.2,
    )


def _segment_v85_oracle() -> str:
    from ..operators.map_match import segment_speed_percentiles_oracle_sql

    return segment_speed_percentiles_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )


def _map_match_oracle() -> str:
    from ..operators.map_match import map_match_oracle_sql

    inner = map_match_oracle_sql(
        _METRO_SUBQ, _ROADS_SUBQ, max_dist_m=150.0
    )
    return (
        "SELECT event_id, user_id, seg_id, round(dist_m, 2) AS dist_r2 "
        f"FROM ({inner})"
    )
