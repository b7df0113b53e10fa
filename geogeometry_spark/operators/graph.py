"""Whole-graph structure statistics over road / contact networks:
exact triangle counting with the global clustering coefficient
(transitivity), and degree assortativity.

The reference has no graph layer at all; this extends the engine's
graph family (sssp / isochrone / nearest_facility / pagerank /
connected components) with the standard structural descriptors used on
street and contact networks (Jiang & Claramunt 2004; Porta et al. 2006
for street-network structure analysis).

Scale design — triangle counting is the canonical "curse of the last
reducer" workload (Suri & Vassilvitskii 2011, WWW): a naive wedge join
blows up quadratically on hub nodes.  The fix implemented here is the
published one — orient every undirected edge from the smaller to the
larger endpoint under the total order (degree, node); every triangle
then has exactly one source node (its smallest member under ≺) and is
counted exactly once, and the oriented out-degree is O(√m), bounding
the wedge relation by O(m^1.5) with NO hub blowup.  Everything is two
equi-joins and map-side-combinable BIGINT aggregates; the only floats
are the final one-row statistic divisions, in a pinned IEEE order the
DuckDB twins mirror literally.

Degree assortativity (Newman 2002, "Assortative mixing in networks",
eq. 4) is one pass over the edge relation once degrees are attached:
every sum (Σjk, Σ(j+k), Σ(j²+k²)) is an exact BIGINT over directed
edge-ends, so the Pearson coefficient is a pure function of five exact
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "triangle_stats",
    "triangle_stats_oracle_sql",
    "degree_assortativity",
    "degree_assortativity_oracle_sql",
    "k_core",
    "k_core_oracle_sql",
    "boruvka_mst",
]


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple edges (a < b), self-loops dropped, both from
    directed-symmetric and already-undirected inputs."""
    a = F.least(F.col("src"), F.col("dst")).alias("a")
    b = F.greatest(F.col("src"), F.col("dst")).alias("b")
    return (
        edges.select(a, b).where(F.col("a") != F.col("b")).distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient
    (transitivity, Newman 2003 eq. 3.3: C = 3·triangles / wedges) of
    the undirected simplification of ``edges (src, dst)``.

    Degree-oriented node-iterator (Suri & Vassilvitskii 2011): edges
    orient low→high under (deg, node); wedges are the self-join of the
    oriented adjacency on its source with the (deg, node) order on the
    two targets; the closing edge is one more equi-join.  Returns one
    row: (n_nodes, m_edges, wedges, triangles, transitivity_r6) —
    wedges = Σ deg(deg−1)/2 exact; transitivity NULL when the graph
    has no wedge."""
    und = _canonical_edges(edges).localCheckpoint()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_nodes = deg.count()
    m_edges = und.count()
    wrow = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1))
    ).first()
    wedges = int(wrow[0] or 0) // 2

    da = deg.select(
        F.col("node").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("deg").alias("deg_b")
    )
    with_deg = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("deg_b"))
        .otherwise(F.col("deg_a"))
        .alias("deg_v"),
    ).localCheckpoint()
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("deg_v").alias("deg_x")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("deg_v").alias("deg_y")
    )
    # each triangle {a≺b≺c} appears once: u=a, (x,y)=(b,c) with b≺c
    wedge = o1.join(o2, "u").where(
        (F.col("deg_x") < F.col("deg_y"))
        | ((F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedge.join(closing, ["x", "y"], "left_semi")
    n_tri = tri.count()

    trans = None
    if wedges > 0:
        trans = (3.0 * n_tri) / wedges
    spark = edges.sparkSession
    return spark.range(1).select(
        F.lit(n_nodes).alias("n_nodes"),
        F.lit(m_edges).alias("m_edges"),
        F.lit(wedges).alias("wedges"),
        F.lit(n_tri).alias("triangles"),
        F.round(F.lit(trans).cast("double"), 6).alias("transitivity_r6"),
    )


def triangle_stats_oracle_sql(edges_subq: str) -> str:
    """DuckDB twin of :func:`triangle_stats`: identical
    canonicalization, (deg, node) orientation, wedge + closing-edge
    joins, and pinned final division."""
    return (
        f"WITH und AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM {edges_subq} "
        "WHERE src <> dst), "
        "deg AS (SELECT node, count(*) AS deg FROM "
        "(SELECT a AS node FROM und "
        "UNION ALL SELECT b AS node FROM und) GROUP BY node), "
        "gstats AS (SELECT count(*) AS n_nodes, "
        "coalesce(sum(deg * (deg - 1)), 0) // 2 AS wedges FROM deg), "
        "estats AS (SELECT count(*) AS m_edges FROM und), "
        "oriented AS (SELECT "
        "CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b) "
        "THEN u.a ELSE u.b END AS u, "
        "CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b) "
        "THEN u.b ELSE u.a END AS v, "
        "CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b) "
        "THEN db.deg ELSE da.deg END AS deg_v "
        "FROM und u JOIN deg da ON u.a = da.node "
        "JOIN deg db ON u.b = db.node), "
        "tri AS (SELECT count(*) AS n_tri FROM oriented o1 "
        "JOIN oriented o2 ON o1.u = o2.u AND "
        "(o1.deg_v < o2.deg_v OR (o1.deg_v = o2.deg_v AND o1.v < o2.v)) "
        "WHERE EXISTS (SELECT 1 FROM oriented c "
        "WHERE c.u = o1.v AND c.v = o2.v)) "
        "SELECT n_nodes, m_edges, wedges, n_tri AS triangles, "
        "CASE WHEN wedges > 0 THEN "
        "round((3.0 * n_tri) / wedges, 6) END AS transitivity_r6 "
        "FROM gstats CROSS JOIN estats CROSS JOIN tri"
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002 eq. 4) of the
    undirected simplification of ``edges (src, dst)``: the Pearson
    correlation of the degrees at the two ends of each edge — positive
    when hubs link to hubs (social nets), negative when hubs link to
    leaves (infrastructure; street grids sit near 0).

    Degrees attach by two equi-joins; the directed edge-end sums
    (M = 2m, Σjk, Σ(j+k), Σ(j²+k²)) are exact BIGINTs, and
    r = (Σjk/M − (Σ(j+k)/(2M))²) / (Σ(j²+k²)/(2M) − (Σ(j+k)/(2M))²)
    combines driver-side in a pinned IEEE order mirrored by the twin.
    Returns one row: (n_nodes, m_edges, assortativity_r6) — NULL for
    degree-regular graphs (zero variance)."""
    und = _canonical_edges(edges).localCheckpoint()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_nodes = deg.count()
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dj"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("dk"))
    j, k = F.col("dj"), F.col("dk")
    row = (
        und.join(da, "a")
        .join(db, "b")
        .agg(
            F.count(F.lit(1)),
            F.sum(j * k),
            F.sum(j + k),
            F.sum(j * j + k * k),
        )
        .first()
    )
    m = int(row[0])
    sjk, sj, sj2 = (int(row[i] or 0) for i in (1, 2, 3))
    # pinned scalar op order — the oracle twin mirrors it literally
    r = None
    if m > 0:
        big_m = 2.0 * m  # directed edge-end count
        mean = sj / big_m
        # float(sjk) FIRST (the twin's CAST-then-divide): exact-int
        # division would round once at the end and drift past 2^53
        num = float(sjk) / m - mean * mean
        den = sj2 / big_m - mean * mean
        if den > 0:
            r = num / den
    spark = edges.sparkSession
    return spark.range(1).select(
        F.lit(n_nodes).alias("n_nodes"),
        F.lit(m).alias("m_edges"),
        F.round(F.lit(r).cast("double"), 6).alias("assortativity_r6"),
    )


def degree_assortativity_oracle_sql(edges_subq: str) -> str:
    """DuckDB twin of :func:`degree_assortativity`."""
    return (
        f"WITH und AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM {edges_subq} "
        "WHERE src <> dst), "
        "deg AS (SELECT node, count(*) AS deg FROM "
        "(SELECT a AS node FROM und "
        "UNION ALL SELECT b AS node FROM und) GROUP BY node), "
        "nstats AS (SELECT count(*) AS n_nodes FROM deg), "
        "esums AS (SELECT count(*) AS m, "
        "coalesce(sum(da.deg * db.deg), 0) AS sjk, "
        "coalesce(sum(da.deg + db.deg), 0) AS sj, "
        "coalesce(sum(da.deg * da.deg + db.deg * db.deg), 0) AS sj2 "
        "FROM und u JOIN deg da ON u.a = da.node "
        "JOIN deg db ON u.b = db.node), "
        "scal AS (SELECT n_nodes, m, "
        "CAST(sj AS DOUBLE) / (2.0 * m) AS mean, "
        "CAST(sjk AS DOUBLE) / m AS jk_m, "
        "CAST(sj2 AS DOUBLE) / (2.0 * m) AS j2_m "
        "FROM nstats CROSS JOIN esums WHERE m > 0), "
        "res AS (SELECT n_nodes, m, jk_m - mean * mean AS num, "
        "j2_m - mean * mean AS den FROM scal) "
        "SELECT n_nodes, m AS m_edges, "
        "CASE WHEN den > 0 THEN round(num / den, 6) END "
        "AS assortativity_r6 FROM res"
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 64,
) -> DataFrame:
    """Nodes of the k-core (Seidman 1983, "Network structure and
    minimum degree"): the maximal subgraph in which every node keeps
    degree ≥ k — the standard cohesion filter before community/
    centrality work on road and contact networks (Batagelj & Zaveršnik
    2003 give the sequential peeling algorithm; this is its
    synchronous distributed form: each round deletes ALL nodes below
    degree k simultaneously, which converges to the same unique
    fixed point because the k-core is order-independent).

    Scale shape per round: degree = map-side-combinable count over the
    live-edge relation; the survivor set semi-joins back on BOTH
    endpoints (two equi-joins on the canonical undirected relation);
    ``localCheckpoint`` + ``Observation`` per round (the
    connected_components / sssp loop hygiene) — the driver holds one
    (removed-count,) scalar per round, and a round that removes zero
    nodes is the fixed point.  Round count is bounded by the peeling
    depth (≤ graph diameter for chain-degenerate graphs; a handful on
    braced road lattices).

    Returns (node, deg) for every k-core member with its WITHIN-CORE
    degree.  Raises RuntimeError if ``max_rounds`` is hit without
    convergence (never silently mislabels — the ADVICE r3
    connected-components rule)."""
    from pyspark.sql import Observation

    live = _canonical_edges(edges).localCheckpoint()
    for rnd in range(max_rounds):
        deg = (
            live.select(F.col("a").alias("node"))
            .union(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        obs = Observation()
        nxt = (
            live.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .observe(obs, F.count(F.lit(1)).alias("m"))
            .localCheckpoint()
        )
        m_next = obs.get["m"]
        m_prev = live.count()
        live.unpersist()
        live = nxt
        if m_next == m_prev:
            break
    else:
        raise RuntimeError(
            f"k_core did not converge within {max_rounds} rounds"
        )
    return (
        live.select(F.col("a").alias("node"))
        .union(live.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def k_core_oracle_sql(
    edges_subq: str, k: int = 3, twin_rounds: int = 8
) -> str:
    """Unrolled-round DuckDB twin of :func:`k_core` (the _SSSP_ROUNDS
    doctrine: exact whenever ``twin_rounds`` ≥ the peeling depth of
    the fixture — the Spark side iterates to its own fixed point and
    needs no bound).  Each MATERIALIZED round recomputes degrees over
    the surviving edge relation and keeps edges whose BOTH endpoints
    hold degree ≥ k."""
    sql = [
        f"WITH und0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) "
        f"AS a, greatest(src, dst) AS b FROM {edges_subq} "
        "WHERE src <> dst)"
    ]
    prev = "und0"
    for r in range(1, twin_rounds + 1):
        cur = f"und{r}"
        sql.append(
            f", {cur} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e "
            f"JOIN (SELECT node FROM (SELECT node, count(*) AS deg "
            f"FROM (SELECT a AS node FROM {prev} "
            f"UNION ALL SELECT b AS node FROM {prev}) GROUP BY node) "
            f"WHERE deg >= {k}) ka ON e.a = ka.node "
            f"JOIN (SELECT node FROM (SELECT node, count(*) AS deg "
            f"FROM (SELECT a AS node FROM {prev} "
            f"UNION ALL SELECT b AS node FROM {prev}) GROUP BY node) "
            f"WHERE deg >= {k}) kb ON e.b = kb.node)"
        )
        prev = cur
    sql.append(
        f" SELECT node, count(*) AS deg FROM "
        f"(SELECT a AS node FROM {prev} UNION ALL "
        f"SELECT b AS node FROM {prev}) GROUP BY node"
    )
    return "".join(sql)


def boruvka_mst(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w_mm",
    max_rounds: int = 40,
) -> DataFrame:
    """Minimum spanning forest by distributed Boruvka (Boruvka 1926;
    the MapReduce formulation of Lattanzi et al. 2011 "Filtering: a
    method for solving graph problems in MapReduce") — the backbone-
    extraction step a road/contact network pipeline wants next to
    connected components: the cheapest subnetwork keeping every
    component connected (network design, cluster backbones,
    single-linkage dendrogram levels).

    Edge weights get the TOTAL order (w, a, b) — ties broken by the
    canonical endpoint pair — so the forest is the UNIQUE MST under
    that order (identical to Kruskal with the same tie-break; how the
    pytests pin it).  Per round, every component selects its minimum
    outgoing edge under that order (the classic Boruvka step, here a
    map-side-combinable min-aggregate keyed by component), selected
    edges merge components through :func:`~.dedup.connected_components`
    (the alternating-star loop — itself O(log n) rounds on a relation
    that SHRINKS geometrically: one edge per component), and the
    component labeling localCheckpoints per round.  Boruvka halves the
    component count every round, so ``max_rounds`` of 40 covers any
    graph to 2^40 nodes.

    Not SQL-expressible (nested iteration: Boruvka rounds around a
    pointer-jumping loop), so the driver records a rows-only check;
    Kruskal-parity pytests pin the semantics.

    Returns the forest edge set (src, dst, w) with src < dst — n_nodes
    minus n_components rows."""
    a = F.least(F.col(src_col), F.col(dst_col)).alias("a")
    b = F.greatest(F.col(src_col), F.col(dst_col)).alias("b")
    e = (
        edges.select(a, b, F.col(w_col).cast("long").alias("w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    comp = (
        e.select(F.col("a").alias("node"))
        .union(e.select("b"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    from .dedup import connected_components

    picked = []
    merged_all = False
    for _ in range(int(max_rounds)):
        ca = comp.select(
            F.col("node").alias("a"), F.col("comp").alias("ca")
        )
        cb = comp.select(
            F.col("node").alias("b"), F.col("comp").alias("cb")
        )
        lab = (
            e.join(ca, "a")
            .join(cb, "b")
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint()
        )
        if lab.isEmpty():
            merged_all = True
            break
        # each component's minimum OUTGOING edge under the total order
        # (w, a, b): struct min keyed by component — the candidate
        # relation is one row per cross-component edge side
        cand = F.struct(
            F.col("w"), F.col("a"), F.col("b"), F.col("ca"), F.col("cb")
        ).alias("cand")
        half = lab.select(F.col("ca").alias("c"), cand).union(
            lab.select(F.col("cb").alias("c"), cand)
        )
        sel = (
            half.groupBy("c")
            .agg(F.min("cand").alias("m"))
            .select("m.w", "m.a", "m.b", "m.ca", "m.cb")
            .distinct()  # both endpoints may pick the same edge
            .localCheckpoint()
        )
        picked.append(sel.select("a", "b", "w"))
        # merge: CC over the selected component-pair graph (one edge
        # per component -> geometrically shrinking relation)
        cc = connected_components(
            sel.select(F.col("ca").alias("id_a"), F.col("cb").alias("id_b"))
        )
        new_comp = (
            comp.join(
                cc.withColumnRenamed("node", "comp"), "comp", "left"
            )
            .select(
                "node",
                F.coalesce(F.col("component"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        comp.unpersist()
        lab.unpersist()
        comp = new_comp
    if not merged_all:
        # The loop exhausted max_rounds — but the FINAL round's selected
        # edges may have completed the merge (merged_all is only set by
        # the pre-round emptiness probe).  Re-check against the final
        # labeling before warning, so a graph needing exactly max_rounds
        # rounds does not get a spurious incomplete-forest warning.
        ca = comp.select(F.col("node").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("node").alias("b"), F.col("comp").alias("cb"))
        merged_all = (
            e.join(ca, "a")
            .join(cb, "b")
            .where(F.col("ca") != F.col("cb"))
            .isEmpty()
        )
    if not merged_all:
        import warnings

        warnings.warn(
            f"boruvka_mst: components still merging after max_rounds="
            f"{max_rounds}; the returned forest is incomplete. Boruvka "
            "halves components every round, so this needs a graph past "
            f"2^{max_rounds} nodes or a bug — raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    if not picked:
        spark = edges.sparkSession
        return spark.createDataFrame([], "src long, dst long, w long")
    out = picked[0]
    for p in picked[1:]:
        out = out.union(p)
    return out.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    )
