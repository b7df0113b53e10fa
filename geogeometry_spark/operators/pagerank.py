"""Weighted PageRank over an edge relation with exact fixed-point
BIGINT arithmetic — the third member of the graph-analytics family
(connected components in operators/dedup.py, frontier SSSP in
operators/routing.py).

Why the engine has it: the routing family builds a road network FROM
the reference's geodesic primitives (GeoGeometry.kt:565-608 haversine)
and answers "how far" (SSSP) and "which facility" (catchment);
PageRank answers "how central" — the standard road-importance /
intersection-centrality measure (Page et al. 1999; Jiang 2009 applied
it to street networks), and the hub score a POI-ranking pipeline wants
next to visit counts.

Exactness doctrine (the hmm_match / sssp rule — rationals in, exact
integers through): ranks are BIGINTs in units of ``1/scale`` of the
total mass.  Every per-round operation is integer multiply / floor
divide / sum, so partial-aggregation order cannot move a single bit
and the DuckDB twin (:func:`pagerank_oracle_sql` — the same K rounds
unrolled to chained MATERIALIZED CTEs) matches bit-for-bit.  The
float column in the output is ONE division of an exact BIGINT by the
scale literal (IEEE division is correctly rounded, so it is identical
cross-engine too).

Per round (same loop hygiene as :func:`~.routing.sssp`):

- contribution join ``ranks JOIN edges ON node = src`` — the edge
  relation is re-keyed by ``src`` ONCE up front and checkpointed, and
  the rank relation leaves every round keyed by ``node``, so the join
  aligns without re-shuffling the big side;
- per-destination ``sum`` of contributions is a plain BIGINT hash
  aggregate — map-side combinable, the shuffle carries at most
  |distinct dst| partial rows per task;
- merge is one left join back onto the (static) node relation;
- each round ``localCheckpoint``s eagerly and explicitly unpersists
  the previous round (the connected_components block-manager
  hygiene), and the dangling-node mass for the NEXT round rides the
  checkpoint job for free via ``Observation``.

Dangling nodes (no out-edges) are handled exactly: their round-``i``
mass ``D_i`` is redistributed uniformly as
``((D_i * num) // den) // n`` per node — the driver folds the observed
BIGINT into the next round's base literal, and the twin computes the
identical scalar subquery per unrolled round.

Scale story (100 TB): the iteration is the canonical Pregel-on-
DataFrames shape — two bounded shuffles per round (contribs by dst,
none for the merge once layouts align), no driver-side graph state
(the driver holds one BIGINT per round), round count is a fixed K
(geometric convergence: the rank error shrinks by the damping factor
per round, so K=20 at d=0.85 is ~1e-1.4 of total mass and K=50 is
~1e-3.5 — pick K for the precision the ranking needs, independent of
graph size).

Overflow bound: per-edge contribution is ``((rank*num)//den * w)
// outden``; since every rank < scale*(1+ε), the caller must keep
``scale * num * max(w) < 2**63``.  With the default scale 1e12 and
damping 85/100 that allows weights up to ~10^5 — normalize real-world
weights (e.g. lane counts, capacity classes) into that envelope; the
operator validates ``max(w)`` during the out-degree pass (free — same
aggregate) and raises rather than silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["pagerank", "pagerank_oracle_sql", "hits", "hits_oracle_sql"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str | None = None,
    rounds: int = 20,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    seeds: DataFrame | None = None,
    node_col: str = "node",
) -> DataFrame:
    """Exact fixed-point PageRank after exactly ``rounds`` iterations.

    ``edges``: one row per directed edge; pass both directions for an
    undirected network.  ``w_col=None`` is classic PageRank (uniform
    split over out-degree); a weight column splits each node's mass
    proportionally to integer edge weights (weights must satisfy the
    module-docstring overflow bound).  Returns
    ``(node, rank_scaled BIGINT, pr DOUBLE)`` — ``rank_scaled`` is the
    exact fixed-point value (the cross-engine-comparable column),
    ``pr = rank_scaled / scale``.

    ``seeds`` switches to PERSONALIZED PageRank (random walk with
    restart — Jeh & Widom 2003): the teleport mass (initial ranks, the
    (1-d) base term, and redistributed dangling mass) concentrates
    uniformly on the seed set instead of all nodes, yielding
    seed-relative proximity scores (the "importance to THESE places"
    ranking a POI-recommendation pipeline wants).  Same exact integer
    arithmetic — the base literal just becomes conditional on the seed
    flag carried through the rounds.

    Runs a FIXED round count (no convergence stop) so the output is a
    pure function of the input — the determinism the oracle contract
    needs; pick ``rounds`` for the precision the ranking needs (see
    module docstring).
    """
    num, den = int(damping_num), int(damping_den)
    w = F.col(w_col).cast("long") if w_col else F.lit(1).cast("long")
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        w.alias("_w"),
    )
    # one up-front shuffle keys the static edge relation by _src (the
    # sssp layout trick: localCheckpoint pins the partitioning so every
    # round's contribution join reuses it)
    from ..plans.session import iterative_loop_conf
    from .routing import _loop_partitions

    n_parts = _loop_partitions(edges.sparkSession)
    e = e.repartition(n_parts, "_src").localCheckpoint()

    outd = e.groupBy(F.col("_src").alias("node")).agg(
        F.sum("_w").alias("_outden"), F.max("_w").alias("_maxw")
    )
    max_w = outd.agg(F.max("_maxw")).collect()[0][0] or 0
    if scale * num * max_w >= 2**63:
        raise ValueError(
            f"pagerank overflow: scale({scale}) * damping_num({num}) * "
            f"max weight({max_w}) must stay below 2^63 — normalize the "
            "weight column or lower the scale"
        )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .join(outd.select("node", "_outden"), "node", "left")
    )
    if seeds is not None:
        seed_rel = seeds.select(
            F.col(node_col).alias("node"),
            F.lit(True).alias("_seed"),
        ).distinct()
        nodes = nodes.join(seed_rel, "node", "left").withColumn(
            "_seed", F.coalesce(F.col("_seed"), F.lit(False))
        )
    else:
        nodes = nodes.withColumn("_seed", F.lit(True))
    ranks = nodes.repartition(n_parts, "node").localCheckpoint()
    n = ranks.count()
    if n == 0:
        return ranks.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("pr"),
        )
    # teleport-set size: all nodes (classic) or the seed set (PPR)
    k = (
        n
        if seeds is None
        else ranks.where(F.col("_seed")).count()
    )
    if k == 0:
        raise ValueError(
            "personalized pagerank needs >= 1 seed present in the graph"
        )

    # init mass: floor(scale / k) per teleport node (mass lost to
    # flooring is deterministic and identical in the twin)
    init = scale // k
    base = ((scale * (den - num)) // den) // k

    obs = Observation()
    ranks = (
        ranks.withColumn(
            "_r",
            F.when(F.col("_seed"), F.lit(init))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .observe(
            obs,
            F.sum(
                F.when(F.col("_outden").isNull(), F.col("_r")).otherwise(
                    F.lit(0)
                )
            ).alias("dang"),
        )
        .localCheckpoint()
    )
    with iterative_loop_conf(
        edges.sparkSession, aqe=False, shuffle_partitions=n_parts
    ):
        for _ in range(int(rounds)):
            dang = obs.get["dang"] or 0
            dang_term = ((int(dang) * num) // den) // k
            contribs = (
                ranks.where(F.col("_outden").isNotNull())
                .join(e, ranks["node"] == e["_src"])
                .select(
                    F.col("_dst").alias("node"),
                    # pinned op order, mirrored verbatim in the twin:
                    # ((r*num) div den * w) div outden — Spark `div` is
                    # BIGINT integer division, identical to DuckDB `//`
                    # for the non-negative values here
                    F.expr(
                        f"((_r * {num}) div {den} * _w) div _outden"
                    ).alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_c"))
            )
            obs = Observation()
            merged = (
                ranks.select("node", "_outden", "_seed")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    "_outden",
                    "_seed",
                    (
                        F.when(
                            F.col("_seed"),
                            F.lit(int(base + dang_term)),
                        )
                        .otherwise(F.lit(0))
                        .cast("long")
                        + F.coalesce(F.col("_c"), F.lit(0))
                    ).alias("_r"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(
                            F.col("_outden").isNull(), F.col("_r")
                        ).otherwise(F.lit(0))
                    ).alias("dang"),
                )
                .localCheckpoint()  # eager: runs the round's job
            )
            old = ranks
            ranks = merged
            old.unpersist()
    return ranks.select(
        "node",
        F.col("_r").alias("rank_scaled"),
        (F.col("_r") / F.lit(float(scale))).alias("pr"),
    )


def pagerank_oracle_sql(
    edges_subq: str,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str | None = None,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    seeds_subq: str | None = None,
    node_col: str = "node",
) -> str:
    """DuckDB twin of :func:`pagerank`: the same K rounds unrolled to
    chained MATERIALIZED CTEs (the sssp_oracle_sql pattern — the
    per-round aggregate can't live inside a recursive CTE).  Every
    operation is the identical integer multiply / floor-divide (``//``)
    / sum, including the per-round dangling-mass scalar subquery, so
    the result matches the operator bit-for-bit at any round count.
    ``seeds_subq`` mirrors the personalized mode: the teleport terms
    become conditional on the seed flag, divided by the seed count.
    """
    num, den = int(damping_num), int(damping_den)
    w_sql = f"CAST({w_col} AS BIGINT)" if w_col else "CAST(1 AS BIGINT)"
    base_a = (scale * (den - num)) // den
    if seeds_subq is None:
        nd = (
            "nd AS MATERIALIZED (SELECT node, outden, TRUE AS seed FROM "
            "(SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)) "
            "LEFT JOIN outd USING (node))"
        )
    else:
        nd = (
            "nd AS MATERIALIZED (SELECT node, outden, "
            "COALESCE(seed, FALSE) AS seed FROM "
            "(SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)) "
            "LEFT JOIN outd USING (node) LEFT JOIN "
            f"(SELECT DISTINCT {node_col} AS node, TRUE AS seed "
            f"FROM {seeds_subq}) USING (node))"
        )
    parts = [
        f"e AS MATERIALIZED (SELECT {src_col} AS src, {dst_col} AS dst, "
        f"{w_sql} AS w FROM {edges_subq})",
        "outd AS MATERIALIZED (SELECT src AS node, SUM(w) AS outden "
        "FROM e GROUP BY src)",
        nd,
        "nc AS MATERIALIZED (SELECT COUNT(*) FILTER (WHERE seed) AS k "
        "FROM nd)",
        f"r0 AS MATERIALIZED (SELECT node, outden, seed, "
        f"CASE WHEN seed THEN (SELECT {scale} // k FROM nc) "
        "ELSE 0 END AS r FROM nd)",
    ]
    for i in range(int(rounds)):
        dang = (
            f"(SELECT ((COALESCE(SUM(r), 0) * {num}) // {den}) "
            f"// (SELECT k FROM nc) FROM r{i} WHERE outden IS NULL)"
        )
        contribs = (
            f"SELECT e.dst AS node, SUM(((rr.r * {num}) // {den} * e.w) "
            f"// rr.outden) AS c FROM r{i} rr JOIN e ON rr.node = e.src "
            "WHERE rr.outden IS NOT NULL GROUP BY e.dst"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT p.node, p.outden, p.seed, "
            f"CASE WHEN p.seed THEN (SELECT {base_a} // k FROM nc) + "
            f"{dang} ELSE 0 END + COALESCE(c.c, 0) AS r "
            f"FROM r{i} p LEFT JOIN ({contribs}) c USING (node))"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node, r AS rank_scaled, r / {float(scale)} AS pr "
        f"FROM r{int(rounds)}"
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) after exactly
    ``rounds`` iterations, with the :func:`pagerank` exactness
    doctrine: scores are BIGINTs in units of ``1/scale`` of the
    L1-normalized total, every per-round operation is integer
    multiply / floor-divide / sum, and the DuckDB twin
    (:func:`hits_oracle_sql`, K rounds unrolled to MATERIALIZED CTEs)
    matches bit-for-bit.

    Per round: authority(v) = sum of hub(u) over in-edges u->v, then
    L1-renormalized to ``scale`` via ``(raw * scale) // A`` (A = the
    round's raw total — one driver-side BIGINT, read off the
    checkpointed node-scale relation); hub(u) = sum of the NEW
    authority(v) over out-edges, renormalized the same way.  L1
    instead of the textbook L2 keeps the fixed point exactly
    representable in integers (same ranking — normalization choice
    only rescales).

    Scale story: identical Pregel-on-DataFrames shape to pagerank —
    the edge relation is keyed ONCE by src and reused every round
    (the authority-side aggregate shuffles by dst, the hub-side by
    src; both map-side combinable BIGINT sums), node-scale relations
    localCheckpoint per round with explicit unpersist of the previous
    round.  Overflow: raw sums stay <= scale, so ``scale ** 2`` must
    stay below 2^63 (validated; default 1e9 gives 1e18 headroom).

    Returns (node, hub_scaled, auth_scaled, hub, auth) — the scaled
    BIGINTs are the cross-engine-comparable columns; hub/auth are one
    exact IEEE division by the scale literal."""
    if scale * scale >= 2**63:
        raise ValueError(
            f"hits overflow: scale({scale})^2 must stay below 2^63"
        )
    if int(rounds) < 1:
        raise ValueError("hits needs rounds >= 1")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    from ..plans.session import iterative_loop_conf
    from .routing import _loop_partitions

    n_parts = _loop_partitions(edges.sparkSession)
    e = e.repartition(n_parts, "_src").localCheckpoint()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .repartition(n_parts, "node")
        .localCheckpoint()
    )
    n = nodes.count()
    spark = edges.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [],
            "node long, hub_scaled long, auth_scaled long, "
            "hub double, auth double",
        )
    init = scale // n
    h = nodes.select(
        "node", F.lit(init).cast("long").alias("_s")
    ).localCheckpoint()
    a = None
    with iterative_loop_conf(
        edges.sparkSession, aqe=False, shuffle_partitions=n_parts
    ):
        for _ in range(int(rounds)):
            # authority step: sum incoming hub mass, L1-renormalize
            araw = (
                h.join(e, h["node"] == e["_src"])
                .select(F.col("_dst").alias("node"), F.col("_s").alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_raw"))
            )
            araw = (
                nodes.join(araw, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("_raw"), F.lit(0))
                    .cast("long")
                    .alias("_raw"),
                )
                .localCheckpoint()
            )
            tot_a = int(araw.agg(F.sum("_raw")).first()[0] or 0)
            a_new = araw.select(
                "node",
                (
                    F.expr(f"(_raw * {scale}) div {tot_a}")
                    if tot_a > 0
                    else F.lit(0)
                )
                .cast("long")
                .alias("_s"),
            ).localCheckpoint()
            araw.unpersist()
            if a is not None:
                a.unpersist()
            a = a_new
            # hub step: sum outgoing NEW authority mass, renormalize
            hraw = (
                a.join(e, a["node"] == e["_dst"])
                .select(F.col("_src").alias("node"), F.col("_s").alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_raw"))
            )
            hraw = (
                nodes.join(hraw, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("_raw"), F.lit(0))
                    .cast("long")
                    .alias("_raw"),
                )
                .localCheckpoint()
            )
            tot_h = int(hraw.agg(F.sum("_raw")).first()[0] or 0)
            h_new = hraw.select(
                "node",
                (
                    F.expr(f"(_raw * {scale}) div {tot_h}")
                    if tot_h > 0
                    else F.lit(0)
                )
                .cast("long")
                .alias("_s"),
            ).localCheckpoint()
            hraw.unpersist()
            h.unpersist()
            h = h_new
    out = h.select("node", F.col("_s").alias("hub_scaled")).join(
        a.select("node", F.col("_s").alias("auth_scaled")), "node"
    )
    return out.select(
        "node",
        "hub_scaled",
        "auth_scaled",
        (F.col("hub_scaled") / F.lit(float(scale))).alias("hub"),
        (F.col("auth_scaled") / F.lit(float(scale))).alias("auth"),
    )


def hits_oracle_sql(
    edges_subq: str,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`hits`: the same K rounds unrolled to
    chained MATERIALIZED CTEs, the same integer multiply /
    floor-divide / sum per round including the L1 renormalization
    scalar subqueries — bit-identical at any round count."""
    parts = [
        f"e AS MATERIALIZED (SELECT {src_col} AS src, {dst_col} AS dst "
        f"FROM {edges_subq})",
        "nd AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "nc AS MATERIALIZED (SELECT COUNT(*) AS n FROM nd)",
        f"h0 AS MATERIALIZED (SELECT node, "
        f"(SELECT {scale} // n FROM nc) AS s FROM nd)",
    ]
    for i in range(int(rounds)):
        parts.append(
            f"a{i}_raw AS MATERIALIZED (SELECT nd.node, "
            "COALESCE(c.c, 0) AS raw FROM nd LEFT JOIN "
            f"(SELECT e.dst AS node, SUM(h.s) AS c FROM h{i} h "
            "JOIN e ON h.node = e.src GROUP BY e.dst) c USING (node))"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT SUM(raw) FROM a{i}_raw) > 0 THEN "
            f"(raw * {scale}) // (SELECT SUM(raw) FROM a{i}_raw) "
            f"ELSE 0 END AS s FROM a{i}_raw)"
        )
        parts.append(
            f"h{i + 1}_raw AS MATERIALIZED (SELECT nd.node, "
            "COALESCE(c.c, 0) AS raw FROM nd LEFT JOIN "
            f"(SELECT e.src AS node, SUM(a.s) AS c FROM a{i} a "
            "JOIN e ON a.node = e.dst GROUP BY e.src) c USING (node))"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT SUM(raw) FROM h{i + 1}_raw) > 0 THEN "
            f"(raw * {scale}) // (SELECT SUM(raw) FROM h{i + 1}_raw) "
            f"ELSE 0 END AS s FROM h{i + 1}_raw)"
        )
    k = int(rounds)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT h.node, h.s AS hub_scaled, a.s AS auth_scaled, "
        f"h.s / {float(scale)} AS hub, a.s / {float(scale)} AS auth "
        f"FROM h{k} h JOIN a{k - 1} a USING (node)"
    )
