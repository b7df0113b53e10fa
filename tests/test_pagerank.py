"""PageRank operator tests: exact fixed-point semantics verifiable by
hand on tiny graphs, dangling-mass redistribution, the weighted split,
the overflow guard, and bit-exact DuckDB-twin parity on an irregular
graph that exercises every branch (dangling + weights + asymmetry)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geogeometry_spark.operators.pagerank import (
    pagerank,
    pagerank_oracle_sql,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int, w long")


def _ranks(df):
    return {r["node"]: r["rank_scaled"] for r in df.collect()}


def test_two_cycle_is_symmetric_and_conserves_mass(spark):
    # 0 <-> 1: by symmetry the ranks must stay equal every round, and
    # with no dangling nodes mass only leaks via deterministic floors
    e = _edges(spark, [(0, 1, 1), (1, 0, 1)])
    got = _ranks(pagerank(e, w_col=None, rounds=5))
    assert got[0] == got[1]
    assert abs(sum(got.values()) - 10**12) < 100


def test_sink_mass_redistributes(spark):
    # 0 -> 1, 1 is dangling: without redistribution node 0 would decay
    # to the base term alone; with it, 1's mass flows back uniformly
    e = _edges(spark, [(0, 1, 1)])
    got = _ranks(pagerank(e, rounds=3))
    base = ((10**12 * 15) // 100) // 2
    assert got[0] > base  # received redistributed dangling mass
    assert got[1] > got[0]  # sink still accumulates 0's full push


def test_weighted_split_follows_weights(spark):
    # 0 pushes to 1 (w=3) and 2 (w=1): 1 must get ~3x 2's contribution
    e = _edges(
        spark, [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    )
    got = _ranks(pagerank(e, w_col="w", rounds=8))
    assert got[1] > got[2]
    # exact one-round check: q = (init*85) div 100, split 3:1 by div
    init = 10**12 // 3
    q = (init * 85) // 100
    one = _ranks(pagerank(e, w_col="w", rounds=1))
    base = ((10**12 * 15) // 100) // 3
    assert one[1] == base + (q * 3) // 4
    assert one[2] == base + (q * 1) // 4


def test_overflow_guard_raises(spark):
    e = _edges(spark, [(0, 1, 10**9), (1, 0, 10**9)])
    with pytest.raises(ValueError, match="overflow"):
        pagerank(e, w_col="w", rounds=1)


def test_twin_parity_irregular_graph(spark):
    # asymmetric graph with a dangling node (4), a weighted fan-out,
    # and a node reachable only via the dangling redistribution (5->)
    rows = [
        (0, 1, 2),
        (0, 2, 5),
        (1, 2, 1),
        (2, 0, 1),
        (2, 3, 3),
        (3, 4, 1),
        (5, 0, 2),
        (5, 4, 7),
    ]
    e = _edges(spark, rows)
    got = sorted(
        pagerank(e, w_col="w", rounds=9).collect(),
        key=lambda r: r["node"],
    )
    vals = ", ".join(f"({s}, {d}, {w})" for s, d, w in rows)
    sql = pagerank_oracle_sql(
        f"(SELECT * FROM (VALUES {vals}) t(src, dst, w))",
        rounds=9,
        w_col="w",
    )
    exp = duckdb.sql(sql + " ORDER BY node").fetchall()
    assert len(got) == len(exp) == 6
    for g, x in zip(got, exp):
        assert (g["node"], g["rank_scaled"]) == (x[0], x[1])
        assert g["pr"] == x[2]  # single IEEE division — bit-exact


def test_fixed_rounds_deterministic(spark):
    e = _edges(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
    a = _ranks(pagerank(e, rounds=6))
    b = _ranks(pagerank(e, rounds=6))
    assert a == b


class TestPersonalizedPagerank:
    def test_teleport_concentrates_on_seed(self, spark):
        # cycle 0 -> 1 -> 2 -> 0, seed {0}: at the fixed point
        # pi(0) = 0.15/(1-0.85^3) > pi(1) = 0.85*pi(0) > pi(2).  The
        # initial mass wave circulates with period 3 and decays by the
        # damping factor per hop, so 30 rounds leaves < 0.8% residual
        # — well under the ~4% fixed-point gaps (8 rounds is NOT
        # enough: the wave still dominates the ordering there).
        e = _edges(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
        seeds = spark.createDataFrame([(0,)], "node int")
        got = _ranks(pagerank(e, rounds=30, seeds=seeds))
        assert got[0] > got[1] > got[2]

    def test_unreached_node_scores_zero(self, spark):
        # 0 -> 1; 2 -> 1: seeding {0} never reaches 2 (no teleport
        # there, no inbound path)
        e = _edges(spark, [(0, 1, 1), (2, 1, 1), (1, 0, 1)])
        seeds = spark.createDataFrame([(0,)], "node int")
        got = _ranks(pagerank(e, rounds=6, seeds=seeds))
        assert got[2] == 0 and got[0] > 0 and got[1] > 0

    def test_seed_absent_from_graph_raises(self, spark):
        e = _edges(spark, [(0, 1, 1), (1, 0, 1)])
        seeds = spark.createDataFrame([(99,)], "node int")
        with pytest.raises(ValueError, match="seed"):
            pagerank(e, rounds=2, seeds=seeds)

    def test_twin_parity_with_seeds_and_dangling(self, spark):
        rows = [
            (0, 1, 2), (0, 2, 5), (1, 2, 1), (2, 0, 1),
            (2, 3, 3), (3, 4, 1), (5, 0, 2), (5, 4, 7),
        ]
        e = _edges(spark, rows)
        seeds = spark.createDataFrame([(0,), (5,)], "node int")
        got = sorted(
            pagerank(e, w_col="w", rounds=9, seeds=seeds).collect(),
            key=lambda r: r["node"],
        )
        vals = ", ".join(f"({s}, {d}, {w})" for s, d, w in rows)
        import duckdb

        sql = pagerank_oracle_sql(
            f"(SELECT * FROM (VALUES {vals}) t(src, dst, w))",
            rounds=9,
            w_col="w",
            seeds_subq="(SELECT UNNEST([0, 5]) AS node)",
        )
        exp = duckdb.sql(sql + " ORDER BY node").fetchall()
        assert len(got) == len(exp) == 6
        for g, x in zip(got, exp):
            assert (g["node"], g["rank_scaled"], g["pr"]) == x

    def test_classic_mode_unchanged_by_seed_flag_plumbing(self, spark):
        # seeds=None must reproduce the pre-PPR classic values (all
        # nodes in the teleport set)
        e = _edges(spark, [(0, 1, 1), (1, 0, 1)])
        got = _ranks(pagerank(e, rounds=5))
        assert got[0] == got[1]
        assert abs(sum(got.values()) - 10**12) < 100


# --------------------------------------------------------------------------
# HITS hubs & authorities
# --------------------------------------------------------------------------

from geogeometry_spark.operators.pagerank import hits, hits_oracle_sql  # noqa: E402


def _hits_brute(edges, rounds, scale=10**9):
    """Pure-Python replica of the integer HITS loop."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    h = {u: scale // n for u in nodes}
    a = {u: 0 for u in nodes}
    for _ in range(rounds):
        raw = {u: 0 for u in nodes}
        for s, d in edges:
            raw[d] += h[s]
        tot = sum(raw.values())
        a = {
            u: (raw[u] * scale) // tot if tot > 0 else 0 for u in nodes
        }
        raw = {u: 0 for u in nodes}
        for s, d in edges:
            raw[s] += a[d]
        tot = sum(raw.values())
        h = {
            u: (raw[u] * scale) // tot if tot > 0 else 0 for u in nodes
        }
    return h, a


def test_hits_star_graph_hub_vs_authority(spark):
    # 0 -> 1, 0 -> 2, 0 -> 3: node 0 is the only hub, 1..3 are the
    # only authorities — scores must separate completely
    e = _edges(spark, [(0, 1, 1), (0, 2, 1), (0, 3, 1)])
    got = {r["node"]: r for r in hits(e, rounds=4).collect()}
    assert got[0]["auth_scaled"] == 0
    assert got[0]["hub_scaled"] == 10**9  # all hub mass
    for v in (1, 2, 3):
        assert got[v]["hub_scaled"] == 0
        assert got[v]["auth_scaled"] == (10**9) // 3


def test_hits_matches_python_brute_force(spark):
    rows = [
        (i % 7, (i * 3 + 1) % 7, 1) for i in range(15)
    ]
    rows = [r for r in rows if r[0] != r[1]]
    edges = [(s, d) for s, d, _ in rows]
    got_h, got_a = {}, {}
    for r in hits(_edges(spark, rows), rounds=6).collect():
        got_h[r["node"]] = r["hub_scaled"]
        got_a[r["node"]] = r["auth_scaled"]
    want_h, want_a = _hits_brute(edges, 6)
    assert got_h == want_h
    assert got_a == want_a


def test_hits_twin_parity_irregular_graph(spark):
    rows = [
        (i % 11, (i * 7 + 3) % 11, 1)
        for i in range(28)
        if i % 11 != (i * 7 + 3) % 11
    ]
    got = sorted(
        (r["node"], r["hub_scaled"], r["auth_scaled"], r["hub"], r["auth"])
        for r in hits(_edges(spark, rows), rounds=5).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d, _ in rows)
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.sql(
            hits_oracle_sql(
                f"(SELECT * FROM (VALUES {vals}) t(src, dst))", rounds=5
            )
        ).fetchall()
    )
    con.close()
    assert got == want


def test_hits_guards(spark):
    e = _edges(spark, [(0, 1, 1)])
    with pytest.raises(ValueError, match="overflow"):
        hits(e, scale=10**10)
    with pytest.raises(ValueError, match="rounds"):
        hits(e, rounds=0)
