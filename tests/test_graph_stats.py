"""Unit tests for operators/graph.py (triangle counting /
transitivity, degree assortativity) on hand-built graphs with known
closed-form values, plus DuckDB twin parity on a pseudo-random
graph."""

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


class TestTriangleStats:
    def test_single_triangle(self, spark):
        from geogeometry_spark.operators.graph import triangle_stats

        r = triangle_stats(
            _edges(spark, [(1, 2), (2, 3), (3, 1)])
        ).collect()[0]
        assert (r["n_nodes"], r["m_edges"], r["wedges"]) == (3, 3, 3)
        assert r["triangles"] == 1 and r["transitivity_r6"] == 1.0

    def test_k4_complete(self, spark):
        from geogeometry_spark.operators.graph import triangle_stats

        pairs = [(i, j) for i in range(4) for j in range(4) if i < j]
        r = triangle_stats(_edges(spark, pairs)).collect()[0]
        # K4: C(4,3)=4 triangles, each node deg 3 -> 4*3 wedges... /2 = 12
        assert (r["m_edges"], r["wedges"], r["triangles"]) == (6, 12, 4)
        assert r["transitivity_r6"] == 1.0

    def test_star_no_triangles(self, spark):
        from geogeometry_spark.operators.graph import triangle_stats

        r = triangle_stats(
            _edges(spark, [(0, k) for k in range(1, 6)])
        ).collect()[0]
        # hub deg 5 -> 10 wedges, zero closed
        assert (r["wedges"], r["triangles"]) == (10, 0)
        assert r["transitivity_r6"] == 0.0

    def test_directed_both_ways_and_self_loops_collapse(self, spark):
        from geogeometry_spark.operators.graph import triangle_stats

        pairs = (
            [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
            + [(1, 1), (2, 2)]  # self-loops dropped
        )
        r = triangle_stats(_edges(spark, pairs)).collect()[0]
        assert (r["m_edges"], r["triangles"]) == (3, 1)

    def test_single_edge_null_transitivity(self, spark):
        from geogeometry_spark.operators.graph import triangle_stats

        r = triangle_stats(_edges(spark, [(1, 2)])).collect()[0]
        assert r["wedges"] == 0 and r["transitivity_r6"] is None

    def test_twin_parity(self, spark):
        import duckdb

        from geogeometry_spark.operators.graph import (
            triangle_stats,
            triangle_stats_oracle_sql,
        )

        # pseudo-random graph with hubs: node k links to (k*7)%53 and
        # (k*k)%53 — duplicates and self-loops included on purpose
        pairs = [(k, (k * 7) % 53) for k in range(53)] + [
            (k, (k * k) % 53) for k in range(53)
        ]
        got = tuple(triangle_stats(_edges(spark, pairs)).collect()[0])
        vals = ", ".join(f"({a}, {b})" for a, b in pairs)
        exp = duckdb.sql(
            triangle_stats_oracle_sql(
                f"(SELECT * FROM (VALUES {vals}) t(src, dst))"
            )
        ).fetchall()[0]
        assert got == exp and got[3] > 0


class TestDegreeAssortativity:
    def test_star_disassortative(self, spark):
        from geogeometry_spark.operators.graph import degree_assortativity

        # star: every edge joins deg-5 hub to deg-1 leaf -> r = -1 is
        # undefined here (both endpoint-degree sequences are constant
        # per side; Newman r for a star is NULL: den = 0? No —
        # j always 5, k always 1 -> var > 0 over edge ends) -> r = -1
        r = degree_assortativity(
            _edges(spark, [(0, k) for k in range(1, 6)])
        ).collect()[0]
        assert r["assortativity_r6"] == -1.0

    def test_cycle_regular_null(self, spark):
        from geogeometry_spark.operators.graph import degree_assortativity

        # 2-regular cycle: zero degree variance -> NULL
        n = 6
        r = degree_assortativity(
            _edges(spark, [(k, (k + 1) % n) for k in range(n)])
        ).collect()[0]
        assert r["m_edges"] == n and r["assortativity_r6"] is None

    def test_path3_value(self, spark):
        from geogeometry_spark.operators.graph import degree_assortativity

        # path 1-2-3: edge ends (1,2) and (2,1): mean=3/2, Sjk=2+2=4,
        # Sj2=1+4+4+1=10 -> num=4/2-2.25=-0.25, den=10/4-2.25=0.25 -> -1
        r = degree_assortativity(
            _edges(spark, [(1, 2), (2, 3)])
        ).collect()[0]
        assert r["assortativity_r6"] == -1.0

    def test_twin_parity(self, spark):
        import duckdb

        from geogeometry_spark.operators.graph import (
            degree_assortativity,
            degree_assortativity_oracle_sql,
        )

        pairs = [(k, (k * 7) % 53) for k in range(53)] + [
            (k, (k * k) % 53) for k in range(53)
        ]
        got = tuple(
            degree_assortativity(_edges(spark, pairs)).collect()[0]
        )
        vals = ", ".join(f"({a}, {b})" for a, b in pairs)
        exp = duckdb.sql(
            degree_assortativity_oracle_sql(
                f"(SELECT * FROM (VALUES {vals}) t(src, dst))"
            )
        ).fetchall()[0]
        assert got == exp


class TestBracedLatticeFixture:
    def test_722_triangles_by_construction(self, spark):
        from geogeometry_spark.contract import _braced_road_edges
        from geogeometry_spark.operators.graph import triangle_stats

        r = triangle_stats(_braced_road_edges(spark)).collect()[0]
        # 760 lattice links + 361 diagonal braces; each brace closes
        # exactly 2 triangles with its cell corners
        assert (r["n_nodes"], r["m_edges"]) == (400, 1121)
        assert r["triangles"] == 722


class TestHuffCatchment:
    FACS = [
        (1, 0.0, 0.0, 1.0),
        (2, 0.0, 1.0, 1.0),
        (3, 1.0, 0.5, 2.0),
    ]

    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, lat double, lon double"
        )

    def test_capture_and_probabilities(self, spark):
        from geogeometry_spark.operators.routing import huff_catchment

        # demand piled right on facility 1: it captures ~everything
        rows = [(i, 0.0001, 0.0001) for i in range(5)]
        r = huff_catchment(
            self._pts(spark, rows), self.FACS, zoom=10
        ).collect()
        assert len(r) == 1
        assert r[0]["best_fac"] == 1 and r[0]["p_best_r6"] > 0.99
        assert r[0]["p_sum_chk"] == 1.0

    def test_attractiveness_beats_distance_tie(self, spark):
        from geogeometry_spark.operators.routing import huff_catchment

        # demand equidistant from facilities 1 and 2 (0, 0.5): the
        # doubled-weight facility 3 is farther but the 1-vs-2 tie
        # breaks to the FIRST listed (strict > keeps the earlier id)
        rows = [(0, 0.0, 0.5)]
        facs = [(1, 0.0, 0.0, 1.0), (2, 0.0, 1.0, 1.0)]
        r = huff_catchment(
            self._pts(spark, rows), facs, zoom=10
        ).collect()[0]
        assert r["best_fac"] == 1
        assert r["p_best_r6"] == pytest.approx(0.5, abs=1e-5)

    def test_empty_facilities_raises(self, spark):
        from geogeometry_spark.operators.routing import huff_catchment

        with pytest.raises(ValueError, match="at least one facility"):
            huff_catchment(self._pts(spark, [(0, 0.0, 0.0)]), [])

    def test_twin_parity(self, spark):
        import duckdb

        from geogeometry_spark.operators.routing import (
            huff_catchment,
            huff_catchment_oracle_sql,
        )

        rows = [
            (i, ((i * 7) % 21) * 0.05, ((i * 13) % 21) * 0.05)
            for i in range(157)
        ]
        got = sorted(
            map(
                tuple,
                huff_catchment(
                    self._pts(spark, rows), self.FACS, zoom=10
                ).collect(),
            )
        )
        vals = ", ".join(f"({e}, {la!r}, {lo!r})" for e, la, lo in rows)
        sql = huff_catchment_oracle_sql(
            "(SELECT event_id, CAST(lat AS DOUBLE) AS lat, "
            "CAST(lon AS DOUBLE) AS lon FROM "
            f"(VALUES {vals}) t(event_id, lat, lon))",
            self.FACS,
            zoom=10,
        )
        exp = sorted(map(tuple, duckdb.sql(sql).fetchall()))
        assert got == exp and len(got) > 3


class TestDeviationalEllipse:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, lat double, lon double"
        )

    def test_diagonal_line_angle_45(self, spark):
        from geogeometry_spark.operators.trajectory import (
            deviational_ellipse,
        )

        # fixes on the lat=lon line: major axis at 45 deg, minor ~ 0
        rows = [(i, 1, i * 0.001, i * 0.001) for i in range(11)]
        r = deviational_ellipse(self._pts(spark, rows)).collect()[0]
        assert r["angle_r7"] == pytest.approx(45.0, abs=1e-6)
        assert r["minor_deg_r7"] == pytest.approx(0.0, abs=1e-6)
        assert r["major_deg_r7"] > 0
        assert r["c_lat"] == pytest.approx(0.005, abs=1e-9)

    def test_east_west_spread_angle_zero(self, spark):
        from geogeometry_spark.operators.trajectory import (
            deviational_ellipse,
        )

        # wide in lon, narrow in lat: angle ~ 0, major >> minor
        rows = [(i, 7, (i % 3) * 0.0001, i * 0.01) for i in range(12)]
        r = deviational_ellipse(self._pts(spark, rows)).collect()[0]
        assert abs(r["angle_r7"]) < 1.0
        assert r["major_deg_r7"] > 10 * r["minor_deg_r7"]

    def test_single_fix_degenerate(self, spark):
        from geogeometry_spark.operators.trajectory import (
            deviational_ellipse,
        )

        r = deviational_ellipse(
            self._pts(spark, [(0, 3, 52.5, 13.4)])
        ).collect()[0]
        assert (r["major_deg_r7"], r["minor_deg_r7"]) == (0.0, 0.0)
        assert r["c_lat"] == pytest.approx(52.5, abs=1e-6)

    def test_twin_parity(self, spark):
        import duckdb

        from geogeometry_spark.operators.trajectory import (
            deviational_ellipse,
            deviational_ellipse_oracle_sql,
        )

        rows = [
            (i, i % 7, ((i * 31) % 100) * 0.003 - 0.15 + (i % 7) * 10.0,
             ((i * 17) % 100) * 0.005 - 0.25)
            for i in range(301)
        ]
        got = sorted(
            map(tuple, deviational_ellipse(self._pts(spark, rows)).collect())
        )
        vals = ", ".join(
            f"({e}, {u}, {la!r}, {lo!r})" for e, u, la, lo in rows
        )
        sql = deviational_ellipse_oracle_sql(
            "(SELECT event_id, user_id, CAST(lat AS DOUBLE) AS lat, "
            "CAST(lon AS DOUBLE) AS lon FROM "
            f"(VALUES {vals}) t(event_id, user_id, lat, lon))"
        )
        exp = sorted(map(tuple, duckdb.sql(sql).fetchall()))
        assert got == exp and len(got) == 7


class TestKCore:
    def test_k4_with_pendant_tail(self, spark):
        from geogeometry_spark.operators.graph import k_core

        pairs = [(i, j) for i in range(4) for j in range(4) if i < j] + [
            (3, 9),
            (9, 10),
        ]
        got = sorted(
            map(tuple, k_core(_edges(spark, pairs), k=3).collect())
        )
        assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]

    def test_triangle_strip_cascades_to_empty(self, spark):
        from geogeometry_spark.operators.graph import k_core

        # strip: (i,i+1) and (i,i+2) — interior deg 4, ends deg 2;
        # peeling the ends cascades inward over many SYNCHRONOUS
        # rounds until nothing is left (the multi-round loop path)
        m = 12
        pairs = [(i, i + 1) for i in range(m)] + [
            (i, i + 2) for i in range(m - 1)
        ]
        assert k_core(_edges(spark, pairs), k=3).count() == 0

    def test_max_rounds_raises(self, spark):
        from geogeometry_spark.operators.graph import k_core

        m = 12
        pairs = [(i, i + 1) for i in range(m)] + [
            (i, i + 2) for i in range(m - 1)
        ]
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(_edges(spark, pairs), k=3, max_rounds=2)

    def test_twin_parity_cascade(self, spark):
        import duckdb

        from geogeometry_spark.operators.graph import (
            k_core,
            k_core_oracle_sql,
        )

        # strip + a K5 anchor at the far end: the strip erodes, the
        # clique survives — multi-round parity with an unroll >= depth
        m = 10
        pairs = (
            [(i, i + 1) for i in range(m)]
            + [(i, i + 2) for i in range(m - 1)]
            + [(100 + i, 100 + j) for i in range(5) for j in range(5) if i < j]
            + [(m, 100)]
        )
        got = sorted(map(tuple, k_core(_edges(spark, pairs), k=3).collect()))
        vals = ", ".join(f"({a}, {b})" for a, b in pairs)
        exp = sorted(
            map(
                tuple,
                duckdb.sql(
                    k_core_oracle_sql(
                        f"(SELECT * FROM (VALUES {vals}) t(src, dst))",
                        k=3,
                        twin_rounds=12,
                    )
                ).fetchall(),
            )
        )
        assert got == exp
        assert {n for n, _ in got} == {100 + i for i in range(5)}


# --------------------------------------------------------------------------
# Boruvka minimum spanning forest
# --------------------------------------------------------------------------

def _kruskal(edges):
    """Reference Kruskal under the SAME (w, a, b) total order."""
    canon = {}
    for s, d, w in edges:
        a, b = (s, d) if s < d else (d, s)
        if a == b:
            continue
        if (a, b) not in canon or w < canon[(a, b)]:
            canon[(a, b)] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_mst_matches_kruskal_random_graph(spark):
    from geogeometry_spark.operators.graph import boruvka_mst

    rows = [
        (i % 23, (i * 7 + 3) % 23, 100 + (i * 37) % 400)
        for i in range(60)
        if i % 23 != (i * 7 + 3) % 23
    ]
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    got = {
        (r["src"], r["dst"], r["w"]) for r in boruvka_mst(e).collect()
    }
    assert got == _kruskal(rows)


def test_mst_forest_on_disconnected_graph(spark):
    from geogeometry_spark.operators.graph import boruvka_mst

    rows = [
        (0, 1, 10), (1, 2, 20), (0, 2, 30),   # triangle: drops (0,2)
        (10, 11, 5),                          # separate component
    ]
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    got = {
        (r["src"], r["dst"], r["w"]) for r in boruvka_mst(e).collect()
    }
    assert got == {(0, 1, 10), (1, 2, 20), (10, 11, 5)}


def test_mst_tie_break_is_canonical_pair_order(spark):
    from geogeometry_spark.operators.graph import boruvka_mst

    # square with ALL equal weights: MST must be the Kruskal result
    # under (w, a, b) order — edges (0,1), (0,3), (1,2)
    rows = [(0, 1, 7), (1, 2, 7), (2, 3, 7), (0, 3, 7)]
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    got = {
        (r["src"], r["dst"], r["w"]) for r in boruvka_mst(e).collect()
    }
    assert got == _kruskal(rows) == {(0, 1, 7), (0, 3, 7), (1, 2, 7)}


def test_mst_spanning_tree_size_on_lattice(spark):
    from geogeometry_spark.operators.graph import boruvka_mst

    # 5x5 grid lattice, distinct weights
    def nid(r, c):
        return r * 5 + c

    rows = []
    k = 0
    for r in range(5):
        for c in range(5):
            if c + 1 < 5:
                rows.append((nid(r, c), nid(r, c + 1), 100 + (k * 17) % 97))
                k += 1
            if r + 1 < 5:
                rows.append((nid(r, c), nid(r + 1, c), 100 + (k * 17) % 97))
                k += 1
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    got = {(r["src"], r["dst"], r["w"]) for r in boruvka_mst(e).collect()}
    want = _kruskal(rows)
    assert got == want
    assert len(got) == 24  # n - 1


def test_mst_warns_on_insufficient_rounds(spark):
    import warnings

    from geogeometry_spark.operators.graph import boruvka_mst

    # Path 0-1-2-3 with an expensive middle edge: round 1 selects only
    # (0,1) and (2,3) — no endpoint of (1,2) has it as its min incident
    # edge — so max_rounds=1 genuinely leaves two components unmerged.
    rows = [(0, 1, 1), (1, 2, 100), (2, 3, 2)]
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = boruvka_mst(e, max_rounds=1).collect()
        assert any("incomplete" in str(x.message) for x in w)
    assert len(got) == 2  # (1,2) missing from the forest


def test_mst_no_spurious_warning_when_final_round_completes(spark):
    import warnings

    from geogeometry_spark.operators.graph import boruvka_mst

    # Increasing-weight path: EVERY edge is the min incident edge of its
    # right endpoint, so round 1 selects all edges and the merge
    # completes in exactly max_rounds=1.  The pre-round emptiness probe
    # never sees the merged state; the post-loop re-check must suppress
    # the incomplete-forest warning (ADVICE round 4).
    rows = [(i, i + 1, 10 + i) for i in range(6)]
    e = spark.createDataFrame(rows, "src int, dst int, w_mm long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = boruvka_mst(e, max_rounds=1).collect()
        assert not any("incomplete" in str(x.message) for x in w)
    assert len(got) == 6  # complete spanning tree of the 7-node path
