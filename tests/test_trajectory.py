"""Unit tests for operators/trajectory.py on hand-built micro-fixtures
with known session boundaries, leg lengths, glitches, and stay runs.
The contract queries (traj_sessions/trips/speed/stays) pin the operators
against DuckDB at sf0.01+sf0.1; these tests pin the SEMANTICS on inputs
small enough to verify by hand."""

import math

import pytest
from pyspark.sql import functions as F

from geogeometry_spark.operators import trajectory as tj
from geogeometry_spark.kernels.geometry import haversine_scalar

SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"

# Berlin-ish points with known geodesic separations.
A = (52.5200, 13.4050)
B = (52.5209, 13.4050)  # ~100.1 m due north of A
C = (52.6100, 13.4050)  # ~10 km north of A


def _fix(i, u, t, p):
    return (i, u, t, p[0], p[1])


def test_sessionize_breaks_on_gap(spark):
    rows = [
        _fix(1, 7, 1000, A),
        _fix(2, 7, 1500, A),       # gap 500 < 600 -> same session
        _fix(3, 7, 2200, B),       # gap 700 > 600 -> new session
        _fix(4, 7, 2300, B),
        _fix(5, 9, 1000, C),       # other user: own numbering
    ]
    out = (
        tj.sessionize(spark.createDataFrame(rows, SCHEMA), gap_s=600)
        .select("event_id", "session_id")
        .collect()
    )
    got = {r.event_id: r.session_id for r in out}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_ties_broken_by_id(spark):
    # two fixes in the same (truncated) second: deterministic order by id
    rows = [_fix(2, 1, 1000, B), _fix(1, 1, 1000, A), _fix(3, 1, 5000, C)]
    out = tj.sessionize(
        spark.createDataFrame(rows, SCHEMA), gap_s=600
    ).collect()
    by_id = {r.event_id: r.session_id for r in out}
    assert by_id == {1: 1, 2: 1, 3: 2}


def test_trip_stats_distance_and_speed(spark):
    d_ab = haversine_scalar(A[0], A[1], B[0], B[1])
    rows = [
        _fix(1, 7, 0, A),
        _fix(2, 7, 50, B),
        _fix(3, 7, 100, A),
        _fix(4, 7, 10_000, C),  # gap 9900 > 600 -> second session
    ]
    out = tj.trip_stats(
        spark.createDataFrame(rows, SCHEMA), gap_s=600
    ).orderBy("session_id")
    t1, t2 = out.collect()
    assert (t1.n_fixes, t1.start_s, t1.end_s, t1.duration_s) == (3, 0, 100, 100)
    # two legs A->B->A, each mm-quantized before the sum
    exp = 2 * round(d_ab * 1000.0) / 1000.0
    assert t1.dist_m_r3 == pytest.approx(exp, abs=1e-9)
    assert t1.speed_ms_r3 == pytest.approx(round(exp / 100.0, 3), abs=1e-9)
    # single-fix trip: zero distance, NULL speed (no divide-by-zero)
    assert (t2.n_fixes, t2.dist_m_r3, t2.speed_ms_r3) == (1, 0.0, None)


def test_speed_filter_flags_impossible_jump(spark):
    rows = [
        _fix(1, 7, 0, A),
        _fix(2, 7, 100, B),     # ~100 m in 100 s = ~1 m/s -> ok at 5 m/s
        _fix(3, 7, 200, C),     # ~9.9 km in 100 s = ~99 m/s -> glitch
        _fix(4, 7, 200, C),     # same second: gap clamped to 1 s, leg 0
    ]
    out = tj.speed_filter(
        spark.createDataFrame(rows, SCHEMA), max_speed_ms=5.0
    ).orderBy("event_id").collect()
    assert [r.is_glitch for r in out] == [False, False, True, False]
    assert out[0].speed_ms is None           # first fix: no previous leg
    assert out[1].speed_ms == pytest.approx(1.0, abs=0.1)
    assert out[3].speed_ms == 0.0            # clamped gap, zero leg


def test_stay_points_run_and_centroid(spark):
    rows = [
        _fix(1, 7, 0, A),
        _fix(2, 7, 600, A),      # leg 0 -> continues run
        _fix(3, 7, 1200, B),     # ~100.1 m -> breaks (>= 100 m)
        _fix(4, 7, 1800, B),     # leg 0 -> new run with fix 3
        _fix(5, 7, 2400, C),     # far -> singleton run (filtered, n=1)
    ]
    out = tj.stay_points(
        spark.createDataFrame(rows, SCHEMA), radius_m=100.0, min_fixes=2
    ).orderBy("start_s").collect()
    assert [(r.n_fixes, r.start_s, r.end_s, r.dwell_s) for r in out] == [
        (2, 0, 600, 600),
        (2, 1200, 1800, 600),
    ]
    assert out[0].clat_r6 == pytest.approx(A[0], abs=1e-6)
    assert out[1].clat_r6 == pytest.approx(B[0], abs=1e-6)
    assert out[0].clon_r6 == pytest.approx(A[1], abs=1e-6)


def test_stay_points_chained_drift_documented(spark):
    # chained formulation: 3 fixes each 60 m apart pass pairwise even
    # though end-to-end drift is ~120 m — documented semantics.
    step = 60.0 / 111_194.9  # ~60 m of latitude
    rows = [
        _fix(i, 7, i * 10, (52.0 + i * step, 13.0)) for i in range(1, 4)
    ]
    out = tj.stay_points(
        spark.createDataFrame(rows, SCHEMA), radius_m=100.0, min_fixes=3
    ).collect()
    assert len(out) == 1 and out[0].n_fixes == 3


def test_od_matrix_first_last_binning(spark):
    rows = [
        _fix(1, 7, 0, A),          # trip 1: A -> C
        _fix(2, 7, 50, B),
        _fix(3, 7, 100, C),
        _fix(4, 7, 10_000, C),     # trip 2: C -> C (single fix)
        _fix(5, 9, 0, C),          # other user: C -> A
        _fix(6, 9, 10, A),
    ]
    out = tj.od_matrix(
        spark.createDataFrame(rows, SCHEMA), gap_s=600, zoom=6
    ).collect()
    flows = {
        ((r.o_tx, r.o_ty), (r.d_tx, r.d_ty)): r.n_trips for r in out
    }
    # zoom 6: A and B share a tile; C is ~10 km north but same z6 tile?
    # compute expected tiles directly through the same kernel
    from geogeometry_spark.kernels.tiles import coordinate_to_tile

    def tile(p):
        x, y = coordinate_to_tile(p[0], p[1], 6)
        return (int(x[0]), int(y[0]))

    ta, tc = tile(A), tile(C)
    if ta == tc:
        assert flows == {(ta, ta): 3}
    else:
        assert flows[(ta, tc)] == 1 and flows[(tc, ta)] == 1
        assert flows[(tc, tc)] == 1


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def test_oracle_twins_match_duckdb(spark, duck):
    import pandas as pd

    rows = [
        (i, i % 3, ((i * 137) % 4000) + (i // 3) * 400,
         50.0 + ((i * 31) % 9) * 0.002, 13.0 + ((i * 17) % 9) * 0.002)
        for i in range(90)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("fixes", pdf)
    df = spark.createDataFrame(pdf)

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    # sessionize
    s_spark = tj.sessionize(df, gap_s=500).select(
        "event_id", "session_id"
    ).collect()
    s_duck = duck.sql(
        "SELECT event_id, session_id FROM ("
        + tj.sessionize_oracle_sql("fixes", gap_s=500)
        + ")"
    ).fetchall()
    assert canon(s_spark) == canon(s_duck)
    # trip stats
    t_spark = tj.trip_stats(df, gap_s=500).collect()
    t_duck = duck.sql(tj.trip_stats_oracle_sql("fixes", gap_s=500)).fetchall()
    assert canon(t_spark) == canon(t_duck)
    # speed filter
    v_spark = tj.speed_filter(df, max_speed_ms=0.2).select(
        "event_id", F.round("speed_ms", 6), "is_glitch"
    ).collect()
    v_duck = duck.sql(
        "SELECT event_id, round(speed_ms, 6), is_glitch FROM ("
        + tj.speed_filter_oracle_sql("fixes", max_speed_ms=0.2)
        + ")"
    ).fetchall()
    assert canon(v_spark) == canon(v_duck)
    # stay points
    y_spark = tj.stay_points(df, radius_m=400.0, min_fixes=2).collect()
    y_duck = duck.sql(
        tj.stay_points_oracle_sql("fixes", radius_m=400.0, min_fixes=2)
    ).fetchall()
    assert canon(y_spark) == canon(y_duck)


def test_simplify_trips_matches_kernel(spark):
    """Grouped-map DP simplification == direct kernel call per trip."""
    import numpy as np

    from geogeometry_spark.kernels.transform import simplify_line

    # trip 1: 6 fixes along a line with one 2 km spike in the middle;
    # trip 2 (same user, later): 2 fixes (passthrough)
    line = [
        (52.00, 13.00), (52.01, 13.00), (52.02, 13.02),  # spike
        (52.03, 13.00), (52.04, 13.00), (52.05, 13.00),
    ]
    rows = [(i, 7, i * 60, la, lo) for i, (la, lo) in enumerate(line)]
    rows += [(10, 7, 100_000, 52.5, 13.5), (11, 7, 100_060, 52.6, 13.6)]
    out = tj.simplify_trips(
        spark.createDataFrame(rows, SCHEMA), tolerance_m=500.0, gap_s=600
    ).orderBy("session_id").collect()
    assert [(r.n_in, r.n_out) for r in out] == [
        (
            6,
            len(
                simplify_line(
                    np.array([[lo, la] for la, lo in line]), 500.0
                )
            ),
        ),
        (2, 2),
    ]
    # the spike survives 500 m tolerance; straight-run interior is gone
    t1 = out[0]
    assert t1.n_out < t1.n_in
    assert [13.02, 52.02] in [list(v) for v in t1.line]


def test_simplify_trips_string_user_key(spark):
    rows = [("dev-a", 7, t, 52.0 + t * 1e-5, 13.0) for t in (0, 60, 120)]
    df = spark.createDataFrame(
        rows, "device string, event_id long, ts_sec long, lat double, lon double"
    )
    out = tj.simplify_trips(
        df, tolerance_m=500.0, gap_s=600, user_col="device",
        id_col="event_id",
    ).collect()
    assert [(r.device, r.n_in) for r in out] == [("dev-a", 3)]


# ------------------------------------------------------------- resample

def test_resample_lerp_midpoints(spark):
    rows = [
        (1, 1, 0, 10.0, 20.0),
        (2, 1, 3600, 10.2, 20.4),
    ]
    out = sorted(
        tj.resample_trips(
            spark.createDataFrame(rows, SCHEMA), step_s=1800, gap_s=7200
        ).collect(),
        key=lambda r: r.sample_ts,
    )
    assert [r.sample_ts for r in out] == [0, 1800, 3600]
    assert out[0].lat == 10.0 and out[0].lon == 20.0  # k=0 verbatim
    assert out[1].lat == pytest.approx(10.1, abs=1e-9)
    assert out[1].lon == pytest.approx(20.2, abs=1e-9)
    assert out[2].lat == pytest.approx(10.2, abs=1e-12)


def test_resample_grid_anchored_at_trip_start(spark):
    rows = [(1, 1, 100, 0.0, 0.0), (2, 1, 4000, 0.0, 0.039)]
    ts = sorted(
        r.sample_ts
        for r in tj.resample_trips(
            spark.createDataFrame(rows, SCHEMA), step_s=1800, gap_s=7200
        ).collect()
    )
    assert ts == [100, 1900, 3700]  # t0-anchored, not epoch-aligned


def test_resample_short_leg_and_duplicate_ts(spark):
    # three fixes inside one step: only k=0 emitted; the duplicate
    # timestamp leg (ct == pt) must not divide by zero
    rows = [
        (1, 1, 0, 0.0, 0.0),
        (2, 1, 600, 0.0, 0.001),
        (3, 1, 600, 0.0, 0.002),
        (4, 1, 900, 0.0, 0.003),
    ]
    out = tj.resample_trips(
        spark.createDataFrame(rows, SCHEMA), step_s=1800, gap_s=7200
    ).collect()
    assert [(r.sample_ts, r.lat, r.lon) for r in out] == [(0, 0.0, 0.0)]


def test_resample_sessions_anchor_independently(spark):
    rows = [
        (1, 1, 0, 0.0, 0.0),
        (2, 1, 1800, 0.0, 0.01),
        # 10 h gap > gap_s -> new session with its own t0
        (3, 1, 37800, 5.0, 5.0),
        (4, 1, 39600, 5.0, 5.01),
    ]
    out = tj.resample_trips(
        spark.createDataFrame(rows, SCHEMA), step_s=1800, gap_s=7200
    )
    got = {(r.session_id, r.sample_ts) for r in out.collect()}
    assert got == {(1, 0), (1, 1800), (2, 37800), (2, 39600)}


def test_resample_matches_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    rows = []
    eid = 0
    for u in range(12):
        t = 0
        for i in range(15):
            t += 300 + ((u * 7 + i * 13) % 2400)  # ragged cadence
            if i == 9:
                t += 50_000  # session break mid-stream
            rows.append(
                (eid, u, t, 10.0 + u * 0.1 + i * 0.003, 20.0 + i * 0.005)
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    con = duckdb.connect()
    con.register("fixes", pdf)
    got = sorted(
        tuple(r)
        for r in tj.resample_trips(
            spark.createDataFrame(pdf), step_s=900, gap_s=43200
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            tj.resample_trips_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon FROM fixes)",
                step_s=900,
                gap_s=43200,
            )
        ).fetchall()
    )
    con.close()
    assert len(got) > 50
    assert got == want


class TestMobilityMetrics:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, lon double"
        )

    def test_single_location_user(self, spark):
        from geogeometry_spark.operators.trajectory import mobility_metrics

        pts = self._pts(spark, [(1, i, 52.5, 13.4) for i in range(4)])
        r = mobility_metrics(pts, zoom=14).collect()[0]
        assert r["n_fixes"] == 4 and r["n_cells"] == 1
        assert r["hhi_num"] == 16 and r["hhi"] == 1.0
        # all fixes AT the centroid: rgyr exactly 0
        assert r["sum_sq_m"] == 0 and r["rgyr_m"] == 0.0 and r["max_d_m"] == 0

    def test_two_even_cells_hhi_half(self, spark):
        from geogeometry_spark.operators.trajectory import mobility_metrics

        # two far-apart locations, two fixes each: hhi = (4+4)/16 = 0.5
        pts = self._pts(
            spark,
            [(1, 0, 52.5, 13.4), (1, 1, 52.5, 13.4),
             (1, 2, 48.8, 2.35), (1, 3, 48.8, 2.35)],
        )
        r = mobility_metrics(pts, zoom=14).collect()[0]
        assert r["n_cells"] == 2 and r["hhi"] == 0.5
        # symmetric pair: both distances to the lat/lon-mean centroid
        # are ~half the ~880 km separation; they differ by ~1% at this
        # scale (the arithmetic-mean centroid is not the geodesic
        # midpoint), so rgyr (their RMS) sits between them
        assert 400_000 < r["max_d_m"] < 500_000
        assert abs(r["rgyr_m"] - r["max_d_m"]) / r["max_d_m"] < 0.02

    def test_southern_hemisphere_centroid_parity(self, spark, duck):
        """Negative µdeg sums exercise the div/'//' trunc-toward-zero
        agreement between the engines."""
        import duckdb

        from geogeometry_spark.operators.trajectory import (
            mobility_metrics,
            mobility_metrics_oracle_sql,
        )

        rows = [
            (7, 0, -33.8701, 151.2001),
            (7, 1, -33.8703, 151.2093),
            (7, 2, -33.9001, 151.1807),
            (8, 3, -54.8, -68.3),
            (8, 4, -54.81, -68.31),
        ]
        pts = self._pts(spark, rows)
        got = sorted(
            mobility_metrics(pts, zoom=14).collect(),
            key=lambda r: r["user_id"],
        )
        vals = ", ".join(
            f"({u}, {e}, {la!r}, {lo!r})" for u, e, la, lo in rows
        )
        sql = mobility_metrics_oracle_sql(
            f"(SELECT * FROM (VALUES {vals}) "
            "t(user_id, event_id, lat, lon))",
            zoom=14,
        )
        exp = duckdb.sql(sql + " ORDER BY user_id").fetchall()
        for g, x in zip(got, exp):
            assert tuple(g) == x


class TestHeadingStats:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts_sec long, "
            "lat double, lon double",
        )

    def test_beeline_has_resultant_one(self, spark):
        from geogeometry_spark.operators.trajectory import heading_stats

        # due-east march along the equator: every leg bearing 90
        pts = self._pts(
            spark,
            [(1, i, i * 60, 0.0, 13.0 + i * 0.01) for i in range(5)],
        )
        r = heading_stats(pts).collect()[0]
        assert r["n_legs"] == 4
        assert abs(r["resultant_r"] - 1.0) < 1e-9
        assert abs(r["mean_dir_r7"] - 90.0) < 1e-4
        assert r["circ_var"] < 1e-9

    def test_out_and_back_cancels(self, spark):
        from geogeometry_spark.operators.trajectory import heading_stats

        # east then west the same distance: headings 90 and 270 cancel
        pts = self._pts(
            spark,
            [(1, 0, 0, 0.0, 13.0), (1, 1, 60, 0.0, 13.01),
             (1, 2, 120, 0.0, 13.0)],
        )
        r = heading_stats(pts).collect()[0]
        assert r["n_legs"] == 2
        assert r["resultant_r"] < 1e-6 and r["circ_var"] > 1.0 - 1e-6

    def test_parked_legs_excluded(self, spark):
        from geogeometry_spark.operators.trajectory import heading_stats

        # duplicate fixes contribute no direction; all-parked trip
        # emits no row
        pts = self._pts(
            spark,
            [(1, 0, 0, 0.0, 13.0), (1, 1, 60, 0.0, 13.0),
             (1, 2, 120, 0.0, 13.01),
             (2, 3, 0, 50.0, 8.0), (2, 4, 60, 50.0, 8.0)],
        )
        rows = heading_stats(pts).collect()
        assert len(rows) == 1
        assert rows[0]["user_id"] == 1 and rows[0]["n_legs"] == 1


class TestCellTransitions:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts_sec long, "
            "lat double, lon double",
        )

    def test_parked_runs_collapse(self, spark):
        from geogeometry_spark.operators.trajectory import cell_transitions

        # A A A B B A: visits A,B,A -> transitions A->B, B->A (no
        # self-loops from the parked runs); zoom 10 cells ~0.35 deg
        a, b = (52.5, 13.40), (52.5, 14.40)
        seq = [a, a, a, b, b, a]
        pts = self._pts(
            spark,
            [(1, i, i * 60, p[0], p[1]) for i, p in enumerate(seq)],
        )
        rows = cell_transitions(pts, zoom=10).collect()
        assert len(rows) == 2
        by_pair = {(r["from_cell"], r["to_cell"]): r for r in rows}
        cells = {r["from_cell"] for r in rows} | {
            r["to_cell"] for r in rows
        }
        assert len(cells) == 2
        for r in rows:
            assert r["n_trans"] == 1 and r["from_total"] == 1
            assert r["p"] == 1.0

    def test_session_boundary_breaks_chain(self, spark):
        from geogeometry_spark.operators.trajectory import cell_transitions

        # A then (new session) B: no transition crosses the gap
        a, b = (52.5, 13.40), (52.5, 14.40)
        pts = self._pts(
            spark,
            [(1, 0, 0, a[0], a[1]), (1, 1, 100_000, b[0], b[1])],
        )
        assert cell_transitions(pts, zoom=10, gap_s=3600).count() == 0

    def test_probabilities_sum_to_one_per_origin(self, spark):
        from geogeometry_spark.operators.trajectory import cell_transitions

        # from A: 2x to B, 1x to C -> p = 2/3, 1/3
        a, b, c = (52.5, 13.40), (52.5, 14.40), (52.5, 15.40)
        seq = [a, b, a, c, a, b]
        pts = self._pts(
            spark,
            [(1, i, i * 60, p[0], p[1]) for i, p in enumerate(seq)],
        )
        rows = cell_transitions(pts, zoom=10).collect()
        from collections import defaultdict

        per_from = defaultdict(float)
        for r in rows:
            per_from[r["from_cell"]] += r["p"]
        for s in per_from.values():
            assert abs(s - 1.0) < 1e-12
