"""Unit tests for operators/traj_similarity.py (Hausdorff trip-pair
join): hand-built routes, threshold behavior, asymmetric-direction
coverage, over-cap exclusion, and the DuckDB twin."""

import pytest
from pyspark.sql import functions as F

from geogeometry_spark.kernels.geometry import haversine as hav_py
from geogeometry_spark.operators.traj_similarity import (
    hausdorff_join,
    hausdorff_join_oracle_sql,
)

SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"
GAP = 3600


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def _route(eid0, uid, ts0, pts):
    return [
        (eid0 + i, uid, ts0 + 60 * i, lat, lon)
        for i, (lat, lon) in enumerate(pts)
    ]


def test_hausdorff_parallel_routes(spark):
    # user 1: west->east leg at lat 52.0; user 2: same leg shifted
    # ~111 m north (qualifies at tau 500); user 3: shifted ~1.1 km
    # north (excluded)
    leg = [(52.0, 13.0 + 0.002 * i) for i in range(10)]
    rows = (
        _route(100, 1, 0, leg)
        + _route(200, 2, 0, [(la + 0.001, lo) for la, lo in leg])
        + _route(300, 3, 0, [(la + 0.01, lo) for la, lo in leg])
    )
    out = hausdorff_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=500.0, gap_s=GAP
    ).collect()
    pairs = {(r.user_a, r.user_b): r for r in out}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert (r.n_a, r.n_b) == (10, 10)
    # every point's nearest counterpart is the laterally shifted twin
    want_mm = round(hav_py(52.0, 13.0, 52.001, 13.0) * 1000.0)
    assert r.hausdorff_mm == want_mm
    assert r.hausdorff_mm <= 500_000


def test_hausdorff_direction_asymmetry(spark):
    # trip A is a strict prefix of trip B: h(A,B) = 0 but h(B,A) is
    # B's overhang — the symmetric max must see it
    leg = [(10.0, 20.0 + 0.002 * i) for i in range(5)]
    ext = leg + [(10.0, 20.0 + 0.002 * i) for i in range(5, 8)]
    rows = _route(100, 1, 0, leg) + _route(200, 2, 0, ext)
    df = spark.createDataFrame(rows, SCHEMA)
    # tau 500 m: overhang is ~660 m -> excluded
    assert hausdorff_join(df, tau_m=500.0, gap_s=GAP).count() == 0
    # tau 700 m: included, hausdorff = overhang distance
    out = hausdorff_join(df, tau_m=700.0, gap_s=GAP).collect()
    assert len(out) == 1
    want_mm = round(hav_py(10.0, 20.008, 10.0, 20.014) * 1000.0)
    assert out[0].hausdorff_mm == want_mm


def test_hausdorff_same_user_sessions(spark):
    # one user, two sessions 2 h apart at the same spot -> the pair is
    # (user, session) keyed, session_a < session_b
    rows = _route(100, 5, 0, [(0.0, 0.0), (0.0, 0.001)]) + _route(
        200, 5, 10_000, [(0.0, 0.0005), (0.0, 0.0015)]
    )
    out = hausdorff_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=500.0, gap_s=GAP
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_a == 5 and r.user_b == 5
    assert r.session_a < r.session_b


def test_hausdorff_overcap_trip_excluded(spark):
    long_leg = [(30.0, 40.0 + 0.00001 * i) for i in range(20)]
    rows = _route(100, 1, 0, long_leg) + _route(
        500, 2, 0, [(30.0, 40.0), (30.0, 40.0002)]
    )
    df = spark.createDataFrame(rows, SCHEMA)
    # cap below trip-1 length: the would-be pair disappears
    assert hausdorff_join(
        df, tau_m=500.0, gap_s=GAP, max_trip_fixes=10
    ).count() == 0
    assert hausdorff_join(
        df, tau_m=500.0, gap_s=GAP, max_trip_fixes=32
    ).count() == 1


def test_hausdorff_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    eid = 0
    for u in range(30):
        base_lat = ((u * 37) % 100) - 50 + 0.5
        base_lon = ((u * 53) % 300) - 150 + 0.5
        for s in range(2):
            for i in range(8):
                rows.append(
                    (
                        eid,
                        u,
                        s * 50_000 + 60 * i,
                        base_lat + (u % 3) * 0.001,
                        base_lon + 0.002 * i + (s % 2) * 0.0005,
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("fixes", pdf)
    got = sorted(
        tuple(r)
        for r in hausdorff_join(
            spark.createDataFrame(pdf), tau_m=500.0, gap_s=GAP
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            hausdorff_join_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon FROM fixes)",
                tau_m=500.0,
                gap_s=GAP,
            )
        ).fetchall()
    )
    assert len(got) >= 30  # every user's two sessions pair up
    assert got == want


# ---------------------------------------------------------------- Fréchet

from geogeometry_spark.operators.traj_similarity import (  # noqa: E402
    frechet_join,
    frechet_join_oracle_sql,
)


def _ref_frechet_mm(a_pts, b_pts):
    """Independent O(n*m) scalar DP (textbook recurrence, no
    vectorization) pinning the operator's anti-diagonal kernel."""
    import numpy as np

    d = [
        [
            int(np.floor(hav_py(ala, alo, bla, blo) * 1000.0 + 0.5))
            for bla, blo in b_pts
        ]
        for ala, alo in a_pts
    ]
    c = {}
    for i in range(len(a_pts)):
        for j in range(len(b_pts)):
            preds = [
                c[p]
                for p in ((i - 1, j), (i, j - 1), (i - 1, j - 1))
                if p[0] >= 0 and p[1] >= 0
            ]
            c[(i, j)] = max(d[i][j], min(preds)) if preds else d[i][j]
    return c[(len(a_pts) - 1, len(b_pts) - 1)]


def test_frechet_order_awareness(spark):
    # both trips visit the SAME 7 points (Hausdorff would be 0), but B
    # scrambles the order — the coupled walk must pay for the jumps
    xs = [0, 1, 2, 3, 4, 5, 6]
    a_pts = [(0.0, 10.0 + 0.001 * x) for x in xs]
    b_pts = [(0.0, 10.0 + 0.001 * x) for x in (0, 6, 1, 5, 2, 4, 3)]
    rows = _route(100, 1, 0, a_pts) + _route(200, 2, 0, b_pts)
    out = frechet_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=800.0, gap_s=GAP
    ).collect()
    assert len(out) == 1
    want = _ref_frechet_mm(a_pts, b_pts)
    assert out[0].frechet_mm == want
    assert want > 0  # order-aware: point sets are identical


def test_frechet_parallel_and_far_routes(spark):
    leg = [(52.0, 13.0 + 0.002 * i) for i in range(10)]
    rows = (
        _route(100, 1, 0, leg)
        + _route(200, 2, 0, [(la + 0.001, lo) for la, lo in leg])
        + _route(300, 3, 0, [(la + 0.01, lo) for la, lo in leg])
    )
    out = frechet_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=500.0, gap_s=GAP
    ).collect()
    pairs = {(r.user_a, r.user_b): r for r in out}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert (r.n_a, r.n_b) == (10, 10)
    # lockstep coupling: dF is exactly the lateral shift
    import numpy as np

    want = int(np.floor(hav_py(52.0, 13.0, 52.001, 13.0) * 1000.0 + 0.5))
    assert r.frechet_mm == want


def test_frechet_prefix_tail_prefilter(spark):
    # A is a strict prefix of B: heads coincide but B overhangs ~660 m,
    # and d(tail_a, tail_b) <= dF makes the tail prefilter exact
    leg = [(10.0, 20.0 + 0.002 * i) for i in range(5)]
    ext = leg + [(10.0, 20.0 + 0.002 * i) for i in range(5, 8)]
    rows = _route(100, 1, 0, leg) + _route(200, 2, 0, ext)
    df = spark.createDataFrame(rows, SCHEMA)
    assert frechet_join(df, tau_m=500.0, gap_s=GAP).count() == 0
    out = frechet_join(df, tau_m=700.0, gap_s=GAP).collect()
    assert len(out) == 1
    assert out[0].frechet_mm == _ref_frechet_mm(leg, ext)


def test_frechet_antimeridian_pair(spark):
    # heads on opposite sides of lon 180: candidate ring must x-wrap
    a_pts = [(0.0, 179.999), (0.0, 179.9995)]
    b_pts = [(0.0, -179.9995), (0.0, -179.999)]
    rows = _route(100, 1, 0, a_pts) + _route(200, 2, 0, b_pts)
    out = frechet_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=500.0, gap_s=GAP
    ).collect()
    assert len(out) == 1
    assert out[0].frechet_mm == _ref_frechet_mm(a_pts, b_pts)


def test_frechet_overcap_trip_excluded(spark):
    long_leg = [(30.0, 40.0 + 0.00001 * i) for i in range(20)]
    rows = _route(100, 1, 0, long_leg) + _route(
        500, 2, 0, [(30.0, 40.0), (30.0, 40.0002)]
    )
    df = spark.createDataFrame(rows, SCHEMA)
    assert frechet_join(
        df, tau_m=500.0, gap_s=GAP, max_trip_fixes=10
    ).count() == 0
    assert frechet_join(
        df, tau_m=500.0, gap_s=GAP, max_trip_fixes=32
    ).count() == 1


def test_frechet_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    eid = 0
    for u in range(30):
        base_lat = ((u * 37) % 100) - 50 + 0.5
        base_lon = ((u * 53) % 300) - 150 + 0.5
        for s in range(2):
            n_fix = 6 + (u + s) % 4  # asymmetric trip lengths
            for i in range(n_fix):
                rows.append(
                    (
                        eid,
                        u,
                        s * 50_000 + 60 * i,
                        base_lat + (u % 3) * 0.001,
                        base_lon + 0.002 * i + (s % 2) * 0.0005,
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("fixes", pdf)
    got = sorted(
        tuple(r)
        for r in frechet_join(
            spark.createDataFrame(pdf), tau_m=500.0, gap_s=GAP
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            frechet_join_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon FROM fixes)",
                tau_m=500.0,
                gap_s=GAP,
            )
        ).fetchall()
    )
    assert len(got) >= 20  # most users' session pairs qualify
    assert got == want


# ---------------------------------------------------------- route clusters

from geogeometry_spark.operators.traj_similarity import (  # noqa: E402
    route_clusters,
    route_clusters_oracle_sql,
)


def test_route_clusters_groups_and_singletons(spark):
    leg = [(52.0, 13.0 + 0.002 * i) for i in range(8)]
    rows = (
        _route(100, 1, 0, leg)
        + _route(200, 2, 0, [(la + 0.001, lo) for la, lo in leg])
        + _route(300, 3, 0, [(la + 0.002, lo) for la, lo in leg])
        # far-away singleton: no qualifying twin -> absent from output
        + _route(400, 9, 0, [(10.0, 10.0), (10.0, 10.002)])
    )
    out = route_clusters(
        spark.createDataFrame(rows, SCHEMA), tau_m=500.0, gap_s=GAP
    ).collect()
    got = {r.trip: r.route_id for r in out}
    # users 1-3 chain into ONE route component labeled by the min key
    assert got == {"1:1": "1:1", "2:1": "1:1", "3:1": "1:1"}


def test_route_clusters_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    eid = 0
    for u in range(24):
        base_lat = ((u * 41) % 90) - 45 + 0.5
        base_lon = ((u * 59) % 280) - 140 + 0.5
        for s in range(2):
            for i in range(6):
                rows.append(
                    (
                        eid, u, s * 50_000 + 60 * i,
                        base_lat + (u % 2) * 0.0007,
                        base_lon + 0.002 * i,
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("fixes", pdf)
    got = sorted(
        tuple(r)
        for r in route_clusters(
            spark.createDataFrame(pdf), tau_m=500.0, gap_s=GAP
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            route_clusters_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon FROM fixes)",
                tau_m=500.0,
                gap_s=GAP,
            )
        ).fetchall()
    )
    assert len(got) >= 40
    assert got == want


# ------------------------------------------------------------------- DTW

from geogeometry_spark.operators.traj_similarity import (  # noqa: E402
    dtw_join,
    dtw_join_oracle_sql,
)


def _ref_dtw_mm(a_pts, b_pts):
    """Independent O(n*m) scalar DP (textbook recurrence) pinning the
    operator's clamped anti-diagonal kernel."""
    import numpy as np

    d = [
        [
            int(np.floor(hav_py(ala, alo, bla, blo) * 1000.0 + 0.5))
            for bla, blo in b_pts
        ]
        for ala, alo in a_pts
    ]
    c = {}
    for i in range(len(a_pts)):
        for j in range(len(b_pts)):
            preds = [
                c[p]
                for p in ((i - 1, j), (i, j - 1), (i - 1, j - 1))
                if p[0] >= 0 and p[1] >= 0
            ]
            c[(i, j)] = d[i][j] + (min(preds) if preds else 0)
    return c[(len(a_pts) - 1, len(b_pts) - 1)]


def test_dtw_lockstep_parallel_routes(spark):
    # laterally shifted twin: optimal alignment is the diagonal, so
    # DTW is exactly n * shift; the 1.1 km-shifted third user busts
    # any sane total budget
    leg = [(52.0, 13.0 + 0.002 * i) for i in range(10)]
    rows = (
        _route(100, 1, 0, leg)
        + _route(200, 2, 0, [(la + 0.001, lo) for la, lo in leg])
        + _route(300, 3, 0, [(la + 0.01, lo) for la, lo in leg])
    )
    out = dtw_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=2000.0, gap_s=GAP
    ).collect()
    pairs = {(r.user_a, r.user_b): r for r in out}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert (r.n_a, r.n_b) == (10, 10)
    import numpy as np

    step = int(np.floor(hav_py(52.0, 13.0, 52.001, 13.0) * 1000.0 + 0.5))
    assert r.dtw_mm == 10 * step == _ref_dtw_mm(
        leg, [(la + 0.001, lo) for la, lo in leg]
    )


def test_dtw_integrates_detour_frechet_ignores(spark):
    # one brief detour: Frechet pays only the worst step, DTW pays the
    # whole excursion - the two operators disagree by design
    leg = [(0.0, 10.0 + 0.001 * i) for i in range(8)]
    detour = [
        (la + (0.003 if i in (3, 4) else 0.0), lo)
        for i, (la, lo) in enumerate(leg)
    ]
    rows = _route(100, 1, 0, leg) + _route(200, 2, 0, detour)
    df = spark.createDataFrame(rows, SCHEMA)
    want = _ref_dtw_mm(leg, detour)
    fr = frechet_join(df, tau_m=400.0, gap_s=GAP).collect()
    assert len(fr) == 1  # worst coupled step ~334 m: Frechet accepts
    assert dtw_join(df, tau_m=400.0, gap_s=GAP).count() == 0
    out = dtw_join(df, tau_m=1000.0, gap_s=GAP).collect()
    assert len(out) == 1 and out[0].dtw_mm == want
    assert want > fr[0].frechet_mm  # the integral sees both detour legs


def test_dtw_long_trips_pin_clamped_kernel(spark):
    # 40x31 grid: dozens of anti-diagonals exercise the INF clamp and
    # garbage-cell containment against the scalar reference
    a_pts = [(45.0, 7.0 + 0.0005 * i) for i in range(40)]
    b_pts = [
        (45.0 + 0.0002 * ((i * 7) % 3), 7.0 + 0.00065 * i)
        for i in range(31)
    ]
    rows = _route(100, 1, 0, a_pts) + _route(900, 2, 0, b_pts)
    out = dtw_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=5000.0, gap_s=GAP
    ).collect()
    assert len(out) == 1
    assert out[0].dtw_mm == _ref_dtw_mm(a_pts, b_pts)


def test_dtw_corner_budget_excludes(spark):
    # same head, far tail: d(tail,tail) alone exceeds the budget, so
    # the pair must be gone even though heads coincide
    a_pts = [(20.0, 30.0), (20.0, 30.001)]
    b_pts = [(20.0, 30.0), (20.0, 30.001), (20.0, 30.02)]
    rows = _route(100, 1, 0, a_pts) + _route(200, 2, 0, b_pts)
    df = spark.createDataFrame(rows, SCHEMA)
    assert dtw_join(df, tau_m=1000.0, gap_s=GAP).count() == 0
    out = dtw_join(df, tau_m=3000.0, gap_s=GAP).collect()
    assert len(out) == 1 and out[0].dtw_mm == _ref_dtw_mm(a_pts, b_pts)


def test_dtw_antimeridian_pair(spark):
    a_pts = [(0.0, 179.999), (0.0, 179.9995)]
    b_pts = [(0.0, -179.9995), (0.0, -179.999)]
    rows = _route(100, 1, 0, a_pts) + _route(200, 2, 0, b_pts)
    out = dtw_join(
        spark.createDataFrame(rows, SCHEMA), tau_m=1000.0, gap_s=GAP
    ).collect()
    assert len(out) == 1
    assert out[0].dtw_mm == _ref_dtw_mm(a_pts, b_pts)


def test_dtw_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    eid = 0
    for u in range(30):
        base_lat = ((u * 37) % 100) - 50 + 0.5
        base_lon = ((u * 53) % 300) - 150 + 0.5
        for s in range(2):
            n_fix = 6 + (u + s) % 4
            for i in range(n_fix):
                rows.append(
                    (
                        eid,
                        u,
                        s * 50_000 + 60 * i,
                        base_lat + (u % 3) * 0.001,
                        base_lon + 0.002 * i + (s % 2) * 0.0005,
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("fixes_dtw", pdf)
    got = sorted(
        tuple(r)
        for r in dtw_join(
            spark.createDataFrame(pdf), tau_m=3000.0, gap_s=GAP
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            dtw_join_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon "
                "FROM fixes_dtw)",
                tau_m=3000.0,
                gap_s=GAP,
            )
        ).fetchall()
    )
    assert len(got) >= 20
    assert got == want


# --------------------------------------------------------------------------
# LCSS / EDR threshold-match joins
# --------------------------------------------------------------------------

def _lcss_brute(a, b, eps_mm):
    """Textbook O(nm) LCSS on mm-rounded haversine matches."""
    import math as _m

    from geogeometry_spark.kernels.geometry import haversine as _hav

    n, m = len(a), len(b)
    c = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d = _m.floor(
                _hav(a[i - 1][0], a[i - 1][1], b[j - 1][0], b[j - 1][1])
                * 1000.0
                + 0.5
            )
            if d <= eps_mm:
                c[i][j] = c[i - 1][j - 1] + 1
            else:
                c[i][j] = max(c[i - 1][j], c[i][j - 1])
    return c[n][m]


def _edr_brute(a, b, eps_mm):
    import math as _m

    from geogeometry_spark.kernels.geometry import haversine as _hav

    n, m = len(a), len(b)
    c = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        c[i][0] = i
    for j in range(m + 1):
        c[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d = _m.floor(
                _hav(a[i - 1][0], a[i - 1][1], b[j - 1][0], b[j - 1][1])
                * 1000.0
                + 0.5
            )
            sub = 0 if d <= eps_mm else 1
            c[i][j] = min(
                c[i - 1][j] + 1, c[i][j - 1] + 1, c[i - 1][j - 1] + sub
            )
    return c[n][m]


def _dp_kernels_random_cases():
    import numpy as np

    from geogeometry_spark.kernels.geometry import haversine as _hav

    rng_pts = []
    for seed in (3, 7, 11):
        a = [
            (52.0 + ((seed * i * 13) % 40) * 0.0005,
             13.0 + ((seed * i * 29) % 50) * 0.0008)
            for i in range(1, 8 + seed % 4)
        ]
        b = [
            (52.0 + ((seed * i * 17 + 5) % 40) * 0.0005,
             13.0 + ((seed * i * 31 + 2) % 50) * 0.0008)
            for i in range(1, 11 - seed % 3)
        ]
        a_la = np.array([p[0] for p in a])
        a_lo = np.array([p[1] for p in a])
        b_la = np.array([p[0] for p in b])
        b_lo = np.array([p[1] for p in b])
        d = np.floor(
            _hav(a_la[:, None], a_lo[:, None], b_la[None, :], b_lo[None, :])
            * 1000.0
            + 0.5
        ).astype(np.int64)
        rng_pts.append((a, b, d))
    return rng_pts


def test_lcss_edr_kernels_match_textbook_dp():
    from geogeometry_spark.operators.traj_similarity import (
        _edr_dp_edits,
        _lcss_dp_len,
    )

    for a, b, d in _dp_kernels_random_cases():
        for eps_mm in (20_000, 60_000, 150_000):
            assert _lcss_dp_len(d, eps_mm) == _lcss_brute(a, b, eps_mm)
            assert _edr_dp_edits(d, eps_mm) == _edr_brute(a, b, eps_mm)


def _mk_traj_rows():
    """Two users, same route (one noisy detour), one far-away user."""
    rows = []
    base = 1_700_000_000
    for i in range(8):
        rows.append((100 + i, 1, base + i * 60,
                     52.0 + i * 0.001, 13.0 + i * 0.001))
        la = 52.0 + i * 0.001 + (0.02 if i == 4 else 0.00004)
        rows.append((200 + i, 2, base + i * 60, la,
                     13.0 + i * 0.001 + 0.00004))
    for i in range(6):
        rows.append((300 + i, 3, base + i * 60, -30.0, 100.0 + i * 0.001))
    return rows


TRJ_SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"


def test_lcss_join_noise_robustness(spark):
    from geogeometry_spark.operators.traj_similarity import lcss_join

    df = spark.createDataFrame(_mk_traj_rows(), TRJ_SCHEMA)
    out = lcss_join(df, eps_m=100.0, min_sim=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_a"], r["user_b"]) == (1, 2)
    # 7 of 8 fixes match (the detour fix fails): sim = 7/8
    assert r["lcss"] == 7
    assert r["lcss_sim_r6"] == 0.875


def test_edr_join_counts_detour_edits(spark):
    from geogeometry_spark.operators.traj_similarity import edr_join

    df = spark.createDataFrame(_mk_traj_rows(), TRJ_SCHEMA)
    out = edr_join(df, eps_m=100.0, max_edits=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_a"], r["user_b"]) == (1, 2)
    assert r["edr"] == 1  # one substitution fixes the detour


def test_lcss_edr_twin_parity(spark, duck):
    import pandas as pd

    from geogeometry_spark.operators.traj_similarity import (
        edr_join,
        edr_join_oracle_sql,
        lcss_join,
        lcss_join_oracle_sql,
    )

    rows = _mk_traj_rows()
    # two extra same-user sessions (>12 h apart) for multi-trip users
    rows += [
        (400 + i, 1, 1_700_100_000 + i * 60,
         52.0 + i * 0.0012, 13.0 + i * 0.0009)
        for i in range(5)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    duck.register("trj_lcss", pdf)
    df = spark.createDataFrame(pdf)
    sub = "(SELECT event_id, user_id, ts_sec, lat, lon FROM trj_lcss)"
    got = sorted(
        tuple(r) for r in lcss_join(df, eps_m=150.0, min_sim=0.3).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            lcss_join_oracle_sql(sub, eps_m=150.0, min_sim=0.3)
        ).fetchall()
    )
    assert got == want
    assert got  # non-degenerate
    got_e = sorted(
        tuple(r) for r in edr_join(df, eps_m=150.0, max_edits=6).collect()
    )
    want_e = sorted(
        tuple(r)
        for r in duck.sql(
            edr_join_oracle_sql(sub, eps_m=150.0, max_edits=6)
        ).fetchall()
    )
    assert got_e == want_e
    assert got_e
