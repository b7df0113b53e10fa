"""HMM map matching: Viterbi continuity, parity with the recursive-CTE
twin, and brute-force DP agreement."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geogeometry_spark.operators.hmm_match import (
    _viterbi_trip,
    hmm_match,
    hmm_match_oracle_sql,
    hmm_trip_costs,
)

SEGS_SCHEMA = "seg_id long, alat double, alon double, blat double, blon double"
PTS_SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"


def _grid(spark):
    # two parallel roads + a connector
    return spark.createDataFrame(
        [(1, 52.5000, 13.40, 52.5000, 13.42),
         (2, 52.5012, 13.40, 52.5012, 13.42),
         (3, 52.5000, 13.41, 52.5012, 13.41)],
        SEGS_SCHEMA,
    )


def test_viterbi_kernel_brute_force():
    """Kernel vs exhaustive path enumeration on random-ish lattices."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(7)
    for _ in range(25):
        n = rng.randint(1, 6)
        d, s = [], []
        for _i in range(n):
            k = rng.randint(1, 4)
            d.append(rng.randint(0, 1000, size=k).astype(np.int64))
            s.append(rng.randint(1, 5, size=k).astype(np.int64))
        total, path = _viterbi_trip(d, s, 500)
        best = min(
            sum(d[i][c[i]] for i in range(n))
            + sum(
                500
                for i in range(1, n)
                if s[i][c[i]] != s[i - 1][c[i - 1]]
            )
            for c in itertools.product(*[range(len(x)) for x in d])
        )
        assert total == best
        assert len(path) == n
        # every path element is a real candidate of its fix
        assert all(path[i] in s[i] for i in range(n))


def test_hmm_stays_on_road_where_argmin_flickers(spark):
    """The defining behavior: a fix momentarily nearest to the
    connector must stay matched to the through-road when the switch
    penalty outweighs the emission gain; with penalty 0 it degenerates
    to per-fix argmin and takes the connector."""
    from geogeometry_spark.operators.map_match import map_match

    segs = _grid(spark)
    rows = [
        (1, 7, 0, 52.50005, 13.401),
        (2, 7, 60, 52.50008, 13.405),
        (3, 7, 120, 52.50030, 13.4099),  # nearest = connector 3
        (4, 7, 180, 52.50006, 13.415),
    ]
    pts = spark.createDataFrame(rows, PTS_SCHEMA)
    kw = dict(max_dist_m=150.0, k_candidates=3, max_abs_lat=53.2)
    # memoryless argmin takes the connector on fix 3
    mm = {r.event_id: r.seg_id for r in map_match(
        pts, segs, max_dist_m=150.0, max_abs_lat=53.2).collect()}
    assert mm[3] == 3
    hmm = {r.event_id: r.seg_id for r in hmm_match(
        pts, segs, switch_penalty_m=60.0, **kw).collect()}
    assert hmm == {1: 1, 2: 1, 3: 1, 4: 1}
    free = {r.event_id: r.seg_id for r in hmm_match(
        pts, segs, switch_penalty_m=0.0, **kw).collect()}
    assert free[3] == 3


def test_hmm_trip_costs_matches_recursive_cte_twin(spark):
    """Value parity on a multi-trip, multi-user fixture including
    dropped off-road fixes and a session gap split."""
    segs = _grid(spark)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for i in range(8):
            eid += 1
            rows.append(
                (eid, u, i * 300,
                 52.5000 + 0.0001 * ((eid * 13) % 7),
                 13.401 + 0.002 * i)
            )
        # second session after a > gap hole
        for i in range(4):
            eid += 1
            rows.append(
                (eid, u, 100000 + i * 300,
                 52.5012 + 0.0001 * ((eid * 7) % 5),
                 13.418 - 0.003 * i)
            )
        eid += 1
        rows.append((eid, u, 50000, 10.0, 10.0))  # off-road, dropped
    pts = spark.createDataFrame(rows, PTS_SCHEMA)
    got = sorted(tuple(r) for r in hmm_trip_costs(
        pts, segs, max_dist_m=150.0, k_candidates=3,
        switch_penalty_m=60.0, gap_s=43200, max_abs_lat=53.2,
    ).collect())
    con = duckdb.connect()
    con.register("hpts_t", pts.toPandas())
    con.register("hsegs_t", segs.toPandas())
    want = sorted(tuple(r) for r in con.sql(hmm_match_oracle_sql(
        "(SELECT * FROM hpts_t)", "(SELECT * FROM hsegs_t)",
        max_dist_m=150.0, k_candidates=3, switch_penalty_m=60.0,
        gap_s=43200,
    )).fetchall())
    con.close()
    assert got == want
    assert len(got) == 6  # 2 trips per user, off-road fix in no trip
    # off-road fixes were dropped, not matched
    assert all(n in (8, 4) for (_, _, n, _) in got)


def test_hmm_single_fix_trip(spark):
    segs = _grid(spark)
    pts = spark.createDataFrame(
        [(1, 9, 0, 52.50005, 13.405)], PTS_SCHEMA
    )
    out = hmm_trip_costs(
        pts, segs, max_dist_m=150.0, max_abs_lat=53.2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_fixes == 1
    # cost = the single fix's min emission (~5.5 m -> mm)
    assert 0 < r.total_cost_mm < 150_000


def test_hmm_topk_truncation_parity(spark):
    """k_candidates=1 degenerates to per-fix argmin + forced switch
    penalties; both engines must agree after the same truncation."""
    segs = _grid(spark)
    rows = [(i, 5, i * 60, 52.5000 + 0.00015 * (i % 3), 13.400 + 0.002 * i)
            for i in range(1, 9)]
    pts = spark.createDataFrame(rows, PTS_SCHEMA)
    got = sorted(tuple(r) for r in hmm_trip_costs(
        pts, segs, max_dist_m=150.0, k_candidates=1,
        switch_penalty_m=25.0, max_abs_lat=53.2,
    ).collect())
    con = duckdb.connect()
    con.register("hpts_k", pts.toPandas())
    con.register("hsegs_k", segs.toPandas())
    want = sorted(tuple(r) for r in con.sql(hmm_match_oracle_sql(
        "(SELECT * FROM hpts_k)", "(SELECT * FROM hsegs_k)",
        max_dist_m=150.0, k_candidates=1, switch_penalty_m=25.0,
    )).fetchall())
    con.close()
    assert got == want and len(got) == 1
