"""Unit tests for operators/asof.py: match semantics (at-or-before,
equal-timestamp, duplicate-event collapse, horizon, per-key isolation)
and value parity with DuckDB's native ASOF JOIN."""

from geogeometry_spark.operators.asof import asof_join, asof_join_oracle_sql

EV_SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"
Q_SCHEMA = "query_id long, user_id long, qts long"


def _run(spark, ev_rows, q_rows, horizon=None):
    return sorted(
        tuple(r)
        for r in asof_join(
            spark.createDataFrame(ev_rows, EV_SCHEMA),
            spark.createDataFrame(q_rows, Q_SCHEMA),
            ["lat", "lon"],
            horizon_s=horizon,
        ).collect()
    )


def test_asof_basic_and_equal_ts(spark):
    ev = [(1, 1, 100, 10.0, 20.0), (2, 1, 200, 11.0, 21.0)]
    qs = [(1, 1, 150, None), (2, 1, 200, None), (3, 1, 99, None)]
    qs = [(a, b, c) for a, b, c, _ in qs]
    got = _run(spark, ev, qs)
    # q1 -> event@100; q2 at exactly 200 -> event@200; q3 before any -> dropped
    assert got == [
        (1, 1, 150, 100, 10.0, 20.0),
        (2, 1, 200, 200, 11.0, 21.0),
    ]


def test_asof_duplicate_ts_collapses_to_max_id(spark):
    ev = [(5, 1, 100, 1.0, 1.0), (9, 1, 100, 2.0, 2.0), (7, 1, 100, 3.0, 3.0)]
    got = _run(spark, ev, [(1, 1, 500)])
    assert got == [(1, 1, 500, 100, 2.0, 2.0)]  # id 9 wins


def test_asof_horizon_filters_stale(spark):
    ev = [(1, 1, 100, 1.0, 1.0)]
    qs = [(1, 1, 400), (2, 1, 5000)]
    assert _run(spark, ev, qs, horizon=10_000) == [
        (1, 1, 400, 100, 1.0, 1.0),
        (2, 1, 5000, 100, 1.0, 1.0),
    ]
    assert _run(spark, ev, qs, horizon=1000) == [
        (1, 1, 400, 100, 1.0, 1.0)
    ]


def test_asof_keys_isolated(spark):
    ev = [(1, 1, 100, 1.0, 1.0), (2, 2, 50, 9.0, 9.0)]
    got = _run(spark, ev, [(1, 2, 200)])
    assert got == [(1, 2, 200, 50, 9.0, 9.0)]


def test_asof_matches_duckdb_native_asof(spark):
    import duckdb
    import pandas as pd

    ev_rows, q_rows = [], []
    eid = 0
    for u in range(25):
        t = 0
        for i in range(40):
            t += 60 + (u * 11 + i * 7) % 900
            ev_rows.append(
                (eid, u, t, round(u + i * 0.01, 4), round(u - i * 0.02, 4))
            )
            eid += 1
            if i % 3 == 0:
                q_rows.append((eid * 10, u, t + 37 + (i % 5) * 400))
    ev = pd.DataFrame(
        ev_rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    qs = pd.DataFrame(q_rows, columns=["query_id", "user_id", "qts"])
    con = duckdb.connect()
    con.register("ev", ev)
    con.register("qs", qs)
    got = sorted(
        tuple(r)
        for r in asof_join(
            spark.createDataFrame(ev),
            spark.createDataFrame(qs),
            ["lat", "lon"],
            horizon_s=1200,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            asof_join_oracle_sql(
                "(SELECT * FROM ev)",
                "(SELECT * FROM qs)",
                ["lat", "lon"],
                horizon_s=1200,
            )
        ).fetchall()
    )
    con.close()
    assert len(got) > 200
    assert got == want
