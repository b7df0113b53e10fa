"""Unit tests for operators/geofence.py (batch dwell rollup):
transition accounting, session-gap splits, re-entries, row existence,
and the DuckDB twin."""

import pytest

from geogeometry_spark.operators.geofence import (
    geofence_dwell,
    geofence_dwell_oracle_sql,
)

SCHEMA = "event_id long, user_id long, ts_sec long, lat double, lon double"

# unit square fence around (0..1, 0..1), closed (lon, lat) ring
SQUARE = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
FAR = [(50.0, 50.0), (51.0, 50.0), (51.0, 51.0), (50.0, 51.0), (50.0, 50.0)]
FENCES = [("sq", SQUARE), ("far", FAR)]


def _dwell(spark, rows, gap_s=7200):
    return {
        (r.user_id, r.fence_id): (r.dwell_s, r.n_enters)
        for r in geofence_dwell(
            spark.createDataFrame(rows, SCHEMA), FENCES, gap_s=gap_s
        ).collect()
    }


def test_dwell_basic_visit(spark):
    rows = [
        (1, 1, 0, 5.0, 5.0),      # outside
        (2, 1, 100, 0.5, 0.5),    # inside (enter)
        (3, 1, 250, 0.6, 0.6),    # inside  -> leg 150 s counts
        (4, 1, 400, 5.0, 5.0),    # outside (exit)
    ]
    got = _dwell(spark, rows)
    assert got == {(1, "sq"): (150, 1)}


def test_dwell_reentry_counts_visits(spark):
    rows = [
        (1, 1, 0, 0.5, 0.5),
        (2, 1, 60, 0.5, 0.6),
        (3, 1, 120, 5.0, 5.0),
        (4, 1, 180, 0.5, 0.5),
        (5, 1, 300, 0.5, 0.6),
    ]
    got = _dwell(spark, rows)
    assert got == {(1, "sq"): (60 + 120, 2)}


def test_dwell_session_gap_splits(spark):
    # inside before AND after a 10 h hole with gap_s=2 h: the hole leg
    # must NOT count as dwell, and the return is a NEW enter
    rows = [
        (1, 1, 0, 0.5, 0.5),
        (2, 1, 600, 0.5, 0.6),
        (3, 1, 36_600, 0.5, 0.5),
        (4, 1, 37_200, 0.5, 0.6),
    ]
    got = _dwell(spark, rows, gap_s=7200)
    assert got == {(1, "sq"): (600 + 600, 2)}


def test_dwell_never_inside_absent(spark):
    rows = [(1, 7, 0, 20.0, 20.0), (2, 7, 60, 20.0, 20.1)]
    assert _dwell(spark, rows) == {}


def test_dwell_single_inside_fix_zero_dwell(spark):
    rows = [(1, 3, 0, 0.5, 0.5)]
    assert _dwell(spark, rows) == {(3, "sq"): (0, 1)}


def test_dwell_matches_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    rows = []
    eid = 0
    for u in range(20):
        t = 0
        for i in range(30):
            t += 120 + (u * 13 + i * 7) % 600
            if i == 17:
                t += 30_000  # session break
            # walk that wanders across the unit-square boundary
            la = ((u * 31 + i * 17) % 40) / 20.0 - 0.5  # [-0.5, 1.45]
            lo = ((u * 23 + i * 11) % 40) / 20.0 - 0.5
            rows.append((eid, u, t, la, lo))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_sec", "lat", "lon"]
    )
    con = duckdb.connect()
    con.register("fixes", pdf)
    got = sorted(
        tuple(r)
        for r in geofence_dwell(
            spark.createDataFrame(pdf), FENCES, gap_s=7200
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            geofence_dwell_oracle_sql(
                "(SELECT event_id, user_id, ts_sec, lat, lon FROM fixes)",
                FENCES,
                gap_s=7200,
            )
        ).fetchall()
    )
    con.close()
    assert len(got) >= 15
    assert got == want
