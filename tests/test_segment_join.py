"""Unit tests for operators/segment_join.py: the Column/SQL twins of
the reference linesCross formula (pinned against the Python kernel on
branch fixtures AND random segments), join candidates, over-cap
exclusion, and the DuckDB twin."""

import pytest
from pyspark.sql import functions as F

from geogeometry_spark.kernels.geometry import lines_cross as lc_py
from geogeometry_spark.operators.segment_join import (
    lines_cross_col,
    lines_cross_sql,
    segment_join,
    segment_join_oracle_sql,
)

A_SCHEMA = "id_a long, alat1 double, alon1 double, alat2 double, alon2 double"
B_SCHEMA = "id_b long, blat1 double, blon1 double, blat2 double, blon2 double"

# branch fixtures: (seg1, seg2) as (x1,y1,x2,y2,u1,v1,u2,v2)
BRANCH_CASES = [
    (0.0, 0.0, 0.0, 2.0, 0.0, 1.0, 0.0, 3.0),    # both vertical, same x, overlap
    (0.0, 0.0, 0.0, 2.0, 1.0, 0.0, 1.0, 2.0),    # both vertical, different x
    (0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0, 1.0),  # line1 vertical, crossing
    (-1.0, -1.0, 1.0, 1.0, 0.0, -1.0, 0.0, 1.0),  # line2 vertical, crossing
    (0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0, 2.0),    # parallel, distinct intercepts
    (0.0, 0.0, 2.0, 2.0, 1.0, 1.0, 3.0, 3.0),    # collinear, overlapping
    (0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0),    # collinear, disjoint
    (0.0, 0.0, 2.0, 0.0, 1.0, -1.0, 1.0, 1.0),   # general X crossing
    (0.0, 0.0, 2.0, 0.0, 1.0, 0.0, 1.0, 1.0),    # T touch at (1,0)
    (0.0, 0.0, 2.0, 0.0, 3.0, -1.0, 3.0, 1.0),   # disjoint
]


def _rand_cases(n=300):
    # deterministic pseudo-random segments, mixed scales
    cases = []
    s = 12345
    for _ in range(n):
        vals = []
        for _ in range(8):
            s = (s * 1103515245 + 12345) % (1 << 31)
            vals.append(((s % 2001) - 1000) / 250.0)
        cases.append(tuple(vals))
    return cases


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def test_lines_cross_col_matches_kernel(spark):
    cases = BRANCH_CASES + _rand_cases()
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i long, x1 double, y1 double, x2 double, y2 double, "
        "u1 double, v1 double, u2 double, v2 double",
    )
    got = {
        r.i: bool(r.c)
        for r in df.select(
            "i",
            lines_cross_col(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                F.col("u1"), F.col("v1"), F.col("u2"), F.col("v2"),
            ).alias("c"),
        ).collect()
    }
    want = {i: lc_py(*c) for i, c in enumerate(cases)}
    assert got == want
    # the fixture list must exercise both outcomes
    assert any(want.values()) and not all(want.values())


def test_lines_cross_sql_matches_kernel(duck):
    cases = BRANCH_CASES + _rand_cases()
    expr = lines_cross_sql("x1", "y1", "x2", "y2", "u1", "v1", "u2", "v2")
    vals = ", ".join(
        f"({i}, {', '.join(repr(v) for v in c)})"
        for i, c in enumerate(cases)
    )
    rows = duck.sql(
        f"SELECT i, {expr} AS c FROM (VALUES {vals}) "
        "AS t(i, x1, y1, x2, y2, u1, v1, u2, v2)"
    ).fetchall()
    got = {i: bool(c) for i, c in rows}
    want = {i: lc_py(*c) for i, c in enumerate(cases)}
    assert got == want


def test_segment_join_basic(spark):
    # X crossing, T touch, and a disjoint pair
    a = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 0.0, 0.02),    # along lon at lat 0
            (2, 10.0, 10.0, 10.0, 10.02),
            (3, 50.0, 50.0, 50.0, 50.01),
        ],
        A_SCHEMA,
    )
    b = spark.createDataFrame(
        [
            (100, -0.01, 0.01, 0.01, 0.01),    # crosses segment 1
            (200, 10.0, 10.02, 10.01, 10.02),  # touches endpoint of 2
            (300, 60.0, 60.0, 60.0, 60.01),    # far away
        ],
        B_SCHEMA,
    )
    got = {(r.id_a, r.id_b) for r in segment_join(a, b).collect()}
    assert got == {(1, 100), (2, 200)}


def test_segment_join_overcap_excluded(spark):
    # a near-global segment exceeds max_cells at precision 6 and is
    # excluded (the documented radius_join_bulk convention), so even a
    # certain crossing produces no row
    a = spark.createDataFrame([(1, 0.0, -170.0, 0.0, 170.0)], A_SCHEMA)
    b = spark.createDataFrame([(9, -1.0, 0.0, 1.0, 0.0)], B_SCHEMA)
    assert segment_join(a, b, precision=6).count() == 0
    # at a coarse enough precision the same pair is found
    assert segment_join(a, b, precision=1).count() == 1


def test_segment_join_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows_a, rows_b = [], []
    for i in range(250):
        lat = ((i * 37) % 140) - 70 + 0.5
        lon = ((i * 53) % 340) - 170 + 0.5
        rows_a.append(
            (i, lat, lon,
             lat + ((i * 7) % 21 - 10) / 1000.0,
             lon + ((i * 11) % 21 - 10) / 1000.0)
        )
        if i % 2 == 0:
            rows_b.append(
                (i, lat + 0.002, lon - 0.004,
                 lat + ((i * 13) % 25 - 12) / 1000.0,
                 lon + ((i * 17) % 25 - 12) / 1000.0)
            )
    pa = pd.DataFrame(
        rows_a, columns=["id_a", "alat1", "alon1", "alat2", "alon2"]
    )
    pb = pd.DataFrame(
        rows_b, columns=["id_b", "blat1", "blon1", "blat2", "blon2"]
    )
    duck.register("sega", pa)
    duck.register("segb", pb)
    got = sorted(
        tuple(r)
        for r in segment_join(
            spark.createDataFrame(pa), spark.createDataFrame(pb)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            segment_join_oracle_sql(
                "(SELECT * FROM sega)", "(SELECT * FROM segb)"
            )
        ).fetchall()
    )
    assert len(got) > 5
    assert got == want
