"""Unit tests for operators/density.py: KDE grid smoothing (stencil
weights, wrap/pole rules, exact integer mass) and Ripley's K / L
(pair counts per radius, multiplicity collapse, pinned K/L floats,
DuckDB twins for both)."""

import math

import pytest
from pyspark.sql import functions as F

from geogeometry_spark.functions import columns as C
from geogeometry_spark.kernels.geometry import haversine as hav_py
from geogeometry_spark.operators.density import (
    _kde_stencil,
    kde_grid,
    kde_grid_oracle_sql,
    ripley_k,
    ripley_k_oracle_sql,
)

PT_SCHEMA = "event_id long, user_id long, lat double, lon double"


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def test_kde_stencil_shape_and_weights():
    st = _kde_stencil(3, 1.5, 10**9)
    # circular truncation: 29 addresses inside radius 3
    assert len(st) == 29
    w = {(dx, dy): wq for dx, dy, wq in st}
    assert w[(0, 0)] == 10**9
    assert w[(1, 0)] == round(math.exp(-1 / 4.5) * 10**9)
    assert w[(2, 2)] == round(math.exp(-8 / 4.5) * 10**9)
    assert (3, 1) not in w  # d2 = 10 > 9
    # symmetry
    assert w[(1, 2)] == w[(-1, 2)] == w[(2, 1)] == w[(-2, -1)]


def test_kde_single_point_spreads_stencil(spark):
    # one point mid-lattice: output is exactly the 29 stencil
    # addresses, each carrying its own weight as integer mass
    out = kde_grid(
        spark.createDataFrame([(1, 1, 0.0, 0.0)], PT_SCHEMA), zoom=8
    ).collect()
    assert len(out) == 29
    st = {(dx, dy): wq for dx, dy, wq in _kde_stencil(3, 1.5, 10**9)}
    # recover the source cell from the max-weight address
    cx, cy = max(out, key=lambda r: r.density_q).tx, max(
        out, key=lambda r: r.density_q
    ).ty
    for r in out:
        assert r.src_cells == 1
        assert r.density_q == st[(r.tx - cx, r.ty - cy)]
        assert r.kde_r3 == round(r.density_q / 1e9, 3)


def test_kde_antimeridian_wrap_and_pole_edge(spark):
    # point in tile column 0 at the top lattice row: x-addresses wrap
    # to 255, negative y-addresses are dropped
    rows = [(1, 1, 85.0, -179.9)]
    out = kde_grid(spark.createDataFrame(rows, PT_SCHEMA), zoom=8)
    got = out.collect()
    xs = {r.tx for r in got}
    assert xs & {253, 254, 255}, xs  # wrapped column addresses
    assert all(r.ty >= 0 for r in got)
    assert len(got) < 29  # pole edge swallowed some stencil rows


def test_kde_mass_additivity(spark):
    # two points in the SAME cell double every address's mass vs one
    one = kde_grid(
        spark.createDataFrame([(1, 1, 10.0, 10.0)], PT_SCHEMA), zoom=8
    )
    two = kde_grid(
        spark.createDataFrame(
            [(1, 1, 10.0, 10.0), (2, 1, 10.0, 10.0)], PT_SCHEMA
        ),
        zoom=8,
    )
    a = {(r.tx, r.ty): r.density_q for r in one.collect()}
    b = {(r.tx, r.ty): r.density_q for r in two.collect()}
    assert b == {k: 2 * v for k, v in a.items()}


def test_kde_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    for i in range(500):
        rows.append(
            (
                i,
                i % 7,
                ((i * 37) % 160) - 80 + 0.123,
                ((i * 91) % 360) - 180 + 0.456,
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "lat", "lon"]
    )
    duck.register("pts_kde", pdf)
    got = sorted(
        tuple(r)
        for r in kde_grid(spark.createDataFrame(pdf), zoom=6).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            kde_grid_oracle_sql(
                "(SELECT lat, lon FROM pts_kde)", zoom=6
            )
        ).fetchall()
    )
    assert len(got) > 100
    assert got == want


# ---------------------------------------------------------------- Ripley K


def test_ripley_counts_and_formulas(spark):
    # three points on a meridian, ~111 m apart; radii pick up 2 then 3
    # pairs; K/L follow the pinned formulas exactly
    rows = [
        (1, 1, 52.0, 13.0),
        (2, 1, 52.001, 13.0),
        (3, 1, 52.002, 13.0),
    ]
    area = 1.0e6
    out = ripley_k(
        spark.createDataFrame(rows, PT_SCHEMA),
        radii_m=[150.0, 250.0],
        area_m2=area,
        max_abs_lat=53.0,
    ).collect()
    by_r = {r.r_mm: r for r in out}
    d1 = hav_py(52.0, 13.0, 52.001, 13.0)
    assert d1 < 150.0 < 2 * d1 < 250.0
    assert by_r[150000].pairs == 2  # the two adjacent pairs
    assert by_r[250000].pairs == 3  # + the spanning pair
    for r in out:
        assert r.n_points == 3
        k = (area * (2.0 * r.pairs)) / (3.0 * 2.0)
        assert r.k_r3 == round(k, 3)
        assert r.l_r3 == round(
            math.sqrt(k / 3.141592653589793) - r.r_mm / 1000.0, 3
        )


def test_ripley_multiplicity_collapse(spark):
    # 4 coincident points + 1 near neighbor: within-rep pairs = 6 at
    # d=0, cross pairs = 4 * 1
    rows = [(i, 1, 48.0, 11.0) for i in range(4)] + [
        (9, 1, 48.0005, 11.0)
    ]
    out = ripley_k(
        spark.createDataFrame(rows, PT_SCHEMA),
        radii_m=[10.0, 100.0],
        area_m2=1.0e6,
        max_abs_lat=49.0,
    ).collect()
    by_r = {r.r_mm: r for r in out}
    assert by_r[10000].pairs == 6  # only the coincident clique
    assert by_r[100000].pairs == 10  # + 4 cross pairs (~55.6 m)
    assert all(r.n_points == 5 for r in out)


def test_ripley_brute_force_parity(spark):
    # 60 scattered points: pair counts per radius must equal the O(n^2)
    # reference despite the grid-candidate join
    import itertools

    pts = [
        (
            i,
            1,
            52.0 + ((i * 13) % 40) * 0.0007,
            13.0 + ((i * 29) % 50) * 0.0011,
        )
        for i in range(60)
    ]
    radii = [50.0, 150.0, 400.0, 1200.0]
    out = ripley_k(
        spark.createDataFrame(pts, PT_SCHEMA),
        radii_m=radii,
        area_m2=2.0e7,
        max_abs_lat=53.0,
    ).collect()
    by_r = {r.r_mm: r.pairs for r in out}
    for r in radii:
        mm = round(r * 1000.0)
        want = sum(
            1
            for (_, _, la1, lo1), (_, _, la2, lo2) in itertools.combinations(
                pts, 2
            )
            if round(hav_py(la1, lo1, la2, lo2) * 1000.0) <= mm
        )
        assert by_r[mm] == want, (r, by_r[mm], want)


def test_ripley_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                i % 11,
                52.0 + ((i * 17) % 90) * 0.0009,
                13.0 + ((i * 41) % 70) * 0.0013,
            )
        )
    # add coincident clumps so multiplicity paths fire in both engines
    rows += [(1000 + j, 5, 52.01, 13.01) for j in range(5)]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "lat", "lon"]
    )
    duck.register("pts_rip", pdf)
    radii = [100.0, 300.0, 900.0]
    got = sorted(
        tuple(r)
        for r in ripley_k(
            spark.createDataFrame(pdf),
            radii_m=radii,
            area_m2=5.0e7,
            max_abs_lat=53.0,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            ripley_k_oracle_sql(
                "(SELECT event_id, lat, lon FROM pts_rip)",
                radii_m=radii,
                area_m2=5.0e7,
                max_abs_lat=53.0,
            )
        ).fetchall()
    )
    assert got == want


def test_ripley_rejects_empty_and_planetary(spark):
    df = spark.createDataFrame([(1, 1, 0.0, 0.0)], PT_SCHEMA)
    with pytest.raises(ValueError, match="non-empty"):
        ripley_k(df, radii_m=[], area_m2=1.0)
    with pytest.raises(ValueError, match="all-pairs"):
        ripley_k(df, radii_m=[9.0e6], area_m2=1.0)
