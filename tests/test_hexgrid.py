"""Hexgrid cell index: kernel invariants + three-engine encode parity.

The hexgrid (kernels/hexgrid.py) closes the BASELINE.json north-star
"H3 k-ring" noun; these tests pin the lattice invariants (roundtrip,
disk sizes, hierarchy, antimeridian wrap, covering bounds) and the
numpy == Spark Column == DuckDB oracle parity that the contract
queries rely on.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geogeometry_spark.functions import hexcell as HC
from geogeometry_spark.kernels import geometry as kgeo
from geogeometry_spark.kernels import hexgrid as hg


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(42)
    lat = np.round(rng.uniform(-85.0, 85.001, 30000), 3)
    lon = np.round(rng.uniform(-175.0, 175.0, 30000), 3)
    return lat, lon


# --------------------------------------------------------------------------
# lattice invariants
# --------------------------------------------------------------------------

@pytest.mark.parametrize("res", [0, 5, 9, 12, 20])
def test_center_roundtrip(coords, res):
    lat, lon = coords
    cells = hg.encode_cell(lat, lon, res)
    clat, clon = hg.center_latlon(cells)
    assert np.all(hg.encode_cell(clat, clon, res) == cells)


def test_pack_unpack_roundtrip(coords):
    lat, lon = coords
    for res in (0, 9, 20):
        q, r = hg.encode_axial(lat, lon, res)
        res2, q2, r2 = hg.unpack(hg.pack(res, q, r))
        assert np.all(res2 == res) and np.all(q2 == q) and np.all(r2 == r)
        assert np.all(q >= 0) and np.all(q < hg.ncols(res))


@pytest.mark.parametrize("k", [0, 1, 2, 3, 7])
def test_grid_disk_size_pentagon_free(k):
    c = hg.encode_cell_scalar(52.530888, 13.394904, 9)
    disk = hg.grid_disk(c, k)
    assert len(disk) == 3 * k * (k + 1) + 1
    assert len(set(disk)) == len(disk)
    if k > 0:
        ring = hg.grid_ring(c, k)
        assert len(ring) == 6 * k
        assert all(hg.grid_distance(c, cc) == k for cc in ring)


def test_grid_disk_wraps_antimeridian():
    a = hg.encode_cell_scalar(10.0, 179.999, 6)
    b = hg.encode_cell_scalar(10.0, -179.999, 6)
    assert hg.grid_distance(a, b) <= 1
    assert b in hg.grid_disk(a, 1) and a in hg.grid_disk(b, 1)


def test_seam_continuity_encode():
    # points epsilon either side of the antimeridian land in the same or
    # adjacent cells at every resolution
    for res in (3, 8, 12):
        a = hg.encode_cell_scalar(-33.3, 179.9999, res)
        b = hg.encode_cell_scalar(-33.3, -179.9999, res)
        assert hg.grid_distance(a, b) <= 1


def test_parent_children_exact_inverse(coords):
    lat, lon = coords
    for res in (1, 5, 9):
        cells = np.unique(hg.encode_cell(lat[:2000], lon[:2000], res))
        parents = hg.parent(cells)
        for cell, par in list(zip(cells, parents))[:60]:
            kids = hg.children(int(par))
            assert int(cell) in kids
            assert all(int(hg.parent(np.array([kid]))[0]) == int(par) for kid in kids)
            assert 3 <= len(kids) <= 6


def test_parent_at_chain(coords):
    lat, lon = coords
    cells = hg.encode_cell(lat[:500], lon[:500], 9)
    anc = hg.parent_at(cells, 6)
    step = cells
    for _ in range(3):
        step = hg.parent(step)
    assert np.all(anc == step)


def test_equal_area_and_poles():
    # equal-area: N cells of area A tile the sphere: N*A == sphere area
    # (cells are equal-area by construction; count cells at res 2 by
    # sampling a fine lat/lon grid weighted by cos(lat) is approximate,
    # so instead check the area formula against the projection math)
    for res in (0, 4, 9):
        a = hg.cell_area_m2(res)
        assert a > 0
        assert hg.cell_area_m2(res) == pytest.approx(hg.cell_area_m2(res + 1) * 4, rel=1e-12)
    # poles encode without error and roundtrip
    for lat, lon in [(90.0, 0.0), (-90.0, 17.0), (89.9999, -179.9999)]:
        c = hg.encode_cell_scalar(lat, lon, 7)
        clat, clon = hg.center_latlon(np.array([c]))
        assert hg.encode_cell_scalar(float(clat[0]), float(clon[0]), 7) == c


def test_boundary_hexagon():
    c = hg.encode_cell_scalar(48.1, 11.5, 8)
    verts = hg.boundary_latlon(c)
    assert len(verts) == 6
    clat, clon = hg.center_latlon(np.array([c]))
    # all vertices near the center (within 3 cell sizes on the ground)
    s_m = hg.size(8) * hg.M_PER_DEG * 3
    for vlat, vlon in verts:
        assert kgeo.haversine_scalar(float(clat[0]), float(clon[0]), vlat, vlon) < s_m


# --------------------------------------------------------------------------
# covering bounds (the join-correctness guarantees)
# --------------------------------------------------------------------------

def test_k_for_radius_covers_true_disk():
    rng = np.random.default_rng(7)
    res = 8
    for _ in range(120):
        qlat = float(rng.uniform(-84, 84))
        qlon = float(rng.uniform(-180, 180))
        radius = float(rng.uniform(500, 60000))
        k = hg.k_for_radius(qlat, radius, res)
        disk = set(hg.grid_disk(hg.encode_cell_scalar(qlat, qlon, res), k))
        plat = qlat + rng.uniform(-1.2, 1.2, 120) * radius / hg.M_PER_DEG
        plon = qlon + rng.uniform(-3, 3, 120) * radius / hg.M_PER_DEG
        plat = np.clip(plat, -90, 90)
        plon = ((plon + 180) % 360) - 180
        for pl, pn in zip(plat, plon):
            if kgeo.haversine_scalar(qlat, qlon, float(pl), float(pn)) <= radius:
                assert hg.encode_cell_scalar(float(pl), float(pn), res) in disk


def test_covered_ground_radius_is_lower_bound():
    rng = np.random.default_rng(11)
    for _ in range(60):
        qlat = float(rng.uniform(-80, 80))
        qlon = float(rng.uniform(-180, 180))
        qc = hg.encode_cell_scalar(qlat, qlon, 7)
        for k in (2, 4):
            bound = hg.covered_ground_radius_m(qlat, k, 7)
            disk = set(hg.grid_disk(qc, k))
            plat = np.clip(rng.uniform(qlat - 5, qlat + 5, 80), -90, 90)
            plon = ((qlon + rng.uniform(-5, 5, 80) + 180) % 360) - 180
            for pl, pn in zip(plat, plon):
                if hg.encode_cell_scalar(float(pl), float(pn), 7) not in disk:
                    d = kgeo.haversine_scalar(qlat, qlon, float(pl), float(pn))
                    assert d >= bound


def test_res_for_radius_monotone():
    assert hg.res_for_radius(52.5, 100) > hg.res_for_radius(52.5, 50000)
    for radius in (100, 4000, 50000):
        res = hg.res_for_radius(52.5, radius)
        assert hg.k_for_radius(52.5, radius, res) <= 8


# --------------------------------------------------------------------------
# three-engine parity (numpy == Spark Column == DuckDB oracle)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("res", [0, 9, 15])
def test_encode_parity_three_engines(spark, coords, res):
    lat, lon = coords
    expected = hg.encode_cell(lat, lon, res)
    pdf = pd.DataFrame({"i": np.arange(len(lat)), "lat": lat, "lon": lon})
    got_spark = (
        spark.createDataFrame(pdf)
        .select("i", HC.hex_cell(F.col("lat"), F.col("lon"), res).alias("h"))
        .toPandas()
        .sort_values("i")["h"]
        .to_numpy()
    )
    assert np.array_equal(got_spark, expected)
    con = duckdb.connect()
    con.register("pts", pdf)
    sql = HC.hex_encode_oracle("pts", res, extra_cols="i")
    got_duck = con.execute(f"SELECT hex_id FROM ({sql}) ORDER BY i").fetchnumpy()[
        "hex_id"
    ]
    assert np.array_equal(got_duck, expected)


def test_parent_parity_three_engines(spark, coords):
    lat, lon = coords
    res = 9
    cells = hg.encode_cell(lat, lon, res)
    expected = hg.parent(cells)
    pdf = pd.DataFrame({"i": np.arange(len(lat)), "lat": lat, "lon": lon})
    col = HC.hex_parent(HC.hex_cell(F.col("lat"), F.col("lon"), res), res)
    got_spark = (
        spark.createDataFrame(pdf)
        .select("i", col.alias("p"))
        .toPandas()
        .sort_values("i")["p"]
        .to_numpy()
    )
    assert np.array_equal(got_spark, expected)
    prefix, last, tag = HC.hex_axial_with_stages("pts", res)
    stages, plast, ptag = HC.hex_parent_oracle_stages(
        f"(SELECT *, qw{tag} AS cq, rx{tag} AS cr FROM {last})", res, "p"
    )
    sql = (
        prefix
        + ", "
        + ", ".join(stages)
        + f" SELECT i, {HC.hex_pack_sql(res - 1, f'qw{ptag}', f'rx{ptag}')} AS p "
        f"FROM {plast} ORDER BY i"
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    got_duck = con.execute(sql).fetchnumpy()["p"]
    assert np.array_equal(got_duck, expected)


def test_column_extractors_match_kernel(spark, coords):
    lat, lon = coords
    res = 11
    cells = hg.encode_cell(lat[:5000], lon[:5000], res)
    _, q, r = hg.unpack(cells)
    pdf = pd.DataFrame({"i": np.arange(5000), "c": cells})
    out = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            HC.hex_res(F.col("c")).alias("res"),
            HC.hex_q(F.col("c")).alias("q"),
            HC.hex_r(F.col("c")).alias("r"),
        )
        .toPandas()
        .sort_values("i")
    )
    assert np.all(out["res"].to_numpy() == res)
    assert np.array_equal(out["q"].to_numpy(), q)
    assert np.array_equal(out["r"].to_numpy(), r)


def test_center_latlon_column_matches_kernel(spark, coords):
    lat, lon = coords
    res = 8
    cells = np.unique(hg.encode_cell(lat[:4000], lon[:4000], res))
    klat, klon = hg.center_latlon(cells)
    pdf = pd.DataFrame({"i": np.arange(len(cells)), "c": cells})
    lat_c, lon_c = HC.hex_center_latlon(F.col("c"), res)
    out = (
        spark.createDataFrame(pdf)
        .select("i", lat_c.alias("lat"), lon_c.alias("lon"))
        .toPandas()
        .sort_values("i")
    )
    assert np.allclose(out["lat"].to_numpy(), klat, atol=1e-12)
    assert np.allclose(out["lon"].to_numpy(), klon, atol=1e-12)


def test_hex_boundary_json_matches_kernel(spark):
    import json

    cells = np.array(
        [
            hg.encode_cell_scalar(48.1, 11.5, 8),
            hg.encode_cell_scalar(-33.3, 179.9999, 8),
            hg.encode_cell_scalar(0.0, 0.0, 8),
        ],
        dtype=np.int64,
    )
    pdf = pd.DataFrame({"i": np.arange(len(cells)), "c": cells})
    out = (
        spark.createDataFrame(pdf)
        .select("i", HC.hex_boundary_json(F.col("c"), 8).alias("g"))
        .toPandas()
        .sort_values("i")
    )
    for i, cell in enumerate(cells):
        geo = json.loads(out["g"].iloc[i])
        assert geo["type"] == "Polygon"
        ring = geo["coordinates"][0]
        assert len(ring) == 7 and ring[0] == ring[-1]
        kverts = hg.boundary_latlon(int(cell))
        for (vlon, vlat), (klat, klon) in zip(ring[:6], kverts):
            assert abs(vlat - klat) < 1e-8
            # wrap-aware lon compare
            assert min(abs(vlon - klon), 360 - abs(vlon - klon)) < 1e-8
