"""Zonal statistics: tile-space crossing parity + composition."""

import duckdb
import pandas as pd
import pytest

from geogeometry_spark.operators.zonal import (
    _crossing_sql,
    _tile_space_ring,
    rasterize,
    zonal_stats,
    zonal_stats_oracle_sql,
)


def test_tile_space_ring_projection():
    # lon 0 at z1 -> x = 1.0; equator -> y = 1.0 (continuous coords)
    pts = _tile_space_ring([(0.0, 0.0), (0.0, 10.0), (10.0, 0.0),
                            (0.0, 0.0)], 1)
    assert pts[0] == (1.0, 1.0)
    assert pts[2][0] > pts[0][0]      # east -> larger x
    assert pts[1][1] < pts[0][1]      # north -> smaller y


def test_antimeridian_ring_rejected():
    ring = [(179.0, 10.0), (-179.0, 10.0), (-179.0, 11.0),
            (179.0, 11.0), (179.0, 10.0)]
    with pytest.raises(ValueError, match="antimeridian"):
        _tile_space_ring(ring, 10)


def test_zonal_membership_exact(spark):
    # z2 world: tile (1,1) covers lon [-90,0), lat ~[0,66.5); build a
    # zone that is exactly the lon/lat box containing that tile's
    # center and check only tile (1,1) lands in it
    pts = pd.DataFrame(
        {
            "lat": [40.0, 40.0, -40.0, 40.0],
            "lon": [-45.0, 45.0, -45.0, -46.0],
        }
    )
    df = spark.createDataFrame(pts)
    zone = [(-90.0, 5.0), (0.0, 5.0), (0.0, 60.0), (-90.0, 60.0),
            (-90.0, 5.0)]
    out = zonal_stats(
        rasterize(df, 2), [("west_box", zone)], 2
    ).collect()
    assert len(out) == 1
    r = out[0]
    # tile (1,1) holds the two lat-40 western points; (2,1) and (1,2)
    # fall outside the zone's tile-center test at z2
    assert r.zone_id == "west_box"
    assert r.n_tiles == 1 and r.total_val == 2
    assert r.mean_val_r3 == 2.0


def test_zonal_overlapping_zones_and_twin(spark):
    # deterministic lattice with duplicates; two overlapping boxes and
    # a diamond — every tuple must match the DuckDB twin exactly
    rows = []
    for i in range(4000):
        rows.append(
            (52.0 + (i * 17 % 97) / 100.0, 13.0 + (i * 31 % 181) / 100.0)
        )
    pdf = pd.DataFrame(rows, columns=["lat", "lon"])
    zones = [
        ("a", [(13.0, 52.0), (14.0, 52.0), (14.0, 53.0), (13.0, 53.0),
               (13.0, 52.0)]),
        ("b", [(13.5, 52.0), (14.8, 52.0), (14.8, 53.0), (13.5, 53.0),
               (13.5, 52.0)]),
        ("diamond", [(13.5, 52.5), (14.0, 52.1), (14.5, 52.5),
                     (14.0, 52.9), (13.5, 52.5)]),
    ]
    z = 12
    df = spark.createDataFrame(pdf)
    got = sorted(
        tuple(r) for r in zonal_stats(rasterize(df, z), zones, z).collect()
    )
    con = duckdb.connect()
    con.register("zpts", pdf)
    want = sorted(
        tuple(r)
        for r in con.sql(
            zonal_stats_oracle_sql("(SELECT * FROM zpts)", zones, z)
        ).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) == 3
    # overlap: a and b share the 13.5..14.0 band, so totals overlap-sum
    tot = {r[0]: r[2] for r in got}
    assert tot["a"] + tot["b"] > len(pdf)


def test_crossing_sql_even_odd_concave():
    # concave "U" shape in tile space: the notch center is OUTSIDE
    ring = [(0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (4.0, 6.0), (4.0, 2.0),
            (2.0, 2.0), (2.0, 6.0), (0.0, 6.0)]
    con = duckdb.connect()
    probe = lambda x, y: con.sql(
        f"SELECT {_crossing_sql(repr(x), repr(y), ring)}"
    ).fetchone()[0]
    assert probe(1.0, 3.0)          # left arm
    assert probe(5.0, 3.0)          # right arm
    assert not probe(3.0, 5.0)      # notch
    assert probe(3.0, 1.0)          # base
    assert not probe(7.0, 3.0)      # outside
    con.close()
