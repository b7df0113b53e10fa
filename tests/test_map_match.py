"""Map-matching join (operators/map_match.py) + the pairwise native
segment-distance Column (functions/columns.py distance_to_segment).

The Column is pinned against the reference-spec numpy kernel
(kernels/geometry.py:221, GeoGeometry.kt:642-680) on all three
branches; the operator is pinned against a brute-force argmin."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geogeometry_spark.functions import columns as C
from geogeometry_spark.kernels import geometry as kgeo
from geogeometry_spark.operators.map_match import (
    map_match,
    segment_covering,
)

# segments exercising every kernel branch: constant-lon ("horizontal"
# in the kernel's x=lat convention), constant-lat, slanted, degenerate
SEGS = [
    (0, 52.10, 13.20, 52.30, 13.20),   # constant lon
    (1, 52.20, 13.05, 52.20, 13.45),   # constant lat
    (2, 52.05, 13.05, 52.35, 13.40),   # slanted
    (3, 52.40, 13.40, 52.40, 13.40),   # zero-length
    (4, 52.00, 13.00, 52.01, 13.50),   # shallow slant
]

PTS = [
    (100, 52.20, 13.21),   # beside seg 0
    (101, 52.20, 13.199),  # other side of seg 0
    (102, 52.35, 13.20),   # beyond seg 0's north end
    (103, 52.201, 13.25),  # just above seg 1
    (104, 52.199, 13.03),  # beyond seg 1's west end
    (105, 52.20, 13.22),   # near the slanted seg 2
    (106, 52.401, 13.401), # near the degenerate seg 3
    (107, 52.005, 13.25),  # near the shallow slant
    (108, 52.50, 14.50),   # far from everything
]


def _kernel_dist(plat, plon, seg):
    _, alat, alon, blat, blon = seg
    return float(
        kgeo.distance_to_segment(alat, alon, blat, blon, plat, plon)[0]
    )


def test_segment_distance_column_matches_kernel(spark):
    rows = [
        Row(pid=pid, plat=plat, plon=plon, sid=sid, alat=alat,
            alon=alon, blat=blat, blon=blon)
        for (pid, plat, plon) in PTS
        for (sid, alat, alon, blat, blon) in SEGS
    ]
    df = spark.createDataFrame(rows).select(
        "pid",
        "sid",
        C.distance_to_segment(
            F.col("plat"), F.col("plon"), F.col("alat"),
            F.col("alon"), F.col("blat"), F.col("blon"),
        ).alias("d"),
    )
    got = {(r.pid, r.sid): r.d for r in df.collect()}
    for pid, plat, plon in PTS:
        for seg in SEGS:
            want = _kernel_dist(plat, plon, seg)
            have = got[(pid, seg[0])]
            assert have == pytest.approx(want, rel=1e-9, abs=1e-6), (
                pid, seg[0], want, have,
            )


def test_segment_distance_sql_twin_matches_kernel():
    import duckdb

    expr = C.distance_to_segment_sql(
        "plat", "plon", "alat", "alon", "blat", "blon"
    )
    con = duckdb.connect()
    for pid, plat, plon in PTS:
        for seg in SEGS:
            sid, alat, alon, blat, blon = seg
            (have,) = con.execute(
                f"SELECT {expr} FROM (SELECT {plat!r} AS plat, "
                f"{plon!r} AS plon, {alat!r} AS alat, {alon!r} AS alon, "
                f"{blat!r} AS blat, {blon!r} AS blon)"
            ).fetchone()
            want = _kernel_dist(plat, plon, seg)
            assert have == pytest.approx(want, rel=1e-9, abs=1e-6)


def _brute_match(points, segs, max_dist):
    out = {}
    for pid, plat, plon in points:
        best = None
        for seg in segs:
            d = _kernel_dist(plat, plon, seg)
            if d <= max_dist and (best is None or (d, seg[0]) < best):
                best = (d, seg[0])
        if best is not None:
            out[pid] = (best[1], best[0])
    return out


@pytest.fixture(scope="module")
def seg_df(spark):
    return spark.createDataFrame(
        [Row(seg_id=s, alat=a, alon=b, blat=c, blon=d)
         for s, a, b, c, d in SEGS]
    )


def test_map_match_against_brute_force(spark, seg_df):
    # deterministic scattered points across the fixture box
    pts = [
        (i, 52.0 + ((i * 7919) % 4001) / 10000.0,
         13.0 + ((i * 104729) % 5001) / 10000.0)
        for i in range(400)
    ] + PTS
    pdf = spark.createDataFrame(
        [Row(event_id=p, user_id=p % 7, lat=la, lon=lo)
         for p, la, lo in pts]
    )
    got = {
        r.event_id: (r.seg_id, r.dist_m)
        for r in map_match(
            pdf, seg_df, max_dist_m=500.0, max_abs_lat=52.6
        ).collect()
    }
    want = _brute_match(pts, SEGS, 500.0)
    assert set(got) == set(want)
    for pid, (sid, d) in want.items():
        gsid, gd = got[pid]
        assert gsid == sid, (pid, want[pid], got[pid])
        assert gd == pytest.approx(d, rel=1e-9, abs=1e-6)


def test_map_match_excludes_null_coords_and_far_points(spark, seg_df):
    pdf = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, lat=52.20, lon=13.21),
            Row(event_id=2, user_id=1, lat=None, lon=13.21),
            Row(event_id=3, user_id=1, lat=52.20, lon=None),
            Row(event_id=4, user_id=1, lat=10.0, lon=100.0),
        ]
    )
    rows = map_match(
        pdf, seg_df, max_dist_m=500.0, max_abs_lat=52.6
    ).collect()
    assert [r.event_id for r in rows] == [1]


def test_map_match_auto_broadcast_plan(spark, seg_df):
    pdf = spark.createDataFrame(
        [Row(event_id=1, user_id=1, lat=52.20, lon=13.21)]
    )
    out = map_match(pdf, seg_df, max_dist_m=500.0, max_abs_lat=52.6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_map_match_zoom_validation(spark, seg_df):
    pdf = spark.createDataFrame(
        [Row(event_id=1, user_id=1, lat=52.2, lon=13.2)]
    )
    with pytest.raises(ValueError, match="coarser zoom"):
        map_match(pdf, seg_df, max_dist_m=500.0, zoom=25)


def test_segment_covering_hits_every_crossed_cell(spark):
    # a long slanted segment; every point sampled densely along it must
    # find its own tile inside the covering (the adjacency guarantee's
    # stronger core: crossed cells themselves are covered)
    seg = (0, 52.05, 13.05, 52.35, 13.92)
    sdf = spark.createDataFrame(
        [Row(seg_id=seg[0], alat=seg[1], alon=seg[2],
             blat=seg[3], blon=seg[4])]
    )
    zoom = 13
    cover = {
        (r._nx, r._ny)
        for r in segment_covering(
            sdf, max_dist_m=2000.0, zoom=zoom, max_abs_lat=52.6
        ).collect()
    }
    n = 1 << zoom
    for i in range(0, 1001):
        t = i / 1000.0
        la = seg[1] + (seg[3] - seg[1]) * t
        lo = seg[2] + (seg[4] - seg[2]) * t
        x = int(((lo + 180.0) / 360.0 * n) % n)
        rad = math.radians(la)
        y = int(
            (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
             / math.pi) / 2.0 * n
        )
        assert (x, y) in cover, (i, x, y)


# --------------------------------------------------------- segment speeds

def test_segment_speeds_composition(spark):
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.map_match import (
        segment_speeds,
        segment_speeds_oracle_sql,
    )

    # one horizontal segment at lat 10.0 along lon 20.0..20.01
    segs = spark.createDataFrame(
        [(0, 10.0, 20.0, 10.0, 20.01)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    rows = [
        (1, 1, 0, 10.0, 20.0),        # session start: no leg
        (2, 1, 100, 10.0, 20.001),    # leg 1 -> seg 0
        (3, 1, 100, 10.0, 20.0015),   # zero-duration leg: excluded
        (4, 1, 300, 10.0, 20.002),    # leg 2 -> seg 0
        (5, 1, 400, 30.0, 50.0),      # leg ends far away: unmatched
    ]
    pts = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_sec long, lat double, lon double"
    )
    out = segment_speeds(pts, segs, max_dist_m=150.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.seg_id == 0 and r.n_legs == 2
    assert r.dur_s == 100 + 200
    assert r.dist_mm > 0
    assert r.speed_ms_r3 == round((r.dist_mm / 1000.0) / float(r.dur_s), 3)

    # twin agreement on the same tiny fixture
    import duckdb

    con = duckdb.connect()
    con.register("fix_t", pts.toPandas())
    con.register("seg_t", segs.toPandas())
    want = sorted(
        tuple(x)
        for x in con.sql(
            segment_speeds_oracle_sql(
                "(SELECT * FROM fix_t)", "(SELECT * FROM seg_t)",
                max_dist_m=150.0,
            )
        ).fetchall()
    )
    con.close()
    assert sorted(tuple(x) for x in out) == want


def test_segment_speed_percentiles_exact_ranks(spark):
    from geogeometry_spark.operators.map_match import (
        segment_speed_percentiles,
        segment_speed_percentiles_oracle_sql,
    )

    # one segment, five legs with distinct speeds: ~1,2,3,4,5 m/s
    # (100 m lon steps at the equator scaled by duration)
    segs = spark.createDataFrame(
        [(0, 0.0, 20.0, 0.0, 20.1)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    step = 0.001  # ~111.3 m
    rows, t = [(1, 1, 0, 0.0, 20.0)], 0
    for i, dur in enumerate((111, 56, 37, 28, 22)):  # ~1..5 m/s
        t += dur
        rows.append((i + 2, 1, t, 0.0, 20.0 + step * (i + 1)))
    pts = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts_sec long, lat double, lon double",
    )
    out = segment_speed_percentiles(pts, segs, max_dist_m=200.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_legs == 5
    # nearest-rank: v50 = rank ceil(2.5)=3 (3rd slowest), v85 = rank
    # ceil(4.25)=5 (the max), vmax = max
    assert r.v50_r3 == pytest.approx(3.0, abs=0.1)
    assert r.v85_r3 == r.vmax_r3
    assert r.vmax_r3 == pytest.approx(5.06, abs=0.1)

    import duckdb

    con = duckdb.connect()
    con.register("fix_p", pts.toPandas())
    con.register("seg_p", segs.toPandas())
    want = sorted(
        tuple(x)
        for x in con.sql(
            segment_speed_percentiles_oracle_sql(
                "(SELECT * FROM fix_p)", "(SELECT * FROM seg_p)",
                max_dist_m=200.0,
            )
        ).fetchall()
    )
    con.close()
    assert sorted(tuple(x) for x in out) == want


def test_segment_speed_percentiles_single_leg(spark):
    from geogeometry_spark.operators.map_match import (
        segment_speed_percentiles,
    )

    segs = spark.createDataFrame(
        [(0, 0.0, 20.0, 0.0, 20.1)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    pts = spark.createDataFrame(
        [(1, 1, 0, 0.0, 20.0), (2, 1, 50, 0.0, 20.001)],
        "event_id long, user_id long, ts_sec long, lat double, lon double",
    )
    r = segment_speed_percentiles(pts, segs, max_dist_m=200.0).collect()[0]
    # n=1: every rank pick is the single observation
    assert r.n_legs == 1
    assert r.v50_r3 == r.v85_r3 == r.vmax_r3
