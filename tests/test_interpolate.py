"""Unit tests for operators/interpolate.py (IDW): hand-computed
estimates, coincident-sample tie-break, quantized-weight underflow,
and the DuckDB twin."""

import math

import pytest
from pyspark.sql import functions as F

from geogeometry_spark.functions import columns as C
from geogeometry_spark.kernels.geometry import haversine as hav_py
from geogeometry_spark.operators.interpolate import (
    idw_interpolate,
    idw_oracle_sql,
)

S_SCHEMA = "sid long, lat double, lon double, val double"
T_SCHEMA = "query_id long, qlat double, qlon double, radius_m double"


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def _with_cell(df):
    return df.withColumn(
        "cell_id", C.geohash_interleaved(F.col("lat"), F.col("lon"), 12)
    )


def test_idw_hand_computed(spark):
    # two samples at ~111 m and ~222 m east of the target: weights
    # 1/d^2 with d quantized to mm, fixed-point 1e-9 sums
    t = (0.0, 0.0)
    samples = [(1, 0.0, 0.001, 10.0), (2, 0.0, 0.002, 40.0)]
    out = idw_interpolate(
        _with_cell(spark.createDataFrame(samples, S_SCHEMA)),
        spark.createDataFrame([(7, t[0], t[1], 2000.0)], T_SCHEMA),
        value_col="val",
    ).collect()
    assert len(out) == 1 and out[0].query_id == 7
    assert out[0].n_samples == 2

    def q(v, lat, lon):
        d_mm = round(hav_py(lat, lon, t[0], t[1]) * 1000.0)
        dm = d_mm / 1000.0
        w = 1.0 / (dm * dm)
        return round(w * 1e9), round(w * v * 1e9)

    w1, wv1 = q(10.0, 0.0, 0.001)
    w2, wv2 = q(40.0, 0.0, 0.002)
    want = round((wv1 + wv2) / (w1 + w2), 6)
    assert out[0].est_r6 == pytest.approx(want, abs=1e-9)
    # sanity: nearer sample dominates -> estimate well below midpoint 25
    assert out[0].est_r6 < 20.0


def test_idw_coincident_min_tiebreak(spark):
    # two samples within 1 m of the target -> MIN value wins outright,
    # far sample contributes nothing
    samples = [
        (1, 0.0, 0.0, 30.0),
        (2, 0.000005, 0.0, 12.0),   # ~0.55 m away
        (3, 0.0, 0.01, 99.0),       # ~1.1 km away
    ]
    out = idw_interpolate(
        _with_cell(spark.createDataFrame(samples, S_SCHEMA)),
        spark.createDataFrame([(1, 0.0, 0.0, 2000.0)], T_SCHEMA),
    ).collect()
    assert len(out) == 1
    assert out[0].n_samples == 3
    assert out[0].est_r6 == 12.0


def test_idw_weight_underflow_null(spark):
    # p=2 beyond ~44.7 km: round(1e9/d^2) == 0 -> NULL est, documented
    d_deg = 0.5  # ~55.6 km
    out = idw_interpolate(
        _with_cell(
            spark.createDataFrame([(1, 0.0, d_deg, 5.0)], S_SCHEMA)
        ),
        spark.createDataFrame([(1, 0.0, 0.0, 60000.0)], T_SCHEMA),
        precision=3,
    ).collect()
    assert len(out) == 1 and out[0].n_samples == 1
    assert out[0].est_r6 is None


def test_idw_power_one(spark):
    # p=1: single sample -> estimate equals its value after fixed-point
    out = idw_interpolate(
        _with_cell(spark.createDataFrame([(1, 0.0, 0.01, 7.5)], S_SCHEMA)),
        spark.createDataFrame([(1, 0.0, 0.0, 2000.0)], T_SCHEMA),
        power=1,
    ).collect()
    assert out[0].est_r6 == pytest.approx(7.5, abs=1e-5)


def test_idw_matches_duckdb_twin(spark, duck):
    import pandas as pd

    rows = [
        (
            i,
            ((i * 37) % 140) - 70 + 0.5 + (i % 7) * 1e-3,
            ((i * 53) % 340) - 170 + 0.5 + (i % 5) * 1e-3,
            float((i * 13) % 100),
        )
        for i in range(400)
    ]
    spdf = pd.DataFrame(rows, columns=["sid", "lat", "lon", "val"])
    tg = [
        (i, ((i * 37) % 140) - 70 + 0.5, ((i * 53) % 340) - 170 + 0.5,
         3000.0 + (i % 3) * 1000.0)
        for i in range(0, 400, 5)
    ]
    tpdf = pd.DataFrame(tg, columns=["query_id", "qlat", "qlon", "radius_m"])
    duck.register("smp", spdf)
    duck.register("tgt", tpdf)
    got = sorted(
        tuple(r)
        for r in idw_interpolate(
            _with_cell(spark.createDataFrame(spdf)),
            spark.createDataFrame(tpdf),
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(
            idw_oracle_sql(
                "(SELECT lat, lon, val FROM smp)",
                "(SELECT query_id, qlat, qlon, radius_m FROM tgt)",
            )
        ).fetchall()
    )
    assert len(got) > 10
    assert got == want


# --------------------------------------------------------------------------
# trend surface
# --------------------------------------------------------------------------

def test_trend_surface_recovers_planar_field(spark):
    from geogeometry_spark.operators.interpolate import trend_surface

    # exact plane z = 5 + 2x + 3y on integer millidegree offsets
    rows = []
    for i in range(40):
        x = (i * 7) % 19 - 9      # millideg offsets
        y = (i * 11) % 17 - 8
        z = 5 + 2 * x + 3 * y
        rows.append((i, 50.0 + y / 1000.0, 8.0 + x / 1000.0, z))
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lon double, v long"
    )
    out = trend_surface(
        df, value_col="v", ref_lat=50.0, ref_lon=8.0
    ).collect()[0]
    assert out.n == 40
    assert out.a_r6 == pytest.approx(5.0, abs=1e-5)
    assert out.b_r6 == pytest.approx(2.0, abs=1e-5)
    assert out.c_r6 == pytest.approx(3.0, abs=1e-5)
    assert out.r2_r6 == 1.0


def test_trend_surface_singular_is_null(spark):
    from geogeometry_spark.operators.interpolate import trend_surface

    # collinear sites: normal matrix singular
    rows = [(i, 50.0, 8.0 + i / 1000.0, i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lon double, v long"
    )
    out = trend_surface(
        df, value_col="v", ref_lat=50.0, ref_lon=8.0
    ).collect()[0]
    assert out.a_r6 is None and out.r2_r6 is None


def test_trend_surface_matches_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    from geogeometry_spark.operators.interpolate import (
        trend_surface,
        trend_surface_oracle_sql,
    )

    rows = []
    for i in range(300):
        lat = 50.0 + ((i * 13) % 41 - 20) / 1000.0
        lon = 8.0 + ((i * 29) % 37 - 18) / 1000.0
        v = (i * 7) % 23 + ((i * 13) % 41 - 20) * 2
        rows.append((i, lat, lon, v))
    pdf = pd.DataFrame(rows, columns=["event_id", "lat", "lon", "v"])
    con = duckdb.connect()
    con.register("pts_trend", pdf)
    got = [
        tuple(r)
        for r in trend_surface(
            spark.createDataFrame(pdf),
            value_col="v",
            ref_lat=50.0,
            ref_lon=8.0,
        ).collect()
    ]
    want = [
        tuple(w)
        for w in con.sql(
            trend_surface_oracle_sql(
                "(SELECT lat, lon, v FROM pts_trend)",
                value_sql="v",
                ref_lat=50.0,
                ref_lon=8.0,
            )
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_trend_surface_raises_past_overflow_bounds(spark):
    from geogeometry_spark.operators.interpolate import trend_surface

    # |z| past 10^6: the BIGINT moment Szz would overflow long before
    # 10^8 points at this magnitude, and Spark would wrap silently
    # while the DuckDB twin promotes to HUGEINT — so the operator must
    # refuse (ADVICE round 4).
    rows = [(i, 50.0 + i / 1000.0, 8.0 + i / 1000.0, 5_000_000_000)
            for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lon double, v long"
    )
    with pytest.raises(ValueError, match="bounds exceeded"):
        trend_surface(df, value_col="v", ref_lat=50.0, ref_lon=8.0)

    # |x| past 200000 millideg (a > +/-200 deg window after wrap-free
    # offsets) must refuse too
    rows = [(i, 50.0, 8.0 + (300.0 + i), 10) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lon double, v long"
    )
    with pytest.raises(ValueError, match="bounds exceeded"):
        trend_surface(df, value_col="v", ref_lat=50.0, ref_lon=8.0)
