"""Batch geofence dwell time: per (user, fence) seconds-inside + visits.

The reference answers "is this point in this polygon?"
(GeoGeometry.kt:237-295 polygonContains); the streaming layer lifts it
to enter/exit transitions (streaming/stateful.py:stream_geofence).
This operator is the BATCH rollup a fleet/geofence corpus needs: for
each user and fence, total dwell seconds and number of distinct visits
(enters) over the whole history.

Semantics (deterministic, oracle-exact):
- A leg is a pair of consecutive fixes WITHIN a session
  (:func:`.trajectory.sessionize` — legs across a > ``gap_s`` hole do
  not count as dwell; the gap starts a new visit if still inside).
- A leg contributes its full duration to fence F iff BOTH endpoints
  are inside F (conservative endpoint rule — no boundary-crossing
  interpolation, so both engines agree exactly on integers).
- An enter is a fix inside F whose predecessor (if any, same session)
  was not inside F.

Scale design: fences are config-scale (tens..thousands) and ride the
task closure exactly like the batch PIP broadcast form
(operators/pip_join.py).  Membership is ONE map-side Arrow pass
(vectorized ray-cast kernel behind a per-fence bbox prefilter,
kernels/geometry.py:100) BEFORE the shuffle, so the session-window
exchange carries each fix once with its small ``inside`` array.  The
leg relation then explodes only array_union(prev, cur) — bounded by
fences-per-fix, not |fences| — and the final aggregate's group keys
start with the user key, reusing the window exchange.  No per-row
Python, no second scan, nothing all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C
from .trajectory import sessionize, sessionize_oracle_sql

__all__ = ["geofence_dwell", "geofence_dwell_oracle_sql"]


def geofence_dwell(
    points: DataFrame,
    fences: list,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """``fences`` is a list of (fence_id, ring) with rings as closed
    (lon, lat) vertex sequences — the stream_geofence convention.
    Returns (user, fence_id, dwell_s, n_enters), one row per (user,
    fence) pair the user ever had a fix inside."""
    import numpy as np

    from ..kernels.geometry import polygon_contains

    prepared = []
    for fid, ring in fences:
        arr = np.asarray(ring, dtype=np.float64)
        bbox = (
            arr[:, 1].min(), arr[:, 1].max(),
            arr[:, 0].min(), arr[:, 0].max(),
        )
        prepared.append((str(fid), arr, bbox))

    slim = points.select(user_col, ts_col, id_col, lat_col, lon_col)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema
    ) + ", _inside array<string>"

    def classify(batches):
        for pdf in batches:
            lat = pdf[lat_col].to_numpy()
            lon = pdf[lon_col].to_numpy()
            members: list[list[str]] = [[] for _ in range(len(pdf))]
            for fid, ring, (la0, la1, lo0, lo1) in prepared:
                cand = (
                    (lat >= la0) & (lat <= la1)
                    & (lon >= lo0) & (lon <= lo1)
                )
                if cand.any():
                    m = np.zeros(len(pdf), dtype=bool)
                    m[cand] = polygon_contains(lat[cand], lon[cand], ring)
                    for i in np.nonzero(m)[0]:
                        members[i].append(fid)
            pdf = pdf.copy()
            pdf["_inside"] = members
            yield pdf

    cls = slim.mapInPandas(classify, out_schema)
    sess = sessionize(cls, gap_s, user_col, ts_col, id_col)
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, id_col)
    empty = F.array().cast("array<string>")
    base = sess.select(
        F.col(user_col),
        F.col(ts_col).alias("_ct"),
        F.col("_inside").alias("_cur"),
        F.lag(ts_col).over(w).alias("_pt"),
        F.coalesce(F.lag("_inside").over(w), empty).alias("_prv"),
    )
    ex = base.select(
        user_col, "_ct", "_pt", "_cur", "_prv",
        F.explode(F.array_union(F.col("_prv"), F.col("_cur"))).alias(
            "fence_id"
        ),
    )
    in_cur = F.array_contains(F.col("_cur"), F.col("fence_id"))
    in_prv = F.array_contains(F.col("_prv"), F.col("fence_id"))
    dur = F.col("_ct") - F.col("_pt")
    return ex.groupBy(user_col, "fence_id").agg(
        F.sum(
            F.when(in_cur & in_prv, dur).otherwise(F.lit(0).cast("long"))
        ).alias("dwell_s"),
        F.sum(
            F.when(in_cur & ~in_prv, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("n_enters"),
    )


def geofence_dwell_oracle_sql(
    subq: str,
    fences: list,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin: one branch per fence — the same unrolled ray-cast
    boolean (functions/columns.py pip_sql), the same session window lag,
    the same both-endpoints leg rule and NOT-coalesce enter rule;
    UNION ALL across fences.  (user, fence) row existence matches the
    operator's explode-of-union groups via HAVING bool_or(inside)."""
    sess = sessionize_oracle_sql(subq, gap_s, user_col, ts_col, id_col)
    win = (
        f"(PARTITION BY {user_col}, session_id "
        f"ORDER BY {ts_col}, {id_col})"
    )
    branches = []
    for fid, ring in fences:
        pip = C.pip_sql(lat, lon, ring)
        branches.append(
            f"SELECT {user_col}, '{fid}' AS fence_id, "
            f"sum(CASE WHEN inf AND coalesce(pinf, FALSE) "
            f"THEN {ts_col} - pts ELSE 0 END) AS dwell_s, "
            f"sum(CASE WHEN inf AND NOT coalesce(pinf, FALSE) "
            f"THEN 1 ELSE 0 END) AS n_enters "
            f"FROM (SELECT {user_col}, {ts_col}, inf, "
            f"lag({ts_col}) OVER {win} AS pts, "
            f"lag(inf) OVER {win} AS pinf "
            f"FROM (SELECT *, ({pip}) AS inf FROM sess)) "
            f"GROUP BY {user_col} HAVING bool_or(inf)"
        )
    return f"WITH sess AS ({sess}) " + " UNION ALL ".join(branches)
