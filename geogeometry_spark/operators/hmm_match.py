"""HMM (Viterbi) map matching: snap each trip's fix SEQUENCE to road
segments, trading point-wise distance against route continuity.

:mod:`.map_match` answers the memoryless form (every fix snaps to its
nearest segment — GeoGeometry.kt:642-724 ``distanceToSegment`` as a
relation-scale argmin).  Real traces need the order-aware form: at an
intersection the nearest segment flips fix-by-fix, while the vehicle
stays on one road.  The classical answer is an HMM over per-fix
candidate segments (hidden state = segment, emission = distance to it,
transition = penalty for switching segments) solved per trip with
Viterbi.

Determinism contract (oracle-exact): this is the MIN-SUM integer form —
emission = mm-quantized geodesic point->segment distance (BIGINT),
transition = 0 for staying on the same segment else a flat
``switch_penalty_m`` in mm (BIGINT) — so the optimal TOTAL COST is a
pure integer min-plus value both engines compute bit-identically; no
probabilities, no logs, no FP accumulation.  Fixes with no candidate
within ``max_dist_m`` are dropped before the DP (the trip matches its
on-road subsequence, in (ts, id) order).  The contract output is one
row per trip: (user, session, n_fixes matched, total_cost_mm); per-fix
segment assignments are returned by :func:`hmm_match` for use and are
pytest-pinned (an optimal PATH can tie, the optimal VALUE cannot — the
backtrack breaks ties toward the candidate-list order, documented
below).

Scale design:

1. candidate generation reuses :func:`.map_match.segment_covering` —
   the road network (dimension-scale) is sampled, covered, and 1-ring
   expanded on the SMALL side; each fix computes one tile address and
   equi-joins it (auto-broadcast under the same bounded probe);
2. per-fix top-``k_candidates`` WITHOUT a window sort-shuffle: groupBy
   fix + ``slice(array_sort(collect_list(struct(d_mm, seg_id))), 1, k)``
   — collect_list partial-aggregates map-side, so the exchange carries
   one bounded-array row per matched fix (candidates per fix are
   already bounded by cell co-location);
3. the Viterbi kernel runs per trip in a grouped map (vectorized
   numpy per fix: K'xK min-plus broadcast, Python only across fixes —
   the Fréchet-kernel precedent);
4. nothing all-pairs, the fix stream is never exploded — and because
   every grouping key downstream starts with the user key, the ONE
   sessionize exchange satisfies the clustering requirement of BOTH
   the per-fix candidate aggregate and the per-trip grouped map: the
   executed plan (verified via explain) has exactly one big-side
   Exchange, with the covering arriving by broadcast.

Oracle: the same candidate set via the brute-force degree-bbox twin +
rank <= k, then the Viterbi recursion as a recursive CTE — the state
list rides the recursive row and each step is one ``list_transform``
min-plus over the previous state (the Fréchet-diagonal pattern,
traj_similarity.py:501).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from .map_match import _BROADCAST_CAP, _validated_zoom, segment_covering
from .trajectory import sessionize, sessionize_oracle_sql

__all__ = ["hmm_match", "hmm_trip_costs", "hmm_match_oracle_sql"]


def _viterbi_trip(d_arrays, s_arrays, penalty_mm: int):
    """Min-sum Viterbi over one trip's candidate lists.  ``d_arrays`` /
    ``s_arrays``: per-fix numpy arrays of emissions (mm) and segment
    ids, already in (d_mm, seg_id) order.  Returns (total_cost,
    [chosen seg per fix]).  Backtrack tie-break: the FIRST index in
    candidate-list order achieving the optimum at each step."""
    import numpy as np

    costs = d_arrays[0].astype(np.int64)
    back = []
    for i in range(1, len(d_arrays)):
        # trans[jp, j] = penalty unless same segment
        trans = np.where(
            s_arrays[i - 1][:, None] == s_arrays[i][None, :],
            0,
            penalty_mm,
        )
        tot = costs[:, None] + trans
        arg = np.argmin(tot, axis=0)  # first index on ties
        costs = d_arrays[i].astype(np.int64) + tot[
            arg, np.arange(len(d_arrays[i]))
        ]
        back.append(arg)
    j = int(np.argmin(costs))
    total = int(costs[j])
    path = [j]
    for arg in reversed(back):
        j = int(arg[j])
        path.append(j)
    path.reverse()
    return total, [int(s_arrays[i][p]) for i, p in enumerate(path)]


def hmm_match(
    points: DataFrame,
    segments: DataFrame,
    max_dist_m: float = 150.0,
    k_candidates: int = 3,
    switch_penalty_m: float = 60.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seg_id_col: str = "seg_id",
    max_abs_lat: float = C.TILE_MAX_LAT,
    zoom: int | None = None,
    broadcast_segments: bool | None = None,
) -> DataFrame:
    """Per-fix output: (user, session_id, id, ts, seg_id, dist_mm,
    total_cost_mm, n_fixes) — every on-road fix of every trip with its
    Viterbi-chosen segment; ``total_cost_mm``/``n_fixes`` repeat the
    trip aggregate on each row (use :func:`hmm_trip_costs` for the
    one-row-per-trip oracle-checked form).

    ``segments`` needs (``seg_id_col``, alat, alon, blat, blon), the
    :func:`.map_match.map_match` convention."""
    import numpy as np
    import pandas as pd

    zoom = _validated_zoom(max_dist_m, max_abs_lat, zoom)
    max_dist_mm = round(float(max_dist_m) * 1000.0)
    penalty_mm = round(float(switch_penalty_m) * 1000.0)

    segs = segments.select(
        F.col(seg_id_col).alias("seg_id"), "alat", "alon", "blat", "blon"
    )
    cover = segment_covering(segs, max_dist_m, zoom, max_abs_lat)
    if broadcast_segments is None:
        broadcast_segments = (
            cover.limit(_BROADCAST_CAP + 1).count() <= _BROADCAST_CAP
        )
    if broadcast_segments:
        cover = F.broadcast(cover)

    sess = sessionize(points, gap_s, user_col, ts_col, id_col)
    px, py = C.tile_xy(F.col(lat_col), F.col(lon_col), zoom)
    pts = sess.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col("session_id").alias("_s"),
        F.col(id_col).alias("_pid"),
        F.col(ts_col).alias("_ts"),
        F.col(lat_col).alias("_plat"),
        F.col(lon_col).alias("_plon"),
        px.alias("_nx"),
        py.alias("_ny"),
    )
    dist = C.distance_to_segment(
        F.col("_plat"),
        F.col("_plon"),
        F.col("alat"),
        F.col("alon"),
        F.col("blat"),
        F.col("blon"),
    )
    d_mm = F.round(dist * F.lit(1000.0)).cast("long")
    cand = (
        pts.join(cover, ["_nx", "_ny"])
        .select(
            "_u", "_s", "_pid", "_ts",
            d_mm.alias("_dmm"),
            F.col("seg_id").alias("_seg"),
        )
        .where(F.col("_dmm") <= F.lit(max_dist_mm))
    )
    # per-fix top-k candidate list, map-side partial collect + one
    # bounded-array row per fix on the exchange (no window sort)
    fix_cands = cand.groupBy("_u", "_s", "_pid", "_ts").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct(F.col("_dmm"), F.col("_seg")))
            ),
            1,
            int(k_candidates),
        ).alias("_cands")
    )

    out_schema = (
        f"{user_col} long, session_id long, {id_col} long, "
        f"{ts_col} long, {seg_id_col} long, dist_mm long, "
        "total_cost_mm long, n_fixes int"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ts", "_pid"], kind="mergesort")
        d_arrays, s_arrays = [], []
        for cl in pdf["_cands"]:
            d_arrays.append(
                np.fromiter((c["_dmm"] for c in cl), dtype=np.int64)
            )
            s_arrays.append(
                np.fromiter((c["_seg"] for c in cl), dtype=np.int64)
            )
        total, segs_path = _viterbi_trip(d_arrays, s_arrays, penalty_mm)
        dist_chosen = [
            int(d_arrays[i][int(np.nonzero(s_arrays[i] == sg)[0][0])])
            for i, sg in enumerate(segs_path)
        ]
        n = len(pdf)
        return pd.DataFrame(
            {
                user_col: pdf["_u"].to_numpy(),
                "session_id": pdf["_s"].to_numpy(),
                id_col: pdf["_pid"].to_numpy(),
                ts_col: pdf["_ts"].to_numpy(),
                seg_id_col: segs_path,
                "dist_mm": dist_chosen,
                "total_cost_mm": np.full(n, total, dtype=np.int64),
                "n_fixes": np.full(n, n, dtype=np.int32),
            }
        )

    return fix_cands.groupBy("_u", "_s").applyInPandas(run, out_schema)


def hmm_trip_costs(*args, **kwargs) -> DataFrame:
    """One row per trip: (user, session_id, n_fixes, total_cost_mm) —
    the oracle-checked projection of :func:`hmm_match` (the optimal
    VALUE is unique; optimal paths can tie)."""
    per_fix = hmm_match(*args, **kwargs)
    user_col = kwargs.get("user_col", "user_id")
    return per_fix.groupBy(
        user_col, "session_id", "n_fixes", "total_cost_mm"
    ).agg(F.count(F.lit(1)).alias("_n")).select(
        user_col, "session_id", "n_fixes", "total_cost_mm"
    )


def hmm_match_oracle_sql(
    points_subq: str,
    segments_subq: str,
    max_dist_m: float = 150.0,
    k_candidates: int = 3,
    switch_penalty_m: float = 60.0,
    gap_s: int = 43200,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB twin of :func:`hmm_trip_costs`: same sessionize CTE, the
    map_match brute-force degree-bbox candidate join with the identical
    mm-quantized distance, the same (d_mm, seg_id)-ordered top-k lists,
    then Viterbi as a recursive CTE — the cost list rides the recursive
    row and each step is one list_transform min-plus over the previous
    state (no aggregate in the recursive term)."""
    max_dist_mm = round(float(max_dist_m) * 1000.0)
    penalty_mm = round(float(switch_penalty_m) * 1000.0)
    margin = max(0.01, max_dist_m / 55660.0 * 1.2)
    sess = sessionize_oracle_sql(
        points_subq, gap_s, user_col, ts_col, id_col
    )
    dist = C.distance_to_segment_sql(
        f"p.{lat}", f"p.{lon}", "s.alat", "s.alon", "s.blat", "s.blon"
    )
    return (
        f"WITH RECURSIVE sess AS ({sess}), "
        f"pts AS (SELECT * FROM sess WHERE {lat} IS NOT NULL "
        f"AND {lon} IS NOT NULL), "
        f"segs AS (SELECT * FROM {segments_subq}), "
        "cand AS (SELECT *, row_number() OVER (PARTITION BY "
        f"{user_col}, session_id, {id_col} ORDER BY d_mm, seg_id) AS rk "
        f"FROM (SELECT p.{user_col}, p.session_id, p.{id_col}, "
        f"p.{ts_col}, s.seg_id, "
        f"CAST(round(({dist}) * 1000.0) AS BIGINT) AS d_mm "
        "FROM pts p JOIN segs s ON "
        f"p.{lat} >= least(s.alat, s.blat) - {margin!r} AND "
        f"p.{lat} <= greatest(s.alat, s.blat) + {margin!r} AND "
        f"p.{lon} >= least(s.alon, s.blon) - {margin!r} AND "
        f"p.{lon} <= greatest(s.alon, s.blon) + {margin!r}) "
        f"WHERE d_mm <= {max_dist_mm}), "
        # matched fixes reindexed 0..m-1 per trip in (ts, id) order
        f"fixes AS (SELECT {user_col}, session_id, {id_col}, {ts_col}, "
        f"list({{'d': d_mm, 's': seg_id}} ORDER BY d_mm, seg_id) AS cl "
        f"FROM cand WHERE rk <= {int(k_candidates)} "
        f"GROUP BY {user_col}, session_id, {id_col}, {ts_col}), "
        f"seq AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY {user_col}, "
        f"session_id ORDER BY {ts_col}, {id_col}) - 1 AS i FROM fixes), "
        f"trips AS MATERIALIZED (SELECT {user_col}, session_id, "
        "CAST(count(*) AS INT) AS m FROM seq "
        f"GROUP BY {user_col}, session_id), "
        "rec AS ("
        f"SELECT q.{user_col}, q.session_id, t.m, 0 AS i, "
        "list_transform(q.cl, c -> c.d::BIGINT) AS costs, q.cl "
        "FROM seq q JOIN trips t USING "
        f"({user_col}, session_id) WHERE q.i = 0 "
        "UNION ALL "
        f"SELECT r.{user_col}, r.session_id, r.m, r.i + 1, "
        "list_transform(range(1, len(n.cl) + 1), j -> "
        "n.cl[j].d::BIGINT + list_min("
        "list_transform(range(1, len(r.cl) + 1), jp -> "
        "r.costs[jp] + CASE WHEN r.cl[jp].s = n.cl[j].s "
        f"THEN 0 ELSE {penalty_mm} END))), n.cl "
        f"FROM rec r JOIN seq n ON n.{user_col} = r.{user_col} "
        "AND n.session_id = r.session_id AND n.i = r.i + 1 "
        "WHERE r.i < r.m - 1) "
        f"SELECT {user_col}, session_id, m AS n_fixes, "
        "list_min(costs) AS total_cost_mm FROM rec WHERE i = m - 1"
    )
