#!/usr/bin/env python
"""N->4N scaling evidence for the two shuffle-heavy operators at 4x
their bench.py inputs (VERDICT r3 item 9): overlay join at 400k x 150
polygons and connected components at ~6M edges.

Same methodology as scripts/scaling.py: identical job, identical
pre-materialized input, one fresh Spark session per parallelism level,
warm-up + best-of-N timed runs, fixtures built OUTSIDE the timer.
The overlay DataFrame is built once per session (plan construction is
parallelism-independent); connected_components is an iterative driver
loop, so its wall necessarily includes per-round planning — at the
60-200 s walls measured here that fixed cost is noise.

Prints one JSON line:
  {"overlay_400k": {"8": {...}, "32": {...}, "efficiency": ...},
   "cc_6m_edges": {...}}

Usage: SPARK_DRIVER_MEM=16g python scripts/scaling_stretch.py [cpus ...]
(default levels: 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = int(os.environ.get("SCALING_RUNS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("BENCH_AMPLIFY", "1000"))
N_A = int(os.environ.get("STRETCH_OVERLAY_A", "400000"))
N_B = int(os.environ.get("STRETCH_OVERLAY_B", "150"))
N_CC_NODES = int(os.environ.get("STRETCH_CC_NODES", "6000000"))
N_TRAJ_USERS = int(os.environ.get("STRETCH_TRAJ_USERS", "200000"))
N_DBSCAN_USERS = int(os.environ.get("STRETCH_DBSCAN_USERS", "50000"))
N_MM_USERS = int(os.environ.get("STRETCH_MM_USERS", "200000"))
N_SJ_USERS = int(os.environ.get("STRETCH_SJ_USERS", "200000"))


def _session(cpus: int):
    from geogeometry_spark.plans.session import get_spark

    spark = get_spark(
        app_name=f"stretch-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _overlay_inputs(spark):
    """Same shape as bench.py's overlay fixture, 4x the A side: boxes
    over the skewed Berlin hot cluster, sized so true pairs stay
    bounded (narrow A boxes), checkpointed outside the timer."""
    from pyspark.sql import functions as F

    from bench import materialize_input
    from geogeometry_spark.sources import tables as src

    path, _ = materialize_input(spark, SF_DIR, AMPLIFY)
    docs = spark.read.parquet(path)
    pts = src.with_true_coords(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    )
    hot = pts.where(
        (F.col("lat") > 52.3) & (F.col("lat") < 52.7)
        & (F.col("lon") > 13.2) & (F.col("lon") < 13.6)
    )

    def boxes(df, n, hw, hh):
        w, e = F.col("lon") - hw, F.col("lon") + hw
        s, nn = F.col("lat") - hh, F.col("lat") + hh
        p = lambda x, y: F.array(x, y)  # noqa: E731
        ring = F.array(p(w, s), p(e, s), p(e, nn), p(w, nn), p(w, s))
        return (
            df.limit(n)
            .select(
                F.col("doc_id").cast("string").alias("polygon_id"),
                F.array(ring).alias("rings"),
            )
            .localCheckpoint()
        )

    a = boxes(hot, N_A, F.lit(0.002), F.lit(0.0012))
    b = boxes(
        hot.where(F.col("doc_id").cast("long") % 97 == 0),
        N_B, F.lit(0.02), F.lit(0.012),
    )
    a.count(), b.count()  # force materialization outside the timer
    return a, b


def _cc_edges(spark, n_nodes):
    """bench.py's dup-cluster graph at 4x: 16-node stars chained into
    256-node components (diameter ~31)."""
    from pyspark.sql import functions as F

    ids = spark.range(n_nodes)
    star = ids.where(F.col("id") % 16 != 0).select(
        (F.col("id") - F.col("id") % 16).alias("id_a"),
        F.col("id").alias("id_b"),
    )
    chain = ids.where(
        (F.col("id") % 16 == 0) & (F.col("id") % 256 != 240)
    ).select(F.col("id").alias("id_a"), (F.col("id") + 16).alias("id_b"))
    edges = star.union(chain).localCheckpoint()
    return edges, edges.count()


def measure_overlay(cpus: int) -> dict:
    from geogeometry_spark.operators.s2_join import s2_overlay_join

    spark = _session(cpus)
    a, b = _overlay_inputs(spark)
    df = s2_overlay_join(a, b, level=13)  # plan built once

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    n_pairs = df.count()
    spark.stop()
    return {"wall_s": round(best, 3), "true_pairs": n_pairs,
            "pairs_per_sec": round(n_pairs / best, 1)}


def measure_cc(cpus: int) -> dict:
    from geogeometry_spark.operators.dedup import connected_components

    spark = _session(cpus)
    edges, n_edges = _cc_edges(spark, N_CC_NODES)

    def run():
        connected_components(edges).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_edges": n_edges,
            "edges_per_sec": round(n_edges / best, 1)}


def measure_traj(cpus: int) -> dict:
    """trip_stats at N_TRAJ_USERS x 100 fixes (default 20M — a 1 s
    wall at 5M is all fixed cost; the window shuffle needs ~5 s+ to
    amortize, the r3 25M-doc lesson): the window family's scaling shape (one
    user_id hash exchange reused by the aggregate)."""
    from geogeometry_spark.operators.trajectory import trip_stats
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(spark, N_TRAJ_USERS, 100).localCheckpoint()
    n = fixes.count()
    df = trip_stats(fixes, gap_s=43200)  # plan built once

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_dbscan(cpus: int) -> dict:
    """grid_dbscan at 5M fixes: collapse + bucket join + eps graph +
    connected components.  Iterative driver loop like measure_cc, so
    the plan is necessarily rebuilt per run (per-round planning is
    bounded and parallelism-independent)."""
    from geogeometry_spark.operators.cluster import grid_dbscan
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(spark, N_DBSCAN_USERS, 100).localCheckpoint()
    n = fixes.count()

    def run():
        grid_dbscan(fixes, eps_m=50.0).select(
            "event_id", "cluster_id"
        ).write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_map_match(cpus: int) -> dict:
    """map_match at N_MM_USERS x 100 metro fixes against the contract's
    400-segment street grid: broadcast covering + single-tile probe +
    partial min_by argmin.  Plan (and its bounded broadcast probe) is
    built once per session, outside the timer."""
    from geogeometry_spark.contract import _road_segments
    from geogeometry_spark.operators.map_match import map_match
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(
        spark, N_MM_USERS, 100, metro=True
    ).localCheckpoint()
    n = fixes.count()
    df = map_match(
        fixes, _road_segments(spark), max_dist_m=150.0, max_abs_lat=53.2
    )

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_segment_join(cpus: int) -> dict:
    """segment_join at 4x the bench input: 4M x 1M fix-derived short
    segments (20M global fixes, same deterministic deltas as bench.py).
    The exchanges are the cell-key candidate join + the pair dedup —
    both scale with candidates, not |A| x |B|."""
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.segment_join import segment_join
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(spark, N_SJ_USERS, 100).localCheckpoint()
    fixes.count()
    eid = F.col("event_id")
    seg_a = fixes.where(eid % 5 == 0).select(
        eid.alias("id_a"),
        F.col("lat").alias("alat1"),
        F.col("lon").alias("alon1"),
        (F.col("lat") + ((eid * 7) % 21 - 10).cast("double") / F.lit(1000.0)
         ).alias("alat2"),
        (F.col("lon") + ((eid * 11) % 21 - 10).cast("double") / F.lit(1000.0)
         ).alias("alon2"),
    )
    seg_b = fixes.where(eid % 20 == 0).select(
        eid.alias("id_b"),
        (F.col("lat") + F.lit(0.002)).alias("blat1"),
        (F.col("lon") - F.lit(0.004)).alias("blon1"),
        (F.col("lat") + ((eid * 13) % 25 - 12).cast("double") / F.lit(1000.0)
         ).alias("blat2"),
        (F.col("lon") + ((eid * 17) % 25 - 12).cast("double") / F.lit(1000.0)
         ).alias("blon2"),
    )
    n_a = seg_a.count()
    df = segment_join(seg_a, seg_b)

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_a_segments": n_a,
            "a_segments_per_sec": round(n_a / best, 1)}


def measure_hausdorff(cpus: int) -> dict:
    """hausdorff_join at 4x the bench input: 20M global fixes (200k
    trips).  Planet-spread bases keep qualifying pairs sparse, so the
    measured exchanges are sessionize + the head-ring equi-join against
    the 20M-fix cell relation — the operator's scale-critical shuffles."""
    from geogeometry_spark.operators.traj_similarity import hausdorff_join
    from geogeometry_spark.sources.tables import synthetic_fixes

    import gc

    spark = _session(cpus)
    fixes = synthetic_fixes(spark, N_TRAJ_USERS, 100).localCheckpoint()
    n = fixes.count()

    # the operator localCheckpoints its sessionized fix relation EAGERLY
    # at plan-construction time, so the DataFrame must be rebuilt inside
    # the timer or the sessionize window job escapes the measurement;
    # gc between runs releases the previous run's checkpoint blocks
    def run():
        hausdorff_join(fixes, tau_m=500.0, gap_s=43200).write.format(
            "noop"
        ).mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        gc.collect()
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_segment_speeds(cpus: int) -> dict:
    """segment_speeds (composed: window legs -> map_match carry ->
    per-segment integer rollup) at 4x the bench input: 20M metro fixes
    against the 400-segment street grid.  The big relation's only
    exchange is the session window; the rollup adds one partial-agg
    shuffle of |segments|-bounded rows per task."""
    from geogeometry_spark.contract import _road_segments
    from geogeometry_spark.operators.map_match import segment_speeds
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(
        spark, N_MM_USERS, 100, metro=True
    ).localCheckpoint()
    n = fixes.count()
    df = segment_speeds(
        fixes, _road_segments(spark), max_dist_m=150.0, max_abs_lat=53.2
    )

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_asof(cpus: int) -> dict:
    """asof_join at 4x the bench input: 20M events x 2M time probes
    through the union-tag window carry — ONE exchange over
    |events| + |queries| rows, partitioned by user."""
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.asof import asof_join
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(spark, N_TRAJ_USERS, 100).localCheckpoint()
    n = fixes.count()
    probes = fixes.where(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("query_id"),
        "user_id",
        (F.col("ts_sec") + F.lit(737)).alias("qts"),
    )
    df = asof_join(fixes, probes, ["lat", "lon"], horizon_s=3600)

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_events": n,
            "events_per_sec": round(n / best, 1)}


def measure_zonal(cpus: int) -> dict:
    """zonal_stats at 4x the bench input: 20M metro fixes rasterized to
    z15 tiles, rolled up over the contract's five zones.  Exchanges:
    the tile-key partial aggregate (relation-scale) + the config-scale
    zone aggregate."""
    from geogeometry_spark.contract import _ZONAL_ZONES
    from geogeometry_spark.operators.zonal import rasterize, zonal_stats
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(
        spark, N_MM_USERS, 100, metro=True
    ).localCheckpoint()
    n = fixes.count()
    df = zonal_stats(rasterize(fixes, 15), _ZONAL_ZONES, 15)

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def measure_hmm(cpus: int) -> dict:
    """hmm_trip_costs at 4x the bench input: 20M metro fixes against
    the 400-segment grid.  One big-side exchange (sessionize, reused by
    the fix-level collect and the grouped map); the Viterbi kernel is
    numpy min-plus per trip."""
    from geogeometry_spark.contract import _road_segments
    from geogeometry_spark.operators.hmm_match import hmm_trip_costs
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = _session(cpus)
    fixes = synthetic_fixes(
        spark, N_MM_USERS, 100, metro=True
    ).localCheckpoint()
    n = fixes.count()
    df = hmm_trip_costs(
        fixes, _road_segments(spark), max_dist_m=150.0,
        k_candidates=3, switch_penalty_m=60.0, max_abs_lat=53.2,
    )

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best or 1e9, time.perf_counter() - t0)
    spark.stop()
    return {"wall_s": round(best, 3), "n_fixes": n,
            "fixes_per_sec": round(n / best, 1)}


def main() -> None:
    args = sys.argv[1:]
    ops = {
        "overlay_400k": measure_overlay,
        "cc_6m_edges": measure_cc,
        "traj_trips_20m": measure_traj,
        "dbscan_5m": measure_dbscan,
        "map_match_20m": measure_map_match,
        "segment_join_4m": measure_segment_join,
        "hausdorff_20m": measure_hausdorff,
        "segment_speeds_20m": measure_segment_speeds,
        "asof_20m": measure_asof,
        "zonal_20m": measure_zonal,
        "hmm_20m": measure_hmm,
    }
    if "--op" in args:
        i = args.index("--op")
        sel = args[i + 1]
        args = args[:i] + args[i + 2:]
        ops = {k: v for k, v in ops.items() if sel in k}
    levels = [int(a) for a in args] or [8, 32]
    out: dict = {}
    for name, fn in ops.items():
        pts = {}
        for cpus in levels:
            pts[str(cpus)] = fn(cpus)
            print(f"# {name} local[{cpus}]: {pts[str(cpus)]}",
                  file=sys.stderr, flush=True)
        lo, hi = str(min(levels)), str(max(levels))
        ratio = max(levels) / min(levels)
        eff = (
            pts[lo]["wall_s"] / (pts[hi]["wall_s"] * ratio)
            if pts[hi]["wall_s"] else None
        )
        out[name] = {**pts, "efficiency_n_to_4n": round(eff, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
