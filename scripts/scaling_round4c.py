#!/usr/bin/env python
"""N->4N scaling evidence for the round-4 session-4 additions
(BASELINE.json north_rule): the point-pattern newcomers (clark_evans,
variogram, entropy) at 20M fixes, the graph newcomers (hits,
harmonic closeness, Boruvka MST) on the 65k-node / 712k-edge road
lattice, and the threshold-match DP joins (lcss, edr) at 5M fixes
(pair-join workloads keep the smaller relation so candidates stay
bounded, mirroring scaling_stats.py's knox/st_dbscan choice).

Methodology of scripts/scaling_mobility.py: identical job on an
identical pre-materialized (localCheckpoint'd) input at two
parallelism levels, one fresh Spark session per level, one warm-up
per operator, median of RUNS timed runs (runs=1 for the iterative
drivers whose job count is fixed — the loop IS the measurement).

Prints one JSON line:
  {"<op>_<size>": {"8": {...}, "32": {...},
   "efficiency_n_to_4n": ...}, ...}

Usage: python scripts/scaling_round4c.py [cpus ...]  (default: 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_USERS = int(os.environ.get("STATS_USERS", "200000"))
FIXES_PER_USER = int(os.environ.get("STATS_FIXES", "100"))
DP_USERS = int(os.environ.get("DP_USERS", "50000"))
ROAD_SIDE = int(os.environ.get("ROAD_SIDE", "256"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))


def measure(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.density import clark_evans, variogram
    from geogeometry_spark.operators.graph import boruvka_mst
    from geogeometry_spark.operators.hotspot import spatial_entropy
    from geogeometry_spark.operators.pagerank import hits
    from geogeometry_spark.operators.routing import harmonic_closeness
    from geogeometry_spark.operators.traj_similarity import (
        edr_join,
        lcss_join,
    )
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources.tables import (
        synthetic_fixes,
        synthetic_road_graph,
    )

    spark = get_spark(
        app_name=f"scaling-r4c-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    fixes = synthetic_fixes(spark, N_USERS, FIXES_PER_USER).localCheckpoint()
    n_fixes = fixes.count()
    metro = synthetic_fixes(
        spark, N_USERS, FIXES_PER_USER, metro=True
    ).localCheckpoint()
    metro.count()
    vg_pts = metro.withColumn("reading", (F.col("event_id") * 31) % 8)
    dp_fixes = synthetic_fixes(spark, DP_USERS, 100).localCheckpoint()
    n_dp = dp_fixes.count()
    roads = synthetic_road_graph(spark, ROAD_SIDE).localCheckpoint()
    n_edges = roads.count()
    one_way = roads.where((F.col("src") * 13 + F.col("dst")) % 3 != 0)
    corners = [
        0, ROAD_SIDE - 1,
        ROAD_SIDE * (ROAD_SIDE - 1), ROAD_SIDE * ROAD_SIDE - 1,
    ]
    lm = spark.createDataFrame([(n,) for n in corners], "node int")

    # (name, builder, unit-count for throughput, timed runs)
    ops = [
        ("clark_evans_20m",
         lambda: clark_evans(metro, r_max_m=100.0, area_m2=1.5e10,
                             max_abs_lat=54.0), n_fixes, 1),
        ("variogram_20m",
         lambda: variogram(vg_pts, value_col="reading",
                           lag_edges_m=[25.0, 50.0, 100.0],
                           max_abs_lat=54.0), n_fixes, 1),
        ("entropy_20m",
         lambda: spatial_entropy(fixes, zoom=8), n_fixes, RUNS),
        ("hits_road65k",
         lambda: hits(one_way, rounds=8), n_edges, 1),
        ("closeness_road65k",
         lambda: harmonic_closeness(roads, lm), n_edges, 1),
        ("mst_road65k",
         lambda: boruvka_mst(roads), n_edges, 1),
        ("traj_lcss_5m",
         lambda: lcss_join(dp_fixes, eps_m=250.0, min_sim=0.5,
                           gap_s=43200), n_dp, 1),
        ("traj_edr_5m",
         lambda: edr_join(dp_fixes, eps_m=250.0, max_edits=12,
                          gap_s=43200), n_dp, 1),
    ]
    out = {}
    for name, build, units, runs in ops:
        build().write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        wall = sorted(samples)[len(samples) // 2]
        out[name] = {
            "wall_s": round(wall, 2),
            "units_per_sec": round(units / wall),
            "samples": [round(s, 2) for s in samples],
        }
    spark.stop()
    out["_sizes"] = {
        "n_fixes": n_fixes, "n_dp_fixes": n_dp, "road_edges": n_edges
    }
    return out


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    raw = {str(c): measure(c) for c in levels}
    lo, hi = str(min(levels)), str(max(levels))
    ratio = max(levels) / min(levels)
    out = {}
    for op in raw[lo]:
        if op.startswith("_"):
            continue
        out[op] = {
            **{c: raw[c][op] for c in raw},
            "efficiency_n_to_4n": round(
                raw[hi][op]["units_per_sec"]
                / (ratio * raw[lo][op]["units_per_sec"]),
                3,
            ),
        }
    out["sizes"] = raw[lo]["_sizes"]
    line = json.dumps(out, separators=(",", ":"))
    out_path = os.environ.get("SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
