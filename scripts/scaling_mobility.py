#!/usr/bin/env python
"""N->4N scaling evidence for the round-4 mobility/statistics family
(BASELINE.json north_rule): mobility_metrics, heading_stats,
cell_transitions, and mann_kendall_trend at 20M fixes (200k users x
100 — 4x the bench input, the noise-robust size the flagship/traj
measurements settled on).

Methodology of scripts/scaling.py / scaling_stretch.py: identical job
on an identical pre-materialized (localCheckpoint'd) fix relation at
two parallelism levels, one fresh Spark session per level, a small
warm-up run per operator to prime codegen/shuffle, median of RUNS
timed runs.  These operators are the window-family shape (ONE
user-hash exchange + map-side-combined aggregates), so they should
scale like traj_trips (0.8+ once walls clear the fixed cost), not
like the shuffle-I/O-bound CC/macro-round profile.

Prints one JSON line:
  {"<op>_20m": {"8": {"wall_s": ..., "fixes_per_sec": ...}, "32":
   {...}, "efficiency_n_to_4n": ...}, ...}

Usage: python scripts/scaling_mobility.py [cpus ...]  (default: 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_USERS = int(os.environ.get("MOBILITY_USERS", "200000"))
FIXES_PER_USER = int(os.environ.get("MOBILITY_FIXES", "100"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))


def measure(cpus: int) -> dict:
    from geogeometry_spark.operators.hotspot import (
        emerging_hotspots,
        mann_kendall_trend,
    )
    from geogeometry_spark.operators.trajectory import (
        cell_transitions,
        heading_stats,
        mobility_metrics,
    )
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = get_spark(
        app_name=f"scaling-mobility-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixes = synthetic_fixes(spark, N_USERS, FIXES_PER_USER).localCheckpoint()
    n = fixes.count()

    ops = {
        "mobility": lambda: mobility_metrics(fixes, zoom=14),
        "heading": lambda: heading_stats(fixes, gap_s=43200),
        "transitions": lambda: cell_transitions(fixes, zoom=12),
        "mann_kendall": lambda: mann_kendall_trend(
            fixes, t0=1704067200, bucket_s=14400, n_buckets=12, zoom=8
        ),
        "emerging": lambda: emerging_hotspots(
            fixes, t0=1704067200, bucket_s=14400, n_buckets=12, zoom=8
        ),
    }
    if os.environ.get("MOBILITY_V85") == "1":
        from geogeometry_spark.contract import _road_segments
        from geogeometry_spark.operators.map_match import (
            segment_speed_percentiles,
        )

        metro = synthetic_fixes(
            spark, N_USERS, FIXES_PER_USER, metro=True
        ).localCheckpoint()
        metro.count()
        ops["v85"] = lambda: segment_speed_percentiles(
            metro, _road_segments(spark), max_dist_m=150.0,
            max_abs_lat=53.2,
        )
    out = {}
    for name, build in ops.items():
        build().write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        wall = sorted(samples)[len(samples) // 2]
        out[name] = {
            "wall_s": round(wall, 2),
            "fixes_per_sec": round(n / wall),
            "samples": [round(s, 2) for s in samples],
        }
    spark.stop()
    out["n_fixes"] = n
    return out


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    raw = {str(c): measure(c) for c in levels}
    lo, hi = str(min(levels)), str(max(levels))
    ratio = max(levels) / min(levels)
    out = {}
    for op in raw[lo]:
        if op == "n_fixes":
            continue
        out[f"{op}_20m"] = {
            **{c: raw[c][op] for c in raw},
            "efficiency_n_to_4n": round(
                raw[hi][op]["fixes_per_sec"]
                / (ratio * raw[lo][op]["fixes_per_sec"]),
                3,
            ),
        }
    out["n_fixes"] = raw[lo]["n_fixes"]
    line = json.dumps(out, separators=(",", ":"))
    out_path = os.environ.get("SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
