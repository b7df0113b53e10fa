#!/usr/bin/env python
"""N->4N scaling evidence for the round-4 session-3 additions
(BASELINE.json north_rule): the autocorrelation newcomers (lisa,
gearys_c, join_counts, general_g, gini), the per-user SDE, the Huff
catchment, and the pair-join newcomers (knox, st_dbscan) at 20M fixes
(4x the bench input — the noise-robust size the earlier scaling
scripts settled on; knox/st_dbscan run on the 20M METRO relation with
bench-tight thresholds so candidates stay pair-bounded).

Methodology of scripts/scaling_mobility.py: identical job on an
identical pre-materialized (localCheckpoint'd) fix relation at two
parallelism levels, one fresh Spark session per level, one warm-up per
operator, median of RUNS timed runs.

Prints one JSON line:
  {"<op>_20m": {"8": {...}, "32": {...}, "efficiency_n_to_4n": ...},
   ...}

Usage: python scripts/scaling_stats.py [cpus ...]  (default: 8 32)
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
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
HEAVY = os.environ.get("STATS_HEAVY", "1") == "1"


def measure(cpus: int) -> dict:
    from geogeometry_spark.operators.hotspot import (
        gearys_c,
        general_g,
        join_counts,
        local_morans_i,
        spatial_gini,
    )
    from geogeometry_spark.operators.routing import huff_catchment
    from geogeometry_spark.operators.trajectory import deviational_ellipse
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources.tables import synthetic_fixes

    spark = get_spark(
        app_name=f"scaling-stats-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixes = synthetic_fixes(spark, N_USERS, FIXES_PER_USER).localCheckpoint()
    n = fixes.count()
    huff_facs = [
        (k, 52.1 + (k // 4) * 0.25, 13.2 + (k % 4) * 0.4,
         1.0 + (k % 3) * 0.5)
        for k in range(16)
    ]

    ops = {
        "lisa": lambda: local_morans_i(fixes, zoom=8),
        "gearys_c": lambda: gearys_c(fixes, zoom=8),
        "join_counts": lambda: join_counts(fixes, zoom=8),
        "general_g": lambda: general_g(fixes, zoom=8),
        "gini": lambda: spatial_gini(fixes, zoom=8),
        "sde": lambda: deviational_ellipse(fixes),
    }
    metro = None
    if HEAVY:
        from geogeometry_spark.operators.cluster import st_dbscan
        from geogeometry_spark.operators.colocation import knox_test

        metro = synthetic_fixes(
            spark, N_USERS, FIXES_PER_USER, metro=True
        ).localCheckpoint()
        metro.count()
        ops["huff"] = lambda: huff_catchment(metro, huff_facs, zoom=12)
        ops["knox"] = lambda: knox_test(metro, delta_m=100.0, tau_s=900)
        ops["st_dbscan"] = lambda: st_dbscan(metro, eps_m=50.0, eps_t=1800)
    only = [s for s in os.environ.get("STATS_ONLY", "").split(",") if s]
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    out = {}
    for name, build in ops.items():
        runs = 1 if name in ("st_dbscan", "knox") else RUNS
        build().write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(runs):
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
