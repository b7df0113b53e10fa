#!/usr/bin/env python
"""N->4N scaling evidence for the hexgrid bulk k-ring join (round 4).

Same methodology as scripts/scaling.py: identical hex_radius_join_bulk
job (5M-point materialized input, the bench.py circle fixture
shape — 2-6 km circles, every Q_MOD-th doc, default 1250 circles) at two parallelism levels, one fresh Spark
session per level, DataFrame built ONCE per session (plan construction
is parallelism-independent), >=1 warm-up + best-of-N timed runs.

Prints one JSON line:
  {"points": {"8": {"wall_s": ..., "rows_per_sec": ...}, ...},
   "efficiency_n_to_4n": ..., "n_points": ...}

Usage: python scripts/scaling_hex.py [cpus ...]   (default: 8 32)
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
# query modulus: doc_id % Q_MOD == 0 circles. 4 -> 1250 circles at the
# 5000-doc sf0.1 table (10x the bench fixture) so the join output
# (~150M pairs) amortizes fixed stage costs at every parallelism level
# -- at the bench's 125 circles the 1.5 s wall is mostly scheduling +
# broadcast build and the ratio measures overhead, not the operator.
Q_MOD = int(os.environ.get("STRETCH_HEX_QMOD", "4"))


def measure(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from bench import materialize_input
    from geogeometry_spark.operators.hex_join import hex_radius_join_bulk
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources import tables as src

    spark = get_spark(
        app_name=f"scaling-hex-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path, n_docs = materialize_input(spark, SF_DIR, AMPLIFY)
    pts = src.with_true_coords(
        spark.read.parquet(path).select(
            F.col("doc_id").cast("long").alias("doc_id")
        )
    ).select("doc_id", "lat", "lon")
    qs = (
        src.with_true_coords(
            src.load_table(spark, SF_DIR, "documents").select("doc_id")
        )
        .where(F.col("doc_id").cast("long") % Q_MOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
            (
                F.lit(2000.0)
                + (F.col("doc_id").cast("long") % 5) * F.lit(1000.0)
            ).alias("radius_m"),
        )
    )
    out = hex_radius_join_bulk(pts, qs, broadcast_queries=True)
    walls = []
    for i in range(RUNS + 1):
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        if i > 0:  # first run is warm-up
            walls.append(wall)
    spark.stop()
    best = min(walls)
    return {
        "wall_s": round(best, 3),
        "rows_per_sec": round(n_docs / best, 1),
        "walls": [round(w, 3) for w in walls],
        "n_points": n_docs,
    }


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    points = {}
    for cpus in levels:
        points[str(cpus)] = measure(cpus)
    out = {"points": points}
    if len(levels) >= 2:
        lo, hi = str(levels[0]), str(levels[-1])
        ratio = levels[-1] / levels[0]
        out["efficiency_n_to_4n"] = round(
            points[hi]["rows_per_sec"] / (ratio * points[lo]["rows_per_sec"]),
            3,
        )
    out["n_points"] = points[str(levels[0])]["n_points"]
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
