#!/usr/bin/env python
"""N->4N scaling evidence for the routing family (BASELINE.json
north_rule): multi-source frontier Bellman-Ford over a 1024x1024
geodesic lattice with skip-8/skip-64/skip-512 highway tiers
(1,048,576 nodes, ~16M directed edges).

Why this size: at 512^2 / 3M edges the fixed point lands in ~45
rounds of ~66k average relaxations each — pure per-round scheduling
latency, measured wall IDENTICAL at local[8] and local[32] (62.9 vs
63.5 s, efficiency 0.25).  That measures the scheduler, not the
operator.  The third highway tier holds round count at ~45 while
growing per-round relaxation work 16x, the regime a continental road
graph (hundreds of millions of edges) occupies at 100 TB.

Same methodology as scripts/scaling.py: identical job on an identical
pre-materialized (localCheckpoint'd) edge relation at two parallelism
levels, one fresh Spark session per level, a small warm-up sweep
(side=64) to prime JIT + shuffle machinery before the timed run.

The lattice's highway hierarchy bounds the optimal-path hop diameter
(~45 rounds) INDEPENDENT of lattice size, so scaling up the graph
grows per-round relaxation work while holding round count fixed —
exactly the regime a continental road network occupies, and the right
shape for a cores-scaling measurement (an iterative loop whose rounds
are pure fixed cost would measure the scheduler, not the operator).
Per-round driver planning is parallelism-independent fixed cost that a
real cluster amortizes, so the reported efficiency is a LOWER bound.

Two measurements per level:

- ``sssp`` — the end-to-end sweep.  Its wall = rounds x (fixed
  per-round orchestration f + distributed compute c).  f (driver
  planning, job barrier, localCheckpoint submit, Observation fetch) is
  parallelism-INDEPENDENT and measured at ~4-5 s/round on this host,
  so the end-to-end efficiency is a floor set by Amdahl, not by the
  operator (at 512^2 the wall was IDENTICAL at local[8]/local[32]).
- ``macro_round`` — ONE full-frontier round (every node seeded at
  cost 0, max_rounds=1): the relaxation join + per-node min + merge +
  checkpoint that repeats every round, with the frontier at its
  maximum.  This is the unit that must scale with cores/executors at
  100 TB, measured without the sequential round barrier.

Prints one JSON line:
  {"sssp_1024": {"8": {"wall_s": ..., "nodes_per_sec": ...}, ...,
   "efficiency_n_to_4n": ...},
   "macro_round_2048": {"8": {...}, "32": {...},
   "efficiency_n_to_4n": ...}, ...}

Usage: python scripts/scaling_routing.py [cpus ...]   (default: 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIDE = int(os.environ.get("ROUTING_SIDE", "1024"))
ROUND_SIDE = int(os.environ.get("ROUTING_ROUND_SIDE", "2048"))
SKIPS = tuple(
    int(k)
    for k in os.environ.get("ROUTING_SKIPS", "8,64,512").split(",")
)
RUNS = int(os.environ.get("SCALING_RUNS", "1"))
ROUND_RUNS = int(os.environ.get("ROUTING_ROUND_RUNS", "3"))


def measure(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.routing import sssp
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources.tables import synthetic_road_graph

    spark = get_spark(
        app_name=f"scaling-routing-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    seed = spark.range(1).select(F.lit(0).cast("int").alias("node"))

    # warm-up: full sweep on a 64x64 lattice primes codegen + shuffle
    warm = synthetic_road_graph(spark, 64).localCheckpoint()
    warm.count()
    sssp(warm, seed).write.format("noop").mode("overwrite").save()

    samples = []
    n_edges = None
    if os.environ.get("ROUTING_SKIP_SWEEP") != "1":
        edges = synthetic_road_graph(
            spark, SIDE, skips=SKIPS
        ).localCheckpoint()
        n_edges = edges.count()  # materialize outside the timer
        for _ in range(RUNS):
            t0 = time.perf_counter()
            sssp(edges, seed).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
    wall = sorted(samples)[len(samples) // 2] if samples else None

    # macro-round: every node on the frontier, exactly one round of
    # relax + per-node min + full-outer merge + checkpoint — the
    # distributed unit a round repeats, without the sequential barrier
    import warnings

    big = synthetic_road_graph(spark, ROUND_SIDE, skips=SKIPS)
    big = big.localCheckpoint()
    n_big = big.count()
    all_nodes = spark.range(ROUND_SIDE * ROUND_SIDE).select(
        F.col("id").cast("int").alias("node")
    )
    rsamples = []
    for _ in range(ROUND_RUNS):
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            sssp(big, all_nodes, max_rounds=1).write.format("noop").mode(
                "overwrite"
            ).save()
        rsamples.append(time.perf_counter() - t0)
    rwall = sorted(rsamples)[len(rsamples) // 2]
    spark.stop()
    return {
        "sssp": None if wall is None else {
            "wall_s": round(wall, 2),
            "nodes_per_sec": round(SIDE * SIDE / wall),
            "samples": [round(s, 2) for s in samples],
            "directed_edges": n_edges,
        },
        "macro_round": {
            "wall_s": round(rwall, 2),
            "edges_relaxed_per_sec": round(n_big / rwall),
            "samples": [round(s, 2) for s in rsamples],
            "directed_edges": n_big,
        },
    }


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    raw = {str(c): measure(c) for c in levels}
    lo, hi = str(min(levels)), str(max(levels))
    ratio = max(levels) / min(levels)

    def eff(key: str, rate: str) -> float:
        return round(
            raw[hi][key][rate] / (ratio * raw[lo][key][rate]), 3
        )

    out = {
        f"macro_round_{ROUND_SIDE}": {
            **{c: raw[c]["macro_round"] for c in raw},
            "efficiency_n_to_4n": eff(
                "macro_round", "edges_relaxed_per_sec"
            ),
        },
    }
    if raw[lo]["sssp"] is not None:
        out[f"sssp_{SIDE}"] = {
            **{c: raw[c]["sssp"] for c in raw},
            "efficiency_n_to_4n": eff("sssp", "nodes_per_sec"),
        }
    line = json.dumps(out, separators=(",", ":"))
    # JVM gc/alloc warnings share stdout in local mode, so a pipe that
    # keeps "the last line" can lose the payload — always mirror to a
    # file when SCALING_OUT is set
    out_path = os.environ.get("SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
