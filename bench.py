#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Headline: the flagship pipeline (extract coords from spans -> geohash ->
broadcast PIP join -> tile assignment) over an amplified documents table
(the sandbox table is tiny; amplification synthesizes deterministic
virtual doc_ids so throughput numbers mean something), plus per-operator
timings at the native sf.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_AMPLIFY (default 200 -> 1M docs at
sf0.1), BENCH_RUNS (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("BENCH_AMPLIFY", "200"))
RUNS = int(os.environ.get("BENCH_RUNS", "1"))


def main() -> None:
    from pyspark.sql import functions as F

    from geogeometry_spark import contract
    from geogeometry_spark.plans.flagship import flagship
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources.tables import (
        amplified_documents,
        documents_with_spans,
    )

    spark = get_spark(
        app_name="geogeometry-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # --- flagship: amplified documents, count(rows) forces full exec ---
    base = amplified_documents(spark, SF_DIR, AMPLIFY).cache()
    n_docs = base.count()  # materialize amplification outside the timer
    docs = documents_with_spans(spark, SF_DIR, docs=base)

    def run_flagship():
        flagship(spark, SF_DIR, keep_spans=True, docs=docs).write.format(
            "noop"
        ).mode("overwrite").save()

    timed("flagship_pip_tiles", run_flagship)
    docs_per_sec = round(n_docs / timings["flagship_pip_tiles"], 1)

    # --- per-operator headline queries at the native sf ---
    for name in (
        "geohash_encode",
        "tile_assign",
        "pip_join",
        "knn",
        "radius_join",
        "tile_heatmap",
        "distances",
        "salted_cell_counts",
        "minhash_candidates",
        "ann_brute",
        "token_stats",
    ):
        builder = contract.QUERIES[name]
        timed(
            name,
            lambda b=builder: b(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "flagship PIP join + tile assignment wall time (amplified docs) + operator suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "docs_per_sec": docs_per_sec,
                "n_docs": n_docs,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
