#!/usr/bin/env python
"""Quiet-window re-measure of the winnowing rolling-hash kernel
(VERDICT r3 item 5: the r3 bench spread [5.5, 33.6] s was too wide to
grade).  Median-of-5 plus a co-tenant CONTROL measured back-to-back:
a pure scan+decode pass over the same input, so host noise shows up in
the control rather than being attributed to the kernel.  Prints one
JSON line with docs/s and the spread of both.

Usage: python scripts/winnow_measure.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import functions as F

    from geogeometry_spark.operators import text as text_ops
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources import tables as src

    spark = get_spark(app_name="winnow-measure",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = src.amplified_documents(spark, SF_DIR, 100).localCheckpoint()
    n = docs.count()

    fp = text_ops.winnow_fingerprint(docs, k=16, w=8)  # plan built once
    control = docs.select(F.sum(F.length("text")).alias("b"))

    def timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    timed(fp)  # warm-up
    timed(control)
    pairs = [(timed(fp), timed(control)) for _ in range(runs)]
    ws = sorted(p[0] for p in pairs)
    cs = sorted(p[1] for p in pairs)
    med = ws[len(ws) // 2]
    print(json.dumps({
        "n_docs": n,
        "winnow_median_s": med,
        "winnow_spread": [ws[0], ws[-1]],
        "winnow_docs_per_sec": round(n / med, 1),
        "control_scan_median_s": cs[len(cs) // 2],
        "control_spread": [cs[0], cs[-1]],
        "interleaved_pairs": pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
