#!/usr/bin/env python
"""Cluster job entry point — the spark-submit flow from BASELINE.json:

    cd /root/repo && zip -r /tmp/geogeometry_spark.zip geogeometry_spark
    spark-submit --py-files /tmp/geogeometry_spark.zip \
        scripts/submit_flagship.py \
        --input /data/sf0.1 --output /out/flagship

The session is created by spark-submit (cluster master, executor conf);
this script only declares the job: flagship pipeline + resumable
partitioned write with per-partition lineage metrics.  On a rerun with
--resume, committed partitions are skipped (sources.lineage manifest).

Local smoke (no cluster):
    python scripts/submit_flagship.py --input /root/testdata/sf0.001 \
        --output /tmp/flagship_out
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir of parquet tables, or table:<catalog.db>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64,
                    help="lineage partition count (doc-hash buckets); "
                    "reruns automatically skip committed buckets")
    ap.add_argument("--max-length", type=int, default=7)
    ap.add_argument("--zooms", default="8,12,16,22")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geogeometry_spark.plans.flagship import flagship
    from geogeometry_spark.sources.lineage import write_resumable

    spark = SparkSession.builder.appName("geogeometry-flagship").getOrCreate()
    out = flagship(
        spark,
        args.input,
        keep_spans=True,
        max_length=args.max_length,
        zooms=[int(z) for z in args.zooms.split(",")],
    )
    summary = write_resumable(
        out, args.output, key_col="doc_id", n_buckets=args.buckets
    )
    print(
        f"wrote {len(summary['written'])} buckets "
        f"({summary['rows']} rows), skipped "
        f"{len(summary['skipped'])} committed -> {args.output}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
