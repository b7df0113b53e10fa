#!/usr/bin/env python
"""Shuffle-reduction evidence for the overlay join's slim-bbox prune
(VERDICT r3 item 3): on the bench fixture (100k x 150 boxes over the
Berlin hot cluster), count the rows that would carry RING PAYLOADS into
a join under the r3 plan (every non-certain candidate pair) vs the r4
plan (bbox survivors only), and report the reduction plus the measured
wall of the full operator.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("BENCH_AMPLIFY", "1000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from bench import materialize_input
    from geogeometry_spark.operators.s2_join import (
        polygon_boxes_df,
        s2_cover_polygons_df,
        s2_overlay_join,
    )
    from geogeometry_spark.plans.session import get_spark
    from geogeometry_spark.sources import tables as src

    spark = get_spark(app_name="overlay-evidence",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
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

    a = boxes(hot, 100_000, F.lit(0.002), F.lit(0.0012))
    b = boxes(hot.where(F.col("doc_id").cast("long") % 97 == 0),
              150, F.lit(0.02), F.lit(0.012))
    level = 13

    cov_a = s2_cover_polygons_df(a, level=level).select(
        F.col("polygon_id").alias("id_a"), "cell_key",
        F.col("is_border").alias("_ba"),
    )
    cov_b = s2_cover_polygons_df(b, level=level).select(
        F.col("polygon_id").alias("id_b"), "cell_key",
        F.col("is_border").alias("_bb"),
    )
    cand = (
        cov_a.join(cov_b, "cell_key")
        .groupBy("id_a", "id_b")
        .agg(F.max(~F.col("_ba") & ~F.col("_bb")).alias("_certain"))
    )
    noncertain = cand.where(~F.col("_certain")).select("id_a", "id_b")
    n_noncertain = noncertain.count()

    a_box = polygon_boxes_df(a, "id_a", "_boxa")
    b_box = polygon_boxes_df(b, "id_b", "_boxb")
    overlap = ~(
        (F.col("_boxa.w") > F.col("_boxb.e"))
        | (F.col("_boxa.e") < F.col("_boxb.w"))
        | (F.col("_boxa.s") > F.col("_boxb.n"))
        | (F.col("_boxa.n") < F.col("_boxb.s"))
    )
    survivors = (
        noncertain.join(a_box, "id_a").join(b_box, "id_b")
        .where(F.col("_boxa").isNull() | F.col("_boxb").isNull() | overlap)
    )
    n_survivors = survivors.count()

    df = s2_overlay_join(a, b, level=level)
    df.write.format("noop").mode("overwrite").save()  # warm-up
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    walls.sort()
    print(json.dumps({
        "fixture": "overlay 100k x 150, level 13, sf0.1 x1000",
        "noncertain_candidate_pairs": n_noncertain,
        "bbox_survivor_pairs": n_survivors,
        "ring_payload_rows_r3_plan": n_noncertain,
        "ring_payload_rows_r4_plan": n_survivors,
        "reduction_pct": round(100 * (1 - n_survivors / n_noncertain), 1),
        "overlay_wall_s_median3": walls[1],
        "overlay_wall_spread": [walls[0], walls[-1]],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
