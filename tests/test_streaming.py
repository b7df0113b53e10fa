"""Structured Streaming flagship: incremental processing + checkpoint
resume (the streaming twin of the lineage manifest test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def spans_batches(spark, tmp_path):
    from geogeometry_spark.sources.tables import documents_with_spans

    docs = documents_with_spans(spark, "/root/testdata/sf0.001")
    b1 = docs.where(F.col("doc_id").cast("long") % 2 == 0)
    b2 = docs.where(F.col("doc_id").cast("long") % 2 == 1)
    inp = tmp_path / "input"
    b1.write.mode("append").parquet(str(inp))
    return inp, b1, b2


def _run_drain(spark, inp, tmp_path):
    from geogeometry_spark.streaming import stream_flagship

    q = stream_flagship(
        spark,
        str(inp),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(tmp_path / "out"))


def test_streaming_matches_batch_and_resumes(spark, tmp_path, spans_batches):
    from geogeometry_spark.plans.flagship import flagship

    inp, b1, b2 = spans_batches

    out1 = _run_drain(spark, inp, tmp_path)
    expected1 = flagship(spark, "/root/testdata/sf0.001", docs=b1).count()
    assert out1.count() == expected1

    # second batch lands; a new availableNow run processes ONLY new files
    b2.write.mode("append").parquet(str(inp))
    out2 = _run_drain(spark, inp, tmp_path)
    expected_total = flagship(
        spark, "/root/testdata/sf0.001"
    ).count()
    assert out2.count() == expected_total

    # a third run with nothing new is a no-op (checkpoint resume)
    out3 = _run_drain(spark, inp, tmp_path)
    assert out3.count() == expected_total

    # span sequences survive the streaming path untouched
    row = out2.select("doc_id", "spans").limit(1).collect()[0]
    assert row["spans"][0]["kind"] == "text"


def test_windowed_heatmap_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windowed tile counts: on-time rows aggregate per
    window; a row arriving later than the watermark behind max event
    time is dropped (state already evicted)."""
    import datetime as dt

    from geogeometry_spark.streaming.stateful import (
        EVENTS_SCHEMA,
        stream_tile_heatmap,
    )

    inp = tmp_path / "events_in"
    base = dt.datetime(2026, 1, 1, 0, 30)

    def mk(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("append").parquet(
            str(inp)
        )

    # batch 1: two events in hour 0, one in hour 5 (advances watermark
    # for batch 2 to 5:30 - 2h = 3:30)
    mk([
        (1, base, 52.5, 13.4),
        (2, base + dt.timedelta(minutes=5), 52.5, 13.4),
        (3, base + dt.timedelta(hours=5), 52.5, 13.4),
    ])

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(inp))
    agg = stream_tile_heatmap(stream, zoom=12, window="1 hour", watermark="2 hours")

    outdir = str(tmp_path / "hm_out")

    def drain(_name):
        q = (
            agg.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            ((r["window_start"].hour), r["tile_x"], r["tile_y"]): r["n"]
            for r in spark.read.parquet(outdir).collect()
        }

    got1 = drain("hm1")
    # append mode only emits windows the watermark has closed; hour-0
    # window (< 3:30 watermark) must be final with both on-time rows
    key0 = [k for k in got1 if k[0] == 0]
    assert len(key0) == 1 and got1[key0[0]] == 2

    # batch 2: a LATE row for hour 0 (event time far behind watermark)
    # plus a fresh row advancing time further
    mk([
        (4, base + dt.timedelta(minutes=10), 52.5, 13.4),  # late, dropped
        (5, base + dt.timedelta(hours=8), 52.5, 13.4),
    ])
    got2 = drain("hm2")
    # cumulative output: the hour-0 window must NOT gain the late row
    key0 = [k for k in got2 if k[0] == 0]
    assert len(key0) == 1 and got2[key0[0]] == 2, got2


def test_stateful_dedup_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicates are dropped
    within a batch, across micro-batches, and across query restarts
    (state restored from the checkpoint)."""
    from geogeometry_spark.streaming.stateful import stream_dedup_first_seen

    inp = tmp_path / "docs_in"
    ckpt = str(tmp_path / "ckpt_dedup")

    def mk(rows):
        spark.createDataFrame(rows, "doc_id string, text string").write.mode(
            "append"
        ).parquet(str(inp))

    mk([("1", "alpha"), ("2", "beta"), ("3", "alpha")])  # in-batch dup

    outdir = str(tmp_path / "dd_out")

    def drain():
        stream = spark.readStream.schema("doc_id string, text string").parquet(
            str(inp)
        )
        out = stream_dedup_first_seen(stream)
        q = (
            out.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(outdir).collect()

    r1 = drain()
    assert sorted(r["text"] for r in r1) == ["alpha", "beta"]

    # second drop: "alpha" again (cross-batch dup after restart) + new
    mk([("4", "alpha"), ("5", "gamma")])
    r2 = drain()  # restarted query, state restored from checkpoint
    assert sorted(r["text"] for r in r2) == ["alpha", "beta", "gamma"]


def test_stream_s2_heatmap_matches_batch(spark, tmp_path):
    """Streamed S2 cell counts (availableNow drain) equal the batch
    aggregation over the same rows — the Arrow encode UDF and the
    native bit algebra behave identically inside micro-batches."""
    import datetime as dt

    from pyspark.sql import functions as F

    from geogeometry_spark.functions.udfs import s2_cell_udf
    from geogeometry_spark.streaming.stateful import (
        EVENTS_SCHEMA,
        stream_s2_heatmap,
    )

    inp = tmp_path / "s2_events_in"
    base = dt.datetime(2026, 1, 1, 0, 15)
    rows = [
        (1, base, 52.5, 13.4),
        (2, base + dt.timedelta(minutes=9), 52.5, 13.4),
        (3, base + dt.timedelta(minutes=20), -33.86, 151.21),
        (4, base + dt.timedelta(hours=1, minutes=5), 52.5, 13.4),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(str(inp))

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(inp))
    agg = stream_s2_heatmap(stream, level=12)
    outdir = str(tmp_path / "s2_hm_out")

    def drain():
        (
            agg.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "s2_ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drain()
    # append-mode emits a window only once the watermark passes its end;
    # a far-future event advances it past every window above
    spark.createDataFrame(
        [(99, base + dt.timedelta(hours=6), 0.0, 0.0)], EVENTS_SCHEMA
    ).write.mode("append").parquet(str(inp))
    drain()
    got = {
        (r.window_start, r.cell, r.n)
        for r in spark.read.parquet(outdir).collect()
    }
    batch = (
        spark.createDataFrame(rows, EVENTS_SCHEMA)
        .select(
            F.window("ts", "1 hour").start.alias("window_start"),
            s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("cell"),
        )
        .groupBy("window_start", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exp = {(r.window_start, r.cell, r.n) for r in batch.collect()}
    assert got == exp and len(exp) == 3


def test_stream_geojson_features_matches_batch(spark, tmp_path):
    """The streaming NDJSON Feature source (sources/geojson_file.py
    stream_geojson_features) drains the same rows the batch reader
    returns, across two micro-batches (new files discovered per batch),
    and parse_points recovers the written coordinates exactly."""
    from pyspark.sql import functions as F

    from geogeometry_spark.operators.geojson import parse_points, point_geojson
    from geogeometry_spark.sources.geojson_file import (
        feature_line,
        read_geojson_features,
        stream_geojson_features,
    )

    inp = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")

    def write_batch(rows, mode):
        df = spark.createDataFrame(rows, "id long, lat double, lon double")
        df = df.withColumn("gj", point_geojson(F.col("lat"), F.col("lon")))
        df.select(feature_line("gj", ["id"]).alias("value")).write.mode(
            mode
        ).text(inp)

    write_batch([(1, 52.5, 13.4), (2, 48.8, 2.3)], "overwrite")

    stream = stream_geojson_features(spark, inp, props=["id"])

    def drain():
        (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drain()
    write_batch([(3, -33.86, 151.21)], "append")
    drain()

    streamed = spark.read.parquet(out)
    batch = read_geojson_features(spark, inp, props=["id"])
    assert streamed.columns == batch.columns
    key = lambda r: r["id"]
    assert sorted(map(tuple, streamed.collect()), key=lambda t: t[-1]) == sorted(
        map(tuple, batch.collect()), key=lambda t: t[-1]
    )
    parsed = {
        int(r["id"]): (r["lat"], r["lon"])
        for r in parse_points(streamed, "geometry", keep=["id"]).collect()
    }
    assert parsed == {1: (52.5, 13.4), 2: (48.8, 2.3), 3: (-33.86, 151.21)}


def test_stream_hex_heatmap_matches_batch(spark, tmp_path):
    """Streamed hexgrid cell counts (availableNow drain) equal the
    batch aggregation over the same rows — the fully native hex encode
    behaves identically inside micro-batches (SURVEY §2.4ter)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from geogeometry_spark.functions.hexcell import hex_cell
    from geogeometry_spark.streaming.stateful import (
        EVENTS_SCHEMA,
        stream_hex_heatmap,
    )

    inp = tmp_path / "hex_events_in"
    base = dt.datetime(2026, 1, 1, 0, 15)
    rows = [
        (1, base, 52.5, 13.4),
        (2, base + dt.timedelta(minutes=9), 52.5, 13.4),
        (3, base + dt.timedelta(minutes=20), -33.86, 151.21),
        (4, base + dt.timedelta(hours=1, minutes=5), 52.5, 13.4),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(str(inp))

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(inp))
    agg = stream_hex_heatmap(stream, res=9)
    outdir = str(tmp_path / "hex_hm_out")

    def drain():
        (
            agg.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "hex_ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drain()
    spark.createDataFrame(
        [(99, base + dt.timedelta(hours=6), 0.0, 0.0)], EVENTS_SCHEMA
    ).write.mode("append").parquet(str(inp))
    drain()
    got = {
        (r.window_start, r.hex_id, r.n)
        for r in spark.read.parquet(outdir).collect()
    }
    batch = (
        spark.createDataFrame(rows, EVENTS_SCHEMA)
        .select(
            F.window("ts", "1 hour").start.alias("window_start"),
            hex_cell(F.col("lat"), F.col("lon"), 9).alias("hex_id"),
        )
        .groupBy("window_start", "hex_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exp = {(r.window_start, r.hex_id, r.n) for r in batch.collect()}
    assert got == exp and len(exp) == 3


def test_stream_sessionize_session_windows(spark, tmp_path):
    """Native session windows: fixes closer than gap merge into one
    session; the watermark closes and emits sessions; a late fix for a
    closed session is dropped, not re-opened."""
    import datetime as dt

    from geogeometry_spark.streaming.stateful import (
        FIXES_SCHEMA,
        stream_sessionize,
    )

    inp = tmp_path / "fixes_in"
    base = dt.datetime(2026, 1, 1, 0, 0)

    def mk(rows):
        spark.createDataFrame(rows, FIXES_SCHEMA).write.mode(
            "append"
        ).parquet(str(inp))

    # user 7: two fixes 10 min apart (one session), then one 2 h later
    # (second session); user 9: one fix.  The hour-8 fix advances the
    # watermark (8:00 - 2 h = 6:00) far past all of them.
    mk([
        (1, 7, base, 52.5, 13.4),
        (2, 7, base + dt.timedelta(minutes=10), 52.51, 13.41),
        (3, 7, base + dt.timedelta(hours=2), 52.6, 13.5),
        (4, 9, base + dt.timedelta(minutes=5), 48.1, 11.6),
        (5, 9, base + dt.timedelta(hours=8), 48.2, 11.7),
    ])

    stream = spark.readStream.schema(FIXES_SCHEMA).parquet(str(inp))
    agg = stream_sessionize(stream, gap="30 minutes", watermark="2 hours")
    outdir = str(tmp_path / "sess_out")

    def drain():
        q = (
            agg.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.session_start.hour, r.session_start.minute,
             r.n_fixes)
            for r in spark.read.parquet(outdir).collect()
        )

    got1 = drain()
    # all sessions older than 6:00 are closed: user 7 x2, user 9's 0:05
    assert got1 == [(7, 0, 0, 2), (7, 2, 0, 1), (9, 0, 5, 1)]

    # a LATE fix inside user 7's first (closed) session must be dropped
    mk([
        (6, 7, base + dt.timedelta(minutes=5), 52.5, 13.4),   # late
        (7, 9, base + dt.timedelta(hours=12), 48.2, 11.7),    # advance
    ])
    got2 = drain()
    # first session still n_fixes=2; user 9's hour-8 fix now closed too
    assert got2 == [
        (7, 0, 0, 2), (7, 2, 0, 1), (9, 0, 5, 1), (9, 8, 0, 1)
    ]


def test_stream_geofence_transitions(spark, tmp_path):
    """Per-user geofence enter/exit via applyInPandasWithState: a user
    crossing into a fence emits enter, leaving emits exit; membership
    persists across micro-batches (no re-enter without an exit); a fix
    older than already-applied state is dropped; a user who never
    crosses emits nothing."""
    import datetime as dt

    from geogeometry_spark.streaming.stateful import (
        FIXES_SCHEMA,
        stream_geofence,
    )

    # two square fences: A around (52.5, 13.4), B around (48.1, 11.6)
    fences = [
        ("A", [[13.3, 52.4], [13.5, 52.4], [13.5, 52.6],
               [13.3, 52.6], [13.3, 52.4]]),
        ("B", [[11.5, 48.0], [11.7, 48.0], [11.7, 48.2],
               [11.5, 48.2], [11.5, 48.0]]),
    ]
    inp = tmp_path / "gf_in"
    base = dt.datetime(2026, 1, 1, 0, 0)

    def mk(rows):
        spark.createDataFrame(rows, FIXES_SCHEMA).write.mode(
            "append"
        ).parquet(str(inp))

    # batch 1: user 7 outside -> inside A (enter at :10); user 9
    # starts inside B (enter at :00); user 11 never inside anything
    mk([
        (1, 7, base, 50.0, 10.0),
        (2, 7, base + dt.timedelta(minutes=10), 52.5, 13.4),
        (3, 9, base, 48.1, 11.6),
        (4, 11, base, 0.0, 0.0),
    ])

    stream = spark.readStream.schema(FIXES_SCHEMA).parquet(str(inp))
    out = stream_geofence(stream, fences)
    outdir = str(tmp_path / "gf_out")

    def drain():
        q = (
            out.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "gf_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.ts.minute + 60 * r.ts.hour, r.fence_id,
             r.transition)
            for r in spark.read.parquet(outdir).collect()
        )

    assert drain() == [(7, 10, "A", "enter"), (9, 0, "B", "enter")]

    # batch 2: user 7 stays inside A (no event), then leaves (exit);
    # user 9 late fix BEFORE its applied state -> dropped entirely
    mk([
        (5, 7, base + dt.timedelta(minutes=20), 52.55, 13.45),
        (6, 7, base + dt.timedelta(minutes=30), 50.0, 10.0),
        (7, 9, base - dt.timedelta(minutes=5), 0.0, 0.0),
    ])
    assert drain() == [
        (7, 10, "A", "enter"),
        (7, 30, "A", "exit"),
        (9, 0, "B", "enter"),
    ]
