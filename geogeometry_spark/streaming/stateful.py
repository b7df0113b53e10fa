"""Streaming operators with event-time and cross-batch state.

Two engine-side capabilities the batch layer cannot express:

- stream_tile_heatmap: event-time windowed tile counts with a watermark
  — late events inside the watermark still update their window; events
  later than the watermark are dropped and the window state is evicted
  (bounded state at 100 TB/day ingest).  Batch twin: the oracle-checked
  ``events_tile_hourly`` contract query.
- stream_dedup_first_seen: cross-micro-batch exact dedup via
  applyInPandasWithState — per text-hash GroupState remembers whether
  the hash was emitted before, so re-ingested duplicates are suppressed
  across batches AND across restarts (state lives in the checkpoint).
  The shuffle key is the 128-bit md5 (uniform), so state is evenly
  spread over partitions; per-key state is one boolean.

The reference has no streams (SURVEY.md §2.12) — this is the
Spark-first surface of the same operators.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


def stream_tile_heatmap(
    events: DataFrame,
    zoom: int = 12,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed tile heat counts over a streaming DataFrame.

    Rows later than ``watermark`` behind the max seen event time are
    dropped and their windows finalized (state eviction keeps the agg
    bounded); anything newer still updates its window.  The aggregation
    is the same native tile math as the batch ``events_tile_hourly``
    query, so batch and stream answers agree for on-time data."""
    from ..functions import columns as C

    x, y = C.tile_xy(F.col("lat"), F.col("lon"), zoom)
    tiled = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col), x.alias("tile_x"), y.alias("tile_y")
    )
    return (
        tiled.groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "tile_x",
            "tile_y",
            "n",
        )
    )


_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])

_DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_md5", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Emit the first row for a hash key; afterwards the GroupState
    marks the key seen and every later occurrence (same batch or any
    future batch) is dropped."""
    if state.exists:
        # already emitted in an earlier micro-batch
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            first = pdf.iloc[:1]
    state.update((True,))
    if first is not None:
        yield first[["text_md5", "doc_id", "text"]]


def stream_dedup_first_seen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-batch exact dedup: keep the first-ever row per md5(text).

    applyInPandasWithState keyed on the text hash; state (one boolean
    per distinct hash) lives in the streaming checkpoint, so duplicates
    are suppressed across micro-batches and across restarts.  At scale
    the state store grows with DISTINCT corpus size only, spread evenly
    by the uniform hash key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_s2_heatmap(
    events: DataFrame,
    level: int = 12,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed S2 cell counts — ``stream_tile_heatmap`` on
    the S2 index (SURVEY §2.4bis).  The Arrow-batched encode UDF runs
    inside the streaming micro-batch exactly as in batch plans; the
    watermark bounds the window state identically."""
    from ..functions.udfs import s2_cell_udf

    cells = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        s2_cell_udf(level)(F.col("lat"), F.col("lon")).alias("cell"),
    )
    return (
        cells.groupBy(F.window(F.col(ts_col), window), "cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "cell", "n")
    )


def stream_hex_heatmap(
    events: DataFrame,
    res: int = 9,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed hexgrid cell counts — ``stream_tile_heatmap``
    on the hexagonal index (SURVEY §2.4ter).  The encode is a fully
    native Column (functions/hexcell.py — no Python worker at all, the
    cheapest of the three index families to stream); the watermark
    bounds the window state identically to the tile/S2 twins."""
    from ..functions.hexcell import hex_cell

    cells = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        hex_cell(F.col("lat"), F.col("lon"), res).alias("hex_id"),
    )
    return (
        cells.groupBy(F.window(F.col(ts_col), window), "hex_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "hex_id", "n")
    )


FIXES_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


GEOFENCE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("fence_id", T.StringType()),
        T.StructField("transition", T.StringType()),
    ]
)

_GEOFENCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("inside", T.ArrayType(T.StringType())),
        T.StructField("last_ts", T.LongType()),  # epoch micros
    ]
)


def _make_geofence_fn(fences: list[tuple[str, "object"]]):
    """Build the per-user stateful transition function over a
    driver-side fence list.  Fences are closed rings as (m, 2)
    [lon, lat] float arrays — config-scale (tens..thousands), shipped
    in the task closure exactly like the batch PIP broadcast form
    (operators/pip_join.py)."""
    import numpy as np

    from ..kernels.geometry import polygon_contains

    prepared = []
    for fid, ring in fences:
        arr = np.asarray(ring, dtype=np.float64)
        bbox = (
            arr[:, 1].min(), arr[:, 1].max(),
            arr[:, 0].min(), arr[:, 0].max(),
        )
        prepared.append((str(fid), arr, bbox))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("ts", kind="mergesort")
        if state.exists:
            inside, last_us = state.get
            inside = set(inside)
            # late fixes older than already-applied state cannot
            # rewrite transition history — drop them (the sessionize
            # late-fix doctrine)
            pdf = pdf[pdf["ts"].astype("int64") // 1000 > last_us]
            if not len(pdf):
                return
        else:
            inside = set()
        lat = pdf["lat"].to_numpy()
        lon = pdf["lon"].to_numpy()
        member: dict[str, "object"] = {}
        for fid, ring, (la0, la1, lo0, lo1) in prepared:
            cand = (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
            m = np.zeros(len(pdf), dtype=bool)
            if cand.any():
                m[cand] = polygon_contains(lat[cand], lon[cand], ring)
            member[fid] = m
        out_user, out_ts, out_fence, out_tr = [], [], [], []
        uid = key[0]
        for i in range(len(pdf)):
            now = {fid for fid, m in member.items() if m[i]}
            ts = pdf["ts"].iloc[i]
            for fid in sorted(now - inside):
                out_user.append(uid)
                out_ts.append(ts)
                out_fence.append(fid)
                out_tr.append("enter")
            for fid in sorted(inside - now):
                out_user.append(uid)
                out_ts.append(ts)
                out_fence.append(fid)
                out_tr.append("exit")
            inside = now
        last_us = int(pdf["ts"].astype("int64").iloc[-1] // 1000)
        state.update((sorted(inside), last_us))
        if out_user:
            yield pd.DataFrame(
                {
                    "user_id": out_user,
                    "ts": out_ts,
                    "fence_id": out_fence,
                    "transition": out_tr,
                }
            )

    return fn


def stream_geofence(
    fixes: DataFrame,
    fences: list[tuple[str, "object"]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Geofence enter/exit transition stream: one output row per
    (user, fence) membership CHANGE — the alerting primitive a fleet
    pipeline runs on the live fix stream (the batch twin is a PIP join
    plus a lag() comparison; here the previous membership set lives in
    per-user GroupState so transitions survive micro-batch boundaries
    and restarts).

    ``fences``: driver-side list of (fence_id, closed [lon, lat] ring)
    — geofences are configuration, not data, so they ride the task
    closure like the batch broadcast-PIP form; the per-fix test is the
    same vectorized ray-cast kernel (kernels/geometry.py:100,
    GeoGeometry.kt polygonContains) behind a bbox prefilter.

    Semantics: fixes are applied in event-time order within each
    micro-batch; a fix no newer than the state's last applied timestamp
    is dropped (late data cannot rewrite emitted transition history —
    same doctrine as stream_sessionize's late-fix drop).  State per
    user is the current inside-set + last timestamp, bounded by the
    number of users x fences currently occupied."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = fixes.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_geofence_fn(fences),
        outputStructType=GEOFENCE_OUT_SCHEMA,
        stateStructType=_GEOFENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    fixes: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch ``trajectory.sessionize``: per-user
    trip/visit detection in flight via Spark's native session windows
    (``F.session_window`` — state merges windows closer than ``gap``
    and the watermark finalizes + evicts sessions once no on-time fix
    can extend them, so state stays bounded by ACTIVE sessions only).

    Emits one row per closed session: (user, session_start,
    session_end, n_fixes).  ``session_end`` follows Spark's session
    semantics — last fix's event time + gap (the window's exclusive
    upper bound), not the last fix itself; batch sessionize numbers
    sessions instead of timestamping them, so the two agree on session
    MEMBERSHIP for on-time data (same gap rule) while reporting
    different boundary columns.  Per-trip geodesic legs need ordered
    history and stay a batch/backfill concern (trajectory.trip_stats)."""
    return (
        fixes.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_fixes"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_fixes",
        )
    )
