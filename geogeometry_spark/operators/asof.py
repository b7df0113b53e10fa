"""As-of join: for each (key, query-time) row, the key's latest event
at-or-before that time — the telemetry/backfill primitive ("where was
this vehicle at 12:07?") that Spark has no native operator for.

Engine form: ONE union-tag window pass, no per-key loops, no range
explode.  Events and queries union into a single relation ordered by
(ts, tag) within each key (events tag 0 sort before queries tag 1, so
a query at exactly an event's timestamp matches it); running
``last(value, ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING..CURRENT
carries every event column forward to the queries that follow it.  One
hash exchange on the key, linear in |events| + |queries|, and the
carried state is one row's worth of columns — the classic sorted-merge
as-of at DataFrame scale.

Determinism contract: duplicate (key, ts) EVENTS are collapsed to the
max-``id`` row FIRST (one tiny self-contained window), because "the
latest event at t" is otherwise ambiguous — and the DuckDB twin then
maps onto DuckDB's NATIVE ``ASOF JOIN`` (value parity between our
engineered Spark plan and a purpose-built engine operator).

Output: one row per query that matched within ``horizon_s``
(inner-join semantics): (query id, key, query ts, event ts, value
columns...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_oracle_sql"]


def asof_join(
    events: DataFrame,
    queries: DataFrame,
    value_cols: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    query_id_col: str = "query_id",
    query_ts_col: str = "qts",
    horizon_s: int | None = None,
) -> DataFrame:
    """``events``: (key, ts, id, value columns...); ``queries``:
    (query_id, key, qts).  Returns (query_id, key, qts, event_ts,
    *value_cols) for queries whose latest at-or-before event is within
    ``horizon_s`` (None = unbounded)."""
    dedup_w = Window.partitionBy(key_col, ts_col).orderBy(
        F.col(id_col).desc()
    )
    ev = (
        events.select(key_col, ts_col, id_col, *value_cols)
        .withColumn("_rn", F.row_number().over(dedup_w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).alias("_t"),
            F.lit(0).alias("_tag"),
            F.lit(None).cast(
                queries.schema[query_id_col].dataType
            ).alias("_qid"),
            F.col(ts_col).alias("_et"),
            *[F.col(c) for c in value_cols],
        )
    )
    qr = queries.select(
        F.col(key_col).alias("_k"),
        F.col(query_ts_col).alias("_t"),
        F.lit(1).alias("_tag"),
        F.col(query_id_col).alias("_qid"),
        F.lit(None).cast("long").alias("_et"),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.unionByName(qr).select(
        "_k", "_t", "_tag", "_qid",
        F.last("_et", ignorenulls=True).over(w).alias("event_ts"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = carried.where(
        (F.col("_tag") == 1) & F.col("event_ts").isNotNull()
    )
    if horizon_s is not None:
        out = out.where(
            F.col("_t") - F.col("event_ts") <= F.lit(int(horizon_s))
        )
    return out.select(
        F.col("_qid").alias(query_id_col),
        F.col("_k").alias(key_col),
        F.col("_t").alias(query_ts_col),
        "event_ts",
        *value_cols,
    )


def asof_join_oracle_sql(
    events_subq: str,
    queries_subq: str,
    value_cols: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    id_col: str = "event_id",
    query_id_col: str = "query_id",
    query_ts_col: str = "qts",
    horizon_s: int | None = None,
) -> str:
    """DuckDB twin on the NATIVE ``ASOF JOIN``: same max-id collapse of
    duplicate (key, ts) events, then ``q ASOF JOIN e ON q.key = e.key
    AND q.qts >= e.ts`` (picks the greatest event ts ≤ qts — exactly
    the window carry), same horizon post-filter."""
    vals = ", ".join(value_cols)
    horizon = (
        f"WHERE q.{query_ts_col} - e.{ts_col} <= {int(horizon_s)} "
        if horizon_s is not None
        else ""
    )
    return (
        f"WITH _asof_ev AS (SELECT {key_col}, {ts_col}, {vals} FROM "
        f"{events_subq} QUALIFY row_number() OVER "
        f"(PARTITION BY {key_col}, {ts_col} ORDER BY {id_col} DESC) = 1) "
        f"SELECT q.{query_id_col}, q.{key_col}, q.{query_ts_col}, "
        f"e.{ts_col} AS event_ts, "
        + ", ".join(f"e.{c} AS {c}" for c in value_cols)
        + f" FROM {queries_subq} q ASOF JOIN _asof_ev e "
        f"ON q.{key_col} = e.{key_col} "
        f"AND q.{query_ts_col} >= e.{ts_col} "
        + horizon
    )
