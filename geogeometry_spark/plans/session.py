"""SparkSession factory tuned for the engine.

Settings chosen for multi-executor scale (and harmless locally):
- AQE on with skew-join splitting: runtime backstop for spatial skew.
- Arrow enabled (pandas UDF transfer) with a bounded batch size so PIP
  border re-checks stay cache-friendly.
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by AQE coalescing from the initial partition number.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geogeometry-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # glibc tuning for the Arrow python workers (inherited from this
    # process in local mode; use spark.executorEnv.MALLOC_* on a real
    # cluster).  The default allocator serves every >128 KiB numpy
    # temporary with a fresh mmap and unmaps it on free, so each Arrow
    # batch re-faults its working set; with 32 concurrent workers the
    # winnow kernel spent ~2/3 of its CPU in KERNEL mode on page-fault
    # churn.  Raising both thresholds makes workers keep and reuse the
    # heap: measured winnow_rolling_500k 3.77 s -> 1.36 s median with
    # system-CPU ~75 s -> ~0 (BASELINE.md r4).  Trade-off: workers
    # retain peak-live heap (bounded by the largest batch working set,
    # ~0.3 GiB here); export MALLOC_TRIM_THRESHOLD_ yourself to
    # override, or set it to 131072 to restore glibc defaults.
    for _k in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(_k, "1073741824")
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master.split("[")[-1].rstrip("]") if "[" in master else "32"
    try:
        default_parts = max(int(cores if cores != "*" else 32), 8)
    except ValueError:
        default_parts = 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or default_parts),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


@_contextmanager
def iterative_loop_conf(
    spark: SparkSession,
    aqe: bool | None = False,
    shuffle_partitions: int | None = None,
):
    """Scoped session tuning for driver-side iterative loops (SSSP /
    Brandes / PageRank / Boruvka rounds — VERDICT r4 item 4).

    AQE turns every exchange into a separately materialized query
    stage with a driver-side re-optimization; on the micro-shuffles a
    frontier loop issues (K rounds x 2-3 tiny exchanges), that
    replanning latency IS the wall at sandbox graph sizes, while the
    runtime re-planning buys nothing (the loop already fixes its join
    strategy and the relations are checkpointed).  Disabling AQE and
    right-sizing shuffle partitions for the STATE relation cuts the
    per-round constant; both settings restore on exit, so the
    surrounding query (edge build, downstream joins) keeps the
    engine-default adaptive behavior.  At production frontier sizes
    the per-round work dominates either way (BASELINE.md routing
    macro-round: eff 0.90 at 62M edges), so this trades nothing at
    scale.  Pass ``aqe=None`` / ``shuffle_partitions=None`` to leave a
    setting untouched.

    The settings are SESSION-scoped SQL confs: a query planned on
    another thread of the same session while the loop runs would see
    them.  The engine's drivers (contract/bench/streaming) are
    single-planner-threaded; callers embedding loops in multi-threaded
    schedulers should pin their own conf isolation (e.g. per-thread
    sessions via ``spark.newSession()``).
    """
    saved: dict[str, str] = {}
    try:
        if aqe is not None:
            saved["spark.sql.adaptive.enabled"] = spark.conf.get(
                "spark.sql.adaptive.enabled"
            )
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        if shuffle_partitions is not None:
            saved["spark.sql.shuffle.partitions"] = spark.conf.get(
                "spark.sql.shuffle.partitions"
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(int(shuffle_partitions))
            )
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
