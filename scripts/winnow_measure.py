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
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = src.amplified_documents(spark, SF_DIR, 100).localCheckpoint()
    n = docs.count()

    fp = text_ops.winnow_fingerprint(docs, k=16, w=8)  # plan built once
    control = docs.select(F.sum(F.length("text")).alias("b"))

    # CPU attribution via /proc (Spark's executorCpuTime only counts
    # JVM task threads — the winnow kernel runs in Arrow PYTHON workers,
    # so the JVM metric reads ~0 while the real work happens in child
    # processes).  Per timed run we delta:
    #   tree_cpu_s  — utime+stime of THIS process and every descendant
    #                 (driver + JVM + pyspark workers), /proc/<pid>/stat
    #   host_cpu_s  — total busy jiffies across the host, /proc/stat
    # Constant tree_cpu with a swinging wall + co-tenant CPU
    # (host - tree) tracking the slow runs is the attribution the
    # verdict asked for.
    hz = os.sysconf("SC_CLK_TCK")

    def _tree_cpu() -> dict:
        """CPU seconds of this process tree, split JVM vs python workers
        and user vs system time."""
        me = os.getpid()
        info: dict[int, tuple] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    head, tail = f.read().split("(", 1)
                    comm, rest = tail.rsplit(")", 1)
                    parts = rest.split()
                # after comm: state ppid ... utime(11) stime(12)
                info[int(pid)] = (
                    int(parts[1]), comm, int(parts[11]), int(parts[12])
                )
            except (OSError, IndexError, ValueError):
                continue
        children: dict[int, list[int]] = {}
        for pid, (ppid, *_rest) in info.items():
            children.setdefault(ppid, []).append(pid)
        agg = {"jvm_u": 0, "jvm_s": 0, "py_u": 0, "py_s": 0}
        stack = [me]
        while stack:
            pid = stack.pop()
            if pid in info:
                _, comm, ut, st = info[pid]
                k = "jvm" if "java" in comm else "py"
                agg[k + "_u"] += ut
                agg[k + "_s"] += st
            stack.extend(children.get(pid, ()))
        return {k: v / hz for k, v in agg.items()}

    def _host_cpu() -> float:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        busy = sum(int(x) for x in parts) - int(parts[3])  # minus idle
        return busy / hz

    def _gc_ms() -> float:
        beans = spark._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(b.getCollectionTime() for b in beans)

    def timed(df):
        t0w, t0t, t0h, t0g = (
            time.perf_counter(), _tree_cpu(), _host_cpu(), _gc_ms()
        )
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0w
        t1t = _tree_cpu()
        d = {k: round(t1t[k] - t0t[k], 2) for k in t1t}
        tree = round(sum(d.values()), 2)
        return {
            "wall_s": round(wall, 3),
            "tree_cpu_s": tree,
            **d,
            "gc_s": round((_gc_ms() - t0g) / 1e3, 2),
            "cotenant_cpu_s": round((_host_cpu() - t0h) - tree, 2),
        }

    timed(fp)  # warm-up
    timed(control)
    pairs = [(timed(fp), timed(control)) for _ in range(runs)]
    ws = sorted(p[0]["wall_s"] for p in pairs)
    cs = sorted(p[1]["wall_s"] for p in pairs)
    tree = sorted(p[0]["tree_cpu_s"] for p in pairs)
    med = ws[len(ws) // 2]
    print(json.dumps({
        "n_docs": n,
        "winnow_median_s": med,
        "winnow_spread": [ws[0], ws[-1]],
        "winnow_docs_per_sec": round(n / med, 1),
        "winnow_tree_cpu_spread_s": [tree[0], tree[-1]],
        "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "(default)"),
        "control_scan_median_s": cs[len(cs) // 2],
        "control_spread": [cs[0], cs[-1]],
        "interleaved_pairs": pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
