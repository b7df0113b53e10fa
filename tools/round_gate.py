#!/usr/bin/env python
"""Round-close gate: ONE command, ONE committed artifact (VERDICT r2
items 1 + 8).

Runs, in order:
1. the plan audit (tools/audit_plans.py) over every contract query —
   fails the gate on any unallowlisted CartesianProduct / BNLJ /
   global-window / global-sort;
2. the FULL oracle sweep (tools/check_correctness.py over the whole
   ``queries()`` dict, no sampling) — Spark vs DuckDB rows + schema +
   value hash at sf0.01;

and writes ``GATE_r{N}.json`` with both results, so the round's
correctness evidence for all queries lives on disk instead of in a
driver sample.

Usage: python tools/round_gate.py --round N [--skip-audit]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    rnd = "0"
    if "--round" in args:
        rnd = args[args.index("--round") + 1]
    else:
        positional = [a for a in args if not a.startswith("-")]
        if positional:
            rnd = positional[0]
    skip_audit = "--skip-audit" in args

    gate: dict = {"round": int(rnd)}
    t0 = time.perf_counter()

    if not skip_audit:
        print("=== plan audit ===", flush=True)
        audit = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "audit_plans.py")],
            capture_output=True,
            text=True,
        )
        sys.stdout.write(audit.stdout[-4000:])
        gate["plan_audit"] = {
            "exit_code": audit.returncode,
            "tail": audit.stdout.strip().splitlines()[-3:],
        }
        if audit.returncode != 0:
            print("GATE FAIL: plan audit violations", flush=True)

    print("=== full oracle sweep ===", flush=True)
    corr_path = os.path.join(REPO, f"CORRECTNESS_FULL_r{rnd}.json")
    sweep = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_correctness.py"),
            "--json",
            corr_path,
        ],
        capture_output=True,
        text=True,
    )
    sys.stdout.write("\n".join(sweep.stdout.strip().splitlines()[-80:]) + "\n")
    results = {}
    if os.path.exists(corr_path):
        with open(corr_path) as f:
            results = json.load(f)
    n_oracle = sum(1 for r in results.values() if r.get("err") != "no_oracle")
    n_rows_only = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    n_fail = sum(
        1
        for r in results.values()
        if r.get("err") not in (None, "no_oracle")
    )
    gate["correctness"] = {
        "exit_code": sweep.returncode,
        "artifact": os.path.basename(corr_path),
        "queries": len(results),
        "oracle_checked": n_oracle,
        "rows_only": n_rows_only,
        "failed": n_fail,
    }
    gate["wall_sec"] = round(time.perf_counter() - t0, 1)

    out = os.path.join(REPO, f"GATE_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(gate, f, indent=1)
    print(json.dumps(gate, indent=1))
    ok = sweep.returncode == 0 and (
        skip_audit or gate["plan_audit"]["exit_code"] == 0
    )
    print(f"GATE {'PASS' if ok else 'FAIL'} -> {out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
