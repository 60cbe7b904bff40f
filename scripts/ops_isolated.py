#!/usr/bin/env python
"""Isolated-JVM training-ops scaling protocol.

The in-session ops segment (bench_scaling.py --ops-replicas) times all
nine ops sequentially in ONE JVM per level. That measurement carries an
uncontrolled confound: session history — accumulated shuffle files,
cache/heap state, JIT warmth from earlier phases — skews later phases'
wall time, and it skews the two parallelism levels in OPPOSITE
directions (observed 2026-08-19: minhash_lsh in-session 306 s/236 s =
eff 0.32 vs isolated 506 s/131 s = eff 0.96 in adjacent clean windows).

This runner measures each op in its OWN bench.py process (cold JVM,
SPARK_GRAFT_OPS_FILTER=<op>), local[4] then local[1] back-to-back so
both levels see near-identical host conditions, optionally repeated with
a per-level minimum. Results land in BENCH/scaling_ops_isolated.json and
a ready-to-paste markdown table on stdout.

Usage: python scripts/ops_isolated.py [--passes 1] [--ops a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

OPS = [
    "pack_sequences",
    "dedup_index_build",
    "dedup_incremental_probe",
    "dup_spans",
    "minhash_lsh",
    "bm25",
    "quality_classifier",
    "line_dedup",
    "shuffle",
    "cdc_chunk",
    "ivm_rollup",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(op: str, cpus: int, replicas: int) -> tuple[float, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MODE="ops",
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_OPS_REPLICAS=str(replicas),
        SPARK_GRAFT_OPS_FILTER=op,
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_LOCAL_DIR="/dev/shm/spark-local",
        TMPDIR="/dev/shm",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    return res["ops"][op], res.get("host_steal_pct", -1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--ops", type=str, default=",".join(OPS))
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--n4", type=int, default=4)
    ap.add_argument("--replicas", type=int, default=120)
    args = ap.parse_args()
    ops = [o for o in args.ops.split(",") if o]

    results: dict = {}
    for op in ops:
        rec = {"t_n": [], "t_4n": [], "steal": []}
        for p in range(args.passes):
            t4, s4 = run_one(op, args.n4, args.replicas)
            t1, s1 = run_one(op, args.n, args.replicas)
            rec["t_4n"].append(t4)
            rec["t_n"].append(t1)
            rec["steal"].append((s4, s1))
            print(
                f"{op} pass {p}: local[{args.n4}] {t4}s (steal {s4}%) "
                f"local[{args.n}] {t1}s (steal {s1}%)",
                flush=True,
            )
        t_n, t_4n = min(rec["t_n"]), min(rec["t_4n"])
        rec["best_n"], rec["best_4n"] = t_n, t_4n
        rec["speedup"] = round(t_n / t_4n, 2)
        rec["efficiency"] = round((t_n / t_4n) / (args.n4 / args.n), 3)
        results[op] = rec

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "scaling_ops_isolated.json")
    # Partial reruns (--ops a,b) merge into the existing table so the
    # untouched ops keep their published measurements.
    merged: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f).get("results", {})
    merged.update(results)
    payload = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "protocol": "one op per JVM, local[4] then local[1] back-to-back, "
        f"{args.passes} pass(es), per-level min",
        "replicas": args.replicas,
        "results": merged,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)

    print("\n| op | local[1] sec | local[4] sec | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for op, r in merged.items():
        print(
            f"| {op} | {r['best_n']} | {r['best_4n']} | {r['speedup']}x "
            f"| {r['efficiency']} |"
        )


if __name__ == "__main__":
    main()
