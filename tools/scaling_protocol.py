"""Full scaling protocol: repeated N-vs-4N runs at two corpus sizes.

Runs tools/scaling_run.py sequentially (never concurrently — the runs must
not contend with each other) and appends one JSON line per run to
BENCH/scaling_r2.jsonl, then prints a median/efficiency summary.

Usage: python tools/scaling_protocol.py [reps_650k] [reps_2m]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_r2.jsonl")


def run(execs: int, n_docs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
         str(execs), str(n_docs)],
        capture_output=True, text=True, timeout=3000,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"executors": execs, "n_docs": n_docs, "error": proc.stderr[-500:]}
    rec = json.loads(lines[-1])
    rec["n_docs_arg"] = n_docs
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    reps_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    reps_big = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results = {("small", 1): [], ("small", 4): [], ("big", 1): [], ("big", 4): []}

    # interleave N / 4N so slow drift in host load hits both levels equally
    for i in range(reps_small):
        for execs in (1, 4):
            r = run(execs, 650000)
            print(f"650k rep{i} {execs}x8: {r.get('wall_sec')}s", flush=True)
            results[("small", execs)].append(r)
    for i in range(reps_big):
        for execs in (1, 4):
            r = run(execs, 2000000)
            print(f"2M rep{i} {execs}x8: {r.get('wall_sec')}s", flush=True)
            results[("big", execs)].append(r)

    summary = {}
    for size in ("small", "big"):
        t1 = [r["wall_sec"] for r in results[(size, 1)] if "wall_sec" in r]
        t4 = [r["wall_sec"] for r in results[(size, 4)] if "wall_sec" in r]
        if not t1 or not t4:
            continue
        med1, med4 = statistics.median(t1), statistics.median(t4)
        summary[size] = {
            "walls_1x8": t1, "walls_4x8": t4,
            "median_1x8": med1, "median_4x8": med4,
            "efficiency_median": round(med1 / med4 / 4, 3),
            "efficiency_best_pair": round(min(t1) / min(t4) / 4, 3),
        }
    print(json.dumps(summary))
    with open(OUT, "a") as f:
        f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
