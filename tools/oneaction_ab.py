"""One-action vs two-action instrumentation A/B at 2M docs, 4x8 fair-node
(VERDICT r6 item 5 — the round-6 A/B was invalidated by host throttling).

The hypothesis (analytically argued in tools/scaling_run.py): persist() is
lazy, so the OLD two-action protocol (count labeled, then count output)
itself created a materialization barrier between the label stage and dedup's
first shuffle byte; the one-action count lets the dedup exchange-1 map run
inside the label-UDF stage per-partition. This script measures both walls,
interleaved A/B/A/B to cancel slow host drift, each leg bw-probe stamped.

Appends records to BENCH/scaling_r7.jsonl (note field marks the arm) and
prints a summary table row for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from scaling_r7 import OUT, run  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    walls = {"1": [], "0": []}
    for i in range(reps):
        for arm in ("1", "0"):
            r = run(4, n_docs, None, 16384,
                    f"4x8 one_action={arm} A/B rep{i}",
                    {"SCRUBAH_ONE_ACTION": arm})
            print(f"rep{i} one_action={arm}: wall {r.get('wall_sec')}s "
                  f"label={r.get('label_sec')} dedup={r.get('dedup_sec')} "
                  f"probe={r.get('probe')} err={r.get('error', '')[:80]}",
                  flush=True)
            if r.get("wall_sec") is not None:
                walls[arm].append(r["wall_sec"])
    summary = {
        "oneaction_ab": True, "n_docs": n_docs,
        "walls_one_action": walls["1"], "walls_two_action": walls["0"],
        "min_one_action": min(walls["1"]) if walls["1"] else None,
        "min_two_action": min(walls["0"]) if walls["0"] else None,
    }
    print(json.dumps(summary), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
