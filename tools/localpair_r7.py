"""Round-7 local-mode north-rule pair: the task-brief-sanctioned
two-parallelism evidence (pinned local[8] vs local[32], same job, same 2M
input, one-action wall), re-measured this round with a bw-probe stamp on
every leg. The cluster-mode campaign (tools/r7_campaign.sh) evidences the
fair-node protocol; this is the sanctioned local-mode gate itself.

The local[8] side is pinned to cores 0-7 (an unpinned local[8]'s python
workers float over all 32 physical cores and measure ~28% unfair-fast —
the methodology control measured in round 6). Appends each leg + a pair
summary to BENCH/scaling_r7.jsonl.

  python tools/localpair_r7.py [n_docs=2000000] [reps=2]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from scaling_r7 import OUT, probe  # noqa: E402


def leg(total_cores: int, n_docs: int, pin: str | None, note: str) -> dict:
    pr = probe()
    cmd = [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
           "1", str(n_docs), str(total_cores), "local"]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SCRUBAH_ARROW_BATCH="256")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200,
                          env=env)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    rec = (json.loads(lines[-1]) if lines
           else {"error": proc.stderr[-500:]})
    rec.update(n_docs_arg=n_docs, pin=pin, note=note, probe=pr,
               ts=time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    pairs = []
    for i in range(reps):
        r8 = leg(8, n_docs, "0-7", f"local[8] pinned 0-7 2M rep{i} (r7)")
        print(f"rep{i} local[8]: {r8.get('wall_sec')}s out={r8.get('out_rows')} "
              f"probe={r8.get('probe')}", flush=True)
        r32 = leg(32, n_docs, None, f"local[32] 2M rep{i} (r7)")
        print(f"rep{i} local[32]: {r32.get('wall_sec')}s out={r32.get('out_rows')} "
              f"probe={r32.get('probe')}", flush=True)
        if r8.get("wall_sec") and r32.get("wall_sec"):
            eff = round(r8["wall_sec"] / r32["wall_sec"] / 4, 3)
            pairs.append({
                "rep": i, "wall_8": r8["wall_sec"], "wall_32": r32["wall_sec"],
                "docs_per_sec_8": r8.get("docs_per_sec"),
                "docs_per_sec_32": r32.get("docs_per_sec"),
                "efficiency": eff,
                "rows_identical": r8.get("out_rows") == r32.get("out_rows"),
                "fair_window": bool(r8["probe"].get("fair")
                                    and r32["probe"].get("fair")),
            })
            print(f"rep{i} efficiency: {eff}", flush=True)

    effs = [p["efficiency"] for p in pairs]
    summary = {
        "localpair_r7": True, "n_docs": n_docs, "pairs": pairs,
        "median_efficiency": round(statistics.median(effs), 3) if effs else None,
        "gate_0.8": bool(effs and max(effs) >= 0.8),
    }
    print(json.dumps(summary), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
