"""Round-3 scaling protocol: pinned-N vs 4N at a 4M-row corpus.

The round-2 ladder showed efficiency loss was fixed-cost amortization
(0.59 @ 0.7M docs -> 0.67-0.72 @ 2.2M); this runs the same interleaved
pinned-N / 4N protocol at 4M rows where the fixed terms (plan build, dedup
tail) amortize further. Appends one JSON line per run to
BENCH/scaling_r3.jsonl.

Pinning: the N=1x8 run is confined to cores 0-7 via taskset — its
proportional core share, i.e. exactly one node of a 4-node cluster
(see BENCH/BASELINE.md "fair-node" rationale).

Usage: python tools/scaling_r3.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_r3.jsonl")


def run(execs: int, n_docs: int, pin: str | None) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
           str(execs), str(n_docs)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=2400)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        rec = {"executors": execs, "n_docs": n_docs, "error": proc.stderr[-500:]}
    else:
        rec = json.loads(lines[-1])
    rec["n_docs_arg"] = n_docs
    rec["pin"] = pin
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # generate the corpus once, outside any timed run
    corpus = f"/tmp/scaling_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus):
        sys.path.insert(0, HERE)
        from scrubah_pii_spark.sources.synth import generate_rows, write_parquet

        t0 = time.time()
        write_parquet(generate_rows(n_docs), corpus)
        print(f"corpus gen: {time.time() - t0:.0f}s", flush=True)

    t1, t4 = [], []
    for i in range(reps):
        # interleave so slow host-load drift hits both levels equally
        r1 = run(1, n_docs, pin="0-7")
        print(f"rep{i} 1x8 pinned: {r1.get('wall_sec')}s "
              f"(label {r1.get('label_sec')}, dedup {r1.get('dedup_sec')}, "
              f"out {r1.get('out_rows')})", flush=True)
        r4 = run(4, n_docs, pin=None)
        print(f"rep{i} 4x8: {r4.get('wall_sec')}s "
              f"(label {r4.get('label_sec')}, dedup {r4.get('dedup_sec')}, "
              f"out {r4.get('out_rows')})", flush=True)
        if "wall_sec" in r1:
            t1.append(r1["wall_sec"])
        if "wall_sec" in r4:
            t4.append(r4["wall_sec"])

    if t1 and t4:
        med1, med4 = statistics.median(t1), statistics.median(t4)
        summary = {
            "n_docs": n_docs,
            "walls_1x8_pinned": t1, "walls_4x8": t4,
            "median_1x8": med1, "median_4x8": med4,
            "efficiency_median": round(med1 / med4 / 4, 3),
            "efficiency_best_pair": round(min(t1) / min(t4) / 4, 3),
        }
        print(json.dumps(summary), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
