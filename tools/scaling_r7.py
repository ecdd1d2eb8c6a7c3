"""Round-7 scaling campaign: the round-6 protocol (adjacent fair-node pairs,
one-action wall, pinned local[8] vs local[32]) plus the verdict-prescribed
precondition — a host-bandwidth probe stamped onto EVERY leg so each record
carries the evidence of whether its window was fair. Round 6's 8.67M pairs
were invalidated by external host throttling detected only after the fact;
this runner makes the probe part of the record.

Fairness criterion (from VERDICT r6 item 1): the 32-thread aggregate triad
should be >= ~3x the 8-thread number, i.e. the wide side gets at least the
same per-core memory bandwidth as the pinned side. Legs that fail the
criterion are still recorded (probe_fair=false) as evidence the host never
offered a fair window.

Appends every run + a campaign summary to BENCH/scaling_r7.jsonl.

Usage:
  python tools/scaling_r7.py [n_docs=8000000] [reps=3] [mem_mb=16384]
  python tools/scaling_r7.py 2000000 2 16384 --shaping
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_r7.jsonl")


def probe() -> dict:
    sys.path.insert(0, os.path.join(HERE, "tools"))
    from bw_probe import triad

    out = {}
    for nthreads in (1, 8, 32):
        with cf.ThreadPoolExecutor(nthreads) as ex:
            rs = list(ex.map(lambda _: triad(), range(nthreads)))
        out[f"triad_{nthreads}t_gbps"] = round(sum(rs), 1)
    out["fair"] = out["triad_32t_gbps"] >= 3.0 * out["triad_8t_gbps"]
    return out


def run(execs: int, n_docs: int, pin: str | None, mem_mb: int, note: str,
        extra_env: dict | None = None) -> dict:
    pr = probe()
    cmd = [sys.executable, os.path.join(HERE, "tools", "scaling_run.py"),
           str(execs), str(n_docs)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SCRUBAH_EXEC_MEM_MB=str(mem_mb))
    # round-5 measured Arrow-batch knee at 4N: 256 rows (measured in the round-5/6 campaigns, BENCH/scaling_r6.jsonl)
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
               probe=pr, ts=time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    shaping = "--shaping" in sys.argv
    n_docs = int(args[0]) if len(args) > 0 else 8000000
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
        env = {"SCRUBAH_SHAPING_HOST_CAP": "200",
               "SCRUBAH_SHAPING_LANG_CAP": "50000"}
        outs = []
        for i in range(2):
            r = run(4, n_docs, None, mem_mb, f"4x8 shaping rep{i}", env)
            print(f"shaping rep{i}: wall {r.get('wall_sec')}s out_rows "
                  f"{r.get('out_rows')} probe={r.get('probe')} "
                  f"err={r.get('error', '')[:80]}", flush=True)
            outs.append(r.get("out_rows"))
        summary = {"shaping_leg": True, "n_docs": n_docs, "out_rows": outs,
                   "deterministic": outs[0] == outs[1] and outs[0] is not None}
        print(json.dumps(summary), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")
        return

    pairs = []
    for i in range(reps):
        r1 = run(1, n_docs, "0-7", mem_mb, f"1x8 pinned adjacent rep{i}")
        print(f"rep{i} 1x8: {r1.get('wall_sec')}s (out {r1.get('out_rows')}, "
              f"probe={r1.get('probe')}, err={r1.get('error', '')[:80]})",
              flush=True)
        r4 = run(4, n_docs, None, mem_mb, f"4x8 adjacent rep{i}")
        print(f"rep{i} 4x8: {r4.get('wall_sec')}s (out {r4.get('out_rows')}, "
              f"probe={r4.get('probe')}, err={r4.get('error', '')[:80]})",
              flush=True)
        if "wall_sec" in r1 and "wall_sec" in r4:
            eff = round(r1["wall_sec"] / r4["wall_sec"] / 4, 3)
            pairs.append({
                "rep": i, "wall_1x8": r1["wall_sec"],
                "wall_4x8": r4["wall_sec"], "efficiency": eff,
                "fair_window": bool(r1.get("probe", {}).get("fair")
                                    and r4.get("probe", {}).get("fair")),
            })
            print(f"rep{i} efficiency: {eff}", flush=True)

    effs = [p["efficiency"] for p in pairs]
    fair_effs = [p["efficiency"] for p in pairs if p["fair_window"]]
    summary = {
        "campaign": "r7 fair-node local-cluster[1,8] pinned vs "
                    "local-cluster[4,8], one-action, bw-probe per leg",
        "n_docs": n_docs, "pairs": pairs,
        "median_efficiency": round(statistics.median(effs), 3) if effs else None,
        "median_fair_efficiency":
            round(statistics.median(fair_effs), 3) if fair_effs else None,
        "gate_0.8": bool(effs and statistics.median(effs) >= 0.8),
    }
    print(json.dumps(summary), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps({"summary": summary, "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
