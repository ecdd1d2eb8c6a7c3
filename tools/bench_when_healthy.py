"""Round-8 healthy-window bench watcher (VERDICT r7 item 2).

Polls the host-bandwidth probe; when the single-thread triad clears the
threshold, runs (a) the official bench.py at the default sf and (b) the
bench_extra heavy-query set at sf1.0, then exits. Every probe is logged so
a no-healthy-window outcome is itself evidence.

Usage: python tools/bench_when_healthy.py [min_1t_gbps] [max_hours]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bw_probe import triad  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_1T = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
MAX_H = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
LOG = os.path.join(HERE, "BENCH", "benchwatch_r8.log")


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe_1t():
    return triad(n=4_000_000, reps=3)


def main():
    deadline = time.time() + MAX_H * 3600
    attempt = 0
    while time.time() < deadline:
        p = probe_1t()
        load1 = os.getloadavg()[0]
        log(f"probe 1t={p:.1f} GB/s load1={load1:.1f} (need >= {MIN_1T}, load < 8)")
        if p >= MIN_1T and load1 < 8.0:
            attempt += 1
            log(f"healthy window — running official bench (attempt {attempt})")
            env = dict(os.environ)
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=HERE,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if line:
                with open(os.path.join(HERE, "BENCH", "bench_r8_healthy.json"),
                          "w") as f:
                    f.write(line[-1] + "\n")
                log("official bench done: " + line[-1][:160])
            else:
                log(f"bench failed rc={r.returncode}: {r.stderr[-300:]}")
            # heavy set at sf1.0
            env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf1.0"
            r2 = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_extra.py"),
                 "--reps", "2", "jaccard_group_edges", "doc_embed_neardup",
                 "whitelist_timeline", "lab_trend_summary",
                 "template_ngram_strip", "compression_summary",
                 "dup_span_strip", "langid_heuristic", "pipeline_flagship",
                 "minhash_lsh_pairs", "template_lines", "chunk_dedup"],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=HERE,
            )
            with open(os.path.join(HERE, "BENCH", "r8_sf1_healthy.jsonl"),
                      "w") as f:
                f.write(r2.stdout)
            log("sf1.0 heavy set done")
            # re-verify the window held
            post = probe_1t()
            log(f"post-run probe 1t={post:.1f} GB/s")
            if post >= MIN_1T * 0.6:
                log("window held — watcher exiting")
                return
            log("window collapsed mid-run — retrying")
        time.sleep(120)
    log("no healthy window before deadline")


if __name__ == "__main__":
    main()
