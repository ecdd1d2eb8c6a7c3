"""Memory-bandwidth neighbor-load generator for the scaling analysis.

Spawns one process per given CPU, each pinned to its core, streaming numpy
copies over a buffer far larger than LLC — simulating the bandwidth the
other 3 executors consume during a 4x8 run. Used to show the single-host
N-vs-4N gap is shared-bandwidth, not Spark overhead (BENCH/BASELINE.md).

Usage: python tools/bw_hog.py <cpu_list e.g. 8-31> <seconds>
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def hog(cpu: int, seconds: float):
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    a = np.random.default_rng(cpu).random(32 * 1024 * 1024 // 8)  # 32 MB
    b = np.empty_like(a)
    t_end = time.time() + seconds
    while time.time() < t_end:
        np.copyto(b, a)
        a += 1.0


def main():
    spec, seconds = sys.argv[1], float(sys.argv[2])
    lo, hi = spec.split("-")
    cpus = list(range(int(lo), int(hi) + 1))
    procs = [mp.Process(target=hog, args=(c, seconds)) for c in cpus]
    for p in procs:
        p.start()
    for p in procs:
        p.join()


if __name__ == "__main__":
    main()
