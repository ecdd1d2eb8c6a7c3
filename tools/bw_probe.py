"""30-second host-bandwidth probe: aggregate numpy triad GB/s at 1, 8 and 32
threads. Run BEFORE any scaling campaign and record the numbers next to the
results — round 6's campaign was invalidated by exactly the drift this
detects (same-code local[32] runs swung 163->341 s while the probe read
3-4 GB/s aggregate, i.e. the host's full-width memory bandwidth was
externally throttled; the pinned 8-core side was insulated). A healthy
window should show 32-thread aggregate well above the 8-thread number.

  python tools/bw_probe.py
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import time

import numpy as np


def triad(n: int = 8_000_000, reps: int = 6) -> float:
    a = np.ones(n); b = np.ones(n); c = np.ones(n)  # noqa: E702
    t0 = time.time()
    for _ in range(reps):
        c = a + 2.5 * b  # noqa: F841  (memory-bound, releases the GIL)
    return n * reps * 3 * 8 / (time.time() - t0) / 1e9


def main():
    out = {}
    for nthreads in (1, 8, 32):
        with cf.ThreadPoolExecutor(nthreads) as ex:
            rs = list(ex.map(lambda _: triad(), range(nthreads)))
        out[f"triad_{nthreads}t_gbps"] = round(sum(rs), 1)
    out["ts"] = time.time()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
