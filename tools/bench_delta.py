"""Emit a per-query delta table between two bench JSON records (judge ask:
make regressions attributable without archaeology).

Usage: python tools/bench_delta.py BENCH_r02.json /tmp/bench_r3.json
Prints a markdown table: query | old s | new s | delta | note(new/removed).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    """Accept either a raw bench JSON line or the driver's BENCH_r{N}.json
    wrapper (bench record embedded as the last JSON line of 'tail')."""
    d = json.load(open(path))
    if "queries" in d:
        return d
    for line in reversed(d.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no bench record found in {path}")


def main(old_path: str, new_path: str):
    old = _load(old_path)
    new = _load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None:
            rows.append((name, "—", f"{n:.2f}", "new"))
        elif n is None:
            rows.append((name, f"{o:.2f}", "—", "removed"))
        else:
            d = n - o
            pct = f"{d / o * 100:+.0f}%" if o else ""
            rows.append((name, f"{o:.2f}", f"{n:.2f}", f"{d:+.2f} ({pct})"))
    print("| query | r2 (s) | r3 (s) | delta |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} |")
    print()
    print(f"total: r2 {old.get('value')}s ({len(oq)} queries) -> "
          f"r3 {new.get('value')}s ({len(nq)} queries)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
