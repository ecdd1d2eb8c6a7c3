"""Per-query A/B of the `_spread` scan shape (VERDICT r6 item 3).

Round 6 gave the kernel-heavy queries a measured A/B before adopting the
round-robin repartition, but the embedding/native queries inherited it
unmeasured — and four of them regressed with low run-to-run spread
(semantic_clusters 1.54->2.33 s, lsh_ann_topk 1.84->2.21, ivf_ann_topk
1.37->1.75, minhash_lsh_pairs 1.04->1.61). This tool measures both arms on
ONE warm session, interleaved A/B/A/B per rep so host drift hits both arms
equally, and asserts the row counts agree across arms.

  python tools/spread_ab.py [reps=3] [sf_dir=/root/testdata/sf0.1] [q1,q2,...]

Writes (OVERWRITES) the per-query table to BENCH/spread_ab_r7.json; the winner is then
hard-coded at each call site (the env toggle SCRUBAH_SPREAD=0 exists only
for this measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT_QUERIES = [
    "semantic_clusters",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "minhash_lsh_pairs",
]


def time_once(spark, fn, sf_dir):
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    n = df.count()
    return time.time() - t0, n


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_QUERIES)

    from scrubah_pii_spark.entry_queries import QUERIES
    from scrubah_pii_spark.session import build_session

    sys.path.insert(0, os.path.join(HERE, "tools"))
    from bw_probe import triad

    spark = build_session(app_name="spread_ab", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for name in names:
        fn = QUERIES[name]
        # warm both arms once (codegen + Arrow worker spin-up out of band)
        os.environ["SCRUBAH_SPREAD"] = "1"
        time_once(spark, fn, sf_dir)
        os.environ["SCRUBAH_SPREAD"] = "0"
        time_once(spark, fn, sf_dir)

        walls = {"spread": [], "flat": []}
        rows = {}
        for _ in range(reps):
            for arm, env in (("spread", "1"), ("flat", "0")):
                os.environ["SCRUBAH_SPREAD"] = env
                sec, n = time_once(spark, fn, sf_dir)
                walls[arm].append(round(sec, 3))
                rows.setdefault(arm, n)
                assert rows[arm] == n, f"{name}/{arm}: rows moved {rows[arm]} vs {n}"
        assert rows["spread"] == rows["flat"], \
            f"{name}: arms disagree on rows {rows}"
        best_s, best_f = min(walls["spread"]), min(walls["flat"])
        results[name] = {
            "spread_walls": walls["spread"], "flat_walls": walls["flat"],
            "best_spread": best_s, "best_flat": best_f,
            "winner": "spread" if best_s < best_f else "flat",
            "delta_pct": round((best_s - best_f) / best_f * 100, 1),
            "rows": rows["flat"],
        }
        print(f"{name}: spread {best_s:.2f}s vs flat {best_f:.2f}s -> "
              f"{results[name]['winner']} ({results[name]['delta_pct']:+}%)",
              flush=True)

    os.environ.pop("SCRUBAH_SPREAD", None)
    probe = {f"triad_{t}t_gbps": round(triad(n=4_000_000, reps=3), 1)
             for t in (1,)}
    out = {"sf_dir": sf_dir, "reps": reps, "results": results,
           "probe_1t": probe, "ts": time.time()}
    path = os.path.join(HERE, "BENCH", "spread_ab_r7.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["winner"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
