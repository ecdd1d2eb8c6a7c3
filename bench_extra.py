"""Targeted per-query measurement harness for optimization work (guide §1).

NOT the official bench (bench.py is frozen for the driver). This runner:
  * times individual queries with the noop sink (same methodology),
  * optionally dumps .explain("formatted") to plans/r08/<q>_<tag>.txt,
  * prints one JSON line per query to stdout.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain TAG] q1 q2 ...
  python bench_extra.py --all            # every bench query once
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="dump explain('formatted') to plans/r08/<q>_<TAG>.txt")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--probe", action="store_true",
                    help="print bw probe stamp first")
    args = ap.parse_args()

    from scrubah_pii_spark.entry_queries import QUERIES
    from scrubah_pii_spark.session import build_session

    if args.probe:
        from bench import bw_probe
        print(json.dumps({"probe": bw_probe()}), flush=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = list(QUERIES) if args.all else args.queries
    names = [n for n in names if n != "jaccard_pairs"] if args.all else names

    # warmup (same as bench.py)
    df = QUERIES["content_hash"](spark, args.sf)
    df.write.format("noop").mode("overwrite").save()

    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        if args.explain:
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            os.makedirs(os.path.join(here, "plans", "r08"), exist_ok=True)
            with open(os.path.join(
                    here, "plans", "r08", f"{name}_{args.explain}.txt"),
                    "w") as f:
                f.write(txt)
        samples = []
        n = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            n2 = df.count()
            samples.append(round(time.time() - t0, 3))
            assert n is None or n == n2, f"{name}: rows {n} vs {n2}"
            n = n2
        print(json.dumps({
            "query": name, "sf": args.sf, "rows": n,
            "best": min(samples), "samples": samples,
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
