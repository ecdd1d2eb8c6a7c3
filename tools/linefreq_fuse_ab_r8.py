"""Interleaved A/B for line_frequency_templates: driver-count threshold
(round-start shape) vs in-plan broadcast scalar. Full query methodology
(construct + noop + count) per arm, alternating in one warm session.

Usage: python tools/linefreq_fuse_ab_r8.py [reps=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main():
    import pyspark.sql.functions as F

    from scrubah_pii_spark.entry_queries import _docs, _spread
    from scrubah_pii_spark.operators.template import (
        _lines,
        line_frequency_templates,
    )
    from scrubah_pii_spark.session import build_session

    spark = build_session(
        app_name="linefreq_ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def base():
        return _spread(_docs(spark, SF_DIR)).select(
            F.col("doc_id").cast("string").alias("url"),
            F.regexp_replace("text", r"\s+", "\n").alias("text"),
        )

    def arm_old():
        df = base()
        n_docs = df.count()
        threshold = max(2, int(n_docs * 0.5))
        return (
            _lines(df, "text", "url")
            .filter(F.length("trimmed") >= 6)
            .dropDuplicates(["_url", "trimmed"])
            .groupBy("trimmed")
            .agg(F.count("*").alias("doc_count"))
            .filter(F.col("doc_count") >= threshold)
        ).select(
            F.col("trimmed").alias("line"),
            F.col("doc_count").cast("long").alias("doc_count"),
        )

    def arm_new():
        df = base()
        return line_frequency_templates(df, "text", "url", min_len=6).select(
            F.col("trimmed").alias("line"),
            F.col("doc_count").cast("long").alias("doc_count"),
        )

    results = {"old": [], "new": []}
    counts = {}
    for rep in range(REPS):
        for name, arm in (("old", arm_old), ("new", arm_new)):
            t0 = time.time()
            out = arm()
            out.write.format("noop").mode("overwrite").save()
            n = out.count()
            dt = time.time() - t0
            results[name].append(dt)
            counts.setdefault(name, n)
            assert counts[name] == n
            print(f"rep{rep} {name}: {dt:.2f}s rows={n}", flush=True)
    assert counts["old"] == counts["new"], "ARMS DISAGREE"
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.2f} median={ts[len(ts)//2]:.2f} all="
              + ",".join(f"{x:.2f}" for x in ts), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
