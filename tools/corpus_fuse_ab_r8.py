"""Interleaved A/B: two-action corpus build (driver-collected scalars, the
round-start shape) vs the fused one-action build (in-plan broadcast scalars).
fps is materialized (persisted) before each timed region so both arms time
the corpus build alone; arms alternate within one warm session so host drift
hits both equally (guide §1.3).

Usage: python tools/corpus_fuse_ab_r8.py [reps=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main():
    import pyspark.sql.functions as F

    from scrubah_pii_spark.entry_queries import _docs, _spread
    from scrubah_pii_spark.operators.template import (
        _doc_ngrams,
        classify_corpus,
        ngram_template_corpus,
        remove_overlapping_templates,
    )
    from scrubah_pii_spark.oracles_sql import framed_text_expr
    from scrubah_pii_spark.session import build_session

    spark = build_session(
        app_name="corpus_fuse_ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_inputs():
        df = _spread(_docs(spark, SF_DIR)).select(
            F.col("doc_id").cast("string").alias("url"),
            framed_text_expr().alias("text"),
        )
        fps = _doc_ngrams(df, "text", "url").persist()
        fps.count()
        return df, fps

    def arm_old(df, fps):
        # round-start shape: scalars collected on the driver, threshold and
        # position baked in as literals, then the overlap collect
        st = df.filter(F.col("text").isNotNull()).agg(
            F.count_distinct(F.col("url")).alias("docs"),
            F.avg(F.size(F.split(F.col("text"), "\n"))).alias("avg_lines"),
        ).collect()[0]
        n_docs = int(st["docs"])
        avg_doc_lines = float(st["avg_lines"] or 0.0)
        threshold = max(3, int(n_docs * 0.3))
        stats = (
            fps.select("hash", "ngram_size", "_url", "pos")
            .groupBy("hash", "ngram_size")
            .agg(
                F.count_distinct("_url").alias("doc_count"),
                F.avg("pos").alias("avg_line_offset"),
            )
            .filter(F.col("doc_count") >= threshold)
        )
        content = (
            fps.join(
                F.broadcast(stats.select("hash", "ngram_size")),
                ["hash", "ngram_size"],
            )
            .groupBy("hash", "ngram_size")
            .agg(
                F.min("content").alias("sample"),
                F.min_by("orig", "_url").alias("content"),
            )
        )
        corpus = (
            stats.join(content, ["hash", "ngram_size"])
            .withColumn(
                "template_id",
                F.concat(F.lit("tpl_"), F.substring("hash", 1, 8)),
            )
            .select(
                "template_id", "hash", "ngram_size", "doc_count",
                "content", "sample", "avg_line_offset",
            )
        )
        return remove_overlapping_templates(
            classify_corpus(corpus, avg_doc_lines)
        )

    def arm_new(df, fps):
        return ngram_template_corpus(df, "text", "url", fingerprints=fps)

    results = {"old": [], "new": []}
    sigs = {}
    for rep in range(REPS):
        for name, arm in (("old", arm_old), ("new", arm_new)):
            df, fps = fresh_inputs()
            t0 = time.time()
            corpus = arm(df, fps)
            rows = corpus.collect()
            dt = time.time() - t0
            fps.unpersist()
            results[name].append(dt)
            sig = sorted(
                (r["template_id"], r["hash"], r["ngram_size"], r["doc_count"],
                 r["position"], r["template_type"]) for r in rows
            )
            sigs.setdefault(name, sig)
            assert sigs[name] == sig, f"{name}: nondeterministic corpus"
            print(f"rep{rep} {name}: {dt:.2f}s corpus={len(rows)}", flush=True)
    assert sigs["old"] == sigs["new"], "ARMS DISAGREE"
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.2f} median={ts[len(ts)//2]:.2f} all="
              + ",".join(f"{x:.2f}" for x in ts), flush=True)
    print("corpora identical across arms", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
