"""Sub-phase timing of the template CORPUS build at sf0.1 (guide §1.4):
doc-stats collect / slim stats agg / content fetch / classify+overlap
collect, with actions issued cumulatively on the same frames so shuffle
reuse mirrors the production single-collect execution.

Usage: python tools/template_corpus_decomp_r8.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    import pyspark.sql.functions as F

    from scrubah_pii_spark.entry_queries import _docs, _spread
    from scrubah_pii_spark.operators.template import (
        _doc_ngrams,
        classify_corpus,
        remove_overlapping_templates,
    )
    from scrubah_pii_spark.oracles_sql import framed_text_expr
    from scrubah_pii_spark.session import build_session

    spark = build_session(
        app_name="corpus_decomp", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    for rep in range(REPS):
        df = _spread(_docs(spark, SF_DIR)).select(
            F.col("doc_id").cast("string").alias("url"),
            framed_text_expr().alias("text"),
        )
        t = {}
        t0 = time.time()
        fps = _doc_ngrams(df, "text", "url").persist()
        fps.count()
        t["fps"] = time.time() - t0

        t0 = time.time()
        st = df.filter(F.col("text").isNotNull()).agg(
            F.count_distinct(F.col("url")).alias("docs"),
            F.avg(F.size(F.split(F.col("text"), "\n"))).alias("avg_lines"),
        ).collect()[0]
        n_docs, avg_doc_lines = int(st["docs"]), float(st["avg_lines"] or 0.0)
        threshold = max(3, int(n_docs * 0.3))
        t["doc_stats"] = time.time() - t0

        t0 = time.time()
        stats = (
            fps.select("hash", "ngram_size", "_url", "pos")
            .groupBy("hash", "ngram_size")
            .agg(
                F.count_distinct("_url").alias("doc_count"),
                F.avg("pos").alias("avg_line_offset"),
            )
            .filter(F.col("doc_count") >= threshold)
        )
        n_stats = stats.count()
        t["stats_agg"] = time.time() - t0

        t0 = time.time()
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
        n_content = content.count()
        t["content_fetch"] = time.time() - t0

        t0 = time.time()
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
        corpus = classify_corpus(corpus, avg_doc_lines)
        corpus = remove_overlapping_templates(corpus)
        n_corpus = corpus.count()
        t["classify_overlap_collect"] = time.time() - t0

        fps.unpersist()
        total = sum(t.values())
        print(
            f"rep{rep}: total={total:.2f}s "
            + " ".join(f"{k}={v:.2f}" for k, v in t.items())
            + f" (stats={n_stats}, content={n_content}, corpus={n_corpus})",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
