"""Component-level timing of the template n-gram path at sf0.1 (guide §1.4):
fingerprint materialization / corpus build / strip noop / count, per rep in
one warm session, so the next optimization decision is evidence-driven.

Usage: python tools/template_decomp_r8.py [reps=3]
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
        ngram_template_corpus,
        strip_ngram_templates,
    )
    from scrubah_pii_spark.oracles_sql import framed_text_expr
    from scrubah_pii_spark.session import build_session

    spark = build_session(
        app_name="template_decomp", master="local[32]", shuffle_partitions=32
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
        n_fps = fps.count()
        t["fps_materialize"] = time.time() - t0

        t0 = time.time()
        corpus = ngram_template_corpus(df, "text", "url", fingerprints=fps)
        t["corpus_build"] = time.time() - t0  # includes the 2 collect actions

        t0 = time.time()
        stripped = strip_ngram_templates(df, corpus, "text", "url",
                                         fingerprints=fps)
        stripped.write.format("noop").mode("overwrite").save()
        t["strip_noop"] = time.time() - t0

        t0 = time.time()
        n_out = stripped.count()
        t["strip_count"] = time.time() - t0

        fps.unpersist()
        total = sum(t.values())
        print(
            f"rep{rep}: total={total:.2f}s "
            + " ".join(f"{k}={v:.2f}" for k, v in t.items())
            + f" (fps_rows={n_fps}, out_rows={n_out})",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
