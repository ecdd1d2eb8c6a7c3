"""Template/boilerplate detection and stripping.

Two tiers, mirroring the reference:
  1. line-frequency templates (production cheap path):
     compressionPipeline.effect.ts:141-183 — trimmed lines >= 20 chars counted
     once per doc; template iff present in >= max(2, floor(50% * docs)); strip.
  2. FNV-1a n-gram corpus (full path): templateDetection.effect.ts:143-312 —
     2..5-line n-gram windows, normalized, FNV-1a-64 hashed; template iff
     distinct-doc count >= max(min_docs, 30% * docs).

Spark shape: explode lines -> hash/group (map-side partial agg) -> tiny corpus
DataFrame -> broadcast hash-join back -> array ops rebuild the stripped text.
The corpus is dimension-sized at any corpus scale (frequency threshold is a
fraction of docs), so the join side is always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .scrub_op import fnv1a64_udf


def _lines(df: DataFrame, text_col: str, url_col: str) -> DataFrame:
    return df.select(
        F.col(url_col).alias("_url"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("trimmed", F.trim("line"))


def line_frequency_templates(
    df: DataFrame, text_col: str, url_col: str = "url",
    min_len: int = 20, frac: float = 0.5, min_docs: int = 2,
) -> DataFrame:
    """The template-line dimension table: (trimmed, doc_count)."""
    n_docs = df.count()
    threshold = max(min_docs, int(n_docs * frac))
    return (
        _lines(df, text_col, url_col)
        .filter(F.length("trimmed") >= min_len)
        .dropDuplicates(["_url", "trimmed"])
        .groupBy("trimmed")
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= threshold)
    )


def strip_template_lines(
    df: DataFrame, templates: DataFrame, text_col: str, url_col: str = "url",
    out_col: str = "stripped_text",
) -> DataFrame:
    """Remove template lines from each doc; adds out_col + chars_removed.
    templates is broadcast (tiny by construction)."""
    lines = _lines(df, text_col, url_col)
    kept = (
        lines.join(
            F.broadcast(templates.select(F.col("trimmed").alias("_tpl"))),
            lines["trimmed"] == F.col("_tpl"),
            "left_anti",
        )
        .groupBy("_url")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "line"))).alias("_ordered"))
        .select(
            "_url",
            F.concat_ws(
                "\n", F.transform("_ordered", lambda s: s.getField("line"))
            ).alias(out_col),
        )
    )
    return (
        df.join(kept, df[url_col] == kept["_url"], "left")
        .drop("_url")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("chars_removed", F.length(text_col) - F.length(out_col))
    )


def ngram_template_corpus(
    df: DataFrame, text_col: str, url_col: str = "url",
    min_size: int = 2, max_size: int = 5,
    threshold_frac: float = 0.3, min_docs: int = 3,
) -> DataFrame:
    """FNV-1a n-gram template corpus: (hash, ngram_size, doc_count, sample).
    Native window n-gram assembly; FNV-1a via vectorized UDF for golden
    parity (xxhash64 would be faster but breaks hash-value parity)."""
    n_docs = df.count()
    if n_docs < min_docs:
        return df.sparkSession.createDataFrame(
            [], "hash string, ngram_size int, doc_count long, sample string"
        )
    threshold = max(min_docs, int(n_docs * threshold_frac))

    lines = _lines(df, text_col, url_col).withColumn(
        "norm", F.lower(F.trim(F.regexp_replace("line", r"\s+", " ")))
    )
    w = Window.partitionBy("_url").orderBy("pos")
    grams = []
    for size in range(min_size, max_size + 1):
        window_lines = F.collect_list("norm").over(w.rowsBetween(0, size - 1))
        g = (
            lines.withColumn("_win", window_lines)
            .filter(F.size("_win") == size)
            .withColumn("content", F.concat_ws("\n", "_win"))
            .filter(F.length(F.regexp_replace("content", r"\s", "")) >= 10)
            .select("_url", F.lit(size).alias("ngram_size"), "content", "pos")
        )
        grams.append(g)
    all_grams = grams[0]
    for g in grams[1:]:
        all_grams = all_grams.unionByName(g)
    hashed = all_grams.withColumn("hash", fnv1a64_udf("content"))
    corpus = (
        hashed.groupBy("hash", "ngram_size")
        .agg(
            F.count_distinct("_url").alias("doc_count"),
            F.min("content").alias("sample"),
            F.avg("pos").alias("avg_line_offset"),
        )
        .filter(F.col("doc_count") >= threshold)
    )
    avg_doc_lines = (
        lines.groupBy("_url").agg(F.max("pos").alias("n"))
        .agg(F.avg(F.col("n") + 1)).collect()[0][0]
    ) or 0.0
    return classify_corpus(corpus, float(avg_doc_lines))


def classify_corpus(corpus: DataFrame, avg_doc_lines: float) -> DataFrame:
    """Adds position (START/END/MIDDLE by 20%/80% offset rule) and
    template_type (HEADER/FOOTER/SIGNATURE/LEGAL/... classifier,
    templateDetection.ts:188-249) to the (small) corpus frame."""
    import pandas as pd
    from pyspark.sql.types import StringType

    from ..core.hashing import classify_template_type, template_position

    if avg_doc_lines <= 0:
        pos_expr = F.lit("MIDDLE")
    else:
        pos_expr = (
            F.when(F.col("avg_line_offset") / avg_doc_lines <= 0.2, "START")
            .when(F.col("avg_line_offset") / avg_doc_lines >= 0.8, "END")
            .otherwise("MIDDLE")
        )

    @F.pandas_udf(StringType())
    def classify_udf(samples, positions):
        return pd.Series([
            classify_template_type(s or "", p or "MIDDLE")
            for s, p in zip(samples, positions)
        ])

    out = corpus.withColumn("position", pos_expr)
    return out.withColumn("template_type", classify_udf("sample", "position"))
