"""The flagship pipeline: extract -> langid -> quality -> scrub -> relevance
-> dedup -> leak-check -> write (+ lineage & metrics).

One declarative DataFrame program; Catalyst prunes `html` right after
extraction, pushes the langid/quality filters ahead of the (expensive) scrub
UDF, and fuses all native-expression stages into whole-stage codegen. The
scrub UDF is the only Python hop for kept rows.

Scale design notes (100 TB / 1000 executors):
  * stage order puts cheap native gates (langid, quality) BEFORE the pandas
    UDF so dropped docs never cross the Arrow boundary;
  * salted repartition on skewed hosts before the UDF evens executor load
    (Common-Crawl host skew; FIXTURES gives a few hosts ~30% of rows);
  * dedup joins shuffle on short keys (content_hash / band bits), exact-dup
    removal runs before the banded join;
  * output partitioned by crawl_date + bucketed url hash; per-partition
    lineage + metrics tables feed the completed-partition manifest (resume).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_PIPELINE_CONFIG, PipelineConfig
from ..functions.langid_expr import langid_columns
from ..functions.quality_expr import quality_columns, repetition_ratio_expr
from ..functions.relevance_expr import generation_from_ts, relevance_columns
from ..functions.hashing_expr import doc_type_expr
from ..operators.dedup import analyze_near_duplicates, mark_exact_duplicates
from ..operators.scrub_op import (
    extract_text_udf,
    leak_check_expr,
    log_perplexity_udf,
    scrub_udf,
    simhash_udf,
)
from ..sources.io import with_partition_cols


@dataclass
class PipelineResult:
    output: DataFrame     # kept+demoted rows with scrubbed text + labels
    labeled: DataFrame    # every input row with stage labels (lineage)
    metrics: DataFrame    # per-partition per-stage counts


def _host(url_col):
    return F.regexp_extract(url_col, r"https?://([^/]+)/", 1)


def run_pipeline(
    df: DataFrame,
    cfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG,
    use_crawl_lang: bool = False,
    with_perplexity: bool = True,
) -> PipelineResult:
    """df: (url, warc_ts, html, text?, lang?) — the input-hint table."""
    spark = df.sparkSession

    # -- extract (html -> text); column-prune drops html immediately after
    if "html" in df.columns:
        df = df.withColumn(
            "extracted_text",
            F.when(
                F.col("text").isNotNull() if "text" in df.columns else F.lit(False),
                F.col("text"),
            ).otherwise(extract_text_udf(F.col("html"))),
        ).drop("html")
    else:
        df = df.withColumn("extracted_text", F.col("text"))

    # -- salted repartition before the heavy UDF stage: skewed hosts spread
    df = df.withColumn("host", _host(F.col("url"))).repartition(
        spark.conf.get("spark.sql.shuffle.partitions", "32") and
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        F.col("host"),
        (F.rand(seed=42) * cfg.salt_buckets).cast("int"),
    )

    # -- langid (native)
    for name, col in langid_columns(F.col("extracted_text")).items():
        df = df.withColumn(name, col)
    lang_src = F.col("lang") if use_crawl_lang and "lang" in df.columns else F.col("lang_pred")
    df = df.withColumn("lang_keep", lang_src.isin(*cfg.langid.keep_langs))

    # -- quality (native)
    for name, col in quality_columns(F.col("extracted_text")).items():
        df = df.withColumn(name, col)
    df = df.withColumn(
        "repetition_ratio", repetition_ratio_expr(F.col("extracted_text"))
    ).withColumn("quality_keep", F.col("quality_score") >= cfg.quality.ocr_min_quality)

    # -- perplexity (pandas UDF; optional gate, metrics always)
    if with_perplexity:
        df = df.withColumn("log_ppl", log_perplexity_udf(F.col("extracted_text")))
    else:
        df = df.withColumn("log_ppl", F.lit(None).cast("double"))

    df = df.withColumn("gates_pass", F.col("lang_keep") & F.col("quality_keep"))

    # -- scrub (pandas UDF); gated rows pass NULL into the UDF so dropped
    # docs cost ~nothing inside the Python batch (and stay NULL after)
    scrub = F.when(
        F.col("gates_pass"),
        scrub_udf(F.when(F.col("gates_pass"), F.col("extracted_text"))),
    )
    df = (
        df.withColumn("_scrub", scrub)
        .withColumn("scrubbed_text", F.col("_scrub.scrubbed_text"))
        .withColumn("replacements", F.col("_scrub.replacements"))
        .withColumn("pii_count", F.col("_scrub.pii_count"))
        .drop("_scrub")
    )

    # -- relevance (native, on scrubbed text)
    gen = generation_from_ts(F.col("warc_ts"), cfg.relevance.current_year)
    df = df.withColumn("generation", gen)
    for name, col in relevance_columns(
        F.coalesce(F.col("scrubbed_text"), F.lit("")), F.col("generation")
    ).items():
        df = df.withColumn(name, col)
    df = df.withColumn(
        "recommendation",
        F.when(~F.col("gates_pass"), "discard").otherwise(F.col("recommendation")),
    )

    # -- fingerprints + dedup on kept/demoted rows
    df = df.withColumn(
        "simhash",
        F.when(F.col("gates_pass"), simhash_udf(F.coalesce("scrubbed_text", F.lit("")))),
    ).withColumn(
        "doc_type", doc_type_expr(F.lit(""), F.coalesce("scrubbed_text", F.lit("")))
    )

    # Stage barrier: persist the fully-labeled frame. Two reasons:
    #  (1) dedup, output, metrics and lineage all consume it — without the
    #      barrier Spark recomputes extract+scrub+score once per sink;
    #  (2) it stops Catalyst from substituting the (large) per-stage
    #      expression trees through the dedup joins/windows during filter
    #      pushdown — plan size stays linear in stages. At cluster scale this
    #      barrier is the natural stage-materialization point (MEMORY_AND_DISK
    #      spills; a production run can swap it for a parquet stage write).
    labeled = df.persist()
    candidates = labeled.filter(F.col("recommendation") != "discard")
    candidates = mark_exact_duplicates(candidates)
    uniq = candidates.filter(~F.col("is_exact_dup"))
    near = analyze_near_duplicates(uniq)
    survivors = near.filter(~F.col("is_near_dup"))

    # -- leak check: hard gate before the sink (phi.ts assertion semantics)
    survivors = survivors.withColumn(
        "pii_leak", leak_check_expr(F.col("scrubbed_text"))
    )

    output = with_partition_cols(survivors, url_buckets=cfg.url_buckets).select(
        "url", "warc_ts", "crawl_date", "url_bucket", "host",
        "scrubbed_text", "replacements", "pii_count",
        "lang_pred", "quality_score", "log_ppl", "repetition_ratio",
        "relevance_score", "recommendation", "generation",
        "content_hash", "simhash", "doc_type",
        "similarity", "difference_type", "pii_leak",
    )

    metrics = (
        with_partition_cols(labeled)
        .groupBy("crawl_date")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.col("lang_keep").cast("int")).alias("lang_kept"),
            F.sum(F.col("quality_keep").cast("int")).alias("quality_kept"),
            F.sum((F.col("recommendation") == "keep").cast("int")).alias("kept"),
            F.sum((F.col("recommendation") == "demote").cast("int")).alias("demoted"),
            F.sum((F.col("recommendation") == "discard").cast("int")).alias("discarded"),
            F.sum("pii_count").alias("pii_replacements"),
            F.avg("quality_score").alias("avg_quality"),
            F.avg("relevance_score").alias("avg_relevance"),
        )
    )

    return PipelineResult(output=output, labeled=labeled, metrics=metrics)


def lineage_table(labeled: DataFrame) -> DataFrame:
    """Per-document-per-pattern audit rows (AuditCollector semantics,
    auditCollector.ts:19-149): explode the replacement map, classify the
    pattern namespace from the placeholder."""
    return (
        labeled.filter(F.col("replacements").isNotNull())
        .select(
            "url",
            F.explode_outer("replacements").alias("original", "placeholder"),
        )
        .withColumn(
            "pattern_type",
            F.regexp_extract("placeholder", r"\[([A-Z_]+?)[-_]\d+\]", 1),
        )
        .groupBy("url", "pattern_type")
        .agg(
            F.count("*").alias("match_count"),
            F.sum(F.length("original")).alias("chars_removed"),
        )
    )
