"""Structured Streaming variant of the quality-filter + scrub pipeline.

The reference has NO streaming (SURVEY §2.10) — its incremental behavior is
document-at-a-time persistence. This module is the Spark-native incremental
ingestion path for continuously-arriving crawl data:

  readStream (parquet dir) -> watermark on warc_ts -> dropDuplicates(url)
  -> the same native gates + scrub UDF (stateless stages compose unchanged)
  -> writeStream with checkpointLocation (exactly-once per micro-batch)

Cross-document operators (near-dup LSH, template corpus) are deliberately NOT
in the streaming path: they are corpus-level and run as periodic batch
compaction over the landed output — the same manifest/anti-join resume
machinery (sources/io.py) makes those jobs idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_PIPELINE_CONFIG, PipelineConfig
from ..functions.langid_expr import langid_columns
from ..functions.quality_expr import quality_columns
from ..functions.relevance_expr import add_relevance_columns
from ..operators.scrub_op import extract_text_udf, leak_check_expr, scrub_udf

WEBPAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_webpage_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_transform(
    stream: DataFrame,
    cfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateless per-doc stages + watermarked url dedup. Returns a streaming
    DataFrame ready for writeStream."""
    df = stream.withWatermark("warc_ts", watermark).dropDuplicates(["url"])
    df = df.withColumn(
        "extracted_text",
        F.when(F.col("text").isNotNull(), F.col("text")).otherwise(
            extract_text_udf(F.col("html"))
        ),
    ).drop("html")
    for name, col in langid_columns(F.col("extracted_text")).items():
        df = df.withColumn(name, col)
    df = df.withColumn("lang_keep", F.col("lang_pred").isin(*cfg.langid.keep_langs))
    for name, col in quality_columns(F.col("extracted_text")).items():
        df = df.withColumn(name, col)
    df = df.withColumn(
        "quality_keep", F.col("quality_score") >= cfg.quality.ocr_min_quality
    ).withColumn("gates_pass", F.col("lang_keep") & F.col("quality_keep"))
    scrub = F.when(
        F.col("gates_pass"),
        scrub_udf(F.when(F.col("gates_pass"), F.col("extracted_text"))),
    )
    df = (
        df.withColumn("_scrub", scrub)
        .withColumn("scrubbed_text", F.col("_scrub.scrubbed_text"))
        .withColumn("pii_count", F.col("_scrub.pii_count"))
        .drop("_scrub")
        .withColumn("generation", F.lit(2))
    )
    df = add_relevance_columns(
        df.withColumn("_snn", F.coalesce("scrubbed_text", F.lit(""))), "_snn"
    ).drop("_snn")
    return df.withColumn(
        "pii_leak", F.coalesce(leak_check_expr(F.col("scrubbed_text")), F.lit(False))
    ).withColumn("crawl_date", F.to_date("warc_ts"))


def start_stream(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG,
):
    out = streaming_transform(read_webpage_stream(spark, input_dir), cfg)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("crawl_date")
        .outputMode("append")
        .start()
    )
