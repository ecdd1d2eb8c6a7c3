"""Timeline / report jobs (the reference's corpus-level outputs).

Reference semantics: timelineOrganizer.effect.ts — chronological sort +
document numbering (:227-241), summary aggregate (:310-340), markdown report
(:345-452). The report is inherently small (one document per corpus slice);
aggregation is distributed, serialization happens once on the driver over the
aggregated rows (never over raw docs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chronological_numbering(df: DataFrame, ts_col: str = "warc_ts",
                            id_col: str = "url", reverse: bool = False) -> DataFrame:
    """Global sort + document_number = idx+1. Global window => single
    partition; appropriate for report-sized frames only (use zipWithIndex-
    style bucketed numbering for full-corpus outputs)."""
    order = [F.desc(ts_col), F.desc(id_col)] if reverse else [F.asc(ts_col), F.asc(id_col)]
    w = Window.orderBy(*order)
    return df.withColumn("document_number", F.row_number().over(w))


def timeline_summary(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Totals, dup counts, date range, counts per docType
    (timelineOrganizer.effect.ts:310-340)."""
    base = df.agg(
        F.count("*").alias("total_documents"),
        F.sum(F.col("difference_type").isin("near-duplicate").cast("int")).alias("duplicates"),
        F.min(ts_col).alias("date_start"),
        F.max(ts_col).alias("date_end"),
    )
    by_type = df.groupBy("doc_type").agg(F.count("*").alias("n"))
    return base.crossJoin(
        by_type.agg(
            F.map_from_entries(F.collect_list(F.struct("doc_type", "n"))).alias("by_doc_type")
        )
    )


def timeline_markdown(summary_row, docs_rows, max_lines_per_doc: int = 50) -> str:
    """Driver-side serialization of the (small) aggregated report —
    summary header + per-doc sections + duplicate notices
    (timelineOrganizer.effect.ts:345-452). Deterministic."""
    lines = [
        "# Master Timeline",
        "",
        f"Total documents: {summary_row['total_documents']}",
        f"Duplicates: {summary_row['duplicates']}",
        f"Date range: {summary_row['date_start']} .. {summary_row['date_end']}",
        "",
    ]
    for r in docs_rows:
        lines.append(f"## Document {r['document_number']}: {r['url']}")
        lines.append(f"*Type: {r['doc_type']} | Date: {r['warc_ts']}*")
        if r.get("difference_type") == "near-duplicate":
            lines.append(f"> NOTE: near-duplicate of {r.get('near_dup_of', '?')}")
        body = (r.get("scrubbed_text") or "").split("\n")[:max_lines_per_doc]
        lines.extend(body)
        lines.append("")
    return "\n".join(lines)


def validate_urls(df: DataFrame, url_col: str = "url",
                  allowed_schemes=("http", "https"),
                  blocked_extensions=(".exe", ".zip", ".jpg", ".png", ".gif",
                                      ".mp4", ".pdf", ".css", ".js")) -> DataFrame:
    """validateFile analog for webtext (fileValidation.ts:73-143 semantics:
    normalization + allowlist filter) — scheme allowlist + binary-extension
    blocklist + length cap, all native expressions."""
    scheme = F.regexp_extract(F.col(url_col), r"^([a-z][a-z0-9+.-]*):", 1)
    path = F.lower(F.regexp_extract(F.col(url_col), r"^[^?#]*", 0))
    ext_ok = ~path.rlike("(" + "|".join(e.replace(".", r"\.") for e in blocked_extensions) + ")$")
    return df.withColumn(
        "url_valid",
        scheme.isin(*allowed_schemes) & ext_ok & (F.length(url_col) <= 2048),
    )


def quality_routing(df: DataFrame, score_col: str = "quality_score") -> DataFrame:
    """Routing levels + flags (ocrQualityGate.effect.ts:219-247 thresholds:
    HIGH >= 0.7 / MEDIUM >= 0.4 / LOW; flags LOW_CONFIDENCE,
    HIGH_GARBAGE_DENSITY->HIGH_REPETITION, LOW_ALPHA_RATIO, SPARSE_TEXT)."""
    level = (
        F.when(F.col(score_col) >= 0.7, "HIGH")
        .when(F.col(score_col) >= 0.4, "MEDIUM")
        .otherwise("LOW")
    )
    flags = F.array_compact(
        F.array(
            F.when(F.col(score_col) < 0.4, F.lit("LOW_CONFIDENCE")),
            F.when(F.col("alpha_ratio") < 0.5, F.lit("LOW_ALPHA_RATIO")),
            F.when(F.col("word_count") < 10, F.lit("SPARSE_TEXT")),
            F.when(F.col("repetition_ratio") > 0.5, F.lit("HIGH_REPETITION")),
        )
    )
    return df.withColumn("quality_level", level).withColumn("quality_flags", flags)
