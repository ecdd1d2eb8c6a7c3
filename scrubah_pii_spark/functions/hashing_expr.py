"""Content-hash normalization + SHA-256 as native expressions.

normalizeForHashing (contentHasher.effect.ts:37-44) is 4 chained string ops —
pure JVM expressions, no UDF:
  lower -> collapse \\s+ -> strip [..] placeholders -> dates -> trim
then sha2(. , 256). Java regex matches the JS semantics used here (the `.*?`
in the placeholder strip does not cross newlines in either engine, and
whitespace is already collapsed by that point)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_for_hashing_expr(text: Column) -> Column:
    t = F.lower(text)
    t = F.regexp_replace(t, r"\s+", " ")
    t = F.regexp_replace(t, r"\[.*?\]", "")
    t = F.regexp_replace(t, r"\d{1,2}/\d{1,2}/\d{2,4}", "DATE")
    return F.trim(t)


def content_hash_expr(text: Column) -> Column:
    return F.sha2(normalize_for_hashing_expr(text), 256)


def simhash_similarity_expr(a: Column, b: Column) -> Column:
    """1 - hamming/64 over two BIGINT simhashes — native xor + bit_count."""
    return 1.0 - F.bit_count(a.bitwiseXOR(b)).cast("double") / 64.0


def simhash_band_expr(simhash: Column, band: int, bands: int = 8) -> Column:
    """Extract band `band` (8 bits) from a 64-bit simhash for LSH bucketing."""
    width = 64 // bands
    return F.shiftrightunsigned(simhash, band * width).bitwiseAND((1 << width) - 1)


def extract_dates_expr(text: Column) -> Column:
    """array_distinct over the 3 date regex banks (contentHasher :124-140).
    Order: first-seen per pattern bank, banks concatenated — matches the
    reference's Set-insertion order."""
    p1 = F.regexp_extract_all(text, F.lit(r"\d{1,2}[-/]\d{1,2}[-/]\d{2,4}"), 0)
    p2 = F.regexp_extract_all(text, F.lit(r"\d{4}[-/]\d{1,2}[-/]\d{1,2}"), 0)
    p3 = F.regexp_extract_all(
        text,
        F.lit(r"(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{1,2},?\s+\d{4}"),
        0,
    )
    return F.array_distinct(F.concat(p1, p2, p3))


_DOC_TYPE_CASES = (
    ("lab_report", r"lab|labrpt|cbc|cmp|bmp|wbc|hemoglobin"),
    ("imaging", r"ct|mri|x-?ray|ultrasound|imaging|radiology|mammogram"),
    ("pathology", r"pathology|biopsy|specimen|histology"),
    ("progress_note", r"progress note|soap|assessment|plan|provider"),
    ("medication", r"medication|prescription|refill|pharmacy"),
    ("discharge", r"discharge|summary|follow-?up instructions"),
    ("correspondence", r"letter|correspondence|referral"),
)


def doc_type_expr(filename: Column, text: Column) -> Column:
    """Keyword-cascade document typing (contentHasher.effect.ts:151-171):
    probe = lower(filename + ' ' + first 500 chars)."""
    probe = F.lower(F.concat_ws(" ", filename, F.substring(text, 1, 500)))
    out = None
    for name, pat in _DOC_TYPE_CASES:
        cond = probe.rlike(pat)
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out.otherwise("unknown")
