"""Keep/drop relevance scoring as a native column program.

The exact arithmetic of /root/reference/services/medicalRelevanceFilter.ts:
297-385 (term tables :49-137) expressed with built-in functions only, so the
hot path is JVM-side with whole-stage codegen — ~125 `contains` probes fold
into one generated stage; no Python is involved per row.

Agrees exactly with core.relevance.relevance_score (cross-checked in tests;
that pure function is also the DuckDB-oracle generator — see oracle_sql()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.relevance import (
    CLINICAL_REFERENCES,
    GARBAGE_INDICATORS,
    REFERENCE_WEIGHTS,
)

_PLACEHOLDER_PATTERN = r"\[[A-Z_]+_\d+\]"


def _contains_any(lower_text: Column, terms) -> Column:
    out = F.lit(False)
    for t in terms:
        out = out | lower_text.contains(t)
    return out


def reference_count_expr(lower_text: Column) -> Column:
    total = F.lit(0)
    for cat, terms in CLINICAL_REFERENCES.items():
        w = REFERENCE_WEIGHTS[cat]
        for t in terms:
            total = total + F.when(lower_text.contains(t), w).otherwise(0)
    return total


def relevance_columns(text: Column, generation: Column) -> dict:
    """All relevance columns. `generation` supplied by the caller (pipeline
    derives it from warc_ts; tables without timestamps pass lit(2))."""
    lt = F.lower(text)
    refs = reference_count_expr(lt)
    garbage = _contains_any(lt, GARBAGE_INDICATORS)

    non_ws = F.length(F.regexp_replace(text, r"\s+", ""))
    ph_chars = F.length(text) - F.length(F.regexp_replace(text, _PLACEHOLDER_PATTERN, ""))
    ph_density = (
        F.when(F.length(text) == 0, F.lit(1.0))
        .when(non_ws == 0, F.lit(1.0))
        .otherwise(ph_chars.cast("double") / non_ws.cast("double"))
    )

    words = F.size(F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0))
    med_density = F.when(words > 0, F.least(F.lit(1.0), refs * 1.5 / words)).otherwise(
        F.lit(0.0)
    )

    flags = {
        "has_diagnoses": _contains_any(lt, CLINICAL_REFERENCES["DIAGNOSES"]),
        "has_procedures": _contains_any(lt, CLINICAL_REFERENCES["PROCEDURES"]),
        "has_outcomes": _contains_any(lt, CLINICAL_REFERENCES["OUTCOMES"]),
        "has_lab_data": _contains_any(lt, CLINICAL_REFERENCES["LAB_VITALS"]),
        "has_medications": _contains_any(lt, CLINICAL_REFERENCES["TREATMENTS"]),
    }

    score = (
        F.lit(50.0)
        + F.when(ph_density > 0.6, -40.0)
        .when(ph_density > 0.4, -25.0)
        .when(ph_density > 0.2, -10.0)
        .otherwise(0.0)
        + med_density * 50
        + F.least(F.lit(30), refs * 2).cast("double")
        + F.when(flags["has_diagnoses"], 10.0).otherwise(0.0)
        + F.when(flags["has_procedures"], 10.0).otherwise(0.0)
        + F.when(flags["has_outcomes"], 15.0).otherwise(0.0)
        + F.when(flags["has_lab_data"], 8.0).otherwise(0.0)
        + F.when(flags["has_medications"], 7.0).otherwise(0.0)
        + F.when(garbage, -50.0).otherwise(0.0)
        + F.when(generation == 0, 10.0).when(generation == 1, 5.0).otherwise(0.0)
    )
    score = F.greatest(F.lit(0.0), F.least(F.lit(100.0), score))

    recommendation = (
        F.when(garbage, "discard")
        .when(score >= 60, "keep")
        .when(score >= 30, "demote")
        .otherwise("discard")
    )

    return {
        "clinical_references": refs,
        "is_garbage_doc": garbage,
        "placeholder_density": ph_density,
        "medical_content_density": med_density,
        **flags,
        "relevance_score": score,
        "recommendation": recommendation,
    }


def generation_from_ts(warc_ts: Column, current_year: int) -> Column:
    """Pipeline recency rule: years between crawl year and the (frozen)
    current year. Replaces the reference's filename-date parsing — webpages
    have warc_ts, not dated filenames (FIXTURES.md §1)."""
    return F.greatest(F.lit(0), F.lit(current_year) - F.year(warc_ts))
