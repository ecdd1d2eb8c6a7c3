"""Whitelist timeline formatter + extraction pipeline — pure-Python port.

Reference semantics:
  /root/reference/services/whitelist/services/timelineFormatter.effect.ts
    emoji maps :26-43, formatLabTable :49-71, formatLabTrends :73-106,
    formatDiagnoses :112-129, formatMedications :135-152,
    formatImagingFindings :158-183, formatVitalSigns :189-214,
    formatPathology :220-238, formatDocument :244-297,
    calculateSummary :314-367, formatSummary :369-416,
    formatMedicalTimeline :427-495
  /root/reference/services/whitelist/services/extractionPipeline.effect.ts
    extractBatch :63-120, runExtractionPipeline :139-190,
    buildMasterTimelineV2 :230-259

Determinism deviation (documented): the reference stamps `new Date()` into
the header/footer; this port takes `generated_at` (an ISO-8601 string like
"2026-01-01T00:00:00.000Z") explicitly so output is byte-reproducible.
JS float formatting parity: percent changes use toFixed(1) with JS
semantics (round-half-up on the exact binary value of the double).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from .whitelist import (
    ExtractedMedicalRecord,
    _parse_float,
    extract_medical_data,
    simple_hash_hex,
)

LAB_STATUS_EMOJI = {
    "Normal": "✅",
    "Low": "⬇️",
    "High": "⬆️",
    "Critical": "\U0001f6a8",
}

DOC_TYPE_EMOJI = {
    "lab_report": "\U0001f9ea",
    "imaging": "\U0001f52c",
    "pathology": "\U0001f52c",
    "discharge_summary": "\U0001f3e0",
    "progress_note": "\U0001f4dd",
    "medication_list": "\U0001f48a",
    "procedure_note": "\U0001f3e5",
    "consultation": "\U0001f468‍⚕️",
    "unknown": "\U0001f4c4",
}


def js_to_fixed(x: float, digits: int) -> str:
    """JS Number.prototype.toFixed: decimal expansion of the exact binary
    double, rounded half-up (x is non-negative in all call sites here)."""
    return str(Decimal(x).quantize(Decimal(1).scaleb(-digits), ROUND_HALF_UP))


def format_lab_table(panel: dict) -> str:
    if not panel["results"]:
        return ""
    lines = [
        f"**Collection Date**: {panel['collection_date']}",
        "",
        "| Test | Value | Reference | Status |",
        "|------|-------|-----------|--------|",
    ]
    for r in panel["results"]:
        status = r["status"] or "unknown"
        emoji = LAB_STATUS_EMOJI.get(status)
        ref = r["reference_range"] or "—"
        unit = f" {r['unit']}" if r["unit"] else ""
        lines.append(
            f"| {r['test_name']} | {r['value']}{unit} | {ref} | {emoji} {status} |"
        )
    return "\n".join(lines)


def format_lab_trends(current_panel: dict, previous_panel: dict | None) -> str:
    if not previous_panel:
        return ""
    trends = []
    prev_by_name = {}
    for r in previous_panel["results"]:
        # Array.find: first match wins
        prev_by_name.setdefault(r["test_name"], r)
    for cur in current_panel["results"]:
        prev = prev_by_name.get(cur["test_name"])
        if prev is None:
            continue
        cur_val = _parse_float(cur["value"])
        prev_val = _parse_float(prev["value"])
        if cur_val is not None and prev_val is not None and prev_val != 0:
            change = (cur_val - prev_val) / prev_val * 100
            if abs(change) > 5:
                arrow = "↑" if change > 0 else "↓"
                trends.append(
                    f"- {cur['test_name']}: {prev['value']} → {cur['value']} "
                    f"({arrow} {js_to_fixed(abs(change), 1)}%)"
                )
    if not trends:
        return ""
    return "\n".join(["", "#### Trends vs Previous", *trends])


def format_diagnoses(diagnoses: list) -> str:
    if not diagnoses:
        return ""
    lines = ["#### Diagnoses", ""]
    for dx in diagnoses:
        parts = [f"- **{dx['condition']}**"]
        if dx["icd_code"]:
            parts.append(f"({dx['icd_code']})")
        if dx["severity"] and dx["severity"] != "unspecified":
            parts.append(f"— {dx['severity']}")
        if dx["status"]:
            parts.append(f"[{dx['status']}]")
        lines.append(" ".join(parts))
    return "\n".join(lines)


def format_medications(medications: list) -> str:
    if not medications:
        return ""
    lines = ["#### Medications", ""]
    for med in medications:
        parts = [f"- **{med['name']}**"]
        if med["dose"] and med["unit"]:
            parts.append(f"{med['dose']} {med['unit']}")
        if med["route"]:
            parts.append(f"({med['route']})")
        if med["frequency"]:
            parts.append(f"— {med['frequency']}")
        lines.append(" ".join(parts))
    return "\n".join(lines)


def format_imaging_findings(findings: list) -> str:
    if not findings:
        return ""
    lines = []
    for finding in findings:
        lines.extend([f"#### {finding['modality'].upper()} — {finding['body_part']}", ""])
        if finding["findings"]:
            lines.append("**Findings:**")
            for f in finding["findings"]:
                lines.append(f"- {f}")
            lines.append("")
        if finding["impression"]:
            lines.extend([f"**Impression:** {finding['impression']}", ""])
    return "\n".join(lines)


def _js_truthy_num(x) -> bool:
    return x is not None and x != 0


def format_vital_signs(vitals: list) -> str:
    if not vitals:
        return ""
    v = vitals[0]
    parts = []
    if _js_truthy_num(v["blood_pressure_systolic"]) and _js_truthy_num(
        v["blood_pressure_diastolic"]
    ):
        parts.append(f"BP: {v['blood_pressure_systolic']}/{v['blood_pressure_diastolic']}")
    if _js_truthy_num(v["heart_rate"]):
        parts.append(f"HR: {v['heart_rate']}")
    if _js_truthy_num(v["respiratory_rate"]):
        parts.append(f"RR: {v['respiratory_rate']}")
    if _js_truthy_num(v["temperature"]):
        from .whitelist import js_num

        parts.append(f"Temp: {js_num(v['temperature'])}°{v['temperature_unit'] or 'F'}")
    if _js_truthy_num(v["oxygen_saturation"]):
        parts.append(f"SpO2: {v['oxygen_saturation']}%")
    if v["pain_scale"] is not None:
        parts.append(f"Pain: {v['pain_scale']}/10")
    if not parts:
        return ""
    return "\n".join(["#### Vital Signs", "", " | ".join(parts), ""])


def format_pathology(results: list) -> str:
    if not results:
        return ""
    lines = ["#### Pathology", ""]
    for r in results:
        lines.append(f"**Specimen:** {r['specimen_type']}")
        lines.append(f"**Diagnosis:** {r['diagnosis']}")
        if r["grade"]:
            lines.append(f"**Grade:** {r['grade']}")
        if r["stage"]:
            lines.append(f"**Stage:** {r['stage']}")
        if r["margins"]:
            lines.append(f"**Margins:** {r['margins']}")
        lines.append("")
    return "\n".join(lines)


def format_document(
    record: ExtractedMedicalRecord, index: int, previous_lab_panel: dict | None
) -> str:
    emoji = DOC_TYPE_EMOJI.get(record.document_type, "\U0001f4c4")
    date = record.document_date or "Unknown Date"
    sections = [
        f"### {emoji} {date} | {record.document_type.replace('_', ' ').upper()}",
        f"**Document #{index + 1}** | Hash: `{record.source_document_hash[:8]}` | "
        f"Confidence: {record.extraction_confidence}%",
        "",
    ]
    vitals_section = format_vital_signs(record.vital_signs)
    if vitals_section:
        sections.append(vitals_section)
    dx_section = format_diagnoses(record.diagnoses)
    if dx_section:
        sections.extend([dx_section, ""])
    for panel in record.lab_panels:
        sections.append(format_lab_table(panel))
        sections.append(format_lab_trends(panel, previous_lab_panel))
        sections.append("")
    meds_section = format_medications(record.medications)
    if meds_section:
        sections.extend([meds_section, ""])
    imaging_section = format_imaging_findings(record.imaging_findings)
    if imaging_section:
        sections.append(imaging_section)
    path_section = format_pathology(record.pathology)
    if path_section:
        sections.append(path_section)
    if record.warnings:
        sections.extend([
            "",
            "> ⚠️ **Extraction Warnings:**",
            *[f"> - {w}" for w in record.warnings],
        ])
    sections.extend(["", "---", ""])
    return "\n".join(sections)


def calculate_summary(records: list) -> dict:
    dates = sorted(r.document_date for r in records if r.document_date is not None)
    by_type: dict = {}
    total_dx = total_panels = total_meds = 0
    all_meds: list = []
    all_dx: list = []
    for r in records:
        by_type[r.document_type] = by_type.get(r.document_type, 0) + 1
        total_dx += len(r.diagnoses)
        total_panels += len(r.lab_panels)
        total_meds += len(r.medications)
        all_meds.extend(r.medications)
        all_dx.extend(r.diagnoses)
    seen_meds: set = set()
    active_meds = []
    for m in all_meds:
        key = m["name"].lower()
        if key in seen_meds:
            continue
        seen_meds.add(key)
        if m["status"] == "active":
            active_meds.append(m)
    seen_dx: set = set()
    active_dx = []
    for d in all_dx:
        key = d["condition"].lower()
        if key in seen_dx:
            continue
        seen_dx.add(key)
        if d["status"] == "active":
            active_dx.append(d)
    return {
        "earliest": dates[0] if dates else "Unknown",
        "latest": dates[-1] if dates else "Unknown",
        "total_documents": len(records),
        "by_type": by_type,
        "active_medications": active_meds,
        "active_diagnoses": active_dx,
    }


def format_summary(summary: dict) -> str:
    lines = [
        "## \U0001f4ca Summary Statistics",
        "",
        f"- **Date Range**: {summary['earliest']} → {summary['latest']}",
        f"- **Total Documents**: {summary['total_documents']}",
        "- **Document Types**:",
    ]
    for doc_type, count in summary["by_type"].items():
        emoji = DOC_TYPE_EMOJI.get(doc_type, "\U0001f4c4")
        lines.append(f"  - {emoji} {doc_type.replace('_', ' ')}: {count}")
    lines.extend(["", "### \U0001f3af Active Diagnoses", ""])
    if summary["active_diagnoses"]:
        for dx in summary["active_diagnoses"]:
            sev = f" ({dx['severity']})" if dx["severity"] != "unspecified" else ""
            lines.append(f"- {dx['condition']}{sev}")
    else:
        lines.append("_No active diagnoses extracted_")
    lines.extend(["", "### \U0001f48a Current Medications", ""])
    if summary["active_medications"]:
        for med in summary["active_medications"]:
            dose = f" {med['dose']} {med['unit']}" if med["dose"] and med["unit"] else ""
            freq = f" — {med['frequency']}" if med["frequency"] else ""
            lines.append(f"- {med['name']}{dose}{freq}")
    else:
        lines.append("_No active medications extracted_")
    lines.extend(["", "---", ""])
    return "\n".join(lines)


def format_medical_timeline(
    records: list,
    title: str = "Medical Record Timeline",
    generated_at: str = "2026-01-01T00:00:00.000Z",
) -> str:
    """timelineFormatter.effect.ts:427-495; `generated_at` replaces the
    reference's `new Date().toISOString()` stamps."""
    sorted_records = sorted(records, key=lambda r: r.document_date or "9999")
    header = "\n".join([
        f"# \U0001f3e5 {title}",
        "",
        "_Extracted using whitelist approach — only clinical data, no PII_",
        "",
        f"_Generated: {generated_at.split('T')[0]}_",
        "",
    ])
    summary_section = format_summary(calculate_summary(sorted_records))
    timeline_header = "\n".join([
        "## \U0001f4c5 Chronological Timeline",
        "",
        "_Documents ordered oldest → newest_",
        "",
    ])
    previous_lab_panel = None
    document_sections = []
    for index, record in enumerate(sorted_records):
        document_sections.append(format_document(record, index, previous_lab_panel))
        if record.lab_panels:
            previous_lab_panel = record.lab_panels[-1]
    footer = "\n".join([
        "",
        "---",
        "",
        "_This timeline was generated using whitelist extraction. Only structured clinical data_",
        "_was extracted — names, addresses, phone numbers, and other PII were never captured._",
        "",
        f"_Scrubah.PII Medical Extractor v2.0 — {generated_at}_",
    ])
    return "\n".join([header, summary_section, timeline_header, *document_sections, footer])


# --- Batch pipeline (extractionPipeline.effect.ts) -----------------------------


def extract_batch(documents: list, as_of_date: str = "2026-01-01") -> dict:
    """extractionPipeline.effect.ts:63-120. documents: [{id, filename,
    raw_text}]. Extraction never fails (see core.whitelist docstring), so
    failed/errors stay 0, and the BATCH-level warnings list stays empty —
    the reference's batch collector only receives errors from catchAll
    (which never fires); per-document lab-parse warnings live on each
    record's own `warnings` field."""
    records = []
    total_labs = total_dx = total_meds = 0
    for doc in documents:
        record = extract_medical_data(
            doc["raw_text"], doc["filename"],
            simple_hash_hex(doc["raw_text"]), as_of_date,
        )
        total_labs += sum(len(p["results"]) for p in record.lab_panels)
        total_dx += len(record.diagnoses)
        total_meds += len(record.medications)
        records.append(record)
    return {
        "records": records,
        "errors": [],
        "warnings": [],
        "stats": {
            "total_documents": len(documents),
            "successful_extractions": len(records),
            "failed_extractions": 0,
            "total_lab_results": total_labs,
            "total_diagnoses": total_dx,
            "total_medications": total_meds,
        },
    }


def run_extraction_pipeline(
    documents: list,
    timeline_title: str | None = None,
    as_of_date: str = "2026-01-01",
    generated_at: str = "2026-01-01T00:00:00.000Z",
) -> dict:
    """extractionPipeline.effect.ts:139-190. The optional Warnings/Errors
    sections of the stats block (:167-183) never render because the batch
    collector stays empty (see extract_batch docstring) — byte-faithful."""
    extraction = extract_batch(documents, as_of_date)
    markdown = format_medical_timeline(
        extraction["records"],
        timeline_title or "Medical Record Timeline",
        generated_at,
    )
    stats = extraction["stats"]
    stats_block = [
        "",
        "---",
        "",
        "## \U0001f4c8 Extraction Statistics",
        "",
        f"- Documents processed: {stats['total_documents']}",
        f"- Successful extractions: {stats['successful_extractions']}",
        f"- Failed extractions: {stats['failed_extractions']}",
        f"- Lab results extracted: {stats['total_lab_results']}",
        f"- Diagnoses extracted: {stats['total_diagnoses']}",
        f"- Medications extracted: {stats['total_medications']}",
    ]
    return {
        "markdown": markdown + "\n".join(stats_block),
        "extraction": extraction,
    }


def build_master_timeline_v2(
    files: list,
    as_of_date: str = "2026-01-01",
    generated_at: str = "2026-01-01T00:00:00.000Z",
) -> dict:
    """extractionPipeline.effect.ts:230-259 — drop-in V2 timeline builder.
    files: [{id, original_name, scrubbed_text?, raw_text?}]."""
    documents = [
        {
            "id": f["id"],
            "filename": f["original_name"],
            "raw_text": f.get("scrubbed_text") or f.get("raw_text") or "",
        }
        for f in files
        if f.get("scrubbed_text") or f.get("raw_text")
    ]
    result = run_extraction_pipeline(
        documents, "Medical Record Timeline", as_of_date, generated_at
    )
    stats = result["extraction"]["stats"]
    return {
        "markdown": result["markdown"],
        "summary": {
            "total_documents": stats["total_documents"],
            "unique_documents": stats["successful_extractions"],
            "duplicates": stats["failed_extractions"],
        },
    }
