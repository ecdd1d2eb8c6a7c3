"""The "worker" scrub rule set — the reference's production regex engine.

From-scratch implementation of /root/reference/services/scrubber.worker.ts:
  patterns              :26-47
  acronym whitelist     :49-66
  state set             :17-24
  pass order            :169-316
Production runs this set first, then the Effect scrubber ML-only
(App.tsx:123-151); with ML disabled (the deterministic config) production
output == worker output, so this module is the production-path engine and
core.scrub (the Effect set) is the golden/test SSOT — both ship, selected by
config (SURVEY §7).

Key semantic difference from the Effect set: runRegex uses String.replace
with a callback => placeholders are numbered in FORWARD document order, and
matches are located on the pre-pass text (replacements within a pass don't
re-feed the scanner). Python's re.sub(callback) has identical semantics.

Audit logging mirrors AuditCollector (auditCollector.ts:19-149): one entry
per pattern with match list + duration.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

A = re.ASCII
I = re.IGNORECASE

US_STATES = frozenset(
    """AL AK AZ AR CA CO CT DE FL GA HI ID IL IN IA KS KY LA ME MD MA MI MN MS
    MO MT NE NV NH NJ NM NY NC ND OH OK OR PA RI SC SD TN TX UT VT VA WA WV WI
    WY DC PR VI GU AS MP""".split()
)

PATTERNS = {
    "EMAIL": re.compile(r"\b[\w.-]+@[\w.-]+\.\w{2,4}\b", A),
    "PHONE": re.compile(r"(?:\+?1[-. ]?)?\(?([0-9]{3})\)?[-. ]?([0-9]{3})[-. ]?([0-9]{4})", A),
    "SSN": re.compile(r"\b\d{3}-\d{2}-\d{4}\b", A),
    "SSN_PARTIAL": re.compile(r"\b(?:last\s*4|xxx-xx-)\s*[-:]?\s*\d{4}\b", A | I),
    "DATE": re.compile(r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b", A),
    "DATE_WRITTEN": re.compile(
        r"\b(?:January|February|March|April|May|June|July|August|September|October"
        r"|November|December)\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s+\d{4})?\b", A | I),
    "DATE_WRITTEN_ALT": re.compile(
        r"\b\d{1,2}(?:st|nd|rd|th)?\s+(?:of\s+)?(?:January|February|March|April|May"
        r"|June|July|August|September|October|November|December)(?:,?\s+\d{4})?\b", A | I),
    "CREDIT_CARD": re.compile(r"\b(?:\d{4}[-\s]?){3}\d{4}\b", A),
    "ZIPCODE": re.compile(r"\b\d{5}(?:-\d{4})?\b", A),
    "AGE": re.compile(r"\b\d{1,3}\s*(?:year[s]?\s*old|y\.?o\.?|yo|yr[s]?(?:\s*old)?)\b", A | I),
    "AGE_CONTEXT": re.compile(r"\b(?:age[d]?|DOB\s+indicates)\s*[:\s]*\d{1,3}\b", A | I),
    "ADDRESS": re.compile(
        r"\d+\s+(?:[A-Za-z]+\s+){1,4}(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd"
        r"|Lane|Ln|Drive|Dr|Court|Ct|Parkway|Pkwy|Way|Circle|Cir|Place|Pl|Terrace|Ter)"
        r"(?:\.|\s|,|\s+Apt|\s+Suite|\s+Unit|\s+#)?(?:\s*[A-Za-z0-9#-]*)?", A | I),
    "CITY_STATE": re.compile(r"\b[A-Z][a-zA-Z\s]+,\s*[A-Z]{2}\b", A),
    "PO_BOX": re.compile(r"P\.?\s*O\.?\s*Box\s+\d+", A | I),
    "ALL_CAPS_NAME": re.compile(r"\b[A-Z]{2,}(?:,?\s+[A-Z]{2,})+\b", A),
    "ALL_CAPS_SINGLE": re.compile(r"\b[A-Z]{3,}\b", A),
    "LAST_FIRST_NAME": re.compile(
        r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*,\s*[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b", A),
    "NAME_APOSTROPHE": re.compile(r"\b(?:O'|Mc|Mac)?[A-Z][a-z]+(?:[-'][A-Z]?[a-z]+)+\b", A),
    "NAME_WITH_SUFFIX": re.compile(
        r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\s+(?:Jr\.?|Sr\.?|II|III|IV|V)\b", A),
    "INSURANCE_ID": re.compile(
        r"\b(?:policy|member|subscriber|group|insurance)\s*(?:#|number|id|no)?[:\s]*"
        r"[A-Z0-9]{6,15}\b", A | I),
}

WHITELIST_ACRONYMS = frozenset(
    """CBC MRI CAT EKG ECG EEG EMG ICU CCU NICU PICU ER OR ED
    HIV AIDS COVID COPD CHF CAD GERD UTI DVT PE MI CVA TIA
    BMI BP HR RR SPO BUN WBC RBC HGB HCT PLT BMP CMP LFT
    TSH PSA HBA INR PTT ABG VBG CSF EGD ERCP PET CT US
    PRN BID TID QID QHS QAM QPM PO IV IM SQ SL PR TOP
    DNR DNI POLST HCP POA LTC SNF ALF ICD CPT DRG HCPCS
    STAT ASAP WNL NAD PERRLA ROS HPI PMH PSH FH SH RX DX TX
    SOB DOE PND JVD RUQ LUQ RLQ LLQ ROM DTR CN EOM
    AMA ADA HIPAA PHI EMR EHR CMS FDA CDC NIH WHO
    PDF DOC PAGE DATE TIME NOTE NOTES FORM REPORT SUMMARY HISTORY
    NAME AGE SEX DOB MRN SSN ZIP FAX TEL EXT
    MALE FEMALE YES NO NA TBD NKA NKDA
    SUBJECTIVE OBJECTIVE ASSESSMENT PLAN SOAP IMPRESSION RECOMMENDATION
    CHIEF COMPLAINT ALLERGIES MEDICATIONS VITALS EXAM LABS IMAGING
    PROCEDURE PROCEDURES SURGERY SURGERIES DIAGNOSIS DIAGNOSES
    USA UK EST PST CST MST UTC GMT AM PM""".split()
)

NAME_LABELS = (
    "Patient Name", "Name", "Full Name", "Legal Name", "Patient",
    "Pt Name", "Patient's Name", "Name of Patient", "patientName",
    "patient_name", "fullName", "full_name",
)

MRN_CONTEXT_KEYWORDS = (
    "MRN", "Medical Record Number", "Patient ID", "Patient Number",
    "Record Number", "Chart Number", "Account Number", "Member ID",
)

_MRN_RE = re.compile(
    "(" + "|".join(MRN_CONTEXT_KEYWORDS) + r")[:\s]+([A-Z0-9]{6,12})\b", A | I
)
_LABEL_RE = re.compile(
    "("
    + "|".join(re.escape(l) for l in sorted(NAME_LABELS, key=len, reverse=True))
    + r")\s*:\s*",
    A | I,
)
_STATE_RE = re.compile(r"\b([A-Z]{2})\b", A)
_PLACEHOLDER_RE = re.compile(r"^\[[A-Z_]+\d+\]$", A)

_AFTER_ALL_CAPS = re.compile(r"^([A-Z]{2,}(?:,?\s+[A-Z]{2,})+)", A)
_AFTER_LAST_FIRST = re.compile(r"^([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*,\s*[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)", A)
_AFTER_NAME = re.compile(r"^((?:Dr|Mr|Ms|Mrs|Miss)\.?\s+)?([A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3})", A)


@dataclass
class AuditEntry:
    pattern_type: str
    pattern_name: str
    match_count: int
    replacements: list
    duration_ms: float


@dataclass
class WorkerScrubOutcome:
    text: str
    replacements: dict
    count: int
    audit: list = field(default_factory=list)


def scrub_text_worker(text: str) -> WorkerScrubOutcome:
    e2p: dict = {}
    counters = {"PER": 0, "LOC": 0, "ORG": 0, "EMAIL": 0, "PHONE": 0, "ID": 0, "DATE": 0}
    total = 0
    interim = text
    audit: list = []

    def run_regex(ctype: str, pattern: re.Pattern, prefix: str, pname: str):
        nonlocal interim, total
        t0 = time.perf_counter()
        matches = []

        def repl(m):
            nonlocal total
            v = m.group(0)
            if v not in e2p:
                counters[ctype] += 1
                ph = f"[{prefix}_{counters[ctype]}]"
                e2p[v] = ph
                total += 1
                matches.append((v, ph))
            return e2p[v]

        interim = pattern.sub(repl, interim)
        audit.append(AuditEntry(ctype, pname, len(matches), matches,
                                (time.perf_counter() - t0) * 1000))

    run_regex("EMAIL", PATTERNS["EMAIL"], "EMAIL", "EMAIL")
    run_regex("PHONE", PATTERNS["PHONE"], "PHONE", "PHONE")
    run_regex("ID", PATTERNS["SSN"], "SSN", "SSN")
    run_regex("ID", PATTERNS["SSN_PARTIAL"], "SSN", "SSN_PARTIAL")
    run_regex("ID", PATTERNS["CREDIT_CARD"], "CARD", "CREDIT_CARD")
    run_regex("ID", PATTERNS["ZIPCODE"], "ZIP", "ZIPCODE")
    run_regex("ID", PATTERNS["INSURANCE_ID"], "ID", "INSURANCE_ID")
    run_regex("DATE", PATTERNS["DATE"], "DATE", "DATE")
    run_regex("DATE", PATTERNS["DATE_WRITTEN"], "DATE", "DATE_WRITTEN")
    run_regex("DATE", PATTERNS["DATE_WRITTEN_ALT"], "DATE", "DATE_WRITTEN_ALT")
    run_regex("DATE", PATTERNS["AGE"], "AGE", "AGE")
    run_regex("DATE", PATTERNS["AGE_CONTEXT"], "AGE", "AGE_CONTEXT")
    run_regex("LOC", PATTERNS["ADDRESS"], "ADDR", "ADDRESS")
    run_regex("LOC", PATTERNS["PO_BOX"], "POBOX", "PO_BOX")
    run_regex("LOC", PATTERNS["CITY_STATE"], "LOC", "CITY_STATE")
    run_regex("PER", PATTERNS["ALL_CAPS_NAME"], "PER", "ALL_CAPS_NAME")
    run_regex("PER", PATTERNS["LAST_FIRST_NAME"], "PER", "LAST_FIRST_NAME")
    run_regex("PER", PATTERNS["NAME_APOSTROPHE"], "PER", "NAME_APOSTROPHE")
    run_regex("PER", PATTERNS["NAME_WITH_SUFFIX"], "PER", "NAME_WITH_SUFFIX")

    # single ALL-CAPS tokens with acronym whitelist
    all_caps_matches = []

    def caps_repl(m):
        nonlocal total
        v = m.group(0)
        if v in WHITELIST_ACRONYMS:
            return v
        if _PLACEHOLDER_RE.match(v):
            return v
        if v not in e2p:
            counters["PER"] += 1
            ph = f"[PER_{counters['PER']}]"
            e2p[v] = ph
            total += 1
            all_caps_matches.append((v, ph))
        return e2p[v]

    interim = PATTERNS["ALL_CAPS_SINGLE"].sub(caps_repl, interim)
    audit.append(AuditEntry("PER", "ALL_CAPS_SINGLE", len(all_caps_matches),
                            all_caps_matches, 0.0))

    # standalone US state codes, guarded against placeholder internals
    state_spans = []
    for m in _STATE_RE.finditer(interim):
        v = m.group(1)
        if v not in US_STATES:
            continue
        before = interim[max(0, m.start() - 1): m.start()]
        after = interim[m.start() + 2: m.start() + 3]
        if before == "[" or after == "]" or before == "_":
            continue
        state_spans.append((m.start(), m.start() + 2, v))
    state_matches = []
    for start, end, v in reversed(state_spans):
        if v not in e2p:
            counters["LOC"] += 1
            ph = f"[STATE_{counters['LOC']}]"
            e2p[v] = ph
            total += 1
            state_matches.append((v, ph))
        interim = interim[:start] + e2p[v] + interim[end:]
    audit.append(AuditEntry("LOC", "STANDALONE_STATE", len(state_matches),
                            state_matches, 0.0))

    # contextual MRN: collect NEW values, then global-replace each
    mrn_new = []
    for m in _MRN_RE.finditer(interim):
        v = m.group(2)
        if v not in e2p:
            counters["ID"] += 1
            ph = f"[MRN_{counters['ID']}]"
            e2p[v] = ph
            total += 1
            mrn_new.append((v, ph))
    for v, ph in mrn_new:
        interim = re.sub(re.escape(v), ph, interim)
    audit.append(AuditEntry("ID", "MRN_CONTEXTUAL", len(mrn_new), mrn_new, 0.0))

    # label-driven names: 3 fallback shapes after "<label>:"
    labeled_new = []
    for lm in _LABEL_RE.finditer(interim):
        after_label = interim[lm.end():]
        start = lm.end()
        matched = None
        m1 = _AFTER_ALL_CAPS.match(after_label)
        if m1:
            matched = m1.group(1)
        else:
            m2 = _AFTER_LAST_FIRST.match(after_label)
            if m2:
                matched = m2.group(1)
            else:
                m3 = _AFTER_NAME.match(after_label)
                if m3:
                    matched = m3.group(0).strip()
        if matched and matched not in e2p:
            counters["PER"] += 1
            ph = f"[PER_{counters['PER']}]"
            e2p[matched] = ph
            total += 1
            labeled_new.append((matched, ph, start))
    for matched, ph, start in sorted(labeled_new, key=lambda x: -x[2]):
        interim = interim[:start] + ph + interim[start + len(matched):]
    audit.append(AuditEntry("PER", "LABELED_NAME", len(labeled_new),
                            [(v, p) for v, p, _ in labeled_new], 0.0))

    return WorkerScrubOutcome(text=interim, replacements=e2p, count=total, audit=audit)
