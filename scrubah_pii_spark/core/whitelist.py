"""Whitelist medical-data extractor — pure-Python port of the reference's
second (whitelist) extraction engine.

Reference semantics (what, not how):
  /root/reference/services/whitelist/services/medicalExtractor.effect.ts
    PII_PATTERNS :44-55, sanitizeText :88-114, LAB_TEST_PATTERNS :120-182,
    REFERENCE_RANGES :184-197, determineLabStatus :199-207,
    extractLabResults :209-243, MEDICATION_PATTERN :249, ROUTE_MAP :251-261,
    KNOWN_MEDICATIONS :264-283, extractMedications :285-328,
    DIAGNOSIS_PATTERNS :334-343, SEVERITY_KEYWORDS :345-354,
    extractDiagnoses :356-402, imaging :408-491, vitals :497-557,
    pathology :563-610, classifyDocument :616-654, dates :660-696,
    extractMedicalData :708-775
  /root/reference/services/whitelist/services/extractionErrors.ts
    LabParseError message :87-89 ("Lab parse error: <reason>"), recoverable
    => collected as warnings; PIILeakageError is never raised by the
    extractor itself (the _validateNoPII helper is unused), so extraction
    never fails.

JS->Python parity notes: all regexes compiled with re.ASCII (JS \\d/\\w/\\b
are ASCII); `text.match(p)` (non-global) -> re.search; `p.exec` loops on /g
-> finditer; `String.replace` with a NON-global regex replaces only the
FIRST occurrence (sanitize_text mirrors this with count=1); JS number
stringification drops trailing ".0" (js_num below).

Determinism deviation (documented): the reference stamps lab-result dates
and timeline headers with `new Date()`; this port takes them as explicit
parameters (as_of_date / generated_at) so output is reproducible.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_A = re.ASCII
_AI = re.ASCII | re.IGNORECASE

# --- PII detection patterns (medicalExtractor.effect.ts:44-55) -------------

_MED_NAME_STOPLIST = (
    "Tylenol|Advil|Motrin|Aspirin|Ibuprofen|Metformin|Lisinopril|Atorvastatin|"
    "Omeprazole|Amlodipine|Metoprolol|Albuterol|Gabapentin|Hydrochlorothiazide|"
    "Losartan|Levothyroxine|Azithromycin|Amoxicillin|Prednisone|Fluticasone|"
    "Montelukast|Pantoprazole|Furosemide|Sertraline|Escitalopram|Duloxetine|"
    "Trazodone|Clopidogrel|Warfarin|Apixaban|Rivaroxaban|Carvedilol|Tamsulosin|"
    "Finasteride|Sildenafil|Insulin|Methotrexate|Humira|Enbrel|Remicade|"
    "Keytruda|Opdivo|Herceptin|Avastin|Rituxan"
)

PII_PATTERNS = {
    "phone": re.compile(r"\b\d{3}[-.]?\d{3}[-.]?\d{4}\b", _A),
    "ssn": re.compile(r"\b\d{3}-\d{2}-\d{4}\b", _A),
    "email": re.compile(
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", _AI
    ),
    "mrn": re.compile(r"\bMRN[:\s]*\d{6,}", _AI),
    "potentialName": re.compile(
        r"\b(?!(?:" + _MED_NAME_STOPLIST + r")\b)[A-Z][a-z]{2,}\s+[A-Z][a-z]{2,}\b",
        _A,
    ),
    "address": re.compile(
        r"\b\d+\s+[A-Z][a-z]+\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|"
        r"Blvd|Drive|Dr|Lane|Ln|Way|Court|Ct)\b",
        _AI,
    ),
    "zipCode": re.compile(r"\b\d{5}(?:-\d{4})?\b", _A),
    "dobPattern": re.compile(
        r"\b(?:DOB|Date of Birth)[:\s]*\d{1,2}[/\-]\d{1,2}[/\-]\d{2,4}\b", _AI
    ),
}

_DATE_MDY_G = re.compile(r"\b\d{1,2}[/\-]\d{1,2}[/\-]\d{2,4}\b", _A)
_DATE_YMD_G = re.compile(r"\b\d{4}[/\-]\d{1,2}[/\-]\d{1,2}\b", _A)
_TITLED_NAME_G = re.compile(
    r"\b(?:Dr|Doctor)\.?\s+[A-Z][a-z]{2,}\s+[A-Z][a-z]{2,}\b", _A
)
_SIGNED_BY_G = re.compile(r"\bSigned\s+by:\s*.*$", _AI | re.MULTILINE)
_CREDENTIALS_G = re.compile(
    r"\b[\s,]*(?:M\.?D\.?|D\.?O\.?|M\.?B\.?B\.?S\.?|R\.?N\.?|P\.?A\.?|N\.?P\.?)\b",
    _A,
)


def sanitize_text(text: str) -> str:
    """medicalExtractor.effect.ts:88-114 — NOTE the JS source calls
    String.replace with NON-global regexes for phone/ssn/email/mrn/address/
    dob (first occurrence only) and global ones for dates/titled names/
    signature lines/credentials; mirrored exactly."""
    s = text
    s = PII_PATTERNS["phone"].sub("[PHONE]", s, count=1)
    s = PII_PATTERNS["ssn"].sub("[SSN]", s, count=1)
    s = PII_PATTERNS["email"].sub("[EMAIL]", s, count=1)
    s = PII_PATTERNS["mrn"].sub("[MRN]", s, count=1)
    s = PII_PATTERNS["address"].sub("[ADDRESS]", s, count=1)
    s = PII_PATTERNS["dobPattern"].sub("[DOB]", s, count=1)
    s = _DATE_MDY_G.sub("[DATE]", s)
    s = _DATE_YMD_G.sub("[DATE]", s)
    s = _TITLED_NAME_G.sub("[NAME]", s)
    s = _SIGNED_BY_G.sub("Signed by: [NAME]", s)
    s = _CREDENTIALS_G.sub("", s)
    return s


# --- Lab extraction (:120-243) ----------------------------------------------

LAB_TEST_PATTERNS = {
    "WBC": r"(?:WBC|White Blood Cell|Leukocytes)[:\s]*(\d+\.?\d*)\s*(K/uL|x10\^9/L|/mm3)?",
    "RBC": r"(?:RBC|Red Blood Cell|Erythrocytes)[:\s]*(\d+\.?\d*)\s*(M/uL|x10\^12/L)?",
    "HGB": r"(?:HGB|Hemoglobin|Hgb)[:\s]*(\d+\.?\d*)\s*(g/dL|g/L)?",
    "HCT": r"(?:HCT|Hematocrit|Hct)[:\s]*(\d+\.?\d*)\s*(%)?",
    "PLT": r"(?:PLT|Platelets|Platelet Count)[:\s]*(\d+\.?\d*)\s*(K/uL|x10\^9/L)?",
    "MCV": r"(?:MCV|Mean Corpuscular Volume)[:\s]*(\d+\.?\d*)\s*(fL)?",
    "MCH": r"(?:MCH|Mean Corpuscular Hemoglobin)[:\s]*(\d+\.?\d*)\s*(pg)?",
    "MCHC": r"(?:MCHC)[:\s]*(\d+\.?\d*)\s*(g/dL)?",
    "RDW": r"(?:RDW|Red Cell Distribution Width)[:\s]*(\d+\.?\d*)\s*(%)?",
    "Glucose": r"(?:Glucose|Blood Sugar|BS)[:\s]*(\d+\.?\d*)\s*(mg/dL|mmol/L)?",
    "BUN": r"(?:BUN|Blood Urea Nitrogen)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "Creatinine": r"(?:Creatinine|Cr|Creat)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "Sodium": r"(?:Sodium|Na)[:\s]*(\d+\.?\d*)\s*(mEq/L|mmol/L)?",
    "Potassium": r"(?:Potassium|K(?!\s*/uL))[:\s]*(\d+\.?\d*)\s*(mEq/L|mmol/L)?",
    "Chloride": r"(?:Chloride|Cl)[:\s]*(\d+\.?\d*)\s*(mEq/L|mmol/L)?",
    "CO2": r"(?:CO2|Bicarbonate|HCO3)[:\s]*(\d+\.?\d*)\s*(mEq/L|mmol/L)?",
    "Calcium": r"(?:Calcium|Ca)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "AST": r"(?:AST|SGOT|Aspartate Aminotransferase)[:\s]*(\d+\.?\d*)\s*(U/L|IU/L)?",
    "ALT": r"(?:ALT|SGPT|Alanine Aminotransferase)[:\s]*(\d+\.?\d*)\s*(U/L|IU/L)?",
    "ALP": r"(?:ALP|Alkaline Phosphatase|Alk Phos)[:\s]*(\d+\.?\d*)\s*(U/L|IU/L)?",
    "Bilirubin": r"(?:Bilirubin|Total Bilirubin|T\.?\s*Bili)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "Albumin": r"(?:Albumin|Alb)[:\s]*(\d+\.?\d*)\s*(g/dL)?",
    "TotalProtein": r"(?:Total Protein|TP)[:\s]*(\d+\.?\d*)\s*(g/dL)?",
    "TotalCholesterol": r"(?:Total Cholesterol|Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "LDL": r"(?:LDL|LDL-C|LDL Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "HDL": r"(?:HDL|HDL-C|HDL Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "Triglycerides": r"(?:Triglycerides|TG|Trig)[:\s]*(\d+\.?\d*)\s*(mg/dL)?",
    "TSH": r"(?:TSH|Thyroid Stimulating Hormone)[:\s]*(\d+\.?\d*)\s*(mIU/L|uIU/mL)?",
    "T4": r"(?:T4|Free T4|FT4|Thyroxine)[:\s]*(\d+\.?\d*)\s*(ng/dL)?",
    "T3": r"(?:T3|Free T3|FT3|Triiodothyronine)[:\s]*(\d+\.?\d*)\s*(pg/mL)?",
    "PT": r"(?:PT|Prothrombin Time)[:\s]*(\d+\.?\d*)\s*(seconds|sec|s)?",
    "INR": r"(?:INR|International Normalized Ratio)[:\s]*(\d+\.?\d*)",
    "PTT": r"(?:PTT|aPTT|Partial Thromboplastin Time)[:\s]*(\d+\.?\d*)\s*(seconds|sec|s)?",
    "Troponin": r"(?:Troponin|TnI|TnT|Troponin I|Troponin T)[:\s]*(<?\d*\.?\d*)\s*(ng/mL|ng/L)?",
    "BNP": r"(?:BNP|B-type Natriuretic Peptide|NT-proBNP)[:\s]*(\d+\.?\d*)\s*(pg/mL)?",
    "HbA1c": r"(?:HbA1c|A1C|Hemoglobin A1c|Glycated Hemoglobin)[:\s]*(\d+\.?\d*)\s*(%)?",
    "CRP": r"(?:CRP|C-Reactive Protein)[:\s]*(\d+\.?\d*)\s*(mg/L|mg/dL)?",
    "ESR": r"(?:ESR|Sed Rate|Sedimentation Rate)[:\s]*(\d+\.?\d*)\s*(mm/hr)?",
    "PSA": r"(?:PSA|Prostate Specific Antigen)[:\s]*(\d+\.?\d*)\s*(ng/mL)?",
    "CEA": r"(?:CEA|Carcinoembryonic Antigen)[:\s]*(\d+\.?\d*)\s*(ng/mL)?",
    "CA125": r"(?:CA-?125|CA 125)[:\s]*(\d+\.?\d*)\s*(U/mL)?",
    "AFP": r"(?:AFP|Alpha-?fetoprotein)[:\s]*(\d+\.?\d*)\s*(ng/mL)?",
}
_LAB_RE = {k: re.compile(p, _AI) for k, p in LAB_TEST_PATTERNS.items()}
_LAB_NAME_RE = {k: re.compile(k, _AI) for k in LAB_TEST_PATTERNS}

REFERENCE_RANGES = {
    "WBC": (4.0, 11.0, "K/uL"),
    "RBC": (4.5, 5.5, "M/uL"),
    "HGB": (13.5, 17.5, "g/dL"),
    "HCT": (36, 50, "%"),
    "PLT": (150, 400, "K/uL"),
    "Glucose": (70, 100, "mg/dL"),
    "BUN": (7, 20, "mg/dL"),
    "Creatinine": (0.6, 1.2, "mg/dL"),
    "Sodium": (136, 145, "mEq/L"),
    "Potassium": (3.5, 5.0, "mEq/L"),
    "TSH": (0.4, 4.0, "mIU/L"),
    "HbA1c": (4.0, 5.6, "%"),
}


def js_num(x: float) -> str:
    """JS Number.toString: integral floats drop the '.0'."""
    return str(int(x)) if float(x) == int(x) else str(x)


def determine_lab_status(test_name: str, value: float) -> str:
    rng = REFERENCE_RANGES.get(test_name)
    if rng is None:
        return "Normal"
    low, high, _ = rng
    if value < low * 0.5 or value > high * 2:
        return "Critical"
    if value < low:
        return "Low"
    if value > high:
        return "High"
    return "Normal"


def _parse_float(s: str) -> float | None:
    """JS parseFloat: leading-prefix parse, NaN when no leading number."""
    m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s.strip())
    return float(m.group(0)) if m else None


def extract_lab_results(text: str, warnings: list, as_of_date: str) -> list:
    results = []
    for test_name, pattern in _LAB_RE.items():
        m = pattern.search(text)
        if not m:
            continue
        value_str = m.group(1)
        groups = m.groups()
        rng = REFERENCE_RANGES.get(test_name)
        unit = (groups[1] if len(groups) > 1 and groups[1] else None) or (
            rng[2] if rng else ""
        )
        value = _parse_float(value_str)
        if value is not None:
            results.append({
                "test_name": test_name,
                "value": value_str,
                "unit": unit or "",
                "date": as_of_date,
                "reference_range": f"{js_num(rng[0])}-{js_num(rng[1])}" if rng else None,
                "status": determine_lab_status(test_name, value),
            })
        else:
            warnings.append(
                f"Lab parse error: Could not parse numeric value: {value_str}"
            )
    return results


# --- Medication extraction (:249-328) ---------------------------------------

MEDICATION_PATTERN = re.compile(
    r"\b([A-Z][a-z]+(?:/[A-Z][a-z]+)?)\s+(\d+(?:\.\d+)?)\s*(mg|mcg|g|mL|units?|IU)\b"
    r"(?:\s+(?:(oral(?:ly)?|IV|IM|subq|topical|inhaled|PO|PR))\b)?"
    r"(?:\s+(?:(once|twice|three times|four times|q\d+h?|daily|BID|TID|QID|PRN|"
    r"as needed|every \d+ hours?|at bedtime|HS|QAM|QPM))\s*(?:daily|a day)?)?",
    _AI,
)

ROUTE_MAP = {
    "oral": "oral", "orally": "oral", "po": "oral", "iv": "iv", "im": "im",
    "subq": "subq", "topical": "topical", "inhaled": "inhaled", "pr": "rectal",
}

KNOWN_MEDICATIONS = {
    "Tylenol", "Acetaminophen", "Advil", "Motrin", "Ibuprofen", "Aspirin",
    "Metformin", "Lisinopril", "Atorvastatin", "Omeprazole", "Amlodipine",
    "Metoprolol", "Albuterol", "Gabapentin", "Hydrochlorothiazide", "Losartan",
    "Levothyroxine", "Azithromycin", "Amoxicillin", "Prednisone", "Fluticasone",
    "Montelukast", "Pantoprazole", "Furosemide", "Sertraline", "Escitalopram",
    "Duloxetine", "Trazodone", "Clopidogrel", "Warfarin", "Apixaban", "Rivaroxaban",
    "Carvedilol", "Tamsulosin", "Finasteride", "Ondansetron", "Zofran",
    "Oxycodone", "Hydrocodone", "Morphine", "Fentanyl", "Tramadol",
    "Insulin", "Glargine", "Lispro", "Aspart", "Detemir",
    "Methotrexate", "Humira", "Enbrel", "Remicade", "Keytruda", "Opdivo",
    "Cisplatin", "Carboplatin", "Paclitaxel", "Docetaxel", "Doxorubicin",
    "Vancomycin", "Ceftriaxone", "Piperacillin", "Meropenem", "Ciprofloxacin",
    "Heparin", "Enoxaparin", "Lovenox", "Eliquis", "Xarelto", "Coumadin",
    "Dilaudid", "Hydromorphone", "Norco", "Percocet", "Vicodin",
    "Ativan", "Lorazepam", "Xanax", "Alprazolam", "Valium", "Diazepam",
    "Ambien", "Zolpidem", "Lunesta", "Eszopiclone",
    "Zoloft", "Lexapro", "Prozac", "Fluoxetine", "Celexa", "Citalopram",
    "Wellbutrin", "Bupropion", "Effexor", "Venlafaxine", "Cymbalta",
}
_KNOWN_MEDS_LOWER = {m.lower() for m in KNOWN_MEDICATIONS}
_SIMPLE_NAME_RE = re.compile(r"^[A-Z][a-z]+$", _A)


def extract_medications(text: str) -> list:
    medications = []
    seen = set()
    for m in MEDICATION_PATTERN.finditer(text):
        name, dose, unit, route, frequency = (m.group(i) for i in range(1, 6))
        is_known = name.lower() in _KNOWN_MEDS_LOWER
        if not is_known and _SIMPLE_NAME_RE.match(name):
            continue
        key = f"{name}-{dose}-{unit}".lower()
        if key in seen:
            continue
        seen.add(key)
        medications.append({
            "name": name,
            "dose": dose,
            "unit": unit,
            "route": (ROUTE_MAP.get(route.lower(), "other") if route else None),
            "frequency": frequency or None,
            "status": "active",
        })
    return medications


# --- Diagnosis extraction (:334-402) -----------------------------------------

DIAGNOSIS_PATTERNS = [
    re.compile(
        r"(?:DX|Diagnosis|Assessment)[:\s]*([A-Z]\d{2}(?:\.\d{1,4})?)\s*[-–]\s*([^\n]+)",
        _AI,
    ),
    re.compile(
        r"(?:diagnosed with|diagnosis of|assessment:?)\s+([^,.\n]+(?:cancer|"
        r"carcinoma|tumor|syndrome|disease|disorder|infection|insufficiency|failure))",
        _AI,
    ),
    re.compile(
        r"(?:Stage|Grade)\s+([IVX]+[ABC]?)\s+([A-Za-z]+\s+(?:cancer|carcinoma|"
        r"tumor|adenocarcinoma|lymphoma|melanoma|sarcoma))",
        _AI,
    ),
    re.compile(
        r"((?:metastatic|primary|recurrent|chronic|acute)\s+[A-Za-z]+\s+"
        r"(?:cancer|carcinoma|disease|infection|failure))",
        _AI,
    ),
]

SEVERITY_KEYWORDS = {
    "mild": "mild", "moderate": "moderate", "severe": "severe",
    "critical": "critical", "advanced": "severe", "early": "mild",
    "late": "severe", "stage": "unspecified",
}

_ICD_PREFIX_RE = re.compile(r"^[A-Z]\d{2}", _A)
_TRAIL_PUNCT_RE = re.compile(r"[,;.]$", _A)


def extract_diagnoses(text: str) -> list:
    diagnoses = []
    seen = set()
    for pattern in DIAGNOSIS_PATTERNS:
        for m in pattern.finditer(text):
            groups = m.groups()
            g1 = groups[0]
            g2 = groups[1] if len(groups) > 1 else None
            condition = g2 if g2 else g1
            icd_code = g1 if _ICD_PREFIX_RE.match(g1) else None
            condition = _TRAIL_PUNCT_RE.sub("", condition.strip())
            if PII_PATTERNS["potentialName"].search(condition):
                continue
            key = condition.lower()
            if key in seen:
                continue
            seen.add(key)
            severity = "unspecified"
            for keyword, sev in SEVERITY_KEYWORDS.items():
                if keyword in condition.lower():
                    severity = sev
                    break
            diagnoses.append({
                "condition": sanitize_text(condition),
                "icd_code": icd_code,
                "severity": severity,
                "status": "active",
            })
    return diagnoses


# --- Imaging extraction (:408-491) --------------------------------------------

IMAGING_MODALITY_PATTERNS = {
    "ct": re.compile(r"\b(?:CT|CAT|Computed Tomography)\b", _AI),
    "mri": re.compile(r"\b(?:MRI|Magnetic Resonance|MR\s+(?:imaging|scan))\b", _AI),
    "xray": re.compile(r"\b(?:X-?ray|Radiograph|CXR|Plain film)\b", _AI),
    "ultrasound": re.compile(r"\b(?:Ultrasound|US|Sonograph|Echo)\b", _AI),
    "pet": re.compile(r"\b(?:PET|PET-CT|Positron Emission)\b", _AI),
    "nuclear": re.compile(r"\b(?:Nuclear|Scintigraphy|Bone scan)\b", _AI),
    "fluoroscopy": re.compile(r"\b(?:Fluoroscopy|Fluoro)\b", _AI),
    "other": re.compile(r".", _A),
}

BODY_PART_PATTERNS = [
    re.compile(
        r"(?:of the|of)\s+(chest|abdomen|pelvis|brain|head|spine|lumbar|thoracic|"
        r"cervical|neck|extremit(?:y|ies)|knee|hip|shoulder|ankle|wrist|hand|foot)",
        _AI,
    ),
    re.compile(
        r"(chest|abdomen|pelvis|brain|head|spine|lumbar|thoracic|cervical)\s+"
        r"(?:CT|MRI|X-?ray|scan)",
        _AI,
    ),
    re.compile(r"(?:CT|MRI|X-?ray|scan)\s+(lumbar|thoracic|cervical)\s*(?:spine)?", _AI),
    re.compile(r"(lumbar|thoracic|cervical)\s+spine", _AI),
]

FINDING_PATTERNS = [
    re.compile(
        r"(?:Findings?|Impression|Conclusion)[:\s]*([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)",
        _AI,
    ),
    re.compile(
        r"(?:demonstrates?|shows?|reveals?|evidence of|concerning for|"
        r"consistent with|suspicious for)[:\s]*([^.\n]+)",
        _AI,
    ),
    re.compile(
        r"(?:mass|lesion|nodule|tumor|adenopathy)\s+(?:measuring|measures?)\s+([^.\n]+)",
        _AI,
    ),
]

_IMPRESSION_RE = re.compile(
    r"(?:Impression|Conclusion)[:\s]*([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)", _AI
)


def extract_imaging_findings(text: str) -> list:
    modality = "other"
    for mod, pattern in IMAGING_MODALITY_PATTERNS.items():
        if pattern.search(text):
            modality = mod
            break
    body_part = "unspecified"
    for pattern in BODY_PART_PATTERNS:
        m = pattern.search(text)
        if m:
            body_part = m.group(1)
            break
    extracted = []
    for pattern in FINDING_PATTERNS:
        for m in pattern.finditer(text):
            finding = sanitize_text(m.group(1).strip())
            if len(finding) > 10 and not PII_PATTERNS["potentialName"].search(finding):
                extracted.append(finding)
    m = _IMPRESSION_RE.search(text)
    impression = sanitize_text(m.group(1).strip()) if m else None
    if extracted or impression:
        return [{
            "modality": modality,
            "body_part": body_part,
            "findings": extracted[:10],
            "impression": impression,
        }]
    return []


# --- Vital signs (:497-557) ----------------------------------------------------

VITAL_PATTERNS = {
    "bloodPressure": re.compile(
        r"(?:BP|Blood Pressure)[:\s]*(\d{2,3})\s*[/\\]\s*(\d{2,3})", _AI
    ),
    "heartRate": re.compile(r"(?:HR|Heart Rate|Pulse)[:\s]*(\d{2,3})\s*(?:bpm)?", _AI),
    "respiratoryRate": re.compile(r"(?:RR|Resp(?:iratory)? Rate)[:\s]*(\d{1,2})", _AI),
    "temperature": re.compile(
        r"(?:Temp|Temperature)[:\s]*(\d{2,3}(?:\.\d)?)\s*([°]?[FC])?", _AI
    ),
    "oxygenSaturation": re.compile(
        r"(?:SpO2|O2 Sat|Oxygen Sat(?:uration)?)[:\s]*(\d{2,3})\s*%?", _AI
    ),
    "weight": re.compile(r"(?:Weight|Wt)[:\s]*(\d{2,3}(?:\.\d)?)\s*(kg|lb|lbs)?", _AI),
    "painScale": re.compile(
        r"(?:Pain|Pain Scale|Pain Score)[:\s]*(\d{1,2})\s*(?:/\s*10)?", _AI
    ),
}


def extract_vital_signs(text: str) -> list:
    bp = VITAL_PATTERNS["bloodPressure"].search(text)
    hr = VITAL_PATTERNS["heartRate"].search(text)
    rr = VITAL_PATTERNS["respiratoryRate"].search(text)
    temp = VITAL_PATTERNS["temperature"].search(text)
    o2 = VITAL_PATTERNS["oxygenSaturation"].search(text)
    weight = VITAL_PATTERNS["weight"].search(text)
    pain = VITAL_PATTERNS["painScale"].search(text)
    if not (bp or hr or rr or temp or o2 or weight or pain):
        return []
    pain_scale = None
    if pain:
        p = int(pain.group(1))
        if 0 <= p <= 10:
            pain_scale = p
    v = {
        "blood_pressure_systolic": int(bp.group(1)) if bp else None,
        "blood_pressure_diastolic": int(bp.group(2)) if bp else None,
        "heart_rate": int(hr.group(1)) if hr else None,
        "respiratory_rate": int(rr.group(1)) if rr else None,
        "temperature": float(temp.group(1)) if temp else None,
        "temperature_unit": (
            ("C" if temp.group(2) and "C" in temp.group(2) else "F") if temp else None
        ),
        "oxygen_saturation": int(o2.group(1)) if o2 else None,
        "weight": float(weight.group(1)) if weight else None,
        "weight_unit": (
            ("kg" if weight.group(2) and weight.group(2).lower().startswith("k") else "lb")
            if weight else None
        ),
        "pain_scale": pain_scale,
    }
    return [v]


# --- Pathology (:563-610) ---------------------------------------------------------

PATHOLOGY_PATTERNS = {
    "specimenType": re.compile(r"(?:Specimen|Tissue|Sample)[:\s]*([^\n,]+)", _AI),
    "diagnosis": re.compile(
        r"(?:Diagnosis|Final Diagnosis|Pathologic Diagnosis)[:\s]*"
        r"([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)",
        _AI,
    ),
    "grade": re.compile(r"(?:Grade|Histologic Grade)[:\s]*([^\n,]+)", _AI),
    "stage": re.compile(r"(?:Stage|pTNM|Pathologic Stage)[:\s]*([^\n,]+)", _AI),
    "margins": re.compile(
        r"(?:Margins?)[:\s]*(negative|positive|close|involved|clear|free)", _AI
    ),
}


def extract_pathology_results(text: str) -> list:
    specimen = PATHOLOGY_PATTERNS["specimenType"].search(text)
    diagnosis = PATHOLOGY_PATTERNS["diagnosis"].search(text)
    if not diagnosis:
        return []
    grade = PATHOLOGY_PATTERNS["grade"].search(text)
    stage = PATHOLOGY_PATTERNS["stage"].search(text)
    margins_m = PATHOLOGY_PATTERNS["margins"].search(text)
    margins = None
    if margins_m:
        mt = margins_m.group(1).lower()
        if "negative" in mt or "clear" in mt or "free" in mt:
            margins = "negative"
        elif "positive" in mt or "involved" in mt:
            margins = "positive"
        elif "close" in mt:
            margins = "close"
    return [{
        "specimen_type": sanitize_text(specimen.group(1).strip()) if specimen else "unspecified",
        "diagnosis": sanitize_text(diagnosis.group(1).strip()),
        "grade": grade.group(1).strip() if grade else None,
        "stage": stage.group(1).strip() if stage else None,
        "margins": margins,
    }]


# --- Document type classification (:616-654) ----------------------------------

_CLASSIFY_RES = [
    ("lab_report", re.compile(r"(?:lab|laboratory|result|panel|cbc|bmp|cmp|lipid)", _AI)),
    ("imaging", re.compile(r"(?:ct scan|mri|x-?ray|ultrasound|imaging|radiology|impression)", _AI)),
    ("pathology", re.compile(r"(?:pathology|biopsy|specimen|histologic|adenocarcinoma|carcinoma)", _AI)),
    ("discharge_summary", re.compile(r"(?:discharge|discharged|follow.?up|instructions)", _AI)),
    ("progress_note", re.compile(r"(?:progress note|soap|assessment|plan|subjective|objective)", _AI)),
    ("medication_list", re.compile(r"(?:medication|prescription|refill|pharmacy)", _AI)),
    ("procedure_note", re.compile(r"(?:procedure|operative|surgery|performed)", _AI)),
    ("consultation", re.compile(r"(?:consult|consultation|referred|opinion)", _AI)),
]


def classify_document(text: str) -> str:
    for doc_type, pattern in _CLASSIFY_RES:
        if doc_type == "lab_report":
            if pattern.search(text) and any(
                name_re.search(text) for name_re in _LAB_NAME_RE.values()
            ):
                return doc_type
        elif pattern.search(text):
            return doc_type
    return "unknown"


# --- Date extraction (:660-696) -------------------------------------------------

DATE_PATTERNS = [
    re.compile(r"(\d{1,2})[/\-](\d{1,2})[/\-](\d{2,4})", _AI),
    re.compile(r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})", _AI),
    re.compile(
        r"(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+(\d{1,2}),?\s+(\d{4})",
        _AI,
    ),
    re.compile(
        r"(\d{1,2})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?,?\s+(\d{4})",
        _AI,
    ),
]
_FILENAME_DATE_RE = re.compile(r"(\d{1,2})[/\-](\d{1,2})[/\-](\d{2,4})", _A)
_DOB_CONTEXT_RE = re.compile(
    r"(?:DOB|Date\s+of\s+Birth|Birth\s+Date|Birthdate)\b", _AI
)


def extract_document_date(text: str, filename: str) -> str | None:
    m = _FILENAME_DATE_RE.search(filename)
    if m:
        return m.group(0)
    for pattern in DATE_PATTERNS:
        for m in pattern.finditer(text):
            context = text[max(0, m.start() - 100):m.start()]
            if _DOB_CONTEXT_RE.search(context):
                continue
            return m.group(0)
    return None


# --- simpleHash (extractionPipeline.effect.ts:26-34) ---------------------------


def simple_hash_hex(s: str) -> str:
    from .hashing import js_string_hash32

    return format(abs(js_string_hash32(s)), "x").rjust(8, "0")


# --- Main extraction (:708-775) --------------------------------------------------


@dataclass
class ExtractedMedicalRecord:
    source_document_hash: str
    document_type: str
    document_date: str | None
    extraction_confidence: int
    diagnoses: list = field(default_factory=list)
    lab_panels: list = field(default_factory=list)
    medications: list = field(default_factory=list)
    procedures: list = field(default_factory=list)
    imaging_findings: list = field(default_factory=list)
    vital_signs: list = field(default_factory=list)
    pathology: list = field(default_factory=list)
    clinical_observations: list = field(default_factory=list)
    warnings: list = field(default_factory=list)
    sections_skipped: list = field(default_factory=list)


def extract_medical_data(
    text: str, filename: str, document_hash: str, as_of_date: str = "2026-01-01"
) -> ExtractedMedicalRecord:
    """medicalExtractor.effect.ts:708-775. `as_of_date` replaces the
    reference's `new Date()` default lab date (determinism)."""
    warnings: list = []
    document_type = classify_document(text)
    document_date = extract_document_date(text, filename)
    lab_results = extract_lab_results(text, warnings, as_of_date)
    medications = extract_medications(text)
    diagnoses = extract_diagnoses(text)
    imaging_findings = extract_imaging_findings(text)
    vital_signs = extract_vital_signs(text)
    pathology_results = extract_pathology_results(text)

    lab_panels = (
        [{"collection_date": document_date or "unknown", "results": lab_results}]
        if lab_results
        else []
    )
    total = (
        len(lab_results) + len(medications) + len(diagnoses)
        + len(imaging_findings) + len(vital_signs) + len(pathology_results)
    )
    confidence = min(100, max(0, 70 + min(30, total * 3) if total > 0 else 30))
    return ExtractedMedicalRecord(
        source_document_hash=document_hash,
        document_type=document_type,
        document_date=document_date,
        extraction_confidence=confidence,
        diagnoses=diagnoses,
        lab_panels=lab_panels,
        medications=medications,
        imaging_findings=imaging_findings,
        vital_signs=vital_signs,
        pathology=pathology_results,
        warnings=warnings,
    )
