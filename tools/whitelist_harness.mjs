#!/usr/bin/env node
// Whitelist-extractor golden harness: the reference's whitelist medical
// extraction + timeline formatting expressed with NATIVE JavaScript regexes,
// matching the documented semantics of
// /root/reference/services/whitelist/services/medicalExtractor.effect.ts,
// timelineFormatter.effect.ts and extractionPipeline.effect.ts. Written
// fresh for this project — used to emit golden records/timelines and to
// cross-validate the Python port's JS<->Python regex parity.
// stdin: JSON {docs: [{id, filename, text}], as_of_date, generated_at}
// stdout: JSON {records: [...], timeline: "...", stats: {...}}

const MED_STOP = "Tylenol|Advil|Motrin|Aspirin|Ibuprofen|Metformin|Lisinopril|Atorvastatin|Omeprazole|Amlodipine|Metoprolol|Albuterol|Gabapentin|Hydrochlorothiazide|Losartan|Levothyroxine|Azithromycin|Amoxicillin|Prednisone|Fluticasone|Montelukast|Pantoprazole|Furosemide|Sertraline|Escitalopram|Duloxetine|Trazodone|Clopidogrel|Warfarin|Apixaban|Rivaroxaban|Carvedilol|Tamsulosin|Finasteride|Sildenafil|Insulin|Methotrexate|Humira|Enbrel|Remicade|Keytruda|Opdivo|Herceptin|Avastin|Rituxan";

const PII_PATTERNS = {
  phone: /\b\d{3}[-.]?\d{3}[-.]?\d{4}\b/,
  ssn: /\b\d{3}-\d{2}-\d{4}\b/,
  email: /\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b/i,
  mrn: /\bMRN[:\s]*\d{6,}/i,
  potentialName: new RegExp("\\b(?!(?:" + MED_STOP + ")\\b)[A-Z][a-z]{2,}\\s+[A-Z][a-z]{2,}\\b"),
  address: /\b\d+\s+[A-Z][a-z]+\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Way|Court|Ct)\b/i,
  zipCode: /\b\d{5}(?:-\d{4})?\b/,
  dobPattern: /\b(?:DOB|Date of Birth)[:\s]*\d{1,2}[\/\-]\d{1,2}[\/\-]\d{2,4}\b/i,
};

function sanitizeText(text) {
  let s = text;
  s = s.replace(PII_PATTERNS.phone, "[PHONE]");
  s = s.replace(PII_PATTERNS.ssn, "[SSN]");
  s = s.replace(PII_PATTERNS.email, "[EMAIL]");
  s = s.replace(PII_PATTERNS.mrn, "[MRN]");
  s = s.replace(PII_PATTERNS.address, "[ADDRESS]");
  s = s.replace(PII_PATTERNS.dobPattern, "[DOB]");
  s = s.replace(/\b\d{1,2}[\/\-]\d{1,2}[\/\-]\d{2,4}\b/g, "[DATE]");
  s = s.replace(/\b\d{4}[\/\-]\d{1,2}[\/\-]\d{1,2}\b/g, "[DATE]");
  s = s.replace(/\b(?:Dr|Doctor)\.?\s+[A-Z][a-z]{2,}\s+[A-Z][a-z]{2,}\b/g, "[NAME]");
  s = s.replace(/\bSigned\s+by:\s*.*$/gmi, "Signed by: [NAME]");
  s = s.replace(/\b[\s,]*(?:M\.?D\.?|D\.?O\.?|M\.?B\.?B\.?S\.?|R\.?N\.?|P\.?A\.?|N\.?P\.?)\b/g, "");
  return s;
}

const LAB_TEST_PATTERNS = {
  WBC: /(?:WBC|White Blood Cell|Leukocytes)[:\s]*(\d+\.?\d*)\s*(K\/uL|x10\^9\/L|\/mm3)?/i,
  RBC: /(?:RBC|Red Blood Cell|Erythrocytes)[:\s]*(\d+\.?\d*)\s*(M\/uL|x10\^12\/L)?/i,
  HGB: /(?:HGB|Hemoglobin|Hgb)[:\s]*(\d+\.?\d*)\s*(g\/dL|g\/L)?/i,
  HCT: /(?:HCT|Hematocrit|Hct)[:\s]*(\d+\.?\d*)\s*(%)?/i,
  PLT: /(?:PLT|Platelets|Platelet Count)[:\s]*(\d+\.?\d*)\s*(K\/uL|x10\^9\/L)?/i,
  MCV: /(?:MCV|Mean Corpuscular Volume)[:\s]*(\d+\.?\d*)\s*(fL)?/i,
  MCH: /(?:MCH|Mean Corpuscular Hemoglobin)[:\s]*(\d+\.?\d*)\s*(pg)?/i,
  MCHC: /(?:MCHC)[:\s]*(\d+\.?\d*)\s*(g\/dL)?/i,
  RDW: /(?:RDW|Red Cell Distribution Width)[:\s]*(\d+\.?\d*)\s*(%)?/i,
  Glucose: /(?:Glucose|Blood Sugar|BS)[:\s]*(\d+\.?\d*)\s*(mg\/dL|mmol\/L)?/i,
  BUN: /(?:BUN|Blood Urea Nitrogen)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  Creatinine: /(?:Creatinine|Cr|Creat)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  Sodium: /(?:Sodium|Na)[:\s]*(\d+\.?\d*)\s*(mEq\/L|mmol\/L)?/i,
  Potassium: /(?:Potassium|K(?!\s*\/uL))[:\s]*(\d+\.?\d*)\s*(mEq\/L|mmol\/L)?/i,
  Chloride: /(?:Chloride|Cl)[:\s]*(\d+\.?\d*)\s*(mEq\/L|mmol\/L)?/i,
  CO2: /(?:CO2|Bicarbonate|HCO3)[:\s]*(\d+\.?\d*)\s*(mEq\/L|mmol\/L)?/i,
  Calcium: /(?:Calcium|Ca)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  AST: /(?:AST|SGOT|Aspartate Aminotransferase)[:\s]*(\d+\.?\d*)\s*(U\/L|IU\/L)?/i,
  ALT: /(?:ALT|SGPT|Alanine Aminotransferase)[:\s]*(\d+\.?\d*)\s*(U\/L|IU\/L)?/i,
  ALP: /(?:ALP|Alkaline Phosphatase|Alk Phos)[:\s]*(\d+\.?\d*)\s*(U\/L|IU\/L)?/i,
  Bilirubin: /(?:Bilirubin|Total Bilirubin|T\.?\s*Bili)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  Albumin: /(?:Albumin|Alb)[:\s]*(\d+\.?\d*)\s*(g\/dL)?/i,
  TotalProtein: /(?:Total Protein|TP)[:\s]*(\d+\.?\d*)\s*(g\/dL)?/i,
  TotalCholesterol: /(?:Total Cholesterol|Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  LDL: /(?:LDL|LDL-C|LDL Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  HDL: /(?:HDL|HDL-C|HDL Cholesterol)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  Triglycerides: /(?:Triglycerides|TG|Trig)[:\s]*(\d+\.?\d*)\s*(mg\/dL)?/i,
  TSH: /(?:TSH|Thyroid Stimulating Hormone)[:\s]*(\d+\.?\d*)\s*(mIU\/L|uIU\/mL)?/i,
  T4: /(?:T4|Free T4|FT4|Thyroxine)[:\s]*(\d+\.?\d*)\s*(ng\/dL)?/i,
  T3: /(?:T3|Free T3|FT3|Triiodothyronine)[:\s]*(\d+\.?\d*)\s*(pg\/mL)?/i,
  PT: /(?:PT|Prothrombin Time)[:\s]*(\d+\.?\d*)\s*(seconds|sec|s)?/i,
  INR: /(?:INR|International Normalized Ratio)[:\s]*(\d+\.?\d*)/i,
  PTT: /(?:PTT|aPTT|Partial Thromboplastin Time)[:\s]*(\d+\.?\d*)\s*(seconds|sec|s)?/i,
  Troponin: /(?:Troponin|TnI|TnT|Troponin I|Troponin T)[:\s]*(<?\d*\.?\d*)\s*(ng\/mL|ng\/L)?/i,
  BNP: /(?:BNP|B-type Natriuretic Peptide|NT-proBNP)[:\s]*(\d+\.?\d*)\s*(pg\/mL)?/i,
  HbA1c: /(?:HbA1c|A1C|Hemoglobin A1c|Glycated Hemoglobin)[:\s]*(\d+\.?\d*)\s*(%)?/i,
  CRP: /(?:CRP|C-Reactive Protein)[:\s]*(\d+\.?\d*)\s*(mg\/L|mg\/dL)?/i,
  ESR: /(?:ESR|Sed Rate|Sedimentation Rate)[:\s]*(\d+\.?\d*)\s*(mm\/hr)?/i,
  PSA: /(?:PSA|Prostate Specific Antigen)[:\s]*(\d+\.?\d*)\s*(ng\/mL)?/i,
  CEA: /(?:CEA|Carcinoembryonic Antigen)[:\s]*(\d+\.?\d*)\s*(ng\/mL)?/i,
  CA125: /(?:CA-?125|CA 125)[:\s]*(\d+\.?\d*)\s*(U\/mL)?/i,
  AFP: /(?:AFP|Alpha-?fetoprotein)[:\s]*(\d+\.?\d*)\s*(ng\/mL)?/i,
};

const REFERENCE_RANGES = {
  WBC: { low: 4.0, high: 11.0, unit: "K/uL" },
  RBC: { low: 4.5, high: 5.5, unit: "M/uL" },
  HGB: { low: 13.5, high: 17.5, unit: "g/dL" },
  HCT: { low: 36, high: 50, unit: "%" },
  PLT: { low: 150, high: 400, unit: "K/uL" },
  Glucose: { low: 70, high: 100, unit: "mg/dL" },
  BUN: { low: 7, high: 20, unit: "mg/dL" },
  Creatinine: { low: 0.6, high: 1.2, unit: "mg/dL" },
  Sodium: { low: 136, high: 145, unit: "mEq/L" },
  Potassium: { low: 3.5, high: 5.0, unit: "mEq/L" },
  TSH: { low: 0.4, high: 4.0, unit: "mIU/L" },
  HbA1c: { low: 4.0, high: 5.6, unit: "%" },
};

function determineLabStatus(testName, value) {
  const r = REFERENCE_RANGES[testName];
  if (!r) return "Normal";
  if (value < r.low * 0.5 || value > r.high * 2) return "Critical";
  if (value < r.low) return "Low";
  if (value > r.high) return "High";
  return "Normal";
}

function extractLabResults(text, warnings, asOfDate) {
  const results = [];
  for (const [testName, pattern] of Object.entries(LAB_TEST_PATTERNS)) {
    const m = text.match(pattern);
    if (!m) continue;
    const valueStr = m[1];
    const unit = m[2] || REFERENCE_RANGES[testName]?.unit || "";
    const value = parseFloat(valueStr);
    if (!isNaN(value)) {
      const r = REFERENCE_RANGES[testName];
      results.push({
        test_name: testName, value: valueStr, unit: unit ?? "",
        date: asOfDate,
        reference_range: r ? `${r.low}-${r.high}` : null,
        status: determineLabStatus(testName, value),
      });
    } else {
      warnings.push(`Lab parse error: Could not parse numeric value: ${valueStr}`);
    }
  }
  return results;
}

const MEDICATION_PATTERN = /\b([A-Z][a-z]+(?:\/[A-Z][a-z]+)?)\s+(\d+(?:\.\d+)?)\s*(mg|mcg|g|mL|units?|IU)\b(?:\s+(?:(oral(?:ly)?|IV|IM|subq|topical|inhaled|PO|PR))\b)?(?:\s+(?:(once|twice|three times|four times|q\d+h?|daily|BID|TID|QID|PRN|as needed|every \d+ hours?|at bedtime|HS|QAM|QPM))\s*(?:daily|a day)?)?/gi;
const ROUTE_MAP = { oral: "oral", orally: "oral", po: "oral", iv: "iv", im: "im", subq: "subq", topical: "topical", inhaled: "inhaled", pr: "rectal" };
const KNOWN_MEDICATIONS = new Set(["Tylenol","Acetaminophen","Advil","Motrin","Ibuprofen","Aspirin","Metformin","Lisinopril","Atorvastatin","Omeprazole","Amlodipine","Metoprolol","Albuterol","Gabapentin","Hydrochlorothiazide","Losartan","Levothyroxine","Azithromycin","Amoxicillin","Prednisone","Fluticasone","Montelukast","Pantoprazole","Furosemide","Sertraline","Escitalopram","Duloxetine","Trazodone","Clopidogrel","Warfarin","Apixaban","Rivaroxaban","Carvedilol","Tamsulosin","Finasteride","Ondansetron","Zofran","Oxycodone","Hydrocodone","Morphine","Fentanyl","Tramadol","Insulin","Glargine","Lispro","Aspart","Detemir","Methotrexate","Humira","Enbrel","Remicade","Keytruda","Opdivo","Cisplatin","Carboplatin","Paclitaxel","Docetaxel","Doxorubicin","Vancomycin","Ceftriaxone","Piperacillin","Meropenem","Ciprofloxacin","Heparin","Enoxaparin","Lovenox","Eliquis","Xarelto","Coumadin","Dilaudid","Hydromorphone","Norco","Percocet","Vicodin","Ativan","Lorazepam","Xanax","Alprazolam","Valium","Diazepam","Ambien","Zolpidem","Lunesta","Eszopiclone","Zoloft","Lexapro","Prozac","Fluoxetine","Celexa","Citalopram","Wellbutrin","Bupropion","Effexor","Venlafaxine","Cymbalta"]);
const KNOWN_MEDS_LOWER = new Set([...KNOWN_MEDICATIONS].map(m => m.toLowerCase()));

function extractMedications(text) {
  const medications = [];
  const seen = new Set();
  const pattern = new RegExp(MEDICATION_PATTERN.source, MEDICATION_PATTERN.flags);
  let m;
  while ((m = pattern.exec(text)) !== null) {
    const [, name, dose, unit, route, frequency] = m;
    const isKnown = KNOWN_MEDS_LOWER.has(name.toLowerCase());
    if (!isKnown && /^[A-Z][a-z]+$/.test(name)) continue;
    const key = `${name}-${dose}-${unit}`.toLowerCase();
    if (seen.has(key)) continue;
    seen.add(key);
    medications.push({
      name, dose, unit,
      route: route ? (ROUTE_MAP[route.toLowerCase()] || "other") : null,
      frequency: frequency || null,
      status: "active",
    });
  }
  return medications;
}

const DIAGNOSIS_PATTERNS = [
  /(?:DX|Diagnosis|Assessment)[:\s]*([A-Z]\d{2}(?:\.\d{1,4})?)\s*[-–]\s*([^\n]+)/gi,
  /(?:diagnosed with|diagnosis of|assessment:?)\s+([^,.\n]+(?:cancer|carcinoma|tumor|syndrome|disease|disorder|infection|insufficiency|failure))/gi,
  /(?:Stage|Grade)\s+([IVX]+[ABC]?)\s+([A-Za-z]+\s+(?:cancer|carcinoma|tumor|adenocarcinoma|lymphoma|melanoma|sarcoma))/gi,
  /((?:metastatic|primary|recurrent|chronic|acute)\s+[A-Za-z]+\s+(?:cancer|carcinoma|disease|infection|failure))/gi,
];
const SEVERITY_KEYWORDS = { mild: "mild", moderate: "moderate", severe: "severe", critical: "critical", advanced: "severe", early: "mild", late: "severe", stage: "unspecified" };

function extractDiagnoses(text) {
  const diagnoses = [];
  const seen = new Set();
  for (const pattern of DIAGNOSIS_PATTERNS) {
    const regex = new RegExp(pattern.source, pattern.flags);
    let m;
    while ((m = regex.exec(text)) !== null) {
      let condition = m[2] || m[1];
      const icdCode = /^[A-Z]\d{2}/.test(m[1]) ? m[1] : null;
      condition = condition.trim().replace(/[,;.]$/, "");
      if (PII_PATTERNS.potentialName.test(condition)) continue;
      const key = condition.toLowerCase();
      if (seen.has(key)) continue;
      seen.add(key);
      let severity = "unspecified";
      for (const [kw, sev] of Object.entries(SEVERITY_KEYWORDS)) {
        if (condition.toLowerCase().includes(kw)) { severity = sev; break; }
      }
      diagnoses.push({ condition: sanitizeText(condition), icd_code: icdCode, severity, status: "active" });
    }
  }
  return diagnoses;
}

const IMAGING_MODALITY_PATTERNS = {
  ct: /\b(?:CT|CAT|Computed Tomography)\b/i,
  mri: /\b(?:MRI|Magnetic Resonance|MR\s+(?:imaging|scan))\b/i,
  xray: /\b(?:X-?ray|Radiograph|CXR|Plain film)\b/i,
  ultrasound: /\b(?:Ultrasound|US|Sonograph|Echo)\b/i,
  pet: /\b(?:PET|PET-CT|Positron Emission)\b/i,
  nuclear: /\b(?:Nuclear|Scintigraphy|Bone scan)\b/i,
  fluoroscopy: /\b(?:Fluoroscopy|Fluoro)\b/i,
  other: /./,
};
const BODY_PART_PATTERNS = [
  /(?:of the|of)\s+(chest|abdomen|pelvis|brain|head|spine|lumbar|thoracic|cervical|neck|extremit(?:y|ies)|knee|hip|shoulder|ankle|wrist|hand|foot)/i,
  /(chest|abdomen|pelvis|brain|head|spine|lumbar|thoracic|cervical)\s+(?:CT|MRI|X-?ray|scan)/i,
  /(?:CT|MRI|X-?ray|scan)\s+(lumbar|thoracic|cervical)\s*(?:spine)?/i,
  /(lumbar|thoracic|cervical)\s+spine/i,
];
const FINDING_PATTERNS = [
  /(?:Findings?|Impression|Conclusion)[:\s]*([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)/gi,
  /(?:demonstrates?|shows?|reveals?|evidence of|concerning for|consistent with|suspicious for)[:\s]*([^.\n]+)/gi,
  /(?:mass|lesion|nodule|tumor|adenopathy)\s+(?:measuring|measures?)\s+([^.\n]+)/gi,
];

function extractImagingFindings(text) {
  let modality = "other";
  for (const [mod, pattern] of Object.entries(IMAGING_MODALITY_PATTERNS)) {
    if (pattern.test(text)) { modality = mod; break; }
  }
  let bodyPart = "unspecified";
  for (const pattern of BODY_PART_PATTERNS) {
    const m = text.match(pattern);
    if (m) { bodyPart = m[1]; break; }
  }
  const extracted = [];
  for (const pattern of FINDING_PATTERNS) {
    const regex = new RegExp(pattern.source, pattern.flags);
    let m;
    while ((m = regex.exec(text)) !== null) {
      const finding = sanitizeText(m[1].trim());
      if (finding.length > 10 && !PII_PATTERNS.potentialName.test(finding)) {
        extracted.push(finding);
      }
    }
  }
  const im = text.match(/(?:Impression|Conclusion)[:\s]*([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)/i);
  const impression = im ? sanitizeText(im[1].trim()) : null;
  if (extracted.length > 0 || impression) {
    return [{ modality, body_part: bodyPart, findings: extracted.slice(0, 10), impression }];
  }
  return [];
}

const VITAL_PATTERNS = {
  bloodPressure: /(?:BP|Blood Pressure)[:\s]*(\d{2,3})\s*[\/\\]\s*(\d{2,3})/i,
  heartRate: /(?:HR|Heart Rate|Pulse)[:\s]*(\d{2,3})\s*(?:bpm)?/i,
  respiratoryRate: /(?:RR|Resp(?:iratory)? Rate)[:\s]*(\d{1,2})/i,
  temperature: /(?:Temp|Temperature)[:\s]*(\d{2,3}(?:\.\d)?)\s*([°]?[FC])?/i,
  oxygenSaturation: /(?:SpO2|O2 Sat|Oxygen Sat(?:uration)?)[:\s]*(\d{2,3})\s*%?/i,
  weight: /(?:Weight|Wt)[:\s]*(\d{2,3}(?:\.\d)?)\s*(kg|lb|lbs)?/i,
  painScale: /(?:Pain|Pain Scale|Pain Score)[:\s]*(\d{1,2})\s*(?:\/\s*10)?/i,
};

function extractVitalSigns(text) {
  const bp = text.match(VITAL_PATTERNS.bloodPressure);
  const hr = text.match(VITAL_PATTERNS.heartRate);
  const rr = text.match(VITAL_PATTERNS.respiratoryRate);
  const temp = text.match(VITAL_PATTERNS.temperature);
  const o2 = text.match(VITAL_PATTERNS.oxygenSaturation);
  const weight = text.match(VITAL_PATTERNS.weight);
  const pain = text.match(VITAL_PATTERNS.painScale);
  if (!(bp || hr || rr || temp || o2 || weight || pain)) return [];
  let painScale = null;
  if (pain) {
    const p = parseInt(pain[1]);
    if (p >= 0 && p <= 10) painScale = p;
  }
  return [{
    blood_pressure_systolic: bp ? parseInt(bp[1]) : null,
    blood_pressure_diastolic: bp ? parseInt(bp[2]) : null,
    heart_rate: hr ? parseInt(hr[1]) : null,
    respiratory_rate: rr ? parseInt(rr[1]) : null,
    temperature: temp ? parseFloat(temp[1]) : null,
    temperature_unit: temp ? (temp[2]?.includes("C") ? "C" : "F") : null,
    oxygen_saturation: o2 ? parseInt(o2[1]) : null,
    weight: weight ? parseFloat(weight[1]) : null,
    weight_unit: weight ? (weight[2]?.toLowerCase().startsWith("k") ? "kg" : "lb") : null,
    pain_scale: painScale,
  }];
}

const PATHOLOGY_PATTERNS = {
  specimenType: /(?:Specimen|Tissue|Sample)[:\s]*([^\n,]+)/i,
  diagnosis: /(?:Diagnosis|Final Diagnosis|Pathologic Diagnosis)[:\s]*([^\n]+(?:\n(?![A-Z]{2,}:)[^\n]+)*)/i,
  grade: /(?:Grade|Histologic Grade)[:\s]*([^\n,]+)/i,
  stage: /(?:Stage|pTNM|Pathologic Stage)[:\s]*([^\n,]+)/i,
  margins: /(?:Margins?)[:\s]*(negative|positive|close|involved|clear|free)/i,
};

function extractPathologyResults(text) {
  const specimen = text.match(PATHOLOGY_PATTERNS.specimenType);
  const diagnosis = text.match(PATHOLOGY_PATTERNS.diagnosis);
  if (!diagnosis) return [];
  const grade = text.match(PATHOLOGY_PATTERNS.grade);
  const stage = text.match(PATHOLOGY_PATTERNS.stage);
  const marginsM = text.match(PATHOLOGY_PATTERNS.margins);
  let margins = null;
  if (marginsM) {
    const mt = marginsM[1].toLowerCase();
    if (mt.includes("negative") || mt.includes("clear") || mt.includes("free")) margins = "negative";
    else if (mt.includes("positive") || mt.includes("involved")) margins = "positive";
    else if (mt.includes("close")) margins = "close";
  }
  return [{
    specimen_type: specimen ? sanitizeText(specimen[1].trim()) : "unspecified",
    diagnosis: sanitizeText(diagnosis[1].trim()),
    grade: grade ? grade[1].trim() : null,
    stage: stage ? stage[1].trim() : null,
    margins,
  }];
}

function classifyDocument(text) {
  if (/(?:lab|laboratory|result|panel|cbc|bmp|cmp|lipid)/i.test(text) &&
      Object.keys(LAB_TEST_PATTERNS).some(t => new RegExp(t, "i").test(text))) {
    return "lab_report";
  }
  if (/(?:ct scan|mri|x-?ray|ultrasound|imaging|radiology|impression)/i.test(text)) return "imaging";
  if (/(?:pathology|biopsy|specimen|histologic|adenocarcinoma|carcinoma)/i.test(text)) return "pathology";
  if (/(?:discharge|discharged|follow.?up|instructions)/i.test(text)) return "discharge_summary";
  if (/(?:progress note|soap|assessment|plan|subjective|objective)/i.test(text)) return "progress_note";
  if (/(?:medication|prescription|refill|pharmacy)/i.test(text)) return "medication_list";
  if (/(?:procedure|operative|surgery|performed)/i.test(text)) return "procedure_note";
  if (/(?:consult|consultation|referred|opinion)/i.test(text)) return "consultation";
  return "unknown";
}

const DATE_PATTERNS = [
  /(\d{1,2})[\/\-](\d{1,2})[\/\-](\d{2,4})/,
  /(\d{4})[\/\-](\d{1,2})[\/\-](\d{1,2})/,
  /(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+(\d{1,2}),?\s+(\d{4})/i,
  /(\d{1,2})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?,?\s+(\d{4})/i,
];

function extractDocumentDate(text, filename) {
  const fm = filename.match(/(\d{1,2})[\/\-](\d{1,2})[\/\-](\d{2,4})/);
  if (fm) return fm[0];
  for (const pattern of DATE_PATTERNS) {
    const regex = new RegExp(pattern.source, "gi");
    let m;
    while ((m = regex.exec(text)) !== null) {
      const context = text.substring(Math.max(0, m.index - 100), m.index);
      if (/(?:DOB|Date\s+of\s+Birth|Birth\s+Date|Birthdate)\b/i.test(context)) continue;
      return m[0];
    }
  }
  return null;
}

function simpleHash(str) {
  let hash = 0;
  for (let i = 0; i < str.length; i++) {
    hash = ((hash << 5) - hash) + str.charCodeAt(i);
    hash = hash & hash;
  }
  return Math.abs(hash).toString(16).padStart(8, "0");
}

function extractMedicalData(text, filename, documentHash, asOfDate) {
  const warnings = [];
  const documentType = classifyDocument(text);
  const documentDate = extractDocumentDate(text, filename);
  const labResults = extractLabResults(text, warnings, asOfDate);
  const medications = extractMedications(text);
  const diagnoses = extractDiagnoses(text);
  const imagingFindings = extractImagingFindings(text);
  const vitalSigns = extractVitalSigns(text);
  const pathologyResults = extractPathologyResults(text);
  const labPanels = labResults.length > 0
    ? [{ collection_date: documentDate || "unknown", results: labResults }] : [];
  const total = labResults.length + medications.length + diagnoses.length +
    imagingFindings.length + vitalSigns.length + pathologyResults.length;
  const confidence = Math.min(100, Math.max(0, total > 0 ? 70 + Math.min(30, total * 3) : 30));
  return {
    source_document_hash: documentHash,
    document_type: documentType,
    document_date: documentDate,
    extraction_confidence: confidence,
    diagnoses, lab_panels: labPanels, medications,
    imaging_findings: imagingFindings, vital_signs: vitalSigns,
    pathology: pathologyResults, warnings,
  };
}

// ---- timeline formatter (timelineFormatter.effect.ts) ----------------------

const LAB_STATUS_EMOJI = { Normal: "✅", Low: "⬇️", High: "⬆️", Critical: "🚨" };
const DOC_TYPE_EMOJI = {
  lab_report: "🧪", imaging: "🔬", pathology: "🔬", discharge_summary: "🏠",
  progress_note: "📝", medication_list: "💊", procedure_note: "🏥",
  consultation: "👨‍⚕️", unknown: "📄",
};

function formatLabTable(panel) {
  if (panel.results.length === 0) return "";
  const lines = [
    `**Collection Date**: ${panel.collection_date}`, "",
    "| Test | Value | Reference | Status |",
    "|------|-------|-----------|--------|",
  ];
  for (const r of panel.results) {
    const status = r.status || "unknown";
    const emoji = LAB_STATUS_EMOJI[status];
    const ref = r.reference_range || "—";
    const unit = r.unit ? ` ${r.unit}` : "";
    lines.push(`| ${r.test_name} | ${r.value}${unit} | ${ref} | ${emoji} ${status} |`);
  }
  return lines.join("\n");
}

function formatLabTrends(currentPanel, previousPanel) {
  if (!previousPanel) return "";
  const trends = [];
  for (const cur of currentPanel.results) {
    const prev = previousPanel.results.find(r => r.test_name === cur.test_name);
    if (!prev) continue;
    const cv = parseFloat(cur.value), pv = parseFloat(prev.value);
    if (!isNaN(cv) && !isNaN(pv) && pv !== 0) {
      const change = ((cv - pv) / pv) * 100;
      if (Math.abs(change) > 5) {
        const arrow = change > 0 ? "↑" : "↓";
        trends.push(`- ${cur.test_name}: ${prev.value} → ${cur.value} (${arrow} ${Math.abs(change).toFixed(1)}%)`);
      }
    }
  }
  if (trends.length === 0) return "";
  return ["", "#### Trends vs Previous", ...trends].join("\n");
}

function formatDiagnoses(diagnoses) {
  if (diagnoses.length === 0) return "";
  const lines = ["#### Diagnoses", ""];
  for (const dx of diagnoses) {
    const parts = [`- **${dx.condition}**`];
    if (dx.icd_code) parts.push(`(${dx.icd_code})`);
    if (dx.severity && dx.severity !== "unspecified") parts.push(`— ${dx.severity}`);
    if (dx.status) parts.push(`[${dx.status}]`);
    lines.push(parts.join(" "));
  }
  return lines.join("\n");
}

function formatMedications(medications) {
  if (medications.length === 0) return "";
  const lines = ["#### Medications", ""];
  for (const med of medications) {
    const parts = [`- **${med.name}**`];
    if (med.dose && med.unit) parts.push(`${med.dose} ${med.unit}`);
    if (med.route) parts.push(`(${med.route})`);
    if (med.frequency) parts.push(`— ${med.frequency}`);
    lines.push(parts.join(" "));
  }
  return lines.join("\n");
}

function formatImagingFindings(findings) {
  if (findings.length === 0) return "";
  const lines = [];
  for (const finding of findings) {
    lines.push(`#### ${finding.modality.toUpperCase()} — ${finding.body_part}`, "");
    if (finding.findings.length > 0) {
      lines.push("**Findings:**");
      for (const f of finding.findings) lines.push(`- ${f}`);
      lines.push("");
    }
    if (finding.impression) lines.push(`**Impression:** ${finding.impression}`, "");
  }
  return lines.join("\n");
}

function formatVitalSigns(vitals) {
  if (vitals.length === 0) return "";
  const v = vitals[0];
  const parts = [];
  if (v.blood_pressure_systolic && v.blood_pressure_diastolic)
    parts.push(`BP: ${v.blood_pressure_systolic}/${v.blood_pressure_diastolic}`);
  if (v.heart_rate) parts.push(`HR: ${v.heart_rate}`);
  if (v.respiratory_rate) parts.push(`RR: ${v.respiratory_rate}`);
  if (v.temperature) parts.push(`Temp: ${v.temperature}°${v.temperature_unit || "F"}`);
  if (v.oxygen_saturation) parts.push(`SpO2: ${v.oxygen_saturation}%`);
  if (v.pain_scale !== null && v.pain_scale !== undefined) parts.push(`Pain: ${v.pain_scale}/10`);
  if (parts.length === 0) return "";
  return ["#### Vital Signs", "", parts.join(" | "), ""].join("\n");
}

function formatPathology(results) {
  if (results.length === 0) return "";
  const lines = ["#### Pathology", ""];
  for (const r of results) {
    lines.push(`**Specimen:** ${r.specimen_type}`);
    lines.push(`**Diagnosis:** ${r.diagnosis}`);
    if (r.grade) lines.push(`**Grade:** ${r.grade}`);
    if (r.stage) lines.push(`**Stage:** ${r.stage}`);
    if (r.margins) lines.push(`**Margins:** ${r.margins}`);
    lines.push("");
  }
  return lines.join("\n");
}

function formatDocument(record, index, previousLabPanel) {
  const emoji = DOC_TYPE_EMOJI[record.document_type] || "📄";
  const date = record.document_date || "Unknown Date";
  const sections = [
    `### ${emoji} ${date} | ${record.document_type.replace(/_/g, " ").toUpperCase()}`,
    `**Document #${index + 1}** | Hash: \`${record.source_document_hash.substring(0, 8)}\` | Confidence: ${record.extraction_confidence}%`,
    "",
  ];
  const vitalsSection = formatVitalSigns(record.vital_signs);
  if (vitalsSection) sections.push(vitalsSection);
  const dxSection = formatDiagnoses(record.diagnoses);
  if (dxSection) sections.push(dxSection, "");
  for (const panel of record.lab_panels) {
    sections.push(formatLabTable(panel));
    sections.push(formatLabTrends(panel, previousLabPanel));
    sections.push("");
  }
  const medsSection = formatMedications(record.medications);
  if (medsSection) sections.push(medsSection, "");
  const imagingSection = formatImagingFindings(record.imaging_findings);
  if (imagingSection) sections.push(imagingSection);
  const pathSection = formatPathology(record.pathology);
  if (pathSection) sections.push(pathSection);
  if (record.warnings.length > 0) {
    sections.push("", "> ⚠️ **Extraction Warnings:**", ...record.warnings.map(w => `> - ${w}`));
  }
  sections.push("", "---", "");
  return sections.join("\n");
}

function calculateSummary(records) {
  const dates = records.map(r => r.document_date).filter(d => d != null).sort();
  const byType = {};
  const allMeds = [], allDx = [];
  for (const r of records) {
    byType[r.document_type] = (byType[r.document_type] || 0) + 1;
    allMeds.push(...r.medications);
    allDx.push(...r.diagnoses);
  }
  const seenMeds = new Set();
  const activeMedications = allMeds.filter(m => {
    const key = m.name.toLowerCase();
    if (seenMeds.has(key)) return false;
    seenMeds.add(key);
    return m.status === "active";
  });
  const seenDx = new Set();
  const activeDiagnoses = allDx.filter(d => {
    const key = d.condition.toLowerCase();
    if (seenDx.has(key)) return false;
    seenDx.add(key);
    return d.status === "active";
  });
  return {
    earliest: dates[0] || "Unknown", latest: dates[dates.length - 1] || "Unknown",
    totalDocuments: records.length, byType, activeMedications, activeDiagnoses,
  };
}

function formatSummary(summary) {
  const lines = [
    "## 📊 Summary Statistics", "",
    `- **Date Range**: ${summary.earliest} → ${summary.latest}`,
    `- **Total Documents**: ${summary.totalDocuments}`,
    "- **Document Types**:",
  ];
  for (const [type, count] of Object.entries(summary.byType)) {
    const emoji = DOC_TYPE_EMOJI[type] || "📄";
    lines.push(`  - ${emoji} ${type.replace(/_/g, " ")}: ${count}`);
  }
  lines.push("", "### 🎯 Active Diagnoses", "");
  if (summary.activeDiagnoses.length > 0) {
    for (const dx of summary.activeDiagnoses) {
      lines.push(`- ${dx.condition}${dx.severity !== "unspecified" ? ` (${dx.severity})` : ""}`);
    }
  } else lines.push("_No active diagnoses extracted_");
  lines.push("", "### 💊 Current Medications", "");
  if (summary.activeMedications.length > 0) {
    for (const med of summary.activeMedications) {
      const dose = med.dose && med.unit ? ` ${med.dose} ${med.unit}` : "";
      const freq = med.frequency ? ` — ${med.frequency}` : "";
      lines.push(`- ${med.name}${dose}${freq}`);
    }
  } else lines.push("_No active medications extracted_");
  lines.push("", "---", "");
  return lines.join("\n");
}

function formatMedicalTimeline(records, title, generatedAt) {
  const sorted = [...records].sort((a, b) => {
    const dateA = a.document_date || "9999";
    const dateB = b.document_date || "9999";
    return dateA.localeCompare(dateB);
  });
  const header = [`# 🏥 ${title}`, "", "_Extracted using whitelist approach — only clinical data, no PII_", "", `_Generated: ${generatedAt.split("T")[0]}_`, ""].join("\n");
  const summarySection = formatSummary(calculateSummary(sorted));
  const timelineHeader = ["## 📅 Chronological Timeline", "", "_Documents ordered oldest → newest_", ""].join("\n");
  let previousLabPanel = null;
  const documentSections = sorted.map((record, index) => {
    const section = formatDocument(record, index, previousLabPanel);
    if (record.lab_panels.length > 0) previousLabPanel = record.lab_panels[record.lab_panels.length - 1];
    return section;
  });
  const footer = ["", "---", "", "_This timeline was generated using whitelist extraction. Only structured clinical data_", "_was extracted — names, addresses, phone numbers, and other PII were never captured._", "", `_Scrubah.PII Medical Extractor v2.0 — ${generatedAt}_`].join("\n");
  return [header, summarySection, timelineHeader, ...documentSections, footer].join("\n");
}

// ---- main -------------------------------------------------------------------

let input = "";
process.stdin.on("data", d => (input += d));
process.stdin.on("end", () => {
  const { docs, as_of_date, generated_at, title } = JSON.parse(input);
  const records = [];
  let totalLabs = 0, totalDx = 0, totalMeds = 0;
  for (const doc of docs) {
    const record = extractMedicalData(doc.text, doc.filename, simpleHash(doc.text), as_of_date);
    totalLabs += record.lab_panels.reduce((s, p) => s + p.results.length, 0);
    totalDx += record.diagnoses.length;
    totalMeds += record.medications.length;
    records.push(record);
  }
  const markdown = formatMedicalTimeline(records, title || "Medical Record Timeline", generated_at);
  const stats = {
    total_documents: docs.length, successful_extractions: records.length,
    failed_extractions: 0, total_lab_results: totalLabs,
    total_diagnoses: totalDx, total_medications: totalMeds,
  };
  const statsBlock = [
    "", "---", "", "## 📈 Extraction Statistics", "",
    `- Documents processed: ${stats.total_documents}`,
    `- Successful extractions: ${stats.successful_extractions}`,
    `- Failed extractions: ${stats.failed_extractions}`,
    `- Lab results extracted: ${stats.total_lab_results}`,
    `- Diagnoses extracted: ${stats.total_diagnoses}`,
    `- Medications extracted: ${stats.total_medications}`,
  ];
  console.log(JSON.stringify({ records, timeline: markdown + statsBlock.join("\n"), stats }));
});
