"""Fixture documents for the whitelist-extractor tests — the same sample
documents the reference's test/whiteListExtractor.test.ts builds from its
anti-prod-leak TEST_PII constants (services/testConstants.ts:8-66)."""

# testConstants.ts values (obviously-fake by design)
NAME_PATIENT = "Test Patient"
NAME_DOCTOR = "Dr. Test Physician"
NAME_NURSE = "Nurse Test Helper"
DATE_BIRTH = "01/01/1950"
DATE_VISIT = "06/15/2024"
MRN_PRIMARY = "TEST000001"
PHONE_PRIMARY = "555-010-0000"
EMAIL_PRIMARY = "test-patient@example.invalid"
LOCATION_HOSPITAL = "Test General Hospital"

SAMPLE_LAB_REPORT = f"""
Patient Name: {NAME_PATIENT}
DOB: {DATE_BIRTH}
MRN: {MRN_PRIMARY}
Date: {DATE_VISIT}

COMPLETE BLOOD COUNT

WBC: 8.5 K/uL (Reference: 4.0-11.0)
RBC: 4.8 M/uL
Hemoglobin: 13.2 g/dL (Reference: 13.5-17.5)
Hematocrit: 39%
Platelets: 245 K/uL

COMPREHENSIVE METABOLIC PANEL

Glucose: 95 mg/dL
BUN: 15 mg/dL
Creatinine: 0.9 mg/dL
Sodium: 140 mEq/L
Potassium: 4.2 mEq/L

Reviewed by: {NAME_DOCTOR}, M.D.
Phone: {PHONE_PRIMARY}
Lab License: {MRN_PRIMARY}
"""

SAMPLE_IMAGING_REPORT = f"""
MRI Lumbar Spine without Contrast
Date: {DATE_VISIT}

Patient: {NAME_PATIENT.upper()}{DATE_BIRTH.replace('/', '')}FIN9876543MRN{MRN_PRIMARY}

HISTORY: Low back pain. Fall one week ago.

TECHNIQUE: Multiplanar MRI images acquired on 1.5T unit.

FINDINGS:
- Mild decrease in lumbar lordosis
- Vertebral bodies normal in height and alignment
- No focal bone marrow lesion or edema
- At L3-L4: mild posterior disc bulge with bilateral facet degeneration
- At L4-L5: mild posterior bulge causing mild to moderate canal narrowing
- At L5-S1: asymmetric right-sided disc protrusion

IMPRESSION:
Multilevel degenerative changes. Moderate canal narrowing at L4-L5.
No acute fracture or significant neural foraminal stenosis.

Interpreted by: {NAME_DOCTOR}, M.D.
Signed by: {NAME_NURSE}
Location: {LOCATION_HOSPITAL} Radiology
"""

SAMPLE_PATHOLOGY_REPORT = f"""
PATHOLOGY REPORT

Specimen: Gastric biopsy
Collection Date: 10/31/2025

DIAGNOSIS:
Poorly differentiated signet ring cell adenocarcinoma

GRADE: High grade (Grade 3)
STAGE: Stage IV metastatic disease

MARGINS: Not applicable (biopsy specimen)

MARKERS:
- HER2: Negative
- PD-L1: Positive (CPS 15)
- MSI: Microsatellite stable

Clinical Correlation:
Family member present during consultation.
Plan for palliative radiation and outpatient chemotherapy.

Pathologist: {NAME_DOCTOR} M.D.
Contact: {EMAIL_PRIMARY}
"""

MIXED_PII_TEXT = """
      Patient: John Smith, DOB 01/15/1980, SSN 123-45-6789
      Phone: (555) 123-4567, Email: john@example.com
      Address: 123 Main Street, Anytown, PA 19001

      Lab Results:
      WBC: 7.5 K/uL
      Hemoglobin: 14.0 g/dL
      Glucose: 110 mg/dL

      Diagnosis: Type 2 Diabetes Mellitus

      Signed by: Dr. Jane Doe, M.D.
    """

# additional coverage: a medication-list doc and a vitals-bearing progress
# note (deterministic, exercises routes/frequencies and vitals parsing)
SAMPLE_MED_LIST = """
Pharmacy refill summary

Metformin 500 mg oral twice daily
Lisinopril 10 mg PO daily
Insulin 12 units subq at bedtime
Atorvastatin 40 mg
"""

SAMPLE_PROGRESS_NOTE = """
Progress Note — subjective and objective review

BP: 132/84  HR: 78 bpm  RR: 16  Temp: 98.6 F  SpO2: 97%  Weight: 81.5 kg
Pain: 3/10

Patient diagnosed with chronic kidney disease, doing well.
"""

FIXTURE_DOCS = [
    {"id": "1", "filename": "lab_report_2025-11-20.pdf", "text": SAMPLE_LAB_REPORT},
    {"id": "2", "filename": "mri_lumbar_2025-04-15.pdf", "text": SAMPLE_IMAGING_REPORT},
    {"id": "3", "filename": "pathology_2025-10-31.pdf", "text": SAMPLE_PATHOLOGY_REPORT},
    {"id": "4", "filename": "test.pdf", "text": MIXED_PII_TEXT},
    {"id": "5", "filename": "meds.txt", "text": SAMPLE_MED_LIST},
    {"id": "6", "filename": "note.txt", "text": SAMPLE_PROGRESS_NOTE},
]

AS_OF_DATE = "2026-01-01"
GENERATED_AT = "2026-01-01T00:00:00.000Z"
