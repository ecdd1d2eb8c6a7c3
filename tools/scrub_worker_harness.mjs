#!/usr/bin/env node
// Golden harness for the WORKER scrub rule set (scrubber.worker.ts semantics,
// forward-order numbering via String.replace callbacks). Written fresh for
// cross-validating the Python port. stdin: [{url,text}] -> stdout: results.

const US_STATES = new Set(("AL AK AZ AR CA CO CT DE FL GA HI ID IL IN IA KS KY LA ME MD " +
  "MA MI MN MS MO MT NE NV NH NJ NM NY NC ND OH OK OR PA RI SC " +
  "SD TN TX UT VT VA WA WV WI WY DC PR VI GU AS MP").split(" "));

const P = {
  EMAIL: /\b[\w\.-]+@[\w\.-]+\.\w{2,4}\b/g,
  PHONE: /(?:\+?1[-. ]?)?\(?([0-9]{3})\)?[-. ]?([0-9]{3})[-. ]?([0-9]{4})/g,
  SSN: /\b\d{3}-\d{2}-\d{4}\b/g,
  SSN_PARTIAL: /\b(?:last\s*4|xxx-xx-)\s*[-:]?\s*\d{4}\b/gi,
  DATE: /\b\d{1,2}[\/-]\d{1,2}[\/-]\d{2,4}\b/g,
  DATE_WRITTEN: /\b(?:January|February|March|April|May|June|July|August|September|October|November|December)\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s+\d{4})?\b/gi,
  DATE_WRITTEN_ALT: /\b\d{1,2}(?:st|nd|rd|th)?\s+(?:of\s+)?(?:January|February|March|April|May|June|July|August|September|October|November|December)(?:,?\s+\d{4})?\b/gi,
  CREDIT_CARD: /\b(?:\d{4}[-\s]?){3}\d{4}\b/g,
  ZIPCODE: /\b\d{5}(?:-\d{4})?\b/g,
  AGE: /\b\d{1,3}\s*(?:year[s]?\s*old|y\.?o\.?|yo|yr[s]?(?:\s*old)?)\b/gi,
  AGE_CONTEXT: /\b(?:age[d]?|DOB\s+indicates)\s*[:\s]*\d{1,3}\b/gi,
  ADDRESS: /\d+\s+(?:[A-Za-z]+\s+){1,4}(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Lane|Ln|Drive|Dr|Court|Ct|Parkway|Pkwy|Way|Circle|Cir|Place|Pl|Terrace|Ter)(?:\.|\s|,|\s+Apt|\s+Suite|\s+Unit|\s+#)?(?:\s*[A-Za-z0-9#-]*)?/gi,
  CITY_STATE: /\b[A-Z][a-zA-Z\s]+,\s*[A-Z]{2}\b/g,
  PO_BOX: /P\.?\s*O\.?\s*Box\s+\d+/gi,
  ALL_CAPS_NAME: /\b[A-Z]{2,}(?:,?\s+[A-Z]{2,})+\b/g,
  ALL_CAPS_SINGLE: /\b[A-Z]{3,}\b/g,
  LAST_FIRST_NAME: /\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*,\s*[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b/g,
  NAME_APOSTROPHE: /\b(?:O'|Mc|Mac)?[A-Z][a-z]+(?:[-'][A-Z]?[a-z]+)+\b/g,
  NAME_WITH_SUFFIX: /\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\s+(?:Jr\.?|Sr\.?|II|III|IV|V)\b/g,
  INSURANCE_ID: /\b(?:policy|member|subscriber|group|insurance)\s*(?:#|number|id|no)?[:\s]*[A-Z0-9]{6,15}\b/gi,
};

const WHITELIST = new Set(("CBC MRI CAT EKG ECG EEG EMG ICU CCU NICU PICU ER OR ED " +
  "HIV AIDS COVID COPD CHF CAD GERD UTI DVT PE MI CVA TIA " +
  "BMI BP HR RR SPO BUN WBC RBC HGB HCT PLT BMP CMP LFT " +
  "TSH PSA HBA INR PTT ABG VBG CSF EGD ERCP PET CT US " +
  "PRN BID TID QID QHS QAM QPM PO IV IM SQ SL PR TOP " +
  "DNR DNI POLST HCP POA LTC SNF ALF ICD CPT DRG HCPCS " +
  "STAT ASAP WNL NAD PERRLA ROS HPI PMH PSH FH SH RX DX TX " +
  "SOB DOE PND JVD RUQ LUQ RLQ LLQ ROM DTR CN EOM " +
  "AMA ADA HIPAA PHI EMR EHR CMS FDA CDC NIH WHO " +
  "PDF DOC PAGE DATE TIME NOTE NOTES FORM REPORT SUMMARY HISTORY " +
  "NAME AGE SEX DOB MRN SSN ZIP FAX TEL EXT " +
  "MALE FEMALE YES NO NA TBD NKA NKDA " +
  "SUBJECTIVE OBJECTIVE ASSESSMENT PLAN SOAP IMPRESSION RECOMMENDATION " +
  "CHIEF COMPLAINT ALLERGIES MEDICATIONS VITALS EXAM LABS IMAGING " +
  "PROCEDURE PROCEDURES SURGERY SURGERIES DIAGNOSIS DIAGNOSES " +
  "USA UK EST PST CST MST UTC GMT AM PM").split(" "));

const NAME_LABELS = ["Patient Name", "Name", "Full Name", "Legal Name", "Patient",
  "Pt Name", "Patient's Name", "Name of Patient", "patientName",
  "patient_name", "fullName", "full_name"];
const MRN_KEYWORDS = ["MRN", "Medical Record Number", "Patient ID", "Patient Number",
  "Record Number", "Chart Number", "Account Number", "Member ID"];

function scrubWorker(text) {
  const e2p = { __proto__: null };
  const counters = { PER: 0, LOC: 0, ORG: 0, EMAIL: 0, PHONE: 0, ID: 0, DATE: 0 };
  let total = 0;
  let t = text;

  const run = (ctype, regex, prefix) => {
    t = t.replace(regex, (match) => {
      if (!e2p[match]) {
        counters[ctype]++;
        e2p[match] = `[${prefix}_${counters[ctype]}]`;
        total++;
      }
      return e2p[match];
    });
  };

  run("EMAIL", P.EMAIL, "EMAIL");
  run("PHONE", P.PHONE, "PHONE");
  run("ID", P.SSN, "SSN");
  run("ID", P.SSN_PARTIAL, "SSN");
  run("ID", P.CREDIT_CARD, "CARD");
  run("ID", P.ZIPCODE, "ZIP");
  run("ID", P.INSURANCE_ID, "ID");
  run("DATE", P.DATE, "DATE");
  run("DATE", P.DATE_WRITTEN, "DATE");
  run("DATE", P.DATE_WRITTEN_ALT, "DATE");
  run("DATE", P.AGE, "AGE");
  run("DATE", P.AGE_CONTEXT, "AGE");
  run("LOC", P.ADDRESS, "ADDR");
  run("LOC", P.PO_BOX, "POBOX");
  run("LOC", P.CITY_STATE, "LOC");
  run("PER", P.ALL_CAPS_NAME, "PER");
  run("PER", P.LAST_FIRST_NAME, "PER");
  run("PER", P.NAME_APOSTROPHE, "PER");
  run("PER", P.NAME_WITH_SUFFIX, "PER");

  t = t.replace(P.ALL_CAPS_SINGLE, (match) => {
    if (WHITELIST.has(match)) return match;
    if (/^\[[A-Z_]+\d+\]$/.test(match)) return match;
    if (!e2p[match]) {
      counters.PER++;
      e2p[match] = `[PER_${counters.PER}]`;
      total++;
    }
    return e2p[match];
  });

  // standalone states
  const statePattern = /\b([A-Z]{2})\b/g;
  let sm;
  const spans = [];
  while ((sm = statePattern.exec(t)) !== null) {
    const v = sm[1];
    if (US_STATES.has(v)) {
      const before = t.slice(Math.max(0, sm.index - 1), sm.index);
      const after = t.slice(sm.index + 2, sm.index + 3);
      if (before === "[" || after === "]" || before === "_") continue;
      spans.push({ start: sm.index, end: sm.index + 2, v });
    }
  }
  spans.reverse().forEach(({ start, end, v }) => {
    if (!e2p[v]) {
      counters.LOC++;
      e2p[v] = `[STATE_${counters.LOC}]`;
      total++;
    }
    t = t.substring(0, start) + e2p[v] + t.substring(end);
  });

  // MRN: collect new, then global replace
  const mrnPattern = new RegExp(`(${MRN_KEYWORDS.join("|")})[:\\s]+([A-Z0-9]{6,12})\\b`, "gi");
  const mrnNew = [];
  let mm;
  while ((mm = mrnPattern.exec(t)) !== null) {
    const v = mm[2];
    if (!e2p[v]) {
      counters.ID++;
      e2p[v] = `[MRN_${counters.ID}]`;
      total++;
      mrnNew.push([v, e2p[v]]);
    }
  }
  for (const [v, ph] of mrnNew) {
    t = t.replace(new RegExp(v.replace(/[.*+?^${}()|[\]\\]/g, "\\$&"), "g"), ph);
  }

  // labeled names with 3 fallback shapes
  const sorted = [...NAME_LABELS].sort((a, b) => b.length - a.length);
  const labelPattern = new RegExp(`(${sorted.join("|")})\\s*:\\s*`, "gi");
  const found = [];
  let lm;
  while ((lm = labelPattern.exec(t)) !== null) {
    const after = t.slice(lm.index + lm[0].length);
    const start = lm.index + lm[0].length;
    let matched = null;
    const m1 = after.match(/^([A-Z]{2,}(?:,?\s+[A-Z]{2,})+)/);
    if (m1) matched = m1[1];
    else {
      const m2 = after.match(/^([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*,\s*[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)/);
      if (m2) matched = m2[1];
      else {
        const m3 = after.match(/^((?:Dr|Mr|Ms|Mrs|Miss)\.?\s+)?([A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3})/);
        if (m3) matched = m3[0].trim();
      }
    }
    if (matched && !e2p[matched]) {
      counters.PER++;
      e2p[matched] = `[PER_${counters.PER}]`;
      total++;
      found.push({ matched, ph: e2p[matched], start });
    }
  }
  found.sort((a, b) => b.start - a.start).forEach(({ matched, ph, start }) => {
    t = t.substring(0, start) + ph + t.substring(start + matched.length);
  });

  return { scrubbed: t, replacements: e2p, count: total };
}

let input = "";
process.stdin.on("data", (d) => (input += d));
process.stdin.on("end", () => {
  const docs = JSON.parse(input);
  process.stdout.write(JSON.stringify(docs.map((d) => ({ url: d.url, ...scrubWorker(d.text) }))));
});
