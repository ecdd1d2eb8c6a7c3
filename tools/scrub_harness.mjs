#!/usr/bin/env node
// Golden-generation harness: the deterministic scrub cascade expressed with
// NATIVE JavaScript regexes, matching the reference's documented semantics
// (/root/reference/services/piiScrubber.effect.ts:321-614, regex SSOT
// schemas/schemas.ts:1143-1168). Written fresh for this project — used only
// to cross-validate the Python port's JS<->Python regex parity and to emit
// golden scrub outputs (stdin: JSON array of {url,text}; stdout: JSON array
// of {url, scrubbed, replacements, count}).

const PII = {
  EMAIL: /\b[\w\.-]+@[\w\.-]+\.\w{2,}\b/g,
  PHONE: /(?:\+?1[-. ]?)?\(?([0-9]{3})\)?[-. ]?([0-9]{3})[-. ]?([0-9]{4})/g,
  SSN: /\b\d{3}[-\s]?\d{2}[-\s]?\d{4}\b/g,
  DATE: /\b\d{1,2}[\/-]\d{1,2}[\/-]\d{2,4}\b/g,
  CREDIT_CARD: /\b(?:\d{4}[-\s]?){3}\d{4}\b/g,
  ZIPCODE: /\b\d{5}(?:-\d{4})?\b/g,
  ADDRESS: /\b\d+\s+[\w\s]+\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Way|Court|Ct|Circle|Cir|Parkway|Pkwy|Place|Pl)\.?(?:\s+(?:Apt|Suite|Unit|#)\.?\s*[\w\d]+)?\b/gi,
  CITY_STATE: /\b[A-Z][a-zA-Z\s]+,\s*[A-Z]{2}\b/g,
  PO_BOX: /\bP\.?\s*O\.?\s*Box\s+\d+\b/gi,
};

const MRN_KEYWORDS = [
  "MRN", "Medical Record Number", "Patient ID", "Patient Number",
  "Record Number", "Chart Number", "Account Number", "Member ID",
];
const NAME_LABELS = [
  "Patient Name", "Name", "Full Name", "Legal Name", "Patient", "Attending",
  "Physician", "Doctor", "Nurse", "Provider", "patientName", "patient_name",
  "fullName", "full_name", "legalName", "legal_name",
];

const LABEL_STOP = new Set(["has","have","had","is","was","were","reports","report","presenting","presents","denies","with","seen","admitted","discharged","underwent","prescribed"]);
const INLINE_STOP = new Set([...LABEL_STOP, "elevated", "normal", "low", "high"]);

function scrub(text) {
  let t = text;
  const repl = {};
  const counters = { PER:0,LOC:0,ORG:0,EMAIL:0,PHONE:0,ID:0,ADDRESS:0,CITY_STATE:0,ZIP:0,DATE:0,NAME:0,PATIENT:0,PO_BOX:0 };
  const e2p = {__proto__: null};

  t = t.replace(/\bPatient Name\b/gi, "Patient_Name").replace(/\bAttending Physician\b/gi, "Attending_Physician");
  t = t.replace(/\bDr\.?\s+Dr\.?\b/g, "Dr.");

  // patient label names
  {
    const ms = [...t.matchAll(/(^|[\r\n]\s*)Patient\s+([A-Za-z0-9]{2,}\s+[A-Za-z0-9]{2,})\b/gm)];
    for (let i = ms.length - 1; i >= 0; i--) {
      const m = ms[i];
      const pfx = m[1] ?? "";
      const name = m[2];
      const second = name.trim().split(/\s+/)[1]?.toLowerCase();
      if (second && LABEL_STOP.has(second)) continue;
      const full = `${pfx}Patient ${name}`;
      if (!e2p[full]) {
        counters.PATIENT++;
        e2p[full] = `${pfx}[PATIENT-${counters.PATIENT}]`;
        repl[full] = e2p[full];
      }
      t = t.slice(0, m.index) + e2p[full] + t.slice(m.index + full.length);
    }
  }
  // inline patient names (lower / upper)
  for (const [pat, lead] of [
    [/\bpatient\s+([a-z]{2,})\s+([a-z]{2,})\b/g, "patient"],
    [/\bPATIENT\s+([A-Z]{2,})\s+([A-Z]{2,})\b/g, "PATIENT"],
  ]) {
    const ms = [...t.matchAll(pat)];
    for (let i = ms.length - 1; i >= 0; i--) {
      const m = ms[i];
      if (INLINE_STOP.has(m[1].toLowerCase()) || INLINE_STOP.has(m[2].toLowerCase())) continue;
      const v = m[0];
      if (!e2p[v]) {
        counters.PATIENT++;
        e2p[v] = `${lead} [PATIENT-${counters.PATIENT}]`;
        repl[v] = e2p[v];
      }
      t = t.slice(0, m.index) + e2p[v] + t.slice(m.index + v.length);
    }
  }
  // SSN last-4 with context
  {
    const ms = [...t.matchAll(/\bSSN\s+ending\s+in\s+(\d{4})\b/gi)];
    for (let i = ms.length - 1; i >= 0; i--) {
      const m = ms[i];
      const d = m[1];
      if (!e2p[d]) { counters.ID++; e2p[d] = `[SSN_${counters.ID}]`; repl[d] = e2p[d]; }
      t = t.slice(0, m.index) + `SSN ending in ${e2p[d]}` + t.slice(m.index + m[0].length);
    }
  }

  const run = (key, re, prefix) => {
    const ms = [...t.matchAll(new RegExp(re.source, re.flags))];
    for (let i = ms.length - 1; i >= 0; i--) {
      const m = ms[i];
      const v = m[0];
      if (!e2p[v]) {
        counters[key]++;
        e2p[v] = `[${prefix}_${counters[key]}]`;
        repl[v] = e2p[v];
      }
      t = t.slice(0, m.index) + e2p[v] + t.slice(m.index + v.length);
    }
  };

  run("ID", /\b[lI]\d{2}[-\s]?\d{2}[-\s]?\d{4}\b/g, "SSN"); // OCR noise
  run("EMAIL", PII.EMAIL, "EMAIL");
  run("PHONE", PII.PHONE, "PHONE");
  run("ID", PII.SSN, "SSN");
  run("ID", PII.CREDIT_CARD, "CARD");
  run("ZIP", PII.ZIPCODE, "ZIP");
  run("DATE", PII.DATE, "DATE");
  run("NAME", /\b[A-Z][a-z]{2,}\s+[A-Z][a-z]{2,}\b/g, "NAME");
  run("NAME", /\b(?:Dr|Mr|Ms|Mrs)\.?\s+[A-Z][a-z]{2,}\s+[A-Z][a-z]{2,}\b/g, "NAME");
  if (CONTEXT) {
    run("ADDRESS", PII.ADDRESS, "ADDR");
    run("CITY_STATE", PII.CITY_STATE, "CITY");
    run("PO_BOX", PII.PO_BOX, "POBOX");
  }

  // contextual MRN
  {
    const re = new RegExp(`(${MRN_KEYWORDS.join("|")})[:\\s]+([A-Z0-9]{6,12})\\b`, "gi");
    const found = [];
    let m;
    while ((m = re.exec(t)) !== null) {
      const v = m[2];
      const start = m.index + m[0].length - v.length;
      found.push({ start, end: start + v.length, v });
    }
    found.reverse().forEach(({ start, end, v }) => {
      if (!e2p[v]) { counters.ID++; e2p[v] = `[MRN_${counters.ID}]`; repl[v] = e2p[v]; }
      t = t.substring(0, start) + e2p[v] + t.substring(end);
    });
  }
  // labeled names
  if (CONTEXT) {
    const labels = NAME_LABELS.map((l) => l.replace(/([.*+?^${}()|[\]\\])/g, "\\$1")).join("|");
    const re = new RegExp(`(${labels})[:\\s]+(?:(Dr\\.|Mr\\.|Ms\\.|Mrs\\.|Miss|Nurse)\\s+)?([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)+)`, "gi");
    const found = [];
    let m;
    while ((m = re.exec(t)) !== null) {
      const label = m[1], title = m[2] || "", name = m[3];
      const full = title ? `${title} ${name}` : name;
      const start = m[0].indexOf(full, label.length) + m.index;
      found.push({ start, end: start + full.length, v: full });
    }
    found.reverse().forEach(({ start, end, v }) => {
      if (!/\b[A-Z][a-z]{1,}\s+[A-Z][a-z]{1,}\b/.test(v.trim())) return;
      if (!e2p[v]) { counters.NAME++; e2p[v] = `[NAME_${counters.NAME}]`; repl[v] = e2p[v]; }
      t = t.substring(0, start) + e2p[v] + t.substring(end);
    });
  }

  return { scrubbed: t, replacements: repl, count: Object.keys(repl).length };
}

// --no-context: enableContextDetection=false (the App.tsx second-pass
// config) — skips ADDRESS/CITY/POBOX + labeled names, mirrors
// piiScrubber.effect.ts:570-575,:592-611 gates (contextual MRN always runs)
const CONTEXT = !process.argv.includes("--no-context");

let input = "";
process.stdin.on("data", (d) => (input += d));
process.stdin.on("end", () => {
  const docs = JSON.parse(input);
  const out = docs.map((d) => ({ url: d.url, ...scrub(d.text) }));
  process.stdout.write(JSON.stringify(out));
});
