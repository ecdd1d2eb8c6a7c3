"""Offline cProfile of the pure-Python kernels behind the slow bench queries
(whitelist_timeline, lab_trend_summary) — guide §1: find where the time goes
before changing anything. Uses DuckDB to evaluate the same probe SQL the
oracles use, so no Spark session is needed."""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
)

# whitelist probe (mirror of oracles_sql.whitelist_probe_expr)
wl = con.execute("""
SELECT doc_id,
  CASE doc_id % 5
    WHEN 0 THEN 'Laboratory results' || chr(10) || 'Date: 3/' ||
      CAST(doc_id % 28 + 1 AS VARCHAR) || '/2024' || chr(10) || 'WBC: ' ||
      CAST(CAST(floor((doc_id % 240) / 10) AS BIGINT) AS VARCHAR) || '.' ||
      CAST(doc_id % 10 AS VARCHAR) || ' K/uL' || chr(10) || 'Glucose: ' ||
      CAST((doc_id * 7) % 180 + 20 AS VARCHAR) || ' mg/dL' || chr(10)
    WHEN 1 THEN 'Radiology imaging review' || chr(10) ||
      (CASE WHEN doc_id % 2 = 0 THEN 'CT' ELSE 'MRI' END) || ' of the ' ||
      (['chest','abdomen','pelvis'])[doc_id % 3 + 1] ||
      ' performed today' || chr(10) ||
      'IMPRESSION: stable postsurgical scarring at the left base with no new nodule' || chr(10)
    WHEN 2 THEN 'Surgical pathology report' || chr(10) ||
      'Specimen: gastric biopsy tissue' || chr(10) || 'DIAGNOSIS:' || chr(10) ||
      'poorly differentiated adenocarcinoma' || chr(10) || 'GRADE: ' ||
      CAST(doc_id % 4 AS VARCHAR) || chr(10) || 'MARGINS: ' ||
      (CASE WHEN doc_id % 2 = 0 THEN 'negative' ELSE 'positive' END) || chr(10)
    WHEN 3 THEN 'Pharmacy prescription refill' || chr(10) || 'Metformin ' ||
      CAST((doc_id % 9 + 1) * 50 AS VARCHAR) || ' mg oral twice daily' || chr(10) ||
      'Lisinopril ' || CAST((doc_id % 4 + 1) * 10 AS VARCHAR) || ' mg PO daily' || chr(10)
    ELSE 'Progress note assessment' || chr(10) || 'BP: ' ||
      CAST(doc_id % 60 + 100 AS VARCHAR) || '/' ||
      CAST(doc_id % 40 + 60 AS VARCHAR) || ' HR: ' ||
      CAST(doc_id % 100 + 40 AS VARCHAR) || ' RR: ' ||
      CAST(doc_id % 20 + 10 AS VARCHAR) || chr(10) ||
      'Patient diagnosed with chronic kidney disease today' || chr(10)
  END AS probe
FROM documents ORDER BY doc_id
""").fetchall()

# lab-trend probe = text || clinical snippet (doc_id % 11 != 0)
lt = con.execute("""
SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text ELSE text ||
  ' WBC: ' || CAST(doc_id % 25 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) || ' x10E3/uL' ||
  ' HGB: ' || CAST(doc_id % 20 + 5 AS VARCHAR) || ' g/dL' ||
  ' Glucose: ' || CAST((doc_id * 7) % 200 + 30 AS VARCHAR) || ' mg/dL' ||
  ' BP: ' || CAST(doc_id % 80 + 80 AS VARCHAR) || '/' || CAST(doc_id % 50 + 50 AS VARCHAR) ||
  ' HR: ' || CAST(doc_id % 100 + 40 AS VARCHAR) || ' bpm' ||
  ' Temp: 9' || CAST(doc_id % 2 + 7 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) ||
  ' SpO2: ' || CAST(doc_id % 15 + 85 AS VARCHAR) || '%' ||
  (CASE WHEN doc_id % 3 = 0 THEN ' Dx: E11.' || CAST(doc_id % 10 AS VARCHAR) ||
    ' and I10. CT chest and MRI brain reviewed. X-ray negative.' ELSE '' END) ||
  (CASE WHEN doc_id % 7 = 0 THEN ' Troponin: <0.0' || CAST(doc_id % 9 + 1 AS VARCHAR) ||
    ' ng/mL INR: ' || CAST(doc_id % 4 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) ||
    ' Weight: ' || CAST(doc_id % 60 + 50 AS VARCHAR) || '.5 kg' ELSE '' END)
  END AS probe
FROM documents ORDER BY doc_id
""").fetchall()

print(f"docs: {len(wl)}; avg wl probe len "
      f"{sum(len(p) for _, p in wl)/len(wl):.0f}; "
      f"avg lt probe len {sum(len(p) for _, p in lt)/len(lt):.0f}")


def profile(label, fn):
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    fn()
    pr.disable()
    wall = time.time() - t0
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(f"\n===== {label}: {wall:.2f}s =====")
    print("\n".join(s.getvalue().splitlines()[4:40]))


# --- whitelist_timeline kernel: one bucket (doc_id % 25 == 0) ---------------
from scrubah_pii_spark.core.whitelist_timeline import build_master_timeline_v2

bucket0 = [
    {"id": str(d), "original_name": f"probe_{d}.txt", "raw_text": p}
    for d, p in wl if d % 25 == 0
]
print(f"bucket0 size: {len(bucket0)}")
profile("build_master_timeline_v2 (1 bucket)",
        lambda: build_master_timeline_v2(bucket0, "2026-01-01",
                                         "2026-01-01T00:00:00.000Z"))

# --- lab_trend kernel: extract_labs over every probe ------------------------
from scrubah_pii_spark.core.extraction import extract_labs

probes = [p for _, p in lt]
profile("extract_labs (all docs)",
        lambda: [extract_labs(p) for p in probes])

# --- embed kernel: embed_document over every text ---------------------------
texts = [r[0] for r in con.execute("SELECT text FROM documents").fetchall()]
from scrubah_pii_spark.operators.embed_op import embed_document

profile("embed_document (all docs)",
        lambda: [embed_document(t or "", 64) for t in texts])
