"""End-to-end flagship golden: the full pipeline over the driver's sf0.01
documents table must reproduce the committed url-keyed row hashes exactly.
This hard-gates the composition (extract -> gates -> production scrub ->
relevance -> fused dedup) even though the driver records it rows-only —
drift in ANY stage breaks this test, not just the rows>0 check.

Regenerate (deliberate semantic changes only):
  python - <<'PY'
  # see tools/ or git log for the generation snippet; keys are
  # sha256("|".join(f"{col}={value!r}")) over the non-url columns, sorted.
  PY
"""

import hashlib
import json
import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "flagship_sf001.json")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_flagship_output_matches_golden(spark):
    from scrubah_pii_spark.entry_queries import q_pipeline_flagship

    with open(GOLDEN) as f:
        golden = json.load(f)
    rows = q_pipeline_flagship(spark, SF_DIR).collect()
    assert len(rows) == golden["n_rows"]
    mismatched = []
    got_urls = set()
    for r in rows:
        d = r.asDict()
        url = d.pop("url")
        got_urls.add(url)
        payload = "|".join(f"{k}={d[k]!r}" for k in sorted(d))
        h = hashlib.sha256(payload.encode()).hexdigest()
        if golden["rows"].get(url) != h:
            mismatched.append(url)
    assert not mismatched, f"{len(mismatched)} rows drifted: {mismatched[:5]}"
    assert got_urls == set(golden["rows"]), "url set drifted"
