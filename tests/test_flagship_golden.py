"""End-to-end flagship golden: the full pipeline over the driver's sf0.01
documents table must reproduce the committed url-keyed row hashes exactly.
This hard-gates the composition (extract -> gates -> production scrub ->
relevance -> fused dedup) even though the driver records it rows-only —
drift in ANY stage breaks this test, not just the rows>0 check.

Regenerate (deliberate semantic changes only):
  python tools/gen_flagship_golden.py /root/testdata/sf0.01 tests/golden/flagship_sf001.json
  python tools/gen_flagship_golden.py /root/testdata/sf0.1  tests/golden/flagship_sf01.json
(keys are sha256("|".join(f"{col}={value!r}")) over non-url columns, sorted)
"""

import hashlib
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize(
    "sf_dir,golden_file",
    [
        ("/root/testdata/sf0.01", "flagship_sf001.json"),
        ("/root/testdata/sf0.1", "flagship_sf01.json"),  # bench scale
    ],
)
def test_flagship_output_matches_golden(spark, sf_dir, golden_file):
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata absent")
    from scrubah_pii_spark.entry_queries import q_pipeline_flagship

    with open(os.path.join(GOLDEN_DIR, golden_file)) as f:
        golden = json.load(f)
    rows = q_pipeline_flagship(spark, sf_dir).collect()
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


def test_flagship_matches_spark_free_reimplementation(spark):
    """Independence gate (round 7): the flagship pipeline must agree row-for-
    row with tools/gen_flagship_oracle_pure.py — a SPARK-FREE reimplementation
    driving the shared JS-parity core kernels plus its own plain-Python
    exact-dup window + banded simhash verdict fold. Two implementations of
    the spec meeting; this is what upgrades the committed flagship oracle
    from a regression pin to an oracle."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata absent")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_flagship_oracle_pure import generate

    expected = generate(sf_dir)

    from scrubah_pii_spark.entry_queries import q_pipeline_flagship

    got = sorted(
        (r.asDict() for r in q_pipeline_flagship(spark, sf_dir).collect()),
        key=lambda d: d["url"],
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e, f"row diverged at {e['url']}: {g} != {e}"
