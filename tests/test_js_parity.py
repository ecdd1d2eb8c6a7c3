"""Cross-engine parity: Python scrub port vs native-JS-regex harness.

Byte-identical scrubbed text + identical replacement maps over the full
synthetic corpus mix. This is the strongest evidence we have (no network, so
the reference's own vitest suite can't run) that JS->Python regex translation
is exact."""

import json
import shutil
import subprocess
from pathlib import Path

import pytest

from scrubah_pii_spark.core.scrub import scrub_text
from scrubah_pii_spark.sources.synth import generate_rows

HARNESS = Path(__file__).resolve().parent.parent / "tools" / "scrub_harness.mjs"

node = shutil.which("node")


@pytest.mark.skipif(node is None, reason="node unavailable")
def test_scrub_byte_parity_vs_js():
    rows = generate_rows(300)
    docs = [{"url": r["url"], "text": r["text"]} for r in rows]
    proc = subprocess.run(
        [node, str(HARNESS)],
        input=json.dumps(docs),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    js_out = {d["url"]: d for d in json.loads(proc.stdout)}

    mismatches = []
    for r in rows:
        py = scrub_text(r["text"])
        js = js_out[r["url"]]
        if py.text != js["scrubbed"]:
            mismatches.append((r["url"], r["doc_class"], py.text, js["scrubbed"]))
        elif py.replacements != js["replacements"]:
            mismatches.append((r["url"], r["doc_class"], py.replacements, js["replacements"]))
    if mismatches:
        url, cls, a, b = mismatches[0]
        pytest.fail(
            f"{len(mismatches)}/{len(rows)} mismatches; first {url} ({cls}):\n"
            f"PY: {a!r}\nJS: {b!r}"
        )
