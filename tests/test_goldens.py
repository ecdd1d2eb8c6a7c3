"""Committed golden regression: both scrub engines must reproduce the
JS-harness-generated snapshots byte-for-byte (hash-compared). Works without
node — the goldens are committed data (tools/gen_goldens.py regenerates).

Also a randomized fuzz parity check (node required) over adversarial text.
"""

import hashlib
import json
import random
import shutil
import string
import subprocess
from pathlib import Path

import pytest

from scrubah_pii_spark.core.scrub import scrub_text, scrub_text_production
from scrubah_pii_spark.core.scrub_worker import scrub_text_worker
from scrubah_pii_spark.sources.synth import generate_rows

GOLDEN = Path(__file__).resolve().parent / "golden" / "scrub_goldens.json"


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_scrub_goldens_byte_identical():
    goldens = json.loads(GOLDEN.read_text())
    rows = {r["url"]: r for r in generate_rows(500)}
    checked = 0
    for url, g in goldens.items():
        r = rows[url]
        assert _sha(r["text"]) == g["text_sha"], f"corpus drift at {url}"
        e = scrub_text(r["text"])
        assert _sha(e.text) == g["effect_scrubbed_sha"], (url, g["doc_class"])
        assert e.count == g["effect_count"], (url, g["doc_class"])
        w = scrub_text_worker(r["text"])
        assert _sha(w.text) == g["worker_scrubbed_sha"], (url, g["doc_class"])
        assert w.count == g["worker_count"], (url, g["doc_class"])
        c = scrub_text_production(r["text"])
        assert _sha(c.text) == g["composed_scrubbed_sha"], (url, g["doc_class"])
        assert c.count == g["composed_count"], (url, g["doc_class"])
        checked += 1
    assert checked == len(goldens) >= 500


# ---- randomized adversarial parity (needs node) -------------------------------
node = shutil.which("node")

PII_FRAGMENTS = [
    "test@x.invalid", "000-00-0001", "555-010-0000", "(555) 010-0004",
    "4111-1111-1111-1111", "MRN: TEST000001", "SSN ending in 6789",
    "l23-45-6789", "Patient Name: Jane Doe", "Dr. John Smith",
    "123 Main Street, Apt 4B", "Boston, MA 02134", "P.O. Box 99",
    "01/02/2024", "Patient Ann Lee", "patient ann lee", "PATIENT ANN LEE",
    "SSN last 4: 1234", "January 5th, 2024", "62 years old", "DOE, JANE",
    "Member ID: ABC12345", "CA", "Dr. Dr. Who", "[NAME_1]", "]]][[[",
]
ALPHABET = string.ascii_letters + string.digits + " \n\t.,:;-()[]@/#'"


def _random_doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(1, 25)):
        if rng.random() < 0.4:
            parts.append(rng.choice(PII_FRAGMENTS))
        else:
            parts.append(
                "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(1, 30)))
            )
    sep = rng.choice([" ", "\n", "  ", " \n "])
    return sep.join(parts)


@pytest.mark.skipif(node is None, reason="node unavailable")
def test_fuzz_parity_both_engines():
    rng = random.Random(20260816)
    docs = [{"url": str(i), "text": _random_doc(rng)} for i in range(400)]
    here = Path(__file__).resolve().parent.parent / "tools"
    for harness, engine in [
        ("scrub_harness.mjs", scrub_text),
        ("scrub_worker_harness.mjs", scrub_text_worker),
    ]:
        proc = subprocess.run(
            [node, str(here / harness)], input=json.dumps(docs),
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[:1000]
        js = {d["url"]: d for d in json.loads(proc.stdout)}
        for d in docs:
            py = engine(d["text"])
            if py.text != js[d["url"]]["scrubbed"]:
                pytest.fail(
                    f"{harness} mismatch on fuzz doc {d['url']}:\n"
                    f"IN : {d['text']!r}\nPY : {py.text!r}\n"
                    f"JS : {js[d['url']]['scrubbed']!r}"
                )


@pytest.mark.skipif(node is None, reason="node unavailable")
def test_fuzz_parity_composed_production():
    """App.tsx composition: worker harness -> effect harness --no-context,
    maps merged JS-side semantics vs scrub_text_production."""
    rng = random.Random(20260817)
    docs = [{"url": str(i), "text": _random_doc(rng)} for i in range(300)]
    here = Path(__file__).resolve().parent.parent / "tools"
    p1 = subprocess.run(
        [node, str(here / "scrub_worker_harness.mjs")], input=json.dumps(docs),
        capture_output=True, text=True, timeout=300,
    )
    assert p1.returncode == 0, p1.stderr[:1000]
    stage1 = {d["url"]: d for d in json.loads(p1.stdout)}
    p2 = subprocess.run(
        [node, str(here / "scrub_harness.mjs"), "--no-context"],
        input=json.dumps(
            [{"url": u, "text": d["scrubbed"]} for u, d in stage1.items()]
        ),
        capture_output=True, text=True, timeout=300,
    )
    assert p2.returncode == 0, p2.stderr[:1000]
    stage2 = {d["url"]: d for d in json.loads(p2.stdout)}
    for d in docs:
        py = scrub_text_production(d["text"])
        js_text = stage2[d["url"]]["scrubbed"]
        js_merged = {
            **stage1[d["url"]]["replacements"],
            **stage2[d["url"]]["replacements"],
        }
        if py.text != js_text or py.replacements != js_merged:
            pytest.fail(
                f"composed mismatch on fuzz doc {d['url']}:\n"
                f"IN : {d['text']!r}\nPY : {py.text!r}\nJS : {js_text!r}"
            )
