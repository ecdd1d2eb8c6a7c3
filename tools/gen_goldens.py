"""Generate committed golden scrub outputs for the fixture corpus.

Runs the native-JS harness (the JS-regex ground truth for the reference's
deterministic scrub path) over the seed-42 fixture corpus and writes
tests/golden/scrub_goldens.json: url -> {sha256(scrubbed), count, text_sha}.
pytest compares the Python engine against these committed snapshots, so any
regression in the cascade breaks loudly even without node installed."""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrubah_pii_spark.sources.synth import generate_rows

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(os.path.dirname(HERE), "tests", "golden", "scrub_goldens.json")


def main(n: int = 500):
    rows = generate_rows(n)
    docs = [{"url": r["url"], "text": r["text"]} for r in rows]
    proc = subprocess.run(
        ["node", os.path.join(HERE, "scrub_harness.mjs")],
        input=json.dumps(docs), capture_output=True, text=True, timeout=600,
    )
    proc.check_returncode()
    effect = {d["url"]: d for d in json.loads(proc.stdout)}
    proc_w = subprocess.run(
        ["node", os.path.join(HERE, "scrub_worker_harness.mjs")],
        input=json.dumps(docs), capture_output=True, text=True, timeout=600,
    )
    proc_w.check_returncode()
    worker = {d["url"]: d for d in json.loads(proc_w.stdout)}

    # composed production path (App.tsx:123-151): Effect pass (context
    # detection OFF — the App.tsx second-pass config) over the WORKER output
    composed_in = [
        {"url": r["url"], "text": worker[r["url"]]["scrubbed"]} for r in rows
    ]
    proc_c = subprocess.run(
        ["node", os.path.join(HERE, "scrub_harness.mjs"), "--no-context"],
        input=json.dumps(composed_in), capture_output=True, text=True, timeout=600,
    )
    proc_c.check_returncode()
    composed = {d["url"]: d for d in json.loads(proc_c.stdout)}

    goldens = {}
    for r in rows:
        url = r["url"]
        e, w = effect[url], worker[url]
        goldens[url] = {
            "doc_class": r["doc_class"],
            "text_sha": hashlib.sha256(r["text"].encode()).hexdigest(),
            "effect_scrubbed_sha": hashlib.sha256(e["scrubbed"].encode()).hexdigest(),
            "effect_count": e["count"],
            "worker_scrubbed_sha": hashlib.sha256(w["scrubbed"].encode()).hexdigest(),
            "worker_count": w["count"],
            "composed_scrubbed_sha": hashlib.sha256(
                composed[url]["scrubbed"].encode()
            ).hexdigest(),
            # merged map: worker first, Effect overrides (App.tsx spread)
            "composed_count": len(
                {**w["replacements"], **composed[url]["replacements"]}
            ),
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(f"wrote {len(goldens)} goldens -> {OUT}")


if __name__ == "__main__":
    main()
