"""Record real-model outputs for the parity fixtures (run OFF-sandbox, in an
environment that has fasttext and/or sentence-transformers installed).

  FASTTEXT_LID_PATH=/models/lid.176.bin python tools/record_model_fixtures.py

Writes tests/fixtures/model_parity_recorded.json:
  {"fasttext": {"model_path", "predictions": {id: [label, confidence]}},
   "minilm":  {"model_name", "dim",
               "pair_cosines": {"similar": [...], "dissimilar": [...]},
               "doc_vectors": {sha16(text): [d0..d7]}}}  # 8-dim prefix

tests/test_model_parity.py asserts EXACT parity against this file whenever
the same model is available; without the file it still asserts the semantic
properties (label correctness, similarity ordering). This sandbox has
neither library, so this script is committed un-run — the recording is a
one-command step for any model-bearing environment."""

from __future__ import annotations

import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

INPUTS = os.path.join(ROOT, "tests", "fixtures", "model_parity_inputs.json")
OUT = os.path.join(ROOT, "tests", "fixtures", "model_parity_recorded.json")

MINILM_NAME = "sentence-transformers/all-MiniLM-L6-v2"


def sha16(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def main():
    with open(INPUTS) as f:
        inputs = json.load(f)
    recorded: dict = {}

    try:
        from scrubah_pii_spark.core.langid import fasttext_langid

        model_path = os.environ.get("FASTTEXT_LID_PATH", "/models/lid.176.bin")
        preds = {}
        for case in inputs["langid"]:
            lang, conf = fasttext_langid(case["text"], model_path)
            preds[case["id"]] = [lang, round(float(conf), 6)]
        recorded["fasttext"] = {"model_path": model_path, "predictions": preds}
        print(f"fasttext: recorded {len(preds)} predictions")
    except (NotImplementedError, ImportError, OSError) as e:
        print(f"fasttext: skipped ({e})")

    try:
        from scrubah_pii_spark.operators.embed_op import embed_document

        emb = inputs["embedding"]

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))  # embed_document L2-normalizes

        pair_cos = {"similar": [], "dissimilar": []}
        vectors = {}
        dim = None
        for kind in ("similar", "dissimilar"):
            for t1, t2 in emb[f"{kind}_pairs"]:
                v1 = embed_document(t1, model_name=MINILM_NAME)
                v2 = embed_document(t2, model_name=MINILM_NAME)
                dim = len(v1)
                pair_cos[kind].append(round(cos(v1, v2), 6))
                vectors[sha16(t1)] = [round(float(x), 6) for x in v1[:8]]
                vectors[sha16(t2)] = [round(float(x), 6) for x in v2[:8]]
        recorded["minilm"] = {
            "model_name": MINILM_NAME, "dim": dim,
            "pair_cosines": pair_cos, "doc_vectors": vectors,
        }
        print(f"minilm: recorded {len(vectors)} vectors, dim={dim}")
    except (NotImplementedError, ImportError, OSError) as e:
        print(f"minilm: skipped ({e})")

    if not recorded:
        print("nothing recorded — no model libraries available"); return 1
    with open(OUT, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
