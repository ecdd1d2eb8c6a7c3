"""Real-model parity tests (round-3 verdict #6). Skipped unless the real
libraries are installed; this sandbox has neither, so these document the
contract a model-bearing environment must meet:

- semantic assertions always run with the real model: fastText lid.176 must
  label the fixture texts with their known languages; MiniLM must rank
  paraphrase pairs above unrelated pairs and return unit-norm vectors.
- EXACT parity runs additionally when tests/fixtures/model_parity_recorded.json
  exists (generated once via tools/record_model_fixtures.py in any
  model-bearing environment): predictions/confidences and embedding prefixes
  must match the recording bit-for-bit (1e-6), catching silent model or
  pre/post-processing drift."""

from __future__ import annotations

import hashlib
import importlib.util
import json
import math
import os

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
MINILM_NAME = "sentence-transformers/all-MiniLM-L6-v2"
FASTTEXT_PATH = os.environ.get("FASTTEXT_LID_PATH", "/models/lid.176.bin")

with open(os.path.join(FIXDIR, "model_parity_inputs.json")) as _f:
    INPUTS = json.load(_f)

RECORDED_PATH = os.path.join(FIXDIR, "model_parity_recorded.json")
RECORDED = None
if os.path.exists(RECORDED_PATH):
    with open(RECORDED_PATH) as _f:
        RECORDED = json.load(_f)


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def sha16(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


@pytest.mark.skipif(
    not (_has("fasttext") and os.path.exists(FASTTEXT_PATH)),
    reason="fasttext / lid.176.bin not available in this environment",
)
class TestFasttextParity:
    def test_fixture_languages_predicted(self):
        from scrubah_pii_spark.core.langid import fasttext_langid

        for case in INPUTS["langid"]:
            lang, conf = fasttext_langid(case["text"], FASTTEXT_PATH)
            assert lang == case["lang"], f"{case['id']}: got {lang}"
            assert conf > 0.5

    def test_exact_parity_with_recording(self):
        if not (RECORDED and "fasttext" in RECORDED):
            pytest.skip("no recording (run tools/record_model_fixtures.py)")
        from scrubah_pii_spark.core.langid import fasttext_langid

        for case in INPUTS["langid"]:
            want_lang, want_conf = RECORDED["fasttext"]["predictions"][case["id"]]
            lang, conf = fasttext_langid(case["text"], FASTTEXT_PATH)
            assert lang == want_lang
            assert abs(conf - want_conf) < 1e-6


@pytest.mark.skipif(
    not _has("sentence_transformers"),
    reason="sentence-transformers not available in this environment",
)
class TestMiniLMParity:
    def _cos(self, a, b):
        return sum(x * y for x, y in zip(a, b))

    def test_unit_norm_and_similarity_ordering(self):
        from scrubah_pii_spark.operators.embed_op import embed_document

        emb = INPUTS["embedding"]
        sims, dissims = [], []
        for t1, t2 in emb["similar_pairs"]:
            v1 = embed_document(t1, model_name=MINILM_NAME)
            v2 = embed_document(t2, model_name=MINILM_NAME)
            assert abs(math.sqrt(self._cos(v1, v1)) - 1.0) < 1e-6
            sims.append(self._cos(v1, v2))
        for t1, t2 in emb["dissimilar_pairs"]:
            v1 = embed_document(t1, model_name=MINILM_NAME)
            v2 = embed_document(t2, model_name=MINILM_NAME)
            dissims.append(self._cos(v1, v2))
        assert min(sims) > max(dissims), (sims, dissims)
        assert min(sims) > 0.6
        assert max(dissims) < 0.5

    def test_exact_parity_with_recording(self):
        if not (RECORDED and "minilm" in RECORDED):
            pytest.skip("no recording (run tools/record_model_fixtures.py)")
        from scrubah_pii_spark.operators.embed_op import embed_document

        rec = RECORDED["minilm"]
        emb = INPUTS["embedding"]
        texts = {t for pair_set in ("similar_pairs", "dissimilar_pairs")
                 for pair in emb[pair_set] for t in pair}
        for t in texts:
            v = embed_document(t, model_name=rec["model_name"])
            assert len(v) == rec["dim"]
            want = rec["doc_vectors"][sha16(t)]
            for got, exp in zip(v[:8], want):
                assert abs(got - exp) < 1e-6


def test_fixture_inputs_are_wellformed():
    """Runs everywhere (no model needed): the committed inputs stay valid."""
    ids = [c["id"] for c in INPUTS["langid"]]
    assert len(ids) == len(set(ids))
    assert {c["lang"] for c in INPUTS["langid"]} >= {"en", "de", "fr", "es"}
    assert len(INPUTS["embedding"]["similar_pairs"]) >= 2
    assert len(INPUTS["embedding"]["dissimilar_pairs"]) >= 2
