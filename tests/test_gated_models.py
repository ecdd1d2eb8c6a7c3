"""Smoke tests for the gated real-model branches (sentence-transformers
encoder, fastText langid). The sandbox has neither library; these tests
inject minimal fakes into sys.modules to prove the gated code path —
singleton construction, encode/predict call shape, pooling math — actually
runs, and that the ungated path raises the documented NotImplementedError."""

from __future__ import annotations

import math
import sys
import types

import pytest


class _FakeSTModel:
    def __init__(self, name):
        self.name = name
        self.calls = []

    def encode(self, chunks):
        import numpy as np

        self.calls.append(list(chunks))
        # deterministic 4-dim "embedding" per chunk
        return np.array([[float(len(c) % 7), 1.0, 0.0, 2.0] for c in chunks])


class TestSentenceTransformersGate:
    def test_gated_branch_constructs_singleton_and_pools(self, monkeypatch):
        import scrubah_pii_spark.operators.embed_op as eo

        fake_mod = types.ModuleType("sentence_transformers")
        fake_mod.SentenceTransformer = _FakeSTModel
        monkeypatch.setitem(sys.modules, "sentence_transformers", fake_mod)
        monkeypatch.setattr(eo, "_ST_MODEL", None)

        text = "x" * 1000  # 3 chunks at size 512 / overlap 50
        vec = eo.embed_document(text, model_name="fake-minilm")
        assert eo._ST_MODEL is not None and eo._ST_MODEL.name == "fake-minilm"
        assert len(eo._ST_MODEL.calls) == 1 and len(eo._ST_MODEL.calls[0]) == 3
        assert len(vec) == 4
        norm = math.sqrt(sum(v * v for v in vec))
        assert abs(norm - 1.0) < 1e-9  # L2-normalized pooled vector

        # singleton: a second call must not rebuild the model
        first = eo._ST_MODEL
        eo.embed_document("more text", model_name="fake-minilm")
        assert eo._ST_MODEL is first

    def test_missing_library_raises_documented_error(self, monkeypatch):
        import scrubah_pii_spark.operators.embed_op as eo

        monkeypatch.setattr(eo, "_ST_MODEL", None)
        monkeypatch.setitem(sys.modules, "sentence_transformers", None)
        with pytest.raises((NotImplementedError, ImportError)):
            eo.embed_document("hello world", model_name="real-model")


class TestFasttextGate:
    def test_gated_branch_predicts_via_singleton(self, monkeypatch):
        import scrubah_pii_spark.core.langid as lid

        class _FakeFT:
            def predict(self, text):
                return (["__label__en"], [0.93])

        fake_mod = types.ModuleType("fasttext")
        fake_mod.load_model = lambda path: _FakeFT()
        monkeypatch.setitem(sys.modules, "fasttext", fake_mod)
        monkeypatch.setattr(lid, "_FASTTEXT_MODEL", None, raising=False)

        lang, conf = lid.fasttext_langid("hello there", "/models/lid.176.bin")
        assert lang == "en" and conf == pytest.approx(0.93)

    def test_missing_library_raises_documented_error(self, monkeypatch):
        import scrubah_pii_spark.core.langid as lid

        monkeypatch.setattr(lid, "_FASTTEXT_MODEL", None, raising=False)
        monkeypatch.setitem(sys.modules, "fasttext", None)
        with pytest.raises((NotImplementedError, ImportError)):
            lid.fasttext_langid("hello", "/models/lid.176.bin")
