"""KenLM-style n-gram perplexity scorer (north-rule quality gate).

A deterministic character-trigram language model with add-one smoothing,
trained once on an embedded English seed corpus. Real deployments would ship
a KenLM binary via spark-submit --files; this implementation keeps the same
operational shape (model built/loaded once per executor as a module-level
singleton, vectorized scoring over Arrow batches via numpy) without external
model files, so tests and the sandbox stay hermetic and reproducible.
"""

from __future__ import annotations

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

_model = None  # dense numpy log-prob table, lazy singleton (once per executor)


def _build_model():
    """Dense vectorized model: byte->vocab-index lookup (256,) and a
    log-probability table (V^3,) of add-one-smoothed trigram probs."""
    import numpy as np

    byte_to_idx = np.full(256, _CHAR_TO_IDX[" "], dtype=np.int32)
    for c, i in _CHAR_TO_IDX.items():
        byte_to_idx[ord(c)] = i
        if c.isalpha():
            byte_to_idx[ord(c.upper())] = i

    seq = np.array([_CHAR_TO_IDX.get(c, _CHAR_TO_IDX[" "]) for c in _SEED], dtype=np.int64)
    bi = np.zeros(_V * _V, dtype=np.int64)
    tri = np.zeros(_V * _V * _V, dtype=np.int64)
    b_idx = seq[:-2] * _V + seq[1:-1]
    t_idx = seq[:-2] * _V * _V + seq[1:-1] * _V + seq[2:]
    np.add.at(bi, b_idx, 1)
    np.add.at(tri, t_idx, 1)
    # log p(t | b) with add-one smoothing, precomputed for every trigram id
    logp = np.log((tri + 1.0) / (np.repeat(bi, _V) + float(_V)))
    return byte_to_idx, logp


def log_perplexity(text: str) -> float:
    """Per-character cross-entropy (nats) under the trigram LM; higher = less
    English-like. Deterministic; add-one smoothed. Empty/short text => high.
    Vectorized: bytes -> index lookup -> one fancy-index into the log table."""
    import numpy as np

    global _model
    if _model is None:
        _model = _build_model()
    byte_to_idx, logp = _model
    data = text.lower().encode("utf-8", errors="replace")
    if len(data) < 3:
        return 10.0
    seq = byte_to_idx[np.frombuffer(data, dtype=np.uint8)]
    t_idx = seq[:-2] * (_V * _V) + seq[1:-1] * _V + seq[2:]
    return float(-logp[t_idx].mean())
