"""Text-analysis kernels: token counting, quality scoring, language ID.

Vectorized where the kernel allows (pyarrow.compute for counts/lengths);
per-row Python only for the n-gram language profiles.  These back the
``text_*`` operators of the engine (training-data-pipeline extensions;
SURVEY.md §2 extension set).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BPE_ISH_RE = re.compile(r"\w+|[^\w\s]")

# Tiny built-in stopword profiles for the n-gram/stopword language-ID
# heuristic (no external models).
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it for on with as are".split()),
    "de": frozenset("der die das und zu den von ist mit sich des auf nicht".split()),
    "fr": frozenset("le la les de des et un une est dans que pour sur".split()),
    "es": frozenset("el la los las de y que en un una es del por con".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")


def whitespace_token_count(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count, computed with Arrow kernels (zero Python
    loop): count of whitespace runs in the trimmed string + 1, 0 for
    empty."""
    trimmed = pc.utf8_trim_whitespace(texts)
    n_ws = pc.count_substring_regex(trimmed, r"\s+")
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int64()), pc.add(n_ws, 1)).cast(pa.int64())


def bpe_ish_token_count(text: str) -> int:
    """Word/punctuation regex tokenizer count (BPE-ish upper bound)."""
    return len(_BPE_ISH_RE.findall(text))


def punct_ratio(texts) -> pa.Array:
    n_punct = pc.count_substring_regex(texts, r"[^\w\s]")
    n_chars = pc.utf8_length(texts)
    return pc.if_else(
        pc.equal(n_chars, 0),
        pa.scalar(0.0, pa.float64()),
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(n_chars, pa.float64())),
    )


def quality_score(n_tokens: np.ndarray, n_chars: np.ndarray, punct: np.ndarray) -> np.ndarray:
    """Heuristic document quality in [0, 1]: length sweet spot minus
    punctuation-noise penalty (deterministic, vectorized)."""
    length_score = np.clip(n_tokens / 50.0, 0.0, 1.0) * np.clip(2000.0 / np.maximum(n_chars, 1), 0.0, 1.0).clip(0.2, 1.0)
    noise_penalty = np.clip(punct * 2.0, 0.0, 0.5)
    return np.clip(length_score - noise_penalty, 0.0, 1.0)


def detect_language(text: str) -> tuple[str, float]:
    """Stopword/CJK-ratio language ID → (lang, confidence)."""
    if not text:
        return "unknown", 0.0
    cjk = len(_CJK_RE.findall(text))
    if cjk / max(len(text), 1) > 0.1:
        return "zh", min(1.0, cjk / max(len(text), 1) * 5)
    tokens = [t.lower() for t in text.split()]
    if not tokens:
        return "unknown", 0.0
    best_lang, best_hits = "unknown", 0
    for lang, stops in _LANG_PROFILES.items():
        hits = sum(1 for t in tokens if t in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits / len(tokens)
