"""Deterministic text embeddings (char-trigram hashing TF vectors).

Stand-in for the reference's ``SentenceTransformer`` encoder
(``src/core/Integrator/Integrator.py:62``) in a sandbox with no model
downloads: hash each character trigram of the lowercased text into a
D-dim bucket, count, l2-normalize.  Similar surface strings share
trigrams → meaningful cosine structure, fully deterministic across
processes/machines, and batch-encodable with numpy (one matrix per
``map_batches`` call).  The real-model encoder drops in behind the same
``encode_batch`` contract (``stages/link.py``).
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 64


def _trigrams(text: str) -> list[str]:
    t = " " + text.lower().strip() + " "
    if len(t) < 3:
        return [t]
    return [t[i : i + 3] for i in range(len(t) - 2)]


def _bucket(tri: str) -> int:
    return int.from_bytes(hashlib.md5(tri.encode("utf-8")).digest()[:4], "little") % DIM


# Small per-process memo for trigram buckets (pure function of the
# trigram; identical in every worker).
_BUCKET_CACHE: dict[str, int] = {}


def encode(text: str, dim: int = DIM) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float32)
    for tri in _trigrams(text):
        b = _BUCKET_CACHE.get(tri)
        if b is None:
            b = _bucket(tri)
            _BUCKET_CACHE[tri] = b
        vec[b % dim] += 1.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def encode_batch(texts, dim: int = DIM) -> np.ndarray:
    """Encode a batch of strings → float32[len(texts), dim], rows
    l2-normalized."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = encode(t, dim)
    return out
