"""Sentence splitting + greedy chunk packing.

Packing replicates the reference chunker exactly
(``src/core/Extractor/Extractor.py:72-93``): append a sentence while
``len(current) + len(sentence) + 1 <= chunk_size`` (separator ``" "``
only when current is non-empty), else close the chunk; the final partial
chunk is kept; chunks are ``.strip()``-ed at materialization time
(``Extractor.py:101``).  Quirk preserved on purpose: a first sentence
longer than ``chunk_size`` closes the *empty* current chunk, emitting an
empty chunk ahead of it — the reference writes that empty ``chunk_1.txt``
and downstream stages see it.

Sentence splitting: the reference uses ``nltk.sent_tokenize`` (punkt).
This engine's spec is a deterministic regex splitter (split after
``. ! ?`` followed by whitespace) — equivalent on the synthetic corpora
this engine is fixture-tested on, with no model download dependency.
"""

from __future__ import annotations

import re

_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    if not text or not text.strip():
        return []
    return _SENTENCE_SPLIT_RE.split(text)


def pack_chunks(sentences: list[str], chunk_size: int) -> list[str]:
    """Greedy sentence packing (``Extractor.py:72-93``), pre-strip."""
    chunks: list[str] = []
    current = ""
    for sentence in sentences:
        if len(current) + len(sentence) + 1 <= chunk_size:
            current += " " + sentence if current else sentence
        else:
            chunks.append(current)
            current = sentence
    if current:
        chunks.append(current)
    return chunks


def chunk_text(text: str, chunk_size: int) -> list[str]:
    """Full document text → list of stripped chunk strings (1-based ids
    are assigned by the caller, ``Extractor.py:98-101`` semantics)."""
    return [c.strip() for c in pack_chunks(split_sentences(text), chunk_size)]
