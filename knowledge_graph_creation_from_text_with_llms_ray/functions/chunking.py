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
This engine's spec is a deterministic rule splitter: a ``. ! ?`` run
followed by whitespace ends a sentence UNLESS the preceding token is a
known abbreviation (``Dr.``, ``e.g.``, month names, …), a single-letter
initial (``J. Smith``) or a dotted acronym (``U.S.``) — the punkt
behaviors the round-1 review flagged as divergent on real prose.
Decimals (``3.14``) never split because the period is not followed by
whitespace.  No model download dependency; byte-stable.
"""

from __future__ import annotations

import re

_BOUNDARY_RE = re.compile(r"[.!?]+(\s+)")

# punkt's most common English sentence-internal abbreviations (compared
# lowercase, terminal punctuation stripped; multi-dot forms keep their
# internal dots: "e.g." → base "e.g").
_ABBREVS = frozenset(
    """dr mr mrs ms prof sr jr st no vs etc fig al inc ltd co corp dept
    est approx ca vol pp sec min max jan feb mar apr jun jul aug sep
    sept oct nov dec mon tue wed thu fri sat sun e.g i.e cf u.s u.k
    a.m p.m ph.d""".split()
)

_ACRONYM_RE = re.compile(r"(?:[A-Za-z]\.)+[A-Za-z]")


def _splits_here(text: str, start: int, punct_start: int) -> bool:
    """Decide whether the boundary candidate (punctuation starting at
    ``punct_start``, sentence starting at ``start``) really ends a
    sentence.  Index-based: three C-level ``rfind`` calls recover the
    preceding token without splitting the whole sentence (this runs
    once per candidate on the hot chunking path)."""
    ws = max(
        text.rfind(" ", start, punct_start),
        text.rfind("\n", start, punct_start),
        text.rfind("\t", start, punct_start),
        start - 1,
    )
    base = text[ws + 1 : punct_start]  # punctuation run excluded
    if base[:1] in "\"'([{":
        base = base.lstrip("\"'([{")
    if not base:
        return True
    if base.lower() in _ABBREVS:
        return False
    if len(base) == 1 and base.isupper():  # capital initial: "J. Smith"
        return False
    if "." in base and _ACRONYM_RE.fullmatch(base):  # "U.S."
        return False
    return True


def split_sentences(text: str) -> list[str]:
    if not text or not text.strip():
        return []
    out: list[str] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        punct_end = m.start(1)
        punct_start = m.start()
        if text[punct_start:punct_end] == "." and not _splits_here(
            text, start, punct_start
        ):
            continue
        out.append(text[start:punct_end])
        start = m.end()
    if start < len(text):
        out.append(text[start:])
    return out


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
