"""Deterministic rule-based triple extraction (the test/bench model).

Mirrors the contract of the reference's LLM generation step
(``src/core/Generator/TripleGenerator.py:117-146``): given a chunk of
text, produce a free-text *response* containing numbered
``i. (s, p, o)`` lines, which then flows through the write-grammar
parser (``functions/grammar.py``) exactly as a real model response
would.  Determinism is what makes the P/R≥0.95 fixture gate meaningful
(SURVEY.md §7.4); the HF-model extractor shares the same interface
(``stages/extract.py``).

Two rule sets, dispatched on ``lang``:

* ``CODE_RULES`` for source-code prose (docstrings / comments /
  import pseudo-sentences) — verb phrases like ``extends``,
  ``implements``, ``imports``, ``depends on``, ``authored by``;
* ``DOC_RULES`` for natural-language documents — ``<word> <verb>
  <word>`` patterns.  These are intentionally RE2-compatible so the
  DuckDB oracle can replicate the extraction with
  ``regexp_extract_all`` (leftmost, non-overlapping in both engines).
"""

from __future__ import annotations

import re

from .textprep import CODE_LANGS

_IDENT = r"(\w+(?:\.\w+)*)"

CODE_VERBS = (
    "extends",
    "implements",
    "imports",
    "depends on",
    "calls",
    "authored by",
    "is a",
)
# Single-pass alternation: one scan instead of one per verb (matches in
# text order; verbs are distinct literals so alternation order cannot
# change what matches at a position).
CODE_RULE_RE = re.compile(
    _IDENT + r" (" + "|".join(CODE_VERBS) + r") " + _IDENT
)

DOC_VERBS = ("join", "merge", "sort", "filter", "scan", "group")
DOC_RULE_RE = re.compile(r"([a-z]+) (" + "|".join(DOC_VERBS) + r") ([a-z]+)")


def extract_code_triples(text: str) -> list[tuple[str, str, str]]:
    return [
        (m.group(1), m.group(2), m.group(3)) for m in CODE_RULE_RE.finditer(text)
    ]


def extract_doc_triples(text: str) -> list[tuple[str, str, str]]:
    return [(m.group(1), m.group(2), m.group(3)) for m in DOC_RULE_RE.finditer(text)]


def extract_triples(text: str, lang: str) -> list[tuple[str, str, str]]:
    if lang in CODE_LANGS:
        return extract_code_triples(text)
    return extract_doc_triples(text)


def render_response(triples: list[tuple[str, str, str]]) -> str:
    """Render triples the way an instruction-following LLM would answer
    the reference's prompt (numbered ``(s, p, o)`` lines — cf. the
    expected output format in ``TripleGenerator.py:347-355``)."""
    return "\n".join(f"{i}. ({s}, {p}, {o})" for i, (s, p, o) in enumerate(triples, 1))
