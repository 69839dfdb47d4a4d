"""The two triple line grammars of the reference, replicated exactly.

The reference uses two asymmetric grammars (SURVEY.md §2.4 T3):

* the *write* grammar — free-form LLM response lines parsed with a naive
  ``split(", ")`` and re-serialized as ``("s", "p", "o");`` (reference
  ``src/core/Generator/TripleGenerator.py:148-164``);
* the *read* grammar — quote-aware comma split used when triples files
  are read back (reference ``src/core/Integrator/Integrator.py:156-218``
  and ``tests/test_modules/metrics_generator.py:21-66``).

Both are pinned by fixture round-trip tests against the reference's own
committed response/triples files; changing either breaks P/R parity.
"""

from __future__ import annotations

import re

_LIST_NUMBERING = "0123456789. "


def parse_response_lines(response: str) -> list[tuple[str, str, str]]:
    """Write-grammar parse of one raw model response.

    Per line: strip list numbering, strip outer parens, naive
    ``split(", ")`` (NOT quote-aware), keep only 3-part lines.  Parts are
    returned verbatim (surrounding quotes from the response retained),
    exactly as the reference serializes them
    (``TripleGenerator.py:154-161``).
    """
    out: list[tuple[str, str, str]] = []
    for line in response.strip().split("\n"):
        line = line.lstrip(_LIST_NUMBERING)
        parts = line.strip("()").split(", ")
        if len(parts) == 3:
            out.append((parts[0].strip(), parts[1].strip(), parts[2].strip()))
    return out


def format_triple_line(s: str, p: str, o: str) -> str:
    """Serialize one triple in the reference's file format
    (``TripleGenerator.py:160``)."""
    return f'("{s}", "{p}", "{o}");'


def parse_triple_line(line: str) -> tuple[str, str, str] | None:
    """Read-grammar parse of one serialized triple line.

    Skip blank/comment lines, drop a trailing ``;``, strip outer parens,
    quote-aware comma split (quote chars toggle state but are kept in the
    part and stripped at the end), keep only 3-part lines
    (``Integrator.py:169-208``).  Returns ``None`` for skipped or
    malformed lines.
    """
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    if line.endswith(";"):
        line = line[:-1]
    line = line.strip("()")

    parts: list[str] = []
    current: list[str] = []
    in_quotes = False
    for char in line:
        if char == '"':
            in_quotes = not in_quotes
        elif char == "," and not in_quotes:
            parts.append("".join(current).strip())
            current = []
            continue
        current.append(char)
    if current:
        parts.append("".join(current).strip())

    parts = [p.strip().strip('"') for p in parts]
    if len(parts) == 3:
        return (parts[0], parts[1], parts[2])
    return None


def parse_triples_text(text: str) -> list[tuple[str, str, str]]:
    """Read-grammar parse of a whole triples file body."""
    out = []
    for line in text.splitlines():
        t = parse_triple_line(line)
        if t is not None:
            out.append(t)
    return out


def extract_triples_from_response(response: str) -> list[tuple[str, str, str]]:
    """Full response → clean triples: write-grammar parse, serialize,
    read-grammar parse.  Equivalent to the reference's file round-trip
    (generator writes ``*_triples.txt``, integrator reads it back) but
    with no filesystem in between.

    Fast path: for parts containing no quote and no comma, the
    serialize→parse round trip provably reduces to the identity (the
    formatted line splits exactly at the three quoted boundaries and
    the boundary quotes strip back off) — the full parser runs only for
    parts that can interact with the quote-aware splitter.
    """
    out = []
    for s, p, o in parse_response_lines(response):
        if (
            '"' not in s and "," not in s
            and '"' not in p and "," not in p
            and '"' not in o and "," not in o
        ):
            out.append((s, p, o))
            continue
        t = parse_triple_line(format_triple_line(s, p, o))
        if t is not None:
            out.append(t)
    return out


_NORMALIZE_RE = re.compile(r"[^\w\s]")


def normalize_text(text: str) -> str:
    """Canonicalization key used for surface-form grouping and relaxed
    evaluation (reference ``tests/test_modules/metrics.py:28-31``)."""
    return _NORMALIZE_RE.sub("", text.lower().strip())
