"""Language-aware content cleaning: source file → prose text.

Counterpart of the reference's HTML cleaning + paragraph projection
(``src/core/Extractor/Extractor.py:52-70,127`` — drop non-text payload,
keep the prose).  For a source-code corpus the "prose" of a file is its
docstrings and comments, plus pseudo-sentences derived from import
statements so that structural facts survive into the text→triples flow;
for markdown/plain text the content is the prose.

Everything here is a pure function of ``(content, lang, module_name)``;
stages apply it inside ``map_batches`` as stateless tasks.
"""

from __future__ import annotations

import re

CODE_LANGS = frozenset({"python", "java"})

_PY_DOCSTRING_RE = re.compile(r'"""(.*?)"""|\'\'\'(.*?)\'\'\'', re.S)
_PY_COMMENT_RE = re.compile(r"(?m)^[ \t]*#[ \t]?(.*)$")
_PY_IMPORT_RE = re.compile(r"(?m)^[ \t]*import[ \t]+(\w+(?:\.\w+)*)")
_PY_FROM_IMPORT_RE = re.compile(r"(?m)^[ \t]*from[ \t]+(\w+(?:\.\w+)*)[ \t]+import")

_JAVA_BLOCK_COMMENT_RE = re.compile(r"/\*+(.*?)\*/", re.S)
_JAVA_LINE_COMMENT_RE = re.compile(r"(?m)^[ \t]*//[ \t]?(.*)$")
_JAVA_IMPORT_RE = re.compile(r"(?m)^[ \t]*import[ \t]+(\w+(?:\.\w+)*)[ \t]*;")

_WS_RE = re.compile(r"[ \t]+")

_HTML_TABLE_RE = re.compile(r"<table\b.*?</table\s*>", re.S | re.I)
_HTML_SUP_REF_RE = re.compile(
    r"<sup\b[^>]*class=(?:\"[^\"]*reference[^\"]*\"|'[^']*reference[^']*')[^>]*>.*?</sup\s*>",
    re.S | re.I,
)
_HTML_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.S | re.I)
_HTML_TAG_RE = re.compile(r"<[^>]+>")


def html_to_text(content: str) -> str:
    """The reference's HTML cleaning + paragraph projection
    (``Extractor.py:52-70``: decompose all ``<table>`` and
    ``<sup class="reference">``; ``:127``: join of ``<p>`` texts),
    regex-based (no bs4 dependency) for well-formed markup."""
    cleaned = _HTML_TABLE_RE.sub("", content)
    cleaned = _HTML_SUP_REF_RE.sub("", cleaned)
    paras = [_HTML_TAG_RE.sub("", p) for p in _HTML_P_RE.findall(cleaned)]
    return " ".join(paras)


def module_name_from_path(path: str) -> str:
    """``src/mod_3/file_7.py`` → ``file_7`` (the document's own symbol)."""
    base = path.rsplit("/", 1)[-1]
    dot = base.rfind(".")
    return base[:dot] if dot > 0 else base


def _clean_join(parts: list[str]) -> str:
    return " ".join(p.strip() for p in parts if p and p.strip())


def content_to_text(content: str, lang: str, module: str) -> str:
    """Project a file's content to prose text for chunking/extraction."""
    if lang == "python":
        doc = [a or b for a, b in _PY_DOCSTRING_RE.findall(content)]
        comments = _PY_COMMENT_RE.findall(content)
        imports = _PY_IMPORT_RE.findall(content) + _PY_FROM_IMPORT_RE.findall(content)
        import_sents = [f"{module} imports {m}." for m in imports]
        text = _clean_join(doc + comments + import_sents)
    elif lang == "java":
        doc = _JAVA_BLOCK_COMMENT_RE.findall(content)
        doc = [re.sub(r"(?m)^\s*\*\s?", "", d) for d in doc]
        comments = _JAVA_LINE_COMMENT_RE.findall(content)
        imports = _JAVA_IMPORT_RE.findall(content)
        import_sents = [f"{module} imports {m}." for m in imports]
        text = _clean_join(doc + comments + import_sents)
    elif lang == "html":
        text = html_to_text(content)
    else:  # markdown / text / natural-language docs: content is the prose
        text = content
    return _WS_RE.sub(" ", text.replace("\n", " ")).strip()
