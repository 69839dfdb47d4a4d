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

class _ParagraphExtractor:
    """Streaming HTML → paragraph texts on stdlib ``html.parser`` (a
    real, error-tolerant HTML tokenizer — handles unclosed tags, nested
    tables, implicit ``<p>`` closes and character entities, which the
    round-1 review flagged as the regex parser's failure modes).

    Mirrors the reference's BeautifulSoup pass (``Extractor.py:52-70``):
    decompose every ``<table>`` subtree and every
    ``<sup class="…reference…">`` subtree, then collect the text of
    every ``<p>`` element."""

    def __init__(self) -> None:
        from html.parser import HTMLParser

        outer = self

        class _P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                outer._start(tag, attrs)

            def handle_endtag(self, tag):
                outer._end(tag)

            def handle_data(self, data):
                outer._data(data)

        self._parser = _P(convert_charrefs=True)
        self.table_depth = 0
        self.supref_depth = 0
        self.in_p = False
        self._sup_stack: list[bool] = []
        self._cur: list[str] = []
        self.paras: list[str] = []

    def _flush(self) -> None:
        if self.in_p:
            text = "".join(self._cur).strip()
            if text:
                self.paras.append(text)
        self._cur = []
        self.in_p = False

    def _start(self, tag: str, attrs) -> None:
        if tag == "table":
            self.table_depth += 1
        elif tag == "sup":
            classes = dict(attrs).get("class") or ""
            is_ref = "reference" in classes
            self._sup_stack.append(is_ref)
            if is_ref:
                self.supref_depth += 1
        elif tag == "p" and not self.table_depth:
            self._flush()  # implicit close: <p> cannot nest (HTML spec)
            self.in_p = True

    def _end(self, tag: str) -> None:
        if tag == "table":
            self.table_depth = max(0, self.table_depth - 1)
        elif tag == "sup":
            if self._sup_stack and self._sup_stack.pop():
                self.supref_depth = max(0, self.supref_depth - 1)
        elif tag == "p":
            self._flush()

    def _data(self, data: str) -> None:
        if self.in_p and not self.table_depth and not self.supref_depth:
            self._cur.append(data)

    def run(self, content: str) -> list[str]:
        self._parser.feed(content)
        self._parser.close()
        self._flush()  # unclosed trailing <p>
        return self.paras


def html_to_text(content: str) -> str:
    """The reference's HTML cleaning + paragraph projection
    (``Extractor.py:52-70``: decompose all ``<table>`` and
    ``<sup class="reference">``; ``:127``: join of ``<p>`` texts) on a
    tolerant stdlib HTML parse — robust to malformed markup."""
    return " ".join(_ParagraphExtractor().run(content))


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
