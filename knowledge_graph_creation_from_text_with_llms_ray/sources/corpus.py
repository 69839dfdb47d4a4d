"""Deterministic synthetic source-code corpus.

Generates the canonical input table of this engine — per
``BASELINE.json``'s ``input_hint``: ``(repo:string, path:string,
commit:string, lang:string, content:string)`` — fully deterministic from
a fixed seed so fixtures, resume tests, and N-vs-4N scaling runs are
byte-comparable.  Shapes exercised on purpose (FIXTURES.md §1):

* Zipf-ish repo sizes (groupby skew paths),
* hot surface forms repeated across many files (``util_core``) for the
  salted-groupby path,
* empty files, files larger than ``chunk_size``, unicode, and facts
  containing quotes/commas/parens (the two triple grammars disagree on
  those — write grammar drops them, by design parity with
  ``TripleGenerator.py:158-159``).

The reference analogue of a row is one fetched page
(``src/core/Extractor/Extractor.py:108-138``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ("python", "java", "markdown", "text")
_AUTHORS = ("Alice", "Bob", "Chen", "Dmitri", "Eva", "Françoise", "Øyvind", "Sara")
_SALAD = (
    "the spark customer table data line batch stream window value key query row "
    "part column order hash vector agg big small fast slow a"
).split()
_DOC_VERBS = ("join", "merge", "sort", "filter", "scan", "group")

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


def _commit_of(key: str) -> str:
    return hashlib.sha1(key.encode("utf-8")).hexdigest()


def _python_content(rng: np.random.RandomState, module: str) -> str:
    a, b, c = rng.randint(0, 26, 3)
    d = int(rng.zipf(1.5)) % 10  # skewed util index → hot util_0
    author = _AUTHORS[rng.randint(0, len(_AUTHORS))]
    lines = [
        f'"""Class{a} extends Base{b}. Class{a} implements Proto{c}. '
        f'{module} depends on util_{d}."""',
        f"# {module} authored by {author}.",
        "import util_core",
        f"import util_{d}",
        f"class Class{a}(Base{b}):",
        f"    def run_{c}(self):",
        f"        return len(util_{d}.items)",
    ]
    if rng.rand() < 0.05:
        # facts with commas/quotes — exercised against the naive write
        # grammar, which drops them (parity with the reference).
        lines.insert(1, f'# Class{a}, the "core" class, wraps Base{b}.')
    return "\n".join(lines)


def _java_content(rng: np.random.RandomState, module: str) -> str:
    a, b = rng.randint(0, 26, 2)
    author = _AUTHORS[rng.randint(0, len(_AUTHORS))]
    return "\n".join(
        [
            f"/** Class{a} extends Base{b}. {module} authored by {author}. */",
            f"// {module} calls Helper{b}.",
            "import util.core;",
            f"import util.mod{b};",
            f"public class Class{a} extends Base{b} {{}}",
        ]
    )


def _prose_content(rng: np.random.RandomState, n_sentences: int) -> str:
    sents = []
    for _ in range(n_sentences):
        n_words = rng.randint(6, 16)
        words = [_SALAD[i] for i in rng.randint(0, len(_SALAD), n_words)]
        if rng.rand() < 0.8:
            verb = _DOC_VERBS[rng.randint(0, len(_DOC_VERBS))]
            pos = rng.randint(1, max(2, n_words - 1))
            words[pos] = verb
        sents.append(" ".join(words) + ".")
    return " ".join(sents)


def synthesize_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Build the deterministic corpus table (single Arrow table)."""
    rng = np.random.RandomState(seed)
    repo_of_doc = (rng.zipf(1.3, size=n_docs) - 1) % max(1, n_docs // 25 + 1)
    repos, paths, commits, langs, contents = [], [], [], [], []
    per_repo_count: dict[int, int] = {}
    for i in range(n_docs):
        r = int(repo_of_doc[i])
        m = per_repo_count.get(r, 0)
        per_repo_count[r] = m + 1
        lang = LANGS[int(rng.choice([0, 0, 0, 1, 2, 3]))]  # python-heavy
        ext = {"python": "py", "java": "java", "markdown": "md", "text": "txt"}[lang]
        repo = f"org{r % 7}/proj{r}"
        path = f"src/mod_{m % 5}/file_{m}.{ext}"
        module = f"file_{m}"
        roll = rng.rand()
        if roll < 0.01:
            content = ""  # empty file
        elif lang == "python":
            content = _python_content(rng, module)
        elif lang == "java":
            content = _java_content(rng, module)
        else:
            content = _prose_content(rng, int(rng.randint(2, 30)))
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_of(f"{repo}/{path}"))
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents},
        schema=CORPUS_SCHEMA,
    )


def write_corpus(out_dir: str, n_docs: int, seed: int = 42, shards: int = 8) -> list[str]:
    """Write the corpus as ``shards`` parquet files (one per input
    partition — the unit of lineage/resume and of parallel read)."""
    os.makedirs(out_dir, exist_ok=True)
    table = synthesize_corpus(n_docs, seed)
    files = []
    per = (table.num_rows + shards - 1) // shards
    for s in range(shards):
        part = table.slice(s * per, per)
        f = os.path.join(out_dir, f"part-{s:05d}.parquet")
        pq.write_table(part, f)
        files.append(f)
    return files
