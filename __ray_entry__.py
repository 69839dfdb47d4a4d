"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``      — flagship KG-construction pipeline on sf0.001.
* ``queries()``    — one entry per implemented operator (SURVEY.md §2 +
                     the training-data extension suite).
* ``oracle_sql()`` — DuckDB equivalents for every SQL-expressible query;
                     embedding/LSH/streaming ops are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from knowledge_graph_creation_from_text_with_llms_ray.pipelines import queries as q
from knowledge_graph_creation_from_text_with_llms_ray.pipelines.kg import (
    KGConfig,
    run_streaming,
)
from knowledge_graph_creation_from_text_with_llms_ray.sources.readers import (
    documents_as_corpus,
)


def entry() -> Any:
    """Flagship pipeline: documents → chunks → triples → linked →
    deduplicated sorted edges, on /root/testdata/sf0.001."""
    docs = documents_as_corpus("/root/testdata/sf0.001")
    edges, _nodes = run_streaming(docs, KGConfig())
    return edges


def queries() -> dict[str, Callable[[str], Any]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
