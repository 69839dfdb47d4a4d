"""The frozen alias dictionary — the broadcast small side of linking.

Replaces the reference's live Wikidata lookups + per-process memo caches
(``src/core/Integrator/Matcher.py:44-172``, caches at ``:37-38``) and its
property-embedding dictionary
(``src/core/Integrator/WikidataEmbeddingGenerator.py:31-234``) with one
frozen artifact: an Arrow table

    (id, kind, label, alias, rank, embedding)

one row per (id, alias); ``alias == label`` rows carry ``rank = 0``.
Candidate priority for a surface form replicates the reference's
exact-label > alias > first-result preference (``Matcher.py:72-92``) as
the deterministic key ``(is_label desc, rank, id)`` — associative, so
safe under salted/partial aggregation (SURVEY.md §7.4).

At pipeline start the table is ``ray.put`` once and every linker actor
reads it from the object store (broadcast, never re-shipped per batch).
Ids are fixture-synthetic (Q/P-shaped, not real Wikidata).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.embedding import DIM, encode_batch

DICT_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("kind", pa.string()),
        ("label", pa.string()),
        ("alias", pa.string()),
        ("rank", pa.int32()),
        ("embedding", pa.list_(pa.float32(), DIM)),
    ]
)

_SALAD_ENTITIES = (
    "spark customer table data line batch stream window value key query row part column".split()
)


def _entries() -> list[tuple[str, str, str, list[str]]]:
    """(id, kind, label, aliases)"""
    out: list[tuple[str, str, str, list[str]]] = []
    for i in range(26):
        out.append((f"Q{100 + i}", "entity", f"Class{i}", []))
        out.append((f"Q{200 + i}", "entity", f"Base{i}", []))
        out.append((f"Q{300 + i}", "entity", f"Proto{i}", []))
    for i in range(10):
        out.append((f"Q{400 + i}", "entity", f"util_{i}", []))
    out.append(("Q450", "entity", "util_core", ["util core", "core utilities"]))
    for i, name in enumerate(
        ("Alice", "Bob", "Chen", "Dmitri", "Eva", "Françoise", "Øyvind", "Sara")
    ):
        out.append((f"Q{500 + i}", "entity", name, []))
    for i, w in enumerate(_SALAD_ENTITIES):
        out.append((f"Q{600 + i}", "entity", w, []))
    # Case-insensitive collision probe: alias "table" on another entity —
    # the label row of Q602 ("table") must win over this alias row.
    out.append(("Q777", "entity", "DataTable", ["table", "data table"]))
    out.append(
        (
            "P279",
            "property",
            "extends",
            ["inherits from", "subclasses", "is subclass of"],
        )
    )
    out.append(("P31", "property", "is a", ["instance of", "is an"]))
    out.append(("P50", "property", "authored by", ["written by", "author"]))
    out.append(("P2", "property", "imports", ["uses module"]))
    out.append(("P3", "property", "depends on", ["depends upon", "requires"]))
    out.append(("P4", "property", "implements", ["realizes"]))
    out.append(("P5", "property", "calls", ["invokes"]))
    for i, verb in enumerate(("join", "merge", "sort", "filter", "scan", "group")):
        out.append((f"P{10 + i}", "property", verb, [verb + "s", verb + "ed"]))
    return out


@lru_cache(maxsize=1)
def build_fixture_dict() -> pa.Table:
    ids, kinds, labels, aliases, ranks = [], [], [], [], []
    for id_, kind, label, alias_list in _entries():
        for rank, alias in enumerate([label] + alias_list):
            ids.append(id_)
            kinds.append(kind)
            labels.append(label)
            aliases.append(alias)
            ranks.append(rank)
    emb = encode_batch(aliases)
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "label": pa.array(labels, pa.string()),
            "alias": pa.array(aliases, pa.string()),
            "rank": pa.array(ranks, pa.int32()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float32()), DIM
            ),
        }
    )


def write_dict(path: str, table: pa.Table | None = None) -> None:
    """Persist the dictionary artifact (the S8/S9 offline build step)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table or build_fixture_dict(), path)


def load_dict(path: str, use_aliases: bool = True) -> pa.Table:
    """Load the artifact; ``use_aliases=False`` projects the simple
    (label-rows-only) shape — the reference's two dictionary formats
    (``WikidataEmbeddingGenerator.py:184-234``)."""
    t = pq.read_table(path)
    if not use_aliases:
        t = t.filter(pa.compute.equal(t["rank"], 0))
    return t


def build_dict_from_rows(rows: "ray.data.Dataset") -> pa.Table:
    """Build the dictionary artifact from a Dataset of raw
    ``(id, kind, label, alias)`` rows — the reference's SPARQL-result
    grouping re-expressed as a Ray groupby
    (``WikidataEmbeddingGenerator.py:115-131``: group rows by property
    id, aggregating the alias set).

    Rank assignment replicates the reference's ordering: the label row
    gets rank 0, aliases 1..n in first-seen order.  Embeddings are
    computed per alias with the deterministic encoder.
    """
    import ray.data  # noqa: F401  (typing only)

    def _assemble(group: pa.Table) -> pa.Table:
        # shuffle order is arbitrary — restore source order via the
        # optional ``ord`` column, else sort aliases for determinism
        if "ord" in group.column_names:
            group = group.take(pa.compute.sort_indices(group["ord"]))
        else:
            group = group.take(pa.compute.sort_indices(group["alias"]))
        id_ = group["id"][0].as_py()
        kind = group["kind"][0].as_py()
        label = group["label"][0].as_py()
        seen, ordered = set(), [label]
        seen.add(label)
        for a in group["alias"].to_pylist():
            if a not in seen:
                seen.add(a)
                ordered.append(a)
        emb = encode_batch(ordered)
        return pa.table(
            {
                "id": pa.array([id_] * len(ordered), pa.string()),
                "kind": pa.array([kind] * len(ordered), pa.string()),
                "label": pa.array([label] * len(ordered), pa.string()),
                "alias": pa.array(ordered, pa.string()),
                "rank": pa.array(range(len(ordered)), pa.int32()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), pa.float32()), DIM
                ),
            }
        )

    parts = rows.groupby("id").map_groups(_assemble, batch_format="pyarrow")
    refs = parts.to_arrow_refs()  # small artifact; Arrow end-to-end
    import ray as _ray

    tables = [t for t in _ray.get(refs) if t.num_rows > 0]
    if not tables:
        return DICT_SCHEMA.empty_table()
    table = pa.concat_tables(tables)
    return table.sort_by([("id", "ascending"), ("rank", "ascending")])


def sql_values_cte(table: pa.Table | None = None) -> str:
    """Render the dictionary as a SQL VALUES list — the oracle side of
    the correctness gate embeds the SAME rows the pipeline broadcasts,
    so linking is verified end-to-end against DuckDB."""
    t = table or build_fixture_dict()
    rows = []
    for id_, kind, label, alias, rank in zip(
        t["id"].to_pylist(),
        t["kind"].to_pylist(),
        t["label"].to_pylist(),
        t["alias"].to_pylist(),
        t["rank"].to_pylist(),
    ):
        esc = lambda s: s.replace("'", "''")
        rows.append(
            f"('{esc(id_)}', '{esc(kind)}', '{esc(label)}', '{esc(alias)}', {rank})"
        )
    return ",\n    ".join(rows)


class ResolvedDict:
    """Precomputed lookup structures built once per linker actor from
    the broadcast table: surface key → winning id, plus embedding
    matrices for the cosine path."""

    def __init__(self, table: pa.Table, use_aliases: bool = True):
        if not use_aliases:
            table = table.filter(pa.compute.equal(table["rank"], 0))
        ids = table["id"].to_pylist()
        kinds = table["kind"].to_pylist()
        labels = table["label"].to_pylist()
        aliases = table["alias"].to_pylist()
        ranks = table["rank"].to_pylist()

        best: dict[tuple[str, str], tuple[int, int, str, str]] = {}
        for id_, kind, label, alias, rank in zip(ids, kinds, labels, aliases, ranks):
            key = (kind, alias.lower())
            prio = (0 if alias == label else 1, rank, id_)
            cur = best.get(key)
            if cur is None or prio < cur[:3]:
                best[key] = (*prio, id_)
        self._best = {k: v[3] for k, v in best.items()}

        # Property embedding matrix for the cos_similarity / mixed paths
        # (label + alias rows; segment-max per property id, J3/J4).
        prop_mask = [k == "property" for k in kinds]
        self.prop_ids = [i for i, m in zip(ids, prop_mask) if m]
        self.prop_labels = [l for l, m in zip(labels, prop_mask) if m]
        self.prop_aliases = [a for a, m in zip(aliases, prop_mask) if m]
        emb = np.asarray(table["embedding"].combine_chunks().flatten(), dtype=np.float32)
        emb = emb.reshape(len(ids), -1)
        self.prop_emb = emb[np.asarray(prop_mask, dtype=bool)]
        # Dictionary position per property id — tie-break replicating the
        # reference's stable sort over dict insertion order (O3).
        self.prop_pos: dict[str, int] = {}
        for j, pid in enumerate(self.prop_ids):
            self.prop_pos.setdefault(pid, j)

    def resolve(self, kind: str, surface: str) -> str | None:
        """Exact (case-insensitive) label/alias resolution with the
        reference's preference order; None if absent (→ ``not_found``)."""
        return self._best.get((kind, surface.lower()))

    def top_k_properties(self, query_vecs: np.ndarray, k: int = 10):
        """Batched cosine top-k over the property embedding rows
        (one matmul per batch; J3/J4 re-expressed).  Returns per query a
        list of (property_id, matched_text, similarity), segment-maxed
        per property, stably sorted by (-sim, dict position)."""
        sims = query_vecs @ self.prop_emb.T  # rows are l2-normalized
        results = []
        for row in sims:
            per_prop: dict[str, tuple[float, int]] = {}
            for j, pid in enumerate(self.prop_ids):
                cur = per_prop.get(pid)
                if cur is None or row[j] > cur[0]:
                    per_prop[pid] = (float(row[j]), j)
            ordered = sorted(
                per_prop.items(), key=lambda kv: (-kv[1][0], self.prop_pos[kv[0]])
            )[:k]
            results.append(
                [(pid, self.prop_aliases[j], sim) for pid, (sim, j) in ordered]
            )
        return results
