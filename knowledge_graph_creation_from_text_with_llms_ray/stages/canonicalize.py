"""Stage 5 — canonicalization + graph materialization.

Replaces the reference's in-memory rdflib accumulator
(``src/core/Integrator/GraphManager.py:24-55``, ST5) with two Parquet
tables:

* ``edges(subject_id, predicate_id, object_id, is_literal,
  provenance_count)`` — URI minting per M11 (``GraphManager.py:48-55``),
  then DISTINCT on the full edge key (rdflib ``Graph.add`` set
  semantics, D1) via two-phase dedup: per-batch local dedup (the
  partial/combiner phase — any hot edge ships at most once per block,
  which is exactly what explicit key-salting buys) followed by a global
  groupby-count that doubles as provenance weight;
* ``nodes(node_id, kind, label)`` — distinct union of subjects and
  non-literal objects; ``kind`` ∈ wikidata|local, label per M12
  (``GraphManager.py:123-136``).

Edges are deterministically sorted before write so output bytes are
stable across runs and cluster sizes (SURVEY.md §4.3.6).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ..functions.minting import WD, WDT, mint_edge

EDGE_KEY = ["subject_id", "predicate_id", "object_id", "is_literal"]

_ID_RE = re.compile(r"[QP]\d+$")


def extract_id(uri: str) -> str:
    """Display id/label from a URI (M12, ``GraphManager.py:123-136``)."""
    m = _ID_RE.search(uri)
    if m:
        return m.group()
    return uri.split("/")[-1].replace("_", " ")


def _mint_batch(batch: pa.Table) -> pa.Table:
    subs = batch["subject"].to_pylist()
    preds = batch["predicate"].to_pylist()
    objs = batch["object"].to_pylist()
    sids = batch["subject_id"].to_pylist()
    pids = batch["predicate_id"].to_pylist()
    oids = batch["object_id"].to_pylist()

    # Local combine inside the batch: one row per distinct edge with a
    # partial count — hot edges collapse before they ever hit the
    # shuffle, and the global sum of partials equals the true
    # occurrence count (associative two-phase aggregation).
    counts: dict[tuple, int] = {}
    for s, p, o, sid, pid, oid in zip(subs, preds, objs, sids, pids, oids):
        key = mint_edge(s, p, o, sid, pid, oid)
        counts[key] = counts.get(key, 0) + 1
    rows = list(counts.items())
    su, pu, ou, lit = ([r[0][i] for r in rows] for i in range(4))
    return pa.table(
        {
            "subject_id": pa.array(su, pa.string()),
            "predicate_id": pa.array(pu, pa.string()),
            "object_id": pa.array(ou, pa.string()),
            "is_literal": pa.array(lit, pa.bool_()),
            "partial_count": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _rename_col(batch: pa.Table, old: str, new: str) -> pa.Table:
    return batch.rename_columns(
        [new if c == old else c for c in batch.column_names]
    )


def materialize_edges(linked: ray.data.Dataset) -> ray.data.Dataset:
    """linked triples → deduplicated, deterministically sorted edges."""
    minted = linked.map_batches(_mint_batch, batch_format="pyarrow")
    deduped = minted.groupby(EDGE_KEY).sum("partial_count")
    deduped = deduped.map_batches(
        _rename_col,
        batch_format="pyarrow",
        fn_kwargs={"old": "sum(partial_count)", "new": "provenance_count"},
    )
    return deduped.sort(EDGE_KEY)


def _node_batch(batch: pa.Table) -> pa.Table:
    rows = set()
    subs = batch["subject_id"].to_pylist()
    objs = batch["object_id"].to_pylist()
    lits = batch["is_literal"].to_pylist()
    for s in subs:
        rows.add(s)
    for o, lit in zip(objs, lits):
        if not lit:
            rows.add(o)
    node_ids = sorted(rows)
    kinds = [
        "wikidata" if n.startswith(WD) or n.startswith(WDT) else "local" for n in node_ids
    ]
    labels = [extract_id(n) for n in node_ids]
    return pa.table(
        {
            "node_id": pa.array(node_ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "label": pa.array(labels, pa.string()),
        }
    )


def materialize_nodes(edges: ray.data.Dataset) -> ray.data.Dataset:
    """edges → distinct sorted node table (kind/label are pure functions
    of node_id, so distinct-on-node_id is the whole shuffle)."""
    local = edges.map_batches(_node_batch, batch_format="pyarrow")
    distinct = local.groupby(["node_id", "kind", "label"]).count()
    distinct = distinct.drop_columns(["count()"])
    return distinct.sort("node_id")
