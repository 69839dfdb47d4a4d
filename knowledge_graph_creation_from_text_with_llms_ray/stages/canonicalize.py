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

from ..functions.minting import WD, WDT, mint_entity_uri, mint_property_uri

EDGE_KEY = ["subject_id", "predicate_id", "object_id", "is_literal"]

_ID_RE = re.compile(r"[QP]\d+$")


def extract_id(uri: str) -> str:
    """Display id/label from a URI (M12, ``GraphManager.py:123-136``)."""
    m = _ID_RE.search(uri)
    if m:
        return m.group()
    return uri.split("/")[-1].replace("_", " ")


def _compact_key_batch(batch: pa.Table) -> pa.Table:
    """Local combine on the COMPACT pre-mint key.

    The dedup key is ``(subject_id or subject, canonical predicate
    text/id, object_id or object, is_literal)`` — the exact value the
    minting rules are an injective function of (percent-quoting and the
    fixed URI prefixes add no information), so grouping on it is
    equivalent to grouping on minted URIs while shuffling ~40 fewer
    bytes per field.  One row per distinct edge per block with a partial
    count — hot edges collapse before the shuffle, and the global sum of
    partials is the true occurrence count (two-phase aggregation)."""
    subs = batch["subject"].to_pylist()
    preds = batch["predicate"].to_pylist()
    objs = batch["object"].to_pylist()
    sids = batch["subject_id"].to_pylist()
    pids = batch["predicate_id"].to_pylist()
    oids = batch["object_id"].to_pylist()

    counts: dict[tuple, int] = {}
    for s, p, o, sid, pid, oid in zip(subs, preds, objs, sids, pids, oids):
        if pid is not None:
            pkey = pid
        elif p.startswith("P"):
            # the raw-surface P-prefix check happens BEFORE lowercasing
            # in the reference (GraphManager.py:49) — preserve it
            pkey = p
        else:
            pkey = p.lower().replace(" ", "_")
        key = (sid or s, pkey, o if oid is None else oid, oid is None)
        counts[key] = counts.get(key, 0) + 1
    rows = list(counts.items())
    su, pu, ou, lit = ([r[0][i] for r in rows] for i in range(4))
    return pa.table(
        {
            "subject_key": pa.array(su, pa.string()),
            "predicate_key": pa.array(pu, pa.string()),
            "object_key": pa.array(ou, pa.string()),
            "is_literal": pa.array(lit, pa.bool_()),
            "partial_count": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _mint_deduped_batch(batch: pa.Table) -> pa.Table:
    """Mint final URIs on the (already deduplicated) compact keys.
    Predicate keys arriving here are pre-lowercased, which minting is
    idempotent over."""
    subs = batch["subject_key"].to_pylist()
    preds = batch["predicate_key"].to_pylist()
    objs = batch["object_key"].to_pylist()
    lits = batch["is_literal"].to_pylist()
    su, pu, ou = [], [], []
    for s, p, o, lit in zip(subs, preds, objs, lits):
        su.append(mint_entity_uri(s))
        pu.append(mint_property_uri(p))
        ou.append(o if lit else mint_entity_uri(o))
    return pa.table(
        {
            "subject_id": pa.array(su, pa.string()),
            "predicate_id": pa.array(pu, pa.string()),
            "object_id": pa.array(ou, pa.string()),
            "is_literal": pa.array(lits, pa.bool_()),
            "provenance_count": batch["provenance_count"],
        }
    )


def _rename_col(batch: pa.Table, old: str, new: str) -> pa.Table:
    return batch.rename_columns(
        [new if c == old else c for c in batch.column_names]
    )


def materialize_edges(
    linked: ray.data.Dataset, num_partitions: int | None = 32
) -> ray.data.Dataset:
    """linked triples → deduplicated, deterministically sorted edges.

    ``batch_size=None`` gives the combiner whole blocks (bigger local
    dedup windows → fewer shuffled rows); ``num_partitions`` sizes the
    hash-shuffle aggregator pool (≈ CPU count; the default one-per-block
    spawns far more aggregator actors than the post-combine volume
    justifies).  Dedup groups on the compact pre-mint key and mints URIs
    only on survivors — the shuffle never carries URI prefixes."""
    from .relational import bucketed_group_aggregate

    keyed = linked.map_batches(
        _compact_key_batch, batch_format="pyarrow", batch_size=None
    )
    deduped = bucketed_group_aggregate(
        keyed,
        keys=["subject_key", "predicate_key", "object_key", "is_literal"],
        agg_specs=[("partial_count", "sum")],
        rename={"partial_count_sum": "provenance_count"},
        num_buckets=num_partitions or 32,
    )
    minted = deduped.map_batches(
        _mint_deduped_batch, batch_format="pyarrow", batch_size=None
    )
    return minted.sort(EDGE_KEY)


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
    from .relational import bucketed_group_aggregate

    local = edges.map_batches(_node_batch, batch_format="pyarrow", batch_size=None)
    distinct = bucketed_group_aggregate(
        local, keys=["node_id", "kind", "label"], agg_specs=[]
    )
    return distinct.sort("node_id")
