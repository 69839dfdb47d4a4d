"""Keyed ordered-window operators: sessionization, running aggregates,
per-group top-k.

The reference has no streaming/window machinery (SURVEY.md §1.4) —
these are the training-data-pipeline extensions an events table needs.
All share one shape: ``groupby(key).map_groups`` with an in-group sort,
so the shuffle moves each key's rows once and the window logic runs
vectorized per group.  Partitioning assumption: one group fits in one
task (true for per-user/per-session data; salt the key upstream if a
single key's history outgrows a worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def sessionize(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> ray.data.Dataset:
    """Gap-based sessions per key: a new session starts when the time
    since the previous event exceeds ``gap_seconds``.  Adds
    ``session_id`` (1-based per key, in time order) and
    ``event_seq`` (1-based position within the session)."""

    def _per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(g[ts_col].cast(pa.int64()))  # µs since epoch
        gaps = np.diff(ts, prepend=ts[:1]) > gap_seconds * 1_000_000
        session = np.cumsum(gaps) + 1
        seq = np.arange(len(ts)) - np.maximum.accumulate(
            np.where(gaps, np.arange(len(ts)), 0)
        ) + 1
        return g.append_column(
            "session_id", pa.array(session.astype(np.int64))
        ).append_column("event_seq", pa.array(seq.astype(np.int64)))

    return ds.groupby(key).map_groups(_per_key, batch_format="pyarrow")


def running_aggregate(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    out_col: str = "running_sum",
) -> ray.data.Dataset:
    """Cumulative sum of ``value_col`` per key in ``ts_col`` order
    (ties broken by the existing row order after a stable sort)."""

    def _per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        vals = np.asarray(g[value_col], dtype=np.int64)
        return g.append_column(out_col, pa.array(np.cumsum(vals), pa.int64()))

    return ds.groupby(key).map_groups(_per_key, batch_format="pyarrow")


def topk_per_group(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    k: int,
    descending: list[bool] | None = None,
) -> ray.data.Dataset:
    """Per-group top-k with a deterministic tie-break; adds ``rnk``
    (1-based within group).  Unlike global ``relational.topk`` this is a
    grouped head-limit — the reference's ``max_chunks`` generalized
    (O2, ``TripleGenerator.py:247-249``)."""
    desc = descending or [True] * len(order_cols)
    sort_keys = [
        (c, "descending" if d else "ascending") for c, d in zip(order_cols, desc)
    ]

    def _per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=sort_keys)
        top = group.take(order).slice(0, k)
        return top.append_column(
            "rnk", pa.array(range(1, top.num_rows + 1), pa.int64())
        )

    return ds.groupby(key).map_groups(_per_key, batch_format="pyarrow")
