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


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> ray.data.Dataset:
    """As-of join: for every left row, the latest right row of the same
    key with ``right.ts <= left.ts`` (nulls when no prior right row).

    Ray Data has no native as-of join; composition (SURVEY.md §2,
    custom operators path (a)): tag both sides, union, one groupby on
    the key, and a per-group merge over the time-sorted rows.  Shuffle
    volume = both inputs moved once; the partitioning assumption is one
    key's history per task (salt/split upstream for pathological keys).
    """
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    right_schema = right.schema()
    right_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    out_vals = [(c, c + suffix, right_types[c]) for c in right_value_cols]
    # one unified schema so the two sides can union:
    #   left cols … | <val>_asof … | __ts | __side
    ordered = left_cols + [o for _, o, _ in out_vals] + ["__ts", "__side"]

    def _tag_left(batch: pa.Table) -> pa.Table:
        for _, o, t in out_vals:
            batch = batch.append_column(o, pa.nulls(batch.num_rows, t))
        batch = batch.append_column("__ts", batch[ts_col].cast(pa.int64()))
        batch = batch.append_column("__side", pa.array([0] * batch.num_rows, pa.int8()))
        return batch.select(ordered)

    def _tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for c in left_cols:
            if c == key:
                cols[c] = batch[key]
            else:
                cols[c] = pa.nulls(n, left_types[c])
        for c, o, _t in out_vals:
            cols[o] = batch[c]
        cols["__ts"] = batch[ts_col].cast(pa.int64())
        cols["__side"] = pa.array([1] * n, pa.int8())
        return pa.table({name: cols[name] for name in ordered})

    l_tagged = left.map_batches(_tag_left, batch_format="pyarrow", batch_size=None)
    r_tagged = right.select_columns(
        list(dict.fromkeys([key, ts_col] + right_value_cols))
    ).map_batches(_tag_right, batch_format="pyarrow", batch_size=None)

    def _merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"])
        ts = np.asarray(group["__ts"])
        l_idx = np.flatnonzero(side == 0)
        out = group.take(pa.array(l_idx)).select(left_cols)
        r_idx = np.flatnonzero(side == 1)
        if len(r_idx) == 0:
            for _, o, t in out_vals:
                out = out.append_column(o, pa.nulls(out.num_rows, t))
            return out
        r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
        r_ts = ts[r_order]
        pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
        take_idx = pa.array(
            [int(r_order[p]) if p >= 0 else None for p in pos], pa.int64()
        )
        for _, o, _t in out_vals:
            out = out.append_column(o, group[o].take(take_idx))
        return out

    unioned = l_tagged.union(r_tagged)
    return unioned.groupby(key).map_groups(_merge, batch_format="pyarrow")


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
