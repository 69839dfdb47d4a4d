"""Keyed ordered-window operators: sessionization, running aggregates,
per-group top-k.

The reference has no streaming/window machinery (SURVEY.md §1.4) —
these are the training-data-pipeline extensions an events table needs.

Two implementations per operator:

* plain (``sessionize`` / ``running_aggregate`` / ``asof_join``):
  ``groupby(key).map_groups`` with an in-group sort — one shuffle,
  vectorized window logic, assumes one key's history fits one task;
* chunked (``*_chunked``): the scale-safe form — rows grouped by
  (key, time-chunk) so per-task state is bounded regardless of key
  skew, with exact boundary carryover (prefix offsets / session merge /
  as-of carry-in) computed over tiny per-slice summaries.  Verified
  equal to the plain forms on 90%-hot-key data and against the same
  SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Per-(key, time-chunk) summary tables rejoin their rows broadcast while
# they stay below this many rows; above it the chunked operators
# auto-switch to a distributed hash join (offsets_via="auto").  At 10⁹
# keys × 365 chunks the summaries are themselves a big dataset — they
# must never be collected on the driver.
OFFSETS_BROADCAST_LIMIT = 200_000


def _offsets_strategy(
    offsets: ray.data.Dataset, offsets_via: str
) -> tuple[str, ray.data.Dataset]:
    """Resolve ``offsets_via="auto"`` by counting the summary table:
    broadcast below ``OFFSETS_BROADCAST_LIMIT`` rows, hash join above.
    Explicit ``"broadcast"`` / ``"join"`` pass through unchanged."""
    if offsets_via == "auto":
        offsets = offsets.materialize()
        via = (
            "broadcast"
            if offsets.count() <= OFFSETS_BROADCAST_LIMIT
            else "join"
        )
        return via, offsets
    if offsets_via not in ("broadcast", "join"):
        raise ValueError(f"unknown offsets_via {offsets_via!r}")
    return offsets_via, offsets


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


def running_aggregate_chunked(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    out_col: str = "running_sum",
    chunk_seconds: float = 86400.0,
    offsets_via: str = "auto",
) -> ray.data.Dataset:
    """Skew-safe cumulative sum: identical result to
    ``running_aggregate`` but no task ever holds more than one
    (key, time-chunk) slice, so a single hot key cannot exceed a
    worker's memory.

    Shape: rows are grouped by (key, ``ts // chunk_seconds``) — local
    sort + cumsum per slice — while per-slice totals flow through a
    combiner aggregation and a per-key exclusive prefix sum (tiny:
    one row per nonempty slice).  The offsets rejoin the rows either
    broadcast (offsets are ~#slices rows, usually orders of magnitude
    smaller than the data) or via a distributed hash join when even the
    offsets outgrow a broadcast; the default ``offsets_via="auto"``
    counts the summary table and picks
    (:data:`OFFSETS_BROADCAST_LIMIT`).

    ``ds`` is consumed twice (rows + totals); pass a re-executable
    pipeline (e.g. a parquet read) rather than a materialized monolith.
    """
    from .relational import broadcast_join, hash_join, pre_aggregated

    chunk_us = int(chunk_seconds * 1_000_000)

    def _add_chunk(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64())
        return batch.append_column(
            "__chunk", pc.divide(ts, chunk_us).cast(pa.int64())
        )

    chunked = ds.map_batches(_add_chunk, batch_format="pyarrow", batch_size=None)

    def _local(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        vals = np.asarray(g[value_col], dtype=np.int64)
        return g.append_column("__local", pa.array(np.cumsum(vals), pa.int64()))

    local = chunked.groupby([key, "__chunk"]).map_groups(
        _local, batch_format="pyarrow"
    )

    totals = pre_aggregated(
        chunked.select_columns([key, "__chunk", value_col]),
        keys=[key, "__chunk"],
        aggs={"__total": f"{value_col}:sum"},
    )

    def _prefix(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("__chunk", "ascending")])
        g = group.take(order)
        tot = np.asarray(g["__total"], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(tot)[:-1]))
        return pa.table(
            {
                key: g[key],
                "__chunk": g["__chunk"],
                "__offset": pa.array(offs, pa.int64()),
            }
        )

    offsets = totals.groupby(key).map_groups(_prefix, batch_format="pyarrow")

    offsets_via, offsets = _offsets_strategy(offsets, offsets_via)
    if offsets_via == "broadcast":
        off_parts = [t for t in ray.get(offsets.to_arrow_refs()) if t.num_rows > 0]
        if not off_parts:  # empty input
            return local.map_batches(
                lambda b: b.append_column(
                    out_col, pa.nulls(b.num_rows, pa.int64())
                ).drop_columns(["__chunk", "__local"]),
                batch_format="pyarrow",
            )
        joined = broadcast_join(
            local, pa.concat_tables(off_parts), keys=[key, "__chunk"], join_type="inner"
        )
    else:
        joined = hash_join(local, offsets, on=(key, "__chunk"))

    def _finish(batch: pa.Table) -> pa.Table:
        total = pc.add(batch["__local"], batch["__offset"])
        out = batch.append_column(out_col, total.cast(pa.int64()))
        return out.drop_columns(["__chunk", "__local", "__offset"])

    return joined.map_batches(_finish, batch_format="pyarrow")


def sessionize_chunked(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    chunk_seconds: float = 86400.0,
    offsets_via: str = "auto",
) -> ray.data.Dataset:
    """Skew-safe sessionization: identical output to ``sessionize``
    with bounded per-task state.  Each (key, time-chunk) slice
    sessionizes locally and emits, alongside its rows, one summary row
    (first/last ts, session count, open-tail length).  A per-key merge
    over the summaries (one row per nonempty slice) decides for every
    slice whether its first local session continues the previous
    slice's last session, and what the session-id / event-seq offsets
    are; the adjustments rejoin the rows and apply vectorized.
    """
    from .relational import broadcast_join, hash_join

    chunk_us = int(chunk_seconds * 1_000_000)
    gap_us = gap_seconds * 1_000_000

    def _add_chunk(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64())
        return batch.append_column(
            "__chunk", pc.divide(ts, chunk_us).cast(pa.int64())
        )

    chunked = ds.map_batches(_add_chunk, batch_format="pyarrow", batch_size=None)

    def _local(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(g[ts_col].cast(pa.int64()))
        gaps = np.diff(ts, prepend=ts[:1]) > gap_us
        session = np.cumsum(gaps) + 1
        seq = np.arange(len(ts)) - np.maximum.accumulate(
            np.where(gaps, np.arange(len(ts)), 0)
        ) + 1
        rows = (
            g.append_column("__sess", pa.array(session.astype(np.int64)))
            .append_column("__seq", pa.array(seq.astype(np.int64)))
            .append_column("__is_summary", pa.array([False] * len(ts)))
            .append_column("__first_ts", pa.nulls(len(ts), pa.int64()))
            .append_column("__last_ts", pa.nulls(len(ts), pa.int64()))
            .append_column("__n_sess", pa.nulls(len(ts), pa.int64()))
            .append_column("__tail", pa.nulls(len(ts), pa.int64()))
        )
        tail = int((session == session[-1]).sum())
        summary_cols = {}
        for name in g.column_names:
            if name == key:
                summary_cols[name] = g[key].slice(0, 1)
            elif name == "__chunk":
                summary_cols[name] = g["__chunk"].slice(0, 1)
            else:
                summary_cols[name] = pa.nulls(1, g[name].type)
        summary_cols["__sess"] = pa.nulls(1, pa.int64())
        summary_cols["__seq"] = pa.nulls(1, pa.int64())
        summary_cols["__is_summary"] = pa.array([True])
        summary_cols["__first_ts"] = pa.array([int(ts[0])], pa.int64())
        summary_cols["__last_ts"] = pa.array([int(ts[-1])], pa.int64())
        summary_cols["__n_sess"] = pa.array([int(session[-1])], pa.int64())
        summary_cols["__tail"] = pa.array([tail], pa.int64())
        summary = pa.table(
            {n: summary_cols[n] for n in rows.column_names}
        ).cast(rows.schema)
        return pa.concat_tables([rows, summary])

    combined = chunked.groupby([key, "__chunk"]).map_groups(
        _local, batch_format="pyarrow"
    ).materialize()

    rows = combined.filter(expr="__is_summary == False").drop_columns(
        ["__is_summary", "__first_ts", "__last_ts", "__n_sess", "__tail"]
    )
    summaries = combined.filter(expr="__is_summary == True").select_columns(
        [key, "__chunk", "__first_ts", "__last_ts", "__n_sess", "__tail"]
    )

    def _merge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("__chunk", "ascending")])
        g = group.take(order)
        first_ts = g["__first_ts"].to_pylist()
        last_ts = g["__last_ts"].to_pylist()
        n_sess = g["__n_sess"].to_pylist()
        tails = g["__tail"].to_pylist()
        sess_off, seq_off = [], []
        prev_last = None
        sessions_cum = 0
        tail_len = 0
        for i in range(g.num_rows):
            merged = prev_last is not None and (first_ts[i] - prev_last) <= gap_us
            so = sessions_cum - (1 if merged else 0)
            qo = tail_len if merged else 0
            sess_off.append(so)
            seq_off.append(qo)
            sessions_cum = so + n_sess[i]
            tail_len = tails[i] + (qo if n_sess[i] == 1 else 0)
            prev_last = last_ts[i]
        return pa.table(
            {
                key: g[key],
                "__chunk": g["__chunk"],
                "__sess_off": pa.array(sess_off, pa.int64()),
                "__seq_off": pa.array(seq_off, pa.int64()),
            }
        )

    adjust = summaries.groupby(key).map_groups(_merge, batch_format="pyarrow")

    offsets_via, adjust = _offsets_strategy(adjust, offsets_via)
    if offsets_via == "broadcast":
        adj_parts = [t for t in ray.get(adjust.to_arrow_refs()) if t.num_rows > 0]
        if not adj_parts:  # empty input
            return rows.drop_columns(["__chunk"]).rename_columns(
                {"__sess": "session_id", "__seq": "event_seq"}
            )
        joined = broadcast_join(
            rows, pa.concat_tables(adj_parts), keys=[key, "__chunk"], join_type="inner"
        )
    else:
        joined = hash_join(rows, adjust, on=(key, "__chunk"))

    def _finish(batch: pa.Table) -> pa.Table:
        sess = pc.add(batch["__sess"], batch["__sess_off"])
        in_first = pc.equal(batch["__sess"], 1)
        seq = pc.add(
            batch["__seq"],
            pc.if_else(in_first, batch["__seq_off"], pa.scalar(0, pa.int64())),
        )
        out = batch.append_column("session_id", sess.cast(pa.int64()))
        out = out.append_column("event_seq", seq.cast(pa.int64()))
        return out.drop_columns(
            ["__chunk", "__sess", "__seq", "__sess_off", "__seq_off"]
        )

    return joined.map_batches(_finish, batch_format="pyarrow")


def asof_join_chunked(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    chunk_seconds: float = 86400.0,
    offsets_via: str = "auto",
) -> ray.data.Dataset:
    """Skew-safe as-of join: identical result to ``asof_join`` with
    bounded per-task state.  Both sides are tagged and grouped by
    (key, time-chunk); each slice resolves its left rows against its
    own right rows and emits one summary row carrying the slice's LAST
    right values (or nulls).  A per-key forward-fill over the summaries
    produces each slice's carry-in — the latest right values from all
    earlier chunks — which resolves the left rows that had no in-chunk
    prior right row (a ``__resolved`` flag, not null-ness, decides, so
    genuinely-null right values carry through faithfully)."""
    from .relational import broadcast_join, hash_join

    chunk_us = int(chunk_seconds * 1_000_000)
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_vals = [(c, c + suffix, right_types[c]) for c in right_value_cols]
    ordered = (
        left_cols
        + [o for _, o, _ in out_vals]
        + ["__ts", "__chunk", "__side"]
    )

    def _tag_left(batch: pa.Table) -> pa.Table:
        for _, o, t in out_vals:
            batch = batch.append_column(o, pa.nulls(batch.num_rows, t))
        ts = batch[ts_col].cast(pa.int64())
        batch = batch.append_column("__ts", ts)
        batch = batch.append_column(
            "__chunk", pc.divide(ts, chunk_us).cast(pa.int64())
        )
        batch = batch.append_column(
            "__side", pa.array([0] * batch.num_rows, pa.int8())
        )
        return batch.select(ordered)

    def _tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for c in left_cols:
            cols[c] = batch[key] if c == key else pa.nulls(n, left_types[c])
        for c, o, _t in out_vals:
            cols[o] = batch[c]
        ts = batch[ts_col].cast(pa.int64())
        cols["__ts"] = ts
        cols["__chunk"] = pc.divide(ts, chunk_us).cast(pa.int64())
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
        r_idx = np.flatnonzero(side == 1)
        out = group.take(pa.array(l_idx)).select(
            left_cols + ["__chunk"]
        )
        if len(r_idx) > 0:
            r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
            r_ts = ts[r_order]
            pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
            take_idx = pa.array(
                [int(r_order[p]) if p >= 0 else None for p in pos], pa.int64()
            )
            resolved = pa.array([bool(p >= 0) for p in pos])
            for _, o, _t in out_vals:
                out = out.append_column(o, group[o].take(take_idx))
        else:
            take_idx = None
            resolved = pa.array([False] * len(l_idx))
            for _, o, t in out_vals:
                out = out.append_column(o, pa.nulls(out.num_rows, t))
        out = out.append_column("__resolved", resolved)
        out = out.append_column("__is_summary", pa.array([False] * out.num_rows))
        # summary row: this slice's LAST right values (nulls if none)
        scols = {}
        for name in out.column_names:
            if name == key:
                scols[name] = group[key].slice(0, 1)
            elif name == "__chunk":
                scols[name] = group["__chunk"].slice(0, 1)
            elif name == "__is_summary":
                scols[name] = pa.array([True])
            elif name == "__resolved":
                scols[name] = pa.array([len(r_idx) > 0])
            else:
                scols[name] = pa.nulls(1, out[name].type)
        if len(r_idx) > 0:
            last = int(r_idx[np.argsort(ts[r_idx], kind="stable")][-1])
            for _, o, _t in out_vals:
                scols[o] = group[o].slice(last, 1)
        summary = pa.table({n: scols[n] for n in out.column_names}).cast(out.schema)
        return pa.concat_tables([out, summary])

    combined = (
        l_tagged.union(r_tagged)
        .groupby([key, "__chunk"])
        .map_groups(_merge, batch_format="pyarrow")
        .materialize()
    )
    rows = combined.filter(expr="__is_summary == False").drop_columns(
        ["__is_summary"]
    )
    summaries = combined.filter(expr="__is_summary == True").select_columns(
        [key, "__chunk", "__resolved"] + [o for _, o, _ in out_vals]
    )

    def _carry(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("__chunk", "ascending")])
        g = group.take(order)
        has = g["__resolved"].to_pylist()
        carry_has: list[bool] = []
        carry_take: list[int | None] = []
        last: int | None = None
        for i in range(g.num_rows):
            carry_has.append(last is not None)
            carry_take.append(last)
            if has[i]:
                last = i
        cols = {
            key: g[key],
            "__chunk": g["__chunk"],
            "__carry_has": pa.array(carry_has),
        }
        take_arr = pa.array(carry_take, pa.int64())
        for _, o, _t in out_vals:
            cols[f"__carry{o}"] = g[o].take(take_arr)
        return pa.table(cols)

    carries = summaries.groupby(key).map_groups(_carry, batch_format="pyarrow")

    offsets_via, carries = _offsets_strategy(carries, offsets_via)
    if offsets_via == "broadcast":
        carry_parts = [t for t in ray.get(carries.to_arrow_refs()) if t.num_rows > 0]
        if not carry_parts:  # empty input
            return rows.map_batches(
                lambda b: b.select(left_cols + [o for _, o, _t in out_vals]),
                batch_format="pyarrow",
            )
        joined = broadcast_join(
            rows, pa.concat_tables(carry_parts), keys=[key, "__chunk"], join_type="inner"
        )
    else:
        joined = hash_join(rows, carries, on=(key, "__chunk"))

    def _finish(batch: pa.Table) -> pa.Table:
        resolved = batch["__resolved"]
        for _, o, _t in out_vals:
            merged = pc.if_else(resolved, batch[o], batch[f"__carry{o}"])
            batch = batch.drop_columns([o]).append_column(o, merged)
        drop = ["__chunk", "__resolved", "__carry_has"] + [
            f"__carry{o}" for _, o, _t in out_vals
        ]
        return batch.drop_columns(drop).select(
            left_cols + [o for _, o, _t in out_vals]
        )

    return joined.map_batches(_finish, batch_format="pyarrow")


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


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    window_seconds: float,
    right_cols: list[str],
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Range (interval) join: every (left, right) pair of the same key
    with ``|left.ts - right.ts| <= window``.  Ray Data has no native
    range join; composition: both sides are bucketed by
    ``ts // window``, the RIGHT side replicated into the three buckets
    any match can live in (c-1, c, c+1), one groupby on (key, bucket),
    and a vectorized searchsorted span per left row — every pair is
    emitted exactly once (each left row lives in exactly one bucket and
    sees each matching right row exactly once there).  Per-task state
    is bounded by one (key, window-bucket) slice, so key skew is capped
    the same way as the chunked window operators.  Adds a ``dt_us``
    column (left.ts - right.ts in µs, exact integer)."""
    chunk_us = int(window_seconds * 1_000_000)
    window_us = chunk_us
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_vals = [(c, c + suffix, right_types[c]) for c in right_cols]
    ordered = left_cols + [o for _, o, _ in out_vals] + ["__ts", "__chunk", "__side"]

    def _tag_left(batch: pa.Table) -> pa.Table:
        for _, o, t in out_vals:
            batch = batch.append_column(o, pa.nulls(batch.num_rows, t))
        ts = batch[ts_col].cast(pa.int64())
        batch = batch.append_column("__ts", ts)
        batch = batch.append_column("__chunk", pc.divide(ts, chunk_us).cast(pa.int64()))
        batch = batch.append_column("__side", pa.array([0] * batch.num_rows, pa.int8()))
        return batch.select(ordered)

    def _tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for c in left_cols:
            cols[c] = batch[key] if c == key else pa.nulls(n, left_types[c])
        for c, o, _t in out_vals:
            cols[o] = batch[c]
        ts = batch[ts_col].cast(pa.int64())
        cols["__ts"] = ts
        cols["__side"] = pa.array([1] * n, pa.int8())
        base = pc.divide(ts, chunk_us).cast(pa.int64())
        parts = []
        for d in (-1, 0, 1):  # replicate to the three reachable buckets
            cols["__chunk"] = pc.add(base, d).cast(pa.int64())
            parts.append(pa.table({name: cols[name] for name in ordered}))
        return pa.concat_tables(parts)

    l_tagged = left.map_batches(_tag_left, batch_format="pyarrow", batch_size=None)
    r_tagged = right.select_columns(
        list(dict.fromkeys([key, ts_col] + right_cols))
    ).map_batches(_tag_right, batch_format="pyarrow", batch_size=None)

    def _merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"])
        ts = np.asarray(group["__ts"])
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        empty_cols = {c: pa.array([], left_types[c]) for c in left_cols}
        for _, o, t in out_vals:
            empty_cols[o] = pa.array([], t)
        empty_cols["dt_us"] = pa.array([], pa.int64())
        if len(l_idx) == 0 or len(r_idx) == 0:
            return pa.table(empty_cols)
        r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
        r_ts = ts[r_order]
        lts = ts[l_idx]
        lo = np.searchsorted(r_ts, lts - window_us, side="left")
        hi = np.searchsorted(r_ts, lts + window_us, side="right")
        counts = hi - lo
        if counts.sum() == 0:
            return pa.table(empty_cols)
        l_take = np.repeat(l_idx, counts)
        r_take = np.concatenate(
            [r_order[a:b] for a, b in zip(lo, hi) if b > a]
        )
        out = group.take(pa.array(l_take)).select(left_cols)
        taken_r = group.take(pa.array(r_take))
        for _, o, _t in out_vals:
            out = out.append_column(o, taken_r[o])
        dt = np.repeat(ts[l_idx], counts) - ts[r_take]
        return out.append_column("dt_us", pa.array(dt.astype(np.int64)))

    unioned = l_tagged.union(r_tagged)
    return unioned.groupby([key, "__chunk"]).map_groups(
        _merge, batch_format="pyarrow"
    )


def sliding_window_sum(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    window_seconds: float,
    out_col: str = "window_sum",
) -> ray.data.Dataset:
    """Trailing-window aggregate: for every row, the sum of
    ``value_col`` over the same key's rows with
    ``row.ts - window <= ts <= row.ts`` (inclusive trailing window —
    SQL ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``).

    Skew-bounded by construction: rows are grouped by
    (key, ``ts // window``) and each slice additionally receives the
    PREVIOUS slice's rows (every trailing window spans at most two
    slices), so per-task state is ≤ two window-widths of one key.  The
    carried copies are marked and excluded from output — each row is
    emitted exactly once.  Exact integer arithmetic (prefix-sum
    difference over the sorted slice)."""
    chunk_us = int(window_seconds * 1_000_000)
    window_us = chunk_us

    def _tag(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64())
        base = pc.divide(ts, chunk_us).cast(pa.int64())
        own = batch.append_column("__ts", ts).append_column(
            "__chunk", base
        ).append_column("__carry", pa.array([False] * batch.num_rows))
        carried = batch.append_column("__ts", ts).append_column(
            "__chunk", pc.add(base, 1).cast(pa.int64())
        ).append_column("__carry", pa.array([True] * batch.num_rows))
        return pa.concat_tables([own, carried])

    tagged = ds.map_batches(_tag, batch_format="pyarrow", batch_size=None)

    def _window(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("__ts", "ascending")])
        g = group.take(order)
        ts = np.asarray(g["__ts"])
        vals = np.asarray(g[value_col], dtype=np.int64)
        prefix = np.concatenate(([0], np.cumsum(vals)))
        # window [t - W, t] inclusive on both ends
        lo = np.searchsorted(ts, ts - window_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        sums = prefix[hi] - prefix[lo]
        out = g.append_column(out_col, pa.array(sums, pa.int64()))
        keep = pc.invert(out["__carry"])
        return out.filter(keep).drop_columns(["__ts", "__chunk", "__carry"])

    return tagged.groupby([key, "__chunk"]).map_groups(
        _window, batch_format="pyarrow"
    )
