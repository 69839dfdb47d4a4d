"""Generic relational operators, Ray-Data-first.

The engine's general query capabilities (filters, projections,
aggregations, joins, top-k) expressed with the scale patterns this repo
standardizes on:

* ``broadcast_join`` — small side ``ray.put`` once, per-batch
  ``pyarrow.Table.join`` (vectorized, zero shuffle of the big side);
* ``pre_aggregated`` — per-batch partial aggregation with Arrow
  ``TableGroupBy`` before the global groupby, so the all-to-all
  exchange carries one row per (key, block) instead of one per input
  row — this is the combiner/salting pattern;
* ``topk`` — per-block local top-k, then a tiny global sort+limit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_PARTIAL_OF = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

_CPUS_CACHE: int | None = None
_CPUS_CACHE_TS: float = 0.0
_CPUS_TTL_S = 10.0  # re-read after autoscaling / a new ray.init


def _cluster_cpus() -> int:
    """Cluster CPU count; 8 when Ray isn't initialized yet (the library
    must never trigger ``ray.init`` itself — driver contract).  Cached
    with a short TTL so partition/bucket counts follow autoscaling and
    same-process re-inits instead of freezing at the first call."""
    global _CPUS_CACHE, _CPUS_CACHE_TS
    import time as _time

    now = _time.monotonic()
    if (
        _CPUS_CACHE is None or now - _CPUS_CACHE_TS > _CPUS_TTL_S
    ) and ray.is_initialized():
        try:
            _CPUS_CACHE = int(ray.cluster_resources().get("CPU", 0) or 0)
            _CPUS_CACHE_TS = now
        except Exception:
            return _CPUS_CACHE or 8
    return _CPUS_CACHE or 8


def partitions_for(
    scale: float = 1.0, minimum: int = 4, maximum: int = 2048
) -> int:
    """Shuffle-partition / bucket default that tracks CLUSTER SIZE
    instead of a tiny-cluster constant: ~``scale`` partitions per
    cluster CPU, clamped to [minimum, maximum].  A plan written against
    a 4-CPU test session then runs with 8 192 partitions on a 256-node
    cluster without touching the call sites.  Aggregation stages use
    scale=1 (one aggregator per core); join/summary stages use a
    smaller scale — their aggregator actors each reserve a CPU, and
    over-provisioning them starves upstream stages (the tiny-cluster
    deadlock documented on ``hash_join``).

    Scales are tuned so a ≤32-CPU session reproduces the empirically
    fastest local constants (aggregator-actor startup dominates small
    sessions — measured +45% wall at 32 partitions vs 8 on sf0.1)
    while a multi-node cluster gets ~CPU-proportional exchanges."""
    return int(min(maximum, max(minimum, round(_cluster_cpus() * scale))))


class _BroadcastJoiner:
    def __init__(self, right_ref, keys, right_keys, join_type):
        right = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) else right_ref
        self.right = right
        self.keys = keys
        self.right_keys = right_keys
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.right,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(
    ds: ray.data.Dataset,
    right: pa.Table,
    keys: list[str],
    right_keys: list[str] | None = None,
    join_type: str = "inner",
    concurrency: int | tuple = (1, 4),
    batch_size: int | None = 8192,
) -> ray.data.Dataset:
    """Hash-join each streaming batch against a broadcast small side."""
    right_ref = ray.put(right)
    return ds.map_batches(
        _BroadcastJoiner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "right_ref": right_ref,
            "keys": keys,
            "right_keys": right_keys,
            "join_type": join_type,
        },
    )


def _partial_agg(batch: pa.Table, keys: list[str], aggs: dict[str, str]) -> pa.Table:
    """Arrow-native per-batch combine: one grouped row per key/block."""
    specs = []
    names = []
    for out_name, spec in aggs.items():
        col, fn = spec.split(":")
        if fn == "count":
            specs.append((col, "count"))
        else:
            specs.append((col, fn))
        names.append(out_name)
    grouped = batch.group_by(keys).aggregate(specs)
    renames = {}
    for (col, fn), out_name in zip(specs, names):
        renames[f"{col}_{fn}"] = out_name
    return grouped.rename_columns(
        [renames.get(c, c) for c in grouped.column_names]
    )


def pre_aggregated(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Two-phase distributed aggregation.

    ``aggs`` maps output column name → ``"col:fn"`` with fn ∈
    sum|count|min|max (mean = sum+count then divide downstream).
    Phase 1 combines inside each batch (Arrow kernels); phase 2 merges
    partials with the matching associative function in a Ray groupby.
    """
    partial = ds.map_batches(
        _partial_agg, batch_format="pyarrow", fn_kwargs={"keys": keys, "aggs": aggs}
    )
    from ray.data.aggregate import Max, Min, Sum

    merge_aggs = []
    for out_name, spec in aggs.items():
        fn = spec.split(":")[1]
        merge_fn = _PARTIAL_OF[fn]
        cls = {"sum": Sum, "min": Min, "max": Max}[merge_fn]
        merge_aggs.append(cls(out_name, alias_name=out_name))
    # After the combine phase the shuffle volume is ~#keys × #blocks —
    # ~one partition per cluster CPU beats Ray's default (one per input
    # block), whose aggregator-actor startup dominates wall time.
    if num_partitions is None:
        num_partitions = partitions_for(scale=0.25, minimum=8)
    return partial.groupby(keys, num_partitions=num_partitions).aggregate(*merge_aggs)


def topk(
    ds: ray.data.Dataset,
    keys: str | list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> ray.data.Dataset:
    """Global top-k without a global sort of the data: per-block local
    top-k partials, then sort+limit over the tiny remainder.  Pass a
    trailing unique key (e.g. the row id) to make ties deterministic."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    desc = [descending] * len(keys) if isinstance(descending, bool) else list(descending)
    sort_keys = [
        (key, "descending" if d else "ascending") for key, d in zip(keys, desc)
    ]

    def _local(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx).slice(0, k)

    partials = ds.map_batches(_local, batch_format="pyarrow")
    return partials.sort(keys, descending=desc).limit(k)


def _combined_key_array(tbl: pa.Table, cols: list[str]) -> pa.Array | None:
    """One string key per row (vectorized) for multi-column membership
    tests; None when a column has nulls (caller falls back to the exact
    row-tuple path, where None == None semantics matter)."""
    parts = []
    for c in cols:
        col = tbl[c]
        if col.null_count > 0:
            return None
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        parts.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def broadcast_semi_join(
    ds: ray.data.Dataset,
    right_keys: pa.Table,
    keys: list[str],
    right_key_cols: list[str] | None = None,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi-join (``EXISTS``) / anti-join (``NOT EXISTS``) against a
    broadcast key set: keep left rows whose key combination does (not)
    appear in the right table.  The right side ships as a ``ray.put``
    key-set once — never per batch.  The membership test is a single
    vectorized ``pc.is_in`` over a combined key column; the per-row
    tuple path survives only as the null-key fallback."""
    right_key_cols = right_key_cols or keys
    right_arr = _combined_key_array(right_keys, right_key_cols)
    if right_arr is not None:
        value_set = pc.unique(right_arr)
        set_ref = ray.put(value_set)

        def _filter(batch: pa.Table) -> pa.Table:
            vs = ray.get(set_ref)
            left_arr = _combined_key_array(batch, keys)
            if left_arr is not None:
                mask = pc.is_in(left_arr, value_set=vs)
                return batch.filter(pc.invert(mask) if anti else mask)
            # null-key rows never match (the right side had no nulls)
            kset = set(vs.to_pylist())
            cast_cols = [
                pc.cast(batch[k], pa.string()).to_pylist() for k in keys
            ]
            pymask = [
                (
                    all(v is not None for v in row)
                    and ("\x1f".join(row) if len(keys) > 1 else row[0]) in kset
                )
                != anti
                for row in zip(*cast_cols)
            ]
            return batch.filter(pa.array(pymask, pa.bool_()))

        return ds.map_batches(_filter, batch_format="pyarrow", batch_size=None)

    key_set = set(
        zip(*(right_keys[c].to_pylist() for c in right_key_cols))
    )
    keys_ref = ray.put(key_set)

    def _filter_tuples(batch: pa.Table) -> pa.Table:
        kset = ray.get(keys_ref)
        cols = [batch[k].to_pylist() for k in keys]
        mask = [(tuple(row) in kset) != anti for row in zip(*cols)]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(_filter_tuples, batch_format="pyarrow", batch_size=None)


def bucketed_group_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_specs: list[tuple[str, str]],
    rename: dict[str, str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Hash-bucket shuffle + Arrow C++ group_by — the fast path for
    high-volume multi-key aggregation.

    Ray's native multi-string-key groupby aggregator is Python-loop
    slow (measured ~7k rows/s/core); shuffling on ONE int32 bucket
    column (crc32 of the concatenated key) and letting
    ``pyarrow.TableGroupBy`` do the per-bucket combine is ~5× faster at
    identical results.  Correct because bucket = f(full key): all rows
    of a key land in the same bucket.  ``agg_specs`` are pyarrow
    aggregate tuples, e.g. ``[("partial_count", "sum")]``; output
    columns ``<col>_<fn>`` can be renamed via ``rename``.
    """
    if num_buckets is None:
        # resolved BEFORE _bucket is defined: the closure is serialized
        # with the concrete modulus
        num_buckets = partitions_for(scale=1.0, minimum=32)
    sep = "\x1f"

    def _bucket(batch: pa.Table) -> pa.Table:
        # Bucket assignment only has to be consistent within a run (all
        # rows of a key → same bucket); the output row SET is identical
        # for any bucketing function, so the fastest vectorized hash
        # available wins.
        import numpy as np

        if all(pa.types.is_integer(batch[k].type) for k in keys):
            # splitmix64-style integer mix per key, combined — pure numpy
            acc = np.zeros(batch.num_rows, dtype=np.uint64)
            for pos, k in enumerate(keys):
                x = (
                    batch[k]
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
                x ^= x >> np.uint64(33)
                acc = acc * np.uint64(0x9E3779B97F4A7C15) + x + np.uint64(pos)
            buckets = pa.array((acc % np.uint64(num_buckets)).astype(np.int32))
        else:
            parts = [
                pc.cast(batch[k], pa.string())
                if batch[k].type != pa.string()
                else batch[k]
                for k in keys
            ]
            joined = (
                pc.binary_join_element_wise(*parts, sep)
                if len(parts) > 1
                else parts[0]
            )
            try:  # Rust-vectorized string hash
                import os as _os

                # one rayon thread per worker: the map task is already
                # the parallelism unit — a full polars thread pool per
                # worker oversubscribes the node (measured: 32 workers
                # x 32 threads cost ~15% wall time on the 500k-doc run)
                _os.environ.setdefault("POLARS_MAX_THREADS", "1")
                if _os.environ.get("KGRAY_BUCKET_HASH") == "crc32":
                    raise ImportError  # explicit fallback escape hatch
                import polars as pl

                if isinstance(joined, pa.ChunkedArray):
                    joined = joined.combine_chunks()
                h = pl.from_arrow(joined).hash(seed=0).to_numpy()
                buckets = pa.array((h % np.uint64(num_buckets)).astype(np.int32))
            except ImportError:  # pragma: no cover
                import zlib

                buckets = pa.array(
                    [
                        zlib.crc32(x.encode()) % num_buckets
                        for x in joined.to_pylist()
                    ],
                    pa.int32(),
                )
        return batch.append_column("__bucket", buckets)

    def _combine(group: pa.Table) -> pa.Table:
        out = group.drop_columns(["__bucket"]).group_by(keys).aggregate(agg_specs)
        if rename:
            out = out.rename_columns([rename.get(c, c) for c in out.column_names])
        return out

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
    return bucketed.groupby("__bucket", num_partitions=num_buckets).map_groups(
        _combine, batch_format="pyarrow"
    )


_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def salted_group_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_specs: list[tuple[str, str]],
    rename: dict[str, str] | None = None,
    salt: int = 16,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Explicit key-salting for skewed hot keys: two-phase aggregation
    where phase 1 groups on ``(keys…, __salt)`` — a hot key's rows
    spread over ``salt`` sub-groups that aggregate in parallel on
    different workers — and phase 2 merges the ≤``salt`` partials per
    key.  Only associative/commutative functions (sum/count/min/max)
    are accepted; that associativity is what makes salting exact
    (SURVEY.md §4.3.3).

    The per-batch combiners inside ``bucketed_group_aggregate`` already
    bound skew at one row per (key, block); explicit salting adds
    protection for the *aggregator* side when a single key's partials
    alone overwhelm one task — the regime of the north rule's hot
    stdlib-symbol entities.
    """
    for _col, fn in agg_specs:
        if fn not in _MERGE_FN:
            raise ValueError(f"non-associative aggregate {fn!r} cannot be salted")

    def _add_salt(batch: pa.Table) -> pa.Table:
        # deterministic spread: row position within the block
        import numpy as _np

        return batch.append_column(
            "__salt", pa.array(_np.arange(batch.num_rows) % salt, pa.int32())
        )

    salted = ds.map_batches(_add_salt, batch_format="pyarrow", batch_size=None)
    phase1 = bucketed_group_aggregate(
        salted, keys=keys + ["__salt"], agg_specs=agg_specs, num_buckets=num_buckets
    )
    merge_specs = [(f"{c}_{fn}", _MERGE_FN[fn]) for c, fn in agg_specs]
    phase1 = phase1.drop_columns(["__salt"])
    final_rename = {}
    for (c, fn), (pc_, mfn) in zip(agg_specs, merge_specs):
        out_default = f"{pc_}_{mfn}"
        target = (rename or {}).get(f"{c}_{fn}", f"{c}_{fn}")
        final_rename[out_default] = target
    return bucketed_group_aggregate(
        phase1, keys=keys, agg_specs=merge_specs, rename=final_rename,
        num_buckets=num_buckets,
    )


def _arrow_schema(ds: ray.data.Dataset):
    """Best-effort ``pyarrow.Schema`` of a dataset (None if unknown)."""
    s = ds.schema(fetch_if_missing=True)
    base = getattr(s, "base_schema", s)
    return base if isinstance(base, pa.Schema) else None


def _drop_empty_blocks(
    mds: ray.data.Dataset, schema: pa.Schema
) -> ray.data.Dataset:
    """Rebuild a MATERIALIZED dataset without its zero-row blocks.

    ``groupby().map_groups`` / aggregate stages can emit ZERO-COLUMN
    empty blocks; a map can't repair them (Ray skips empty blocks in
    ``map_batches``), and Ray's Join hashes them into partitions that
    then lack the key fields, so Acero fails with "No match for key
    field …".  Block refs are filtered by METADATA only — nothing is
    fetched to the driver."""
    try:
        refs = [
            block_ref
            for bundle in mds.iter_internal_ref_bundles()
            for block_ref, meta in bundle.blocks
            if meta.num_rows != 0
        ]
    except Exception:  # pragma: no cover - internal-API drift guard
        return mds
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def _joined_schema(
    left_schema: pa.Schema,
    right_schema: pa.Schema | None,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None,
    join_type: str,
) -> pa.Schema:
    """Schema ``Dataset.join`` would produce: left columns, plus (for
    non-semi/anti joins) the right columns minus the right join keys
    (Acero merges key columns into the left-named ones)."""
    if join_type in ("left_semi", "left_anti") or right_schema is None:
        return left_schema
    rkeys = set(right_on or on)
    fields = list(left_schema) + [f for f in right_schema if f.name not in rkeys]
    names = [f.name for f in fields]
    if len(names) != len(set(names)):
        # this wrapper passes no suffixes to Dataset.join, so a shared
        # non-key column name is ambiguous on the real path too — fail
        # the same way on the short-circuit path
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"hash_join: non-key column names {dupes} exist on both "
            f"sides; rename or drop before joining (suffixes are not "
            f"supported by this wrapper)"
        )
    return pa.schema(fields)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    stepwise: bool = True,
) -> ray.data.Dataset:
    """Shuffle hash join wrapper around ``Dataset.join`` with the
    tiny-cluster mitigations this repo standardizes on: materialize the
    inputs first (``stepwise=True``) so the join's aggregator actors
    start with free CPUs — stacked lazy joins deadlock below ~8 CPUs
    when each join's aggregators issue ``request_resources``
    concurrently.  On a real cluster pass ``stepwise=False`` and let
    the joins pipeline.

    Empty inputs short-circuit (Ray's Join builds schema-less empty
    partition tables when an input has zero blocks and Acero then fails
    to find the key fields) — the short-circuit result carries the FULL
    joined schema, not just the left side's.  The short-circuit is
    implemented for ``inner`` / ``left_semi`` / ``left_anti`` /
    ``left_outer``; the right/full outer variants pass through when
    both inputs are non-empty and raise LOUDLY (never a silent empty)
    when one is empty."""
    if num_partitions is None:
        # join aggregators each pin a CPU — a fraction of the cluster,
        # not one per core, or they starve the upstream map stages
        num_partitions = partitions_for(scale=0.125, minimum=4)
    if stepwise:
        left = left.materialize()
        right = right.materialize()
        left_empty = left.count() == 0
        right_empty = right.count() == 0
        if left_empty or right_empty:
            lsch, rsch = _arrow_schema(left), _arrow_schema(right)
            if join_type == "left_anti" and not left_empty:
                return left  # nothing on the right ⇒ every left row survives
            if lsch is not None and (
                join_type in ("inner", "left_semi", "left_anti")
                or (join_type == "left_outer" and left_empty)
            ):
                empty = _joined_schema(
                    lsch, rsch, on, right_on, join_type
                ).empty_table()
                return ray.data.from_arrow(empty)
            if join_type == "left_outer" and rsch is not None:
                # right side empty: left rows + typed null right columns
                extra = [
                    f for f in rsch if f.name not in set(right_on or on)
                ]

                def _nulls(b: pa.Table) -> pa.Table:
                    for f in extra:
                        b = b.append_column(f.name, pa.nulls(b.num_rows, f.type))
                    return b

                return left.map_batches(
                    _nulls, batch_format="pyarrow", batch_size=None
                )
            if join_type in ("inner", "left_semi", "left_anti"):
                # an empty result is CORRECT here (anti with non-empty
                # left already returned above); only the schema is
                # degraded because the empty input carried none
                return left.limit(0)
            # A silent empty would be WRONG for the outer-join family
            # (full_outer with one empty side must still emit the other
            # side's rows; schemaless left_outer can't build its null
            # columns) — fail loudly instead of returning a wrong result.
            raise ValueError(
                f"hash_join: empty-input short-circuit not implemented "
                f"for join_type={join_type!r} (or input schema is "
                f"unrecoverable); handle the empty case at the call site"
            )
        lsch, rsch = _arrow_schema(left), _arrow_schema(right)
        if lsch is not None:
            left = _drop_empty_blocks(left, lsch)
        if rsch is not None:
            right = _drop_empty_blocks(right, rsch)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def distinct(
    ds: ray.data.Dataset, keys: list[str], num_partitions: int | None = None
) -> ray.data.Dataset:
    """Distributed DISTINCT: local per-batch dedup (combiner) then
    global groupby.  Raise ``num_partitions`` for high-cardinality keys
    (each partition is one aggregator actor)."""

    def _local(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    local = ds.map_batches(_local, batch_format="pyarrow")
    if num_partitions is None:
        num_partitions = partitions_for(scale=0.25, minimum=8)
    grouped = local.groupby(keys, num_partitions=num_partitions).count()
    return grouped.drop_columns(["count()"])


def grouped_quantiles(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    out_col: str = "value",
) -> ray.data.Dataset:
    """EXACT distributed quantiles for discrete/bounded-cardinality
    numeric columns (cents-scaled money, token counts, …): a combiner
    value-count aggregation shrinks the data to one row per
    (key, distinct value) — the only shuffle — then each key's tiny
    histogram is scanned for the smallest value whose cumulative count
    reaches ``ceil(q·total)``.

    This is the quantile shape that scales: the shuffle volume is the
    value cardinality, never the row count (for continuous doubles use
    a t-digest sketch instead; not needed for the integer-scaled
    columns this engine standardizes on).
    Output: (keys…, q, ``out_col``)."""
    import math

    counts = pre_aggregated(
        ds.select_columns(keys + [value_col]),
        keys=keys + [value_col],
        aggs={"__n": f"{value_col}:count"},
    )

    def _pick(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(value_col, "ascending")])
        g = group.take(order)
        import numpy as np

        ns = np.asarray(g["__n"], dtype=np.int64)
        cum = np.cumsum(ns)
        total = int(cum[-1])
        vals = g[value_col]
        out_cols: dict = {k: [] for k in keys}
        qs_out, v_out = [], []
        for q in quantiles:
            rank = max(1, math.ceil(q * total))
            idx = int(np.searchsorted(cum, rank))
            for k in keys:
                out_cols[k].append(g[k][0].as_py())
            qs_out.append(q)
            v_out.append(vals[idx].as_py())
        tbl = {k: pa.array(out_cols[k], g[k].type) for k in keys}
        tbl["q"] = pa.array(qs_out, pa.float64())
        tbl[out_col] = pa.array(v_out, vals.type)
        return pa.table(tbl)

    return counts.groupby(keys).map_groups(_pick, batch_format="pyarrow")


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    anti: bool = False,
    exact_verify: bool = True,
) -> ray.data.Dataset:
    """Semi/anti join where the right side is too big to BROADCAST
    exactly but far smaller than the left — the 100-TB prefilter
    pattern: a Bloom filter of the right keys cuts the left side to
    ~matches (+ a false-positive sliver) BEFORE the exact hash join
    touches it, so the expensive exchange moves only candidate rows.

    The filter build is scale-safe by construction: per-block key
    hashing emits DISTINCT set-bit positions, a distributed distinct
    reduces them, and only the positions land on the driver — bounded
    by ``m_bits/8`` bytes (128 KiB at the default) REGARDLESS of right
    cardinality.  The packed filter broadcasts once via ``ray.put``.

    With ``exact_verify=True`` (default) a ``left_semi``/``left_anti``
    hash join runs on the prefiltered remainder, so the result is EXACT
    — false positives only cost the sliver's join traffic (rate
    ≈ (1-e^{-kn/m})^k; ~2e-4 at n=50k, defaults).  ``False`` skips the
    join for pure-filter semantics (semi may keep false positives;
    never drops a true match — anti requires exact_verify).

    Integer keys only (the id-join shape this engine standardizes on).
    """
    import numpy as np

    from ..functions.hashing import _mix32

    if anti and not exact_verify:
        raise ValueError("anti join requires exact_verify (FPs would drop rows)")
    right_on = right_on or on
    n_words = (m_bits + 63) // 64

    def _probes(vals):
        """The k double-hashed bit positions per value (shared by the
        build and both filter directions — ONE implementation)."""
        x = vals.astype(np.uint64)
        h1 = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
        h2 = _mix32(h1 ^ np.uint64(0x9E3779B9)) | np.uint64(1)  # odd stride
        return [
            (h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(n_hashes)
        ]

    def _hit_mask(vals, f):
        hit = np.ones(len(vals), dtype=bool)
        for p in _probes(vals):
            hit &= (
                f[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))
            ) & np.uint64(1) != 0
        return hit

    def _bit_positions(batch: pa.Table) -> pa.Table:
        vals = batch[right_on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.unique(np.concatenate(_probes(vals)))
        return pa.table({"bit": pa.array(pos.astype(np.int64))})

    bits_ds = distinct(
        right.select_columns([right_on]).map_batches(
            _bit_positions, batch_format="pyarrow", batch_size=None
        ),
        ["bit"],
    )
    # bounded driver collection: ≤ m_bits rows of one int64 — 8 MiB at
    # m=2^20 worst case, independent of right-side row count
    bit_tables = [t for t in ray.get(bits_ds.to_arrow_refs()) if t.num_rows]
    filt = np.zeros(n_words, dtype=np.uint64)
    if bit_tables:
        pos = pa.concat_tables(bit_tables)["bit"].to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        np.bitwise_or.at(
            filt, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    filt_ref = ray.put(filt)

    def _prefilter(batch: pa.Table) -> pa.Table:
        f = ray.get(filt_ref) if isinstance(filt_ref, ray.ObjectRef) else filt_ref
        vals = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_hit_mask(vals, f)))

    candidates = left.map_batches(
        _prefilter, batch_format="pyarrow", batch_size=None
    )
    if not exact_verify:
        return candidates
    if anti:
        # exact anti: rows the filter rejected are DEFINITELY non-matches
        # (no false negatives) — they join the exact anti-join of the
        # candidate sliver
        def _prefilter_miss(batch: pa.Table) -> pa.Table:
            f = ray.get(filt_ref) if isinstance(filt_ref, ray.ObjectRef) else filt_ref
            vals = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~_hit_mask(vals, f)))

        misses = left.map_batches(
            _prefilter_miss, batch_format="pyarrow", batch_size=None
        )
        verified = hash_join(
            candidates, right.select_columns([right_on]),
            on=(on,), right_on=(right_on,), join_type="left_anti",
        )
        return misses.union(verified)
    return hash_join(
        candidates, right.select_columns([right_on]),
        on=(on,), right_on=(right_on,), join_type="left_semi",
    )


def approx_quantiles_tdigest(
    ds: ray.data.Dataset,
    value_col: str,
    quantiles: list[float],
    delta: int | None = None,
    out_col: str = "value",
) -> ray.data.Dataset:
    """APPROXIMATE quantiles for CONTINUOUS numeric columns — the
    companion to :func:`grouped_quantiles` (which is exact but requires
    bounded value cardinality): a t-digest-style mergeable centroid
    sketch.

    Tree shape (every level streams, nothing driver-side):

    1. each block compresses to ≤ ~delta (mean, count) centroids;
    2. centroid rows shuffle into ``partitions_for()`` buckets (hash of
       the mean — any value-space split is valid, the final merge
       re-compresses) and each bucket compresses again;
    3. one final group compresses the ≤ buckets × delta survivors and
       interpolates the requested quantiles.

    Shuffle volume is O(delta × blocks) rows of two doubles — corpus
    size never appears.  Rank error ~1/delta (uniform budget), pinned
    by accuracy tests; estimates depend on block layout (inherent to
    any mergeable quantile sketch at fixed size).  Output: (q, out_col).
    """
    import numpy as np

    from ..functions.sketch import TDIGEST_DELTA, tdigest_compress, tdigest_quantiles

    delta = TDIGEST_DELTA if delta is None else delta
    num_buckets = partitions_for(scale=0.25, minimum=4)

    def _block_digest(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        vals = vals[~np.isnan(vals)]
        m, c = tdigest_compress(vals, np.ones(len(vals), dtype=np.int64), delta)
        # bucket by a hash of the mean bits: deterministic, value-space
        # agnostic (the final merge is order-insensitive anyway)
        bits = m.view(np.uint64)
        mixed = (bits ^ (bits >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        return pa.table(
            {
                "__bucket": pa.array(
                    (mixed % np.uint64(num_buckets)).astype(np.int32)
                ),
                "mean": pa.array(m),
                "count": pa.array(c),
            }
        )

    def _merge_bucket(group: pa.Table) -> pa.Table:
        m, c = tdigest_compress(
            group["mean"].to_numpy(zero_copy_only=False),
            group["count"].to_numpy(zero_copy_only=False),
            delta,
        )
        return pa.table(
            {
                "__final": pa.array(np.zeros(len(m), dtype=np.int32)),
                "mean": pa.array(m),
                "count": pa.array(c),
            }
        )

    def _finalize(group: pa.Table) -> pa.Table:
        m, c = tdigest_compress(
            group["mean"].to_numpy(zero_copy_only=False),
            group["count"].to_numpy(zero_copy_only=False),
            delta,
        )
        est = tdigest_quantiles(m, c, quantiles)
        return pa.table(
            {
                "q": pa.array(quantiles, pa.float64()),
                out_col: pa.array(est, pa.float64()),
            }
        )

    digests = ds.select_columns([value_col]).map_batches(
        _block_digest, batch_format="pyarrow", batch_size=None
    )
    merged = digests.groupby("__bucket").map_groups(
        _merge_bucket, batch_format="pyarrow"
    )
    return merged.groupby("__final").map_groups(_finalize, batch_format="pyarrow")


def approx_quantiles_tdigest_grouped(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    delta: int | None = None,
    out_col: str = "value",
) -> ray.data.Dataset:
    """Per-key approximate quantiles via the mergeable t-digest — the
    grouped companion to :func:`approx_quantiles_tdigest` (exact
    per-key quantiles for bounded-cardinality values live in
    :func:`grouped_quantiles`).

    Tree: per-(block, key) digests → (key, block-hash bucket) merge —
    bounds any hot key's per-task centroid pile at
    O(delta × blocks/bucket) — → per-key final merge + interpolation.
    Shuffle volume is O(delta × keys-per-block × blocks); row count
    never appears.  Output: (keys…, q, out_col)."""
    import numpy as np

    from ..functions.sketch import TDIGEST_DELTA, tdigest_compress, tdigest_quantiles

    delta = TDIGEST_DELTA if delta is None else delta
    num_buckets = partitions_for(scale=0.25, minimum=4)

    def _block_digests(batch: pa.Table) -> pa.Table:
        cols: dict = {k: [] for k in keys}
        means: list[np.ndarray] = []
        counts: list[np.ndarray] = []
        buckets: list[np.ndarray] = []
        grouped = batch.select(keys + [value_col]).group_by(keys).aggregate(
            [(value_col, "list")]
        )
        lists = grouped[f"{value_col}_list"]
        for gi in range(grouped.num_rows):
            vals = np.asarray(lists[gi].as_py(), dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            m, c = tdigest_compress(
                vals, np.ones(len(vals), dtype=np.int64), delta
            )
            for k in keys:
                cols[k].extend([grouped[k][gi].as_py()] * len(m))
            means.append(m)
            counts.append(c)
            bits = m.view(np.uint64)
            mixed = (bits ^ (bits >> np.uint64(33))) * np.uint64(
                0xFF51AFD7ED558CCD
            )
            buckets.append((mixed % np.uint64(num_buckets)).astype(np.int32))
        out = {k: pa.array(cols[k], batch[k].type) for k in keys}
        out["__bucket"] = pa.array(
            np.concatenate(buckets) if buckets else np.array([], np.int32)
        )
        out["mean"] = pa.array(
            np.concatenate(means) if means else np.array([], np.float64)
        )
        out["count"] = pa.array(
            np.concatenate(counts) if counts else np.array([], np.int64)
        )
        return pa.table(out)

    def _merge_bucket(group: pa.Table) -> pa.Table:
        m, c = tdigest_compress(
            group["mean"].to_numpy(zero_copy_only=False),
            group["count"].to_numpy(zero_copy_only=False),
            delta,
        )
        out = {k: pa.array([group[k][0].as_py()] * len(m), group[k].type) for k in keys}
        out["mean"] = pa.array(m)
        out["count"] = pa.array(c)
        return pa.table(out)

    def _finalize(group: pa.Table) -> pa.Table:
        m, c = tdigest_compress(
            group["mean"].to_numpy(zero_copy_only=False),
            group["count"].to_numpy(zero_copy_only=False),
            delta,
        )
        est = tdigest_quantiles(m, c, quantiles)
        out = {
            k: pa.array([group[k][0].as_py()] * len(quantiles), group[k].type)
            for k in keys
        }
        out["q"] = pa.array(quantiles, pa.float64())
        out[out_col] = pa.array(est, pa.float64())
        return pa.table(out)

    digests = ds.map_batches(
        _block_digests, batch_format="pyarrow", batch_size=None
    )
    merged = digests.groupby(keys + ["__bucket"]).map_groups(
        _merge_bucket, batch_format="pyarrow"
    )
    return merged.groupby(keys).map_groups(_finalize, batch_format="pyarrow")


def approx_distinct_registers(
    ds: ray.data.Dataset, col: str, p: int | None = None
) -> ray.data.Dataset:
    """HyperLogLog register set for the distinct count of an integer
    column: every block reduces to ≤ 2^p (bucket, rho) partials that
    merge with ``max`` — associative and skew-immune; total shuffle
    volume is O(2^p × blocks) regardless of row count.  Output:
    (bucket, register), integer-exact and deterministic (splitmix64,
    no seed), so the SQL oracle verifies the full register set; the
    float estimate is ``functions.sketch.hll_estimate`` (test-gated,
    σ ≈ 1.6 % at the default p=12)."""
    import numpy as np

    from ..functions.sketch import HLL_P, hll_partial

    p = HLL_P if p is None else p

    def _partial(batch: pa.Table) -> pa.Table:
        vals = (
            batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        if len(vals) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        b, r = hll_partial(vals, p)
        return pa.table({"bucket": pa.array(b), "rho": pa.array(r)})

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    return pre_aggregated(
        partials,
        keys=["bucket"],
        aggs={"register": "rho:max"},
    )


def pivot_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    pivot_col: str,
    value_col: str,
    categories: list[str],
    agg: str = "sum",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Wide (pivoted) aggregation: one output column per ``categories``
    entry, ``<category>_<agg>`` = agg of ``value_col`` over the rows
    whose ``pivot_col`` equals that category.

    Shuffle shape: each block collapses to ≤ |keys-cardinality| rows of
    |categories| masked partials BEFORE the exchange (per-batch Arrow
    group_by over conditional columns), then one small groupby merges —
    the classic conditional-aggregation pivot, never a per-category
    pass over the data.  ``categories`` must be given explicitly: a
    data-dependent column set would make the output schema depend on
    which blocks a partition saw (and an unexpected category is a
    pipeline bug, not a schema change) — rows outside ``categories``
    are ignored.  ``agg`` ∈ sum | count | min | max.

    Null semantics match ``<AGG>(CASE WHEN pivot=c THEN value END)``:
    null values never contribute to sum/min/max (a null value under a
    matching category is skipped, not propagated); ``count`` counts
    matching ROWS (``COUNT(CASE WHEN pivot=c THEN 1 END)``).  min/max
    of a category with no (non-null) rows is NULL, like SQL; sum/count
    yield 0 there (the masked-partial identity — the documented
    divergence from SQL's NULL-sum, covered by COALESCE in the
    oracles)."""
    if agg not in ("sum", "count", "min", "max"):
        raise ValueError(f"pivot agg must be sum|count|min|max, got {agg!r}")
    import numpy as np

    cat_cols = {c: f"{c}_{agg}" for c in categories}

    def _partial(batch: pa.Table) -> pa.Table:
        piv = batch[pivot_col].to_numpy(zero_copy_only=False)
        if agg in ("sum", "min", "max"):
            vt = batch[value_col].type
            # integer value columns aggregate exactly (order-independent
            # — the fixed-point-cents discipline of the oracle queries);
            # floats sum as float64 with the usual reduction-order caveat
            exact = pa.types.is_integer(vt)
            out_type = pa.int64() if exact else pa.float64()
            vals = batch[value_col].cast(out_type)
        else:  # count: rows matching the category, value nulls included
            exact = True
            out_type = pa.int64()
            vals = pa.chunked_array(
                [pa.array(np.ones(batch.num_rows, dtype=np.int64))]
            )
        cols = {k: batch[k] for k in keys}
        if agg in ("sum", "count"):
            # masked partial with a 0 identity; null values contribute 0
            # (= SQL sum skipping nulls)
            val = vals.fill_null(0).to_numpy(zero_copy_only=False)
            zero = 0 if exact else 0.0
            for c, out_name in cat_cols.items():
                cols[out_name] = pa.array(np.where(piv == c, val, zero), out_type)
        else:
            # masked partial with a NULL identity: non-matching rows
            # (and null values) are nulls, which Arrow's group min/max
            # skip — a category with no rows stays NULL, like SQL
            valid = pc.is_valid(vals).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            val = vals.fill_null(0).to_numpy(zero_copy_only=False)
            for c, out_name in cat_cols.items():
                m = (piv == c) & valid
                cols[out_name] = pa.array(
                    np.where(m, val, 0), out_type, mask=~m
                )
        return (
            pa.table(cols)
            .group_by(keys)
            .aggregate([(n, agg if agg in ("min", "max") else "sum") for n in cat_cols.values()])
            .rename_columns(keys + list(cat_cols.values()))
        )

    merge_fn = _PARTIAL_OF[agg]
    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return pre_aggregated(
        partials,
        keys=keys,
        aggs={n: f"{n}:{merge_fn}" for n in cat_cols.values()},
        num_partitions=num_partitions,
    )


def unpivot(
    ds: ray.data.Dataset,
    keys: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Melt wide → long: one output row per (input row, value column),
    ``var_name`` holding the source column name.  Pure per-batch Arrow
    reshape (column slices concatenated, keys repeated via take) —
    zero shuffle, embarrassingly parallel, the inverse of
    ``pivot_aggregate``."""
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(list(range(n)) * len(value_cols), pa.int64())
        cols = {k: pc.take(batch[k], idx) for k in keys}
        cols[var_name] = pa.array(
            [c for c in value_cols for _ in range(n)], pa.string()
        )
        cols[value_name] = pa.concat_arrays(
            [
                pc.cast(batch[c], pa.float64()).combine_chunks()
                for c in value_cols
            ]
        )
        return pa.table(cols)

    return ds.map_batches(_melt, batch_format="pyarrow")
