"""Deduplication operators over document tables.

Training-data-pipeline extensions (first-class components alongside the
KG operators). All follow the same two-phase shape: a per-batch local
combiner caps any hot key's shuffle volume at one row per block (the
partial/salted-aggregation pattern of SURVEY.md §4.3.3), then a global
groupby finishes the reduction.

* ``exact_dedup``        — keep the min-id row per identical text
* ``fingerprint_dedup``  — same via md5 fingerprint (hash-partition
                           dedup; the form that scales to 100 TB since
                           the shuffle carries 32-byte keys, not bodies)
* ``minhash_lsh_pairs``  — MinHash signatures → LSH banding → bucket
                           groupby → near-dup candidate pairs
* ``simhash_pairs``      — 64-bit SimHash, banded buckets, exact
                           hamming verify
* ``ngram_jaccard_pairs``— EXACT word-n-gram Jaccard pairs via
                           shared-gram buckets + hash joins (perfect
                           recall, no LSH estimate)
* ``embedding_near_dup_pairs`` — random-hyperplane LSH buckets over an
                           embedding column, exact cosine verify
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import (
    lsh_band_keys,
    minhash_signature,
    ngram_set,
    simhash64,
)

# Skew guard for pairwise work inside a bucket: a bucket bigger than
# this contributes only its first MAX_BUCKET members (sorted by id) to
# pair generation, and the overflow is surfaced in a `truncated` column
# rather than silently dropped.
MAX_BUCKET = 256

# per-worker cache for the broadcast minhash signature matrix (the
# similarity-stage task-pool economics: ray.put once, zero-copy read,
# cached per worker process keyed by the ObjectRef hex)
_MINHASH_BCAST_CACHE: dict[str, tuple] = {}


def _keep_min_id_local(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """First row per text value within a block — vectorized: sort by
    (text, id), keep rows whose text differs from the previous row
    (Arrow neighbor-compare, no Python loop)."""
    order = pc.sort_indices(
        batch, sort_keys=[(text_col, "ascending"), (id_col, "ascending")]
    )
    sorted_batch = batch.take(order)
    n = sorted_batch.num_rows
    if n <= 1:
        return sorted_batch
    texts = sorted_batch[text_col].combine_chunks()
    a, b = texts.slice(1), texts.slice(0, n - 1)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    neq = pc.fill_null(pc.not_equal(a, b), True)  # one-side-null → differs
    keep_tail = pc.and_(neq, pc.invert(both_null))
    keep = pa.concat_arrays([pa.array([True]), keep_tail.combine_chunks() if isinstance(keep_tail, pa.ChunkedArray) else keep_tail])
    return sorted_batch.filter(keep)


def _keep_min_id_group(batch: pa.Table, id_col: str) -> pa.Table:
    return batch.take(pc.sort_indices(batch, sort_keys=[(id_col, "ascending")])).slice(0, 1)


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Distinct-by-content, keep-first (min id) — the reference's only
    dedup is rdflib set semantics (D1); this is its document-level
    generalization."""
    local = ds.map_batches(
        _keep_min_id_local,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col},
    )
    return local.groupby(text_col).map_groups(
        _keep_min_id_group, batch_format="pyarrow", fn_kwargs={"id_col": id_col}
    )


def _fingerprint_batch(batch: pa.Table, text_col: str) -> pa.Table:
    import hashlib

    fps = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def fingerprint_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Hash-fingerprint dedup: group on md5(text), keep min id.  At
    scale, drop the body columns before the shuffle and join survivors
    back — here the bodies are small enough to carry."""
    with_fp = ds.map_batches(
        _fingerprint_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    local = with_fp.map_batches(
        _keep_min_id_local,
        batch_format="pyarrow",
        fn_kwargs={"text_col": "fingerprint", "id_col": id_col},
    )
    return local.groupby("fingerprint").map_groups(
        _keep_min_id_group, batch_format="pyarrow", fn_kwargs={"id_col": id_col}
    )


class MinHashActor:
    """Signature computation as an actor pool: the permutation
    parameters build once per actor, batches stream through."""

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        text_col: str = "text",
        shingle: str = "char",
    ):
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.shingle = shingle
        minhash_signature("warmup", num_perm, shingle_k, shingle)  # build param cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        # The signature is carried as a little-endian uint32 blob: joins
        # accept binary payload columns (Acero rejects fixed_size_list
        # non-key fields) and the blob is the leanest shuffle encoding.
        sigs = [
            minhash_signature(t or "", self.num_perm, self.k, self.shingle).tobytes()
            for t in batch[self.text_col].to_pylist()
        ]
        # large_binary (int64 offsets): when a pathological corpus makes
        # candidate pairs explode, the signature-attach join output can
        # exceed 2 GiB of payload per block — int32 binary offsets then
        # overflow inside the NEXT hash-shuffle partition (ArrowInvalid:
        # "offset overflow while concatenating arrays").  Acero accepts
        # large_binary payloads, and the type can never overflow.
        return batch.append_column("minhash", pa.array(sigs, pa.large_binary()))


def _band_explode(batch: pa.Table, bands: int, id_col: str) -> pa.Table:
    """(band_key, id) rows ONLY — the signature does NOT ride the band
    shuffle (it used to, multiplying shuffle volume by the band count on
    the widest column; signatures are re-attached to the *candidate
    pairs* afterwards via two hash joins against the signature table)."""
    ids = batch[id_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_ids, out_keys = [], []
    for i, sig in zip(ids, sigs):
        sig_arr = np.frombuffer(sig, dtype=np.uint32)
        if not sig_arr.any():  # empty document (no shingles): a
            continue  # zero signature matches only other empty docs —
            # meaningless pairs; excluded (and the SQL oracle agrees)
        for key in lsh_band_keys(sig_arr, bands):
            out_ids.append(i)
            out_keys.append(key)
    return pa.table(
        {
            "band_key": pa.array(out_keys, pa.string()),
            id_col: pa.array(out_ids),
        }
    )


def _bucket_candidates(
    group: pa.Table, id_col: str, max_bucket: int = MAX_BUCKET
) -> pa.Table:
    """All (a < b) pairs within one band bucket, skew-capped at
    ``max_bucket`` smallest ids (the overflow is flagged, not silent)."""
    id_type = group[id_col].type
    ids = sorted(group[id_col].to_pylist())
    truncated = len(ids) > max_bucket
    ids = ids[:max_bucket]
    n = len(ids)
    if n < 2:  # typed empty — np.asarray([]) would infer float64
        return pa.table(
            {
                "id_a": pa.array([], id_type),
                "id_b": pa.array([], id_type),
                "truncated": pa.array([], pa.bool_()),
            }
        )
    arr = np.asarray(ids)
    xi, yi = np.triu_indices(n, k=1)
    return pa.table(
        {
            "id_a": pa.array(arr[xi]),
            "id_b": pa.array(arr[yi]),
            "truncated": pa.array([truncated] * len(xi), pa.bool_()),
        }
    )


def _pair_reduce(
    ds: ray.data.Dataset,
    agg_specs: list[tuple[str, str]],
    rename: dict[str, str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Reduce over (id_a, id_b) pair keys via the int32-bucket + Arrow
    ``group_by`` path (Ray's native multi-key aggregator is the
    measured bottleneck at high pair counts: 5s for 600k pairs vs <1s
    bucketed).  A per-batch Arrow combine runs before the shuffle so a
    pair surfacing in many buckets ships once per block."""
    from .relational import bucketed_group_aggregate

    def _local(batch: pa.Table) -> pa.Table:
        return batch.group_by(["id_a", "id_b"]).aggregate(agg_specs)

    pre = ds.map_batches(_local, batch_format="pyarrow")
    # after the local combine the columns are <col>_<fn>; the global
    # merge re-aggregates them with the matching merge fn
    merge_specs = []
    merge_rename = {}
    for col, fn in agg_specs:
        local_name = f"{col}_{fn}"
        mfn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[fn]
        merge_specs.append((local_name, mfn))
        target = (rename or {}).get(local_name, local_name)
        merge_rename[f"{local_name}_{mfn}"] = target
    return bucketed_group_aggregate(
        pre,
        keys=["id_a", "id_b"],
        agg_specs=merge_specs,
        rename=merge_rename,
        num_buckets=num_buckets,
    )


def _distinct_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A pair can surface from several bands/buckets → distinct on
    (id_a, id_b)."""
    return _pair_reduce(ds, [])


_ATTACH_BCAST_CACHE: dict[str, tuple] = {}


def _attach_pair_column(
    pairs: ray.data.Dataset,
    table: ray.data.Dataset,
    id_col: str,
    value_col: str,
    num_partitions: int | None = None,
    stepwise: bool = True,
    broadcast_max_rows: int | None = None,
) -> ray.data.Dataset:
    """Join ``value_col`` onto both pair sides → ``<value>_a``,
    ``<value>_b`` (two hash joins — no driver-side materialization of
    the value table).

    ``broadcast_max_rows`` (NUMERIC value columns only, requires
    ``stepwise``) size-switches to a zero-join broadcast lookup when
    the value table is small enough: sorted id axis + value vector via
    ``ray.put``, searchsorted per pair batch — the two fixed-cost hash
    joins disappear.  Beyond the cap the joins run unchanged (the
    100-TB path)."""
    from .relational import hash_join

    if broadcast_max_rows is not None and stepwise:
        table = table.materialize()
        if table.count() <= broadcast_max_rows:
            ids_parts, val_parts = [], []
            for bt in table.iter_batches(batch_format="pyarrow"):
                if bt.num_rows == 0:
                    continue
                ids_parts.append(bt[id_col].to_numpy(zero_copy_only=False))
                val_parts.append(bt[value_col].to_numpy(zero_copy_only=False))
            # the value column's Arrow type keeps empty outputs
            # schema-identical to the hash-join path (which types them
            # from the table) even for non-int64 numerics
            try:
                val_type = table.schema().base_schema.field(value_col).type
            except (AttributeError, KeyError):  # pragma: no cover
                val_type = pa.int64()
            if not ids_parts:
                # empty value table ⇒ inner-join semantics: zero rows,
                # FULL pair schema plus typed <value>_a/_b columns
                def _empty(batch: pa.Table) -> pa.Table:
                    return (
                        batch.slice(0, 0)
                        .append_column(f"{value_col}_a", pa.array([], val_type))
                        .append_column(f"{value_col}_b", pa.array([], val_type))
                    )

                return pairs.map_batches(_empty, batch_format="pyarrow")
            ids_all = np.concatenate(ids_parts)
            order = np.argsort(ids_all)
            ids_sorted = ids_all[order]
            # the searchsorted lookup requires a UNIQUE id axis — with
            # duplicate ids it would silently take the first match
            # where the join path fans out one row per duplicate
            if len(ids_sorted) > 1 and (ids_sorted[1:] == ids_sorted[:-1]).any():
                raise ValueError(
                    f"_attach_pair_column broadcast: duplicate {id_col} "
                    f"in the {value_col} table — ids must be unique"
                )
            ref = ray.put((ids_sorted, np.concatenate(val_parts)[order]))

            def _lookup(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return batch.append_column(
                        f"{value_col}_a", pa.array([], val_type)
                    ).append_column(f"{value_col}_b", pa.array([], val_type))
                from .similarity import _broadcast_cached

                ids_s, vals_s = _broadcast_cached(
                    _ATTACH_BCAST_CACHE, ref, lambda v: v
                )
                a = batch["id_a"].to_numpy(zero_copy_only=False)
                b = batch["id_b"].to_numpy(zero_copy_only=False)
                last = len(ids_s) - 1
                ia = np.minimum(np.searchsorted(ids_s, a), last)
                ib = np.minimum(np.searchsorted(ids_s, b), last)
                if not (
                    np.array_equal(ids_s[ia], a) and np.array_equal(ids_s[ib], b)
                ):
                    raise RuntimeError(
                        f"_attach_pair_column broadcast: pair id missing "
                        f"from the {value_col} table"
                    )
                return batch.append_column(
                    f"{value_col}_a", pa.array(vals_s[ia])
                ).append_column(f"{value_col}_b", pa.array(vals_s[ib]))

            return pairs.map_batches(_lookup, batch_format="pyarrow")

    def _renamer(mapping):
        def _fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([mapping.get(c, c) for c in b.column_names])

        return _fn

    side_a = table.map_batches(
        _renamer({id_col: "id_a", value_col: f"{value_col}_a"}),
        batch_format="pyarrow",
    )
    out = hash_join(
        pairs, side_a, on=("id_a",), num_partitions=num_partitions, stepwise=stepwise
    )
    side_b = table.map_batches(
        _renamer({id_col: "id_b", value_col: f"{value_col}_b"}),
        batch_format="pyarrow",
    )
    return hash_join(
        out, side_b, on=("id_b",), num_partitions=num_partitions, stepwise=stepwise
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int | tuple = (1, 4),
    stepwise: bool = True,
    max_bucket: int = MAX_BUCKET,
    max_pair_ratio: float | None = 64.0,
    shingle: str = "char",
    shingle_k: int = 5,
    broadcast_max_docs: int | None = 1_000_000,
) -> ray.data.Dataset:
    """shingle → minhash → band → bucket groupby → candidate pairs →
    signature joins → estimated Jaccard ≥ threshold.
    Output: (id_a, id_b, est_jaccard).

    ``shingle="char"`` (default, k-char shingles) matches the original
    short-text form; ``shingle="word"`` (k-WORD shingles) is the
    document-scale mode — long random documents share most of their
    char-k-grams, so char mode floods the banding on full-page
    corpora; word grams make random-pair similarity ≈ 0 (see
    ``functions.hashing.word_shingles``).  Both modes have value-exact
    SQL oracles.

    Shuffle shape: band rows carry (band_key, id) only; full signatures
    move exactly twice (once per pair side) keyed by id, not once per
    band.  ``stepwise`` materializes around the joins (tiny-cluster
    deadlock guard; turn off on real clusters).

    ``max_pair_ratio`` is an LSH-adversarial-corpus guard (stepwise
    mode only, where the pair count is free after the materialize): a
    corpus whose documents are all mutually similar — tiny shared
    vocabulary, boilerplate-dominated pages — collides essentially
    every band bucket, and even with the ``max_bucket`` cap the
    candidate count approaches buckets × C(cap, 2) ≫ |docs|.  The
    signature-attach joins then ship pairs × 2 signatures — measured
    to die mid-shuffle on a 500 k-doc/48-word-vocab corpus.  When
    distinct candidates exceed ``max_pair_ratio × |docs|`` this raises
    a RuntimeError naming the knobs (raise ``threshold``/``bands``
    selectivity, lower ``max_bucket``, or pre-filter boilerplate)
    instead of failing cryptically inside a shuffle.  ``None``
    disables the guard.

    ``broadcast_max_docs`` size-switches the signature attach: up to
    that many docs (~256 MB of uint32 lanes per million docs at
    num_perm=64) the signature matrix broadcasts once via ``ray.put``
    and the estimate runs as a zero-join vectorized lookup
    (searchsorted on the sorted id axis) — the two fixed-cost hash
    joins disappear.  Beyond the cap — the 100-TB regime, where the
    signature table outgrows any single node — the two hash joins run
    unchanged.  Broadcast needs ``stepwise`` (signatures already
    materialized); ``None`` forces the join path."""
    sigs = ds.map_batches(
        MinHashActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "text_col": text_col,
            "shingle": shingle,
            "shingle_k": shingle_k,
        },
    ).select_columns([id_col, "minhash"])
    if stepwise:
        sigs = sigs.materialize()  # reused by banding AND both joins
    banded = sigs.map_batches(
        _band_explode, batch_format="pyarrow", fn_kwargs={"bands": bands, "id_col": id_col}
    )
    cand = banded.groupby("band_key").map_groups(
        _bucket_candidates,
        batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "max_bucket": max_bucket},
    )
    pairs = _distinct_pairs(cand.drop_columns(["truncated"]))
    n_docs = None
    if stepwise:
        pairs = pairs.materialize()
        n_docs = sigs.count()
        if max_pair_ratio is not None:
            n_pairs = pairs.count()
            if n_pairs > max_pair_ratio * max(n_docs, 1):
                raise RuntimeError(
                    f"minhash_lsh_pairs: {n_pairs} candidate pairs for "
                    f"{n_docs} docs (> {max_pair_ratio}×) — the corpus is "
                    "LSH-adversarial (near-uniform similarity collides most "
                    "band buckets).  Raise the banding selectivity (fewer "
                    "bands / more rows per band), raise `threshold`, lower "
                    "`max_bucket`, or pre-filter boilerplate; "
                    "`max_pair_ratio=None` disables this guard."
                )

    def _empty() -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )

    if (
        stepwise
        and broadcast_max_docs is not None
        and n_docs is not None
        and n_docs <= broadcast_max_docs
    ):
        ids_parts, sig_parts = [], []
        for bt in sigs.iter_batches(batch_format="pyarrow"):
            if bt.num_rows == 0:
                continue
            ids_parts.append(bt[id_col].to_numpy(zero_copy_only=False))
            sig_parts.append(
                np.frombuffer(
                    b"".join(bt["minhash"].to_pylist()), dtype=np.uint32
                ).reshape(bt.num_rows, -1)
            )
        if not ids_parts:
            return ray.data.from_arrow(_empty())
        ids_all = np.concatenate(ids_parts)
        sig_all = np.vstack(sig_parts)
        order = np.argsort(ids_all)
        sig_ref = ray.put((ids_all[order], np.ascontiguousarray(sig_all[order])))

        def _estimate_broadcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty()
            from .similarity import _broadcast_cached

            ids_s, sig_s = _broadcast_cached(
                _MINHASH_BCAST_CACHE, sig_ref, lambda v: v
            )
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            last = len(ids_s) - 1
            ia = np.minimum(np.searchsorted(ids_s, a), last)
            ib = np.minimum(np.searchsorted(ids_s, b), last)
            # pairs derive from banded signature rows, so every id must
            # resolve — a miss means a broadcast/pair mismatch: fail loud
            if not (np.array_equal(ids_s[ia], a) and np.array_equal(ids_s[ib], b)):
                raise RuntimeError("minhash broadcast estimate: pair id missing")
            est = (sig_s[ia] == sig_s[ib]).mean(axis=1)
            out = pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "est_jaccard": pa.array(est, pa.float64()),
                }
            )
            return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

        return pairs.map_batches(_estimate_broadcast, batch_format="pyarrow")

    with_sigs = _attach_pair_column(
        pairs, sigs, id_col, "minhash", stepwise=stepwise
    )

    def _estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty()
        sig_a = np.frombuffer(
            b"".join(batch["minhash_a"].to_pylist()), dtype=np.uint32
        ).reshape(batch.num_rows, -1)
        sig_b = np.frombuffer(
            b"".join(batch["minhash_b"].to_pylist()), dtype=np.uint32
        ).reshape(batch.num_rows, -1)
        est = (sig_a == sig_b).mean(axis=1)
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

    return with_sigs.map_batches(_estimate, batch_format="pyarrow")


def _simhash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    hs = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "simhash", pa.array(np.asarray(hs, dtype=np.uint64), pa.uint64())
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> ray.data.Dataset:
    """SimHash near-dup: band the 64-bit hash into ``bands`` slices
    (pigeonhole: distance ≤ bands-1 guarantees one identical band),
    bucket-group, exact hamming verify.  Output: (id_a, id_b, hamming)."""
    hashed = ds.map_batches(
        _simhash_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    width = 64 // bands
    mask = (1 << width) - 1

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = batch["simhash"].to_pylist()
        o_key, o_id, o_h = [], [], []
        for i, h in zip(ids, hs):
            for b in range(bands):
                o_key.append(f"{b}:{(h >> (b * width)) & mask:x}")
                o_id.append(i)
                o_h.append(h)
        return pa.table(
            {
                "band_key": pa.array(o_key, pa.string()),
                id_col: pa.array(o_id),
                "simhash": pa.array(np.asarray(o_h, dtype=np.uint64), pa.uint64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        hs = group["simhash"].to_pylist()
        order = np.argsort(ids)[:MAX_BUCKET]
        a_out, b_out, d_out = [], [], []
        for xi in range(len(order)):
            for yi in range(xi + 1, len(order)):
                x, y = int(order[xi]), int(order[yi])
                d = int(bin(hs[x] ^ hs[y]).count("1"))
                if d <= max_hamming:
                    lo, hi = sorted((ids[x], ids[y]))
                    a_out.append(lo)
                    b_out.append(hi)
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "hamming": pa.array(d_out, pa.int32()),
            }
        )

    banded = hashed.map_batches(_explode, batch_format="pyarrow")
    pairs = banded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    return _pair_reduce(
        pairs, [("hamming", "min")], rename={"hamming_min": "hamming"}
    )


def _gram_explode(
    batch: pa.Table, text_col: str, id_col: str, n: int
) -> pa.Table:
    """Distinct (id, gram_hash) rows per document — the shuffle carries
    an 8-byte md5-derived gram hash, never the gram text (both engines
    hash with md5, so an improbable collision is *shared* and results
    still agree)."""
    from ..functions.hashing import hash64

    out_ids, out_hashes = [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        for g in ngram_set(t or "", n):
            out_ids.append(i)
            out_hashes.append(hash64(g))
    return pa.table(
        {
            id_col: pa.array(out_ids),
            "gram_hash": pa.array(np.asarray(out_hashes, dtype=np.uint64)),
        }
    )


_GRAM_WARN_DF = 10_000  # exact mode: warn when one gram fans out ≥ df² pairs


def _gram_pairs(group: pa.Table, id_col: str, df_cap: int | None) -> pa.Table:
    """(a < b) pairs of docs sharing this gram.  ``df_cap=None`` is the
    exact mode (every co-occurrence counted, required for the Jaccard
    arithmetic to be exact); an integer cap trades exactness for a skew
    bound at extreme document frequencies — the capped grams are
    dropped entirely (not sampled) so intersection counts stay
    *consistent* between runs."""
    id_type = group[id_col].type
    ids = sorted(group[id_col].to_pylist())
    if df_cap is not None and len(ids) > df_cap:
        # capped gram dropped entirely — recall near the threshold
        # silently degrades, so make the drop observable per task
        import logging

        logging.getLogger(__name__).info(
            "df_cap=%d: dropping a gram shared by %d docs "
            "(near-threshold recall may degrade)",
            df_cap, len(ids),
        )
        ids = []
    elif df_cap is None and len(ids) > _GRAM_WARN_DF:
        import logging

        logging.getLogger(__name__).warning(
            "exact ngram mode: one gram is shared by %d docs -> %d pairs "
            "in a single task; pass a finite df_cap for skewed corpora",
            len(ids), len(ids) * (len(ids) - 1) // 2,
        )
    if len(ids) < 2:
        return pa.table(
            {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type)}
        )
    arr = np.asarray(ids)
    xi, yi = np.triu_indices(len(ids), k=1)
    return pa.table({"id_a": pa.array(arr[xi]), "id_b": pa.array(arr[yi])})


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    concurrency: int | tuple = (1, 4),
    df_cap: int | None = 512,
    stepwise: bool = True,
) -> ray.data.Dataset:
    """Word-n-gram Jaccard near-dup pairs, fully distributed.

    Any pair with Jaccard > 0 shares at least one n-gram, so the
    shared-gram buckets have perfect recall — no LSH estimate and no
    driver-side text materialization anywhere:

    1. explode distinct (id, gram_hash) per doc;
    2. |A| per doc via a combiner aggregation;
    3. |A ∩ B| = groupby(pair).count() over per-gram (a, b) pairs;
    4. |A|, |B| joined onto the pairs (two hash joins);
    5. jaccard = inter / (|A| + |B| - inter) ≥ threshold.

    Output: (id_a, id_b, jaccard).

    ``df_cap`` bounds skew: grams shared by more than ``df_cap`` docs
    are dropped entirely (not sampled, so runs stay consistent).  The
    DEFAULT IS FINITE — production corpora always contain stop-word
    grams shared by millions of docs, and one such gram in exact mode
    emits df·(df-1)/2 pairs inside a single task.  A dropped gram can
    only LOWER a pair's computed Jaccard (intersection shrinks while
    |A|,|B| stay full), so capping trades recall near the threshold for
    a hard per-task pair budget, never false positives at jaccard=1.
    Pass ``df_cap=None`` for the EXACT mode (required for the
    value-exact SQL oracles; a gram above ``_GRAM_WARN_DF`` docs logs a
    warning there).
    """
    from .relational import pre_aggregated

    grams = ds.select_columns([id_col, text_col]).map_batches(
        _gram_explode,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col, "n": n},
    )
    if stepwise:
        grams = grams.materialize()  # reused for sizes AND pairs
    sizes = pre_aggregated(
        grams, keys=[id_col], aggs={"n_grams": "gram_hash:count"}
    )
    per_gram = grams.groupby("gram_hash").map_groups(
        _gram_pairs,
        batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "df_cap": df_cap},
    )
    inter = _pair_reduce(
        per_gram.map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        [("one", "sum")],
        rename={"one_sum": "inter"},
    )
    # gram-count sides are one int64 per doc — broadcastable far past
    # any corpus that fits this path's exact-gram buckets
    with_sizes = _attach_pair_column(
        inter, sizes, id_col, "n_grams", stepwise=stepwise,
        broadcast_max_rows=4_000_000,
    )

    def _jaccard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        inter_n = np.asarray(batch["inter"], dtype=np.float64)
        na = np.asarray(batch["n_grams_a"], dtype=np.float64)
        nb = np.asarray(batch["n_grams_b"], dtype=np.float64)
        jac = inter_n / (na + nb - inter_n)
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return with_sizes.map_batches(_jaccard, batch_format="pyarrow")


def _cross_gram_pairs(
    group: pa.Table, df_cap: int | None
) -> pa.Table:
    """(train_id, eval_id) pairs of cross-side docs sharing this gram.
    ``df_cap`` drops the gram when EITHER side exceeds it (consistent
    runs, bounded per-task pairs); None = exact."""
    side = np.asarray(group["side"])
    ids = np.asarray(group["id"])
    t_ids = np.unique(ids[side == 0])
    e_ids = np.unique(ids[side == 1])
    if (
        len(t_ids) == 0
        or len(e_ids) == 0
        or (df_cap is not None and (len(t_ids) > df_cap or len(e_ids) > df_cap))
    ):
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
    ti, ei = np.meshgrid(t_ids, e_ids, indexing="ij")
    return pa.table(
        {
            "id_a": pa.array(ti.ravel().astype(np.int64)),
            "id_b": pa.array(ei.ravel().astype(np.int64)),
        }
    )


def cross_ngram_contamination(
    train: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = 512,
    stepwise: bool = True,
    prefilter: str = "auto",
    prefilter_exact_limit: int = 4_000_000,
) -> ray.data.Dataset:
    """Decontamination: find training documents that CONTAIN an eval
    document's n-grams — ``containment = |grams(train) ∩ grams(eval)| /
    |grams(eval)| ≥ threshold``.  The check every training pipeline
    runs before shipping a corpus (eval-set leakage), asymmetric by
    design: a long training doc fully containing a short eval doc
    scores 1.0 where Jaccard would dilute it.

    Same fully-distributed shape as :func:`ngram_jaccard_pairs` —
    shared-gram buckets have perfect recall (any pair with containment
    > 0 shares a gram), intersections reduce through bucketed pair
    counts, the eval gram-count attaches by one hash join; no driver
    materialization.  The eval side is typically ≪ the corpus, so the
    cross product inside a gram bucket is bounded by
    ``df(train) × df(eval)`` (``df_cap`` guards the stop-word grams;
    None = exact mode for the oracle).

    ``prefilter`` is the corpus-side gram cut that makes the sweep
    affordable at scale: only grams that ALSO appear on the (small)
    eval side can ever form a pair, so the corpus gram stream is
    filtered against the eval gram-hash set BEFORE the bucket exchange
    — zero recall loss by construction.  Without it the exchange sorts
    the corpus's entire gram fan-out (measured ~650 M gram rows for a
    500 k-doc corpus — a 39-minute wall dominated by grams that can
    never match the 2 k-doc eval side).  ``"auto"`` broadcasts the
    exact sorted hash set when the eval side has ≤
    ``prefilter_exact_limit`` distinct grams (~32 MB at the limit) and
    falls back to a broadcast Bloom filter above it (false positives
    only add exchange rows, never results); ``"exact"``/``"bloom"``
    force a path, ``"off"`` disables the cut (the pre-round-5 shape).

    Output: (id_a = train id, id_b = eval id, containment).  Ids must
    not collide across the two datasets (use distinct namespaces or
    filter identity pairs downstream when eval ⊆ train).
    """
    from .relational import bloom_semi_join, distinct, hash_join, pre_aggregated

    if prefilter not in ("auto", "exact", "bloom", "off"):
        raise ValueError(f"unknown prefilter mode {prefilter!r}")

    def _explode_side(side_val: int):
        def _fn(batch: pa.Table) -> pa.Table:
            g = _gram_explode(batch, text_col, id_col, n)
            # reinterpret the uint64 md5 hash as int64 (bit-exact
            # bijection — equality, distinctness and grouping are
            # preserved) so the Bloom prefilter's integer-key machinery
            # never overflows on a set top bit
            gh = g["gram_hash"].to_numpy(zero_copy_only=False).view(np.int64)
            return pa.table(
                {
                    "id": g[id_col].cast(pa.int64()),
                    "gram_hash": pa.array(gh),
                    "side": pa.array(
                        np.full(g.num_rows, side_val, dtype=np.int8)
                    ),
                }
            )

        return _fn

    grams_t = train.select_columns([id_col, text_col]).map_batches(
        _explode_side(0), batch_format="pyarrow"
    )
    grams_e = eval_ds.select_columns([id_col, text_col]).map_batches(
        _explode_side(1), batch_format="pyarrow"
    )
    if stepwise:
        grams_e = grams_e.materialize()  # reused: sizes + pair buckets
    if prefilter != "off":
        eval_hashes = distinct(
            grams_e.select_columns(["gram_hash"]), ["gram_hash"]
        ).materialize()
        n_hash = eval_hashes.count()
        if prefilter == "exact" or (
            prefilter == "auto" and n_hash <= prefilter_exact_limit
        ):
            tabs = [t for t in ray.get(eval_hashes.to_arrow_refs()) if t.num_rows]
            if not tabs:
                # an eval side with no grams can never be contaminated
                grams_t = grams_t.limit(0)
            else:
                hs = np.sort(
                    pa.concat_tables(tabs)["gram_hash"].to_numpy(
                        zero_copy_only=False
                    )
                )
                hs_ref = ray.put(hs)

                def _keep_shared(batch: pa.Table) -> pa.Table:
                    if batch.num_rows == 0:
                        return batch
                    h = ray.get(hs_ref)
                    v = batch["gram_hash"].to_numpy(zero_copy_only=False)
                    idx = np.minimum(np.searchsorted(h, v), len(h) - 1)
                    return batch.filter(pa.array(h[idx] == v))

                grams_t = grams_t.map_batches(
                    _keep_shared, batch_format="pyarrow", batch_size=None
                )
        else:
            # eval gram set too big to broadcast exactly: Bloom bits,
            # sized ~16 bits/key (FP ≈ 0.24% at k=4) up to a 32 MB cap
            m_bits = 1 << 20
            while m_bits < 16 * n_hash and m_bits < (1 << 28):
                m_bits <<= 1
            grams_t = bloom_semi_join(
                grams_t,
                eval_hashes,
                on="gram_hash",
                m_bits=m_bits,
                exact_verify=False,
            )
    sizes_e = pre_aggregated(
        grams_e.select_columns(["id"]).map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        keys=["id"],
        aggs={"ng_eval": "one:sum"},
    )
    per_gram = grams_t.union(grams_e).groupby("gram_hash").map_groups(
        _cross_gram_pairs,
        batch_format="pyarrow",
        fn_kwargs={"df_cap": df_cap},
    )
    inter = _pair_reduce(
        per_gram.map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        [("one", "sum")],
        rename={"one_sum": "inter"},
    )
    # eval benchmarks are small by definition — broadcast the per-doc
    # gram counts (one int64 each) and attach with a vectorized lookup
    # instead of a fixed-cost hash join; a >4M-doc eval side falls back
    # to the distributed join
    joined = None
    if stepwise:
        sizes_mat = sizes_e.materialize()
        if sizes_mat.count() <= 4_000_000:
            ids_parts, val_parts = [], []
            for bt in sizes_mat.iter_batches(batch_format="pyarrow"):
                if bt.num_rows == 0:
                    continue
                ids_parts.append(bt["id"].to_numpy(zero_copy_only=False))
                val_parts.append(bt["ng_eval"].to_numpy(zero_copy_only=False))
            if not ids_parts:
                joined = inter.limit(0)
            else:
                ids_all = np.concatenate(ids_parts)
                order = np.argsort(ids_all)
                ref = ray.put((ids_all[order], np.concatenate(val_parts)[order]))

                def _attach_ng(batch: pa.Table) -> pa.Table:
                    if batch.num_rows == 0:
                        return batch.append_column(
                            "ng_eval", pa.array([], pa.int64())
                        )
                    from .similarity import _broadcast_cached

                    ids_s, vals_s = _broadcast_cached(
                        _ATTACH_BCAST_CACHE, ref, lambda v: v
                    )
                    b_ids = batch["id_b"].to_numpy(zero_copy_only=False)
                    ib = np.minimum(
                        np.searchsorted(ids_s, b_ids), len(ids_s) - 1
                    )
                    if not np.array_equal(ids_s[ib], b_ids):
                        raise RuntimeError(
                            "contamination broadcast: eval id missing"
                        )
                    return batch.append_column("ng_eval", pa.array(vals_s[ib]))

                joined = inter.map_batches(_attach_ng, batch_format="pyarrow")
        else:
            sizes_e = sizes_mat
    if joined is None:
        joined = hash_join(
            inter, sizes_e, on=("id_b",), right_on=("id",), stepwise=stepwise
        )

    def _containment(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "containment": pa.array([], pa.float64()),
                }
            )
        inter_n = np.asarray(batch["inter"], dtype=np.float64)
        ng = np.asarray(batch["ng_eval"], dtype=np.float64)
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "containment": pa.array(inter_n / ng, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["containment"], threshold))

    return joined.map_batches(_containment, batch_format="pyarrow")


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 12,
) -> ray.data.Dataset:
    """Random-hyperplane LSH over an embedding column: rows whose sign
    patterns collide on any of two independent plane sets are candidate
    pairs; exact cosine verifies.  Output: (id_a, id_b, cosine)."""

    def _bucket(batch: pa.Table) -> pa.Table:
        # float64 throughout, and sign bits from the RAW vectors (the
        # sign of v·p equals the sign of (v/‖v‖)·p) — keeps the bucket
        # decision reproducible by the double-precision SQL oracle.
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        hyper = rng_planes(dim)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        bits = (vecs @ hyper.T) > 0  # (n, 2*planes)
        ids = batch[id_col].to_pylist()
        o_key, o_id, o_vec = [], [], []
        for row, (i, v) in enumerate(zip(ids, unit)):
            for s in range(2):
                word = 0
                for p in range(planes):
                    word = (word << 1) | int(bits[row, s * planes + p])
                o_key.append(f"{s}:{word:x}")
                o_id.append(i)
                o_vec.append(v)
        return pa.table(
            {
                "bucket": pa.array(o_key, pa.string()),
                id_col: pa.array(o_id),
                "unit_vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(o_vec)), dim
                ),
            }
        )

    def rng_planes(dim: int) -> np.ndarray:
        local = np.random.RandomState(7)  # fixed: same planes in every task
        return local.standard_normal((2 * planes, dim))

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        vecs = np.asarray(group["unit_vec"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)[:MAX_BUCKET]
        a_out, b_out, c_out = [], [], []
        sims = vecs[order] @ vecs[order].T
        for xi in range(len(order)):
            for yi in range(xi + 1, len(order)):
                sim = float(sims[xi, yi])
                if sim >= threshold:
                    lo, hi = sorted((ids[int(order[xi])], ids[int(order[yi])]))
                    a_out.append(lo)
                    b_out.append(hi)
                    c_out.append(sim)
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "cosine": pa.array(c_out, pa.float64()),
            }
        )

    buckets = ds.map_batches(_bucket, batch_format="pyarrow")
    pairs = buckets.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
    return _pair_reduce(
        pairs, [("cosine", "max")], rename={"cosine_max": "cosine"}
    )


# Driver-side slim-row budget: a (16-byte id, 32-byte hex fingerprint)
# pair costs ~60 B in Arrow, so 4 M rows ≈ 250 MB driver heap — safe on
# any real driver node, and collecting the combined slim set driver-side
# saves a whole all-to-all (measured ~20 s at the 2 M-doc bench).
# Beyond it the bucketed shuffle / Bloom paths engage.
WINNER_BROADCAST_LIMIT = 4_000_000


def fingerprint_dedup_slim(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    recover: str = "auto",
    broadcast_limit: int = WINNER_BROADCAST_LIMIT,
    precomputed: bool = False,
    rescan: bool = False,
    slim_input: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """The 100-TB form of ``fingerprint_dedup``: the shuffle carries
    ONLY (fingerprint, id) — document bodies never enter the exchange
    at ANY input size.  Identical output to ``fingerprint_dedup``.

    Recovery is LOSER-based, not winner-based: the rows to drop (every
    non-minimum id of a duplicated fingerprint) are derived slim, and
    the corpus streams through an anti filter against that set.  The
    loser set scales with the DUPLICATE count, not the corpus — the
    winner set is ≈ the distinct corpus (1.94 M ids at the 2 M-doc
    bench, blowing any broadcast budget and forcing a full-body
    ``left_semi`` shuffle, measured 218 s); the loser set was 58 k ids
    on the same input (broadcast anti, zero body shuffle, 23 s E2E).

    Two slim phases: (1) a zero-shuffle per-block combine — any id that
    is not its fingerprint's BLOCK minimum is a loser outright (the
    global minimum can only be ≤ the block minimum), and only one
    (fingerprint, block-min) candidate row per distinct fingerprint per
    block continues; (2) global minima over the candidates — computed
    driver-side when the candidate set fits ``broadcast_limit``, else
    via a bucketed fingerprint-hash shuffle of the slim candidates.

    ``recover`` picks how losers are REMOVED: ``"broadcast"`` ships the
    loser-id set once via ``ray.put`` (pure map filter, zero shuffle);
    ``"join"`` never collects ids to the driver — Bloom anti prefilter
    + exact ``left_anti`` on the sliver (driver load bounded by the
    filter bits regardless of loser count); ``"auto"`` switches on
    ``broadcast_limit``.

    Pass ``precomputed=True`` when the input ALREADY carries a
    ``fingerprint`` column (e.g. per-shard checkpoints) to skip
    recomputation.

    ``rescan=True`` (valid only with ``precomputed``) skips the input
    materialization: the winner reduction re-executes the input plan
    COLUMN-PRUNED to (id, fingerprint) and row recovery streams over a
    second execution.  Use it when the input is a bare parquet read —
    the slim pass then costs two tiny column reads instead of pinning
    every document body in the object store (measured: pinning the
    corpus made every later task in the session 3-4× slower at the
    500k-doc / 4 GB scale, and at 100 TB it simply doesn't fit).
    """
    from .relational import broadcast_semi_join

    if recover not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown recover mode {recover!r}")
    if rescan and not precomputed:
        raise ValueError("rescan=True requires precomputed=True")
    if slim_input is not None and not rescan:
        raise ValueError("slim_input only applies with rescan=True")

    if precomputed:
        with_fp = ds if rescan else ds.materialize()
    else:
        with_fp = ds.map_batches(
            _fingerprint_batch,
            batch_format="pyarrow",
            fn_kwargs={"text_col": text_col},
        ).materialize()  # consumed twice: winner reduction + row recovery
    # slim_input: caller-supplied column-pruned equivalent of ds (e.g.
    # read_parquet(files, columns=[id, fingerprint])) — the winner pass
    # then reads two thin columns instead of decoding every body twice
    slim = (
        slim_input if slim_input is not None else with_fp
    ).select_columns([id_col, "fingerprint"])

    losers = fingerprint_losers_slim(
        slim,
        id_col=id_col,
        broadcast_limit=broadcast_limit,
        driver_combine=(recover != "join"),
    ).materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return with_fp
    if recover == "join" or n_losers > broadcast_limit:
        # driver never sees ids: Bloom anti prefilter + exact left_anti
        # on the sliver (drop_losers' 100-TB shape)
        return drop_losers(
            with_fp, losers, id_col=id_col, loser_col=id_col, via="bloom"
        )
    tables = [t for t in ray.get(losers.to_arrow_refs()) if t.num_rows]
    loser_tbl = pa.concat_tables(tables)
    return broadcast_semi_join(with_fp, loser_tbl, keys=[id_col], anti=True)


def fingerprint_losers_slim(
    slim: ray.data.Dataset,
    id_col: str = "doc_id",
    broadcast_limit: int = WINNER_BROADCAST_LIMIT,
    driver_combine: bool = True,
) -> ray.data.Dataset:
    """Exact-duplicate LOSERS from a slim (id, fingerprint) dataset:
    every non-minimum id of a duplicated fingerprint, as a one-column
    dataset.  This is the shared core of ``fingerprint_dedup_slim`` and
    the curation finalize's delete-only assembly — callers that only
    need to REMOVE duplicates never have to stream document bodies
    through a dedup operator at all.

    Phase 1 is a zero-shuffle per-block combine (any id that is not its
    fingerprint's block minimum is a loser outright; one candidate row
    per distinct fingerprint per block survives).  Phase 2 resolves
    global minima over the candidates — driver-side in one Arrow
    group_by when the candidate set fits ``broadcast_limit`` (and
    ``driver_combine`` allows ids on the driver), else via a bucketed
    fingerprint-hash shuffle of the slim candidates.
    """
    from .relational import partitions_for

    min_col = f"{id_col}_min"

    def _global_losers(tbl: pa.Table) -> pa.Table:
        """Non-minimum ids per fingerprint within ``tbl`` (exhaustive
        for whatever key range ``tbl`` covers).  One ``id_col`` column,
        always present even when empty."""
        agg = tbl.group_by(["fingerprint"]).aggregate([(id_col, "min")])
        merged = tbl.join(
            pa.table({"fingerprint": agg["fingerprint"], "_min": agg[min_col]}),
            keys=["fingerprint"],
        )
        lose = merged.filter(pc.not_equal(merged[id_col], merged["_min"]))
        return pa.table({id_col: lose[id_col].combine_chunks()})

    def _block_combine(b: pa.Table) -> pa.Table:
        agg = b.group_by(["fingerprint"]).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        cand = pa.table(
            {
                id_col: agg[min_col],
                "fingerprint": agg["fingerprint"],
                "_loser": pa.array(np.zeros(agg.num_rows, dtype=bool)),
            }
        )
        dup = agg.filter(pc.greater(agg[f"{id_col}_count"], 1))
        if dup.num_rows == 0:
            return cand
        # only fingerprints duplicated WITHIN this block need the loser
        # derivation — the common singleton case skips the block join
        sub = b.filter(
            pc.is_in(b["fingerprint"], value_set=pc.unique(dup["fingerprint"]))
        )
        lose = _global_losers(sub)
        losers = pa.table(
            {
                id_col: lose[id_col],
                "fingerprint": pa.nulls(lose.num_rows, pa.string()),
                "_loser": pa.array(np.ones(lose.num_rows, dtype=bool)),
            }
        )
        return pa.concat_tables([cand, losers])

    combined = slim.map_batches(_block_combine, batch_format="pyarrow").materialize()
    # count() on a materialized dataset is a metadata lookup, not a scan
    if driver_combine and combined.count() <= broadcast_limit:
        # small corpus: finish everything driver-side in one Arrow
        # group_by — zero additional Ray jobs
        tables = [t for t in ray.get(combined.to_arrow_refs()) if t.num_rows]
        if not tables:  # empty input ⇒ no fingerprints ⇒ no losers
            return ray.data.from_arrow(
                pa.table({id_col: pa.array([], pa.int64())})
            )
        all_t = pa.concat_tables(tables)
        mask = all_t["_loser"].combine_chunks()
        local_l = all_t.filter(mask)
        cand_t = all_t.filter(pc.invert(mask)).select([id_col, "fingerprint"])
        glob_l = _global_losers(cand_t)
        loser_ids = pa.concat_arrays(
            [local_l[id_col].combine_chunks(), glob_l[id_col].combine_chunks()]
        )
        return ray.data.from_arrow(pa.table({id_col: loser_ids}))
    # big corpus: bucketed fingerprint-hash shuffle over the slim
    # CANDIDATES only (≤ one row per distinct fingerprint per block);
    # in-block losers never enter the exchange
    local_losers = combined.filter(expr="_loser == True").select_columns([id_col])
    cands = combined.filter(expr="_loser == False").select_columns(
        [id_col, "fingerprint"]
    )
    num_buckets = partitions_for(scale=1.0, minimum=32)

    def _bucket(b: pa.Table) -> pa.Table:
        import os as _os

        fp = b["fingerprint"].combine_chunks()
        try:  # Rust-vectorized string hash (see bucketed_group_aggregate)
            _os.environ.setdefault("POLARS_MAX_THREADS", "1")
            import polars as pl

            h = pl.from_arrow(fp).hash(seed=0).to_numpy()
            buckets = pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        except ImportError:  # pragma: no cover
            import zlib

            buckets = pa.array(
                [zlib.crc32(x.encode()) % num_buckets for x in fp.to_pylist()],
                pa.int32(),
            )
        return b.append_column("bucket", buckets)

    glob_losers = (
        cands.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _global_losers(g.select([id_col, "fingerprint"])),
            batch_format="pyarrow",
        )
    )
    return local_losers.union(glob_losers)


def near_dup_losers(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    df_cap: int | None = 512,
    concurrency: int | tuple = (1, 4),
    n: int = 3,
    method: str = "ngram",
    num_perm: int = 64,
    bands: int = 16,
    shingle: str = "word",
    shingle_k: int = 5,
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-duplicate NON-survivors: candidate pairs → connected
    components → every member except the cluster minimum.  One (node,)
    column; drop with a distributed ``left_anti`` hash join (the shape
    of ``q_dedup_survivors`` and the curation pipeline's near-dup
    stage — ONE implementation).

    ``method="ngram"`` generates EXACT word-n-gram Jaccard pairs
    (perfect recall under the ``df_cap`` skew guard; ``n``/``df_cap``
    apply to this method only); ``method="minhash"`` uses MinHash-LSH
    banding — the estimator the 100-TB form runs, where even capped
    exact gram buckets are too expensive (``threshold`` then applies
    to the signature-estimated Jaccard; tune with
    ``num_perm``/``bands``).  The minhash path shingles on WORDS by
    default (``shingle="word"``) — this is a whole-document API, and
    char shingles flood LSH banding on full-page corpora (see
    ``minhash_lsh_pairs``).  ``method="simhash"`` is the CHEAPEST
    100-TB form — one 64-bit hash per doc, banded pigeonhole buckets,
    no signature joins at all; ``max_hamming`` (not ``threshold``)
    sets the match radius.  Tighter than minhash: it catches
    boilerplate-level near-dups, not 50%-overlap rewrites."""
    docs = docs.select_columns(["doc_id", "text"])
    if method == "ngram":
        pairs = ngram_jaccard_pairs(
            docs, threshold=threshold, df_cap=df_cap, concurrency=concurrency, n=n
        )
    elif method == "minhash":
        pairs = minhash_lsh_pairs(
            docs,
            threshold=threshold,
            concurrency=concurrency,
            num_perm=num_perm,
            bands=bands,
            shingle=shingle,
            shingle_k=shingle_k,
        )
    elif method == "simhash":
        pairs = simhash_pairs(docs, max_hamming=max_hamming)
    else:
        raise ValueError(f"unknown near-dup method {method!r}")
    comps = connected_components(pairs)
    return comps.filter(expr="node != component").select_columns(["node"])


LOSER_BROADCAST_LIMIT = 2_000_000  # ids; ~16 MB of int64 via ray.put


def drop_losers(
    docs: ray.data.Dataset,
    losers: ray.data.Dataset,
    id_col: str = "doc_id",
    loser_col: str = "node",
    via: str = "auto",
    broadcast_limit: int = LOSER_BROADCAST_LIMIT,
    corpus_count: int | None = None,
) -> ray.data.Dataset:
    """Drop a loser-id set from a corpus — the keep-survivors step
    shared by ``q_dedup_survivors`` and the curation near-dup stage
    (ONE implementation).

    ``via="auto"`` (default) sizes the strategy like every other size
    switch in this repo: loser sets ≤ ``broadcast_limit`` ship once via
    ``ray.put`` and drop through a pure map filter (zero shuffle — the
    measured sf0.1 inversion where the Bloom build's extra all-to-all
    cost 4.9 s vs the plain join's 2.3 s disappears entirely); bigger
    sets go through Bloom, UNLESS ``corpus_count`` is supplied and the
    losers exceed half of it — a filter that clears under half the
    corpus is pure overhead, so the plain single-shuffle join wins
    (pass ``corpus_count`` when a manifest or prior count makes it
    free; it is never computed here because counting ``docs`` would
    execute the whole upstream plan twice).

    ``via="bloom"`` is the 100-TB shape for loser sets too big to
    broadcast: a Bloom filter of the loser ids broadcasts once (bounded
    by ``m_bits/8`` bytes regardless of loser count) and clears the
    surviving majority WITHOUT entering the exchange; only the losers
    themselves plus the false-positive sliver pay exact ``left_anti``
    join traffic, so the shuffle moves ~|losers| rows instead of
    ~|corpus| rows.  Exact by construction (``bloom_semi_join`` anti
    requires ``exact_verify``).  ``via="join"`` is the plain
    distributed ``left_anti`` hash join — every row enters the
    exchange; the right call when losers rival the corpus in size (the
    filter then clears almost nothing)."""
    from .relational import bloom_semi_join, broadcast_semi_join, hash_join

    if via == "auto":
        losers = losers.materialize()
        n_losers = losers.count()
        if n_losers <= broadcast_limit:
            tables = [t for t in ray.get(losers.to_arrow_refs()) if t.num_rows]
            if not tables:
                return docs
            loser_tbl = pa.concat_tables(tables)
            if loser_col != id_col:
                loser_tbl = loser_tbl.rename_columns(
                    [id_col if c == loser_col else c for c in loser_tbl.column_names]
                )
            return broadcast_semi_join(docs, loser_tbl, keys=[id_col], anti=True)
        via = (
            "join"
            if corpus_count is not None and n_losers * 2 > corpus_count
            else "bloom"
        )
    if via == "bloom":
        return bloom_semi_join(
            docs, losers, on=id_col, right_on=loser_col, anti=True
        )
    if via == "join":
        return hash_join(
            docs, losers, on=(id_col,), right_on=(loser_col,),
            join_type="left_anti",
        )
    raise ValueError(f"unknown drop_losers via {via!r}")


def _connected_components_local(
    pairs: ray.data.Dataset, max_iters: int, on_nonconverged: str
) -> ray.data.Dataset:
    """Driver-side twin of the distributed iteration: the same
    hash-min + pointer-jumping recurrence vectorized in numpy.  Only
    reachable under the ``connected_components`` size switch — the
    pair list fits in one process by construction."""
    id_type = None
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    for bt in pairs.iter_batches(batch_format="pyarrow"):
        if id_type is None:
            id_type = bt.schema.field("id_a").type
        a_parts.append(bt["id_a"].to_numpy(zero_copy_only=False))
        b_parts.append(bt["id_b"].to_numpy(zero_copy_only=False))
    if not a_parts:
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)
    ida = np.concatenate(a_parts)
    idb = np.concatenate(b_parts)
    nodes, inv = np.unique(np.concatenate([ida, idb]), return_inverse=True)
    ea, eb = inv[: len(ida)], inv[len(ida) :]
    # nodes is sorted ascending, so the min INDEX in a component is
    # also the min node ID — labels are indices until the final map
    label = np.arange(len(nodes), dtype=np.int64)
    converged = False
    for _ in range(max_iters):
        new = label.copy()
        np.minimum.at(new, ea, label[eb])
        np.minimum.at(new, eb, label[ea])
        new = new[new]  # pointer jump: label-of-label
        if np.array_equal(new, label):
            converged = True
            break
        label = new
    if not converged:
        msg = (
            f"connected_components (local path) did not reach a "
            f"fixpoint within max_iters={max_iters} rounds; labels "
            f"are PARTIAL.  Raise max_iters."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    out = pa.table(
        {
            "node": pa.array(nodes).cast(id_type),
            "component": pa.array(nodes[label]).cast(id_type),
        }
    )
    return ray.data.from_arrow(out)


def connected_components(
    pairs: ray.data.Dataset,
    max_iters: int = 50,
    on_nonconverged: str = "raise",
    via: str = "auto",
    local_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Near-dup clusters from candidate pairs: every node labeled with
    the MINIMUM node id reachable through the pair graph (the step that
    turns pairwise dedup output into keep-one-per-cluster groups).

    Iterative hash-min label propagation WITH POINTER JUMPING: each
    round every node adopts the smallest label among itself and its
    neighbors (a combiner-backed min-aggregation, so a round's shuffle
    carries one (node, label) row per (node, block)), then shortcuts
    through its label's own label (one extra self-join of the small
    label table).  Propagation alone moves one hop per round —
    O(diameter) rounds, and web-corpus duplicate chains
    (mirror-of-a-mirror) routinely exceed any fixed budget; the
    label-of-label jump doubles the reach per round, so convergence is
    O(log diameter) and ``max_iters=50`` covers any graph that fits on
    Earth.  The loop materializes one small (node, label) table per
    round — never the pair list — and stops when a round changes
    nothing.

    A loop that exhausts ``max_iters`` without reaching the fixpoint
    is NEVER silent: ``on_nonconverged="raise"`` (default) raises
    RuntimeError — unconverged labels would split components and let
    duplicates survive dedup invisibly; ``"warn"`` logs and returns
    the partial labels for callers that prefer progress over
    completeness.  Output: (node, component) with component = min
    reachable id.  Deterministic; also expressible as a recursive-CTE
    oracle.

    ``via`` is the repo's size-switch discipline (``offsets_via`` /
    winner-recovery shape): ``"auto"`` counts the materialized slim
    pair list and, when it holds ≤ ``local_max_edges`` rows, runs the
    SAME hash-min + pointer-jumping iteration vectorized in numpy on
    the driver — a pair list is two int64 columns, so the cap is
    ~32 MB of driver memory, while each distributed round costs two
    hash joins + an aggregate of fixed orchestration overhead (~5 s
    locally for a 256-edge graph).  Labels are identical on both
    paths (min reachable id, deterministic).  Beyond the cap — the
    100-TB regime, where near-dup pair lists exceed any driver — the
    distributed iteration runs unchanged; force a path with
    ``via="local"``/``"distributed"``."""
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(
            f"on_nonconverged must be 'raise' or 'warn', got {on_nonconverged!r}"
        )
    if via not in ("auto", "local", "distributed"):
        raise ValueError(f"via must be auto|local|distributed, got {via!r}")
    from .relational import pre_aggregated

    pairs = pairs.select_columns(["id_a", "id_b"])
    if via != "distributed":
        pairs = pairs.materialize()
        if via == "local" or pairs.count() <= local_max_edges:
            return _connected_components_local(pairs, max_iters, on_nonconverged)

    # undirected edge list, both directions + self (id_a < id_b holds
    # for dedup pairs but is not assumed)
    def _expand(batch: pa.Table) -> pa.Table:
        a = batch["id_a"]
        b = batch["id_b"]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [a.combine_chunks(), b.combine_chunks()]
                ) if isinstance(a, pa.ChunkedArray) else pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays(
                    [b.combine_chunks(), a.combine_chunks()]
                ) if isinstance(b, pa.ChunkedArray) else pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.select_columns(["id_a", "id_b"]).map_batches(
        _expand, batch_format="pyarrow", batch_size=None
    ).materialize()

    # labels: node -> current component label (start: own id via the
    # neighbor-min INCLUDING self, i.e. min(node, neighbors))
    labels = pre_aggregated(
        edges.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "lbl": pc.min_element_wise(b["node"], b["nbr"]),
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["node"],
        aggs={"lbl": "lbl:min"},
    ).materialize()

    from .relational import hash_join

    from .relational import _cluster_cpus, partitions_for

    # Loop-join geometry: hash_join's defaults are tuned for one-shot
    # small-query joins (4 partitions, stepwise re-materialization of
    # both inputs).  Inside the iteration both inputs are ALREADY
    # materialized each round and the joins carry the full edge list —
    # measured at 800k edges / 32 CPUs, the defaults cost ~80 s/round.
    # Scale the partition count with the cluster and skip the stepwise
    # re-materialization on sessions big enough to be deadlock-free
    # (the <16-CPU guard keeps the documented tiny-cluster mitigation).
    loop_partitions = partitions_for(scale=0.5, minimum=4)
    loop_stepwise = _cluster_cpus() < 16
    converged = False
    old_sum = labels.sum("lbl")
    for _ in range(max_iters):
        # propagate: each node's new label = min over neighbors' labels
        # and its own; neighbor labels come from one hash join of the
        # edge list against the (small) label table
        nbr_lbl = hash_join(
            edges,
            labels.map_batches(
                lambda b: b.rename_columns(
                    ["nbr" if c == "node" else "nbr_lbl" if c == "lbl" else c for c in b.column_names]
                ),
                batch_format="pyarrow",
            ),
            on=("nbr",),
            num_partitions=loop_partitions,
            stepwise=loop_stepwise,
        )
        candidates = nbr_lbl.map_batches(
            lambda b: pa.table({"node": b["node"], "lbl": b["nbr_lbl"]}),
            batch_format="pyarrow",
        ).union(labels)
        propagated = pre_aggregated(
            candidates, keys=["node"], aggs={"lbl": "lbl:min"},
            num_partitions=loop_partitions,
        )
        if not loop_stepwise:
            # one materialization feeds both sides of the jump join —
            # without it the propagate chain executes twice
            propagated = propagated.materialize()
        # pointer jumping: shortcut node → lbl → lbl's own label.  A
        # label is always a node id present in the graph (it is the
        # min over a reachable set of node ids) and every node has a
        # labels row, so the inner self-join is total.  This doubles
        # the shortcut distance per round → O(log diameter) rounds.
        jumped = hash_join(
            propagated,
            propagated.map_batches(
                lambda b: b.rename_columns(
                    [
                        "lbl" if c == "node" else "lbl2" if c == "lbl" else c
                        for c in b.column_names
                    ]
                ),
                batch_format="pyarrow",
            ),
            on=("lbl",),
            num_partitions=loop_partitions,
            stepwise=loop_stepwise,
        )
        new_labels = jumped.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "lbl": pc.min_element_wise(b["lbl"], b["lbl2"])}
            ),
            batch_format="pyarrow",
        ).materialize()
        # convergence: total label sum strictly decreases until fixpoint
        new_sum = new_labels.sum("lbl")
        labels = new_labels
        if old_sum == new_sum:
            converged = True
            break
        old_sum = new_sum

    if not converged:
        msg = (
            f"connected_components did not reach a fixpoint within "
            f"max_iters={max_iters} rounds; labels are PARTIAL — a "
            f"component's members may carry different labels, so "
            f"duplicates could survive a dedup built on this output. "
            f"Raise max_iters (rounds needed ≈ log2(diameter) with "
            f"pointer jumping) or pass on_nonconverged='warn' to "
            f"accept partial labels."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)

    return labels.map_batches(
        lambda b: b.rename_columns(
            ["component" if c == "lbl" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
