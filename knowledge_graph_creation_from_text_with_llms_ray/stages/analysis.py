"""Text-analysis stages: stats/quality, language ID, fingerprints.

Arrow-kernel-vectorized where possible (token/char/punct counts are
pure ``pyarrow.compute``); per-row Python only where a kernel doesn't
exist (language profiles, rolling hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import rolling_fingerprint, sha256_hex_batch, simhash64
from ..functions.textstats import (
    bpe_ish_token_count,
    detect_language,
    punct_ratio,
    quality_score,
    whitespace_token_count,
)


def _stats_batch(batch: pa.Table, text_col: str) -> pa.Table:
    texts = batch[text_col]
    n_tokens = whitespace_token_count(texts)
    n_chars = pc.utf8_length(texts).cast(pa.int64())
    punct = punct_ratio(texts)
    bpe = pa.array(
        [bpe_ish_token_count(t or "") for t in texts.to_pylist()], pa.int64()
    )
    quality = quality_score(
        np.asarray(n_tokens, dtype=np.float64),
        np.asarray(n_chars, dtype=np.float64),
        np.asarray(punct, dtype=np.float64),
    )
    return (
        batch.append_column("n_tokens", n_tokens)
        .append_column("n_chars_computed", n_chars)
        .append_column("n_tokens_bpe", bpe)
        .append_column("punct_ratio", punct)
        .append_column("quality", pa.array(quality, pa.float64()))
    )


def text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        _stats_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


def repetition_profile(text: str) -> tuple[int, int, int, int, int]:
    """Gopher-style repetition measures for one document, all integers
    (so the SQL oracle is value-exact — no float ratios cross engines):

    * ``dup_line_chars`` — characters in non-empty lines occurring ≥2
      times in the doc (every occurrence counted);
    * ``line_chars`` — characters in all non-empty lines;
    * ``top_bigram_chars`` — occurrences × length of the most frequent
      word bigram (ties → lexicographically smallest bigram);
    * ``n_bigrams`` — number of word bigrams;
    * ``n_chars`` — total characters.

    Lines split on ``\\n`` only; words on Python ``str.split()``
    whitespace (matching the oracle's TOKENS class).
    """
    from collections import Counter

    lines = [ln for ln in text.split("\n") if ln]
    line_counts = Counter(lines)
    line_chars = sum(map(len, lines))
    dup_line_chars = sum(
        len(ln) * cnt for ln, cnt in line_counts.items() if cnt >= 2
    )
    toks = text.split()
    # count TUPLES (no per-bigram string concat — 1.8× kernel speedup);
    # only the max-count ties materialize joined strings, so the
    # tie-break (lexicographically smallest joined bigram) is unchanged
    bigrams = Counter(zip(toks, toks[1:]))
    if bigrams:
        top_cnt = max(bigrams.values())
        top_gram = min(
            a + " " + b for (a, b), c in bigrams.items() if c == top_cnt
        )
        top_bigram_chars = top_cnt * len(top_gram)
    else:
        top_bigram_chars = 0
    return dup_line_chars, line_chars, top_bigram_chars, len(toks) - 1 if len(toks) > 1 else 0, len(text)


def _repetition_batch(batch: pa.Table, text_col: str) -> pa.Table:
    profiles = [repetition_profile(t or "") for t in batch[text_col].to_pylist()]
    dup, tot, topg, nbg, nch = (
        zip(*profiles) if profiles else ((), (), (), (), ())
    )
    out = (
        batch.append_column("dup_line_chars", pa.array(dup, pa.int64()))
        .append_column("line_chars", pa.array(tot, pa.int64()))
        .append_column("top_bigram_chars", pa.array(topg, pa.int64()))
        .append_column("n_bigrams", pa.array(nbg, pa.int64()))
        .append_column("n_chars", pa.array(nch, pa.int64()))
    )
    # Gopher-ish keep rule, integer cross-multiplied (exact in SQL too):
    # ≤30% of line characters in duplicate lines AND the top bigram
    # covers ≤20% of all characters (vacuously true with no bigrams).
    keep = pc.and_(
        pc.less_equal(
            pc.multiply(out["dup_line_chars"], pa.scalar(10, pa.int64())),
            pc.multiply(out["line_chars"], pa.scalar(3, pa.int64())),
        ),
        pc.less_equal(
            pc.multiply(out["top_bigram_chars"], pa.scalar(5, pa.int64())),
            out["n_chars"],
        ),
    )
    return out.append_column("keep", keep)


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-document repetition / quality-filter stats (the Gopher-rule
    shape a 100-TB curation pipeline applies before training): pure
    per-row map — no shuffle, streams at read speed."""
    return ds.map_batches(
        _repetition_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


def _langid_batch(batch: pa.Table, text_col: str) -> pa.Table:
    preds = [detect_language(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "lang_pred", pa.array([p[0] for p in preds], pa.string())
    ).append_column("lang_conf", pa.array([p[1] for p in preds], pa.float64()))


def language_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        _langid_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


def _fingerprint_batch(batch: pa.Table, text_col: str) -> pa.Table:
    texts = [t or "" for t in batch[text_col].to_pylist()]
    return (
        batch.append_column("sha256", pa.array(sha256_hex_batch(texts), pa.string()))
        .append_column(
            "simhash",
            pa.array(np.asarray([simhash64(t) for t in texts], dtype=np.uint64)),
        )
        .append_column(
            "rolling_fp",
            pa.array([f"{rolling_fingerprint(t):016x}" for t in texts], pa.string()),
        )
    )


def fingerprints(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        _fingerprint_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


class SentenceEncoderActor:
    """ST2 re-expressed (reference ``Integrator.py:62``): the sentence
    encoder as an actor-pool stage — model loads once per actor in
    ``__init__``, each batch is encoded in one call.  ``model_name``
    None selects the deterministic trigram encoder (sandbox default);
    a sentence-transformers id is import-gated."""

    def __init__(self, model_name: str | None = None, text_col: str = "text"):
        self.text_col = text_col
        if model_name is None:
            from ..functions.embedding import encode_batch

            self._encode = encode_batch
        else:  # pragma: no cover - heavy model path
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)
            self._encode = lambda texts: model.encode(list(texts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self._encode([t or "" for t in batch[self.text_col].to_pylist()])
        vecs = np.asarray(vecs, dtype=np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), vecs.shape[1]
        )
        return batch.append_column("embedding", arr)


def embed_text(
    ds: ray.data.Dataset,
    text_col: str = "text",
    model_name: str | None = None,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 512,
) -> ray.data.Dataset:
    """Add an ``embedding: fixed_size_list<float32>`` column."""
    return ds.map_batches(
        SentenceEncoderActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"model_name": model_name, "text_col": text_col},
    )


def token_topk(
    ds: ray.data.Dataset, text_col: str = "text", k: int = 20
) -> ray.data.Dataset:
    """Heavy hitters: global top-k tokens by count.  Per-batch Counter
    combine (one row per distinct token per block), bucketed Arrow sum,
    then the local-partials global top-k — the vocabulary never sits in
    one task and the shuffle carries (token, partial_count) rows only.
    Output: (token, n) with the (count desc, token asc) tie-break."""
    from collections import Counter

    from .relational import bucketed_group_aggregate, topk

    def _counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update((t or "").split())
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "partial": pa.array(list(c.values()), pa.int64()),
            }
        )

    partials = ds.map_batches(_counts, batch_format="pyarrow", batch_size=None)
    counts = bucketed_group_aggregate(
        partials,
        keys=["token"],
        agg_specs=[("partial", "sum")],
        rename={"partial_sum": "n"},
    )
    return topk(counts, ["n", "token"], k=k, descending=[True, False])


def sample_by_hash(
    ds: ray.data.Dataset, id_col: str = "doc_id", denom: int = 7
) -> ray.data.Dataset:
    """Deterministic 1/denom sample: keep rows where
    ``mix32(id_lo32 ^ id_hi32) % denom == 0``.  A pure function of the
    id — independent of block layout, cluster size and run order
    (unlike ``Dataset.random_sample``), so resumed/rerun pipelines
    sample the SAME rows; uniform within every group automatically.

    Integer ids take a fully-vectorized numpy path (the lowbias32 mix
    shared with the shingle hash — all products < 2^58, so the SQL
    oracle replicates it in plain BIGINT arithmetic); other id types
    fall back to md5 of the string form."""
    import numpy as np

    from ..functions.hashing import _mix32, hash64

    def _keep(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if pa.types.is_integer(col.type):
            x = (
                col.cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            h = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
            mask = pa.array(h % np.uint64(denom) == 0)
        else:
            mask = pa.array(
                [hash64(str(i)) % denom == 0 for i in col.to_pylist()],
                pa.bool_(),
            )
        return batch.filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow")


def token_window_spans(n_tokens: int, size: int, stride: int) -> list[int]:
    """Window start offsets for one document: full windows every
    ``stride`` tokens plus an aligned tail window so no token is ever
    dropped; short docs (≤ size tokens) get exactly one window."""
    if n_tokens <= 0:
        return []
    if n_tokens <= size:
        return [0]
    last = n_tokens - size
    starts = list(range(0, last + 1, stride))
    if starts[-1] != last:
        starts.append(last)  # tail window, overlapping the previous one
    return starts


def token_windows(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 64,
) -> ray.data.Dataset:
    """Overlapping fixed-size token windows per document — the
    context-window chunking step that turns curated documents into
    LM training samples.  Tokens are Python ``str.split()`` words
    (matching the oracle's TOKENS class), windows rejoin with single
    spaces.  Pure per-row flat map: zero shuffle, streams at read
    speed; output rows ≈ rows × (n_tokens/stride).

    Output: (id, win_id, start, n_tokens, window_text) with ``win_id``
    0-based per document in start order."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def _explode(batch: pa.Table) -> pa.Table:
        out_ids, out_win, out_start, out_n, out_text = [], [], [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = (t or "").split()
            for w, s in enumerate(token_window_spans(len(toks), size, stride)):
                win = toks[s : s + size]
                out_ids.append(i)
                out_win.append(w)
                out_start.append(s)
                out_n.append(len(win))
                out_text.append(" ".join(win))
        return pa.table(
            {
                id_col: pa.array(out_ids, batch[id_col].type),
                "win_id": pa.array(out_win, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "window_text": pa.array(out_text, pa.string()),
            }
        )

    return ds.map_batches(_explode, batch_format="pyarrow")


def pack_windows(
    ds: ray.data.Dataset,
    budget: int = 2048,
    id_col: str = "doc_id",
    win_col: str = "win_id",
    tokens_col: str = "n_tokens",
    num_buckets: int = 64,
    chunk_ids: int = 1 << 16,
    offsets_via: str = "auto",
) -> ray.data.Dataset:
    """Deterministic sequence packing: assign token windows to
    fixed-token-budget packs (the batch-construction step after
    :func:`token_windows`).

    Windows bucket by a hash of the doc id (packing is embarrassingly
    parallel across buckets); within a bucket they order by
    (doc id, window id) and a window joins pack
    ``cumulative_tokens_before // budget`` — contiguous packing, so a
    pack's total is ``budget ± one window`` (LM loaders truncate/pad
    the remainder).  The rule is a pure function of the sorted window
    list and the FIXED ``num_buckets`` constant (deliberately not
    cluster-derived): output is independent of block layout and cluster
    size, and an exact SQL window-function oracle verifies it.

    Scale shape (the ``running_aggregate_chunked`` two-phase pattern):
    no task ever holds a whole bucket.  Each bucket is sub-chunked by
    contiguous doc-id range (``doc_id // chunk_ids`` — order-aligned
    with the (doc, win) sort, so chunk boundaries cannot reorder
    windows); the per-window exclusive token cumsum runs per
    (bucket, chunk) slice, per-chunk totals flow through a combiner
    aggregation into a tiny per-bucket exclusive prefix-offset table
    (one row per nonempty chunk), and the offsets rejoin the rows
    broadcast or via a hash join (``offsets_via`` as in
    ``windows.running_aggregate_chunked``).  ``chunk_ids`` is a fixed
    constant like ``num_buckets`` — the output is a pure function of
    the data, independent of block layout, cluster size, and the chunk
    width itself.

    ``ds`` is consumed twice (rows + totals); pass a re-executable
    pipeline (e.g. a parquet read), not a materialized monolith.

    Output: input columns + (pack_bucket, pack_id) with ``pack_id``
    dense per bucket."""
    import numpy as np

    from .relational import broadcast_join, hash_join, pre_aggregated
    from .windows import _offsets_strategy

    if budget <= 0:
        raise ValueError("budget must be positive")
    if chunk_ids <= 0:
        raise ValueError("chunk_ids must be positive")

    def _bucket(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import _mix32

        ids = batch[id_col].cast(pa.int64())
        x = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
        # the repo's mix32 id-hash convention: exact BIGINT arithmetic,
        # so the SQL oracle replicates the bucket assignment bit-for-bit
        h = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
        out = batch.append_column(
            "pack_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )
        chunk = np.floor_divide(ids.to_numpy(zero_copy_only=False), chunk_ids)
        return out.append_column("__chunk", pa.array(chunk, pa.int64()))

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", batch_size=None)

    def _local(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(id_col, "ascending"), (win_col, "ascending")]
        )
        g = group.take(order)
        toks = np.asarray(g[tokens_col], dtype=np.int64)
        before = np.concatenate(([0], np.cumsum(toks)[:-1]))
        return g.append_column("__before", pa.array(before, pa.int64()))

    local = bucketed.groupby(["pack_bucket", "__chunk"]).map_groups(
        _local, batch_format="pyarrow"
    )

    totals = pre_aggregated(
        bucketed.select_columns(["pack_bucket", "__chunk", tokens_col]),
        keys=["pack_bucket", "__chunk"],
        aggs={"__total": f"{tokens_col}:sum"},
    )

    def _prefix(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("__chunk", "ascending")])
        g = group.take(order)
        tot = np.asarray(g["__total"], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(tot)[:-1]))
        return pa.table(
            {
                # Ray's groupby widens the int32 bucket key to int64 —
                # cast back so the rejoin key types match the row side
                "pack_bucket": g["pack_bucket"].cast(pa.int32()),
                "__chunk": g["__chunk"].cast(pa.int64()),
                "__offset": pa.array(offs, pa.int64()),
            }
        )

    offsets = totals.groupby("pack_bucket").map_groups(
        _prefix, batch_format="pyarrow"
    )

    offsets_via, offsets = _offsets_strategy(offsets, offsets_via)
    if offsets_via == "broadcast":
        off_parts = [t for t in ray.get(offsets.to_arrow_refs()) if t.num_rows > 0]
        if not off_parts:  # empty input
            return local.map_batches(
                lambda b: b.append_column(
                    "pack_id", pa.nulls(b.num_rows, pa.int64())
                ).drop_columns(["__chunk", "__before"]),
                batch_format="pyarrow",
            )
        joined = broadcast_join(
            local,
            pa.concat_tables(off_parts),
            keys=["pack_bucket", "__chunk"],
            join_type="inner",
        )
    else:
        joined = hash_join(local, offsets, on=("pack_bucket", "__chunk"))

    def _finish(batch: pa.Table) -> pa.Table:
        before = np.asarray(batch["__before"], dtype=np.int64)
        offset = np.asarray(batch["__offset"], dtype=np.int64)
        out = batch.append_column(
            "pack_id", pa.array((before + offset) // budget, pa.int64())
        )
        return out.drop_columns(["__chunk", "__before", "__offset"])

    return joined.map_batches(_finish, batch_format="pyarrow")


def split_label_list(weights: dict[str, int] | None) -> list[str]:
    """The expanded modulo-range label list ``split_by_hash`` assigns
    from — label semantics are ORDER-SENSITIVE (labels fill the modulo
    range in dict insertion order), so resume guards must compare this
    list, not the weights dict (dict equality ignores key order)."""
    weights = weights or {"train": 8, "val": 1, "test": 1}
    labels: list[str] = []
    for name, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {name!r} must be positive")
        labels.extend([name] * int(w))
    return labels


def split_by_hash(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: ``mix32`` of the id
    modulo the weight total picks the split, so membership is a pure
    function of the id — stable across runs, cluster sizes, block
    layouts and resumes (the property a training pipeline needs so no
    document ever migrates between train and eval).  ``weights`` maps
    label → integer share (default ``{"train": 8, "val": 1, "test": 1}``
    = 80/10/10); labels assign in insertion order over the modulo
    range.  Pure per-row map, zero shuffle."""
    import numpy as np

    from ..functions.hashing import _mix32, hash64

    labels = split_label_list(weights)
    total = len(labels)
    label_arr = pa.array(labels, pa.string())

    def _assign(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if pa.types.is_integer(col.type):
            x = (
                col.cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            h = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
            idx = (h % np.uint64(total)).astype(np.int64)
        else:
            idx = np.asarray(
                [hash64(str(i)) % total for i in col.to_pylist()], dtype=np.int64
            )
        return batch.append_column(out_col, label_arr.take(pa.array(idx)))

    return ds.map_batches(_assign, batch_format="pyarrow")


def stratified_sample_k(
    ds: ray.data.Dataset,
    key: str,
    id_col: str,
    k: int,
) -> ray.data.Dataset:
    """Exactly-k-per-group deterministic sample: each group keeps its
    ``k`` rows with the smallest ``mix32(id)`` (ties broken by id) — a
    reservoir-free, layout/run-independent stratified cap (the per-lang
    / per-source balancing primitive of training-data curation).

    Distributed shape = grouped top-k: per-batch local head per group
    (combiner caps any group at k rows per block) then a per-group
    final head — the shuffle carries at most k rows per (group, block).
    """
    import numpy as np

    from ..functions.hashing import _mix32

    def _add_hash(batch: pa.Table) -> pa.Table:
        x = (
            batch[id_col]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        h = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    def _local(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch, sort_keys=[(key, "ascending"), ("__h", "ascending"), (id_col, "ascending")]
        )
        g = batch.take(order)
        # head-k per group within the block (vectorized run-position)
        import numpy as np

        keys_np = g[key].to_numpy(zero_copy_only=False)
        new_grp = np.r_[True, keys_np[1:] != keys_np[:-1]]
        idx = np.arange(len(keys_np))
        pos = idx - np.maximum.accumulate(np.where(new_grp, idx, 0))
        return g.filter(pa.array(pos < k))

    def _final(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("__h", "ascending"), (id_col, "ascending")]
        )
        return group.take(order).slice(0, k).drop_columns(["__h"])

    local = ds.map_batches(_add_hash, batch_format="pyarrow").map_batches(
        _local, batch_format="pyarrow"
    )
    return local.groupby(key).map_groups(_final, batch_format="pyarrow")
