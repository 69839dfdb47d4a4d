"""Similarity search over an embedding column (``list<float>``).

* ``knn_brute_force`` — the exactness baseline: one numpy matmul per
  batch against a broadcast query matrix (``ray.put`` once, read in
  every task), per-batch local top-k partials, tiny final reduce.
  Never materializes the corpus; shuffle volume is
  O(num_queries × k × num_blocks).
* ``knn_ivf`` — the scale path: vectors partitioned into coarse cells
  (deterministic centroids broadcast to every task), queries probe the
  ``nprobe`` nearest cells only.  Same output contract.

Output schema: (query_id, vec_id, score, rank) with rank 1-based per
query, score = cosine similarity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_table(
    qids: list, vids: np.ndarray, scores: np.ndarray, k: int
) -> pa.Table:
    """(queries × vectors) score matrix → long-form local top-k rows."""
    q_out, v_out, s_out = [], [], []
    kk = min(k, scores.shape[1])
    if kk > 0:
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        for qi, qid in enumerate(qids):
            for j in part[qi]:
                q_out.append(qid)
                v_out.append(int(vids[j]))
                s_out.append(float(scores[qi, j]))
    return pa.table(
        {
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(v_out, pa.int64()),
            "score": pa.array(s_out, pa.float64()),
        }
    )


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
    )
    top = group.take(order).slice(0, k)
    return top.append_column("rank", pa.array(range(1, top.num_rows + 1), pa.int32()))


# Per-worker cache of the normalized query matrix, keyed by the
# broadcast object id — task-pool economics (no actor startup latency)
# with broadcast-actor semantics; worker processes persist across
# tasks.  Bounded (oldest evicted) so repeated KNN calls don't grow
# worker RSS without limit; each entry pins the SOURCE object so a
# recycled id() can never alias a different query set.
_CACHE_MAX = 4  # per cache: bounds worker RSS across repeated calls


def _broadcast_cached(cache: dict, ref, build):
    """Per-worker cache of a built value keyed by the broadcast object:
    ObjectRefs key by hex; plain objects key by id() WITH the source
    pinned in the entry, so a recycled id can never alias a different
    object.  Oldest entry evicted at ``_CACHE_MAX``."""
    key = ref.hex() if isinstance(ref, ray.ObjectRef) else str(id(ref))
    ent = cache.get(key)
    if ent is not None and (isinstance(ref, ray.ObjectRef) or ent[0] is ref):
        return ent[1]
    obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    val = build(obj)
    while len(cache) >= _CACHE_MAX:
        cache.pop(next(iter(cache)))
    cache[key] = (ref, val)
    return val


_QUERIES_CACHE: dict[str, tuple] = {}


def _get_queries(queries_ref) -> tuple[list, np.ndarray]:
    return _broadcast_cached(
        _QUERIES_CACHE,
        queries_ref,
        lambda q: (
            q["query_id"],
            _unit(np.asarray(q["matrix"], dtype=np.float32)),
        ),
    )


_IVF_PLAN_CACHE: dict[str, tuple] = {}


def _get_ivf_plan(plan_ref) -> dict:
    return _broadcast_cached(_IVF_PLAN_CACHE, plan_ref, lambda p: p)


def _ivf_score(
    batch: pa.Table, plan_ref, vec_col: str, id_col: str, k: int
) -> pa.Table:
    """Assign each vector to its nearest centroid cell, score it only
    against the queries probing that cell."""
    plan = _get_ivf_plan(plan_ref)
    cents, cell_queries = plan["cents"], plan["cell_queries"]
    qids, qmat = plan["qids"], plan["qmat"]
    vecs = _unit(np.asarray(batch[vec_col].to_pylist(), dtype=np.float32))
    vids = np.asarray(batch[id_col].to_pylist())
    assign = np.argmax(vecs @ cents.T, axis=1)
    tables = []
    for cell in np.unique(assign):
        qidx = cell_queries.get(int(cell))
        if not qidx:
            continue
        mask = assign == cell
        scores = qmat[qidx] @ vecs[mask].T
        tables.append(_topk_table([qids[q] for q in qidx], vids[mask], scores, k))
    if not tables:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(tables)


def _brute_force_score(
    batch: pa.Table, queries_ref, vec_col: str, id_col: str, k: int
) -> pa.Table:
    """One matmul per batch against the broadcast query matrix."""
    qids, qmat = _get_queries(queries_ref)
    vecs = _unit(np.asarray(batch[vec_col].to_pylist(), dtype=np.float32))
    vids = np.asarray(batch[id_col].to_pylist())
    scores = qmat @ vecs.T
    return _topk_table(qids, vids, scores, k)


class BruteForceScorer:
    """Actor-pool form of :func:`_brute_force_score` (kept for callers
    that want an explicit pool; ``knn_brute_force`` uses the task pool)."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int):
        self.qids, self.qmat = _get_queries(queries_ref)
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _unit(np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float32))
        vids = np.asarray(batch[self.id_col].to_pylist())
        scores = self.qmat @ vecs.T
        return _topk_table(self.qids, vids, scores, self.k)


def knn_brute_force(
    ds: ray.data.Dataset,
    query_ids: list,
    query_matrix: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    queries_ref = ray.put({"query_id": list(query_ids), "matrix": query_matrix})
    if isinstance(concurrency, tuple):
        concurrency = concurrency[1]  # task pools take a single cap
    # task pool (not an actor pool): per-worker query-matrix cache gives
    # broadcast-actor economics without actor startup, and scheduling
    # stays elastic next to other stages.  ``concurrency`` still caps
    # concurrent scoring tasks when the caller asks for a bound.
    partials = ds.map_batches(
        _brute_force_score,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_kwargs={
            "queries_ref": queries_ref,
            "vec_col": vec_col,
            "id_col": id_col,
            "k": k,
        },
    )
    # partials are tiny (≤ queries × k rows per block): a handful of
    # aggregators beats Ray's default of one per input block
    from .relational import partitions_for

    return partials.groupby(
        "query_id", num_partitions=partitions_for(scale=0.125, minimum=4)
    ).map_groups(_final_topk, batch_format="pyarrow", fn_kwargs={"k": k})


def deterministic_centroids(
    ds: ray.data.Dataset, n_cells: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Deterministic coarse centroids: the vectors with the ``n_cells``
    smallest ids (seed-free, stable across runs/cluster sizes; the
    quality path is ``kmeans_centroids``)."""
    rows = (
        ds.select_columns([id_col, vec_col])
        .sort(id_col)
        .limit(n_cells)
        .take_all()
    )
    return _unit(np.asarray([r[vec_col] for r in rows], dtype=np.float32))


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return x ^ (x >> np.uint64(33))


def kmeans_centroids(
    ds: ray.data.Dataset,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
) -> np.ndarray:
    """Deterministic sampled spherical k-means centroids.

    Sampling is an id-hash filter (``splitmix64(id) < p·2^64``) — the
    sample is a pure function of the ids, independent of block layout
    and cluster size, and its size is bounded, so collecting it on the
    driver is safe at any corpus scale.  Lloyd iterations run in numpy
    on the sample; empty cells reseed to the point farthest from its
    assigned centroid (deterministic, index tie-break).  Returns unit
    centroids (cosine / spherical k-means)."""
    n = ds.count()
    sample: list = []
    if n > 0:
        p = min(1.0, (4.0 * sample_size) / n)
        thresh = np.uint64(min(int(p * 2.0**64), 2**64 - 1))

        def _sample(batch):
            import pyarrow as _pa

            ids = (
                batch[id_col]
                .cast(_pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            mask = _splitmix(ids) <= thresh
            return batch.filter(_pa.array(mask))

        sample = (
            ds.select_columns([id_col, vec_col])
            .map_batches(_sample, batch_format="pyarrow")
            .take_all()
        )
    if not sample:  # degenerate corpus — fall back to smallest ids
        return deterministic_centroids(ds, n_cells, vec_col, id_col)
    sample.sort(key=lambda r: r[id_col])
    sample = sample[: 4 * sample_size]
    pts = _unit(np.asarray([r[vec_col] for r in sample], dtype=np.float64))
    k = min(n_cells, len(pts))
    cents = pts[:k].copy()
    for _ in range(iters):
        assign = np.argmax(pts @ cents.T, axis=1)
        sims = (pts * cents[assign]).sum(axis=1)
        new = np.zeros_like(cents)
        np.add.at(new, assign, pts)
        norms = np.linalg.norm(new, axis=1)
        for c in np.flatnonzero(norms == 0):  # empty cell → farthest point
            far = int(np.argmin(sims))
            new[c] = pts[far]
            norms[c] = np.linalg.norm(pts[far])
            sims[far] = np.inf
        cents = new / norms[:, None]
    return cents.astype(np.float32)


def knn_ivf(
    ds: ray.data.Dataset,
    query_ids: list,
    query_matrix: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | tuple = (1, 4),
    centroids: str = "kmeans",
) -> ray.data.Dataset:
    """IVF-style ANN: assign each vector to its nearest centroid cell,
    score a query only against vectors in its ``nprobe`` closest cells.
    Approximate by construction; recall grows with nprobe and with
    centroid quality (``centroids="kmeans"`` = deterministic sampled
    spherical k-means; ``"first"`` = smallest-id seeding)."""
    if centroids == "kmeans":
        cents = kmeans_centroids(ds, n_cells, vec_col, id_col)
    else:
        cents = deterministic_centroids(ds, n_cells, vec_col, id_col)
    qmat = _unit(np.asarray(query_matrix, dtype=np.float32))
    # stable sort: ties probe the smaller cell index first, so the
    # probe set is deterministic and SQL-replicable (score desc, cell asc)
    probe_cells = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    # query sets per cell: cell → [query indices probing it]
    cell_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe_cells):
        for c in cells:
            cell_queries.setdefault(int(c), []).append(qi)
    # one broadcast object: centroids + probe plan together (the same
    # per-worker-cache task-pool shape as knn_brute_force)
    plan_ref = ray.put(
        {
            "cents": cents,
            "cell_queries": cell_queries,
            "qids": list(query_ids),
            "qmat": qmat,
        }
    )
    if isinstance(concurrency, tuple):
        concurrency = concurrency[1]  # task pools take a single cap
    partials = ds.map_batches(
        _ivf_score,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_kwargs={
            "plan_ref": plan_ref,
            "vec_col": vec_col,
            "id_col": id_col,
            "k": k,
        },
    )
    # partials are tiny (≤ queries × k rows per block): a handful of
    # aggregators beats Ray's default of one per input block
    from .relational import partitions_for

    return partials.groupby(
        "query_id", num_partitions=partitions_for(scale=0.125, minimum=4)
    ).map_groups(_final_topk, batch_format="pyarrow", fn_kwargs={"k": k})
