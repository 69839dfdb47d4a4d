import numpy as np
import pyarrow as pa
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.stages import similarity


def _embeddings(n=100, dim=16, seed=1):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    )
    return ds, vecs


def test_brute_force_self_is_rank_one():
    ds, vecs = _embeddings()
    out = similarity.knn_brute_force(ds, [0, 5], vecs[[0, 5]], k=5, concurrency=1).take_all()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid in (0, 5):
        rows = sorted(by_query[qid], key=lambda r: r["rank"])
        assert len(rows) == 5
        assert rows[0]["vec_id"] == qid  # self similarity = 1.0
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_brute_force_matches_numpy_oracle():
    ds, vecs = _embeddings(n=60)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit[2] @ unit.T
    expected = set(np.argsort(-sims)[:10].tolist())
    out = similarity.knn_brute_force(ds, [2], vecs[[2]], k=10, concurrency=1).take_all()
    assert {r["vec_id"] for r in out} == expected


def test_ivf_recalls_self_and_near_neighbors():
    ds, vecs = _embeddings(n=200)
    out = similarity.knn_ivf(ds, [0], vecs[[0]], k=5, n_cells=8, nprobe=4, concurrency=1).take_all()
    assert out, "ivf returned nothing"
    best = min(out, key=lambda r: r["rank"])
    assert best["vec_id"] == 0  # the probed cell always contains self


def _clustered_embeddings(n_clusters=16, per_cluster=40, dim=16, seed=3):
    """Vectors with real cluster structure (tight blobs around random
    unit centers) — the regime where centroid quality matters."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per_cluster, axis=0) + 0.15 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    vecs = vecs.astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    )
    return ds, vecs


def _recall(ds, vecs, centroids, n_cells=16, nprobe=4, k=10):
    qids = [0, 17, 101, 333, 555]
    qmat = vecs[qids]
    brute = {
        (r["query_id"], r["vec_id"])
        for r in similarity.knn_brute_force(ds, qids, qmat, k=k, concurrency=1).take_all()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.knn_ivf(
            ds, qids, qmat, k=k, n_cells=n_cells, nprobe=nprobe,
            concurrency=1, centroids=centroids,
        ).take_all()
    }
    return len(ivf & brute) / len(brute)


def test_ivf_kmeans_recall_gate_on_clustered_data():
    """The quality gate from the round-1 verdict: sampled k-means
    centroids must reach high recall on clustered data, and beat the
    naive smallest-id seeding there (smallest-id centroids all fall in
    few clusters, so most cells never form)."""
    ds, vecs = _clustered_embeddings()
    r_kmeans = _recall(ds, vecs, "kmeans")
    r_first = _recall(ds, vecs, "first")
    assert r_kmeans >= 0.9, r_kmeans
    assert r_kmeans >= r_first, (r_kmeans, r_first)


def test_ivf_recall_gate_on_testdata():
    """Pinned recall@10 vs brute force on the driver's embeddings table
    at the q_sim_topk_ivf configuration (measured 0.90; gate at 0.8)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = t.filter(pc.less(t["vec_id"], 5)).sort_by("vec_id")
    ids = qt["vec_id"].to_pylist()
    mat = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    brute = {
        (r["query_id"], r["vec_id"])
        for r in similarity.knn_brute_force(ds, ids, mat, k=10, concurrency=1).take_all()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.knn_ivf(
            ds, ids, mat, k=10, n_cells=16, nprobe=4, concurrency=1
        ).take_all()
    }
    assert len(ivf & brute) / len(brute) >= 0.8


def test_kmeans_centroids_deterministic_across_block_layouts():
    ds, vecs = _clustered_embeddings()
    c1 = similarity.kmeans_centroids(ds, 16)
    c2 = similarity.kmeans_centroids(ds.repartition(7), 16)
    assert np.array_equal(c1, c2)
