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
