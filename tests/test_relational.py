import pyarrow as pa
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.stages import relational


def test_broadcast_join_inner():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 2], pa.int64()), "v": pa.array([10, 20, 30, 21])})
    )
    right = pa.table({"rk": pa.array([1, 2], pa.int64()), "name": ["a", "b"]})
    out = relational.broadcast_join(
        left, right, keys=["k"], right_keys=["rk"], concurrency=1
    ).take_all()
    got = sorted((r["k"], r["v"], r["name"]) for r in out)
    assert got == [(1, 10, "a"), (2, 20, "b"), (2, 21, "b")]


def test_pre_aggregated_matches_pandas():
    import pandas as pd

    df = pd.DataFrame(
        {"g": ["x", "y", "x", "y", "x"], "v": [1, 2, 3, 4, 5], "w": [2, 2, 2, 2, 2]}
    )
    ds = ray.data.from_pandas(df)
    out = relational.pre_aggregated(
        ds, keys=["g"], aggs={"v_sum": "v:sum", "n": "v:count", "v_max": "v:max"}
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert out["v_sum"].tolist() == [9, 6]
    assert out["n"].tolist() == [3, 2]
    assert out["v_max"].tolist() == [5, 4]


def test_topk_with_tiebreak():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "score": pa.array([5.0, 5.0, 9.0, 1.0, 9.0]),
            }
        )
    )
    out = relational.topk(ds, ["score", "id"], k=3, descending=[True, False]).take_all()
    assert [(r["score"], r["id"]) for r in out] == [(9.0, 3), (9.0, 5), (5.0, 1)]


def test_distinct():
    ds = ray.data.from_arrow(
        pa.table({"a": ["x", "x", "y"], "b": [1, 1, 2]})
    )
    out = sorted((r["a"], r["b"]) for r in relational.distinct(ds, ["a", "b"]).take_all())
    assert out == [("x", 1), ("y", 2)]


def test_bucketed_group_aggregate_equals_native():
    import numpy as np

    rng = np.random.RandomState(3)
    n = 5000
    tbl = pa.table(
        {
            "k1": pa.array([f"key{int(i)}" for i in rng.randint(0, 50, n)]),
            "k2": pa.array([bool(i) for i in rng.randint(0, 2, n)]),
            "v": pa.array(rng.randint(0, 100, n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    fast = relational.bucketed_group_aggregate(
        ds, keys=["k1", "k2"], agg_specs=[("v", "sum")], rename={"v_sum": "total"},
        num_buckets=7,
    ).to_pandas()
    expected = tbl.to_pandas().groupby(["k1", "k2"], as_index=False)["v"].sum()
    merged = fast.merge(expected, on=["k1", "k2"])
    assert len(merged) == len(expected) == len(fast)
    assert (merged["total"] == merged["v"]).all()


def test_salted_group_aggregate_exact_under_skew():
    import numpy as np

    # pathological skew: one key holds 90% of rows (the hot stdlib
    # symbol of the north rule)
    n = 20000
    rng = np.random.RandomState(11)
    hot = rng.rand(n) < 0.9
    keys = np.where(hot, "len", np.char.add("k", rng.randint(0, 100, n).astype(str)))
    tbl = pa.table(
        {"sym": pa.array(keys.tolist()), "v": pa.array(rng.randint(0, 10, n), pa.int64())}
    )
    ds = ray.data.from_arrow(tbl)
    out = relational.salted_group_aggregate(
        ds, keys=["sym"], agg_specs=[("v", "sum"), ("v", "count")],
        rename={"v_sum": "total", "v_count": "n"}, salt=8, num_buckets=8,
    ).to_pandas()
    expected = (
        tbl.to_pandas().groupby("sym", as_index=False)
        .agg(total=("v", "sum"), n=("v", "count"))
    )
    merged = out.merge(expected, on="sym", suffixes=("", "_exp"))
    assert len(merged) == len(expected) == len(out)
    assert (merged["total"] == merged["total_exp"]).all()
    assert (merged["n"] == merged["n_exp"]).all()


def test_salted_rejects_non_associative():
    ds = ray.data.from_arrow(pa.table({"k": ["a"], "v": pa.array([1], pa.int64())}))
    import pytest

    with pytest.raises(ValueError):
        relational.salted_group_aggregate(ds, ["k"], [("v", "mean")])


def test_grouped_quantiles_matches_bruteforce():
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    rng = np.random.RandomState(5)
    keys = rng.choice(["a", "b"], size=2000)
    vals = rng.randint(0, 40, size=2000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    )
    out = {
        (r["k"], r["q"]): r["value"]
        for r in relational.grouped_quantiles(
            ds, keys=["k"], value_col="v", quantiles=[0.1, 0.5, 0.9]
        ).take_all()
    }
    for k in ("a", "b"):
        sub = np.sort(vals[keys == k])
        for q in (0.1, 0.5, 0.9):
            rank = max(1, math.ceil(q * len(sub)))
            assert out[(k, q)] == sub[rank - 1], (k, q)


def test_hll_estimate_accuracy():
    """The sketch's estimate must track the exact distinct count within
    a few sigma (sigma ~ 1.6% at p=12); checked at several scales."""
    import numpy as np

    from knowledge_graph_creation_from_text_with_llms_ray.functions.sketch import (
        hll_estimate,
        hll_partial,
    )

    rng = np.random.RandomState(3)
    for true_n in (100, 5000, 200_000):
        vals = rng.randint(0, 2**62, size=true_n).astype(np.int64)
        vals = np.unique(vals)  # exact distinct set
        rows = np.repeat(vals, 2)  # duplicates must not matter
        b, r = hll_partial(rows)
        est = hll_estimate(b, r)
        assert abs(est - len(vals)) / len(vals) < 0.08, (true_n, est)


def test_hll_registers_merge_and_layout_invariance():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    vals = np.arange(10_000, dtype=np.int64) * 7919
    t = pa.table({"x": pa.array(vals)})
    a = sorted(
        (r["bucket"], r["register"])
        for r in relational.approx_distinct_registers(
            ray.data.from_arrow(t), "x"
        ).take_all()
    )
    b = sorted(
        (r["bucket"], r["register"])
        for r in relational.approx_distinct_registers(
            ray.data.from_arrow(t).repartition(13), "x"
        ).take_all()
    )
    assert a == b and len(a) > 0


def test_hash_join_semi_anti_match_broadcast():
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 2], pa.int64()),
                "v": pa.array([10, 20, 30, 40, 21], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 3, 3], pa.int64()), "junk": ["a", "b", "c"]})
    )
    semi = relational.hash_join(
        left, right, on=("k",), right_on=("rk",), join_type="left_semi"
    )
    assert semi.schema().names == ["k", "v"]  # no right columns leak
    assert sorted((r["k"], r["v"]) for r in semi.take_all()) == [
        (2, 20), (2, 21), (3, 30)
    ]
    anti = relational.hash_join(
        left, right, on=("k",), right_on=("rk",), join_type="left_anti"
    )
    assert sorted((r["k"], r["v"]) for r in anti.take_all()) == [(1, 10), (4, 40)]


def test_hash_join_empty_sides_preserve_schema():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["x", "y"]})
    )
    empty_right = ray.data.from_arrow(
        pa.table(
            {"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.float64())}
        )
    )
    # inner join with empty right: empty result with the FULL joined schema
    inner = relational.hash_join(
        left, empty_right, on=("k",), right_on=("rk",), join_type="inner"
    )
    assert inner.count() == 0
    assert inner.schema().names == ["k", "v", "rv"]
    # anti join with empty right: every left row survives
    anti = relational.hash_join(
        left, empty_right, on=("k",), right_on=("rk",), join_type="left_anti"
    )
    assert sorted(r["k"] for r in anti.take_all()) == [1, 2]
    # left_outer with empty right: left rows + typed null right columns
    louter = relational.hash_join(
        left, empty_right, on=("k",), right_on=("rk",), join_type="left_outer"
    )
    rows = sorted(louter.take_all(), key=lambda r: r["k"])
    assert [r["rv"] for r in rows] == [None, None]
    # empty left: empty result, joined schema (filter keeps typed empty
    # blocks; a limit(0) yields ZERO blocks and the schema is then
    # genuinely unrecoverable — the documented legacy fallback)
    empty_left = left.filter(expr="k > 100").materialize()
    out = relational.hash_join(
        empty_left, empty_right, on=("k",), right_on=("rk",), join_type="inner"
    )
    assert out.count() == 0
    assert out.schema().names == ["k", "v", "rv"]


def test_tdigest_compress_preserves_mass_and_bounds_size():
    import numpy as np

    from knowledge_graph_creation_from_text_with_llms_ray.functions.sketch import (
        tdigest_compress,
        tdigest_quantiles,
    )

    vals = np.linspace(0.0, 1.0, 10_000)
    m, c = tdigest_compress(vals, np.ones(len(vals), dtype=np.int64), delta=100)
    assert c.sum() == 10_000
    assert len(m) <= 202  # ~delta centroids (greedy split slack ≤2×)
    assert np.all(np.diff(m) >= 0)
    est = tdigest_quantiles(m, c, [0.5])[0]
    assert abs(est - 0.5) < 0.02


def test_tdigest_operator_rank_accuracy():
    import numpy as np

    rng = np.random.RandomState(7)
    datasets = {
        "uniform": rng.uniform(0, 1, 20_000),
        "normal": rng.normal(100, 15, 20_000),
        "lognormal": rng.lognormal(0, 1.5, 20_000),  # heavy right tail
    }
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    for name, vals in datasets.items():
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.float64())})
        ).repartition(16)
        out = {
            round(r["q"], 4): r["value"]
            for r in relational.approx_quantiles_tdigest(ds, "v", qs).take_all()
        }
        for q in qs:
            est = out[round(q, 4)]
            true_rank = float(np.mean(vals <= est))
            # uniform-budget digest: rank error ~1/delta (=0.5%); pin 2%
            assert abs(true_rank - q) <= 0.02, (name, q, est, true_rank)


def test_bloom_semi_join_exact_even_with_false_positives():
    import numpy as np
    import pytest

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(200)), pa.int64()),
                "v": pa.array([f"row{i}" for i in range(200)], pa.string()),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([3, 7, 7, 42, 199, 555], pa.int64())})
    )
    want_semi = [3, 7, 42, 199]
    # tiny filter (64 bits for 5 distinct keys) -> false positives certain;
    # exact_verify must still give the exact answer
    for m_bits in (64, 1 << 16):
        semi = sorted(
            r["k"]
            for r in relational.bloom_semi_join(
                left, right, on="k", right_on="rk", m_bits=m_bits
            ).take_all()
        )
        assert semi == want_semi, m_bits
        anti = sorted(
            r["k"]
            for r in relational.bloom_semi_join(
                left, right, on="k", right_on="rk", m_bits=m_bits, anti=True
            ).take_all()
        )
        assert anti == sorted(set(range(200)) - set(want_semi)), m_bits
    # pure-filter mode never drops a true match
    cand = {
        r["k"]
        for r in relational.bloom_semi_join(
            left, right, on="k", right_on="rk", m_bits=64, exact_verify=False
        ).take_all()
    }
    assert set(want_semi) <= cand
    with pytest.raises(ValueError):
        relational.bloom_semi_join(
            left, right, on="k", right_on="rk", anti=True, exact_verify=False
        )


def test_bloom_semi_join_empty_right():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["a", "b"]})
    )
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert relational.bloom_semi_join(left, empty, on="k", right_on="rk").count() == 0
    assert (
        relational.bloom_semi_join(
            left, empty, on="k", right_on="rk", anti=True
        ).count()
        == 2
    )


def test_tdigest_grouped_rank_accuracy():
    import numpy as np

    rng = np.random.RandomState(11)
    # skewed groups: one key holds 90% of rows, different distributions
    n = 30_000
    hot = rng.rand(n) < 0.9
    keys = np.where(hot, "hot", "cold")
    vals = np.where(hot, rng.lognormal(0, 1.0, n), rng.uniform(50, 60, n))
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.tolist()), "v": pa.array(vals, pa.float64())})
    ).repartition(16)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = {
        (r["k"], round(r["q"], 4)): r["value"]
        for r in relational.approx_quantiles_tdigest_grouped(
            ds, keys=["k"], value_col="v", quantiles=qs
        ).take_all()
    }
    for k in ("hot", "cold"):
        sub = vals[keys == k]
        for q in qs:
            est = out[(k, round(q, 4))]
            true_rank = float(np.mean(sub <= est))
            assert abs(true_rank - q) <= 0.02, (k, q, est, true_rank)


def test_pivot_aggregate_sum_and_count():
    """Wide conditional aggregation: per-category masked partials,
    exact integer sums, unknown categories ignored, count mode."""
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b", "a"]),
            "p": pa.array(["x", "y", "x", "z", "x"]),
            "v": pa.array([1, 2, 3, 4, 10], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    got = {
        r["k"]: (r["x_sum"], r["y_sum"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v", categories=["x", "y"]
        ).take_all()
    }
    assert got == {"a": (11, 2), "b": (3, 0)}  # 'z' rows ignored
    cnt = {
        r["k"]: (r["x_count"], r["y_count"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x", "y"], agg="count",
        ).take_all()
    }
    assert cnt == {"a": (2, 1), "b": (1, 0)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x"], agg="avg",
        )


def test_unpivot_roundtrip():
    """pivot → unpivot round trip: every (key, category) value lands in
    exactly one long row; keys replicate per value column."""
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    wide = pa.table(
        {
            "k": pa.array(["a", "b"]),
            "x_sum": pa.array([11, 3], pa.int64()),
            "y_sum": pa.array([2, 0], pa.int64()),
        }
    )
    got = sorted(
        (r["k"], r["variable"], r["value"])
        for r in relational.unpivot(
            ray.data.from_arrow(wide), keys=["k"], value_cols=["x_sum", "y_sum"]
        ).take_all()
    )
    assert got == [
        ("a", "x_sum", 11.0), ("a", "y_sum", 2.0),
        ("b", "x_sum", 3.0), ("b", "y_sum", 0.0),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        relational.unpivot(ray.data.from_arrow(wide), keys=["k"], value_cols=[])


def test_pivot_aggregate_min_max_and_nulls():
    """min/max pivots use a NULL-identity masked partial: absent (or
    all-null) categories come out NULL like SQL's MIN(CASE ...); null
    VALUES never contribute to any agg (sum used to crash on them via
    the NaN-ing to_numpy round trip)."""
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b", "b", "b"]),
            "p": pa.array(["x", "x", "y", "x", "y", "y"]),
            "v": pa.array([5, 2, None, 7, None, None], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    lo = {
        r["k"]: (r["x_min"], r["y_min"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x", "y"], agg="min",
        ).take_all()
    }
    # a/y and b/y have only null values → NULL, not 0
    assert lo == {"a": (2, None), "b": (7, None)}
    hi = {
        r["k"]: (r["x_max"], r["y_max"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x", "y"], agg="max",
        ).take_all()
    }
    assert hi == {"a": (5, None), "b": (7, None)}
    # sum skips null values (SQL semantics) instead of raising
    s = {
        r["k"]: (r["x_sum"], r["y_sum"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x", "y"], agg="sum",
        ).take_all()
    }
    assert s == {"a": (7, 0), "b": (7, 0)}
    # count counts matching ROWS, value nulls included
    c = {
        r["k"]: (r["x_count"], r["y_count"])
        for r in relational.pivot_aggregate(
            ds, keys=["k"], pivot_col="p", value_col="v",
            categories=["x", "y"], agg="count",
        ).take_all()
    }
    assert c == {"a": (2, 1), "b": (1, 2)}
