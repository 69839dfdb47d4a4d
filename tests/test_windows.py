import datetime

import pyarrow as pa
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.stages import relational, windows


def _events():
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap of 2h between event 3 and 4)
        (1, 1, base),
        (2, 1, base + datetime.timedelta(minutes=10)),
        (3, 1, base + datetime.timedelta(minutes=20)),
        (4, 1, base + datetime.timedelta(hours=2, minutes=20)),
        # user 2: single session
        (5, 2, base),
        (6, 2, base + datetime.timedelta(minutes=29)),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        )
    )


def test_sessionize_gap_semantics():
    out = {r["event_id"]: r for r in windows.sessionize(_events(), gap_seconds=1800).take_all()}
    assert [out[i]["session_id"] for i in (1, 2, 3, 4)] == [1, 1, 1, 2]
    assert [out[i]["event_seq"] for i in (1, 2, 3, 4)] == [1, 2, 3, 1]
    assert [out[i]["session_id"] for i in (5, 6)] == [1, 1]
    assert out[6]["event_seq"] == 2


def test_running_aggregate():
    ds = _events().map_batches(
        lambda b: b.append_column("v", pa.array([10] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    out = {r["event_id"]: r["running_sum"] for r in
           windows.running_aggregate(ds, "user_id", "ts", "v").take_all()}
    assert [out[i] for i in (1, 2, 3, 4)] == [10, 20, 30, 40]
    assert [out[i] for i in (5, 6)] == [10, 20]


def test_topk_per_group():
    tbl = pa.table(
        {
            "g": ["a", "a", "a", "b"],
            "score": pa.array([1.0, 3.0, 2.0, 9.0]),
            "id": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = windows.topk_per_group(
        ray.data.from_arrow(tbl), key="g", order_cols=["score", "id"], k=2,
        descending=[True, False],
    ).take_all()
    got = sorted((r["g"], r["rnk"], r["id"]) for r in out)
    assert got == [("a", 1, 2), ("a", 2, 3), ("b", 1, 4)]


def test_semi_and_anti_join():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "v": ["a", "b", "c", "d"]})
    )
    right = pa.table({"rk": pa.array([2, 4, 9], pa.int64())})
    semi = sorted(r["k"] for r in relational.broadcast_semi_join(
        left, right, keys=["k"], right_key_cols=["rk"]).take_all())
    anti = sorted(r["k"] for r in relational.broadcast_semi_join(
        left, right, keys=["k"], right_key_cols=["rk"], anti=True).take_all())
    assert semi == [2, 4]
    assert anti == [1, 3]


def test_asof_join():
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [base, base + dt.timedelta(minutes=5), base + dt.timedelta(minutes=9),
                     base],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=1), base + dt.timedelta(minutes=7)],
                    pa.timestamp("us"),
                ),
                "v": pa.array([100, 200], pa.int64()),
            }
        )
    )
    out = {r["event_id"]: r["v_asof"] for r in
           windows.asof_join(left, right, key="user_id", ts_col="ts",
                             right_value_cols=["v"]).take_all()}
    assert out == {1: None, 2: 100, 3: 200, 4: None}


def _events_table(rows):
    import datetime

    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "value_c": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _skewed_events(n=4000, hot_frac=0.9, seed=11):
    """One key owns 90% of the rows, spanning many time chunks."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        uid = 1 if i < int(n * hot_frac) else 2 + (i % 5)
        # seconds spread over ~ 12 chunk widths (chunk_seconds=3600)
        secs = int(rng.randint(0, 12 * 3600))
        rows.append((i, uid, secs, int(rng.randint(1, 100))))
    # unique (user, ts): perturb collisions deterministically
    seen = set()
    out = []
    for eid, uid, secs, v in rows:
        while (uid, secs) in seen:
            secs += 1
        seen.add((uid, secs))
        out.append((eid, uid, secs, v))
    return _events_table(out)


def test_running_aggregate_chunked_matches_plain():
    t = _skewed_events()
    ds = ray.data.from_arrow(t)
    plain = {
        r["event_id"]: r["running_sum"]
        for r in windows.running_aggregate(
            ds, key="user_id", ts_col="ts", value_col="value_c"
        ).take_all()
    }
    for via in ("broadcast", "join"):
        chunked = {
            r["event_id"]: r["running_sum"]
            for r in windows.running_aggregate_chunked(
                ds, key="user_id", ts_col="ts", value_col="value_c",
                chunk_seconds=3600.0, offsets_via=via,
            ).take_all()
        }
        assert chunked == plain, via


def test_sessionize_chunked_matches_plain_with_boundary_sessions():
    # gap smaller than chunk width AND sessions crossing chunk borders:
    # events every 300 s cross the 3600 s chunk boundary inside ONE
    # session; separate bursts create multiple sessions per chunk.
    rows = []
    eid = 0
    for uid in (1, 2):
        base = 0 if uid == 1 else 50
        for k in range(40):  # continuous session crossing ~3 chunks
            rows.append((eid, uid, base + k * 300, 1)); eid += 1
        for k in range(5):  # later burst, far gap
            rows.append((eid, uid, base + 40 * 300 + 7200 + k * 10, 1)); eid += 1
    t = _events_table(rows)
    ds = ray.data.from_arrow(t)
    plain = {
        r["event_id"]: (r["session_id"], r["event_seq"])
        for r in windows.sessionize(ds, gap_seconds=1800.0).take_all()
    }
    chunked = {
        r["event_id"]: (r["session_id"], r["event_seq"])
        for r in windows.sessionize_chunked(
            ds, gap_seconds=1800.0, chunk_seconds=3600.0
        ).take_all()
    }
    assert chunked == plain


def test_sessionize_chunked_matches_plain_on_skewed_data():
    t = _skewed_events(n=3000)
    ds = ray.data.from_arrow(t)
    plain = {
        r["event_id"]: (r["session_id"], r["event_seq"])
        for r in windows.sessionize(ds, gap_seconds=600.0).take_all()
    }
    chunked = {
        r["event_id"]: (r["session_id"], r["event_seq"])
        for r in windows.sessionize_chunked(
            ds, gap_seconds=600.0, chunk_seconds=3600.0, offsets_via="join"
        ).take_all()
    }
    assert chunked == plain


def test_asof_join_chunked_matches_plain():
    import numpy as np

    t = _skewed_events(n=2500)
    ds = ray.data.from_arrow(t)
    # right side: every third event is a "click"
    import pyarrow.compute as pc2

    right = ds.map_batches(
        lambda b: b.filter(pc2.equal(pc2.bit_wise_and(b["event_id"], 3), 0)),
        batch_format="pyarrow",
    ).select_columns(["user_id", "ts", "value_c"])
    left = ds.select_columns(["event_id", "user_id", "ts"])
    plain = {
        r["event_id"]: r["value_c_asof"]
        for r in windows.asof_join(
            left, right, key="user_id", ts_col="ts", right_value_cols=["value_c"]
        ).take_all()
    }
    for via in ("broadcast", "join"):
        chunked = {
            r["event_id"]: r["value_c_asof"]
            for r in windows.asof_join_chunked(
                left, right, key="user_id", ts_col="ts",
                right_value_cols=["value_c"], chunk_seconds=3600.0,
                offsets_via=via,
            ).take_all()
        }
        assert chunked == plain, via


def test_range_join_matches_bruteforce_on_skewed_data():
    import numpy as np

    t = _skewed_events(n=800)
    ds = ray.data.from_arrow(t)
    left = ds.select_columns(["event_id", "user_id", "ts"])
    import pyarrow.compute as pc3

    right = ds.map_batches(
        lambda b: b.filter(pc3.equal(pc3.bit_wise_and(b["event_id"], 7), 0)),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.rename_columns(
            ["rid" if c == "event_id" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    ).select_columns(["user_id", "ts", "rid"])
    W = 600.0
    got = sorted(
        (r["event_id"], r["rid_r"], r["dt_us"])
        for r in windows.range_join(
            left, right, key="user_id", ts_col="ts",
            window_seconds=W, right_cols=["rid"],
        ).take_all()
    )
    # brute force
    eid = t["event_id"].to_pylist()
    uid = t["user_id"].to_pylist()
    ts = [v.cast("int64").as_py() for v in __import__("pyarrow").compute.cast(t["ts"], "int64")]
    want = []
    for i in range(len(eid)):
        for j in range(len(eid)):
            if uid[i] == uid[j] and eid[j] % 8 == 0 and abs(ts[i] - ts[j]) <= W * 1e6:
                want.append((eid[i], eid[j], ts[i] - ts[j]))
    assert got == sorted(want)


def test_sliding_window_sum_matches_bruteforce_with_ties():
    import numpy as np

    rows = []
    eid = 0
    rng = np.random.RandomState(9)
    for uid in (1, 2):
        for k in range(300):
            # deliberately create ts ties within a user (RANGE peers)
            secs = int(rng.randint(0, 5 * 3600 // 10)) * 10
            rows.append((eid, uid, secs, int(rng.randint(1, 50)))); eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "value_c": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    W = 600.0
    got = {
        r["event_id"]: r["window_sum"]
        for r in windows.sliding_window_sum(
            ds, key="user_id", ts_col="ts", value_col="value_c",
            window_seconds=W,
        ).take_all()
    }
    ts_us = {r[0]: r[2] * 1_000_000 for r in rows}
    want = {}
    for eid_i, uid_i, secs_i, v_i in rows:
        s = 0
        for eid_j, uid_j, secs_j, v_j in rows:
            if uid_j == uid_i and secs_i * 1_000_000 - W * 1e6 <= secs_j * 1_000_000 <= secs_i * 1_000_000:
                s += v_j
        want[eid_i] = s
    assert got == want


def test_offsets_strategy_auto_switches():
    small = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64())})
    )
    via, _ = windows._offsets_strategy(small, "auto")
    assert via == "broadcast"
    orig = windows.OFFSETS_BROADCAST_LIMIT
    try:
        windows.OFFSETS_BROADCAST_LIMIT = 1
        via, _ = windows._offsets_strategy(small, "auto")
        assert via == "join"
    finally:
        windows.OFFSETS_BROADCAST_LIMIT = orig
    import pytest

    with pytest.raises(ValueError):
        windows._offsets_strategy(small, "bogus")
