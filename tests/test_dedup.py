import pyarrow as pa
import pytest
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.stages import dedup


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_exact_dedup_keeps_min_id():
    ds = _docs([(3, "aaa"), (1, "aaa"), (2, "bbb"), (5, "aaa"), (4, "bbb")])
    out = sorted((r["doc_id"], r["text"]) for r in dedup.exact_dedup(ds).take_all())
    assert out == [(1, "aaa"), (2, "bbb")]


def test_fingerprint_dedup_matches_exact():
    rows = [(i, f"text number {i % 4}") for i in range(12)]
    ds = _docs(rows)
    out = sorted(r["doc_id"] for r in dedup.fingerprint_dedup(ds).take_all())
    assert out == [0, 1, 2, 3]


def test_minhash_finds_near_duplicates():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spacecraft telemetry " * 10
    ds = _docs([(1, base), (2, near), (3, other), (4, base)])
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(ds, threshold=0.5, concurrency=1).take_all()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical docs
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5  # near-dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs


def test_simhash_identical_distance_zero():
    base = "alpha beta gamma delta " * 20
    ds = _docs([(1, base), (2, base), (3, "unrelated words entirely different " * 20)])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(ds, max_hamming=3).take_all()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_exact_verification():
    a = "one two three four five six seven eight nine ten"
    ds = _docs([(1, a), (2, a), (3, "x y z w v u t s r q")])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           dedup.ngram_jaccard_pairs(ds, threshold=0.9, concurrency=1).take_all()}
    assert out == {(1, 2): 1.0}


def test_ngram_jaccard_matches_bruteforce():
    """The distributed shared-gram pipeline must equal the all-pairs
    set computation exactly (it IS exact — no LSH estimate)."""
    from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import jaccard, ngram_set

    texts = {
        1: "a b c d e f g h",
        2: "a b c d e f g x",
        3: "a b c q r s t u",
        4: "q r s t u v w x",
        5: "completely different words here now",
    }
    ds = _docs(sorted(texts.items()))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(ds, threshold=0.1, concurrency=1).take_all()
    }
    want = {}
    ids = sorted(texts)
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            j = jaccard(ngram_set(texts[x], 3), ngram_set(texts[y], 3))
            if j >= 0.1:
                want[(x, y)] = j
    assert got == want


def test_embedding_near_dup_finds_planted_pair():
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[7] = vecs[3] + rng.standard_normal(16).astype(np.float32) * 0.01  # planted dup
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(ds, threshold=0.99, planes=4).take_all()
    }
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.99


def test_bucket_truncation_caps_pairs_at_smallest_ids():
    """Skew guard: a bucket larger than max_bucket contributes only its
    max_bucket smallest ids to pair generation (flagged, not silent)."""
    base = "identical content repeated for every doc " * 5
    ds = _docs([(i, base) for i in range(20)])  # one giant bucket
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            ds, threshold=0.9, concurrency=1, max_bucket=8
        ).take_all()
    }
    expected = {(a, b) for a in range(8) for b in range(a + 1, 8)}
    assert pairs == expected


def test_fingerprint_dedup_slim_matches_plain():
    rows = [(i, f"text number {i % 4}") for i in range(12)]
    ds = _docs(rows)
    plain = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in dedup.fingerprint_dedup(ds).take_all()
    )
    slim = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in dedup.fingerprint_dedup_slim(ds).take_all()
    )
    assert slim == plain
    # slim path also recovers the full rows (text column intact)
    full = dedup.fingerprint_dedup_slim(ds).take_all()
    assert all("text" in r for r in full)


def test_no_candidate_pairs_yields_empty_not_crash():
    """Empty-join edge: datasets with zero near-dup candidates must
    produce empty results (Ray's Join fails on schema-less empty
    partitions; hash_join short-circuits them)."""
    ds = _docs([(1, "a b c d"), (2, "x y z w")])
    assert dedup.ngram_jaccard_pairs(ds, threshold=0.1, concurrency=1).take_all() == []
    ds2 = _docs(
        [(1, "completely different text one " * 5),
         (2, "another unrelated thing entirely " * 5)]
    )
    assert dedup.minhash_lsh_pairs(ds2, threshold=0.9, concurrency=1).take_all() == []


def test_fingerprint_dedup_slim_empty_input():
    assert dedup.fingerprint_dedup_slim(_docs([])).take_all() == []


def test_minhash_empty_documents_never_pair():
    """Empty docs have empty shingle sets (zero signatures); pairing
    them as est=1.0 near-dups is meaningless — they are excluded from
    banding (the SQL oracle has the same semantics)."""
    ds = _docs([(1, ""), (2, ""), (3, "real content here " * 10)])
    assert dedup.minhash_lsh_pairs(ds, threshold=0.1, concurrency=1).take_all() == []


@pytest.mark.parametrize("via", ["local", "distributed"])
def test_connected_components_chain_and_star(via):
    """Label propagation must traverse multi-hop chains (several
    iterations), not just direct neighbors — on BOTH size-switch
    paths (driver numpy and distributed joins)."""
    pairs = pa.table(
        {
            # chain 1-2-3-4-5 (built as consecutive pairs), star 10-(11,12),
            # isolated pair 20-21
            "id_a": pa.array([1, 2, 3, 4, 10, 10, 20], pa.int64()),
            "id_b": pa.array([2, 3, 4, 5, 11, 12, 21], pa.int64()),
        }
    )
    out = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            ray.data.from_arrow(pairs), via=via
        ).take_all()
    }
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_long_chain_converges():
    """A >50-node chain — the mirror-of-a-mirror shape that exceeded
    the old O(diameter) round budget — must fully converge within the
    default max_iters thanks to pointer jumping (O(log diameter))."""
    n = 120
    pairs = pa.table(
        {
            "id_a": pa.array(list(range(n - 1)), pa.int64()),
            "id_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    out = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            ray.data.from_arrow(pairs), max_iters=12, via="distributed"
        ).take_all()
    }
    assert out == {i: 0 for i in range(n)}


def test_connected_components_nonconvergence_is_loud():
    """Exhausting max_iters without a confirmed fixpoint must RAISE by
    default (silent partial labels let duplicates survive dedup), and
    return partial labels under on_nonconverged='warn'."""
    n = 40
    pairs = pa.table(
        {
            "id_a": pa.array(list(range(n - 1)), pa.int64()),
            "id_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    for via in ("local", "distributed"):
        with pytest.raises(RuntimeError, match="fixpoint"):
            dedup.connected_components(
                ray.data.from_arrow(pairs), max_iters=1, via=via
            ).take_all()
    labels = dedup.connected_components(
        ray.data.from_arrow(pairs), max_iters=1, on_nonconverged="warn"
    ).take_all()
    assert len(labels) == n  # partial labels returned, loudly
    with pytest.raises(ValueError):
        dedup.connected_components(
            ray.data.from_arrow(pairs), on_nonconverged="nope"
        )
    with pytest.raises(ValueError):
        dedup.connected_components(ray.data.from_arrow(pairs), via="nope")


def test_connected_components_paths_agree_random_graph():
    """The driver numpy path and the distributed join path are twins:
    identical labels on a random graph with chains, stars and isolated
    pairs."""
    import numpy as np

    rng = np.random.RandomState(11)
    a = rng.randint(0, 400, 600).astype(np.int64)
    b = (a + rng.randint(1, 40, 600)).astype(np.int64)
    pairs = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    res = {}
    for via in ("local", "distributed"):
        res[via] = sorted(
            (r["node"], r["component"])
            for r in dedup.connected_components(
                ray.data.from_arrow(pairs), via=via
            ).take_all()
        )
    assert res["local"] == res["distributed"]


def test_fingerprint_slim_join_path_matches_broadcast():
    """recover='join' (the 100-TB distributed semi-join) must produce
    the same survivors as the broadcast path and as fingerprint_dedup."""
    rows = [(i, f"text number {i % 5}") for i in range(20)]
    ds = _docs(rows)
    want = sorted(r["doc_id"] for r in dedup.fingerprint_dedup(ds).take_all())
    for mode in ("broadcast", "join"):
        got = sorted(
            r["doc_id"]
            for r in dedup.fingerprint_dedup_slim(_docs(rows), recover=mode).take_all()
        )
        assert got == want == [0, 1, 2, 3, 4], mode


def test_fingerprint_slim_auto_switches_on_limit():
    rows = [(i, f"text {i}") for i in range(10)]  # all distinct -> 10 winners
    # broadcast_limit below the winner count forces the join path in auto
    got = sorted(
        r["doc_id"]
        for r in dedup.fingerprint_dedup_slim(
            _docs(rows), recover="auto", broadcast_limit=3
        ).take_all()
    )
    assert got == list(range(10))


def test_drop_losers_bloom_matches_plain_join():
    """The Bloom-prefiltered loser drop (the curation/survivors
    composition path) must be row-identical to the plain distributed
    left_anti — including under a deliberately tiny filter where false
    positives are certain (exact_verify catches them in the sliver
    join)."""
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(300)), pa.int64()),
                "text": pa.array([f"d{i}" for i in range(300)], pa.string()),
            }
        )
    ).repartition(5)
    losers = rd.from_arrow(
        pa.table({"node": pa.array([2, 17, 17, 250, 999], pa.int64())})
    )
    want = sorted(set(range(300)) - {2, 17, 250})
    via_join = sorted(
        r["doc_id"] for r in dedup.drop_losers(docs, losers, via="join").take_all()
    )
    via_bloom = sorted(
        r["doc_id"] for r in dedup.drop_losers(docs, losers, via="bloom").take_all()
    )
    assert via_join == want
    assert via_bloom == want
    with pytest.raises(ValueError):
        dedup.drop_losers(docs, losers, via="nope")


def test_ngram_df_cap_bounds_hot_gram():
    """One stop-word gram shared by 90% of docs: the finite default cap
    drops it, so the pair budget stays bounded by the rare grams."""
    hot = "the of and"  # one shared 3-gram across the hot docs
    rows = [(i, f"{hot} unique{i} tail{i} word{i}") for i in range(45)]
    rows += [(100 + i, f"cold{i} calm{i} quiet{i} still{i}") for i in range(5)]
    ds = _docs(rows)
    # exact mode: the hot gram alone yields 45*44/2 = 990 pairs
    exact = dedup.ngram_jaccard_pairs(
        ds, threshold=0.01, concurrency=1, df_cap=None
    ).take_all()
    assert len(exact) == 990
    # capped (production default is finite): hot gram dropped entirely
    capped = dedup.ngram_jaccard_pairs(
        ds, threshold=0.01, concurrency=1, df_cap=10
    ).take_all()
    assert capped == []
    import inspect

    default = inspect.signature(dedup.ngram_jaccard_pairs).parameters["df_cap"].default
    assert default is not None  # production default must stay finite


def test_cross_ngram_contamination_matches_bruteforce():
    """Containment = |grams(train) ∩ grams(eval)| / |grams(eval)| —
    asymmetric: a long train doc fully containing a short eval doc
    scores 1.0 where Jaccard would dilute it."""
    from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import hash64, ngram_set

    train_texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "one two three four five six seven",
        3: "unrelated words entirely different content here",
    }
    eval_texts = {
        101: "alpha beta gamma delta",          # fully inside doc 1
        102: "six seven eight nine ten",        # partial overlap with 2
        103: "nothing shared with anything",
    }
    train = _docs(sorted(train_texts.items()))
    ev = _docs(sorted(eval_texts.items()))
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.cross_ngram_contamination(
            train, ev, threshold=0.2, df_cap=None
        ).take_all()
    }
    want = {}
    for t, tt in train_texts.items():
        tg = {hash64(g) for g in ngram_set(tt, 3)}
        for e, et in eval_texts.items():
            eg = {hash64(g) for g in ngram_set(et, 3)}
            c = len(tg & eg) / len(eg) if eg else 0.0
            if c >= 0.2:
                want[(t, e)] = c
    assert got == want
    assert got[(1, 101)] == 1.0  # full containment despite size mismatch


def test_cross_ngram_contamination_df_cap_bounds_hot_gram():
    hot = "the of and"
    train = _docs([(i, f"{hot} t{i} u{i} v{i}") for i in range(30)])
    ev = _docs([(100 + i, f"{hot} e{i} f{i} g{i}") for i in range(10)])
    capped = dedup.cross_ngram_contamination(
        train, ev, threshold=0.01, df_cap=5
    ).take_all()
    assert capped == []  # the only shared gram exceeded the cap on both sides


def test_word_shingle_minhash_separates_small_vocab_longdocs():
    """The LSH-adversarial case that killed the 500k run: long random
    docs over a tiny vocabulary share most CHAR shingles (est_jaccard
    high, banding floods) but almost no WORD shingles — word mode must
    find planted near-dups and produce nothing for random pairs."""
    import numpy as np

    rng = np.random.RandomState(7)
    vocab = np.array("the spark table data row key hash block node edge".split())
    texts = [" ".join(vocab[rng.randint(0, len(vocab), 300)]) for _ in range(8)]
    near = texts[0].split()
    for e in rng.randint(0, len(near), 6):
        near[e] = vocab[rng.randint(0, len(vocab))]
    rows = [(i, t) for i, t in enumerate(texts)] + [(8, " ".join(near))]
    ds = _docs(rows)
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            ds, threshold=0.5, concurrency=1, shingle="word", shingle_k=5
        ).take_all()
    }
    assert (0, 8) in pairs and pairs[(0, 8)] >= 0.5  # planted near-dup
    assert all(p == (0, 8) for p in pairs)  # random pairs never collide


def test_minhash_char_mode_pair_explosion_guard():
    """Char mode on the same corpus floods the banding — the stepwise
    guard must raise a diagnostic instead of dying inside a shuffle."""
    import numpy as np

    rng = np.random.RandomState(7)
    vocab = np.array("the spark table data row key hash block node edge".split())
    rows = [
        (i, " ".join(vocab[rng.randint(0, len(vocab), 300)])) for i in range(40)
    ]
    with pytest.raises(RuntimeError, match="LSH-adversarial"):
        dedup.minhash_lsh_pairs(
            _docs(rows), threshold=0.5, concurrency=1, max_pair_ratio=1.0
        ).materialize()


def test_near_dup_losers_simhash_drops_identical():
    """method='simhash' collapses identical/near-identical docs to the
    min id through the same losers→components machinery."""
    base = "alpha beta gamma delta epsilon zeta " * 30
    ds = _docs([(1, base), (2, base), (3, "totally unrelated corpus words " * 30)])
    losers = sorted(
        r["node"] for r in dedup.near_dup_losers(ds, method="simhash").take_all()
    )
    assert losers == [2]


def test_drop_losers_auto_switch(monkeypatch):
    """via="auto" (the default) sizes the strategy: small loser sets
    broadcast (zero shuffle — no bloom/join machinery touched at all),
    sets past the broadcast limit go through Bloom, and a supplied
    corpus_count where losers rival the corpus flips to the plain
    left_anti join.  All three paths row-identical."""
    import ray.data as rd

    from knowledge_graph_creation_from_text_with_llms_ray.stages import relational

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(300)), pa.int64()),
                "text": pa.array([f"d{i}" for i in range(300)], pa.string()),
            }
        )
    ).repartition(5)
    losers = rd.from_arrow(
        pa.table({"node": pa.array([2, 17, 17, 250, 999], pa.int64())})
    )
    want = sorted(set(range(300)) - {2, 17, 250})

    calls = []
    real_bloom, real_join = relational.bloom_semi_join, relational.hash_join

    def spy_bloom(*a, **k):
        calls.append("bloom")
        return real_bloom(*a, **k)

    def spy_join(*a, **k):
        calls.append("join")
        return real_join(*a, **k)

    monkeypatch.setattr(relational, "bloom_semi_join", spy_bloom)
    monkeypatch.setattr(relational, "hash_join", spy_join)

    # default: 4 losers ≤ broadcast limit → pure map filter, no joins
    got = sorted(r["doc_id"] for r in dedup.drop_losers(docs, losers).take_all())
    assert got == want and calls == []

    # force past the broadcast limit: auto picks Bloom
    got = sorted(
        r["doc_id"]
        for r in dedup.drop_losers(docs, losers, broadcast_limit=2).take_all()
    )
    assert got == want and calls[0] == "bloom"

    # losers rival the corpus (4 unique of corpus_count=6): plain join
    calls.clear()
    got = sorted(
        r["doc_id"]
        for r in dedup.drop_losers(
            docs, losers, broadcast_limit=2, corpus_count=6
        ).take_all()
    )
    assert got == want and calls == ["join"]


def test_contamination_prefilter_modes_agree():
    """The eval-side gram prefilter is a pure exchange-volume cut:
    exact broadcast, Bloom, and off must produce identical containment
    results (only grams shared with the eval side can form a pair)."""
    train = _docs(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven"),
            (3, "unrelated words entirely different content here"),
        ]
    )
    ev = _docs(
        [
            (101, "alpha beta gamma delta"),
            (102, "six seven eight nine ten"),
            (103, "nothing shared with anything"),
        ]
    )

    def run(mode):
        return {
            (r["id_a"], r["id_b"]): round(r["containment"], 12)
            for r in dedup.cross_ngram_contamination(
                train, ev, threshold=0.2, df_cap=None, prefilter=mode
            ).take_all()
        }

    res_off = run("off")
    assert res_off  # the planted full-containment pair exists
    assert run("exact") == res_off
    assert run("bloom") == res_off
    assert run("auto") == res_off
    with pytest.raises(ValueError):
        dedup.cross_ngram_contamination(train, ev, prefilter="nope").take_all()


def test_contamination_empty_eval_side():
    """An eval side with no grams can never be contaminated — the
    prefilter short-circuits the corpus side to empty instead of
    crashing on an empty broadcast."""
    train = _docs([(1, "alpha beta gamma delta epsilon")])
    ev = _docs([(101, "")])
    assert dedup.cross_ngram_contamination(train, ev).take_all() == []
