"""Property-based cross-engine parity: the DuckDB oracle SQL of
``pipelines/oracle_text.py`` must agree with the Python kernels on
ARBITRARY documents, not just the fixture corpus.

These tests need no Ray — hypothesis generates small document tables,
registered directly into DuckDB, and the oracle statements run against
the pure-Python kernel computations.

Scope note: the rolling fingerprint's byte==codepoint equivalence (and
therefore its oracle) is specified for ASCII corpora — the strategies
generate printable ASCII + whitespace accordingly, matching the
engine's documented input guarantee.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from knowledge_graph_creation_from_text_with_llms_ray.functions.embedding import (
    DIM,
    _bucket,
    _trigrams,
)
from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import (
    hash64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    ngram_set,
    rolling_fingerprint,
    simhash64,
)
from knowledge_graph_creation_from_text_with_llms_ray.functions.textstats import (
    detect_language,
)
from knowledge_graph_creation_from_text_with_llms_ray.pipelines import oracle_text

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=120,
)
# Texts for the byte-level oracles (rolling Karp–Rabin hashes UTF-8
# bytes while the SQL replica uses codepoints — documented ASCII scope).
_TEXTS = st.lists(
    st.one_of(_ASCII, st.sampled_from(["", "  ", "a b. C d!", "the of and to x"])),
    min_size=1,
    max_size=8,
)
# Texts for the TOKENIZED oracles: TOKENS now replicates Python
# str.split() exactly, including the non-ASCII whitespace Python splits
# on (\x1c-\x1f, U+0085, U+00A0, U+2000 block, U+3000) — exercise it.
_EXOTIC_WS = st.sampled_from(
    [
        "a\x85b",
        "x\xa0y z",
        "a\x1cb\x1dc",
        "p q r",
        "m　n o",
        " lead trail\x1f",
    ]
)
_WS_TEXTS = st.lists(
    st.one_of(_ASCII, _EXOTIC_WS, st.sampled_from(["", "  ", "a b. C d!"])),
    min_size=1,
    max_size=8,
)


def _con(texts: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(texts), pa.string()),
        }
    )
    con.register("documents", tbl)
    return con


@settings(max_examples=20, deadline=None)
@given(_TEXTS)
def test_fingerprints_oracle_parity(texts):
    con = _con(texts)
    df = con.execute(oracle_text.text_fingerprints_sql()).fetchdf().set_index("doc_id")
    for i, t in enumerate(texts):
        row = df.loc[i]
        assert row["simhash_hex"] == f"{simhash64(t):016x}", (t,)
        assert row["rolling_fp"] == f"{rolling_fingerprint(t):016x}", (t,)


@settings(max_examples=20, deadline=None)
@given(_WS_TEXTS)
def test_langid_oracle_parity(texts):
    con = _con(texts)
    df = con.execute(oracle_text.text_langid_sql()).fetchdf().set_index("doc_id")
    for i, t in enumerate(texts):
        lang, conf = detect_language(t)
        row = df.loc[i]
        assert (row["lang_pred"], row["lang_conf"]) == (lang, conf), (t,)


@settings(max_examples=20, deadline=None)
@given(_WS_TEXTS)
def test_trigram_histogram_oracle_parity(texts):
    con = _con(texts)
    df = con.execute(oracle_text.text_embed_sql()).fetchdf().set_index("doc_id")
    for i, t in enumerate(texts):
        counts = np.zeros(DIM, dtype=np.int64)
        for tri in _trigrams(t):
            counts[_bucket(tri) % DIM] += 1
        row = df.loc[i]
        assert row["nnz"] == int((counts > 0).sum()), (t,)
        assert row["argmax_bucket"] == int(np.argmax(counts)), (t,)


@settings(max_examples=15, deadline=None)
@given(_WS_TEXTS)
def test_ngram_jaccard_oracle_parity(texts):
    threshold = 0.3
    con = _con(texts)
    df = con.execute(oracle_text.dedup_ngram_sql(threshold=threshold)).fetchdf()
    got = {(r.id_a, r.id_b): r.jaccard for r in df.itertuples()}
    want = {}
    gsets = {i: {hash64(g) for g in ngram_set(t, 3)} for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(gsets[a] & gsets[b])
            if inter == 0:
                continue
            j = inter / (len(gsets[a]) + len(gsets[b]) - inter)
            if j >= threshold:
                want[(a, b)] = j
    assert got == want, texts


@settings(max_examples=10, deadline=None)
@given(_WS_TEXTS)
def test_simhash_pairs_oracle_parity(texts):
    con = _con(texts)
    df = con.execute(oracle_text.dedup_simhash_sql(max_hamming=8)).fetchdf()
    got = {(r.id_a, r.id_b): r.hamming for r in df.itertuples()}
    sims = {i: simhash64(t) for i, t in enumerate(texts)}
    buckets: dict = {}
    for i in sorted(sims):
        for b in range(4):
            buckets.setdefault((b, (sims[i] >> (b * 16)) & 0xFFFF, ), []).append(i)
    want = {}
    for mem in buckets.values():
        mem = sorted(mem)[:256]
        for xi, x in enumerate(mem):
            for y in mem[xi + 1 :]:
                d = bin(sims[x] ^ sims[y]).count("1")
                if d <= 8:
                    want[(x, y)] = d
    assert got == want, texts


@settings(max_examples=8, deadline=None)
@given(st.lists(_ASCII, min_size=1, max_size=5))
def test_minhash_oracle_parity(texts):
    threshold = 0.4
    con = _con(texts)
    df = con.execute(oracle_text.dedup_minhash_sql(threshold=threshold)).fetchdf()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in df.itertuples()}
    sigs = {i: minhash_signature(t) for i, t in enumerate(texts)}
    buckets: dict = {}
    for i in sorted(sigs):
        if not texts[i]:  # empty text → no shingles → no SQL rows
            continue
        for key in lsh_band_keys(sigs[i], 16):
            buckets.setdefault(key, []).append(i)
    want = {}
    for mem in buckets.values():
        mem = sorted(mem)[:256]
        for xi, x in enumerate(mem):
            for y in mem[xi + 1 :]:
                est = float(np.mean(sigs[x] == sigs[y]))
                if est >= threshold:
                    want[(x, y)] = est
    assert got == want, texts


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30, unique=True))
def test_sample_hash_oracle_parity(ids):
    from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import _mix32

    con = duckdb.connect()
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(["xx"] * len(ids), pa.string()),
        }
    )
    con.register("documents", tbl)
    got = set(
        con.execute(oracle_text.sample_hash_sql(denom=3)).fetchdf()["doc_id"]
    )
    x = np.asarray(ids, dtype=np.uint64)
    h = _mix32((x & np.uint64(0xFFFFFFFF)) ^ (x >> np.uint64(32)))
    want = set(np.asarray(ids)[h % np.uint64(3) == 0].tolist())
    assert got == want, ids


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=40, unique=True))
def test_hll_registers_oracle_parity(ids):
    import numpy as np

    from knowledge_graph_creation_from_text_with_llms_ray.functions.sketch import hll_partial

    con = duckdb.connect()
    con.register("orders", pa.table({"o_custkey": pa.array(ids, pa.int64())}))
    df = con.execute(oracle_text.hll_registers_sql()).fetchdf()
    got = sorted(zip(df["bucket"], df["register"]))
    b, r = hll_partial(np.asarray(ids, dtype=np.int64))
    want = sorted(zip(b.tolist(), r.tolist()))
    assert got == want, ids


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=1,
        max_size=200,
    )
)
def test_quantile_oracle_rule_parity(rows):
    """The window-SQL quantile oracle must implement exactly the
    'smallest value with cumulative count >= ceil(q*total)' rule of
    relational.grouped_quantiles, on arbitrary tables."""
    import math

    con = duckdb.connect()
    con.register(
        "lineitem",
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows]),
                # oracle applies the cents transform; feed v/100
                "l_quantity": pa.array([r[1] / 100 for r in rows], pa.float64()),
            }
        ),
    )
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.queries import oracle_sql

    df = con.execute(oracle_sql()["rel_quantiles"]).fetchdf()
    got = {(r.l_returnflag, r.q): r.value for r in df.itertuples()}
    by_key: dict = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    want = {}
    for k, vs in by_key.items():
        vs = sorted(vs)
        for q in (0.25, 0.5, 0.75, 0.95):
            rank = max(1, math.ceil(q * len(vs)))
            want[(k, q)] = vs[rank - 1]
    assert got == want, rows


@settings(max_examples=20, deadline=None)
@given(_WS_TEXTS)
def test_token_topk_oracle_parity(texts):
    from collections import Counter

    con = _con(texts)
    df = con.execute(oracle_text.token_topk_sql(k=5)).fetchdf()
    got = [(r.token, r.n) for r in df.itertuples()]
    c: Counter = Counter()
    for t in texts:
        c.update(t.split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want, texts


_NL_TEXTS = st.lists(
    st.one_of(
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=126, include_characters="\n"
            ),
            max_size=120,
        ),
        _EXOTIC_WS,
        st.sampled_from(["", "\n\n", "a b\na b\n", "x\nx\nx", "w w w w"]),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=20, deadline=None)
@given(_NL_TEXTS)
def test_repetition_oracle_parity(texts):
    from knowledge_graph_creation_from_text_with_llms_ray.stages.analysis import (
        repetition_profile,
    )

    con = _con(texts)
    df = con.execute(oracle_text.repetition_sql()).fetchdf().set_index("doc_id")
    for i, t in enumerate(texts):
        dup, tot, topg, nbg, nch = repetition_profile(t)
        row = df.loc[i]
        assert (
            row["dup_line_chars"],
            row["line_chars"],
            row["top_bigram_chars"],
            row["n_bigrams"],
            row["n_chars"],
        ) == (dup, tot, topg, nbg, nch), (t,)
        keep = dup * 10 <= tot * 3 and topg * 5 <= nch
        assert bool(row["keep"]) == keep, (t,)


@settings(max_examples=15, deadline=None)
@given(_WS_TEXTS)
def test_contamination_oracle_parity(texts):
    """contamination_sql must equal the Python containment computation
    (eval set = mix32 % 7 == 0 sample, identity pairs excluded) on
    arbitrary documents."""
    import numpy as np

    from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import _mix32

    threshold = 0.3
    con = _con(texts)
    df = con.execute(
        oracle_text.contamination_sql(n=3, threshold=threshold, denom=7)
    ).fetchdf()
    got = {(r.id_a, r.id_b): r.containment for r in df.itertuples()}
    ids = np.arange(len(texts), dtype=np.uint64)
    h = _mix32((ids & np.uint64(0xFFFFFFFF)) ^ (ids >> np.uint64(32)))
    eval_ids = set(np.flatnonzero(h % np.uint64(7) == 0).tolist())
    gsets = {i: {hash64(g) for g in ngram_set(t, 3)} for i, t in enumerate(texts)}
    want = {}
    for a in range(len(texts)):
        for b in eval_ids:
            if a == b or not gsets[b]:
                continue
            inter = len(gsets[a] & gsets[b])
            if inter == 0:
                continue
            c = inter / len(gsets[b])
            if c >= threshold:
                want[(a, b)] = c
    assert got == want, texts


@settings(max_examples=15, deadline=None)
@given(_WS_TEXTS)
def test_token_windows_oracle_parity(texts):
    from knowledge_graph_creation_from_text_with_llms_ray.stages.analysis import (
        token_window_spans,
    )

    size, stride = 5, 3
    con = _con(texts)
    df = con.execute(oracle_text.token_windows_sql(size=size, stride=stride)).fetchdf()
    got = {
        (r.doc_id, r.win_id): (r.start, r.n_tokens, r.window_text)
        for r in df.itertuples()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = t.split()
        for w, s in enumerate(token_window_spans(len(toks), size, stride)):
            win = toks[s : s + size]
            want[(i, w)] = (s, len(win), " ".join(win))
    assert got == want, texts


@settings(max_examples=8, deadline=None)
@given(_WS_TEXTS)
def test_minhash_word_oracle_parity(texts):
    """Word-shingle mode: the SQL word-gram CTE (TOKENS tokenizer +
    md5-le-4 gram hash) must agree with hashing.word_shingles through
    the full banding on arbitrary docs, including the exotic
    whitespace Python str.split() folds."""
    threshold = 0.4
    con = _con(texts)
    df = con.execute(
        oracle_text.dedup_minhash_sql(threshold=threshold, shingle="word", shingle_k=3)
    ).fetchdf()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in df.itertuples()}
    sigs = {
        i: minhash_signature(t, k=3, shingle="word") for i, t in enumerate(texts)
    }
    buckets: dict = {}
    for i in sorted(sigs):
        if not texts[i].split():  # no words → no shingles → no SQL rows
            continue
        for key in lsh_band_keys(sigs[i], 16):
            buckets.setdefault(key, []).append(i)
    want = {}
    for mem in buckets.values():
        mem = sorted(mem)[:256]
        for xi, x in enumerate(mem):
            for y in mem[xi + 1 :]:
                est = float(np.mean(sigs[x] == sigs[y]))
                if est >= threshold:
                    want[(x, y)] = est
    assert got == want, texts
