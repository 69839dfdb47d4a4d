"""Deterministic documents-shaped corpus generator for curation
benchmarks (production-shard-size variant).

The round-3 scaling measurement ran 500k tiny (~370-char) docs in 128
sub-MB shards — per-shard orchestration dominated and 32 cores were
under-fed, so the measured 8→32 efficiency (0.31) said nothing about
the pipeline.  This writes the SAME doc count as big shards: ~8 kB
docs in N on-disk shards that each clear the curation runner's
``_SMALL_SHARD_BYTES`` (64 MiB) threshold, so the size-aware block cap
leaves Ray's internal splitting ON and one shard parallelizes across
cores — the geometry a production corpus has.

Deterministic: every doc's text is a pure function of (seed, doc_id).
~3% of docs are exact duplicates of a lower-id doc (text copied, id
distinct) so the global fingerprint dedup stage has real work.

Usage: python tools/gen_curation_corpus.py OUT_DIR [n_docs] [shards]
       [near_dup_rate] [vocab_variants] [dup_rate]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ~30k distinct words, like real prose — NOT a toy vocabulary.  A
# 48-word vocab makes every pair of random docs share nearly all their
# char-5-gram SETS (Jaccard ≈ 1), which is LSH-adversarial: every
# MinHash band bucket collides and the candidate-pair count explodes
# (measured: the 500k-doc near-dup run died in the signature-attach
# shuffle).  Real corpora have heavy-tailed vocabularies; model that.
_STEMS = (
    "the spark customer table data line batch stream window value key query "
    "row part column order hash vector agg big small fast slow alpha beta "
    "gamma delta shard block actor task node edge graph label token pack "
    "bucket probe merge scan"
).split()


def make_vocab(variants: int = 750) -> list[str]:
    """``variants=750`` (default) is the ~30k-word heavy-tail vocabulary
    — realistic for LSH/banding behaviour but COMPRESSION-ADVERSARIAL
    (snappy ~1.8x; real web text compresses 3-5x).  ``variants=0`` is
    the 48-stem vocabulary of the round-3/4 scaling corpora (snappy
    ~3.3x — the compression ratio real prose gets), used to reproduce
    the recorded 2M-doc/4.8GB geometry for I/O-sensitive scaling
    measurements.  Pick per benchmark: LSH realism vs I/O realism."""
    return _STEMS + [f"{s}{i}" for i in range(variants) for s in _STEMS]


VOCAB = make_vocab()

WORDS_PER_DOC = 1300  # ≈ 8 kB of text
DUP_RATE = 0.03


def _shard_table(
    shard: int,
    n_docs: int,
    shards: int,
    seed: int,
    near_dup_rate: float = 0.0,
    vocab_variants: int = 750,
    dup_rate: float = DUP_RATE,
) -> pa.Table:
    lo = shard * n_docs // shards
    hi = (shard + 1) * n_docs // shards
    rng = np.random.RandomState(seed + shard)
    vocab = np.array(make_vocab(vocab_variants))
    texts: list[str] = []
    ids = list(range(lo, hi))
    for doc_id in ids:
        words = vocab[rng.randint(0, len(vocab), WORDS_PER_DOC)]
        texts.append(" ".join(words.tolist()) + f" doc tail {doc_id % 97}")
    # exact duplicates WITHIN the shard (global dedup still crosses
    # shards via the fingerprint shuffle; in-shard dups exercise the
    # same path and keep generation single-pass)
    n_dup = int(len(ids) * dup_rate)
    dup_pos = rng.randint(1, len(ids), n_dup)
    for p in dup_pos:
        texts[p] = texts[p - 1]
    # NEAR duplicates (optional): copy a neighbour and perturb ~4% of
    # its words — word-3-gram Jaccard ≈ 0.8, MinHash-estimated Jaccard
    # well above the 0.5 default threshold, but NOT fingerprint-equal,
    # so only the near-dup stage can collapse them
    if near_dup_rate > 0:
        n_near = int(len(ids) * near_dup_rate)
        near_pos = rng.randint(1, len(ids), n_near)
        for p in near_pos:
            words = texts[p - 1].split()
            edit = rng.randint(0, len(words), max(1, len(words) // 25))
            for e in edit:
                words[e] = vocab[rng.randint(0, len(vocab))]
            texts[p] = " ".join(words)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def generate(
    out_dir: str,
    n_docs: int = 500_000,
    shards: int = 8,
    seed: int = 42,
    near_dup_rate: float = 0.0,
    vocab_variants: int = 750,
    dup_rate: float = DUP_RATE,
) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write(shard: int) -> str:
        path = os.path.join(out_dir, f"part-{shard:03d}.parquet")
        # many row groups per file (as real writers produce): Ray's
        # parquet read splits at row-group granularity, so a GB shard
        # written as ONE group would be unsplittable — one read task
        # per shard no matter the cluster size
        pq.write_table(
            _shard_table(
                shard, n_docs, shards, seed, near_dup_rate, vocab_variants, dup_rate
            ),
            path,
            row_group_size=4096,
        )
        return path

    for p in ray.get([_write.remote(s) for s in range(shards)]):
        print(p, os.path.getsize(p) >> 20, "MiB")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgray_curate_docs_big"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nd = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    vv = int(sys.argv[5]) if len(sys.argv) > 5 else 750
    dr = float(sys.argv[6]) if len(sys.argv) > 6 else DUP_RATE
    generate(out, n, s, near_dup_rate=nd, vocab_variants=vv, dup_rate=dr)
