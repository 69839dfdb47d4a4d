"""Corpus-scale decontamination sweep benchmark (BASELINE.md).

Builds a deterministic synthetic eval benchmark from a generated
corpus (``tools/gen_curation_corpus.py``): half the eval docs are
VERBATIM copies of corpus docs (planted leaks — recall on these must
be 1.0), half have 25% of their words replaced (near-miss
distractors).  Eval ids live in a distinct namespace (+10M).  Then
sweeps the full corpus with the exact word-3-gram containment op and
reports pair count, verbatim recall and wall time.

Usage:
  python tools/decontam_sweep.py CORPUS_DIR [n_eval] [--prefilter MODE]

MODE ∈ auto|exact|bloom|off (default auto).  Round-4 ran the
equivalent of --prefilter off: the corpus side exploded to ~650 M gram
rows and the bucket sort walled at ~39 min for 500 k docs; the
eval-side prefilter cuts the exchanged corpus grams to just the ones
that can ever match.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EVAL_ID_BASE = 10_000_000
PERTURB_FRACTION = 0.25
SEED = 7


def build_eval(corpus_dir: str, n_eval: int) -> tuple[pa.Table, dict]:
    """Deterministic eval set: ids EVAL_ID_BASE+i; even i = verbatim
    copy of corpus doc i, odd i = 25%-word-perturbed copy."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    first = pq.read_table(files[0], columns=["doc_id", "text"])
    assert first.num_rows >= n_eval, "eval source must fit in shard 0"
    texts = first["text"].to_pylist()[:n_eval]
    rng = np.random.RandomState(SEED)
    out_ids, out_texts, verbatim_src = [], [], []
    for i, t in enumerate(texts):
        out_ids.append(EVAL_ID_BASE + i)
        if i % 2 == 0:
            out_texts.append(t)
            verbatim_src.append(first["doc_id"][i].as_py())
        else:
            words = t.split()
            k = max(1, int(len(words) * PERTURB_FRACTION))
            pos = rng.choice(len(words), size=k, replace=False)
            for p in pos:
                words[p] = f"perturb{i}x{p}"
            out_texts.append(" ".join(words))
    return (
        pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_texts, pa.string()),
            }
        ),
        {EVAL_ID_BASE + i: s for i, s in zip(range(0, n_eval, 2), verbatim_src)},
    )


def main() -> None:
    import os

    import ray
    import ray.data

    corpus_dir = sys.argv[1]
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 2000
    prefilter = "auto"
    if "--prefilter" in sys.argv:
        prefilter = sys.argv[sys.argv.index("--prefilter") + 1]

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)

    from knowledge_graph_creation_from_text_with_llms_ray.stages import dedup

    eval_tbl, verbatim = build_eval(corpus_dir, n_eval)
    eval_ds = ray.data.from_arrow(eval_tbl)
    corpus = ray.data.read_parquet(corpus_dir, columns=["doc_id", "text"])

    t0 = time.time()
    pairs = dedup.cross_ngram_contamination(
        corpus, eval_ds, threshold=0.4, df_cap=512, prefilter=prefilter
    ).take_all()
    wall = time.time() - t0

    flagged_by_eval: dict[int, set] = {}
    for r in pairs:
        flagged_by_eval.setdefault(r["id_b"], set()).add(r["id_a"])
    hit = sum(1 for e, src in verbatim.items() if src in flagged_by_eval.get(e, ()))
    print(
        json.dumps(
            {
                "prefilter": prefilter,
                "pairs": len(pairs),
                "verbatim_planted": len(verbatim),
                "verbatim_recall": hit / max(1, len(verbatim)),
                "wall_s": round(wall, 1),
                "num_cpus": cpus,
                "n_eval": n_eval,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
