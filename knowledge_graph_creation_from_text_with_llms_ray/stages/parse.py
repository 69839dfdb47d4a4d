"""Stage 3 — response parsing: responses → triple rows.

Stateless ``map_batches`` explode applying the full write→read grammar
round-trip (``functions/grammar.py``; reference write side
``TripleGenerator.py:148-164``, read side ``Integrator.py:156-218``) —
0..N triple rows per response, provenance columns carried through.
Malformed lines are dropped exactly as the reference drops them
(len != 3 → skip, M10).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.grammar import extract_triples_from_response

TRIPLE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("lang", pa.string()),
        ("doc_sha256", pa.string()),
        ("chunk_id", pa.int32()),
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
    ]
)


def _parse_batch(batch: pa.Table) -> pa.Table:
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    shas = batch["doc_sha256"].to_pylist()
    cids = batch["chunk_id"].to_pylist()
    responses = batch["response"].to_pylist()

    o = {k: [] for k in ("repo", "path", "lang", "doc_sha256", "chunk_id", "s", "p", "ob")}
    for repo, path, lang, sha, cid, resp in zip(repos, paths, langs, shas, cids, responses):
        for s, p, ob in extract_triples_from_response(resp or ""):
            o["repo"].append(repo)
            o["path"].append(path)
            o["lang"].append(lang)
            o["doc_sha256"].append(sha)
            o["chunk_id"].append(cid)
            o["s"].append(s)
            o["p"].append(p)
            o["ob"].append(ob)
    return pa.table(
        {
            "repo": pa.array(o["repo"], pa.string()),
            "path": pa.array(o["path"], pa.string()),
            "lang": pa.array(o["lang"], pa.string()),
            "doc_sha256": pa.array(o["doc_sha256"], pa.string()),
            "chunk_id": pa.array(o["chunk_id"], pa.int32()),
            "subject": pa.array(o["s"], pa.string()),
            "predicate": pa.array(o["p"], pa.string()),
            "object": pa.array(o["ob"], pa.string()),
        },
        schema=TRIPLE_SCHEMA,
    )


def parse_responses(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(_parse_batch, batch_format="pyarrow")
