"""Stage 1 — clean + chunk: documents → chunk rows.

One stateless ``map_batches`` (zero-copy Arrow in/out) fusing the
reference's clean (M1), paragraph projection (M2), chunk split (M3) and
per-document ordinal assignment (``Extractor.py:98-101`` — 1-based).
The explode preserves block locality: chunk rows stay co-partitioned
with their document, so no shuffle happens before extraction
(SURVEY.md §4.3.1).

``max_chunks`` is a *per-document* head limit (``TripleGenerator.py:
247-249``); because chunk ids are assigned within-document in order, it
reduces to a shuffle-free filter ``chunk_id <= max_chunks``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.chunking import chunk_text
from ..functions.textprep import content_to_text, module_name_from_path

CHUNK_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("lang", pa.string()),
        ("doc_sha256", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_text", pa.string()),
    ]
)


def _chunk_batch(batch: pa.Table, chunk_size: int) -> pa.Table:
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()
    shas = (
        batch["doc_sha256"].to_pylist()
        if "doc_sha256" in batch.column_names
        else [""] * len(repos)
    )

    o_repo, o_path, o_lang, o_sha, o_cid, o_text = [], [], [], [], [], []
    for repo, path, lang, content, sha in zip(repos, paths, langs, contents, shas):
        text = content_to_text(content or "", lang, module_name_from_path(path))
        for idx, chunk in enumerate(chunk_text(text, chunk_size)):
            o_repo.append(repo)
            o_path.append(path)
            o_lang.append(lang)
            o_sha.append(sha)
            o_cid.append(idx + 1)
            o_text.append(chunk)
    return pa.table(
        {
            "repo": pa.array(o_repo, pa.string()),
            "path": pa.array(o_path, pa.string()),
            "lang": pa.array(o_lang, pa.string()),
            "doc_sha256": pa.array(o_sha, pa.string()),
            "chunk_id": pa.array(o_cid, pa.int32()),
            "chunk_text": pa.array(o_text, pa.string()),
        },
        schema=CHUNK_SCHEMA,
    )


def chunk_documents(
    ds: ray.data.Dataset, chunk_size: int = 500, max_chunks: int | None = None
) -> ray.data.Dataset:
    out = ds.map_batches(
        _chunk_batch, batch_format="pyarrow", fn_kwargs={"chunk_size": chunk_size}
    )
    if max_chunks is not None:
        out = out.filter(
            expr=f"chunk_id <= {int(max_chunks)}"
        )
    return out
