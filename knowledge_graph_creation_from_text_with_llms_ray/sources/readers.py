"""Dataset sources: corpus reader, sha256 stamping, testdata adapter.

The read is the first place to prune: ``columns=`` is always threaded
through so a 2-column transform never ships 5 columns off storage.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from ..functions.hashing import sha256_hex_batch


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a ``(repo, path, commit, lang, content)`` corpus directory."""
    return ray.data.read_parquet(path, columns=columns)


def _stamp_batch(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "doc_sha256", pa.array(sha256_hex_batch(batch["content"].to_pylist()), pa.string())
    )


def stamp_sha256(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Add the per-row ``doc_sha256`` invariant column (BASELINE.json
    per-row invariant: content sha256 equality input → lineage)."""
    return ds.map_batches(_stamp_batch, batch_format="pyarrow")


def _adapt_documents_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    sources = batch["source"].to_pylist()
    paths = [f"doc_{d}.txt" for d in doc_ids]
    commits = [
        hashlib.sha1(f"{s}/{p}".encode("utf-8")).hexdigest()
        for s, p in zip(sources, paths)
    ]
    return pa.table(
        {
            "repo": batch["source"],
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def documents_as_corpus(sf_dir: str) -> ray.data.Dataset:
    """Adapt the driver testdata ``documents`` table (``doc_id, text,
    lang, source, n_chars``) to the canonical corpus shape (FIXTURES.md
    §1 note: adapter for smoke/correctness runs)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(_adapt_documents_batch, batch_format="pyarrow")


_DOC_FIELDS = {"doc_id": pa.int64(), "text": pa.string()}


def _normalize_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Coerce a raw documents read to the engine's canonical
    (doc_id: int64, text: string) core — extra columns pass through."""

    def _fix(batch: pa.Table) -> pa.Table:
        for name, typ in _DOC_FIELDS.items():
            if name not in batch.column_names:
                raise ValueError(f"documents source is missing column {name!r}")
            if name == "doc_id" and batch[name].null_count > 0:
                # a heterogeneous JSONL can infer the column with nulls;
                # null ids never match in hash joins, so they'd silently
                # survive every dedup drop — fail loudly instead
                raise ValueError("documents source has null doc_id values")
            if batch[name].type != typ:
                idx = batch.schema.get_field_index(name)
                batch = batch.set_column(idx, name, batch[name].cast(typ))
        return batch

    return ds.map_batches(_fix, batch_format="pyarrow")


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """Documents from JSON-lines files (the raw-crawl interchange
    format): one object per line with at least ``doc_id`` and ``text``.
    Reads stream per file — shard the input into many .jsonl files for
    parallelism, exactly like parquet shards."""
    return _normalize_documents(ray.data.read_json(path))


def read_documents_csv(path: str) -> ray.data.Dataset:
    """Documents from CSV files with a ``doc_id,text,…`` header."""
    return _normalize_documents(ray.data.read_csv(path))


def _corpus_docs_batch(batch: pa.Table) -> pa.Table:
    """(repo, path, content) → (doc_id, text): a stable 63-bit integer
    id from sha1 over the NUL-separated (repo, path) pair — NUL cannot
    appear in either name, so ("org", "repo/a.py") and ("org/repo",
    "a.py") hash differently (a "/" separator would alias them)."""
    import hashlib as _hl

    ids = [
        int.from_bytes(
            _hl.sha1(r.encode("utf-8") + b"\x00" + p.encode("utf-8")).digest()[:8],
            "little",
        )
        >> 1
        for r, p in zip(batch["repo"].to_pylist(), batch["path"].to_pylist())
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": batch["content"].cast(pa.string()),
        }
    )


def corpus_as_documents(path: str) -> ray.data.Dataset:
    """Adapt a code-corpus directory to the documents shape so the
    curation/text operators run over it."""
    return ray.data.read_parquet(path, columns=["repo", "path", "content"]).map_batches(
        _corpus_docs_batch, batch_format="pyarrow"
    )
