"""End-to-end gate (SURVEY.md §5.2.4): the distributed pipeline's
triples/edges agree with a sequential reference-semantics oracle built
from the same pinned kernels (strict-match P/R ≥ 0.95 — in fact exact),
and the per-row content sha256 invariant survives into lineage."""

import hashlib

import pyarrow as pa
import pytest
import ray
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.eval import strict_match
from knowledge_graph_creation_from_text_with_llms_ray.functions.chunking import chunk_text
from knowledge_graph_creation_from_text_with_llms_ray.functions.extract_rules import (
    extract_triples,
    render_response,
)
from knowledge_graph_creation_from_text_with_llms_ray.functions.grammar import (
    extract_triples_from_response,
)
from knowledge_graph_creation_from_text_with_llms_ray.functions.minting import mint_edge
from knowledge_graph_creation_from_text_with_llms_ray.functions.textprep import (
    content_to_text,
    module_name_from_path,
)
from knowledge_graph_creation_from_text_with_llms_ray.pipelines.kg import (
    KGConfig,
    run_streaming,
)
from knowledge_graph_creation_from_text_with_llms_ray.sources.alias_dict import (
    ResolvedDict,
    build_fixture_dict,
)
from knowledge_graph_creation_from_text_with_llms_ray.sources.corpus import synthesize_corpus

N_DOCS = 300
CHUNK_SIZE = 500


def oracle_edges(table: pa.Table, method: str = "api") -> set:
    """Sequential reference-semantics oracle: same kernels, plain
    for-loops (the reference's own execution shape, SURVEY.md §3.1)."""
    rd = ResolvedDict(build_fixture_dict())
    edges = set()
    for repo, path, lang, content in zip(
        table["repo"].to_pylist(),
        table["path"].to_pylist(),
        table["lang"].to_pylist(),
        table["content"].to_pylist(),
    ):
        text = content_to_text(content or "", lang, module_name_from_path(path))
        for chunk in chunk_text(text, CHUNK_SIZE):
            response = render_response(extract_triples(chunk or "", lang))
            for s, p, o in extract_triples_from_response(response):
                sid = rd.resolve("entity", s)
                oid = rd.resolve("entity", o)
                pid = rd.resolve("property", p)
                edges.add(mint_edge(s, p, o, sid, pid, oid))
    return edges


@pytest.fixture(scope="module")
def corpus():
    return synthesize_corpus(N_DOCS)


def test_end_to_end_strict_match(corpus):
    docs = ray.data.from_arrow(corpus)
    edges_ds, nodes_ds = run_streaming(
        docs, KGConfig(chunk_size=CHUNK_SIZE, extract_concurrency=2, link_concurrency=2)
    )
    got = {
        (r["subject_id"], r["predicate_id"], r["object_id"], r["is_literal"])
        for r in edges_ds.take_all()
    }
    expected = oracle_edges(corpus)
    m = strict_match(list(got), list(expected))
    assert m["Precision"] >= 0.95 and m["Recall"] >= 0.95, m
    # deterministic kernels → the agreement is actually exact
    assert got == expected

    # nodes are consistent with edges
    node_ids = {r["node_id"] for r in nodes_ds.take_all()}
    for s, p, o, lit in expected:
        assert s in node_ids
        if not lit:
            assert o in node_ids


def test_edges_are_deduped_and_sorted(corpus):
    docs = ray.data.from_arrow(corpus)
    edges_ds, _ = run_streaming(docs, KGConfig(chunk_size=CHUNK_SIZE))
    rows = edges_ds.take_all()
    keys = [
        (r["subject_id"], r["predicate_id"], r["object_id"], r["is_literal"])
        for r in rows
    ]
    assert len(keys) == len(set(keys))
    assert keys == sorted(keys)
    assert all(r["provenance_count"] >= 1 for r in rows)


def test_sha256_stamp_matches_input(corpus):
    from knowledge_graph_creation_from_text_with_llms_ray.sources.readers import (
        stamp_sha256,
    )

    docs = ray.data.from_arrow(corpus.slice(0, 50))
    stamped = stamp_sha256(docs).take_all()
    for row in stamped:
        assert (
            row["doc_sha256"]
            == hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        )


def test_max_chunks_is_per_document_limit():
    from knowledge_graph_creation_from_text_with_llms_ray.stages.chunk import (
        chunk_documents,
    )

    # one doc with many sentences → many chunks; limit must apply per doc
    text = " ".join(f"Sentence number {i} is here." for i in range(40))
    table = pa.table(
        {
            "repo": ["r", "r2"],
            "path": ["a.txt", "b.txt"],
            "commit": ["c", "c"],
            "lang": ["text", "text"],
            "content": [text, text],
        }
    )
    ds = ray.data.from_arrow(table)
    rows = chunk_documents(ds, chunk_size=60, max_chunks=3).take_all()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["path"], []).append(r["chunk_id"])
    assert set(per_doc) == {"a.txt", "b.txt"}
    for cids in per_doc.values():
        assert sorted(cids) == [1, 2, 3]


def test_jsonl_and_csv_document_sources(tmp_path):
    """The JSONL / CSV sources yield the same canonical documents as
    parquet and feed the text operators unchanged."""
    import csv
    import json

    import pyarrow as pa

    from knowledge_graph_creation_from_text_with_llms_ray.sources.readers import (
        read_documents_csv,
        read_documents_jsonl,
    )
    from knowledge_graph_creation_from_text_with_llms_ray.stages import analysis

    rows = [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en"},
        {"doc_id": 2, "text": "delta epsilon zeta", "lang": "en"},
        {"doc_id": 3, "text": "", "lang": "xx"},
    ]
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    cv = tmp_path / "docs.csv"
    with open(cv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "lang"])
        w.writeheader()
        w.writerows(rows)

    for reader, src in ((read_documents_jsonl, jl), (read_documents_csv, cv)):
        ds = reader(str(src))
        schema = ds.schema()
        types = dict(zip(schema.names, schema.types))
        assert types["doc_id"] == pa.int64() and types["text"] == pa.string()
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in analysis.text_stats(ds).take_all()
        }
        assert got == {1: 3, 2: 3, 3: 0}, reader.__name__
    # missing column fails loudly
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"doc_id": 1}) + "\n")
    import pytest
    import ray.exceptions

    with pytest.raises(Exception, match="missing column"):
        read_documents_jsonl(str(bad)).take_all()


def test_corpus_as_documents_adapter(tmp_path):
    """The corpus→documents adapter (used to run curation over the
    synthetic code corpus) yields unique, separator-unambiguous ids."""
    from knowledge_graph_creation_from_text_with_llms_ray.sources.corpus import write_corpus
    from knowledge_graph_creation_from_text_with_llms_ray.sources.readers import (
        _corpus_docs_batch,
        corpus_as_documents,
    )

    d = tmp_path / "corpus"
    write_corpus(str(d), n_docs=60, shards=2)
    rows = corpus_as_documents(str(d)).take_all()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 60 and len(set(ids)) == 60
    assert all(isinstance(r["text"], str) and r["text"] for r in rows)
    # ("org", "repo/a.py") must NOT alias ("org/repo", "a.py")
    import pyarrow as pa

    t = pa.table(
        {
            "repo": ["org", "org/repo"],
            "path": ["repo/a.py", "a.py"],
            "content": ["x", "y"],
        }
    )
    out = _corpus_docs_batch(t)
    assert out["doc_id"][0].as_py() != out["doc_id"][1].as_py()


def test_jsonl_null_doc_id_fails_loudly(tmp_path):
    import json

    import pytest

    from knowledge_graph_creation_from_text_with_llms_ray.sources.readers import (
        read_documents_jsonl,
    )

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "a"})
        + "\n"
        + json.dumps({"text": "missing id"})
        + "\n"
    )
    with pytest.raises(Exception, match="null doc_id"):
        read_documents_jsonl(str(p)).take_all()
