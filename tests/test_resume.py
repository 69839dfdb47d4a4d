"""Resume semantics (SURVEY.md §5.2.5): a rerun after partial completion
skips finished shards (manifest hits) and produces identical final
edges; shard manifests carry the content-sha256 rollup of their input."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from knowledge_graph_creation_from_text_with_llms_ray.functions.hashing import (
    sha256_hex,
    sha256_rollup,
)
from knowledge_graph_creation_from_text_with_llms_ray.pipelines.kg import (
    KGConfig,
    run_checkpointed,
)
from knowledge_graph_creation_from_text_with_llms_ray.sources.corpus import write_corpus
from knowledge_graph_creation_from_text_with_llms_ray.state import lineage


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_docs=120, shards=4)
    return str(d)


def _read_edges(workdir):
    t = pq.read_table(os.path.join(workdir, "edges"))
    return sorted(
        zip(*(t[c].to_pylist() for c in ("subject_id", "predicate_id", "object_id", "is_literal")))
    )


def test_checkpointed_run_and_resume(corpus_dir, tmp_path):
    wd = str(tmp_path / "wd")
    cfg = KGConfig(extract_concurrency=2, link_concurrency=2)

    summary1 = run_checkpointed(corpus_dir, wd, cfg)
    assert summary1["shards_ran"] == [0, 1, 2, 3]
    edges1 = _read_edges(wd)
    assert edges1

    # simulate a crash that lost shard 2's checkpoint + the final stage
    shutil.rmtree(lineage.shard_dir(wd, "linked", 2))
    os.remove(lineage.manifest_path(wd, "linked", 2))
    shutil.rmtree(os.path.join(wd, "edges"))
    shutil.rmtree(os.path.join(wd, "nodes"))

    summary2 = run_checkpointed(corpus_dir, wd, cfg)
    assert summary2["shards_ran"] == [2]
    assert summary2["shards_skipped"] == [0, 1, 3]
    assert _read_edges(wd) == edges1  # byte-stable final output


def test_manifest_sha_rollup_matches_input(corpus_dir, tmp_path):
    wd = str(tmp_path / "wd2")
    run_checkpointed(corpus_dir, wd, KGConfig(extract_concurrency=2, link_concurrency=2))
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    for i, f in enumerate(files):
        man = lineage.load_manifest(wd, "linked", i)
        assert man is not None
        contents = pq.read_table(f, columns=["content"])["content"].to_pylist()
        expected = sha256_rollup(sha256_hex(c) for c in contents)
        assert man["content_sha256_rollup"] == expected
        assert man["docs"] == len(contents)


def _read_corpus_rows(workdir):
    t = pq.read_table(os.path.join(workdir, "corpus"))
    return sorted(
        zip(*(t[c].to_pylist() for c in ("doc_id", "fingerprint", "split")))
    )


@pytest.fixture(scope="module")
def docs_shards(tmp_path_factory):
    """The documents table resharded into 4 files (the curation
    pipeline's resume unit)."""
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    d = tmp_path_factory.mktemp("docshards")
    per = (t.num_rows + 3) // 4
    for s in range(4):
        pq.write_table(t.slice(s * per, per), os.path.join(str(d), f"part-{s}.parquet"))
    return str(d)


def test_curation_run_and_resume(docs_shards, tmp_path):
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd")
    s1 = run_curation(docs_shards, wd)
    assert s1["shards_ran"] == [0, 1, 2, 3] and s1["shards_skipped"] == []
    rows1 = _read_corpus_rows(wd)
    assert 0 < len(rows1) == s1["rows"]
    # global dedup really deduped: fingerprints unique in the output
    fps = [r[1] for r in rows1]
    assert len(fps) == len(set(fps))
    # every row carries a split label
    assert {r[2] for r in rows1} <= {"train", "val", "test"}

    # pure resume: nothing reruns, final skipped, output unchanged
    s2 = run_curation(docs_shards, wd)
    assert s2["shards_ran"] == [] and s2["final_skipped"] is True
    assert _read_corpus_rows(wd) == rows1

    # drop one shard's manifest: exactly that shard reruns, final
    # re-executes, output identical
    os.remove(lineage.manifest_path(wd, "curated", 2))
    s3 = run_curation(docs_shards, wd)
    assert s3["shards_ran"] == [2] and s3["shards_skipped"] == [0, 1, 3]
    assert _read_corpus_rows(wd) == rows1


def test_curation_rerun_on_input_set_change(docs_shards, tmp_path):
    """Positional shard ids: if the input file SET changes, stale
    manifests must NOT silently skip the wrong file."""
    import shutil as _sh

    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    src = tmp_path / "docs2"
    _sh.copytree(docs_shards, src)
    wd = str(tmp_path / "cwd2")
    run_curation(str(src), wd)
    n0 = len(_read_corpus_rows(wd))
    # a new file that sorts FIRST shifts every positional index; its
    # docs carry fresh ids but duplicate TEXTS of an existing shard
    import pyarrow.compute as pc

    first = sorted(os.listdir(src))[0]
    t = pq.read_table(os.path.join(str(src), first))
    dup = t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(t["doc_id"], 100_000),
    )
    pq.write_table(dup, os.path.join(str(src), "aaa-new.parquet"))
    s = run_curation(str(src), wd)
    # every shard's manifest input_file mismatches -> all rerun
    assert s["shards_ran"] == [0, 1, 2, 3, 4]
    # content still correct: the new docs are text-duplicates with
    # LARGER ids, so global dedup keeps exactly the original winners
    assert len(_read_corpus_rows(wd)) == n0


def test_curation_output_is_split_partitioned(docs_shards, tmp_path):
    """The curated corpus is hive-partitioned by split so a trainer
    reads corpus/split=train/ with partition pruning."""
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd3")
    run_curation(docs_shards, wd)
    subdirs = sorted(os.listdir(os.path.join(wd, "corpus")))
    assert all(d.startswith("split=") for d in subdirs)
    assert "split=train" in subdirs
    train = pq.read_table(os.path.join(wd, "corpus", "split=train"))
    assert train.num_rows > 0 and "doc_id" in train.column_names


def test_curation_refinalizes_when_trailing_shard_removed(docs_shards, tmp_path):
    """Removing the lexicographically-LAST input shard keeps every
    positional manifest valid — the final manifest's recorded input
    set must force a re-finalize so the corpus drops that shard."""
    import shutil as _sh

    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    src = tmp_path / "docs3"
    _sh.copytree(docs_shards, src)
    wd = str(tmp_path / "cwd4")
    run_curation(str(src), wd)
    n_full = len(_read_corpus_rows(wd))
    last = sorted(os.listdir(src))[-1]
    removed = pq.read_table(os.path.join(str(src), last)).num_rows
    os.remove(os.path.join(str(src), last))
    s = run_curation(str(src), wd)
    assert "final_skipped" not in s  # finalize MUST rerun
    n_after = len(_read_corpus_rows(wd))
    # the removed shard's (unique) docs are gone from the corpus
    assert n_after < n_full and n_full - n_after <= removed


def test_curation_near_dup_stage(docs_shards, tmp_path):
    """near_dup=True additionally collapses near-duplicate clusters
    (keep-min-id) after the exact dedup; toggling the flag re-finalizes
    rather than serving the other variant's output."""
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd5")
    s_exact = run_curation(docs_shards, wd)
    s_near = run_curation(docs_shards, wd, near_dup=True)
    assert "final_skipped" not in s_near  # flag change must re-finalize
    assert s_near["shards_ran"] == []     # per-shard work reused
    assert 0 < s_near["rows"] <= s_exact["rows"]
    fps = [r[1] for r in _read_corpus_rows(wd)]
    assert len(fps) == len(set(fps))
    # rerun with the same flag: pure skip
    s_again = run_curation(docs_shards, wd, near_dup=True)
    assert s_again.get("final_skipped") is True and s_again["rows"] == s_near["rows"]


def test_curation_near_dup_minhash_method(docs_shards, tmp_path):
    """The minhash candidate generator also collapses clusters and a
    method switch re-finalizes."""
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd6")
    s_ng = run_curation(docs_shards, wd, near_dup=True)
    s_mh = run_curation(docs_shards, wd, near_dup=True, near_dup_method="minhash")
    assert "final_skipped" not in s_mh and s_mh["shards_ran"] == []
    assert 0 < s_mh["rows"]
    # same flag+method again: pure skip
    s2 = run_curation(docs_shards, wd, near_dup=True, near_dup_method="minhash")
    assert s2.get("final_skipped") is True and s2["rows"] == s_mh["rows"]


def test_curation_near_dup_simhash_method(docs_shards, tmp_path):
    """The simhash candidate generator (cheapest 100-TB form: one
    64-bit hash per doc, no signature joins) also drives the near-dup
    collapse, and a method switch re-finalizes."""
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd7")
    s_ng = run_curation(docs_shards, wd, near_dup=True)
    s_sh = run_curation(docs_shards, wd, near_dup=True, near_dup_method="simhash")
    assert "final_skipped" not in s_sh and s_sh["shards_ran"] == []
    assert 0 < s_sh["rows"]
    s2 = run_curation(docs_shards, wd, near_dup=True, near_dup_method="simhash")
    assert s2.get("final_skipped") is True and s2["rows"] == s_sh["rows"]


def test_curation_finalize_links_clean_files(docs_shards, tmp_path):
    """The delete-only finalize hard-links loser-free curated files
    into the corpus instead of rewriting them: most corpus files must
    share an inode with their checkpoint twin (st_nlink ≥ 2), and the
    per-file layout must match the checkpoints (shard-prefixed names
    under hive split dirs)."""
    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd_link")
    run_curation(docs_shards, wd)
    corpus_files = glob.glob(
        os.path.join(wd, "corpus", "split=*", "*.parquet")
    )
    assert corpus_files
    linked = [p for p in corpus_files if os.stat(p).st_nlink >= 2]
    # sf0.001 has only a handful of duplicate texts: the vast majority
    # of files must be links, and every file name carries its shard
    assert len(linked) >= len(corpus_files) // 2
    assert all(
        os.path.basename(p).startswith("shard-") for p in corpus_files
    )
    # rewritten (loser-containing) files are NOT links and hold fewer
    # rows than their checkpoint twin — verified implicitly by the
    # run_and_resume test's row-count + fingerprint-uniqueness checks


def test_curation_shard_reruns_on_layout_change(docs_shards, tmp_path):
    """A workdir checkpointed under a different curated-file layout
    (e.g. pre-hive flat files) must rerun its shards, not feed
    unreadable geometry to the finalize."""
    import json

    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd_layout")
    run_curation(docs_shards, wd)
    mp = lineage.manifest_path(wd, "curated", 1)
    with open(mp) as f:
        man = json.load(f)
    man.pop("layout")  # simulate a pre-round-5 checkpoint
    with open(mp, "w") as f:
        json.dump(man, f)
    s = run_curation(docs_shards, wd)
    assert s["shards_ran"] == [1]


def test_curation_codec_knob(docs_shards, tmp_path):
    """codec= lands on both checkpoint files (which link into the
    corpus) and loser rewrites — parquet metadata says ZSTD."""
    import pyarrow.parquet as pq

    from knowledge_graph_creation_from_text_with_llms_ray.pipelines.curate import run_curation

    wd = str(tmp_path / "cwd_codec")
    s = run_curation(docs_shards, wd, codec="zstd")
    assert s["rows"] > 0
    files = glob.glob(os.path.join(wd, "corpus", "split=*", "*.parquet"))
    codecs = {
        pq.ParquetFile(p).metadata.row_group(0).column(0).compression
        for p in files
    }
    assert codecs == {"ZSTD"}
