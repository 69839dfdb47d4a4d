import os

import pyarrow.parquet as pq
import yaml

from knowledge_graph_creation_from_text_with_llms_ray.config import MODE_ALIASES, load_config
from knowledge_graph_creation_from_text_with_llms_ray.run import graph_statistics, main
from knowledge_graph_creation_from_text_with_llms_ray.sources.corpus import write_corpus


def _write_cfg(tmp_path, corpus_dir, workdir, mode="full", **kw):
    cfg = {
        "mode": mode,
        "data_paths": {"input_path": corpus_dir, "output_path": workdir},
        "extractor": {"chunk_size": kw.get("chunk_size", 500)},
        "generator": {"max_chunks": kw.get("max_chunks")},
        "integrator": {
            "matching_config": {
                "property_query_method": kw.get("method", "api"),
                "use_aliases": True,
                "save_matches": kw.get("save_matches", False),
            }
        },
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_load_config_maps_reference_knobs(tmp_path):
    p = _write_cfg(tmp_path, "/in", "/out", mode="integrator", method="mixed", max_chunks=7)
    cfg = load_config(p)
    assert cfg.input_path == "/in" and cfg.workdir == "/out"
    assert cfg.mode == "integrate"  # reference's CLI spelling accepted
    assert cfg.kg.property_query_method == "mixed"
    assert cfg.kg.max_chunks == 7


def test_mode_aliases_cover_reference_mismatch():
    # the reference advertises extractor/generator/integrator but
    # dispatches on extract/generate/integrate (src/run.py:153 vs
    # :85-116); both spellings must work here
    for a, b in (("extractor", "extract"), ("generator", "generate"), ("integrator", "integrate")):
        assert MODE_ALIASES[a] == b and MODE_ALIASES[b] == b


def test_cli_full_run_and_phase_modes(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=60, shards=2)

    # full mode: checkpointed run + turtle + matches export
    wd_full = str(tmp_path / "wd_full")
    p = _write_cfg(tmp_path, corpus, wd_full, mode="full", save_matches=True)
    summary = main(["--config", p])
    assert os.path.isdir(summary["edges_dir"])
    assert os.path.exists(os.path.join(wd_full, "knowledge_graph.ttl"))
    assert os.path.exists(os.path.join(wd_full, "matched_triples.yaml"))
    edges_full = pq.read_table(summary["edges_dir"])
    stats = graph_statistics(edges_full)
    assert stats["total_triples"] == edges_full.num_rows > 0

    # phase modes chained: extract → generate → integrate reproduce the
    # same edge set
    wd = str(tmp_path / "wd_phases")
    p2 = _write_cfg(tmp_path, corpus, wd)
    main(["--config", p2, "--mode", "extractor"])
    assert os.path.isdir(os.path.join(wd, "chunks"))
    main(["--config", p2, "--mode", "generate"])
    assert os.path.isdir(os.path.join(wd, "triples"))
    main(["--config", p2, "--mode", "integrate"])
    edges_phased = pq.read_table(os.path.join(wd, "edges"))

    key = ["subject_id", "predicate_id", "object_id", "is_literal"]
    a = sorted(zip(*(edges_full[c].to_pylist() for c in key)))
    b = sorted(zip(*(edges_phased[c].to_pylist() for c in key)))
    assert a == b


def test_cli_curate_mode(tmp_path):
    """--mode curate runs the resumable curation pipeline end to end
    from the CLI (documents-table input)."""
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    corpus = tmp_path / "docs"
    corpus.mkdir()
    per = (docs.num_rows + 1) // 2
    for s in range(2):
        pq.write_table(docs.slice(s * per, per), str(corpus / f"part-{s}.parquet"))
    wd = str(tmp_path / "wd")
    cfg = _write_cfg(tmp_path, str(corpus), wd)
    summary = main(["--config", cfg, "--mode", "curate"])
    assert summary["shards_ran"] == [0, 1]
    out = pq.read_table(os.path.join(wd, "corpus"))
    assert summary["rows"] == out.num_rows > 0
    assert set(out.column_names) == {"doc_id", "text", "fingerprint", "split"}


def test_cli_curate_mode_near_dup_yaml(tmp_path):
    """curator: near_dup options in the YAML reach run_curation — the
    near-dup collapse and split weights run from the CLI."""
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    corpus = tmp_path / "docs"
    corpus.mkdir()
    pq.write_table(docs, str(corpus / "part-0.parquet"))
    wd = str(tmp_path / "wd")
    cfg_path = _write_cfg(tmp_path, str(corpus), wd, mode="curate")
    import yaml as _yaml

    raw = _yaml.safe_load(open(cfg_path))
    raw["curator"] = {
        "near_dup": True,
        "near_dup_method": "simhash",
        "split_weights": {"train": 9, "val": 1},
    }
    open(cfg_path, "w").write(_yaml.safe_dump(raw))
    summary = main(["--config", cfg_path, "--mode", "curate"])
    out = pq.read_table(os.path.join(wd, "corpus"))
    assert summary["rows"] == out.num_rows > 0
    assert set(out["split"].to_pylist()) <= {"train", "val"}
    from knowledge_graph_creation_from_text_with_llms_ray.state import lineage

    man = lineage.load_manifest(wd, "final", 0)
    assert man["near_dup"] is True and man["near_dup_method"] == "simhash"
