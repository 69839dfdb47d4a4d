"""CLI entry point — the reference's ``python run.py --config …
--mode …`` (``src/run.py:140-160``) re-expressed.

Modes gate phases exactly as the reference intended (with its
CLI/dispatch spelling mismatch fixed — both ``extractor`` and
``extract`` are accepted):

* ``extract``   — documents → chunks checkpoint
* ``generate``  — chunks checkpoint → responses + triples checkpoint
* ``integrate`` — triples checkpoint → linked + edges/nodes
* ``full``      — the whole sharded, resumable pipeline
  (``run_checkpointed``) + compatibility exports

Owns its Ray session (guarded init) — the only module besides bench.py
and tests allowed to.
"""

from __future__ import annotations

import argparse
import os

import pyarrow.parquet as pq
import ray
import ray.data

from .config import MODE_ALIASES, load_config
from .exporters import write_matches_yaml, write_turtle
from .pipelines.kg import run_checkpointed
from .sources.alias_dict import build_fixture_dict
from .sources.readers import read_corpus, stamp_sha256
from .stages.canonicalize import materialize_edges, materialize_nodes
from .stages.chunk import chunk_documents
from .stages.extract import generate_responses
from .stages.link import link_triples
from .stages.parse import parse_responses


def graph_statistics(edges_table) -> dict:
    """A1 re-expressed (``GraphManager.py:57-69``) over the edges
    table."""
    subs = set(edges_table["subject_id"].to_pylist())
    preds = set(edges_table["predicate_id"].to_pylist())
    objs = set(edges_table["object_id"].to_pylist())
    return {
        "total_triples": edges_table.num_rows,
        "unique_subjects": len(subs),
        "unique_predicates": len(preds),
        "unique_objects": len(objs),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="kgray KG construction")
    ap.add_argument("--config", required=True)
    ap.add_argument(
        "--mode",
        default=None,
        choices=sorted(MODE_ALIASES),
        help="overrides the config's mode",
    )
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    mode = MODE_ALIASES[args.mode] if args.mode else cfg.mode

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    os.makedirs(cfg.workdir, exist_ok=True)
    if mode == "full":
        summary = run_checkpointed(cfg.input_path, cfg.workdir, cfg.kg)
        edges = pq.read_table(summary["edges_dir"])
        stats = graph_statistics(edges)
        print("Final Knowledge Graph Statistics:", stats)
        write_turtle(edges, os.path.join(cfg.workdir, "knowledge_graph.ttl"))
        if cfg.kg.extra.get("save_matches"):
            import glob

            linked = pq.read_table(
                sorted(glob.glob(os.path.join(cfg.workdir, "linked", "**", "*.parquet"), recursive=True))
            )
            write_matches_yaml(
                linked,
                os.path.join(
                    cfg.workdir, cfg.kg.extra.get("matches_output_file", "matched_triples.yaml")
                ),
            )
        print("done:", summary)
        return summary

    if mode == "extract":
        docs = stamp_sha256(read_corpus(cfg.input_path))
        out = os.path.join(cfg.workdir, "chunks")
        chunk_documents(docs, cfg.kg.chunk_size, cfg.kg.max_chunks).write_parquet(out)
        print("chunks written:", out)
        return out

    if mode == "generate":
        chunks = ray.data.read_parquet(os.path.join(cfg.workdir, "chunks"))
        responses = generate_responses(
            chunks, extractor=cfg.kg.extractor, model_name=cfg.kg.model_name
        )
        out = os.path.join(cfg.workdir, "triples")
        parse_responses(responses).write_parquet(out)
        print("triples written:", out)
        return out

    if mode == "integrate":
        triples = ray.data.read_parquet(os.path.join(cfg.workdir, "triples"))
        dict_ref = ray.put(build_fixture_dict())
        linked = link_triples(
            triples,
            dict_ref,
            method=cfg.kg.property_query_method,
            use_aliases=cfg.kg.use_aliases,
        )
        edges = materialize_edges(linked, num_partitions=cfg.kg.edge_partitions)
        edges_dir = os.path.join(cfg.workdir, "edges")
        edges.write_parquet(edges_dir)
        nodes_dir = os.path.join(cfg.workdir, "nodes")
        materialize_nodes(ray.data.read_parquet(edges_dir)).write_parquet(nodes_dir)
        et = pq.read_table(edges_dir)
        print("Final Knowledge Graph Statistics:", graph_statistics(et))
        write_turtle(et, os.path.join(cfg.workdir, "knowledge_graph.ttl"))
        return edges_dir

    if mode == "curate":
        import json

        from .pipelines.curate import run_curation

        cur = cfg.raw.get("curator", {})
        summary = run_curation(
            cfg.input_path,
            cfg.workdir,
            weights=cur.get("split_weights"),
            near_dup=bool(cur.get("near_dup", False)),
            near_dup_method=cur.get("near_dup_method", "ngram"),
            codec=cur.get("codec", "snappy"),
        )
        print(json.dumps(summary))
        return summary

    raise ValueError(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
