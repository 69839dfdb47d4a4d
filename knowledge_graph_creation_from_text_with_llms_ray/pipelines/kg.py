"""The flagship knowledge-graph construction pipeline.

Streaming composition (SURVEY.md §3.4) — every stage is a Dataset
transform, nothing materializes the corpus:

    read_parquet (column-pruned) → sha256 stamp → clean+chunk
      → extraction actor pool → grammar parse → broadcast linking
      → mint + two-phase dedup → sorted edges / nodes Parquet

``run_checkpointed`` is the production driver shape: the input is
processed shard-by-shard (shard = one input parquet file — the
partition unit of lineage and resume), each shard's linked triples are
checkpointed with a manifest, and the final global dedup/sort runs over
all shard checkpoints.  Re-running after a failure skips every shard
whose manifest says ``done`` (reference analogue: the per-stage
``--mode`` rerun of ``src/run.py:85-116``, made partition-granular).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import sha256_rollup
from ..sources.alias_dict import build_fixture_dict
from ..sources.readers import read_corpus, stamp_sha256
from ..stages.canonicalize import materialize_edges, materialize_nodes
from ..stages.chunk import chunk_documents
from ..stages.extract import generate_responses
from ..stages.link import link_triples, link_triples_shuffle
from ..stages.parse import parse_responses
from ..state import lineage


@dataclass
class KGConfig:
    """Pipeline knobs, mirroring the reference's YAML surface
    (``src/config/main.yaml``): chunking, extraction, matching."""

    chunk_size: int = 500
    max_chunks: int | None = None
    extractor: str = "deterministic"  # or "hf"
    model_name: str | None = None
    property_query_method: str = "api"  # api | cos_similarity | mixed
    use_aliases: bool = True
    link_strategy: str = "broadcast"  # broadcast | shuffle
    extract_concurrency: int | tuple = (1, 4)
    extract_batch_size: int = 256
    link_concurrency: int | tuple = (1, 4)
    link_batch_size: int | None = None
    edge_partitions: int | None = 32  # hash-shuffle aggregators for edge dedup
    extra: dict = field(default_factory=dict)


def build_linked(
    docs: ray.data.Dataset, dict_ref, cfg: KGConfig | None = None
) -> ray.data.Dataset:
    """documents → linked triples (no materialization anywhere)."""
    cfg = cfg or KGConfig()
    chunks = chunk_documents(docs, cfg.chunk_size, cfg.max_chunks)
    responses = generate_responses(
        chunks,
        extractor=cfg.extractor,
        concurrency=cfg.extract_concurrency,
        batch_size=cfg.extract_batch_size,
        model_name=cfg.model_name,
    )
    triples = parse_responses(responses)
    if cfg.link_strategy == "shuffle":
        return link_triples_shuffle(
            triples,
            dict_ref,
            method=cfg.property_query_method,
            use_aliases=cfg.use_aliases,
            concurrency=cfg.link_concurrency,
        )
    return link_triples(
        triples,
        dict_ref,
        method=cfg.property_query_method,
        use_aliases=cfg.use_aliases,
        concurrency=cfg.link_concurrency,
        batch_size=cfg.link_batch_size,
    )


def run_streaming(
    docs: ray.data.Dataset, cfg: KGConfig | None = None, dict_table: pa.Table | None = None
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """documents → (edges, nodes) datasets, fully streaming."""
    cfg = cfg or KGConfig()
    dict_ref = ray.put(dict_table if dict_table is not None else build_fixture_dict())
    linked = build_linked(stamp_sha256(docs), dict_ref, cfg)
    edges = materialize_edges(linked, num_partitions=cfg.edge_partitions)
    nodes = materialize_nodes(edges)
    return edges, nodes


def _shard_rollup(stamped: ray.data.Dataset) -> tuple[str, int]:
    """Order-insensitive sha256 rollup + row count of one shard's
    documents (small per-block partials reduced on the driver)."""
    parts = stamped.map_batches(
        lambda b: pa.table(
            {
                "rollup": [sha256_rollup(b["doc_sha256"].to_pylist())],
                "rows": [b.num_rows],
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    acc, total = 0, 0
    for p in parts:
        x, n = p["rollup"].split(":")
        acc ^= int(x, 16)
        total += int(n)
    return f"{acc:032x}:{total}", total


def run_checkpointed(
    input_path: str,
    workdir: str,
    cfg: KGConfig | None = None,
    dict_table: pa.Table | None = None,
    shard_concurrency: int = 4,
) -> dict:
    """Resumable sharded run.  Returns a summary dict (shards run /
    skipped, output paths).

    Per-shard work is shuffle-free (stamp → chunk → extract → parse →
    broadcast link), so up to ``shard_concurrency`` shards execute
    CONCURRENTLY through a thread pool — a serial loop pays per-job
    orchestration once per shard (see the same measurement on the
    curation pipeline: 128 shards, 165 s → 28 s)."""
    from concurrent.futures import ThreadPoolExecutor

    from .curate import _harden_fsspec_probe

    _harden_fsspec_probe()
    cfg = cfg or KGConfig()
    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_path}")
    dict_ref = ray.put(dict_table if dict_table is not None else build_fixture_dict())

    done = lineage.completed_shards(workdir, "linked")
    ran, skipped = [], []
    todo = []
    for i, f in enumerate(files):
        if i in done:
            # positional shard ids: validate the manifest's recorded
            # input file so a changed shard set reruns instead of
            # silently skipping the wrong file
            man = lineage.load_manifest(workdir, "linked", i)
            if man is not None and man.get("input_file") == f:
                skipped.append(i)
                continue
        todo.append((i, f))

    def _run_shard(item):
        i, f = item
        t0 = time.time()
        from .curate import _SMALL_SHARD_BYTES

        # small shards: cap block splitting (same churn measurement as
        # the curation runner); large shards keep size-based splitting
        cap = 8 if os.path.getsize(f) < _SMALL_SHARD_BYTES else None
        docs = ray.data.read_parquet(f, override_num_blocks=cap)
        stamped = stamp_sha256(docs).materialize()  # one shard, bounded
        rollup, n_docs = _shard_rollup(stamped)
        linked = build_linked(stamped, dict_ref, cfg)
        out_dir = lineage.shard_dir(workdir, "linked", i)
        # a killed run can leave PARTIAL shard output with no manifest;
        # parquet filenames embed a per-run uuid, so writing into the
        # stale dir would APPEND duplicates — clean before rewriting
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        # coalesce per-block outputs into few large files; count from
        # the footers — a count() re-read costs about as much as the
        # write at GB shard sizes
        linked.write_parquet(out_dir, min_rows_per_file=16384)
        written = glob.glob(os.path.join(out_dir, "*.parquet"))
        n_triples = lineage.footer_row_count(written)
        lineage.write_manifest(
            workdir,
            "linked",
            i,
            {
                "input_file": f,
                "docs": n_docs,
                "rows": n_triples,
                "content_sha256_rollup": rollup,
                "wall_time_s": time.time() - t0,
            },
        )
        return i

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, shard_concurrency)) as pool:
            ran = sorted(pool.map(_run_shard, todo))

    # Final global materialization over all shard checkpoints; skipped
    # on a pure-resume rerun where nothing upstream changed.
    man = lineage.load_manifest(workdir, "final", 0)
    if (
        not ran
        and man is not None
        and os.path.isdir(man["edges_dir"])
        and os.path.isdir(man["nodes_dir"])
        # a REMOVED trailing shard leaves every positional manifest
        # valid; older manifests without the recorded set also rerun
        and man.get("input_files") == files
    ):
        return {
            "shards_ran": ran,
            "shards_skipped": skipped,
            "edges_dir": man["edges_dir"],
            "nodes_dir": man["nodes_dir"],
            "final_skipped": True,
        }
    t0 = time.time()
    # invalidate the final manifest BEFORE mutating output dirs: a kill
    # mid-rewrite must not leave a manifest pointing at partial output
    try:
        os.remove(lineage.manifest_path(workdir, "final", 0))
    except FileNotFoundError:
        pass
    shard_files = []
    for i in range(len(files)):
        shard_files.extend(
            sorted(glob.glob(os.path.join(lineage.shard_dir(workdir, "linked", i), "*.parquet")))
        )
    edges_dir = os.path.join(workdir, "edges")
    nodes_dir = os.path.join(workdir, "nodes")
    shutil.rmtree(edges_dir, ignore_errors=True)  # same uuid-append hazard
    shutil.rmtree(nodes_dir, ignore_errors=True)
    if not shard_files:  # every shard yielded zero triples
        os.makedirs(edges_dir, exist_ok=True)
        os.makedirs(nodes_dir, exist_ok=True)
    else:
        linked_all = ray.data.read_parquet(shard_files)
        edges = materialize_edges(linked_all)
        edges.write_parquet(edges_dir)
        nodes = materialize_nodes(ray.data.read_parquet(edges_dir))
        nodes.write_parquet(nodes_dir)
    lineage.write_manifest(
        workdir,
        "final",
        0,
        {
            "edges_dir": edges_dir,
            "nodes_dir": nodes_dir,
            "input_files": files,
            "wall_time_s": time.time() - t0,
        },
    )
    return {
        "shards_ran": ran,
        "shards_skipped": skipped,
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
    }
