"""Resumable corpus-curation pipeline: quality filter → split →
global dedup, checkpointed per input shard.

The second flagship composition (the first is the KG build in
``kg.py``): what a training-data team runs over a raw document dump
before tokenization.  Structure mirrors ``kg.run_checkpointed``:

1. per-shard stage ``curated`` — PURE PER-ROW work (Gopher repetition
   keep rule, deterministic split label, md5 fingerprint) written as
   one parquet directory per input shard with a lineage manifest, so a
   killed run reruns only the missing shards;
2. global finalize — fingerprint dedup across all curated shards
   through the slim (bodies-free) shuffle, written partitioned;
   skipped entirely on a pure-resume rerun.

The global dedup cannot be per-shard (duplicates cross shard
boundaries); everything that CAN be per-shard is, because that is the
resumable / embarrassingly-parallel part at 100 TB.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import ray
import ray.data

from ..stages import analysis, dedup
from ..state import lineage


def curate_shard(docs: ray.data.Dataset, weights: dict[str, int] | None = None):
    """Per-row curation of one shard: repetition stats + keep filter,
    split label, md5 fingerprint.  No shuffle — safe at any shard
    size."""
    kept = analysis.repetition_stats(docs).filter(expr="keep == True")
    split = analysis.split_by_hash(kept, weights=weights)
    with_fp = split.map_batches(
        dedup._fingerprint_batch, batch_format="pyarrow", fn_kwargs={"text_col": "text"}
    )
    return with_fp.select_columns(["doc_id", "text", "fingerprint", "split"])


# shard files below this size get a fixed small block cap; larger ones
# are split into ~_TARGET_BLOCK_BYTES read tasks (GB-scale shards
# parallelize inside)
_SMALL_SHARD_BYTES = 64 << 20
_TARGET_BLOCK_BYTES = 32 << 20

_PROBE_HARDENED = False


def _harden_fsspec_probe() -> None:
    """Make Ray's optional-HTTP-filesystem probe safe under CONCURRENT
    dataset creation.

    ``path_util._is_http_filesystem`` imports fsspec's http module on
    every dataset creation and catches only ModuleNotFoundError; when
    the module's own ``import aiohttp`` fails while ANOTHER thread is
    mid-import, CPython surfaces a bare ImportError (and can leave a
    partially-initialized module cached), crashing concurrent shard
    jobs.  Either way the meaning is the same — no HTTP filesystem —
    so wrap the probe to treat ANY ImportError as False."""
    global _PROBE_HARDENED
    if _PROBE_HARDENED:
        return
    import ray.data.datasource.path_util as _pu

    try:
        _orig = _pu._is_http_filesystem
    except AttributeError:
        # private Ray API moved/renamed: the probe is an optimization
        # guard only — skip hardening rather than fail at startup
        _PROBE_HARDENED = True
        return

    def _safe(fs):
        try:
            return _orig(fs)
        except ImportError:
            import sys as _sys

            # drop a partially-initialized module so later probes are clean
            _m = _sys.modules.get("fsspec.implementations.http")
            if _m is not None and not hasattr(_m, "HTTPFileSystem"):
                _sys.modules.pop("fsspec.implementations.http", None)
            return False

    _pu._is_http_filesystem = _safe
    _PROBE_HARDENED = True


def run_curation(
    input_path: str,
    workdir: str,
    weights: dict[str, int] | None = None,
    near_dup: bool = False,
    near_dup_method: str = "ngram",
    shard_concurrency: int = 4,
    blocks_per_shard: int | None = 8,
    out_rows_per_file: int = 8192,
) -> dict:
    """Resumable sharded curation run.  Returns a summary dict (shards
    run / skipped, output path, row counts).

    ``near_dup=True`` adds a second global finalize stage: after the
    exact fingerprint dedup, near-duplicate clusters (word-3-gram
    Jaccard ≥ 0.5 with the production ``df_cap`` skew guard) keep only
    their minimum-id member, dropped via a distributed anti join —
    nothing driver-side.

    ``out_rows_per_file`` is the ``min_rows_per_file`` passed to the
    small-shard checkpoint, dedup checkpoint and final corpus writes:
    it coalesces per-block outputs into fewer, larger files so
    downstream reads aren't dominated by per-file opens.  It is a
    TASK-granularity knob too — Write fuses with the upstream map
    chain, so each fused task consumes at least this many rows (8192
    ≈ 60 write tasks at 500k rows: parallel at 32 CPUs AND ~10 MB
    files; 16384 measured 4 s slower on the corpus write).  Big-shard
    checkpoints skip it entirely (block-sized files, full parallelism).

    Shards are independent pure-map jobs (no shuffle), so up to
    ``shard_concurrency`` of them execute CONCURRENTLY — a serial
    shard loop pays per-job orchestration 128× in a row (measured:
    500k docs / 128 shards went 165 s serial → see BASELINE.md);
    manifests are per-shard files, so concurrent completion is safe.
    """
    from concurrent.futures import ThreadPoolExecutor

    _harden_fsspec_probe()
    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_path}")

    done = lineage.completed_shards(workdir, "curated")
    ran, skipped = [], []
    todo = []
    for i, f in enumerate(files):
        if i in done:
            # shard indices are positional: if the input shard SET
            # changed (a file added/renamed re-sorts the glob), a stale
            # manifest would silently skip the WRONG file — validate
            # the recorded input path and rerun on mismatch
            man = lineage.load_manifest(workdir, "curated", i)
            if (
                man is not None
                and man.get("input_file") == f
                # split labels are computed per shard: different
                # weights ⇒ different output ⇒ rerun.  Compare the
                # DERIVED label list, not the weights dict — label
                # assignment is dict-insertion-order-sensitive and
                # dict equality ignores key order, so {'test':1,
                # 'val':1,'train':8} must NOT pass a guard written
                # for {'train':8,'val':1,'test':1}
                and man.get("split_labels")
                == analysis.split_label_list(weights)
            ):
                skipped.append(i)
                continue
        todo.append((i, f))

    def _run_shard(item):
        i, f = item
        t0 = time.time()
        # SMALL shards: without a cap Ray splits every tiny file into
        # ~2×CPU blocks and per-task churn dominates (measured 87 s →
        # 28 s at 32 CPUs / 500k docs).  LARGE shards are split into
        # ~32 MiB read tasks at row-group granularity: Ray's default is
        # ONE read task per file (measured 11.7 s single-threaded decode
        # of a 150 MB shard), which serializes the whole shard job.
        size = os.path.getsize(f)
        small = size < _SMALL_SHARD_BYTES
        cap = (
            blocks_per_shard
            if small
            else max(blocks_per_shard or 1, size // _TARGET_BLOCK_BYTES)
        )
        docs = ray.data.read_parquet(
            f, columns=["doc_id", "text"], override_num_blocks=cap
        )
        out_dir = lineage.shard_dir(workdir, "curated", i)
        # clean stale partial output (uuid filenames append, not replace)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        # File-size control WITHOUT min_rows_per_file on big shards:
        # Write fuses with the upstream map chain, and min_rows_per_file
        # makes the fused operator consume ≥that many rows per TASK —
        # measured: it collapsed a whole 62.5k-row shard to 4 tasks, so
        # 8 concurrent shard jobs could not even feed 32 CPUs.  Big
        # shards already read as ~32 MiB blocks, so block-sized output
        # files are the right size with full map parallelism; tiny
        # shards (orchestration-bound anyway) still coalesce.
        curate_shard(docs, weights=weights).write_parquet(
            out_dir,
            min_rows_per_file=out_rows_per_file if small else None,
        )
        written = glob.glob(os.path.join(out_dir, "*.parquet"))
        n_rows = lineage.footer_row_count(written)
        lineage.write_manifest(
            workdir,
            "curated",
            i,
            {
                "input_file": f,
                "rows": n_rows,
                "weights": weights or None,
                "split_labels": analysis.split_label_list(weights),
                "wall_time_s": time.time() - t0,
            },
        )
        return i

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, shard_concurrency)) as pool:
            ran = sorted(pool.map(_run_shard, todo))

    man = lineage.load_manifest(workdir, "final", 0)
    if (
        not ran
        and man is not None
        and os.path.isdir(man["corpus_dir"])
        # a REMOVED trailing shard leaves every positional manifest
        # valid — the final manifest records the full input set so the
        # finalize reruns when the set shrinks or reorders
        and man.get("input_files") == files
        and man.get("near_dup", False) == near_dup
        and (not near_dup or man.get("near_dup_method") == near_dup_method)
    ):
        return {
            "shards_ran": ran,
            "shards_skipped": skipped,
            "corpus_dir": man["corpus_dir"],
            "rows": man["rows"],
            "final_skipped": True,
        }
    t0 = time.time()
    # invalidate the final manifest BEFORE mutating the output dir: a
    # kill mid-rewrite must not leave a manifest pointing at a
    # partially-written corpus
    try:
        os.remove(lineage.manifest_path(workdir, "final", 0))
    except FileNotFoundError:
        pass
    shard_files = []
    for i in range(len(files)):
        shard_files.extend(
            sorted(
                glob.glob(
                    os.path.join(lineage.shard_dir(workdir, "curated", i), "*.parquet")
                )
            )
        )
    if not shard_files:  # every shard fully filtered: empty corpus
        deduped = None
    else:
        curated = ray.data.read_parquet(shard_files)
        # global dedup through the slim (bodies-free) shuffle, reusing
        # the fingerprints ALREADY computed per shard; rescan=True —
        # the input is a bare checkpoint read, so the winner pass
        # re-reads just (doc_id, fingerprint) column-pruned instead of
        # pinning every body in the object store
        deduped = dedup.fingerprint_dedup_slim(
            curated,
            precomputed=True,
            rescan=True,
            slim_input=ray.data.read_parquet(
                shard_files, columns=["doc_id", "fingerprint"]
            ),
        ).select_columns(["doc_id", "text", "fingerprint", "split"])
        if near_dup:
            # checkpoint the exact-dedup result to disk instead of
            # materializing it: the loser derivation and the loser-drop
            # left side both re-read from parquet (column-pruned where
            # possible).  Pinning the corpus in the object store made
            # every later task in the session 3-4× slower at 4 GB and
            # is impossible at 100 TB; a disk checkpoint streams.
            dedup_dir = os.path.join(workdir, "deduped")
            shutil.rmtree(dedup_dir, ignore_errors=True)
            deduped.write_parquet(dedup_dir, min_rows_per_file=out_rows_per_file)
            dd_files = sorted(glob.glob(os.path.join(dedup_dir, "*.parquet")))
            # corpus-scale near-dup: let the signature/gram actor pool
            # grow to most of the cluster — the default (1, 4) pool is
            # tuned for the sub-second sf-bench corpora where actor
            # startup dominates; here the pure-compute shingle stage is
            # the wall and the rest of the cluster is idle under it
            from ..stages.relational import _cluster_cpus

            losers = dedup.near_dup_losers(
                ray.data.read_parquet(dd_files, columns=["doc_id", "text"]),
                method=near_dup_method,
                concurrency=(1, max(4, _cluster_cpus() - 2)),
            )
            # Bloom anti prefilter + exact left_anti on the sliver:
            # survivors (the vast majority) never enter the exchange
            deduped = dedup.drop_losers(ray.data.read_parquet(dd_files), losers)
    corpus_dir = os.path.join(workdir, "corpus")
    shutil.rmtree(corpus_dir, ignore_errors=True)
    if deduped is None:
        os.makedirs(corpus_dir, exist_ok=True)
        n_rows = 0
    else:
        # hive-partitioned by split: a trainer reads corpus/split=train/
        # without touching val/test files (partition pruning at the read)
        deduped.write_parquet(
            corpus_dir,
            partition_cols=["split"],
            min_rows_per_file=out_rows_per_file,
        )
        n_rows = lineage.footer_row_count(
            glob.glob(os.path.join(corpus_dir, "**", "*.parquet"), recursive=True)
        )
    # the exact-dedup checkpoint is intermediate to the finalize — a
    # resumed run rebuilds it from the curated shards, so reclaim the
    # disk (at corpus scale it is a full extra copy)
    shutil.rmtree(os.path.join(workdir, "deduped"), ignore_errors=True)
    lineage.write_manifest(
        workdir,
        "final",
        0,
        {
            "corpus_dir": corpus_dir,
            "rows": n_rows,
            "input_files": files,
            "near_dup": near_dup,
            "near_dup_method": near_dup_method if near_dup else None,
            "wall_time_s": time.time() - t0,
        },
    )
    return {
        "shards_ran": ran,
        "shards_skipped": skipped,
        "corpus_dir": corpus_dir,
        "rows": n_rows,
    }
