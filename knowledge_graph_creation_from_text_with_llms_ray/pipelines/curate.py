"""Resumable corpus-curation pipeline: quality filter → split →
global dedup, checkpointed per input shard.

The second flagship composition (the first is the KG build in
``kg.py``): what a training-data team runs over a raw document dump
before tokenization.  Structure mirrors ``kg.run_checkpointed``:

1. per-shard stage ``curated`` — PURE PER-ROW work (Gopher repetition
   keep rule, deterministic split label, md5 fingerprint) written as
   one HIVE-PARTITIONED (``split=...``) parquet directory per input
   shard with a lineage manifest, so a killed run reruns only the
   missing shards — and every checkpoint file is ALREADY in the final
   corpus layout;
2. global finalize — DELETE-ONLY assembly: the global duplicate LOSER
   set (non-minimum ids of duplicated fingerprints, optionally plus
   near-duplicate cluster losers) is derived from a column-pruned
   (doc_id, fingerprint) read; curated files containing no losers are
   hard-linked into the corpus (server-side copy / manifest append on
   shared object storage), and only loser-containing files are
   rewritten.  Finalize I/O is therefore proportional to the number of
   loser-CONTAINING files, not the corpus size — the round-4 form
   re-read and rewrote the full corpus (19 GB at the 4 M-doc bench)
   regardless of CPU count, which held end-to-end scaling at
   0.69–0.74.  Honest limit: with duplicates scattered UNIFORMLY at a
   few percent, every multi-thousand-row file contains a loser and
   assembly degenerates to a rewrite; link-assembly pays off when
   duplicates are rare or clustered (re-crawls, boilerplate runs) —
   measured 3.3 s links-only vs 10-14 s rewrite at 2 M docs / 32 CPUs
   (BASELINE.md round 5).

The global dedup cannot be per-shard (duplicates cross shard
boundaries); everything that CAN be per-shard is, because that is the
resumable / embarrassingly-parallel part at 100 TB.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages import analysis, dedup
from ..state import lineage

# curated-checkpoint layout marker: recorded in every shard manifest so
# a workdir checkpointed under a DIFFERENT layout (pre-round-5 runs
# wrote flat files with an in-data split column) reruns its shards
# instead of feeding unreadable geometry to the finalize
_SHARD_LAYOUT = "hive-split"


def curate_shard(
    docs: ray.data.Dataset,
    weights: dict[str, int] | None = None,
    keep_cols: tuple[str, ...] = (),
):
    """Per-row curation of one shard: repetition stats + keep filter,
    split label, md5 fingerprint.  No shuffle — safe at any shard
    size.  ``keep_cols`` are passthrough columns projected into the
    output after the standard four (e.g. the wave runner's ``shard``
    routing tag)."""
    kept = analysis.repetition_stats(docs).filter(expr="keep == True")
    split = analysis.split_by_hash(kept, weights=weights)
    with_fp = split.map_batches(
        dedup._fingerprint_batch, batch_format="pyarrow", fn_kwargs={"text_col": "text"}
    )
    return with_fp.select_columns(
        ["doc_id", "text", "fingerprint", "split", *keep_cols]
    )


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


def _near_dup_effective_params(method: str) -> dict:
    """EFFECTIVE near-dup knobs for the finalize manifest, read from
    ``near_dup_losers``'s own signature: a library default change (the
    round-4 char→word shingle flip, say) then changes the recorded
    params and forces a RE-finalize on resume, instead of a silent
    'pure skip' over results computed under the old semantics."""
    import inspect

    relevant = {
        "ngram": ("threshold", "df_cap", "n"),
        "minhash": ("threshold", "num_perm", "bands", "shingle", "shingle_k"),
        "simhash": ("max_hamming",),
    }[method]
    sig = inspect.signature(dedup.near_dup_losers)
    return {"method": method, **{k: sig.parameters[k].default for k in relevant}}


def _curated_entries(workdir: str, n_shards: int) -> list[dict]:
    """Every curated checkpoint file with its shard index and hive
    split label: ``{"shard", "split", "path"}``."""
    out = []
    for i in range(n_shards):
        base = lineage.shard_dir(workdir, "curated", i)
        for p in sorted(glob.glob(os.path.join(base, "split=*", "*.parquet"))):
            split = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
            out.append({"shard": i, "split": split, "path": p})
    return out


def _assemble_corpus(
    entries: list[dict],
    losers: ray.data.Dataset,
    corpus_dir: str,
    codec: str = "zstd",
) -> int:
    """Delete-only corpus assembly.  Curated checkpoint files are
    already final-layout (hive ``split=`` dirs, no split column in the
    data — exactly what ``write_parquet(partition_cols=["split"])``
    produces); each file either hard-links into the corpus (it contains
    no losers — the overwhelmingly common case) or is rewritten minus
    its loser rows.  Work and I/O scale with the number of
    loser-CONTAINING files, not the corpus: the classify step reads one
    thin id column per file.  ``os.link`` is the single-node form; on
    shared object storage the same step is a server-side copy or a
    manifest append (Iceberg/Delta-style), never a stream through
    compute.  Returns the corpus row count."""
    from ..stages.relational import _cluster_cpus

    tables = [t for t in ray.get(losers.to_arrow_refs()) if t.num_rows]
    if tables:
        ids = (
            pa.concat_tables(tables)["doc_id"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    else:
        ids = np.array([], dtype=np.int64)
    ids_ref = ray.put(ids)

    shutil.rmtree(corpus_dir, ignore_errors=True)
    for split in {e["split"] for e in entries}:
        os.makedirs(os.path.join(corpus_dir, f"split={split}"), exist_ok=True)

    def _one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        loser_ids = ray.get(ids_ref)
        rows_out = []
        for shard, split, path in zip(
            batch["shard"].to_pylist(),
            batch["split"].to_pylist(),
            batch["path"].to_pylist(),
        ):
            dst = os.path.join(
                corpus_dir,
                f"split={split}",
                f"shard-{shard:05d}-{os.path.basename(path)}",
            )
            dids = _pq.read_table(path, columns=["doc_id"])["doc_id"].to_numpy(
                zero_copy_only=False
            )
            hit = (
                np.isin(dids, loser_ids)
                if len(loser_ids)
                else np.zeros(len(dids), dtype=bool)
            )
            if not hit.any():
                try:
                    os.link(path, dst)
                except OSError:  # cross-device / fs without hard links
                    shutil.copy2(path, dst)
                rows_out.append(len(dids))
            else:
                t = _pq.read_table(path)
                keep = ~np.isin(
                    t["doc_id"].to_numpy(zero_copy_only=False), loser_ids
                )
                _pq.write_table(t.filter(pa.array(keep)), dst, compression=codec)
                rows_out.append(int(keep.sum()))
        return pa.table({"rows_out": pa.array(rows_out, pa.int64())})

    per_file = ray.data.from_items(
        entries,
        override_num_blocks=min(len(entries), max(8, _cluster_cpus() * 4)),
    ).map_batches(_one, batch_format="pyarrow")
    # one int per curated file — bounded by file count, not rows
    return sum(r["rows_out"] for r in per_file.take_all())


def _rewrite_corpus(
    entries: list[dict],
    losers: ray.data.Dataset,
    corpus_dir: str,
    corpus_count: int,
    out_rows_per_file: int,
    codec: str = "zstd",
) -> int:
    """Full streaming rewrite — the fallback when the loser set is too
    big to broadcast (duplicates rival the corpus, so most files would
    be rewritten anyway and link-assembly buys nothing).  The split
    label is rehydrated from the hive path per split group; the
    loser drop sizes itself via ``drop_losers(via="auto",
    corpus_count=...)``."""
    by_split: dict[str, list[str]] = {}
    for e in entries:
        by_split.setdefault(e["split"], []).append(e["path"])
    parts = []
    for split, paths in sorted(by_split.items()):
        def _add(b: pa.Table, s=split) -> pa.Table:
            return b.append_column(
                "split", pa.array([s] * b.num_rows, pa.string())
            )

        parts.append(
            ray.data.read_parquet(paths).map_batches(_add, batch_format="pyarrow")
        )
    full = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    kept = dedup.drop_losers(
        full, losers, loser_col="doc_id", corpus_count=corpus_count
    )
    shutil.rmtree(corpus_dir, ignore_errors=True)
    kept.write_parquet(
        corpus_dir,
        partition_cols=["split"],
        min_rows_per_file=out_rows_per_file,
        compression=codec,
    )
    return lineage.footer_row_count(
        glob.glob(os.path.join(corpus_dir, "**", "*.parquet"), recursive=True)
    )


def run_curation(
    input_path: str,
    workdir: str,
    weights: dict[str, int] | None = None,
    near_dup: bool = False,
    near_dup_method: str = "ngram",
    shard_concurrency: int = 4,
    blocks_per_shard: int | None = 8,
    out_rows_per_file: int = 8192,
    codec: str = "snappy",
) -> dict:
    """Resumable sharded curation run.  Returns a summary dict (shards
    run / skipped, output path, row counts).

    ``near_dup=True`` widens the finalize's loser set: after the exact
    fingerprint losers, near-duplicate clusters (word-3-gram Jaccard ≥
    0.5 with the production ``df_cap`` skew guard by default) keep only
    their minimum-id member; the extra loser ids join the same
    delete-only assembly — the near-dup scan streams the exact-dedup
    survivors straight from the curated checkpoints, with no
    intermediate corpus checkpoint.

    ``out_rows_per_file`` is the ``min_rows_per_file`` passed to the
    small-shard checkpoint write (and the full-rewrite fallback): it
    coalesces per-block outputs into fewer, larger files so downstream
    reads aren't dominated by per-file opens.  It is a TASK-granularity
    knob too — Write fuses with the upstream map chain, so each fused
    task consumes at least this many rows (8192 ≈ 60 write tasks at
    500k rows: parallel at 32 CPUs AND ~10 MB files; 16384 measured 4 s
    slower on the corpus write).  Big-shard checkpoints skip it
    entirely (block-sized files, full parallelism).  Because the
    finalize LINKS clean checkpoint files instead of rewriting them,
    these knobs now also set the final corpus file geometry.

    ``codec`` is the parquet compression of every body write (shard
    checkpoints — which ARE the corpus files when linked — plus the
    loser rewrites).  Both directions were MEASURED at 2M docs
    (BASELINE.md round 5): on the heavy-vocabulary corpus zstd wins
    both legs (2.85× vs 1.77× on disk, ~3.7× faster decode of the
    checkpoint re-reads: 96.4→91.6 s @32, 230.8→196.9 s @8); on the
    compressible 48-stem corpus the run is encode-CPU-bound and
    snappy wins (46.2 vs 59.4 s @32).  Default ``snappy``; set
    ``zstd`` when storage bandwidth is the wall — at 100 TB against
    an object store it always is.  Parquet is self-describing, so
    resuming a snappy-era workdir under zstd just yields mixed-codec
    files.

    Shards are processed in WAVES of ``shard_concurrency``: each wave
    is ONE streaming-executor job over the union of its shards (every
    shard keeps its own size-aware read split; the shard index rides as
    a hive partition column so outputs land in per-shard dirs).  One
    executor per wave replaces the round-4 thread pool that drove
    ``shard_concurrency`` SEPARATE Ray Data jobs concurrently — N
    competing executors fair-share the object store and per-operator
    resource budgets (2M-doc/4.8GB corpus @32 CPUs same-day: E2E 52.7s
    pooled → 46.2s fused, and the ±30% pooled run-to-run variance
    collapsed to ±5%; see BASELINE.md round 5).  A serial per-shard
    loop is still worse (per-job orchestration 128× in a row: 165s at
    500k docs/128 shards), and wider waves pressure the object store
    (wave=8: 51.7s, wave=16: 60.5s E2E).  Manifests stay per-shard; a
    wave killed mid-flight just reruns its unmanifested shards.
    """
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
                # pre-round-5 checkpoints wrote flat files with an
                # in-data split column — unreadable by the hive-layout
                # finalize, so rerun them
                and man.get("layout") == _SHARD_LAYOUT
            ):
                skipped.append(i)
                continue
        todo.append((i, f))

    def _run_wave(items: list[tuple[int, str]]) -> list[int]:
        t0 = time.time()
        # SMALL shards: without a cap Ray splits every tiny file into
        # ~2×CPU blocks and per-task churn dominates (measured 87 s →
        # 28 s at 32 CPUs / 500k docs).  LARGE shards are split into
        # ~32 MiB read tasks at row-group granularity: Ray's default is
        # ONE read task per file (measured 11.7 s single-threaded decode
        # of a 150 MB shard), which serializes the whole shard's read.
        # The wave reads ALL its files in ONE op with the SUMMED split
        # budget — a single fused Read→curate→Write chain (a union of
        # per-shard datasets breaks operator fusion: Write detaches from
        # the map chain and the wave ran ~35% slower at 8 CPUs).
        caps = []
        all_small = True
        for _, f in items:
            size = os.path.getsize(f)
            small = size < _SMALL_SHARD_BYTES
            all_small = all_small and small
            caps.append(
                blocks_per_shard
                if small
                else max(blocks_per_shard or 1, size // _TARGET_BLOCK_BYTES)
            )
        # shard index as a ZERO-PADDED hive value derived from the
        # source path: the partitioned write then lands each shard in
        # lineage.shard_dir's exact ``shard=NNNNN`` directory
        tag_of = {f: f"{i:05d}" for i, f in items}

        def _tag(b: pa.Table) -> pa.Table:
            tags = pa.array([tag_of[p] for p in b["path"].to_pylist()])
            return b.drop_columns(["path"]).append_column("shard", tags)

        docs = ray.data.read_parquet(
            [f for _, f in items],
            columns=["doc_id", "text"],
            override_num_blocks=sum(caps),
            include_paths=True,
        ).map_batches(_tag, batch_format="pyarrow")
        for i, _ in items:
            # clean stale partial output (uuid filenames append, not
            # replace)
            shutil.rmtree(
                lineage.shard_dir(workdir, "curated", i), ignore_errors=True
            )
        # ONE streaming executor for the whole wave (vs one job per
        # shard from a thread pool: N executors fair-share per-operator
        # budgets and leave cores idle — see docstring).  File-size
        # control WITHOUT min_rows_per_file on big shards: Write fuses
        # with the upstream map chain, and min_rows_per_file makes the
        # fused operator consume ≥that many rows per TASK — measured:
        # it collapsed a whole 62.5k-row shard job to 4 tasks.  Big
        # shards already read as ~32 MiB blocks, so block-sized output
        # files are the right size with full map parallelism; tiny
        # shards (orchestration-bound anyway) still coalesce.
        # hive-partitioned by (shard, split): every checkpoint file is
        # ALREADY in the final corpus layout, so the finalize can
        # hard-link clean files instead of rewriting the corpus.
        curate_shard(docs, weights=weights, keep_cols=("shard",)).write_parquet(
            os.path.join(workdir, "curated"),
            partition_cols=["shard", "split"],
            min_rows_per_file=out_rows_per_file if all_small else None,
            compression=codec,
        )
        wall = time.time() - t0
        out = []
        for i, f in items:
            written = glob.glob(
                os.path.join(
                    lineage.shard_dir(workdir, "curated", i),
                    "split=*",
                    "*.parquet",
                )
            )
            lineage.write_manifest(
                workdir,
                "curated",
                i,
                {
                    "input_file": f,
                    "rows": lineage.footer_row_count(written),
                    "weights": weights or None,
                    "split_labels": analysis.split_label_list(weights),
                    "layout": _SHARD_LAYOUT,
                    # wave wall: shards in a wave finish together
                    "wall_time_s": wall,
                },
            )
            out.append(i)
        return out

    if todo:
        step = max(1, shard_concurrency)
        for w in range(0, len(todo), step):
            ran.extend(_run_wave(todo[w : w + step]))
        ran.sort()

    near_dup_params = _near_dup_effective_params(near_dup_method) if near_dup else None
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
        # the EFFECTIVE near-dup knobs (method + its defaults), so a
        # semantic change (e.g. a shingle-mode default flip) re-finalizes
        # instead of silently keeping the old variant's output
        and man.get("near_dup_params") == near_dup_params
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
    entries = _curated_entries(workdir, len(files))
    corpus_dir = os.path.join(workdir, "corpus")
    if not entries:  # every shard fully filtered: empty corpus
        shutil.rmtree(corpus_dir, ignore_errors=True)
        os.makedirs(corpus_dir, exist_ok=True)
        n_rows = 0
    else:
        paths = [e["path"] for e in entries]
        # corpus row count is free from the shard manifests — it sizes
        # drop_losers' auto switch without executing anything
        total_rows = 0
        for i in range(len(files)):
            m = lineage.load_manifest(workdir, "curated", i)
            total_rows += int(m["rows"]) if m else 0
        # global exact-duplicate LOSERS from a slim (doc_id,
        # fingerprint) column read — bodies never leave disk for the
        # exact dedup; the loser set scales with the duplicate count
        losers = dedup.fingerprint_losers_slim(
            ray.data.read_parquet(paths, columns=["doc_id", "fingerprint"])
        ).materialize()
        if near_dup:
            # corpus-scale near-dup: let the signature/gram actor pool
            # grow to most of the cluster — the default (1, 4) pool is
            # tuned for the sub-second sf-bench corpora where actor
            # startup dominates; here the pure-compute shingle stage is
            # the wall and the rest of the cluster is idle under it
            from ..stages.relational import _cluster_cpus

            # the near-dup scan streams the exact-dedup SURVIVORS
            # straight from the curated checkpoints (column-pruned,
            # exact losers dropped in-flight) — no intermediate
            # deduped/ checkpoint write+read+delete like round 4
            survivors = dedup.drop_losers(
                ray.data.read_parquet(paths, columns=["doc_id", "text"]),
                losers,
                loser_col="doc_id",
                corpus_count=total_rows,
            )
            nd_losers = dedup.near_dup_losers(
                survivors,
                method=near_dup_method,
                concurrency=(1, max(4, _cluster_cpus() - 2)),
            )
            losers = losers.union(
                nd_losers.rename_columns({"node": "doc_id"})
            ).materialize()
        if losers.count() <= dedup.LOSER_BROADCAST_LIMIT:
            n_rows = _assemble_corpus(entries, losers, corpus_dir, codec=codec)
        else:
            # duplicates rival the corpus: most files contain losers,
            # link-assembly buys nothing — full streaming rewrite
            n_rows = _rewrite_corpus(
                entries, losers, corpus_dir, total_rows, out_rows_per_file, codec=codec
            )
    # reclaim the intermediate exact-dedup checkpoint of pre-round-5
    # workdirs (the delete-only finalize no longer creates one)
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
            "near_dup_params": near_dup_params,
            "wall_time_s": time.time() - t0,
        },
    )
    return {
        "shards_ran": ran,
        "shards_skipped": skipped,
        "corpus_dir": corpus_dir,
        "rows": n_rows,
    }
