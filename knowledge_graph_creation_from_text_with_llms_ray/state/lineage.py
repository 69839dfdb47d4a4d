"""Per-partition lineage manifests.

Generalizes the reference's coarse per-stage rerun (``--mode`` gating,
``src/run.py:85-116``) to partition-level resume: every checkpointed
stage writes, per input shard, a small JSON manifest recording

    rows, content sha256 rollup, wall time, status

On restart, shards with a ``done`` manifest are skipped and their
checkpoint Parquet is reused; Ray's lineage-based task retry covers
in-run failures, manifests cover cross-run resume (SURVEY.md §4.3.5).
The sha rollup is order-insensitive (xor of 128-bit digest prefixes) so
it is stable under any block order, and reproduces the per-row
``sha256(content)`` invariant of BASELINE.json at shard granularity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

MANIFEST_VERSION = 1


def manifest_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage, "_manifests")


def shard_dir(workdir: str, stage: str, shard: int) -> str:
    return os.path.join(workdir, stage, f"shard={shard:05d}")


def manifest_path(workdir: str, stage: str, shard: int) -> str:
    return os.path.join(manifest_dir(workdir, stage), f"shard-{shard:05d}.json")


def write_manifest(
    workdir: str, stage: str, shard: int, payload: dict[str, Any]
) -> str:
    os.makedirs(manifest_dir(workdir, stage), exist_ok=True)
    path = manifest_path(workdir, stage, shard)
    record = {
        "version": MANIFEST_VERSION,
        "stage": stage,
        "shard": shard,
        "status": "done",
        "written_at": time.time(),
        **payload,
    }
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(record, f)
    os.replace(tmp, path)  # atomic: a manifest either exists complete or not at all
    return path


def footer_row_count(files: list[str]) -> int:
    """Exact row count from parquet FOOTERS only — no data pages.

    Checkpoint manifests need the row count of what was just written;
    re-reading the files through a Ray job to ``count()`` was measured
    at GB shard sizes to cost about as much as the write itself.  The
    footer already carries the number."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for p in files)


def load_manifest(workdir: str, stage: str, shard: int) -> dict[str, Any] | None:
    path = manifest_path(workdir, stage, shard)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        record = json.load(f)
    return record if record.get("status") == "done" else None


def completed_shards(workdir: str, stage: str) -> set[int]:
    d = manifest_dir(workdir, stage)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("shard-") and name.endswith(".json"):
            rec = None
            try:
                with open(os.path.join(d, name), encoding="utf-8") as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if rec.get("status") == "done":
                out.add(int(rec["shard"]))
    return out
