"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
sidecar metadata; decode / feature-extraction / resize / frame-sample
are actor-pool ``map_batches`` stages with SMALL batch sizes (payload ×
batch_size × concurrency must fit a worker heap — the knob that matters
at 100 TB).

The decode libraries (PIL / torchaudio / av) are not in this container,
so the codec step is import-gated: ``strict=True`` raises
NotImplementedError exactly where a real decoder would plug in, the
default path computes a deterministic fake feature (hash-derived) so the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

FEATURE_DIM = 32


def attach_fake_payloads(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministically derive a binary 'media' payload per row (test
    plumbing for corpora that have no real media)."""

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        payloads, types, ws, hs, fs = [], [], [], [], []
        for i, t in zip(ids, texts):
            seed = hashlib.sha256(f"{i}:{len(t or '')}".encode()).digest()
            payloads.append(seed * 8)  # 256 opaque bytes
            types.append(("image", "audio", "video")[i % 3])
            ws.append(64 + (i % 8) * 32)
            hs.append(64 + (i % 5) * 32)
            fs.append(1 if i % 3 == 0 else 16 + i % 64)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(fs, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(_make, batch_format="pyarrow")


class MediaDecodeActor:
    """Decode + feature-extract stage.  Real codecs load once per actor
    in ``__init__`` (the expensive part an actor pool amortizes); per
    batch it emits a fixed-size feature vector per row."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.decoder = None
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            self.decoder = "pil"
        except ImportError:
            self.decoder = None

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        vec = raw.astype(np.float32) / np.float32(2**32)
        return vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and self.decoder is None:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/av; not available "
                "in this environment (stubbed by design)"
            )
        feats = [self._fake_feature(p) for p in batch["payload"].to_pylist()]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), FEATURE_DIM
        )
        out = batch.drop_columns(["payload"])  # decoded: payload no longer needed
        return out.append_column("feature", arr)


def decode_features(
    ds: ray.data.Dataset,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 64,  # small on purpose: payloads are large
    strict: bool = False,
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"strict": strict},
    )


def resize_plan(
    ds: ray.data.Dataset, max_w: int = 224, max_h: int = 224
) -> ray.data.Dataset:
    """Fit-within-box resize planning: integer aspect-preserving target
    dims per media row (``new_width``/``new_height``), payload and
    original dims untouched.  Pure INTEGER arithmetic (floor division)
    so the plan is deterministic and SQL-replicable; the pixel
    resample itself would run inside ``MediaDecodeActor`` next to the
    codec (import-gated here like the decode).  Vectorized — one numpy
    pass per batch, zero shuffle."""

    def _plan(batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        fits = (w <= max_w) & (h <= max_h)
        # limiting dimension by cross-multiplication (no floats):
        # width-limited when w*max_h >= h*max_w
        width_limited = w * max_h >= h * max_w
        new_w = np.where(
            fits, w, np.where(width_limited, max_w, (w * max_h) // np.maximum(h, 1))
        )
        new_h = np.where(
            fits, h, np.where(width_limited, (h * max_w) // np.maximum(w, 1), max_h)
        )
        return batch.append_column(
            "new_width", pa.array(new_w.astype(np.int32))
        ).append_column("new_height", pa.array(new_h.astype(np.int32)))

    return ds.map_batches(_plan, batch_format="pyarrow")


def frame_sample(
    ds: ray.data.Dataset, every_nth: int = 8
) -> ray.data.Dataset:
    """Video frame-sampling plumbing: one row per sampled frame index
    (the decode of each frame would live in MediaDecodeActor)."""

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        types = batch["media_type"].to_pylist()
        frames = batch["n_frames"].to_pylist()
        o_id, o_frame = [], []
        for i, t, n in zip(ids, types, frames):
            if t != "video":
                continue
            for f in range(0, n, every_nth):
                o_id.append(i)
                o_frame.append(f)
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_index": pa.array(o_frame, pa.int32()),
            }
        )

    return ds.map_batches(_explode, batch_format="pyarrow")
