"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The container has no image/audio codecs, so the decode kernels are STUBS:
``strict=True`` raises NotImplementedError at the exact point a real
codec (Pillow / libsndfile / pyav) would be called; the default
deterministic fake derives metadata from the payload bytes so the Ray
plumbing — schema, actor-pool lifecycle, batch sizing, output layout —
is real and tested end-to-end.

Shapes: each stage is a callable CLASS passed to
``map_batches(Cls, concurrency=N, batch_size=B)`` — expensive setup in
``__init__`` (once per actor), vectorized work in ``__call__`` (per
batch). Large payloads => small batch_size so batch x concurrency fits
the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("source", pa.string()),
    ]
)


def synthesize_media(n: int = 64, seed: int = 17) -> pa.Table:
    """Deterministic fake payloads (seeded bytes) for plumbing tests."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "source": pa.array([f"s3://bucket/{i % 7}/obj{i}" for i in range(n)], pa.string()),
        }
    )


def media_from_documents(sf_dir: str):
    """Media table derived from the documents table: payload = utf-8 text
    bytes, type cycles by doc_id. Derivation (and the md5-based stub
    decode below) is chosen to be reproducible by a SQL oracle, so the
    driver can hash-verify the actor-pool plumbing end to end."""
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def to_media(b: pa.Table) -> pa.Table:
        types = pa.array(["image", "audio", "video"], pa.string())
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        idx = pa.array((ids % 3).astype("int32"))
        return pa.table(
            {
                "media_id": b.column("doc_id"),
                "media_type": types.take(idx),
                "payload": pc.cast(b.column("text"), pa.binary()),
                "source": b.column("source"),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def _fake_dims(payload: bytes) -> tuple[int, int, float]:
    """Stub decode outputs from the payload's md5 digest — deterministic
    AND mirrorable in SQL (md5 hex bytes), unlike a real codec."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, float(h[2])


class DecodeImage:
    """Actor-pool stage: binary payload -> (width, height, mean_luma).

    __init__ loads the (stub) codec once per actor; __call__ decodes a
    batch. strict=True raises where `PIL.Image.open` would run.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.codec = "stub-codec-v1"  # real impl: import PIL here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image decode requires Pillow; not available in this environment"
            )
        widths, heights, lumas = [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, luma = _fake_dims(payload)
            widths.append(w)
            heights.append(h)
            lumas.append(luma)
        batch = batch.append_column("width", pa.array(widths, pa.int32()))
        batch = batch.append_column("height", pa.array(heights, pa.int32()))
        batch = batch.append_column("mean_luma", pa.array(lumas, pa.float64()))
        return batch


class ExtractFeatures:
    """Actor-pool stage: payload -> fixed-dim feature vector (the
    batched-model-inference slot; a real model loads in __init__)."""

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        self.strict = strict
        rng = np.random.default_rng(3)
        self.projection = rng.standard_normal((256, dim)).astype(np.float32)  # "model weights"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("real feature extraction requires a model runtime")
        feats = []
        for payload in batch.column("payload").to_pylist():
            hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256).astype(np.float32)
            hist /= max(hist.sum(), 1.0)
            feats.append((hist @ self.projection).tolist())
        return batch.append_column("features", pa.array(feats, pa.list_(pa.float32(), self.dim)))


class SampleFrames:
    """Actor-pool stage for video rows: deterministic frame offsets
    (every_n over a payload-derived fake duration)."""

    def __init__(self, every_n: int = 10, strict: bool = False):
        self.every_n = every_n
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("real frame sampling requires pyav/ffmpeg")
        offsets = []
        for mt, payload in zip(
            batch.column("media_type").to_pylist(), batch.column("payload").to_pylist()
        ):
            if mt != "video":
                offsets.append(None)
                continue
            n_frames = 1 + len(payload) % 97
            offsets.append(list(range(0, n_frames, self.every_n)))
        return batch.append_column("frame_offsets", pa.array(offsets, pa.list_(pa.int64())))


def media_pipeline(ds, concurrency: int = 2, batch_size: int = 16, num_cpus: float = 0.5):
    """decode -> features -> frame-sample, each an actor pool.

    num_cpus is fractional so the three concurrent pools can all schedule
    on small clusters (streaming execution keeps every stage's pool alive
    at once; 3 stages x concurrency actors must fit the CPU budget).
    """
    ds = ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )
    ds = ds.map_batches(
        ExtractFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )
    return ds.map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )
