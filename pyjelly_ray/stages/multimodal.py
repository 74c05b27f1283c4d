"""Multimodal column plumbing (images/audio/video as opaque binary).

The decode kernels are STUBS (image/audio libraries are not available in
this environment) — clearly marked, swappable.  The Ray-side plumbing is
real and tested: typed schema, actor-pool stage signatures, batch sizing
for large binary payloads, output layout.

Contract: payload column is ``binary`` with sidecar metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``…).  Stages are
callable classes for ``map_batches(Cls, concurrency=N, batch_size=SMALL)``
— decoders hold per-actor state (codec contexts, models) in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", "video/mp4"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

#: recommended map_batches batch_size for ~MB-scale payloads: keep
#: batch_size × concurrency × payload well under worker heap.
RECOMMENDED_BATCH_SIZE = 32


class ImageDecodeStub:
    """Decode image payload → fixed-size feature vector.

    Real implementation would use PIL/torchvision loaded once per actor in
    ``__init__``.  Here: ``fake=True`` produces a deterministic hash-derived
    feature vector (stable across runs/workers); ``fake=False`` raises
    ``NotImplementedError`` to make the stub boundary explicit.
    """

    def __init__(self, n_features: int = 64, fake: bool = True) -> None:
        self.n_features = n_features
        self.fake = fake
        # per-actor setup goes here (model/codec load) — once, not per batch

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires PIL/torchvision (not in this env); "
                "run with fake=True or plug a real decoder here"
            )
        h = hashlib.blake2b(payload or b"", digest_size=self.n_features).digest()
        return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class ResizeStub:
    """'Resize' images: real plumbing, fake kernel (truncate payload)."""

    def __init__(self, max_bytes: int = 1024, fake: bool = True) -> None:
        self.max_bytes = max_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real resize needs an image library")
        payloads = [
            (p or b"")[: self.max_bytes] for p in batch.column("payload").to_pylist()
        ]
        out = batch.drop_columns(["payload"])
        return out.append_column("payload", pa.array(payloads, pa.binary()))


class FrameSampleStub:
    """Sample N 'frames' from a video payload (fake: fixed-stride slices)."""

    def __init__(self, n_frames: int = 4, fake: bool = True) -> None:
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling needs a video library")
        ids, frame_no, frames = [], [], []
        for mid, p in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = p or b""
            stride = max(len(p) // self.n_frames, 1)
            for i in range(self.n_frames):
                ids.append(mid)
                frame_no.append(i)
                frames.append(p[i * stride : (i + 1) * stride])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest() * 8
        rows.append(
            {
                "media_id": i,
                "media_type": ["image/png", "audio/wav", "video/mp4"][i % 3],
                "payload": payload,
                "width": 64 + (i % 8) * 16,
                "height": 48 + (i % 6) * 16,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
