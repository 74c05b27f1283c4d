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


# --------------------------------------------------------------------------
# REAL image path for uncompressed formats (pure numpy, no external libs)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6).  The uncompressed-format writer
    that makes the multimodal pipeline testable end-to-end without PIL."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8, zero-copy after the header.

    Real decode (not a stub): header parse + one ``np.frombuffer``.
    Compressed formats (PNG/JPEG) stay behind :class:`ImageDecodeStub` —
    their codecs aren't in this environment."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval separated by whitespace/comments
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(payload, np.uint8, count=h * w * 3, offset=i).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize via pure index striding (vectorized)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows[:, None], cols[None, :]]


def image_features(img: np.ndarray, hist_bins: int = 8) -> np.ndarray:
    """Per-channel mean/std + grayscale histogram → float32 vector of
    3 + 3 + hist_bins values (the cheap embedding used for near-dup and
    quality screens when no model is available)."""
    f = img.reshape(-1, 3).astype(np.float32)
    mean = f.mean(axis=0)
    std = f.std(axis=0)
    gray = f.mean(axis=1)
    hist, _ = np.histogram(gray, bins=hist_bins, range=(0.0, 256.0))
    hist = hist.astype(np.float32) / max(len(gray), 1)
    return np.concatenate([mean, std, hist])


class PPMImageStage:
    """REAL actor-pool image stage: decode PPM → nearest resize → feature
    vector.  Per-actor constants in ``__init__`` (once), numpy-only work in
    ``__call__`` per batch — the exact shape a PIL/torchvision decoder
    drops into (swap :func:`decode_ppm` for the codec call)."""

    def __init__(self, out_h: int = 32, out_w: int = 32, hist_bins: int = 8):
        self.out_h, self.out_w, self.hist_bins = out_h, out_w, hist_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, heights, widths = [], [], []
        for p in batch.column("payload").to_pylist():
            img = decode_ppm(p)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            small = resize_nearest(img, self.out_h, self.out_w)
            feats.append(image_features(small, self.hist_bins))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def synth_ppm_table(n: int = 32, seed: int = 7, h: int = 24, w: int = 32) -> pa.Table:
    """Deterministic real PPM images (gradient + per-image tint)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        tint = rng.integers(0, 80, size=3).astype(np.float32)
        img = np.clip(base + tint[None, None, :], 0, 255).astype(np.uint8)
        img = np.repeat(img, h, axis=0)
        rows.append(
            {
                "media_id": i,
                "media_type": "image/x-portable-pixmap",
                "payload": encode_ppm(img),
                "width": w,
                "height": h,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
