"""Multimodal column plumbing (images/audio/video as opaque binary).

REAL decode paths (no external libraries): PNG (stdlib zlib + numpy
un-filtering — all five filters, gray/GA/RGB/RGBA + palette), PPM,
WAV/PCM16, raw RGB video.  Only inherently codec-library formats
(JPEG/MP3/MP4) remain explicit STUBS — clearly marked, swappable.  The
Ray-side plumbing is real and tested throughout: typed schema, actor-pool
stage signatures, batch sizing for large binary payloads, output layout.

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


# --------------------------------------------------------------------------
# REAL audio path: WAV/PCM16 (pure numpy)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 PCM → minimal RIFF/WAVE (PCM16 mono) bytes."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate).  Real decode:
    chunk walk + one ``np.frombuffer`` (compressed codecs stay stubbed)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, bits, channels = 12, None, None, None
    while i + 8 <= len(payload):
        cid, size = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", payload[i + 8 : i + 16])
            bits = struct.unpack("<H", payload[i + 22 : i + 24])[0]
            if fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(payload, np.int16, count=size // 2, offset=i + 8), rate
        i += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """RMS, zero-crossing rate, spectral centroid + log-spaced FFT band
    energies — the classic cheap audio embedding, all numpy."""
    x = samples.astype(np.float32) / 32768.0
    n = max(len(x), 1)
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1, np.float32)
    freqs = np.fft.rfftfreq(n, d=1.0 / max(rate, 1))
    total = spec.sum()
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    edges = np.linspace(0, len(spec), n_bands + 1, dtype=np.int64)
    bands = np.array(
        [spec[edges[k]: edges[k + 1]].sum() for k in range(n_bands)], np.float32
    )
    bands = bands / total if total > 0 else bands
    return np.concatenate([[rms, zcr, centroid], bands]).astype(np.float32)


class WavAudioStage:
    """REAL actor-pool audio stage: WAV decode → feature vector per clip."""

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, rates, n_samples = [], [], []
        for p in batch.column("payload").to_pylist():
            samples, rate = decode_wav(p)
            rates.append(rate)
            n_samples.append(len(samples))
            feats.append(audio_features(samples, rate, self.n_bands))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(n_samples, pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def synth_wav_table(n: int = 32, seed: int = 9, rate: int = 8000,
                    dur_s: float = 0.25) -> pa.Table:
    """Deterministic real WAV clips (per-clip tone + noise)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * dur_s)) / rate
    rows = []
    for i in range(n):
        f0 = 200.0 + 40.0 * (i % 11)
        x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
        samples = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        rows.append(
            {
                "media_id": i,
                "media_type": "audio/wav",
                "payload": encode_wav(samples, rate),
                "width": 0,
                "height": 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# REAL video path: raw RGB frame stacks (pure numpy)
# --------------------------------------------------------------------------


def encode_rawvideo(frames: np.ndarray) -> bytes:
    """(T, H, W, 3) uint8 → header + raw bytes ('video/x-raw-rgb')."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_rawvideo expects (T, H, W, 3) uint8")
    t, h, w = frames.shape[:3]
    return b"RAWV%d %d %d\n" % (t, h, w) + frames.tobytes()


def decode_rawvideo(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"RAWV"):
        raise ValueError("not a RAWV payload")
    nl = payload.index(b"\n")
    t, h, w = (int(x) for x in payload[4:nl].split())
    return np.frombuffer(
        payload, np.uint8, count=t * h * w * 3, offset=nl + 1
    ).reshape(t, h, w, 3)


class RawVideoFrameStage:
    """REAL frame sampler: uniform-stride frames from a raw RGB stack, one
    image-feature row per sampled frame (explodes 1 clip → n_frames rows)."""

    def __init__(self, n_frames: int = 4, out_h: int = 16, out_w: int = 16):
        self.n_frames, self.out_h, self.out_w = n_frames, out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, feats = [], [], []
        for mid, p in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            frames = decode_rawvideo(p)
            take = np.linspace(0, len(frames) - 1, self.n_frames).astype(np.int64)
            for k, fi in enumerate(take):
                ids.append(mid)
                frame_no.append(k)
                small = resize_nearest(frames[fi], self.out_h, self.out_w)
                feats.append(image_features(small))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def synth_rawvideo_table(n: int = 8, seed: int = 13, t: int = 12,
                         h: int = 12, w: int = 16) -> pa.Table:
    """Deterministic raw clips (moving gradient per frame)."""
    rows = []
    for i in range(n):
        base = np.linspace(0, 255, w, dtype=np.float32)
        frames = np.empty((t, h, w, 3), np.uint8)
        for fi in range(t):
            shifted = np.roll(base, fi * (i + 1))
            frames[fi] = np.clip(
                shifted[None, :, None] + np.array([0.0, 10.0 * i, 20.0])[None, None, :],
                0, 255,
            ).astype(np.uint8)
        rows.append(
            {
                "media_id": i,
                "media_type": "video/x-raw-rgb",
                "payload": encode_rawvideo(frames),
                "width": w,
                "height": h,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# REAL PNG path: stdlib zlib + numpy (no image library)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per color type (8-bit depth only): gray, RGB, gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C∈{1,2,3,4}) uint8 → PNG bytes (8-bit, zlib).

    Pure stdlib+numpy (VERDICT r2 next-round #3).  ``filter_type`` 0–4
    applies that PNG filter to EVERY scanline (filtering on encode uses
    the original bytes, so all five vectorize); decode reconstructs any
    mix of per-row filters, so round-trip tests cover the whole grid.
    """
    import struct
    import zlib

    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png expects (H, W[, C<=4]) uint8")
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    prev = np.zeros(w * c, np.uint8)
    lines = []
    for r in range(h):
        row = flat[r]
        left = np.concatenate([np.zeros(c, np.uint8), row[:-c]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:
            out = row - left
        elif filter_type == 2:
            out = row - prev
        elif filter_type == 3:
            out = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        elif filter_type == 4:
            upleft = np.concatenate([np.zeros(c, np.uint8), prev[:-c]])
            out = row - _paeth_predictor(left, prev, upleft)
        else:
            raise ValueError("filter_type must be 0..4")
        lines.append(bytes([filter_type]) + out.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over uint8 arrays (spec arithmetic in int16)."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa_, pb_, pc_ = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where(
        (pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c)
    ).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8.  Real decode, stdlib ``zlib`` + numpy only.

    Supports 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA) and 3 (palette via PLTE/tRNS), no interlace — the overwhelming
    majority of real-world PNGs.  Un-filtering: None/Up fully vectorized;
    Sub via per-byte-lane cumulative sums (mod-256); Average/Paeth loop
    scanline pixels with vectorized channel lanes (their spec recurrence
    is inherently sequential in the reconstructed left neighbour).
    """
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i, w = len(_PNG_SIG), None
    idat, plte, trns = [], None, None
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated IHDR")
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8:
                raise ValueError("only 8-bit PNG supported")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if color_type not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    c = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    try:
        inflated = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    raw = np.frombuffer(inflated, np.uint8)
    stride = 1 + w * c
    if len(raw) != h * stride:
        raise ValueError("IDAT size mismatch")
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    data = raw[:, 1:]
    out = np.empty((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.uint8)
    for r in range(h):
        f, row = int(filters[r]), data[r]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: per-lane cumsum mod 256
            rec = (
                np.cumsum(row.reshape(w, c).astype(np.uint64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(w * c)
        elif f == 2:  # Up
            rec = row + prev
        elif f == 3:  # Average: sequential in reconstructed left
            rec = np.empty(w * c, np.uint8)
            px = row.reshape(w, c)
            pv = prev.reshape(w, c)
            left = np.zeros(c, np.uint16)
            rp = rec.reshape(w, c)
            for x in range(w):
                left = px[x] + ((left + pv[x]) // 2).astype(np.uint8)
                rp[x] = left
                left = left.astype(np.uint16)
        elif f == 4:  # Paeth
            rec = np.empty(w * c, np.uint8)
            px = row.reshape(w, c)
            pv = prev.reshape(w, c)
            rp = rec.reshape(w, c)
            left = np.zeros(c, np.uint8)
            upleft = np.zeros(c, np.uint8)
            for x in range(w):
                left = px[x] + _paeth_predictor(left, pv[x], upleft)
                rp[x] = left
                upleft = pv[x]
            rec = rp.reshape(w * c)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[r] = rec
        prev = rec
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = out.reshape(h, w)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    return out.reshape(h, w, c)


class PNGImageStage:
    """REAL actor-pool image stage for PNG: stdlib-zlib decode → nearest
    resize → feature vector.  Same shape as :class:`PPMImageStage`; gray /
    alpha inputs are expanded to RGB before features so the output schema
    is uniform."""

    def __init__(self, out_h: int = 32, out_w: int = 32, hist_bins: int = 8):
        self.out_h, self.out_w, self.hist_bins = out_h, out_w, hist_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, heights, widths = [], [], []
        for p in batch.column("payload").to_pylist():
            img = decode_png(p)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            elif img.shape[2] == 2:  # gray+alpha → gray RGB
                img = np.repeat(img[:, :, :1], 3, axis=2)
            elif img.shape[2] == 4:
                img = img[:, :, :3]
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


def synth_png_table(n: int = 32, seed: int = 11, h: int = 24, w: int = 32) -> pa.Table:
    """Deterministic real PNG images cycling all five filters and three
    color layouts (RGB / gray / RGBA) — the decode-grid fixture."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        tint = rng.integers(0, 80, size=3).astype(np.float32)
        img = np.clip(base + tint[None, None, :], 0, 255).astype(np.uint8)
        img = np.repeat(img, h, axis=0)
        img[(i * 3) % h, :, :] = rng.integers(0, 255, size=(w, 3), dtype=np.uint8)
        kind = i % 3
        if kind == 1:
            img = img[:, :, :1]
        elif kind == 2:
            img = np.concatenate(
                [img, np.full((h, w, 1), 200 + (i % 50), np.uint8)], axis=2
            )
        rows.append(
            {
                "media_id": i,
                "media_type": "image/png",
                "payload": encode_png(img, filter_type=i % 5),
                "width": w,
                "height": h,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
