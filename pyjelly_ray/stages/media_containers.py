"""Real container/codec paths for the media formats (no external
libraries).  Images: GIF (full LZW codec, interlace, transparency,
palette), BMP (8/24/32-bit), TIFF 6.0 (none/PackBits/LZW with the spec's
early-change rule, horizontal-differencing predictor, strips, both byte
orders, gray/WhiteIsZero/RGB(A)/palette, multi-page IFD chains), QOI
(spec-complete), TGA (raw + RLE), ICO (PNG + classic DIB entries), DDS
with REAL S3TC block decompression (BC1/BC2/BC3), netpbm P1–P6.  Audio:
G.711 μ-law/A-law companded codecs, AIFF, Sun AU, MP3 metadata (ID3v2
tags + frame-header walk, Xing/Info VBR → duration/bitrate) and a
sniffing ``AudioDecodeStage`` spanning WAV/FLAC/AIFF/AU.  Containers:
MP4/ISO-BMFF (generic box parser, full sample-table demux —
stts/stsc/stsz/stco/co64 — REAL frame decode for uncompressed ``raw ``
tracks), Matroska/WebM (EBML element tree, track metadata, SimpleBlock
extraction; V_UNCOMPRESSED decodes), Ogg (CRC32 pages, lacing/packet
reassembly, Vorbis/Opus id headers), AVI (RIFF demux; BI_RGB streams
decode), WebP (RIFF + VP8/VP8L/VP8X header metadata; **lossless VP8L
pixel data decodes for real** — full spec in ``stages/vp8l.py``).

This narrows the honest stub boundary of ``stages/multimodal.py`` to
exactly the perceptual A/V *bitstreams* (H.264/HEVC/VP8/VP9/AV1 video,
MPEG Layer III / Vorbis / Opus audio, lossy-WebP pixels) — every stub
validates its container for real before refusing.  The reference
(pyjelly) has no multimodal support at all; these are engine extensions
for training-data pipelines.

Scale posture: all of these run per-payload inside actor-pool
``map_batches`` stages (see ``multimodal.RECOMMENDED_BATCH_SIZE``); the
per-pixel Python loops live only inside the entropy codecs (LZW), exactly
like the JPEG huffman codec — bounded by payload size, never by corpus size.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from pyjelly_ray.stages import cmedia

# ==========================================================================
# GIF — full LZW encoder/decoder (GIF87a/89a, interlace, transparency)
# ==========================================================================

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    """Row order in which an interlaced GIF stores image rows."""
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return np.asarray(order, dtype=np.int64)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index stream of length ``expect``."""
    fast = cmedia.lzw_decode_gif(data, min_code_size, expect)
    if fast is not None:
        return fast
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0

    # dictionary as parent-pointer table: prefix[code], suffix[code]
    max_codes = 4096
    prefix = np.full(max_codes, -1, dtype=np.int32)
    suffix = np.zeros(max_codes, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = end + 1
    code_size = min_code_size + 1

    buf = 0
    nbits = 0
    pos = 0
    prev = -1
    stack = bytearray()
    data_len = len(data)
    while n_out < expect:
        while nbits < code_size:
            if pos >= data_len:
                raise ValueError("GIF: LZW stream truncated")
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size

        if code == clear:
            next_code = end + 1
            code_size = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if code >= next_code + 1 or (code == next_code and prev < 0):
            raise ValueError("GIF: LZW code out of range")

        # expand code (KwKwK case: code == next_code)
        stack.clear()
        c = code
        if code == next_code:
            # first char of prev string repeated
            c = prev
            stack.append(0)  # placeholder, fixed below
        while c >= clear:
            stack.append(suffix[c])
            c = prefix[c]
        first = c  # root symbol
        stack.append(first)
        if code == next_code:
            stack[0] = first
        # emit reversed
        ln = len(stack)
        if n_out + ln > expect:
            ln = expect - n_out
        for i in range(ln):
            out[n_out + i] = stack[len(stack) - 1 - i]
        n_out += ln

        if prev >= 0 and next_code < max_codes:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    if n_out != expect:
        raise ValueError("GIF: LZW stream ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index stream → GIF-variant LZW bytes (with clear/end codes)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    code_size = min_code_size + 1

    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    it = iter(indices.tolist())
    try:
        prev = next(it)
    except StopIteration:
        emit(end)
        if nbits:
            out.append(buf & 0xFF)
        return bytes(out)
    cur = prev  # current dictionary code (roots are their own codes)
    for sym in it:
        key = (cur, sym)
        hit = table.get(key)
        if hit is not None:
            cur = hit
            continue
        emit(cur)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table.clear()
            next_code = end + 1
            code_size = min_code_size + 1
        cur = sym
    emit(cur)
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap bytes into GIF 255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    img: np.ndarray,
    *,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a.  The image must use ≤256
    distinct colors (GIF is palette-indexed; no quantizer here — synth/test
    images and re-encoded palette sources satisfy this by construction)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        if not (palette == tc).all(axis=1).any():
            palette = np.vstack([palette, tc])
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} colors > 256 (needs quantization)")
    bits = max(int(np.ceil(np.log2(max(len(palette), 2)))), 1)
    table_size = 1 << bits
    pal_full = np.zeros((table_size, 3), dtype=np.uint8)
    pal_full[: len(palette)] = palette

    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_deinterlace_rows(h)]

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, color resolution, size
    flags = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    out += pal_full.tobytes()
    if transparent_color is not None:
        tidx = int(np.nonzero((palette == np.asarray(transparent_color, np.uint8)).all(axis=1))[0][0])
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, tidx, 0])  # GCE: transparency on
    # image descriptor (no local color table)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    min_code = max(bits, 2)
    out.append(min_code)
    out += _sub_blocks(_lzw_encode(indices.ravel(), min_code))
    out.append(0x3B)  # trailer
    return bytes(out)


@dataclass
class GifFrame:
    """One decoded GIF frame: RGB(A) pixels + timing."""

    pixels: np.ndarray  # (H, W, 3) or (H, W, 4) uint8
    delay_cs: int = 0  # centiseconds


def decode_gif(payload: bytes, *, all_frames: bool = False):
    """GIF87a/89a → uint8 array (first frame) or list[GifFrame].

    Handles global/local color tables, interlacing, transparency (returns
    RGBA when the frame declares a transparent index) and multi-frame
    animations.  Malformed inputs raise ``ValueError``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("GIF: truncated global color table")
        global_pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    frames: list[GifFrame] = []
    transparent: int | None = None
    delay_cs = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                if pos + 6 > len(payload) or payload[pos] != 4:
                    raise ValueError("GIF: bad graphic control extension")
                gflags, delay_cs, tidx = struct.unpack_from("<xBHB", payload, pos)
                transparent = tidx if (gflags & 0x01) else None
                pos += 6  # size byte + 4 body + terminator
                if payload[pos - 1] != 0:
                    raise ValueError("GIF: unterminated graphic control extension")
            else:  # skip sub-blocks of any other extension
                while True:
                    if pos >= len(payload):
                        raise ValueError("GIF: truncated extension blocks")
                    n = payload[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF: truncated image descriptor")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("GIF: truncated local color table")
            pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table for image")
        if pos >= len(payload):
            raise ValueError("GIF: truncated image data")
        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError("GIF: bad LZW minimum code size")
        lzw = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF: truncated image sub-blocks")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            lzw += payload[pos : pos + n]
            pos += n
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows were stored in pass order
            rows = _deinterlace_rows(ih)
            out_idx = np.empty_like(idx)
            out_idx[rows] = idx
            idx = out_idx
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        rgb = pal[idx]
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            rgb = np.dstack([rgb, alpha])
        # place into logical screen if offset/size differ (common: full frame)
        if (left, top, iw, ih) != (0, 0, sw, sh):
            ch = rgb.shape[2]
            canvas = np.zeros((sh, sw, ch), dtype=np.uint8)
            canvas[top : top + ih, left : left + iw] = rgb
            rgb = canvas
        frames.append(GifFrame(rgb, delay_cs))
        transparent = None
        if not all_frames:
            break
    if not frames:
        raise ValueError("GIF: no image data")
    return frames if all_frames else frames[0].pixels


# ==========================================================================
# BMP — 24-bit BI_RGB and 8-bit palette, bottom-up and top-down
# ==========================================================================


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → 24-bit uncompressed BMP (bottom-up, BGR)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = img[::-1, :, ::-1].reshape(h, -1)  # bottom-up, BGR
    pixel_data = padded.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8.  Supports 24-bit BI_RGB and 8-bit palette,
    bottom-up (positive height) and top-down (negative height)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError("BMP: unsupported header version")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if planes != 1 or compression != 0:
        raise ValueError("BMP: only uncompressed BI_RGB supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("BMP: bad dimensions")
    if bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        need = data_off + row_bytes * h
        if len(payload) < need:
            raise ValueError("BMP: truncated pixel data")
        rows = np.frombuffer(payload, np.uint8, row_bytes * h, data_off)
        img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:  # BI_RGB 32-bit: BGRx, 4th byte is padding by convention
        need = data_off + 4 * w * h
        if len(payload) < need:
            raise ValueError("BMP: truncated pixel data")
        rows = np.frombuffer(payload, np.uint8, 4 * w * h, data_off)
        img = rows.reshape(h, w, 4)[:, :, 2::-1]
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        if len(payload) < pal_off + 4 * n_colors:
            raise ValueError("BMP: truncated palette")
        pal = np.frombuffer(payload, np.uint8, 4 * n_colors, pal_off).reshape(-1, 4)[:, 2::-1]
        row_bytes = (w + 3) & ~3
        if len(payload) < data_off + row_bytes * h:
            raise ValueError("BMP: truncated pixel data")
        idx = np.frombuffer(payload, np.uint8, row_bytes * h, data_off)
        idx = idx.reshape(h, row_bytes)[:, :w]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP: palette index out of range")
        img = pal[idx]
    else:
        raise ValueError(f"BMP: {bpp}-bit not supported (32/24/8 only)")
    return np.ascontiguousarray(img if top_down else img[::-1])


# ==========================================================================
# MP4 / ISO-BMFF — generic box parser + full sample-table demux
# ==========================================================================

_MP4_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta",
    b"mvex", b"moof", b"traf",
}


@dataclass
class Mp4Box:
    """One parsed ISO-BMFF box: type, absolute payload span, children."""

    type: bytes
    start: int  # absolute offset of payload
    size: int  # payload size
    children: list["Mp4Box"] = field(default_factory=list)

    def find(self, *path: bytes) -> "Mp4Box | None":
        node = self
        for t in path:
            node = next((c for c in node.children if c.type == t), None)
            if node is None:
                return None
        return node

    def find_all(self, t: bytes) -> list["Mp4Box"]:
        return [c for c in self.children if c.type == t]


def parse_mp4_boxes(payload: bytes, start: int = 0, end: int | None = None) -> list[Mp4Box]:
    """Parse the box tree of an ISO-BMFF file (handles 64-bit largesize and
    size-0 = to-end-of-file boxes).  Malformed sizes raise ``ValueError``."""
    if end is None:
        end = len(payload)
    boxes = []
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("MP4: truncated box header")
        size, btype = struct.unpack_from(">I4s", payload, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4: bad box size for {btype!r}")
        box = Mp4Box(btype, pos + hdr, size - hdr)
        if btype in _MP4_CONTAINERS:
            box.children = parse_mp4_boxes(payload, box.start, box.start + box.size)
        boxes.append(box)
        pos += size
    return boxes


@dataclass
class Mp4Track:
    """Demuxed track: codec identity + resolved per-sample byte ranges."""

    track_id: int
    handler: str  # "vide" / "soun" / ...
    codec: str  # stsd entry fourcc, e.g. "raw ", "avc1", "mp4a"
    timescale: int
    duration: int
    width: int = 0
    height: int = 0
    sample_offsets: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    sample_sizes: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    sample_times: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    def sample(self, payload: bytes, i: int) -> bytes:
        o, s = int(self.sample_offsets[i]), int(self.sample_sizes[i])
        return payload[o : o + s]


def _full_box(payload: bytes, box: Mp4Box) -> int:
    """Return payload offset past the version/flags word of a full box."""
    if box.size < 4:
        raise ValueError(f"MP4: truncated full box {box.type!r}")
    return box.start + 4


def demux_mp4(payload: bytes) -> list[Mp4Track]:
    """ISO-BMFF → tracks with fully resolved sample tables.

    Resolves stts (decode times), stsz/stz2 (sizes), stsc×stco/co64
    (chunk → absolute offsets) exactly as §8.5–8.7 of ISO 14496-12
    specifies.  Returns every track; the caller dispatches on ``codec``
    (compressed bitstreams are the stub boundary, the demux is real)."""
    root = Mp4Box(b"", 0, len(payload), parse_mp4_boxes(payload))
    moov = root.find(b"moov")
    if moov is None:
        raise ValueError("MP4: no moov box")
    tracks = []
    for trak in moov.find_all(b"trak"):
        tkhd = trak.find(b"tkhd")
        mdia = trak.find(b"mdia")
        if tkhd is None or mdia is None:
            raise ValueError("MP4: trak missing tkhd/mdia")
        ver = payload[tkhd.start]
        # tkhd: track_id after creation/modification times (ver-dependent)
        tid_off = tkhd.start + 4 + (16 if ver == 1 else 8)
        track_id = struct.unpack_from(">I", payload, tid_off)[0]
        # width/height: last 8 bytes, 16.16 fixed
        wh_off = tkhd.start + tkhd.size - 8
        w16, h16 = struct.unpack_from(">II", payload, wh_off)
        mdhd = mdia.find(b"mdhd")
        hdlr = mdia.find(b"hdlr")
        stbl = mdia.find(b"minf", b"stbl")
        if mdhd is None or hdlr is None or stbl is None:
            raise ValueError("MP4: mdia missing mdhd/hdlr/stbl")
        mver = payload[mdhd.start]
        if mver == 1:
            timescale, duration = struct.unpack_from(">IQ", payload, mdhd.start + 4 + 16)
        else:
            timescale, duration = struct.unpack_from(">II", payload, mdhd.start + 4 + 8)
        handler = payload[hdlr.start + 8 : hdlr.start + 12].decode("latin1")

        stsd = stbl.find(b"stsd")
        if stsd is None or stsd.size < 16:
            raise ValueError("MP4: missing stsd")
        # first sample entry: size(4) fourcc(4) at stsd.start+8
        codec = payload[stsd.start + 12 : stsd.start + 16].decode("latin1")

        def _counts(box_name: bytes, entry_bytes: int) -> tuple[int, int]:
            box = stbl.find(box_name)
            if box is None:
                raise ValueError(f"MP4: missing {box_name!r}")
            off = _full_box(payload, box)
            n = struct.unpack_from(">I", payload, off)[0]
            if box.size < 8 + n * entry_bytes:
                raise ValueError(f"MP4: truncated {box_name!r}")
            return off + 4, n

        # stts → per-sample decode times
        off, n = _counts(b"stts", 8)
        stts = np.frombuffer(payload, ">u4", n * 2, off).reshape(-1, 2).astype(np.int64)
        counts, deltas = stts[:, 0], stts[:, 1]
        n_samples_t = int(counts.sum())
        per_sample_delta = np.repeat(deltas, counts)
        sample_times = np.concatenate([[0], np.cumsum(per_sample_delta)[:-1]])

        # stsz → sizes
        stsz = stbl.find(b"stsz")
        if stsz is None:
            raise ValueError("MP4: missing stsz")
        soff = _full_box(payload, stsz)
        uniform, cnt = struct.unpack_from(">II", payload, soff)
        if uniform:
            sizes = np.full(cnt, uniform, dtype=np.int64)
        else:
            if stsz.size < 12 + cnt * 4:
                raise ValueError("MP4: truncated stsz")
            sizes = np.frombuffer(payload, ">u4", cnt, soff + 8).astype(np.int64)
        if cnt != n_samples_t:
            raise ValueError("MP4: stsz/stts sample count mismatch")

        # stco / co64 → chunk offsets
        co = stbl.find(b"stco")
        if co is not None:
            off, n = _counts(b"stco", 4)
            chunk_offsets = np.frombuffer(payload, ">u4", n, off).astype(np.int64)
        else:
            off, n = _counts(b"co64", 8)
            chunk_offsets = np.frombuffer(payload, ">u8", n, off).astype(np.int64)

        # stsc → samples per chunk runs
        off, n = _counts(b"stsc", 12)
        stsc = np.frombuffer(payload, ">u4", n * 3, off).reshape(-1, 3).astype(np.int64)
        # expand runs over the real chunk list
        n_chunks = len(chunk_offsets)
        samples_per_chunk = np.zeros(n_chunks, dtype=np.int64)
        for i in range(len(stsc)):
            first = stsc[i, 0] - 1
            last = stsc[i + 1, 0] - 1 if i + 1 < len(stsc) else n_chunks
            if first < 0 or first > n_chunks:
                raise ValueError("MP4: bad stsc first_chunk")
            samples_per_chunk[first:last] = stsc[i, 1]
        if int(samples_per_chunk.sum()) != cnt:
            raise ValueError("MP4: stsc does not cover all samples")

        # absolute per-sample offsets: chunk base + cumulative sizes in chunk
        if cnt == 0:
            offsets = np.zeros(0, dtype=np.int64)
        else:
            chunk_id = np.repeat(np.arange(n_chunks), samples_per_chunk)
            base = chunk_offsets[chunk_id]
            within = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            chunk_start_cum = np.concatenate([[0], np.cumsum(samples_per_chunk)[:-1]])
            # empty trailing chunks never appear in chunk_id; clip their index
            chunk_start_cum = np.minimum(chunk_start_cum, cnt - 1)
            within = within - within[chunk_start_cum][chunk_id]
            offsets = base + within
        if len(offsets) and int((offsets + sizes).max()) > len(payload):
            raise ValueError("MP4: sample extends past end of file")

        tracks.append(
            Mp4Track(
                track_id=track_id,
                handler=handler,
                codec=codec,
                timescale=timescale,
                duration=duration,
                width=w16 >> 16,
                height=h16 >> 16,
                sample_offsets=offsets,
                sample_sizes=sizes,
                sample_times=sample_times,
            )
        )
    if not tracks:
        raise ValueError("MP4: no tracks")
    return tracks


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def encode_mp4_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """(T, H, W, 3) uint8 → minimal ISO-BMFF MP4 with one uncompressed
    ``raw `` RGB24 video track (QuickTime uncompressed fourcc).  One sample
    per frame, one chunk for all samples."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mp4_rawvideo expects (T, H, W, 3) uint8")
    t, h, w = frames.shape[:3]
    frame_bytes = h * w * 3
    timescale = fps
    duration = t

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = frames.tobytes()
    # mdat starts right after ftyp; sample data begins at mdat payload
    mdat_data_off = len(ftyp) + 8

    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0)  # version/flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # version 0, flags: enabled|in-movie|in-preview
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">I", 0) + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language "und"
    )
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"raw video\x00")
    vmhd = _box(b"vmhd", struct.pack(">I", 1) + b"\x00" * 8)
    dref = _box(b"dref", struct.pack(">II", 0, 1) + _box(b"url ", struct.pack(">I", 1)))
    dinf = _box(b"dinf", dref)
    # visual sample entry, fourcc "raw " depth 24
    sample_entry = (
        struct.pack(">I4s", 86, b"raw ")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table id
    )
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = _box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", t, 1))
    stsc = _box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, t, 1))
    stsz = _box(b"stsz", struct.pack(">III", 0, frame_bytes, t))
    stco = _box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", mdat_data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def decode_mp4_video(payload: bytes) -> np.ndarray:
    """MP4 → (T, H, W, 3) uint8 for uncompressed ``raw `` RGB24 tracks.

    The demux (box tree + sample tables) is fully real for ANY MP4;
    compressed video bitstreams (avc1/hev1/vp09...) raise
    ``NotImplementedError`` at the codec step — the honest stub boundary."""
    tracks = demux_mp4(payload)
    video = [tr for tr in tracks if tr.handler == "vide"]
    if not video:
        raise ValueError("MP4: no video track")
    tr = video[0]
    if tr.codec != "raw ":
        raise NotImplementedError(
            f"MP4 video codec {tr.codec!r} needs a codec library; the "
            "container demux is real — 'raw ' RGB24 tracks decode natively"
        )
    h, w = tr.height, tr.width
    if h <= 0 or w <= 0:
        raise ValueError("MP4: raw track without dimensions")
    if not (tr.sample_sizes == h * w * 3).all():
        raise ValueError("MP4: raw sample size != W*H*3")
    frames = np.empty((tr.n_samples, h, w, 3), dtype=np.uint8)
    for i in range(tr.n_samples):
        frames[i] = np.frombuffer(tr.sample(payload, i), np.uint8).reshape(h, w, 3)
    return frames


# ==========================================================================
# MP3 — frame-header walk + ID3v2 + Xing/Info (metadata REAL, audio stub)
# ==========================================================================

_MP3_BITRATES = {
    # (version_group, layer) -> kbps table indexed by bitrate_index (1..14)
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


@dataclass
class Mp3Frame:
    """One parsed MPEG audio frame header."""

    offset: int
    version: str  # "1", "2", "2.5"
    layer: int  # 1..3
    bitrate_kbps: int
    sample_rate: int
    channels: int
    frame_bytes: int
    samples: int


def _parse_mp3_header(b: bytes, off: int) -> Mp3Frame | None:
    if off + 4 > len(b) or b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[off + 1] >> 3) & 0x03
    layer_bits = (b[off + 1] >> 1) & 0x03
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer = 4 - layer_bits
    br_idx = (b[off + 2] >> 4) & 0x0F
    sr_idx = (b[off + 2] >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if version == "1" else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    padding = (b[off + 2] >> 1) & 0x01
    mode = (b[off + 3] >> 6) & 0x03
    channels = 1 if mode == 3 else 2
    if layer == 1:
        frame_bytes = (12 * bitrate // rate + padding) * 4
        samples = 384
    elif layer == 2 or vgroup == 1:  # Layer II (all versions) / Layer III MPEG-1
        frame_bytes = 144 * bitrate // rate + padding
        samples = 1152
    else:  # Layer III MPEG-2/2.5
        frame_bytes = 72 * bitrate // rate + padding
        samples = 576
    return Mp3Frame(off, version, layer, bitrate // 1000, rate, channels, frame_bytes, samples)


def _id3v2_size(b: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    if b[3] == 0xFF or b[4] == 0xFF:
        raise ValueError("MP3: bad ID3v2 version")
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    if any(x & 0x80 for x in b[6:10]):
        raise ValueError("MP3: ID3v2 size not syncsafe")
    total = 10 + size + (10 if b[5] & 0x10 else 0)  # footer flag
    if total > len(b):
        raise ValueError("MP3: ID3v2 tag extends past file")
    return total


@dataclass
class Mp3Info:
    """Stream-level metadata from a real frame walk (no audio decode)."""

    version: str
    layer: int
    sample_rate: int
    channels: int
    n_frames: int
    duration_s: float
    bitrate_kbps: float  # mean over frames (CBR: the nominal rate)
    vbr: bool
    xing_frames: int | None = None


def mp3_info(payload: bytes, *, max_frames: int | None = None) -> Mp3Info:
    """Parse an MPEG audio stream's metadata FOR REAL: skip ID3v2, sync to
    the first valid frame header, then walk frame-to-frame by computed
    frame lengths (not blind resync), honoring a Xing/Info VBR header if
    present.  Audio sample decode (the Layer III bitstream) remains the
    honest stub — see :func:`decode_mp3`."""
    start = _id3v2_size(payload)
    # sync scan: a valid header whose computed next frame is also valid
    first = None
    for off in range(start, min(len(payload), start + 64 * 1024)):
        f = _parse_mp3_header(payload, off)
        if f is None or f.frame_bytes <= 4:
            continue
        nxt = off + f.frame_bytes
        if nxt >= len(payload) or _parse_mp3_header(payload, nxt) is not None:
            first = f
            break
    if first is None:
        raise ValueError("MP3: no valid frame sync found")

    # Xing/Info header inside the first frame (offset depends on version/mode)
    side_info = (
        (17 if first.channels == 1 else 32)
        if first.version == "1"
        else (9 if first.channels == 1 else 17)
    )
    xing_off = first.offset + 4 + side_info
    xing_frames = None
    if payload[xing_off : xing_off + 4] in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", payload, xing_off + 4)[0]
        if flags & 0x1:
            xing_frames = struct.unpack_from(">I", payload, xing_off + 8)[0]

    frames = []
    off = first.offset
    bitrates = set()
    while off + 4 <= len(payload):
        f = _parse_mp3_header(payload, off)
        if f is None:
            break  # trailing garbage / ID3v1 tag
        if f.frame_bytes <= 4 or off + f.frame_bytes > len(payload):
            break
        frames.append(f)
        bitrates.add(f.bitrate_kbps)
        off += f.frame_bytes
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("MP3: no complete frames")
    n = xing_frames if xing_frames is not None else len(frames)
    duration = n * frames[0].samples / frames[0].sample_rate
    mean_kbps = float(np.mean([f.bitrate_kbps for f in frames]))
    return Mp3Info(
        version=first.version,
        layer=first.layer,
        sample_rate=first.sample_rate,
        channels=first.channels,
        n_frames=n,
        duration_s=duration,
        bitrate_kbps=mean_kbps,
        vbr=len(bitrates) > 1 or xing_frames is not None,
        xing_frames=xing_frames,
    )


def decode_mp3(payload: bytes) -> np.ndarray:
    """STUB: MPEG Layer III audio decode needs a codec library (hybrid
    filterbank + huffman bitstream).  The container/metadata layer IS real —
    :func:`mp3_info` walks frames exactly.  Swap a real decoder in here."""
    mp3_info(payload)  # validates the stream for real before refusing
    raise NotImplementedError(
        "MPEG Layer III audio decode needs a codec library; frame metadata "
        "parses natively via mp3_info()"
    )


def synth_mp3_stream(
    n_frames: int = 8,
    *,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3: bool = False,
    xing: bool = False,
    seed: int = 21,
) -> bytes:
    """Deterministic, spec-valid MPEG-1 Layer III CBR frame stream (header
    bytes real, audio payload pseudorandom) for metadata-parser tests."""
    br_idx = _MP3_BITRATES[(1, 3)].index(bitrate_kbps) + 1
    sr_idx = _MP3_RATES[3].index(sample_rate)
    rng = np.random.default_rng(seed)
    out = bytearray()
    if id3:
        # real ID3v2.4 frames (syncsafe sizes, utf-8 text) + padding
        def frame(fid: bytes, text: str) -> bytes:
            data = b"\x03" + text.encode("utf-8")
            sz = len(data)
            return fid + bytes(
                [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
            ) + b"\x00\x00" + data

        body = frame(b"TIT2", "synthetic clip") + frame(b"TPE1", "pyjelly_ray") + b"\x00" * 16
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F, (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate  # no padding
    for i in range(n_frames):
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])  # stereo
        body = rng.integers(0, 256, frame_len - 4, dtype=np.uint8)
        # keep body from faking a sync word at frame starts we control
        body[body == 0xFF] = 0xFE
        frame = bytearray(hdr + body.tobytes())
        if i == 0 and xing:
            xoff = 4 + 32  # MPEG-1 stereo side info
            frame[xoff : xoff + 4] = b"Xing"
            frame[xoff + 4 : xoff + 8] = struct.pack(">I", 0x1)
            frame[xoff + 8 : xoff + 12] = struct.pack(">I", n_frames)
        out += frame
    return bytes(out)


# ==========================================================================
# TIFF — baseline 8-bit gray/RGB/palette; none/PackBits/LZW compression,
# horizontal-differencing predictor, strips, both byte orders (TIFF 6.0)
# ==========================================================================

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    317: "predictor", 320: "colormap",
}
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (MSB-first, 9→12-bit codes, the spec's early-change
    rule: the decoder widens at table sizes 510/1022/2046)."""
    fast = cmedia.lzw_decode_tiff(data, expect)
    if fast is not None:
        return fast
    CLEAR, EOI = 256, 257
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(256):
        suffix[i] = i
    next_code, bits = 258, 9
    out = bytearray()
    buf = nbits = pos = 0
    prev = -1
    stack = bytearray()
    while len(out) < expect:
        while nbits < bits:
            if pos >= len(data):
                raise ValueError("TIFF: LZW stream truncated")
            buf = (buf << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (buf >> (nbits - bits)) & ((1 << bits) - 1)
        nbits -= bits
        buf &= (1 << nbits) - 1  # keep the bit buffer bounded
        if code == EOI:
            break
        if code == CLEAR:
            next_code, bits, prev = 258, 9, -1
            continue
        if code > next_code or (code == next_code and prev < 0):
            raise ValueError("TIFF: LZW code out of range")
        stack.clear()
        c = code
        if code == next_code:
            c = prev
            stack.append(0)  # placeholder for KwKwK first char
        while c >= 258:
            stack.append(suffix[c])
            c = prefix[c]
        first = c if c < 256 else 0
        if c >= 256:
            raise ValueError("TIFF: LZW chain corrupt")
        stack.append(first)
        if code == next_code:
            stack[0] = first
        out += stack[::-1]
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code in (510, 1022, 2046):
                bits += 1
        prev = code
    if len(out) < expect:
        raise ValueError("TIFF: LZW output short")
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW writer (early change at 511/1023/2047, clear at
    4094 per the TIFF 6.0 spec)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
        buf &= (1 << nbits) - 1  # keep the bit buffer bounded

    table: dict[tuple[int, int], int] = {}
    next_code, bits = 258, 9
    emit(CLEAR, bits)
    prev = -1
    for byte in data:
        if prev < 0:
            prev = byte
            continue
        hit = table.get((prev, byte))
        if hit is not None:
            prev = hit
            continue
        emit(prev, bits)
        table[(prev, byte)] = next_code
        next_code += 1
        if next_code in (511, 1023, 2047):
            bits += 1
        elif next_code == 4094:  # spec: clear at 4094 to leave room for EOI
            emit(CLEAR, bits)
            table.clear()
            next_code, bits = 258, 9
        prev = byte
    if prev >= 0:
        emit(prev, bits)
    emit(EOI, bits)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("TIFF: PackBits stream truncated")
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            if i + n + 1 > len(data):
                raise ValueError("TIFF: PackBits literal truncated")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("TIFF: PackBits repeat truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
        else:  # literal run until next 3-byte repeat
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _tiff_byte_order(payload: bytes) -> str:
    if payload[:4] == b"II*\x00":
        return "<"
    if payload[:4] == b"MM\x00*":
        return ">"
    raise ValueError("not a TIFF (bad byte-order mark)")


def _tiff_ifd_chain(payload: bytes, bo: str) -> list[int]:
    """Walk the IFD chain (multi-page TIFF) → list of IFD offsets."""
    if len(payload) < 8:
        raise ValueError("TIFF: truncated header")
    offsets, seen = [], set()
    off = struct.unpack_from(bo + "I", payload, 4)[0]
    while off:
        if off in seen or len(offsets) > 10000:
            raise ValueError("TIFF: IFD chain cycle")
        if off + 2 > len(payload):
            raise ValueError("TIFF: IFD offset out of range")
        n = struct.unpack_from(bo + "H", payload, off)[0]
        if off + 2 + 12 * n + 4 > len(payload):
            raise ValueError("TIFF: truncated IFD")
        seen.add(off)
        offsets.append(off)
        off = struct.unpack_from(bo + "I", payload, off + 2 + 12 * n)[0]
    if not offsets:
        raise ValueError("TIFF: empty IFD chain")
    return offsets


def tiff_pages(payload: bytes) -> int:
    """Number of pages (IFDs) in a TIFF — real chain walk."""
    bo = _tiff_byte_order(payload)
    return len(_tiff_ifd_chain(payload, bo))


def decode_tiff_multipage(payload: bytes) -> list[np.ndarray]:
    """Multi-page TIFF → one decoded array per page (scanned documents)."""
    return [decode_tiff(payload, page=i) for i in range(tiff_pages(payload))]


def decode_tiff(payload: bytes, page: int = 0) -> np.ndarray:
    """TIFF 6.0 baseline → uint8 (H, W, C).  Real decode: both byte orders,
    strip assembly, compression 1 (none) / 5 (LZW, early-change) / 32773
    (PackBits), horizontal-differencing predictor, photometric gray
    (incl. WhiteIsZero inversion), RGB(A) and palette (ColorMap); ``page``
    selects an IFD from the chain (multi-page/scanned-document TIFFs)."""
    bo = _tiff_byte_order(payload)
    chain = _tiff_ifd_chain(payload, bo)
    if not 0 <= page < len(chain):
        raise ValueError(f"TIFF: page {page} out of range ({len(chain)} pages)")
    ifd_off = chain[page]
    n_entries = struct.unpack_from(bo + "H", payload, ifd_off)[0]

    tags: dict[str, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, off)
        name = _TIFF_TAGS.get(tag)
        if name is None:
            continue
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            raise ValueError(f"TIFF: bad field type {typ}")
        total = size * count
        voff = off + 8 if total <= 4 else struct.unpack_from(bo + "I", payload, off + 8)[0]
        if voff + total > len(payload):
            raise ValueError("TIFF: tag value out of range")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            raise ValueError(f"TIFF: unsupported field type {typ} for tag {tag}")
        tags[name] = list(struct.unpack_from(bo + fmt * count, payload, voff))

    def one(name: str, default: int | None = None) -> int:
        if name in tags:
            return tags[name][0]
        if default is None:
            raise ValueError(f"TIFF: missing required tag {name}")
        return default

    w, h = one("width"), one("height")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("TIFF: bad dimensions")
    spp = one("spp", 1)
    bits = tags.get("bits", [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8 bits per sample supported")
    if one("planar", 1) != 1:
        raise ValueError("TIFF: only chunky planar configuration supported")
    comp = one("compression", 1)
    photometric = one("photometric", 1)
    predictor = one("predictor", 1)
    rps = one("rows_per_strip", h)
    offsets = tags.get("strip_offsets")
    counts = tags.get("strip_counts")
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: bad strip tables")

    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(payload):
            raise ValueError("TIFF: strip out of range")
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            raise ValueError("TIFF: too many strips")
        expect = nrows * row_bytes
        strip = payload[o : o + c]
        if comp == 1:
            if len(strip) < expect:
                raise ValueError("TIFF: uncompressed strip short")
            data = strip[:expect]
        elif comp == 5:
            data = _tiff_lzw_decode(strip, expect)
        elif comp == 32773:
            data = _packbits_decode(strip, expect)
        else:
            raise ValueError(f"TIFF: unsupported compression {comp}")
        raw += data
    img = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"TIFF: unsupported predictor {predictor}")

    if photometric == 3:  # palette
        cmap = tags.get("colormap")
        if spp != 1 or not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF: bad palette image")
        lut = (np.asarray(cmap, np.uint16).reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[img[:, :, 0]]
    if photometric == 0:  # WhiteIsZero
        if spp != 1:
            raise ValueError("TIFF: WhiteIsZero needs 1 sample/pixel")
        return (255 - img).astype(np.uint8)
    if photometric == 1:
        return np.ascontiguousarray(img)
    if photometric == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB needs >=3 samples/pixel")
        return np.ascontiguousarray(img)
    raise ValueError(f"TIFF: unsupported photometric {photometric}")


def encode_tiff(
    img: np.ndarray,
    *,
    compression: str = "none",  # none | packbits | lzw
    predictor: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    _base: int = 0,
    _next_ifd: int = 0,
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3|4) → TIFF 6.0 bytes.  ``_base`` /
    ``_next_ifd`` are internal hooks for the multi-page writer (byte offset
    of this page's data area and the absolute offset of the next IFD)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError("encode_tiff expects (H,W), (H,W,3) or (H,W,4)")
    h, w, spp = img.shape
    bo = ">" if big_endian else "<"
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    rps = rows_per_strip or h
    if predictor and compression == "none":
        raise ValueError("predictor only applies to compressed data")

    data = img
    if predictor:
        d = data.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype(np.uint8)

    strips = []
    for r0 in range(0, h, rps):
        chunk = data[r0 : r0 + rps].tobytes()
        if comp_code == 1:
            strips.append(chunk)
        elif comp_code == 5:
            strips.append(_tiff_lzw_encode(chunk))
        else:
            strips.append(_packbits_encode(chunk))

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, count, packed

    def entry(tag: int, typ: int, values: list[int]) -> None:
        fmt = {3: "H", 4: "I"}[typ]
        entries.append((tag, typ, len(values), struct.pack(bo + fmt * len(values), *values)))

    # layout: header(8) | strips | bits array | strip tables | IFD
    pos = 8 + _base
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()

    def extra_block(packed: bytes) -> int:
        nonlocal pos
        off = pos
        extra.extend(packed)
        pos += len(packed)
        return off

    entry(256, 4, [w])
    entry(257, 4, [h])
    bits_packed = struct.pack(bo + "H" * spp, *([8] * spp))
    if spp * 2 <= 4:
        entries.append((258, 3, spp, bits_packed))
    else:
        entries.append((258, 3, spp, struct.pack(bo + "I", extra_block(bits_packed))))
    entry(259, 3, [comp_code])
    entry(262, 3, [1 if spp == 1 else 2])
    so_packed = struct.pack(bo + "I" * len(strips), *strip_offsets)
    if len(strips) == 1:
        entries.append((273, 4, 1, so_packed))
    else:
        entries.append((273, 4, len(strips), struct.pack(bo + "I", extra_block(so_packed))))
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    sc_packed = struct.pack(bo + "I" * len(strips), *(len(s) for s in strips))
    if len(strips) == 1:
        entries.append((279, 4, 1, sc_packed))
    else:
        entries.append((279, 4, len(strips), struct.pack(bo + "I", extra_block(sc_packed))))
    entry(284, 3, [1])
    if predictor:
        entry(317, 3, [2])

    entries.sort(key=lambda e: e[0])
    ifd_off = pos
    out = bytearray()
    if _base == 0:
        out += struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
    for s in strips:
        out += s
    out += extra
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, packed in entries:
        out += struct.pack(bo + "HHI", tag, typ, count)
        out += packed.ljust(4, b"\x00")[:4] if len(packed) <= 4 else packed[:4]
    out += struct.pack(bo + "I", _next_ifd)
    return bytes(out)


def encode_tiff_multipage(images: list, **kw) -> bytes:
    """List of images → one multi-page TIFF (chained IFDs)."""
    if not images:
        raise ValueError("encode_tiff_multipage needs at least one image")
    if kw.get("big_endian"):
        raise ValueError("multi-page writer emits little-endian only")
    # first pass: page sizes with next=0 (pointer is fixed 4 bytes, so
    # sizes are final); second pass: real next-IFD offsets
    sizes = []
    base = 0
    for img in images:
        page = encode_tiff(img, _base=base, _next_ifd=0, **kw)
        body_len = len(page) - (8 if base == 0 else 0)
        sizes.append(body_len)
        base += body_len
    out = bytearray()
    base = 0
    for i, img in enumerate(images):
        # this page ends at 8 + base + sizes[i]; its IFD tail carries the
        # next page's data start... next IFD offset = end of next page data
        next_off = 0
        if i + 1 < len(images):
            # next page's IFD sits at the END of the next page's bytes - 
            # recompute exactly: IFD offset = its `pos` after strips+extra.
            # Easiest exact route: rebuild the next page with _base set and
            # find its IFD offset as (total page end - ifd bytes). Instead we
            # patch: the next page starts at 8 + base + sizes[i]; rebuild it
            # to learn its internal ifd offset via a probe.
            probe = encode_tiff(images[i + 1], _base=base + sizes[i], _next_ifd=0, **kw)
            pb = probe[8:] if (base + sizes[i]) == 0 else probe
            # IFD offset = page start + (body length - ifd byte length)
            n_ent = None  # derived below from tail structure
            # the IFD is everything after strips+extra; its length =
            # 2 + 12*entries + 4. Recover entry count from the tail.
            # (little-endian fixed by construction)
            ifd_len_probe = None
            for guess in range(1, 32):
                cand = 2 + 12 * guess + 4
                if cand <= len(pb) and struct.unpack_from("<H", pb, len(pb) - cand)[0] == guess:
                    ifd_len_probe = cand
                    break
            if ifd_len_probe is None:
                raise ValueError("TIFF: could not locate next IFD")
            next_off = 8 + base + sizes[i] + (len(pb) - ifd_len_probe)
        page = encode_tiff(img, _base=base, _next_ifd=next_off, **kw)
        out += page if base == 0 else page
        base += sizes[i]
    return bytes(out)


def id3v2_tags(payload: bytes) -> dict[str, str]:
    """Parse ID3v2.2/2.3/2.4 text frames (TIT2 title, TPE1 artist, TALB
    album, ...) → {frame_id: text}.  Real metadata extraction: handles
    syncsafe v2.4 frame sizes, the extended header, latin-1/UTF-16(+BOM)/
    UTF-16BE/UTF-8 text encodings.  Returns {} when no ID3v2 tag leads the
    payload; malformed tags raise ``ValueError``."""
    if payload[:3] != b"ID3":
        return {}
    total = _id3v2_size(payload)  # validates version bytes + syncsafe size
    ver = payload[3]
    pos, end = 10, total - (10 if payload[5] & 0x10 else 0)
    if payload[5] & 0x40:  # extended header
        if pos + 4 > end:
            raise ValueError("MP3: truncated ID3v2 extended header")
        if ver >= 4:
            ext = (
                (payload[pos] << 21) | (payload[pos + 1] << 14)
                | (payload[pos + 2] << 7) | payload[pos + 3]
            )
        else:
            ext = struct.unpack_from(">I", payload, pos)[0] + 4
        pos += ext
    out: dict[str, str] = {}
    id_len, hdr_len = (3, 6) if ver == 2 else (4, 10)
    while pos + hdr_len <= end:
        fid = payload[pos : pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        if ver == 2:
            fsize = int.from_bytes(payload[pos + 3 : pos + 6], "big")
        elif ver >= 4:
            raw = payload[pos + 4 : pos + 8]
            if any(b & 0x80 for b in raw):
                raise ValueError("MP3: ID3v2.4 frame size not syncsafe")
            fsize = (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]
        else:
            fsize = struct.unpack_from(">I", payload, pos + 4)[0]
        pos += hdr_len
        if pos + fsize > end:
            raise ValueError("MP3: ID3v2 frame extends past tag")
        data = payload[pos : pos + fsize]
        pos += fsize
        if fid[:1] == b"T" and data:
            enc, text = data[0], data[1:]
            try:
                if enc == 0:
                    s = text.decode("latin1")
                elif enc == 1:
                    s = text.decode("utf-16")
                elif enc == 2:
                    s = text.decode("utf-16-be")
                elif enc == 3:
                    s = text.decode("utf-8")
                else:
                    raise ValueError(f"MP3: bad ID3v2 text encoding {enc}")
            except UnicodeDecodeError as exc:
                raise ValueError(f"MP3: undecodable ID3v2 text frame: {exc}")
            out[fid.decode("latin1")] = s.rstrip("\x00")
    return out


# ==========================================================================
# G.711 μ-law / A-law — real companded-audio codecs (fully vectorized)
# ==========================================================================


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear PCM → G.711 μ-law bytes (ITU-T formulas, vectorized)."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 μ-law bytes → int16 linear PCM (exact table semantics)."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -x, x).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear PCM → G.711 A-law bytes (vectorized)."""
    x = x.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32767) >> 3  # 13-bit magnitude
    exp = np.where(mag < 32, 0, (np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4).clip(0, 7))
    mant = np.where(exp == 0, mag >> 1, (mag >> exp) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 linear PCM."""
    a = a.astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    x = np.where(exp == 0, (mant << 1) + 1, ((mant << 1) + 0x21) << (exp - 1)) << 3
    return np.where(sign, x, -x).astype(np.int16)


# ==========================================================================
# AIFF + Sun AU — big-endian audio containers (real decode)
# ==========================================================================


def _f80_encode(x: float) -> bytes:
    """float → 80-bit IEEE 754 extended (big-endian), for AIFF sample rate."""
    if x <= 0:
        raise ValueError("AIFF: sample rate must be positive")
    import math

    m, e = math.frexp(x)  # x = m * 2^e, 0.5 <= m < 1
    mant = int(m * (1 << 64))
    return struct.pack(">HQ", (e - 1) + 16383, mant)


def _f80_decode(b: bytes) -> float:
    se, mant = struct.unpack(">HQ", b)
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    val = mant * 2.0 ** (exp - 16383 - 63)
    return -val if se & 0x8000 else val


def encode_aiff(samples: np.ndarray, sample_rate: int, *, bits: int = 16) -> bytes:
    """(n,) or (n, ch) int → AIFF (big-endian PCM)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    width = bits // 8
    if bits == 16:
        data = samples.astype(">i2").tobytes()
    elif bits == 8:
        data = samples.astype("i1").tobytes()
    elif bits == 32:
        data = samples.astype(">i4").tobytes()
    elif bits == 24:
        b4 = samples.reshape(-1).astype(">i4").view(np.uint8).reshape(-1, 4)
        data = b4[:, 1:].tobytes()
    else:
        raise ValueError("AIFF: bits must be 8/16/24/32")
    comm = struct.pack(">hIh", ch, n, bits) + _f80_encode(float(sample_rate))
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int, int]:
    """AIFF → ((n, ch) int32, sample_rate, bits).  Real decode: chunk walk,
    80-bit extended sample rate, 8/16/24/32-bit big-endian PCM.  AIFC
    compressed variants raise ``ValueError``."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    if payload[8:12] == b"AIFC":
        raise ValueError("AIFC compressed AIFF not supported")
    pos = 12
    ch = n_frames = bits = None
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError("AIFF: chunk extends past file")
        if cid == b"COMM":
            if size < 18:
                raise ValueError("AIFF: short COMM chunk")
            ch, n_frames, bits = struct.unpack_from(">hIh", payload, pos + 8)
            rate = _f80_decode(payload[pos + 16 : pos + 26])
        elif cid == b"SSND":
            off, _blk = struct.unpack_from(">II", payload, pos + 8)
            data = payload[pos + 16 + off : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if ch is None or data is None or rate is None or rate <= 0:
        raise ValueError("AIFF: missing COMM/SSND")
    if ch < 1 or bits not in (8, 16, 24, 32):
        raise ValueError("AIFF: bad COMM fields")
    width = bits // 8
    n = min(n_frames, len(data) // (width * ch))
    if bits == 8:
        x = np.frombuffer(data, "i1", n * ch).astype(np.int32)
    elif bits == 16:
        x = np.frombuffer(data, ">i2", n * ch).astype(np.int32)
    elif bits == 32:
        x = np.frombuffer(data, ">i4", n * ch).astype(np.int32)
    else:  # 24
        raw = np.frombuffer(data, np.uint8, n * ch * 3).reshape(-1, 3)
        b4 = np.zeros((n * ch, 4), np.uint8)
        b4[:, :3] = raw
        x = (b4.view(">i4").reshape(-1).astype(np.int32)) >> 8
    return x.reshape(n, ch), int(round(rate)), bits


_AU_ENCODINGS = {1: "mulaw", 2: "pcm8", 3: "pcm16", 4: "pcm24", 5: "pcm32", 6: "f32", 7: "f64", 27: "alaw"}


def encode_au(samples: np.ndarray, sample_rate: int, *, encoding: str = "pcm16") -> bytes:
    """(n,) or (n, ch) int16 → Sun AU (.snd).  ``encoding``: pcm16 /
    mulaw / alaw (the companded paths run the real G.711 codecs)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    flat = samples.reshape(-1).astype(np.int16)
    if encoding == "pcm16":
        code, data = 3, flat.astype(">i2").tobytes()
    elif encoding == "mulaw":
        code, data = 1, mulaw_encode(flat).tobytes()
    elif encoding == "alaw":
        code, data = 27, alaw_encode(flat).tobytes()
    else:
        raise ValueError("encode_au: encoding must be pcm16/mulaw/alaw")
    hdr = struct.pack(">4sIIIII", b".snd", 24, len(data), code, sample_rate, ch)
    return hdr + data


def decode_au(payload: bytes) -> tuple[np.ndarray, int, str]:
    """Sun AU → ((n, ch) int16/int32/float, sample_rate, encoding-name).
    Real decode incl. the G.711 μ-law/A-law companded formats."""
    if payload[:4] != b".snd" or len(payload) < 24:
        raise ValueError("not a Sun AU payload")
    off, size, code, rate, ch = struct.unpack_from(">IIIII", payload, 4)
    name = _AU_ENCODINGS.get(code)
    if name is None:
        raise ValueError(f"AU: unsupported encoding {code}")
    if off < 24 or off > len(payload) or ch < 1 or rate < 1:
        raise ValueError("AU: bad header fields")
    data = payload[off : off + size] if size != 0xFFFFFFFF else payload[off:]
    if name == "mulaw":
        x = mulaw_decode(np.frombuffer(data, np.uint8)).astype(np.int16)
    elif name == "alaw":
        x = alaw_decode(np.frombuffer(data, np.uint8)).astype(np.int16)
    elif name == "pcm8":
        x = np.frombuffer(data, "i1").astype(np.int16)
    elif name == "pcm16":
        x = np.frombuffer(data, ">i2", len(data) // 2).astype(np.int16)
    elif name == "pcm24":
        raw = np.frombuffer(data, np.uint8, len(data) // 3 * 3).reshape(-1, 3)
        b4 = np.zeros((len(raw), 4), np.uint8)
        b4[:, :3] = raw
        x = (b4.view(">i4").reshape(-1).astype(np.int32)) >> 8
    elif name == "pcm32":
        x = np.frombuffer(data, ">i4", len(data) // 4).astype(np.int32)
    elif name == "f32":
        x = np.frombuffer(data, ">f4", len(data) // 4).astype(np.float32)
    else:
        x = np.frombuffer(data, ">f8", len(data) // 8)
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), rate, name


def sniff_decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte dispatch to the REAL audio decoders → (int16 mono,
    sample_rate).  WAV (full uncompressed family), FLAC (lossless codec),
    AIFF, Sun AU (incl. G.711 μ-law/A-law).  MP3 raises
    ``NotImplementedError`` (the honest perceptual-codec stub boundary)."""
    if payload[:4] == b"RIFF":
        from pyjelly_ray.stages.multimodal import decode_wav

        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        from pyjelly_ray.stages.flac import decode_flac

        x, rate, bits = decode_flac(payload)
        ch0 = x[:, 0]
        mono = ch0 if bits == 16 else (ch0 << 8 if bits == 8 else ch0 >> (bits - 16))
        return mono.astype(np.int16), rate
    if payload[:4] == b"FORM":
        x, rate, bits = decode_aiff(payload)
        ch0 = x[:, 0]
        mono = ch0 if bits == 16 else (ch0 << 8 if bits == 8 else ch0 >> (bits - 16))
        return mono.astype(np.int16), rate
    if payload[:4] == b".snd":
        x, rate, name = decode_au(payload)
        ch0 = x[:, 0]
        if name in ("f32", "f64"):
            mono = np.clip(ch0 * 32768.0, -32768, 32767).astype(np.int16)
        elif name in ("pcm24", "pcm32"):
            mono = (ch0 >> (8 if name == "pcm24" else 16)).astype(np.int16)
        elif name == "pcm8":
            mono = (ch0.astype(np.int32) << 8).astype(np.int16)
        else:
            mono = ch0.astype(np.int16)
        return mono, rate
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xfa", b"\xff\xf3", b"\xff\xf2"):
        decode_mp3(payload)  # validates, then refuses honestly
    raise NotImplementedError(
        "unknown audio codec (WAV/FLAC/AIFF/AU decode natively; perceptual "
        "codecs need an audio library plugged in here)"
    )


class AudioDecodeStage:
    """REAL actor-pool audio stage: sniff-decode ANY supported audio format
    (WAV/FLAC/AIFF/AU) → feature vector per clip — the audio counterpart of
    ``multimodal.ImageDecodeStub(fake=False)``."""

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def __call__(self, batch):
        import pyarrow as pa

        from pyjelly_ray.stages.multimodal import audio_features

        feats, rates, n_samples = [], [], []
        for p in batch.column("payload").to_pylist():
            samples, rate = sniff_decode_audio(p or b"")
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


# ==========================================================================
# QOI — the "Quite OK Image" format (complete spec: all 6 op codes)
# ==========================================================================


def encode_qoi(img: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 → QOI bytes (spec-complete encoder: RUN, INDEX,
    DIFF, LUMA, RGB, RGBA ops + the 64-slot hash index)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("encode_qoi expects (H, W, 3|4) uint8")
    h, w, ch = img.shape
    out = bytearray(struct.pack(">4sIIBB", b"qoif", w, h, ch, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, ch)
    if ch == 3:
        flat = np.column_stack([flat, np.full(len(flat), 255, np.uint8)])
    for r, g, b, a in flat.tolist():
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        slot = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[slot] == (r, g, b, a):
            out.append(slot)
        elif a == pa:
            dr, dg, db = r - pr, g - pg, b - pb
            dr, dg, db = ((dr + 128) & 0xFF) - 128, ((dg + 128) & 0xFF) - 128, ((db + 128) & 0xFF) - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else:
                dr_dg, db_dg = dr - dg, db - dg
                dr_dg, db_dg = ((dr_dg + 128) & 0xFF) - 128, ((db_dg + 128) & 0xFF) - 128
                if -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes([0xFE, r, g, b])
        else:
            out += bytes([0xFF, r, g, b, a])
        index[slot] = (r, g, b, a)
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI → (H, W, 3|4) uint8 (spec-complete decoder)."""
    if payload[:4] != b"qoif" or len(payload) < 22:
        raise ValueError("not a QOI payload")
    w, h, ch, cs = struct.unpack_from(">IIBB", payload, 4)
    if ch not in (3, 4) or cs > 1 or w == 0 or h == 0 or w * h > 1 << 26:
        raise ValueError("QOI: bad header")
    n = w * h
    out = np.empty((n, 4), np.uint8)
    index = np.zeros((64, 4), np.uint8)
    px = np.array([0, 0, 0, 255], np.uint8)
    pos, i = 14, 0
    end = len(payload) - 8
    while i < n:
        if pos >= end:
            raise ValueError("QOI: stream truncated")
        b0 = payload[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            px = px.copy()
            px[:3] = memoryview(payload)[pos : pos + 3]
            pos += 3
        elif b0 == 0xFF:  # RGBA
            px = np.frombuffer(payload, np.uint8, 4, pos).copy()
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            px = index[b0].copy()
        elif b0 >> 6 == 1:  # DIFF (mod-256 wraparound per spec)
            d = np.array(
                [((b0 >> 4) & 3) - 2, ((b0 >> 2) & 3) - 2, (b0 & 3) - 2, 0], np.int16
            ).astype(np.uint8)
            px = px + d
        elif b0 >> 6 == 2:  # LUMA
            dg = (b0 & 0x3F) - 32
            b1 = payload[pos]
            pos += 1
            d = np.array(
                [dg + ((b1 >> 4) & 0xF) - 8, dg, dg + (b1 & 0xF) - 8, 0], np.int16
            ).astype(np.uint8)
            px = px + d
        else:  # RUN
            run = (b0 & 0x3F) + 1
            if i + run > n:
                raise ValueError("QOI: run past end")
            out[i : i + run] = px
            i += run
            continue
        out[i] = px
        i += 1
        index[(int(px[0]) * 3 + int(px[1]) * 5 + int(px[2]) * 7 + int(px[3]) * 11) % 64] = px
    if payload[end : end + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("QOI: bad end marker")
    img = out.reshape(h, w, 4)
    return np.ascontiguousarray(img[:, :, :ch])


# ==========================================================================
# Ogg — page-level demux (real): page parsing, CRC, logical streams,
# packet reassembly, Vorbis/Opus identification-header metadata.
# The audio bitstreams themselves (Vorbis/Opus) are the honest stub.
# ==========================================================================

_OGG_CRC_TABLE = None


def _ogg_crc_table():
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = np.zeros(256, np.uint32)
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
            tbl[i] = r
        _OGG_CRC_TABLE = tbl
    return _OGG_CRC_TABLE


def _ogg_crc(data: bytes) -> int:
    tbl = _ogg_crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ int(tbl[((r >> 24) ^ b) & 0xFF])
    return r


@dataclass
class OggPage:
    """One parsed Ogg page."""

    version: int
    header_type: int  # 1=continued, 2=BOS, 4=EOS
    granule: int
    serial: int
    seq: int
    segments: list[bytes]


def parse_ogg_pages(payload: bytes, *, verify_crc: bool = True) -> list[OggPage]:
    """Ogg → pages (real parse: capture pattern, lacing values, CRC32)."""
    pages = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg: lost page sync")
        if pos + 27 > n:
            raise ValueError("Ogg: truncated page header")
        version, htype = payload[pos + 4], payload[pos + 5]
        if version != 0:
            raise ValueError("Ogg: unsupported stream structure version")
        granule, serial, seq, crc = struct.unpack_from("<qIII", payload, pos + 6)
        nsegs = payload[pos + 26]
        lace = payload[pos + 27 : pos + 27 + nsegs]
        if len(lace) != nsegs:
            raise ValueError("Ogg: truncated lacing table")
        body_len = sum(lace)
        body_start = pos + 27 + nsegs
        if body_start + body_len > n:
            raise ValueError("Ogg: truncated page body")
        page_bytes = bytearray(payload[pos : body_start + body_len])
        page_bytes[22:26] = b"\x00\x00\x00\x00"
        if verify_crc and _ogg_crc(bytes(page_bytes)) != crc:
            raise ValueError("Ogg: page CRC mismatch")
        segs = []
        off = body_start
        for lv in lace:
            segs.append(payload[off : off + lv])
            off += lv
        pages.append(OggPage(version, htype, granule, serial, seq, segs))
        pos = body_start + body_len
    if not pages:
        raise ValueError("Ogg: no pages")
    return pages


def ogg_packets(pages: list[OggPage], serial: int) -> list[bytes]:
    """Reassemble the logical stream's packets from its pages (255-byte
    lacing continuation rules, cross-page continued packets)."""
    packets = []
    cur = bytearray()
    for pg in pages:
        if pg.serial != serial:
            continue
        for i, seg in enumerate(pg.segments):
            cur += seg
            if len(seg) < 255:  # packet ends here
                packets.append(bytes(cur))
                cur = bytearray()
    if cur:
        packets.append(bytes(cur))  # unterminated final packet
    return packets


@dataclass
class OggStreamInfo:
    """Identification metadata for one logical stream."""

    serial: int
    codec: str  # "vorbis" / "opus" / "unknown"
    channels: int = 0
    sample_rate: int = 0
    n_pages: int = 0
    duration_samples: int = 0  # last granule position


def ogg_info(payload: bytes) -> list[OggStreamInfo]:
    """Real Ogg metadata: per-logical-stream codec identification (Vorbis
    and Opus id headers parsed for channels/rate), page counts, final
    granule positions.  Audio DECODE is the stub — see the codec fields."""
    pages = parse_ogg_pages(payload)
    out: dict[int, OggStreamInfo] = {}
    for pg in pages:
        info = out.get(pg.serial)
        if info is None:
            info = out[pg.serial] = OggStreamInfo(pg.serial, "unknown")
        info.n_pages += 1
        if pg.granule >= 0:
            info.duration_samples = max(info.duration_samples, pg.granule)
        if pg.header_type & 2:  # BOS: identification header packet
            first = pg.segments[0] if pg.segments else b""
            if first[:7] == b"\x01vorbis" and len(first) >= 30:
                _ver, ch = struct.unpack_from("<IB", first, 7)
                rate = struct.unpack_from("<I", first, 12)[0]
                info.codec, info.channels, info.sample_rate = "vorbis", ch, rate
            elif first[:8] == b"OpusHead" and len(first) >= 19:
                ch = first[9]
                rate = struct.unpack_from("<I", first, 12)[0]
                info.codec, info.channels, info.sample_rate = "opus", ch, rate
    return sorted(out.values(), key=lambda i: i.serial)


def decode_ogg_audio(payload: bytes) -> np.ndarray:
    """STUB: Vorbis/Opus audio decode needs a codec library.  The container
    layer IS real — ``parse_ogg_pages``/``ogg_packets``/``ogg_info`` parse
    pages, CRCs, packets and id headers exactly."""
    infos = ogg_info(payload)  # validates the container for real first
    codecs = {i.codec for i in infos}
    raise NotImplementedError(
        f"Ogg audio decode ({', '.join(sorted(codecs))}) needs a codec "
        "library; the page/packet/id-header layer parses natively"
    )


def encode_ogg(streams: dict[int, list[bytes]], *, codec_ids: dict[int, bytes] | None = None) -> bytes:
    """{serial: [packet, ...]} → Ogg bytes (for fixtures): correct lacing
    (255-continuations, packets > 255 bytes), BOS/EOS flags, CRC32."""
    out = bytearray()
    for serial, packets in streams.items():
        for pi, packet in enumerate(packets):
            # lacing: 255-valued segments + terminator < 255
            lace = [255] * (len(packet) // 255) + [len(packet) % 255]
            if len(lace) > 255:
                raise ValueError("encode_ogg: packet too large for one page")
            htype = (2 if pi == 0 else 0) | (4 if pi == len(packets) - 1 else 0)
            hdr = bytearray(b"OggS\x00")
            hdr.append(htype)
            hdr += struct.pack("<qIII", pi, serial, pi, 0)
            hdr.append(len(lace))
            hdr += bytes(lace)
            page = hdr + packet
            crc = _ogg_crc(bytes(page))
            page[22:26] = struct.pack("<I", crc)
            out += page
    return bytes(out)


# ==========================================================================
# Matroska / WebM — EBML demux (real): varint ids/sizes, element tree,
# track metadata, SimpleBlock extraction; V_UNCOMPRESSED RGB24 tracks
# decode fully.  Compressed codecs (VP8/VP9/AV1/Opus...) are the stub.
# ==========================================================================

_EBML_SEGMENT = 0x18538067
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACKENTRY = 0xAE
_EBML_CLUSTER = 0x1F43B675
_EBML_MASTERS = {
    0x1A45DFA3, _EBML_SEGMENT, _EBML_TRACKS, _EBML_TRACKENTRY, _EBML_CLUSTER,
    0x1549A966, 0xE0, 0xE1, 0xA0,
}


def _ebml_read_vint(payload: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML varint at pos → (value, new_pos)."""
    if pos >= len(payload):
        raise ValueError("EBML: truncated varint")
    first = payload[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint lead byte")
    length = 8 - first.bit_length() + 1
    if pos + length > len(payload):
        raise ValueError("EBML: truncated varint body")
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        value = (value << 8) | payload[pos + i]
    return value, pos + length


def _ebml_write_vint(value: int) -> bytes:
    """Minimal-length EBML size varint."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:  # all-ones is reserved (unknown)
            marker = 1 << (7 * length)
            return (marker | value).to_bytes(length, "big")
    raise ValueError("EBML: size too large")


@dataclass
class EbmlElement:
    """One parsed EBML element."""

    id: int
    start: int
    size: int
    children: list["EbmlElement"] = field(default_factory=list)

    def find(self, *path: int) -> "EbmlElement | None":
        node = self
        for eid in path:
            node = next((c for c in node.children if c.id == eid), None)
            if node is None:
                return None
        return node

    def find_all(self, eid: int) -> list["EbmlElement"]:
        return [c for c in self.children if c.id == eid]


def parse_ebml(payload: bytes, start: int = 0, end: int | None = None) -> list[EbmlElement]:
    """Parse an EBML element sequence (recursing into known master
    elements).  Unknown-size elements extend to the enclosing end."""
    if end is None:
        end = len(payload)
    out = []
    pos = start
    while pos < end:
        eid, pos = _ebml_read_vint(payload, pos, keep_marker=True)
        size_first = payload[pos] if pos < len(payload) else 0
        size, pos = _ebml_read_vint(payload, pos, keep_marker=False)
        length = 8 - size_first.bit_length() + 1 if size_first else 1
        if size == (1 << (7 * length)) - 1:  # unknown size → to end
            size = end - pos
        if pos + size > end:
            raise ValueError("EBML: element extends past parent")
        el = EbmlElement(eid, pos, size)
        if eid in _EBML_MASTERS:
            el.children = parse_ebml(payload, pos, pos + size)
        out.append(el)
        pos += size
    return out


def _ebml_uint(payload: bytes, el: EbmlElement) -> int:
    return int.from_bytes(payload[el.start : el.start + el.size], "big")


def _ebml_float(payload: bytes, el: EbmlElement) -> float:
    b = payload[el.start : el.start + el.size]
    if len(b) == 4:
        return struct.unpack(">f", b)[0]
    if len(b) == 8:
        return struct.unpack(">d", b)[0]
    raise ValueError("EBML: bad float size")


@dataclass
class MkvTrack:
    """Matroska track metadata."""

    number: int
    type: int  # 1=video, 2=audio
    codec_id: str
    width: int = 0
    height: int = 0
    channels: int = 0
    sample_rate: float = 0.0


def mkv_info(payload: bytes) -> tuple[list[MkvTrack], float]:
    """Real Matroska/WebM demux: (tracks, duration_seconds)."""
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska payload")
    root = parse_ebml(payload)
    seg = next((e for e in root if e.id == _EBML_SEGMENT), None)
    if seg is None:
        raise ValueError("Matroska: no Segment")
    tracks = []
    for te in (seg.find(_EBML_TRACKS).find_all(_EBML_TRACKENTRY) if seg.find(_EBML_TRACKS) else []):
        num = te.find(0xD7)
        ttype = te.find(0x83)
        codec = te.find(0x86)
        tr = MkvTrack(
            number=_ebml_uint(payload, num) if num else 0,
            type=_ebml_uint(payload, ttype) if ttype else 0,
            codec_id=payload[codec.start : codec.start + codec.size].decode("latin1") if codec else "",
        )
        vid = te.find(0xE0)
        if vid:
            pw, ph = vid.find(0xB0), vid.find(0xBA)
            tr.width = _ebml_uint(payload, pw) if pw else 0
            tr.height = _ebml_uint(payload, ph) if ph else 0
        aud = te.find(0xE1)
        if aud:
            ch, sf = aud.find(0x9F), aud.find(0xB5)
            tr.channels = _ebml_uint(payload, ch) if ch else 0
            tr.sample_rate = _ebml_float(payload, sf) if sf else 0.0
        tracks.append(tr)
    if not tracks:
        raise ValueError("Matroska: no tracks")
    info = seg.find(0x1549A966)
    tscale = 1_000_000
    duration = 0.0
    if info:
        ts = info.find(0x2AD7B1)
        if ts:
            tscale = _ebml_uint(payload, ts)
        dur = info.find(0x4489)
        if dur:
            duration = _ebml_float(payload, dur) * tscale / 1e9
    return tracks, duration


def mkv_blocks(payload: bytes, track_number: int) -> list[tuple[int, bytes]]:
    """Extract a track's SimpleBlock frames → [(timestamp_ticks, bytes)].
    Real cluster walk; laced blocks raise (our writer emits no lacing)."""
    root = parse_ebml(payload)
    seg = next((e for e in root if e.id == _EBML_SEGMENT), None)
    if seg is None:
        raise ValueError("Matroska: no Segment")
    out = []
    for cluster in seg.find_all(_EBML_CLUSTER):
        tse = cluster.find(0xE7)
        cluster_ts = _ebml_uint(payload, tse) if tse else 0
        for blk in cluster.find_all(0xA3):
            tnum, p = _ebml_read_vint(payload, blk.start, keep_marker=False)
            if p + 3 > blk.start + blk.size:
                raise ValueError("Matroska: truncated SimpleBlock")
            rel = struct.unpack_from(">h", payload, p)[0]
            flags = payload[p + 2]
            if flags & 0x06:
                raise ValueError("Matroska: laced blocks not supported")
            if tnum == track_number:
                out.append((cluster_ts + rel, payload[p + 3 : blk.start + blk.size]))
    return out


def _ebml_el(eid: int, body: bytes) -> bytes:
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return id_bytes + _ebml_write_vint(len(body)) + body


def encode_mkv_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """(T, H, W, 3) uint8 → minimal Matroska with one V_UNCOMPRESSED RGB24
    video track, one SimpleBlock per frame (no lacing)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mkv_rawvideo expects (T, H, W, 3) uint8")
    t, h, w = frames.shape[:3]
    ebml_hdr = _ebml_el(
        0x1A45DFA3,
        _ebml_el(0x4282, b"matroska") + _ebml_el(0x4287, b"\x04") + _ebml_el(0x4285, b"\x02"),
    )
    info = _ebml_el(
        0x1549A966,
        _ebml_el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        + _ebml_el(0x4489, struct.pack(">d", t * 1000.0 / fps)),
    )
    def be(v: int) -> bytes:
        return v.to_bytes((max(v.bit_length(), 1) + 7) // 8, "big")

    video = _ebml_el(0xE0, _ebml_el(0xB0, be(w)) + _ebml_el(0xBA, be(h)))
    track = _ebml_el(
        _EBML_TRACKENTRY,
        _ebml_el(0xD7, b"\x01") + _ebml_el(0x83, b"\x01")
        + _ebml_el(0x86, b"V_UNCOMPRESSED") + video,
    )
    tracks = _ebml_el(_EBML_TRACKS, track)
    clusters = b""
    for i in range(t):
        ts_ms = i * 1000 // fps
        block = _ebml_write_vint(1) + struct.pack(">h", 0) + b"\x80" + frames[i].tobytes()
        clusters += _ebml_el(
            _EBML_CLUSTER,
            _ebml_el(0xE7, ts_ms.to_bytes((max(ts_ms.bit_length(), 1) + 7) // 8, "big"))
            + _ebml_el(0xA3, block),
        )
    segment = _ebml_el(_EBML_SEGMENT, info + tracks + clusters)
    return ebml_hdr + segment


def decode_mkv_video(payload: bytes) -> np.ndarray:
    """Matroska/WebM → (T, H, W, 3) uint8 for V_UNCOMPRESSED RGB24 tracks.
    The EBML demux is real for ANY codec; compressed bitstreams
    (V_VP8/V_VP9/V_AV1/...) raise ``NotImplementedError`` at the codec
    step — the honest stub boundary, mirroring MP4."""
    tracks, _dur = mkv_info(payload)
    video = [tr for tr in tracks if tr.type == 1]
    if not video:
        raise ValueError("Matroska: no video track")
    tr = video[0]
    if tr.codec_id != "V_UNCOMPRESSED":
        raise NotImplementedError(
            f"Matroska video codec {tr.codec_id!r} needs a codec library; "
            "the EBML demux is real — V_UNCOMPRESSED RGB24 decodes natively"
        )
    if tr.width <= 0 or tr.height <= 0:
        raise ValueError("Matroska: missing video dimensions")
    blocks = mkv_blocks(payload, tr.number)
    frame_bytes = tr.width * tr.height * 3
    frames = np.empty((len(blocks), tr.height, tr.width, 3), np.uint8)
    for i, (_ts, data) in enumerate(sorted(blocks, key=lambda b: b[0])):
        if len(data) != frame_bytes:
            raise ValueError("Matroska: raw frame size mismatch")
        frames[i] = np.frombuffer(data, np.uint8).reshape(tr.height, tr.width, 3)
    return frames


# ==========================================================================
# TGA — Truevision TARGA (types 2/3/10/11: raw + RLE, color/gray)
# ==========================================================================


def encode_tga(img: np.ndarray, *, rle: bool = False) -> bytes:
    """(H, W, 3|4) uint8 → TGA (type 2 raw or 10 RLE, top-left origin)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("encode_tga expects (H, W, 3|4) uint8")
    h, w, ch = img.shape
    bgr = img[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10 if rle else 2, 0, 0, 0, 0, 0, w, h,
        ch * 8, 0x20 | (0x08 if ch == 4 else 0),  # top-left origin
    )
    if not rle:
        return hdr + bgr.tobytes()
    out = bytearray(hdr)
    px = bgr.reshape(h, w, ch)
    for row in px:
        i = 0
        while i < w:
            j = i + 1
            while j < w and j - i < 128 and (row[j] == row[i]).all():
                j += 1
            if j - i >= 2:  # RLE packet
                out.append(0x80 | (j - i - 1))
                out += row[i].tobytes()
                i = j
            else:  # raw packet: until next 2-run
                j = i + 1
                while j < w and j - i < 128:
                    if j + 1 < w and (row[j] == row[j + 1]).all():
                        break
                    j += 1
                out.append(j - i - 1)
                out += row[i:j].tobytes()
                i = j
    return bytes(out)


def decode_tga(payload: bytes) -> np.ndarray:
    """TGA → (H, W, C) uint8.  Types 2 (raw BGR), 3 (raw gray), 10 (RLE
    BGR), 11 (RLE gray); 24/32-bit color, both vertical origins."""
    if len(payload) < 18:
        raise ValueError("TGA: truncated header")
    (id_len, cmap_type, itype, _cfirst, _clen, _csize, _x0, _y0, w, h,
     bpp, desc) = struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    if cmap_type != 0 or itype not in (2, 3, 10, 11):
        raise ValueError(f"TGA: unsupported image type {itype}/{cmap_type}")
    if itype in (2, 10):
        if bpp not in (24, 32):
            raise ValueError("TGA: color must be 24/32-bit")
        ch = bpp // 8
    else:
        if bpp != 8:
            raise ValueError("TGA: gray must be 8-bit")
        ch = 1
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise ValueError("TGA: bad dimensions")
    pos = 18 + id_len
    n = w * h
    if itype in (2, 3):  # raw
        need = n * ch
        if pos + need > len(payload):
            raise ValueError("TGA: truncated pixel data")
        px = np.frombuffer(payload, np.uint8, need, pos).reshape(h, w, ch)
    else:  # RLE
        out = np.empty((n, ch), np.uint8)
        got = 0
        while got < n:
            if pos >= len(payload):
                raise ValueError("TGA: truncated RLE stream")
            pkt = payload[pos]
            pos += 1
            count = (pkt & 0x7F) + 1
            if got + count > n:
                raise ValueError("TGA: RLE overrun")
            if pkt & 0x80:  # run
                if pos + ch > len(payload):
                    raise ValueError("TGA: truncated RLE run")
                out[got : got + count] = np.frombuffer(payload, np.uint8, ch, pos)
                pos += ch
            else:  # literal
                need = count * ch
                if pos + need > len(payload):
                    raise ValueError("TGA: truncated RLE literal")
                out[got : got + count] = np.frombuffer(
                    payload, np.uint8, need, pos
                ).reshape(count, ch)
                pos += need
            got += count
        px = out.reshape(h, w, ch)
    if ch >= 3:
        px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]  # BGR(A) → RGB(A)
    if not desc & 0x20:  # bottom-up origin
        px = px[::-1]
    return np.ascontiguousarray(px)


# ==========================================================================
# ICO — Windows icon container (PNG or DIB/BMP entries)
# ==========================================================================


def encode_ico(images: list[np.ndarray]) -> bytes:
    """List of (H≤256, W≤256, 3|4) uint8 → ICO with PNG-compressed entries."""
    if not images:
        raise ValueError("encode_ico needs at least one image")
    from pyjelly_ray.stages.multimodal import encode_png

    entries, blobs = bytearray(), []
    offset = 6 + 16 * len(images)
    for img in images:
        h, w = img.shape[:2]
        if h > 256 or w > 256:
            raise ValueError("ICO entries are at most 256x256")
        png = encode_png(img)
        entries += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(png), offset
        )
        blobs.append(png)
        offset += len(png)
    return struct.pack("<HHH", 0, 1, len(images)) + entries + b"".join(blobs)


def decode_ico(payload: bytes, *, best: bool = True):
    """ICO → decoded image(s).  PNG entries decode via the real PNG codec;
    classic DIB entries via the BMP decoder (with the AND-mask height/2
    convention).  ``best=True`` → largest entry only, else all."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    n = struct.unpack_from("<H", payload, 4)[0]
    if n == 0 or 6 + 16 * n > len(payload):
        raise ValueError("ICO: bad directory")
    out = []
    for i in range(n):
        w8, h8, _pal, _res, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * i
        )
        if off + size > len(payload):
            raise ValueError("ICO: entry out of range")
        blob = payload[off : off + size]
        if blob[:8] == _PNG_MAGIC:
            img = _ico_decode_png(blob)
        else:  # DIB: BITMAPINFOHEADER with doubled height (XOR + AND masks)
            if len(blob) < 40:
                raise ValueError("ICO: truncated DIB entry")
            hdr = bytearray(blob[:40])
            real_h = struct.unpack_from("<i", blob, 8)[0] // 2
            hdr[8:12] = struct.pack("<i", real_h)
            bmp = (
                struct.pack("<2sIHHI", b"BM", 14 + len(blob), 0, 0, 14 + 40)
                + bytes(hdr)
                + blob[40:]
            )
            img = decode_bmp(bmp)
        out.append(img)
    if not best:
        return out
    return max(out, key=lambda a: a.shape[0] * a.shape[1])


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _ico_decode_png(blob: bytes):
    from pyjelly_ray.stages.multimodal import decode_png

    return decode_png(blob)


# ==========================================================================
# WebP — RIFF container + VP8/VP8L header metadata (REAL); pixel decode
# is the honest stub (VP8 arithmetic coding / VP8L huffman need a codec).
# ==========================================================================


@dataclass
class WebpInfo:
    """WebP container metadata from a real header parse."""

    format: str  # "lossy" (VP8), "lossless" (VP8L), "extended" (VP8X)
    width: int
    height: int
    has_alpha: bool = False
    has_animation: bool = False


def webp_info(payload: bytes) -> WebpInfo:
    """Real WebP metadata: RIFF walk + VP8 keyframe header (start code +
    14-bit dims) or VP8L header (signature + 14-bit fields) or VP8X
    canvas fields.  Pixel decode needs a codec library — ``decode_webp``
    refuses honestly after this validation."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    n = len(payload)
    info = None
    has_alpha = has_anim = False
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("WebP: truncated chunk")
        if tag == b"VP8 " and info is None:
            if len(body) < 10:
                raise ValueError("WebP: truncated VP8 frame header")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("WebP: bad VP8 start code")
            w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
            info = WebpInfo("lossy", w, h)
        elif tag == b"VP8L" and info is None:
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("WebP: bad VP8L signature")
            bits = struct.unpack_from("<I", body, 1)[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            info = WebpInfo("lossless", w, h, has_alpha=bool((bits >> 28) & 1))
        elif tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("WebP: truncated VP8X")
            flags = body[0]
            has_alpha = bool(flags & 0x10)
            has_anim = bool(flags & 0x02)
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            info = WebpInfo("extended", w, h)
        pos += 8 + size + (size & 1)
    if info is None:
        raise ValueError("WebP: no image chunk")
    info.has_alpha = info.has_alpha or has_alpha
    info.has_animation = has_anim
    return info


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP pixel decode: lossless (VP8L) is REAL (stages/vp8l.py, full
    spec: transforms, meta-huffman, color cache, LZ77); lossy (VP8) is the
    honest stub — boolean arithmetic coding + loop filter DSP needs a
    codec library.  Extended (VP8X) files decode when they carry a VP8L
    stream."""
    info = webp_info(payload)  # validates for real before refusing
    if info.format == "lossy":
        raise NotImplementedError(
            "WebP lossy (VP8) pixel decode needs a DSP codec library; the "
            "RIFF/VP8 header layer parses natively"
        )
    from pyjelly_ray.stages.vp8l import decode_webp_lossless

    return decode_webp_lossless(payload)


# ==========================================================================
# AVI — RIFF container demux (real); uncompressed DIB (BI_RGB 24-bit)
# frames decode fully, compressed fourccs refuse at the codec step.
# ==========================================================================


def _riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_size)."""
    pos = start
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("AVI: chunk extends past parent")
        if tag in (b"RIFF", b"LIST"):
            yield tag, payload[pos + 8 : pos + 12], pos + 12, size - 4
        else:
            yield tag, None, pos + 8, size
        pos += 8 + size + (size & 1)


def encode_avi_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """(T, H, W, 3) uint8 → minimal AVI with one uncompressed BI_RGB
    24-bit video stream ('00db' DIB frames, bottom-up BGR, padded rows)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_avi_rawvideo expects (T, H, W, 3) uint8")
    t, h, w = frames.shape[:3]
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, frame_size * fps, 0, 0x10,
        t, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, t,
        frame_size, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    for i in range(t):
        padded = np.zeros((h, row_bytes), np.uint8)
        padded[:, : w * 3] = frames[i][::-1, :, ::-1].reshape(h, -1)  # bottom-up BGR
        movi_body += chunk(b"00db", padded.tobytes())
    movi = list_chunk(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


@dataclass
class AviInfo:
    """AVI stream metadata from a real RIFF/hdrl parse."""

    width: int
    height: int
    fps: float
    n_frames: int
    fourcc: str
    bpp: int
    compression: int


def avi_info(payload: bytes) -> AviInfo:
    """Real AVI demux: RIFF walk → strh/strf of the first video stream."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    total = struct.unpack_from("<I", payload, 4)[0]
    end = min(8 + total, len(payload))
    strh = strf = None
    for tag, ltype, s, sz in _riff_chunks(payload, 12, end):
        if tag == b"LIST" and ltype == b"hdrl":
            for t2, l2, s2, sz2 in _riff_chunks(payload, s, s + sz):
                if t2 == b"LIST" and l2 == b"strl":
                    for t3, _l3, s3, sz3 in _riff_chunks(payload, s2, s2 + sz2):
                        if t3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                            strh = payload[s3 : s3 + sz3]
                        elif t3 == b"strf" and strh is not None and strf is None:
                            strf = payload[s3 : s3 + sz3]
    if strh is None or strf is None or len(strf) < 40:
        raise ValueError("AVI: no video stream headers")
    fourcc = strh[4:8].decode("latin1")
    scale, rate = struct.unpack_from("<II", strh, 20)
    n_frames = struct.unpack_from("<I", strh, 32)[0]
    _sz, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", strf, 0)
    fps = rate / scale if scale else float(rate)
    return AviInfo(w, abs(h), fps, n_frames, fourcc, bpp, compression)


def decode_avi_video(payload: bytes) -> np.ndarray:
    """AVI → (T, H, W, 3) uint8 for uncompressed BI_RGB 24-bit streams.
    The RIFF demux is real for ANY codec; compressed streams raise
    ``NotImplementedError`` at the codec step (the honest stub boundary)."""
    info = avi_info(payload)
    if info.compression != 0 or info.bpp != 24:
        raise NotImplementedError(
            f"AVI codec {info.fourcc!r}/compression={info.compression} needs "
            "a codec library; uncompressed BI_RGB 24-bit decodes natively"
        )
    w, h = info.width, info.height
    row_bytes = (w * 3 + 3) & ~3
    total = struct.unpack_from("<I", payload, 4)[0]
    end = min(8 + total, len(payload))
    frames = []
    for tag, ltype, s, sz in _riff_chunks(payload, 12, end):
        if tag == b"LIST" and ltype == b"movi":
            for t2, _l2, s2, sz2 in _riff_chunks(payload, s, s + sz):
                if t2[2:4] in (b"db", b"dc"):
                    if sz2 < row_bytes * h:
                        raise ValueError("AVI: short DIB frame")
                    rows = np.frombuffer(payload, np.uint8, row_bytes * h, s2)
                    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
                    frames.append(img[::-1, :, ::-1])  # bottom-up BGR → RGB
    if not frames:
        raise ValueError("AVI: no video frames in movi list")
    return np.ascontiguousarray(np.stack(frames))


# ==========================================================================
# netpbm family — P1..P6 (ASCII + binary bitmap/gray/color); PPM P6 also
# lives in multimodal.decode_ppm (kept for compatibility)
# ==========================================================================


def _pnm_tokens(payload: bytes, pos: int, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace-separated ASCII integers (with # comments)."""
    out = []
    n = len(payload)
    while len(out) < count:
        while pos < n and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < n and payload[pos] == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in b" \t\r\n#":
            pos += 1
        if start == pos:
            raise ValueError("PNM: truncated header")
        try:
            out.append(int(payload[start:pos]))
        except ValueError:
            raise ValueError("PNM: non-numeric header token")
    return out, pos


def decode_pnm(payload: bytes) -> np.ndarray:
    """netpbm → uint8 (H, W, C).  Real decode of the whole family:
    P1/P4 bitmap (1=black per spec), P2/P5 graymap, P3/P6 pixmap, ASCII
    and binary, maxval scaling (maxval ≤ 255 scaled to 8-bit exactly;
    16-bit maxvals reduced via the high byte)."""
    if len(payload) < 2 or payload[0] != ord("P") or payload[1] not in b"123456":
        raise ValueError("not a netpbm payload")
    kind = payload[1] - ord("0")
    channels = 3 if kind in (3, 6) else 1
    nhdr = 2 if kind in (1, 4) else 3  # bitmaps have no maxval
    hdr, pos = _pnm_tokens(payload, 2, nhdr)
    w, h = hdr[0], hdr[1]
    maxval = hdr[2] if nhdr == 3 else 1
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20 or maxval <= 0 or maxval > 65535:
        raise ValueError("PNM: bad dimensions/maxval")
    if kind <= 3:  # ASCII sample data
        vals, _ = _pnm_tokens(payload, pos, w * h * channels)
        arr = np.asarray(vals, np.int64)
        if kind == 1:
            arr = 1 - arr  # 1 = black
            maxval = 1
    else:  # binary: exactly one whitespace byte after the header
        pos += 1
        if kind == 4:
            row_bytes = (w + 7) // 8
            need = row_bytes * h
            if pos + need > len(payload):
                raise ValueError("PNM: truncated P4 data")
            bits = np.unpackbits(
                np.frombuffer(payload, np.uint8, need, pos).reshape(h, row_bytes),
                axis=1,
            )[:, :w]
            arr = (1 - bits).astype(np.int64).reshape(-1)
            maxval = 1
        else:
            width = 2 if maxval > 255 else 1
            need = w * h * channels * width
            if pos + need > len(payload):
                raise ValueError("PNM: truncated binary data")
            if width == 1:
                arr = np.frombuffer(payload, np.uint8, need, pos).astype(np.int64)
            else:
                arr = np.frombuffer(payload, ">u2", need // 2, pos).astype(np.int64)
    if arr.size != w * h * channels:
        raise ValueError("PNM: sample count mismatch")
    if int(arr.max(initial=0)) > maxval:
        raise ValueError("PNM: sample exceeds maxval")
    if maxval == 255:
        out = arr.astype(np.uint8)
    elif maxval > 255:
        out = (arr >> 8).astype(np.uint8)  # high-byte rendering
    else:
        out = (arr * 255 // maxval).astype(np.uint8)
    return out.reshape(h, w, channels)


def encode_pnm(img: np.ndarray, kind: int) -> bytes:
    """uint8 (H, W[, C]) → netpbm P1..P6 fixture bytes."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if kind in (3, 6) and c != 3:
        raise ValueError("P3/P6 need 3 channels")
    if kind not in (3, 6) and c != 1:
        raise ValueError("P1/P2/P4/P5 need 1 channel")
    if kind in (1, 4):
        bits = (img[:, :, 0] == 0).astype(np.uint8)  # 1 = black
        if kind == 1:
            body = b"\n".join(b" ".join(b"%d" % v for v in row) for row in bits) + b"\n"
            return b"P1\n%d %d\n" % (w, h) + body
        return b"P4\n%d %d\n" % (w, h) + np.packbits(bits, axis=1).tobytes()
    flat = img.reshape(h, -1)
    if kind in (2, 3):
        body = b"\n".join(b" ".join(b"%d" % v for v in row) for row in flat) + b"\n"
        return b"P%d\n%d %d\n255\n" % (kind, w, h) + body
    return b"P%d\n%d %d\n255\n" % (kind, w, h) + img.tobytes()


# ==========================================================================
# DDS — DirectDraw Surface with REAL S3TC block decompression (BC1/DXT1,
# BC2/DXT3, BC3/DXT5) + uncompressed RGBA8888, fully numpy-vectorized.
# ==========================================================================


def _rgb565_to_888(c: np.ndarray) -> np.ndarray:
    """(n,) uint16 RGB565 → (n, 3) uint8 via standard bit replication."""
    r5 = (c >> 11) & 0x1F
    g6 = (c >> 5) & 0x3F
    b5 = c & 0x1F
    return np.stack(
        [(r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4), (b5 << 3) | (b5 >> 2)],
        axis=1,
    ).astype(np.uint8)


def _bc1_colors(c0: np.ndarray, c1: np.ndarray, force_opaque: bool) -> np.ndarray:
    """Per-block 4-entry RGBA palettes from the two RGB565 endpoints."""
    n = len(c0)
    p0 = _rgb565_to_888(c0).astype(np.int32)
    p1 = _rgb565_to_888(c1).astype(np.int32)
    pal = np.zeros((n, 4, 4), np.uint8)
    pal[:, 0, :3] = p0
    pal[:, 1, :3] = p1
    pal[:, :, 3] = 255
    four = (c0 > c1) | force_opaque
    # 4-color mode: 2/3 and 1/3 interpolants
    pal[four, 2, :3] = ((2 * p0[four] + p1[four]) // 3).astype(np.uint8)
    pal[four, 3, :3] = ((p0[four] + 2 * p1[four]) // 3).astype(np.uint8)
    three = ~four
    pal[three, 2, :3] = ((p0[three] + p1[three]) // 2).astype(np.uint8)
    pal[three, 3] = 0  # transparent black
    return pal


def _bc_color_block(data: np.ndarray, force_opaque: bool) -> np.ndarray:
    """(n, 8) color-block bytes → (n, 16, 4) RGBA texels."""
    c0 = data[:, 0].astype(np.uint16) | (data[:, 1].astype(np.uint16) << 8)
    c1 = data[:, 2].astype(np.uint16) | (data[:, 3].astype(np.uint16) << 8)
    pal = _bc1_colors(c0, c1, force_opaque)
    idx_word = (
        data[:, 4].astype(np.uint32)
        | (data[:, 5].astype(np.uint32) << 8)
        | (data[:, 6].astype(np.uint32) << 16)
        | (data[:, 7].astype(np.uint32) << 24)
    )
    sel = (idx_word[:, None] >> (2 * np.arange(16)[None, :])) & 0x3  # LSB-first
    return pal[np.arange(len(pal))[:, None], sel]


def _bc3_alpha_block(data: np.ndarray) -> np.ndarray:
    """(n, 8) interpolated-alpha bytes → (n, 16) uint8 alphas."""
    a0 = data[:, 0].astype(np.int32)
    a1 = data[:, 1].astype(np.int32)
    n = len(data)
    ramp = np.zeros((n, 8), np.int32)
    ramp[:, 0] = a0
    ramp[:, 1] = a1
    eight = a0 > a1
    for i in range(1, 7):
        ramp[eight, i + 1] = ((7 - i) * a0[eight] + i * a1[eight]) // 7
    six = ~eight
    for i in range(1, 5):
        ramp[six, i + 1] = ((5 - i) * a0[six] + i * a1[six]) // 5
    ramp[six, 6] = 0
    ramp[six, 7] = 255
    bits = np.zeros(n, np.uint64)
    for i in range(6):
        bits |= data[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
    sel = (bits[:, None] >> (3 * np.arange(16, dtype=np.uint64)[None, :])) & np.uint64(0x7)
    return ramp[np.arange(n)[:, None], sel.astype(np.int64)].astype(np.uint8)


def decode_dds(payload: bytes) -> np.ndarray:
    """DDS → (H, W, 4) uint8.  REAL S3TC decompression: BC1/DXT1 (incl.
    1-bit-alpha 3-color mode), BC2/DXT3 (explicit 4-bit alpha), BC3/DXT5
    (interpolated alpha ramp) — all vectorized over blocks — plus
    uncompressed 32-bit RGBA.  DX10 and exotic formats raise."""
    if payload[:4] != b"DDS " or len(payload) < 128:
        raise ValueError("not a DDS payload")
    hdr_size, _flags, h, w = struct.unpack_from("<IIII", payload, 4)
    if hdr_size != 124:
        raise ValueError("DDS: bad header size")
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise ValueError("DDS: bad dimensions")
    pf_flags, fourcc = struct.unpack_from("<I4s", payload, 80)
    data_off = 128
    if fourcc == b"DX10":
        raise ValueError("DDS: DX10 extended formats not supported")
    if pf_flags & 0x4:  # FOURCC
        bw, bh = (w + 3) // 4, (h + 3) // 4
        nblocks = bw * bh
        if fourcc == b"DXT1":
            block_bytes = 8
        elif fourcc in (b"DXT3", b"DXT5"):
            block_bytes = 16
        else:
            raise ValueError(f"DDS: unsupported fourCC {fourcc!r}")
        need = nblocks * block_bytes
        if data_off + need > len(payload):
            raise ValueError("DDS: truncated block data")
        raw = np.frombuffer(payload, np.uint8, need, data_off).reshape(nblocks, block_bytes)
        if fourcc == b"DXT1":
            texels = _bc_color_block(raw, force_opaque=False)
        elif fourcc == b"DXT3":
            texels = _bc_color_block(raw[:, 8:], force_opaque=True)
            nib = raw[:, :8]
            words = np.zeros(nblocks, np.uint64)
            for i in range(8):
                words |= nib[:, i].astype(np.uint64) << np.uint64(8 * i)
            a4 = (words[:, None] >> (4 * np.arange(16, dtype=np.uint64)[None, :])) & np.uint64(0xF)
            texels[:, :, 3] = ((a4 << np.uint64(4)) | a4).astype(np.uint8)
        else:  # DXT5
            texels = _bc_color_block(raw[:, 8:], force_opaque=True)
            texels[:, :, 3] = _bc3_alpha_block(raw[:, :8])
        # assemble 4x4 blocks (row-major blocks, row-major texels)
        img = (
            texels.reshape(bh, bw, 4, 4, 4)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bh * 4, bw * 4, 4)
        )
        return np.ascontiguousarray(img[:h, :w])
    # uncompressed path: require straightforward 32-bit RGBA masks
    if not pf_flags & 0x40:
        raise ValueError("DDS: unsupported pixel format")
    bitcount, rmask, gmask, bmask, amask = struct.unpack_from("<IIIII", payload, 88)
    if bitcount != 32:
        raise ValueError("DDS: only 32-bit uncompressed supported")
    need = w * h * 4
    if data_off + need > len(payload):
        raise ValueError("DDS: truncated pixel data")
    raw = np.frombuffer(payload, "<u4", w * h, data_off)
    out = np.zeros((h * w, 4), np.uint8)
    for ch, mask in enumerate((rmask, gmask, bmask, amask)):
        if mask == 0:
            out[:, ch] = 255 if ch == 3 else 0
            continue
        shift = (mask & -mask).bit_length() - 1
        width = int(mask >> shift).bit_length()
        vals = (raw >> shift) & ((1 << width) - 1)
        out[:, ch] = (vals * 255 // ((1 << width) - 1)).astype(np.uint8)
    return out.reshape(h, w, 4)


def encode_dds_bc1(img: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 → DDS/DXT1.  Exact-fidelity fixture encoder: each
    4×4 block may contain at most two distinct RGB565-representable colors
    (endpoints = those colors, indices 0/1) — round-trips bit-exactly."""
    if img.ndim != 3 or img.dtype != np.uint8:
        raise ValueError("encode_dds_bc1 expects (H, W, 3|4) uint8")
    h, w = img.shape[:2]
    rgb = img[:, :, :3]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    pad = np.zeros((bh * 4, bw * 4, 3), np.uint8)
    pad[:h, :w] = rgb
    pad[h:] = pad[h - 1 : h] if h < bh * 4 else pad[h:]
    pad[:, w:] = pad[:, w - 1 : w] if w < bw * 4 else pad[:, w:]
    blocks = pad.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4).reshape(-1, 16, 3)
    out = bytearray()
    for blk in blocks:
        colors = np.unique(blk.reshape(-1, 3), axis=0)
        if len(colors) > 2:
            raise ValueError("encode_dds_bc1 fixture blocks need <=2 colors")
        c = []
        for col in colors:
            v565 = ((col[0] >> 3) << 11) | ((col[1] >> 2) << 5) | (col[2] >> 3)
            back = _rgb565_to_888(np.array([v565], np.uint16))[0]
            if not (back == col).all():
                raise ValueError("encode_dds_bc1 fixture colors must be 565-exact")
            c.append(int(v565))
        if len(c) == 1:
            c.append(c[0])
        c0, c1 = (max(c), min(c))  # c0 > c1 → 4-color mode (or equal)
        if c0 == c1:
            idx = 0
        else:
            want0 = _rgb565_to_888(np.array([c0], np.uint16))[0]
            sel = (~(blk == want0).all(axis=1)).astype(np.uint32)  # 0 or 1
            idx = 0
            for i in range(16):
                idx |= int(sel[i]) << (2 * i)
        out += struct.pack("<HHI", c0, c1, idx)
    hdr = struct.pack(
        "<4sIIIIIII", b"DDS ", 124, 0x1007 | 0x80000, h, w, len(out), 0, 0
    ) + b"\x00" * 44 + struct.pack("<II4sIIIII", 32, 0x4, b"DXT1", 0, 0, 0, 0, 0) + struct.pack(
        "<IIIII", 0x1000, 0, 0, 0, 0
    )
    return hdr + bytes(out)
