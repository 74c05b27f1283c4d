"""REAL FLAC codec — stdlib + numpy only, written against RFC 9639.

Decoder handles the full subframe set (CONSTANT / VERBATIM / FIXED 0-4 /
LPC up to order 32), rice-coded residuals with partition orders and raw
escape partitions, all four channel assignments (independent, left/side,
side/right, mid/side), wasted bits, 8/16/24-bit depths, CRC-8 frame-header
and CRC-16 frame checks, and the streaminfo MD5 of the unencoded audio.

Encoder (used for fixtures AND real compression) emits CONSTANT /
VERBATIM / FIXED(best-of-0..4) / demonstration-LPC subframes, any stereo
decorrelation mode, wasted-bits packing, rice parameter search and
configurable partition order — every decoder path has an encoder switch
that exercises it, so round-trips pin the whole grid bit-exactly.

This completes the audio story the way PNG/JPEG did images: WAV (PCM) and
FLAC (compressed, lossless) decode for real; only perceptual-codec audio
(MPEG Layer III — see ``media_containers.decode_mp3``) remains a stub.
The reference (pyjelly) has no audio support; engine extension for
training-data pipelines.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import numpy as np

from pyjelly_ray.stages import cmedia

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _crc8(data: bytes) -> int:
    fast = cmedia.crc8(data)
    if fast is not None:
        return fast
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    fast = cmedia.crc16(data)
    if fast is not None:
        return fast
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length coding (extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    # payload bits: first byte holds (7 - nbytes) bits (0 for 7 bytes)
    for nbytes in range(2, 8):
        first_bits = 7 - nbytes if nbytes < 7 else 0
        if n < 1 << (first_bits + 6 * (nbytes - 1)):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = ((0xFF << (8 - nbytes)) & 0xFF) | n
            return bytes(out)
    raise ValueError("FLAC: coded number exceeds 36 bits")


class _BitWriter:
    """MSB-first bit writer."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)  # n zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over bytes; overruns raise ValueError."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self.bit
            take = min(nbits, avail)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            nbits -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= 1 << (nbits - 1) else v

    def read_unary(self) -> int:
        n = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated in unary")
            if self.read(1):
                return n
            n += 1

    def read_utf8(self) -> int:
        first = self.read(8)
        if first < 0x80:
            return first
        nbytes = 0
        mask = 0x40
        while first & mask:
            nbytes += 1
            mask >>= 1
        if nbytes < 1 or nbytes > 6:
            raise ValueError("FLAC: bad coded number")
        value = first & (mask - 1)
        for _ in range(nbytes):
            b = self.read(8)
            if b & 0xC0 != 0x80:
                raise ValueError("FLAC: bad coded-number continuation")
            value = (value << 6) | (b & 0x3F)
        return value

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


@dataclass
class FlacInfo:
    """STREAMINFO contents."""

    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    block_size: int
    md5: bytes


def _parse_streaminfo(payload: bytes) -> tuple[FlacInfo, int]:
    """Parse the metadata section; return (info, offset of first frame)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = struct.unpack_from(">I", payload, pos)[0]
        last, btype, length = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        pos += 4
        if pos + length > len(payload):
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if length != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            r = _BitReader(payload, pos)
            min_bs = r.read(16)
            r.read(16)  # max block size
            r.read(24)
            r.read(24)  # min/max frame size
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = payload[pos + 18 : pos + 34]
            if rate == 0:
                raise ValueError("FLAC: zero sample rate")
            info = FlacInfo(rate, channels, bps, total, min_bs, md5)
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        pos += length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    return info, pos


def flac_info(payload: bytes) -> FlacInfo:
    """Parse STREAMINFO (rate/channels/bits/length/MD5) — real metadata."""
    return _parse_streaminfo(payload)[0]


_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}
_BPS_TO_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}


def _decode_residual(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    po = r.read(4)
    n_part = 1 << po
    if block_size % n_part or (block_size >> po) < order:
        raise ValueError("FLAC: bad partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        n = (block_size >> po) - (order if p == 0 else 0)
        param = r.read(param_bits)
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits == 0:
                out[idx : idx + n] = 0
            else:
                for i in range(n):
                    out[idx + i] = r.read_signed(raw_bits)
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        idx += n
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    # compiled fast path (stages/_cmedia.c): stateless per subframe, so a
    # C-side error just re-runs this Python body from the same bit position
    # for the exact pure-path exception.
    fast = cmedia.flac_subframe(r.data, r.pos * 8 + r.bit, block_size, bps)
    if fast is not None:
        out, bitpos = fast
        r.pos, r.bit = bitpos >> 3, bitpos & 7
        return out
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, r.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(block_size)), np.int64, block_size
        )
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        if order > block_size:
            raise ValueError("FLAC: fixed order exceeds block size")
        warmup = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        arr = resid
        for k in range(order, 0, -1):
            init = int(np.diff(np.asarray(warmup, np.int64), k - 1)[-1])
            arr = init + np.cumsum(arr)
        out = np.concatenate([np.asarray(warmup, np.int64), arr]) if order else arr
    elif stype >= 32:  # LPC
        order = stype - 31
        if order > block_size:
            raise ValueError("FLAC: LPC order exceeds block size")
        warmup = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision escape")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        data = warmup + [0] * len(resid)
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coefs[j] * data[i - 1 - j]
            data[i] = resid[i - order] + (pred >> shift)
        out = np.asarray(data, np.int64)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return out << wasted


def decode_flac(payload: bytes, *, verify_md5: bool = True) -> tuple[np.ndarray, int, int]:
    """FLAC → ((n, channels) int32 samples, sample_rate, bits_per_sample).

    Real decode of the complete format: every subframe type, every stereo
    decorrelation, rice partitions + escapes, wasted bits, CRC-8/CRC-16
    validation, and (default) the STREAMINFO MD5 check over the decoded
    audio — any mismatch raises ``ValueError``."""
    info, pos = _parse_streaminfo(payload)
    chunks: list[np.ndarray] = []
    n_done = 0
    # total_samples == 0 means "unknown" per spec: decode frames until EOF
    while (n_done < info.total_samples) if info.total_samples else (pos < len(payload)):
        if pos + 2 > len(payload):
            raise ValueError("FLAC: stream ends before total_samples")
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        r.read_utf8()  # frame/sample number
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        bps = info.bits_per_sample if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise ValueError("FLAC: reserved sample size code")
        header_crc = r.read(8)
        if _crc8(payload[pos : r.pos - 1]) != header_crc:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            side_flags = [0] * n_ch
        elif ch_code == 8:  # left/side
            n_ch, side_flags = 2, [0, 1]
        elif ch_code == 9:  # side/right
            n_ch, side_flags = 2, [1, 0]
        elif ch_code == 10:  # mid/side
            n_ch, side_flags = 2, [0, 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if n_ch != info.channels:
            raise ValueError("FLAC: frame channel count != STREAMINFO")

        subs = [
            _decode_subframe(r, block_size, bps + side_flags[c]) for c in range(n_ch)
        ]
        r.align()
        if r.pos + 2 > len(payload):
            raise ValueError("FLAC: truncated frame footer")
        frame_crc = struct.unpack_from(">H", payload, r.pos)[0]
        if _crc16(payload[pos : r.pos]) != frame_crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        end = r.pos + 2

        if ch_code == 8:  # left/side: r = l - side
            left, side = subs
            subs = [left, left - side]
        elif ch_code == 9:  # side/right: l = r + side
            side, right = subs
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid, side = subs
            mid2 = (mid << 1) | (side & 1)
            subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        frame = np.stack(subs, axis=1)
        lim = 1 << (bps - 1)
        if frame.max(initial=0) >= lim or frame.min(initial=0) < -lim:
            raise ValueError("FLAC: decoded sample out of range")
        chunks.append(frame)
        n_done += block_size
        pos = end
    out = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, info.channels), np.int64)
    if info.total_samples and n_done != info.total_samples:
        out = out[: info.total_samples]
    if verify_md5 and info.md5 != b"\x00" * 16:
        if hashlib.md5(_interleave_bytes(out, info.bits_per_sample)).digest() != info.md5:
            raise ValueError("FLAC: MD5 mismatch (decoded audio differs)")
    return out.astype(np.int32), info.sample_rate, info.bits_per_sample


def _interleave_bytes(samples: np.ndarray, bits: int) -> bytes:
    """Channel-interleaved little-endian signed bytes (the MD5 input)."""
    flat = samples.reshape(-1)
    if bits == 8:
        return flat.astype("<i1").tobytes()
    if bits == 16:
        return flat.astype("<i2").tobytes()
    if bits == 32:
        return flat.astype("<i4").tobytes()
    if bits == 24:
        b4 = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return b4[:, :3].tobytes()
    raise ValueError(f"FLAC: unsupported bit depth {bits}")


# ----------------------------------------------------------------- encoder


def _best_rice_param(u: np.ndarray, max_param: int = 14) -> int:
    if len(u) == 0:
        return 0
    best_k, best_cost = 0, None
    total = int(u.sum())
    for k in range(max_param + 1):
        cost = (total >> k) if k == 0 else int((u >> k).sum())
        cost += len(u) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if total >> k == 0:
            break
    return best_k


def _write_residual(
    w: _BitWriter, resid: np.ndarray, order: int, block_size: int,
    partition_order: int, force_escape: bool,
) -> None:
    # clamp: short last frames can't honor every partition order
    while partition_order and (
        block_size % (1 << partition_order) or (block_size >> partition_order) < order
    ):
        partition_order -= 1
    w.write(0, 2)  # 4-bit rice method
    w.write(partition_order, 4)
    n_part = 1 << partition_order
    idx = 0
    for p in range(n_part):
        n = (block_size >> partition_order) - (order if p == 0 else 0)
        part = resid[idx : idx + n]
        idx += n
        u = (part << 1) ^ (part >> 63)  # zigzag
        if force_escape:
            if n:
                mx, mn = int(part.max()), int(part.min())
                raw = max(
                    mx.bit_length() + 1,
                    ((-mn - 1).bit_length() + 1) if mn < 0 else 1,
                )
            else:
                raw = 1
            w.write(0b1111, 4)
            w.write(raw, 5)
            for v in part.tolist():
                w.write_signed(v, raw)
            continue
        k = _best_rice_param(u)
        w.write(k, 4)
        for uv in u.tolist():
            w.write_unary(uv >> k)
            w.write(uv, k)


def _encode_subframe(
    w: _BitWriter, x: np.ndarray, bps: int, mode: str,
    partition_order: int, force_escape: bool, use_wasted: bool,
) -> None:
    x = x.astype(np.int64)
    wasted = 0
    if use_wasted and len(x) and (x != 0).any():
        nz = x[x != 0]
        tz = min(int(v & -v).bit_length() - 1 for v in nz.tolist())
        wasted = min(tz, bps - 2) if tz > 0 else 0
    if wasted:
        x = x >> wasted
    eff = bps - wasted

    def header(stype: int) -> None:
        w.write(0, 1)
        w.write(stype, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    n = len(x)
    if n and (x == x[0]).all() and mode != "verbatim":
        header(0)
        w.write_signed(int(x[0]), eff)
        return
    if mode == "verbatim":
        header(1)
        for v in x.tolist():
            w.write_signed(v, eff)
        return
    if mode == "lpc":
        # demonstration LPC: exact residuals under an arbitrary quantized
        # predictor (order 2, coefs [3, -1], shift 1) — lossless regardless
        order = min(2, n)
        if order < 2:
            header(1)
            for v in x.tolist():
                w.write_signed(v, eff)
            return
        coefs, shift, prec = [3, -1], 1, 4
        resid = np.empty(n - order, np.int64)
        for i in range(order, n):
            pred = (coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift
            resid[i - order] = x[i] - pred
        header(32 + order - 1)
        for v in x[:order].tolist():
            w.write_signed(v, eff)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        _write_residual(w, resid, order, n, partition_order, force_escape)
        return
    # fixed: best order by residual magnitude
    best_order, best_resid, best_cost = 0, x, None
    for order in range(0, min(4, n - 1) + 1):
        resid = np.diff(x, order)
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    header(8 + best_order)
    for v in x[:best_order].tolist():
        w.write_signed(v, eff)
    _write_residual(w, best_resid, best_order, n, partition_order, force_escape)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    bits: int = 16,
    block_size: int = 4096,
    mode: str = "fixed",  # fixed | verbatim | lpc
    stereo_mode: str = "independent",  # independent | left_side | side_right | mid_side
    partition_order: int = 0,
    force_escape: bool = False,
    use_wasted: bool = True,
) -> bytes:
    """(n,) or (n, channels) int → FLAC bytes (lossless).

    Every decoder path has a switch here: ``mode`` picks the subframe
    family, ``stereo_mode`` the channel decorrelation, ``partition_order``
    the rice partitioning, ``force_escape`` the raw-escape partitions and
    ``use_wasted`` the wasted-bits packing."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("encode_flac expects (n,) or (n, channels)")
    n, channels = samples.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lim = 1 << (bits - 1)
    s = samples.astype(np.int64)
    if s.max(initial=0) >= lim or s.min(initial=0) < -lim:
        raise ValueError(f"samples exceed {bits}-bit range")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    md5 = hashlib.md5(_interleave_bytes(s, bits)).digest()
    head = _BitWriter()
    head.write(0x664C6143, 32)  # fLaC
    head.write(1, 1)  # last metadata block
    head.write(0, 7)  # STREAMINFO
    head.write(34, 24)
    head.write(block_size, 16)
    head.write(block_size, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(channels - 1, 3)
    head.write(bits - 1, 5)
    head.write(n, 36)
    out = bytearray(head.getvalue())
    out += md5

    ch_code = {
        "independent": channels - 1,
        "left_side": 8,
        "side_right": 9,
        "mid_side": 10,
    }[stereo_mode]

    frame_no = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(ch_code, 4)
        w.write(_BPS_TO_CODE[bits], 3)
        w.write(0, 1)
        for b in _utf8_code(frame_no):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr_bytes = w.getvalue() if w.nbits == 0 else None
        assert hdr_bytes is not None  # header is byte-aligned by construction
        w.write(_crc8(hdr_bytes), 8)

        if stereo_mode == "independent":
            chans = [(blk[:, c], bits) for c in range(channels)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "side_right":
                chans = [(side, bits + 1), (right, bits)]
            else:
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
        for x, bps in chans:
            _encode_subframe(w, x, bps, mode, partition_order, force_escape, use_wasted)
        w.align()
        frame = w.getvalue()
        out += frame
        out += struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


# ------------------------------------------------------------- Ray stage


class FlacAudioStage:
    """REAL actor-pool audio stage: FLAC decode → feature vector per clip
    (same output schema as ``multimodal.WavAudioStage``)."""

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def __call__(self, batch):
        import pyarrow as pa

        from pyjelly_ray.stages.multimodal import audio_features

        feats, rates, n_samples = [], [], []
        for p in batch.column("payload").to_pylist():
            samples, rate, _bits = decode_flac(p)
            mono = samples[:, 0].astype(np.int16)
            rates.append(rate)
            n_samples.append(len(mono))
            feats.append(audio_features(mono, rate, self.n_bands))
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


def synth_flac_table(n: int = 16, seed: int = 17, rate: int = 8000, dur_s: float = 0.2):
    """Deterministic real FLAC clips (tone + noise, stereo, mid-side)."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * dur_s)) / rate
    rows = []
    for i in range(n):
        f0 = 180.0 + 55.0 * (i % 7)
        left = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.04 * rng.standard_normal(len(t))
        right = 0.5 * np.sin(2 * np.pi * f0 * t + 0.4) + 0.04 * rng.standard_normal(len(t))
        stereo = np.stack(
            [
                np.clip(left * 32767, -32768, 32767).astype(np.int16),
                np.clip(right * 32767, -32768, 32767).astype(np.int16),
            ],
            axis=1,
        )
        rows.append(
            {
                "media_id": i,
                "media_type": "audio/flac",
                "payload": encode_flac(stereo, rate, stereo_mode="mid_side"),
                "width": 0,
                "height": 0,
            }
        )
    from pyjelly_ray.stages.multimodal import MEDIA_SCHEMA

    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
