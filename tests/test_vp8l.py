"""WebP-lossless (VP8L) codec grid — own encoder as the fixture writer
(same strategy as the GIF/FLAC/JPEG codecs): every decoder path has an
encoder switch, round-trips must be pixel-exact, corrupt inputs must
raise ValueError."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyjelly_ray.stages.vp8l import (
    _DIST_TABLE,
    _Huff,
    _Reader,
    _Writer,
    _canonical_codes,
    _package_merge,
    _prefix_decode,
    _prefix_encode,
    _read_huffman_code,
    decode_vp8l,
    decode_webp_lossless,
    encode_vp8l,
    encode_webp_lossless,
)

rng = np.random.default_rng(77)


def rt(img, **kw):
    p = encode_webp_lossless(img, **kw)
    out = decode_webp_lossless(p)
    c = img.shape[2]
    assert out.shape == (img.shape[0], img.shape[1], 4)
    assert (out[:, :, :c] == img).all(), kw
    if c == 3:
        assert (out[:, :, 3] == 255).all()
    return p


# ------------------------------------------------------------- invariants


def test_distance_table_layout():
    # 120 unique causal offsets; the spec's listed prefix order
    assert len(set(_DIST_TABLE)) == 120
    assert _DIST_TABLE[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    for x, y in _DIST_TABLE:
        assert (y == 0 and 1 <= x <= 8) or (1 <= y <= 7 and -8 <= x <= 7)


def test_prefix_code_roundtrip():
    for v in list(range(1, 50)) + [63, 64, 1000, 4096]:
        code, extra, ebits = _prefix_encode(v)
        w = _Writer()
        w.write(extra, ebits)
        r = _Reader(w.getvalue() or b"\x00")
        assert _prefix_decode(code, r) == v


def test_package_merge_kraft():
    for freqs in ([3, 1, 4, 1, 5], [1] * 300, [100, 1], [7]):
        ln = _package_merge(freqs)
        nz = [x for x in ln if x]
        if len(nz) > 1:
            assert abs(sum(2.0 ** -x for x in nz) - 1.0) < 1e-12
        assert max(ln) <= 15


def test_code_length_repeat_ops_decode():
    """Hand-emit a normal code using the 16/17/18 repeat ops (which the
    fixture encoder never writes) and check the decoder reconstructs the
    intended lengths."""
    # target: syms 0..7 len 4, 8..18 zero (17 op), 19..29 len 4 via 16 ops,
    # rest zero via 18; alphabet 280
    target = [0] * 280
    for s in range(8):
        target[s] = 4
    for s in range(19, 30):
        target[s] = 4
    # pad to make the code complete: kraft of 19 syms at len 4 = 19/16 > 1;
    # use len 5 for all -> 19/32, add one len-2, one len-3, rest len-5 making
    # kraft exact: 1/4 + 1/8 + 19/32 = 0.96875; + 1/32 = 1.0 -> one more len-5
    target = [0] * 280
    target[0] = 2
    target[1] = 3
    for s in range(2, 10):
        target[s] = 5
    for s in range(19, 31):
        target[s] = 5
    # kraft: 1/4 + 1/8 + 20/32 = 1.0  (8 + 12 = 20 five-bit codes)
    assert abs(sum(2.0 ** -x for x in target if x) - 1.0) < 1e-12

    # code-length code over symbols {0,2,3,5,16,17,18}
    cl_lengths = [0] * 19
    for s in (2, 3, 5, 16, 17, 18, 0):
        cl_lengths[s] = 3
    cl_lengths[0] = 2  # make it complete: 6*2^-3 + 2^-2 = 1.0
    assert abs(sum(2.0 ** -x for x in cl_lengths if x) - 1.0) < 1e-12
    cl_codes = _canonical_codes(cl_lengths)

    w = _Writer()
    w.write(0, 1)  # normal code
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    # cover indices of all nonzero cl symbols in order
    need = max(i for i, cl in enumerate(order) if cl_lengths[cl] > 0) + 1
    w.write(need - 4, 4)
    for i in range(need):
        w.write(cl_lengths[order[i]], 3)
    w.write(0, 1)  # no max_symbol
    emit = lambda s: w.write_code(*cl_codes[s])  # noqa: E731
    emit(2)                      # sym0 len 2
    emit(3)                      # sym1 len 3
    emit(5)                      # sym2 len 5
    emit(16); w.write(0, 2)      # repeat prev len 3x -> syms 3..5
    emit(16); w.write(1, 2)      # repeat prev len 4x -> syms 6..9
    emit(17); w.write(6, 3)      # 3+6=9 zeros -> syms 10..18
    emit(5)                      # sym 19
    emit(16); w.write(2, 2)      # 5x -> 20..24
    emit(16); w.write(3, 2)      # 6x -> 25..30
    emit(18); w.write(116, 7)    # 11+116=127 zeros -> symbol 158
    emit(18); w.write(111, 7)    # 11+111=122 zeros -> symbol 280 exactly

    h = _read_huffman_code(_Reader(w.getvalue()), 280)
    # decode each symbol back through the table
    codes = _canonical_codes(target)
    for sym, (code, ln) in sorted(codes.items()):
        w2 = _Writer()
        w2.write_code(code, ln)
        assert h.read(_Reader(w2.getvalue() or b"\x00")) == sym


def test_huff_single_and_completeness():
    h = _Huff([0, 1, 0])
    assert h.single == 1
    with pytest.raises(ValueError):
        _Huff([2, 2, 2])  # kraft 3/4: incomplete
    with pytest.raises(ValueError):
        _Huff([1, 1, 1])  # oversubscribed / incomplete mix
    with pytest.raises(ValueError):
        _Huff([0, 0])  # empty


# ------------------------------------------------------------------ grids


def test_basic_rgb_rgba():
    rt(rng.integers(0, 256, (21, 19, 3), dtype=np.uint8))
    rt(rng.integers(0, 256, (12, 33, 4), dtype=np.uint8))


def test_lz77_and_cache_switches():
    img = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    rt(img, use_lz77=False)
    for bits in (1, 4, 8, 11):
        rt(img, cache_bits=bits)
    rt(img, force_normal=True)


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes(mode):
    smooth = (
        np.linspace(0, 200, 19)[None, :, None]
        + np.linspace(0, 40, 21)[:, None, None]
        + rng.integers(0, 9, (21, 19, 3))
    ).astype(np.uint8)
    rt(smooth, predictor_mode=mode, predictor_size_bits=(2 if mode % 3 else 4))


def test_subtract_green_and_cross_color():
    img = rng.integers(0, 256, (22, 30, 3), dtype=np.uint8)
    rt(img, subtract_green=True)
    rt(img, cross_color=(10, -20, 5))
    rt(img, cross_color=(-128, 127, 33), cross_color_size_bits=2)
    rt(img, subtract_green=True, predictor_mode=7, cross_color=(4, 4, 4))


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 17, 130, 256])
def test_palette_bundling_widths(ncol):
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (15, 23))
    rt(pal[idx], palette=True)


def test_palette_rgba():
    pal = rng.integers(0, 256, (7, 4), dtype=np.uint8)
    idx = rng.integers(0, 7, (9, 31))
    rt(pal[idx], palette=True)


def test_meta_huffman_groups():
    img = rng.integers(0, 256, (22, 30, 3), dtype=np.uint8)
    rt(img, meta_bits=2)
    rt(img, meta_bits=4, cache_bits=4)
    rt(img, meta_bits=3, subtract_green=True)
    rt(rng.integers(0, 256, (40, 3, 3), dtype=np.uint8), meta_bits=2)


def test_edge_shapes_and_runs():
    rt(np.full((8, 8, 3), 7, np.uint8))          # constant (dist-1 runs)
    rt(np.full((1, 1, 3), 200, np.uint8))
    rt(rng.integers(0, 256, (1, 40, 3), dtype=np.uint8))
    rt(rng.integers(0, 256, (40, 1, 3), dtype=np.uint8))
    v = np.tile(rng.integers(0, 256, (1, 16, 3), dtype=np.uint8), (20, 1, 1))
    rt(v)                                        # vertical (dist=width) refs


def test_container_and_sniff():
    from pyjelly_ray.stages.media_containers import decode_webp, webp_info
    from pyjelly_ray.stages.multimodal import sniff_decode_image

    img = rng.integers(0, 256, (14, 18, 4), dtype=np.uint8)
    p = encode_webp_lossless(img)
    info = webp_info(p)
    assert (info.format, info.width, info.height) == ("lossless", 18, 14)
    out = decode_webp(p)
    assert (out == img).all()
    assert (sniff_decode_image(p) == img).all()


def test_corruption_fuzz():
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    good = encode_webp_lossless(img)
    n_err = 0
    for k in range(20, len(good), 17):
        bad = good[:k] + bytes([good[k] ^ 0x3C]) + good[k + 1 :]
        try:
            out = decode_webp_lossless(bad)
            assert out.shape[2] == 4  # decoded to something structurally valid
        except ValueError:
            n_err += 1
    assert n_err > 0  # corruption is detected, never crashes un-normalized


def test_truncation_raises():
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    good = encode_webp_lossless(img)
    for cut in (13, 25, len(good) - 3):
        with pytest.raises(ValueError):
            decode_webp_lossless(good[:cut])


def test_bad_signature():
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x00\x00")
    with pytest.raises(ValueError):
        decode_webp_lossless(b"RIFF\x04\x00\x00\x00WAVE")


def test_vp8x_extended_with_vp8l_stream_decodes():
    """Extended container carrying a lossless stream decodes for real."""
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    base = encode_webp_lossless(img)
    vp8l_chunk = base[12:]  # VP8L chunk incl. header
    w, h = 11, 9
    vp8x = struct.pack("<I", 0) [:1] * 0  # placeholder, build below
    body = b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00" \
        + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3] + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    out = decode_webp_lossless(payload)
    assert (out[:, :, :3] == img).all()
