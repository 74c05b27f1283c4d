"""GIF/BMP codecs, MP4 demux, MP3 metadata — the round-4 container layer.

Round-trip grids are bit-exact; corruption fuzz must raise ValueError (never
crash or return garbage); compressed bitstreams (H.264 in MP4, Layer III
audio) stay honest NotImplementedError stubs at exactly the codec step.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from pyjelly_ray.stages.media_containers import (
    GifFrame,
    Mp3Info,
    decode_bmp,
    decode_gif,
    decode_mp3,
    decode_mp4_video,
    demux_mp4,
    encode_bmp,
    encode_gif,
    encode_mp4_rawvideo,
    mp3_info,
    parse_mp4_boxes,
    synth_mp3_stream,
)
from pyjelly_ray.stages.multimodal import (
    FrameSampleStub,
    ImageDecodeStub,
    decode_png,
    sniff_decode_image,
)


# ------------------------------------------------------------------ GIF ---


@pytest.mark.parametrize("colors", [2, 3, 16, 100, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_grid(colors, interlace):
    rng = np.random.default_rng(colors * 2 + interlace)
    pal = np.unique(rng.integers(0, 256, (colors, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (21, 33))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


def test_gif_large_forces_12bit_codes_and_table_reset():
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (180, 260))]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_high_redundancy_kwkwk():
    # repeated runs exercise the code==next_code (KwKwK) decoder branch
    row = np.repeat(np.arange(50, dtype=np.uint8) * 5, 6)
    img = np.dstack([row, row // 2, row // 3])[None].repeat(40, 0).reshape(40, 300, 3)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_transparency_rgba():
    pal = np.array([[1, 2, 3], [200, 100, 50], [9, 9, 9]], np.uint8)
    rng = np.random.default_rng(8)
    img = pal[rng.integers(0, 3, (12, 14))]
    out = decode_gif(encode_gif(img, transparent_color=(1, 2, 3)))
    assert out.shape == (12, 14, 4)
    assert ((out[:, :, 3] == 0) == (img == [1, 2, 3]).all(axis=2)).all()
    assert (out[:, :, :3] == img).all()


def test_gif_multi_frame_all_frames():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    rng = np.random.default_rng(4)
    f1 = pal[rng.integers(0, 2, (10, 10))]
    f2 = pal[rng.integers(0, 2, (10, 10))]
    g1, g2 = encode_gif(f1), encode_gif(f2)
    # splice a 2-frame animation: header+lsd+palette from g1, image blocks
    hdr_end = 13 + 3 * 2  # header + LSD + 2-entry global table
    two = g1[:-1] + g2[hdr_end:]  # drop g1 trailer, append g2's image+trailer
    frames = decode_gif(two, all_frames=True)
    assert len(frames) == 2 and isinstance(frames[0], GifFrame)
    assert (frames[0].pixels == f1).all() and (frames[1].pixels == f2).all()
    assert (decode_gif(two) == f1).all()  # first-frame mode


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif_corruption_fuzz():
    rng = np.random.default_rng(99)
    pal = np.unique(rng.integers(0, 256, (40, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (16, 16))]
    good = bytearray(encode_gif(img))
    for trial in range(120):
        bad = bytearray(good)
        op = trial % 3
        if op == 0:  # truncate
            bad = bad[: rng.integers(1, len(bad))]
        elif op == 1:  # flip a byte
            bad[rng.integers(6, len(bad))] ^= 1 << rng.integers(0, 8)
        else:  # garbage tail block type
            bad[-1] = rng.integers(0, 256)
        try:
            decode_gif(bytes(bad))
        except ValueError:
            pass  # the only acceptable failure mode


# ------------------------------------------------------------------ BMP ---


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (13, 31)])
def test_bmp_roundtrip(shape):
    rng = np.random.default_rng(shape[0])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert (out == img).all()


def test_bmp_8bit_palette_and_topdown():
    import struct

    pal = [(i, 255 - i, i // 2) for i in range(16)]
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    row_bytes = (5 + 3) & ~3
    rows = np.zeros((6, row_bytes), np.uint8)
    rows[:, :5] = idx  # top-down storage
    data_off = 14 + 40 + 4 * 16
    payload = (
        struct.pack("<2sIHHI", b"BM", data_off + rows.size, 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, 5, -6, 1, 8, 0, rows.size, 0, 0, 16, 0)
        + b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
        + rows.tobytes()
    )
    out = decode_bmp(payload)
    expect = np.array(pal, np.uint8)[idx]
    assert (out == expect).all()


def test_bmp_corruption():
    img = np.zeros((4, 4, 3), np.uint8)
    good = encode_bmp(img)
    with pytest.raises(ValueError):
        decode_bmp(good[:30])
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])
    bad = bytearray(good)
    bad[28] = 16  # unsupported bpp
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


# ------------------------------------------------------------------ MP4 ---


def test_mp4_rawvideo_roundtrip():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (9, 15, 22, 3), dtype=np.uint8)
    payload = encode_mp4_rawvideo(frames, fps=3)
    out = decode_mp4_video(payload)
    assert (out == frames).all()


def test_mp4_demux_sample_tables():
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (6, 4, 5, 3), dtype=np.uint8)
    payload = encode_mp4_rawvideo(frames, fps=10)
    (tr,) = demux_mp4(payload)
    assert tr.handler == "vide" and tr.codec == "raw "
    assert tr.width == 5 and tr.height == 4
    assert tr.timescale == 10 and tr.duration == 6
    assert tr.n_samples == 6
    assert (tr.sample_sizes == 4 * 5 * 3).all()
    assert (np.diff(tr.sample_offsets) == 4 * 5 * 3).all()
    assert (tr.sample_times == np.arange(6)).all()
    # per-sample byte extraction matches the source frames
    for i in range(6):
        assert tr.sample(payload, i) == frames[i].tobytes()


def test_mp4_box_tree_shape():
    payload = encode_mp4_rawvideo(np.zeros((2, 3, 3, 3), np.uint8))
    boxes = parse_mp4_boxes(payload)
    assert [b.type for b in boxes] == [b"ftyp", b"mdat", b"moov"]
    moov = boxes[2]
    assert moov.find(b"trak", b"mdia", b"minf", b"stbl", b"stsz") is not None


def test_mp4_compressed_codec_is_honest_stub():
    payload = bytearray(encode_mp4_rawvideo(np.zeros((2, 3, 3, 3), np.uint8)))
    idx = payload.find(b"raw \x00\x00\x00\x00\x00\x00\x00\x01")  # stsd entry fourcc
    assert idx > 0
    payload[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_video(bytes(payload))
    # but the demux itself still works on the compressed file
    (tr,) = demux_mp4(bytes(payload))
    assert tr.codec == "avc1" and tr.n_samples == 2


def test_mp4_corruption_fuzz():
    rng = np.random.default_rng(77)
    good = encode_mp4_rawvideo(np.zeros((3, 4, 4, 3), np.uint8))
    for trial in range(100):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(1, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_mp4_video(bytes(bad))
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError crash: {type(exc).__name__}: {exc}")


def test_frame_sample_stage_mp4_real(ray_session):
    import ray

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (8, 6, 6, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_mp4_rawvideo(frames)], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl).map_batches(
        FrameSampleStub, fn_constructor_kwargs={"n_frames": 3, "fake": False},
        concurrency=1, batch_size=4, batch_format="pyarrow",
    )
    rows = sorted(ds.take_all(), key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in rows] == [0, 1, 2]
    assert (decode_png(rows[0]["frame"]) == frames[0]).all()
    assert (decode_png(rows[2]["frame"]) == frames[7]).all()


# ------------------------------------------------------------------ MP3 ---


@pytest.mark.parametrize("id3", [False, True])
@pytest.mark.parametrize("xing", [False, True])
def test_mp3_info_grid(id3, xing):
    payload = synth_mp3_stream(15, id3=id3, xing=xing)
    info = mp3_info(payload)
    assert isinstance(info, Mp3Info)
    assert info.version == "1" and info.layer == 3
    assert info.sample_rate == 44100 and info.channels == 2
    assert info.n_frames == 15
    assert info.bitrate_kbps == 128.0
    assert info.duration_s == pytest.approx(15 * 1152 / 44100)
    assert info.vbr is xing
    assert info.xing_frames == (15 if xing else None)


def test_mp3_other_rates():
    payload = synth_mp3_stream(6, bitrate_kbps=320, sample_rate=32000)
    info = mp3_info(payload)
    assert info.bitrate_kbps == 320.0 and info.sample_rate == 32000
    assert info.duration_s == pytest.approx(6 * 1152 / 32000)


def test_mp3_decode_is_honest_stub():
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_mp3(synth_mp3_stream(4))


def test_mp3_garbage_rejected():
    with pytest.raises(ValueError):
        mp3_info(b"\x00" * 4096)
    with pytest.raises(ValueError):
        mp3_info(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")  # tag past EOF
    # truncated final frame is dropped, stream still parses
    payload = synth_mp3_stream(5)
    info = mp3_info(payload[:-50])
    assert info.n_frames == 4


# --------------------------------------------------- sniff integration ---


def test_sniff_decodes_gif_and_bmp():
    rng = np.random.default_rng(21)
    pal = np.unique(rng.integers(0, 256, (30, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (10, 12))]
    assert (sniff_decode_image(encode_gif(img)) == img).all()
    assert (sniff_decode_image(encode_bmp(img)) == img).all()


def test_image_decode_stage_gif_real(ray_session):
    import ray

    rng = np.random.default_rng(22)
    pal = np.unique(rng.integers(0, 256, (12, 3), dtype=np.uint8), axis=0)
    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [
                    encode_gif(pal[rng.integers(0, len(pal), (40, 40))]),
                    encode_bmp(pal[rng.integers(0, len(pal), (40, 40))]),
                ],
                pa.binary(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).map_batches(
        ImageDecodeStub, fn_constructor_kwargs={"n_features": 16, "fake": False},
        concurrency=1, batch_size=8, batch_format="pyarrow",
    )
    rows = ds.take_all()
    assert len(rows) == 2 and all(len(r["features"]) == 16 for r in rows)


# ----------------------------------------------------------------- TIFF ---

from pyjelly_ray.stages.media_containers import decode_tiff, encode_tiff  # noqa: E402


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_roundtrip_grid(comp, big_endian):
    rng = np.random.default_rng(7 if big_endian else 8)
    for shape in [(13, 17), (13, 17, 3), (9, 11, 4), (1, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        exp = img[:, :, None] if img.ndim == 2 else img
        out = decode_tiff(encode_tiff(img, compression=comp, big_endian=big_endian))
        assert (out == exp).all(), shape
        out = decode_tiff(
            encode_tiff(img, compression=comp, big_endian=big_endian, rows_per_strip=5)
        )
        assert (out == exp).all(), (shape, "strips")


@pytest.mark.parametrize("comp", ["packbits", "lzw"])
def test_tiff_predictor(comp):
    # smooth data: horizontal differencing must shrink LZW dramatically
    grad = np.tile(np.arange(600, dtype=np.uint8), (40, 1))
    enc_plain = encode_tiff(grad, compression=comp)
    enc_pred = encode_tiff(grad, compression=comp, predictor=True, rows_per_strip=16)
    assert (decode_tiff(enc_pred)[:, :, 0] == grad).all()
    if comp == "lzw":
        assert len(enc_pred) < len(enc_plain) / 4


def test_tiff_lzw_12bit_growth_and_clear():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (80, 700), dtype=np.uint8)  # >4094 table entries
    assert (decode_tiff(encode_tiff(noise, compression="lzw"))[:, :, 0] == noise).all()


def test_tiff_whiteiszero_and_palette():
    # hand-build photometric=0 (WhiteIsZero) and palette images
    gray = np.arange(0, 250, 10, dtype=np.uint8).reshape(5, 5)
    enc = bytearray(encode_tiff(gray, compression="none"))
    # flip photometric tag (262) value from 1 to 0 in the IFD
    idx = enc.find(struct.pack("<HHI", 262, 3, 1))
    assert idx > 0
    enc[idx + 8] = 0
    out = decode_tiff(bytes(enc))
    assert (out[:, :, 0] == 255 - gray).all()


def test_tiff_corruption_fuzz():
    rng = np.random.default_rng(55)
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw"):
        good = encode_tiff(img, compression=comp)
        for trial in range(60):
            bad = bytearray(good)
            if trial % 2 == 0:
                bad = bad[: rng.integers(4, len(bad))]
            else:
                bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
            try:
                decode_tiff(bytes(bad))
            except ValueError:
                pass
            except Exception as exc:  # pragma: no cover
                raise AssertionError(f"non-ValueError: {type(exc).__name__}: {exc}")


def test_sniff_decodes_tiff():
    rng = np.random.default_rng(70)
    img = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    for be in (False, True):
        got = sniff_decode_image(encode_tiff(img, compression="lzw", big_endian=be))
        assert (got == img).all()


# ------------------------------------------------- ID3v2 + widened WAV ---

from pyjelly_ray.stages.media_containers import id3v2_tags  # noqa: E402
from pyjelly_ray.stages.multimodal import decode_wav, decode_wav_ex, encode_wav  # noqa: E402


def test_id3v2_text_frames():
    payload = synth_mp3_stream(5, id3=True)
    assert id3v2_tags(payload) == {"TIT2": "synthetic clip", "TPE1": "pyjelly_ray"}
    assert id3v2_tags(synth_mp3_stream(3)) == {}
    # the tag does not perturb the frame walk
    assert mp3_info(payload).n_frames == 5


def test_id3v2_v23_utf16():
    text = "tïtle — ünïcode"
    enc = text.encode("utf-16")
    frame = b"TIT2" + struct.pack(">I", 1 + len(enc)) + b"\x00\x00\x01" + enc
    sz = len(frame)
    tag = b"ID3\x03\x00\x00" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + frame
    assert id3v2_tags(tag) == {"TIT2": text}


def test_id3v2_malformed():
    with pytest.raises(ValueError):
        id3v2_tags(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")  # size past EOF
    # frame overrunning the tag
    frame = b"TIT2" + bytes([0, 0, 0, 60]) + b"\x00\x00\x03abc"
    sz = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, (sz >> 7) & 0x7F, sz & 0x7F]) + frame
    with pytest.raises(ValueError):
        id3v2_tags(tag)


def _wav_raw(fmt, channels, rate, bits, data):
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        fmt, channels, rate, rate * channels * bits // 8, channels * bits // 8,
        bits, b"data", len(data),
    ) + data


def test_wav_ex_stereo_and_depths():
    rng = np.random.default_rng(31)
    mono = (rng.normal(0, 8000, 300)).astype(np.int16)
    st = np.stack([mono, -mono], axis=1)
    x, r, b = decode_wav_ex(_wav_raw(1, 2, 8000, 16, st.astype("<i2").tobytes()))
    assert x.shape == (300, 2) and (x == st).all() and (r, b) == (8000, 16)

    u8 = ((mono // 256) + 128).astype(np.uint8)
    x, _, b = decode_wav_ex(_wav_raw(1, 1, 8000, 8, u8.tobytes()))
    assert b == 8 and (x[:, 0] == u8.astype(np.int32) - 128).all()

    v24 = mono.astype(np.int32) * 127
    b3 = v24.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    x, _, b = decode_wav_ex(_wav_raw(1, 1, 8000, 24, b3))
    assert b == 24 and (x[:, 0] == v24).all()

    f32 = (mono / 32768.0).astype(np.float32)
    x, _, b = decode_wav_ex(_wav_raw(3, 1, 8000, 32, f32.tobytes()))
    assert x.dtype == np.float32 and np.allclose(x[:, 0], f32)
    # 16-bit wrapper view stays within 1 LSB of the original
    s, _ = decode_wav(_wav_raw(3, 1, 8000, 32, f32.tobytes()))
    assert np.abs(s.astype(int) - mono).max() <= 1


def test_wav_ex_extensible_and_compressed():
    rng = np.random.default_rng(32)
    v24 = rng.integers(-(1 << 23), 1 << 23, 64)
    b3 = v24.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    ext = (
        struct.pack(
            "<4sI4s4sIHHIIHH", b"RIFF", 60 + len(b3), b"WAVE", b"fmt ", 40,
            0xFFFE, 1, 8000, 8000 * 3, 3, 24,
        )
        + struct.pack("<HHI", 22, 24, 0)
        + struct.pack("<H", 1)  # PCM subformat
        + b"\x00" * 14
        + struct.pack("<4sI", b"data", len(b3))
        + b3
    )
    x, r, b = decode_wav_ex(ext)
    assert b == 24 and (x[:, 0] == v24).all()
    with pytest.raises(ValueError, match="compressed"):
        decode_wav_ex(_wav_raw(85, 1, 8000, 16, b"\x00" * 64))  # MP3-in-WAV


def test_wav_pcm16_mono_unchanged():
    mono = (np.sin(np.arange(500) / 9) * 15000).astype(np.int16)
    s, r = decode_wav(encode_wav(mono, 16000))
    assert r == 16000 and (s == mono).all()


# ----------------------------------------------- property-based checks ---

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hs  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    h=hs.integers(1, 24), w=hs.integers(1, 24), colors=hs.integers(1, 32),
    interlace=hs.booleans(), seed=hs.integers(0, 2**31),
)
def test_gif_roundtrip_property(h, w, colors, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (colors, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (h, w))]
    assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()


@settings(max_examples=40, deadline=None)
@given(
    n=hs.integers(0, 700), seed=hs.integers(0, 2**31),
    mode=hs.sampled_from(["fixed", "verbatim", "lpc"]),
    stereo=hs.sampled_from(["independent", "left_side", "side_right", "mid_side"]),
    po=hs.integers(0, 3), block=hs.sampled_from([64, 192, 256]),
)
def test_flac_roundtrip_property(n, seed, mode, stereo, po, block):
    from pyjelly_ray.stages.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, (n, 2)).astype(np.int16)
    enc = encode_flac(
        x, 8000, mode=mode, stereo_mode=stereo, partition_order=po, block_size=block
    )
    dec, _, _ = decode_flac(enc)
    assert (dec == x).all()


@settings(max_examples=40, deadline=None)
@given(
    h=hs.integers(1, 20), w=hs.integers(1, 20), spp=hs.sampled_from([1, 3, 4]),
    comp=hs.sampled_from(["none", "packbits", "lzw"]),
    rps=hs.integers(1, 8), seed=hs.integers(0, 2**31),
)
def test_tiff_roundtrip_property(h, w, spp, comp, rps, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if spp == 1 else (h, w, spp)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    exp = img[:, :, None] if img.ndim == 2 else img
    out = decode_tiff(encode_tiff(img, compression=comp, rows_per_strip=rps))
    assert (out == exp).all()


# ------------------------------------------- G.711 + AIFF + AU formats ---

from pyjelly_ray.stages.media_containers import (  # noqa: E402
    alaw_decode,
    alaw_encode,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
    mulaw_decode,
    mulaw_encode,
)


def _tone(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return (np.sin(np.arange(n) / 7) * 20000 + rng.normal(0, 300, n)).astype(np.int16)


@pytest.mark.parametrize("enc,dec", [(mulaw_encode, mulaw_decode), (alaw_encode, alaw_decode)])
def test_g711_canonical_roundtrip(enc, dec):
    # decode of all 256 codes must re-encode to the same codes
    codes = np.arange(256, dtype=np.uint8)
    lin = dec(codes)
    assert (dec(enc(lin)) == lin).all()
    # companding error bounded by the top-segment step size
    x = _tone()
    assert np.abs(dec(enc(x)).astype(int) - x).max() <= 512


def test_g711_spot_values():
    # published reference points: silence maps to 0xFF (mu) / 0xD5 (A)
    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert alaw_encode(np.array([0], np.int16))[0] == 0xD5
    assert alaw_decode(np.array([0xD5], np.uint8))[0] == 8


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aiff_roundtrip(bits):
    x = _tone(800)
    scale = {8: x >> 8, 16: x, 24: x.astype(np.int32) * 100, 32: x.astype(np.int32) * 30000}[bits]
    src = np.stack([scale, -scale], axis=1)
    out, r, b = decode_aiff(encode_aiff(src, 44100, bits=bits))
    assert r == 44100 and b == bits and (out == src).all()


def test_aiff_rejects_compressed_and_garbage():
    x = np.zeros((10, 1), np.int16)
    good = bytearray(encode_aiff(x, 8000))
    good[8:12] = b"AIFC"
    with pytest.raises(ValueError, match="AIFC"):
        decode_aiff(bytes(good))
    with pytest.raises(ValueError):
        decode_aiff(b"RIFF" + bytes(20))


@pytest.mark.parametrize("encoding", ["pcm16", "mulaw", "alaw"])
def test_au_roundtrip(encoding):
    st = np.stack([_tone(500), -_tone(500)], axis=1)
    out, r, name = decode_au(encode_au(st, 8000, encoding=encoding))
    assert r == 8000 and name == encoding and out.shape == st.shape
    if encoding == "pcm16":
        assert (out == st).all()
    else:
        assert np.abs(out.astype(int) - st).max() <= 512


def test_au_bad_header():
    with pytest.raises(ValueError):
        decode_au(b"FORM" + bytes(30))
    with pytest.raises(ValueError, match="encoding"):
        decode_au(struct.pack(">4sIIIII", b".snd", 24, 4, 99, 8000, 1) + bytes(4))


def test_sniff_decode_audio_dispatch():
    from pyjelly_ray.stages.flac import encode_flac
    from pyjelly_ray.stages.media_containers import sniff_decode_audio

    x = _tone(600)
    for payload in (
        encode_wav(x, 8000),
        encode_flac(x, 8000),
        encode_aiff(x, 8000),
        encode_au(x, 8000, encoding="pcm16"),
    ):
        mono, rate = sniff_decode_audio(payload)
        assert rate == 8000 and (mono == x).all()
    mono, rate = sniff_decode_audio(encode_au(x, 8000, encoding="mulaw"))
    assert np.abs(mono.astype(int) - x).max() <= 512
    with pytest.raises(NotImplementedError):
        sniff_decode_audio(synth_mp3_stream(3))
    with pytest.raises(NotImplementedError):
        sniff_decode_audio(b"\x00unknown")


def test_audio_decode_stage_multiformat(ray_session):
    import ray

    from pyjelly_ray.stages.flac import encode_flac
    from pyjelly_ray.stages.media_containers import AudioDecodeStage

    x = _tone(700)
    payloads = [
        encode_wav(x, 8000),
        encode_flac(x, 8000),
        encode_aiff(x, 8000),
        encode_au(x, 8000, encoding="alaw"),
    ]
    tbl = pa.table(
        {
            "media_id": pa.array(range(4), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl).map_batches(
        AudioDecodeStage, concurrency=1, batch_size=2, batch_format="pyarrow"
    )
    rows = sorted(ds.take_all(), key=lambda r: r["media_id"])
    assert len(rows) == 4 and all(r["n_samples"] == 700 for r in rows)
    # lossless formats produce IDENTICAL features; companded is close
    f = [np.array(r["features"]) for r in rows]
    assert np.array_equal(f[0], f[1]) and np.array_equal(f[0], f[2])
    assert np.allclose(f[0], f[3], rtol=0.1, atol=0.05)


# ------------------------------------------------------------------ QOI ---

from pyjelly_ray.stages.media_containers import decode_qoi, encode_qoi  # noqa: E402


@pytest.mark.parametrize("ch", [3, 4])
def test_qoi_roundtrip_all_ops(ch):
    rng = np.random.default_rng(ch)
    # random (RGB/RGBA ops), gradient (DIFF/LUMA), runs (RUN), palette (INDEX)
    for img in (
        rng.integers(0, 256, (31, 43, ch), dtype=np.uint8),
        np.cumsum(rng.integers(-2, 2, (31, 43, ch)), axis=1).astype(np.uint8),
        np.repeat(rng.integers(0, 256, (31, 2, ch), dtype=np.uint8), [20, 23], axis=1),
        np.unique(rng.integers(0, 256, (8, ch), dtype=np.uint8), axis=0)[
            rng.integers(0, 8, (40, 50))
        ],
    ):
        out = decode_qoi(encode_qoi(img))
        assert out.shape == img.shape and (out == img).all()


def test_qoi_long_run_split():
    img = np.full((10, 100, 3), 7, np.uint8)  # runs > 62 must split
    assert (decode_qoi(encode_qoi(img)) == img).all()


def test_qoi_corruption():
    rng = np.random.default_rng(66)
    good = encode_qoi(rng.integers(0, 256, (16, 16, 4), dtype=np.uint8))
    for trial in range(80):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(4, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_qoi(bytes(bad))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError: {type(exc).__name__}: {exc}")


def test_sniff_decodes_qoi():
    rng = np.random.default_rng(67)
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    assert (sniff_decode_image(encode_qoi(img)) == img).all()


# -------------------------------------- PNG Adam7 + low-depth hardening ---

from pyjelly_ray.stages.multimodal import encode_png, encode_png_lowdepth  # noqa: E402


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_adam7_roundtrip(channels, filter_type):
    rng = np.random.default_rng(channels * 5 + filter_type)
    for shape in ((13, 17), (1, 1), (8, 8), (9, 1), (1, 9), (7, 33)):
        img = rng.integers(0, 256, (*shape, channels), dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type, interlace=True))
        assert (out == img).all(), shape


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_lowdepth_gray(depth, interlace):
    rng = np.random.default_rng(depth)
    v = rng.integers(0, 1 << depth, (11, 23), dtype=np.uint8)
    for ft in range(5):
        out = decode_png(
            encode_png_lowdepth(v, depth, filter_type=ft, interlace=interlace)
        )
        assert (out[:, :, 0] == v * (255 // ((1 << depth) - 1))).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_lowdepth_palette(depth):
    rng = np.random.default_rng(depth + 40)
    n = 1 << min(depth, 4)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (14, 19), dtype=np.uint8)
    for interlace in (False, True):
        out = decode_png(encode_png_lowdepth(idx, depth, palette=pal, interlace=interlace))
        assert (out == pal[idx]).all()
    # tRNS makes index 0 transparent
    outa = decode_png(encode_png_lowdepth(idx, depth, palette=pal, trns=bytes([0])))
    assert outa.shape[2] == 4 and ((outa[:, :, 3] == 0) == (idx == 0)).all()


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_16bit_roundtrip(channels):
    from pyjelly_ray.stages.multimodal import decode_png16, encode_png16

    rng = np.random.default_rng(channels)
    img = rng.integers(0, 65536, (13, 17, channels), dtype=np.uint16)
    for ft in range(5):
        for interlace in (False, True):
            enc = encode_png16(img, ft, interlace=interlace)
            out16 = decode_png16(enc)
            assert out16.dtype == np.uint16 and (out16 == img).all()
            # 8-bit view uses the standard high-byte rendering
            out8 = decode_png(enc)
            assert out8.dtype == np.uint8
            assert (out8 == (img >> 8).astype(np.uint8)).all()


def test_png16_upscales_low_depth_inputs():
    from pyjelly_ray.stages.multimodal import decode_png16, encode_png

    rng = np.random.default_rng(5)
    img8 = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    assert (decode_png16(encode_png(img8)) == img8.astype(np.uint16) * 257).all()
    # 16-bit palette is invalid per spec
    import struct as _s
    import zlib as _z

    from pyjelly_ray.stages.multimodal import _png_chunk

    ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(10)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        decode_png(bad)


# ----------------------------------------- JPEG 4:2:2 / 4:4:0 hardening ---

from pyjelly_ray.stages.multimodal import decode_jpeg, encode_jpeg  # noqa: E402


@pytest.mark.parametrize("mode", ["444", "420", "422", "440"])
def test_jpeg_chroma_modes(mode):
    rng = np.random.default_rng(3)
    base = np.linspace(0, 255, 37)[None, :, None] + np.linspace(0, 40, 29)[:, None, None]
    img = np.clip(base + rng.integers(0, 30, (29, 37, 3)), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=mode))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img).mean() < 12


@pytest.mark.parametrize("mode", ["422", "440"])
@pytest.mark.parametrize("shape", [(15, 17), (16, 15), (8, 9), (9, 8), (1, 1), (7, 23)])
def test_jpeg_422_440_odd_sizes_with_restarts(mode, shape):
    img = np.clip(
        np.linspace(0, 255, shape[1])[None, :, None] + np.zeros((*shape, 3)), 0, 255
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=mode, restart_interval=2))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img).mean() < 12


def test_jpeg_bad_subsample_rejected():
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(img, subsample="411")


def test_bmp_32bit():
    rng = np.random.default_rng(90)
    img = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    bgrx = np.zeros((7, 9, 4), np.uint8)
    bgrx[:, :, :3] = img[::-1, :, ::-1]  # bottom-up BGR + pad byte
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + bgrx.size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 9, 7, 1, 32, 0, bgrx.size, 0, 0, 0, 0)
        + bgrx.tobytes()
    )
    assert (decode_bmp(payload) == img).all()


def test_tiff_multipage():
    from pyjelly_ray.stages.media_containers import (
        decode_tiff_multipage,
        encode_tiff_multipage,
        tiff_pages,
    )

    rng = np.random.default_rng(91)
    imgs = [rng.integers(0, 256, (11 + i, 13, 3), dtype=np.uint8) for i in range(4)]
    for comp in ("none", "packbits", "lzw"):
        mp = encode_tiff_multipage(imgs, compression=comp)
        assert tiff_pages(mp) == 4
        for got, want in zip(decode_tiff_multipage(mp), imgs):
            assert (got == want).all()
        assert (decode_tiff(mp) == imgs[0]).all()  # page 0 default
        assert (decode_tiff(mp, page=3) == imgs[3]).all()
        with pytest.raises(ValueError, match="page"):
            decode_tiff(mp, page=4)


# ------------------------------------------------------ progressive JPEG ---


def _smooth_img(shape, seed=0):
    rng = np.random.default_rng(seed)
    base = (
        np.linspace(0, 255, shape[1])[None, :, None]
        + np.linspace(0, 40, shape[0])[:, None, None]
    )
    return np.clip(base + rng.integers(0, 30, (*shape, 3)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("mode", [False, "420", "422", "440"])
@pytest.mark.parametrize("quality", [40, 85, 95])
def test_jpeg_progressive_bitexact_vs_baseline(mode, quality):
    # identical quantized coefficients => the two decodes must be EQUAL
    img = _smooth_img((29, 37))
    b = decode_jpeg(encode_jpeg(img, quality=quality, subsample=mode))
    p = decode_jpeg(encode_jpeg(img, quality=quality, subsample=mode, progressive=True))
    assert (b == p).all()


def test_jpeg_progressive_grayscale_and_odd_sizes():
    img = _smooth_img((29, 37))
    gray = img[:, :, :1]
    assert (
        decode_jpeg(encode_jpeg(gray, quality=90, progressive=True))
        == decode_jpeg(encode_jpeg(gray, quality=90))
    ).all()
    for shape in ((17, 17), (15, 9), (8, 8), (1, 1), (33, 7), (9, 33)):
        im2 = _smooth_img(shape, seed=shape[0])
        for mode in (False, "420"):
            b = decode_jpeg(encode_jpeg(im2, quality=92, subsample=mode))
            p = decode_jpeg(encode_jpeg(im2, quality=92, subsample=mode, progressive=True))
            assert (b == p).all(), (shape, mode)


def test_jpeg_progressive_eobrun_and_dense_paths():
    # flat image: multi-block EOB runs; noisy: ZRL + refinement corrections
    flat = np.full((64, 64, 3), 130, np.uint8)
    assert (
        decode_jpeg(encode_jpeg(flat, quality=85, progressive=True))
        == decode_jpeg(encode_jpeg(flat, quality=85))
    ).all()
    rng = np.random.default_rng(1)
    for seed in range(6):
        noisy = np.random.default_rng(seed).integers(0, 256, (40, 56, 3), dtype=np.uint8)
        for q in (60, 95):
            b = decode_jpeg(encode_jpeg(noisy, quality=q))
            p = decode_jpeg(encode_jpeg(noisy, quality=q, progressive=True))
            assert (b == p).all(), (seed, q)


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_jpeg_progressive_restart_intervals(ri):
    img = _smooth_img((29, 37))
    p = decode_jpeg(encode_jpeg(img, quality=90, progressive=True, restart_interval=ri))
    assert (p == decode_jpeg(encode_jpeg(img, quality=90))).all()


def test_jpeg_progressive_corruption_fuzz():
    rng = np.random.default_rng(7)
    good = encode_jpeg(_smooth_img((24, 24)), quality=80, progressive=True)
    for trial in range(120):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(4, len(bad))]
        else:
            bad[rng.integers(2, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_jpeg(bytes(bad))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError: {type(exc).__name__}: {exc}")


# --------------------------------------------------- Ogg + Matroska demux ---

from pyjelly_ray.stages.media_containers import (  # noqa: E402
    decode_mkv_video,
    decode_ogg_audio,
    encode_mkv_rawvideo,
    encode_ogg,
    mkv_blocks,
    mkv_info,
    ogg_info,
    ogg_packets,
    parse_ogg_pages,
)


def _vorbis_id(channels=2, rate=44100):
    return b"\x01vorbis" + struct.pack("<IBIiii", 0, channels, rate, -1, 128000, -1) + b"\x00\x01"


def test_ogg_page_packet_roundtrip():
    rng = np.random.default_rng(50)
    big = bytes(rng.integers(0, 256, 700, dtype=np.uint8))  # multi-segment lacing
    exact = bytes(rng.integers(0, 256, 510, dtype=np.uint8))  # 255*2: 0-terminator lacing
    ogg = encode_ogg({7: [_vorbis_id(), big, exact, b"tail"]})
    pages = parse_ogg_pages(ogg)
    assert pages[0].header_type & 2 and pages[-1].header_type & 4
    assert ogg_packets(pages, 7) == [_vorbis_id(), big, exact, b"tail"]


def test_ogg_info_vorbis_and_opus():
    opus = b"OpusHead" + bytes([1, 2]) + struct.pack("<HIhB", 312, 48000, 0, 0)
    ogg = encode_ogg({3: [opus, b"d"], 9: [_vorbis_id(6, 96000), b"x"]})
    infos = ogg_info(ogg)
    assert [(i.codec, i.channels, i.sample_rate) for i in infos] == [
        ("opus", 2, 48000), ("vorbis", 6, 96000),
    ]
    with pytest.raises(NotImplementedError, match="codec"):
        decode_ogg_audio(ogg)


def test_ogg_crc_rejects_corruption():
    ogg = encode_ogg({1: [_vorbis_id(), b"payload"]})
    bad = bytearray(ogg)
    bad[40] ^= 1
    with pytest.raises(ValueError, match="CRC|sync|truncated"):
        parse_ogg_pages(bytes(bad))


def test_mkv_rawvideo_roundtrip():
    rng = np.random.default_rng(51)
    for shape in ((7, 12, 16), (1, 8, 8), (3, 300, 260)):
        frames = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        mkv = encode_mkv_rawvideo(frames, fps=6)
        tracks, dur = mkv_info(mkv)
        assert tracks[0].codec_id == "V_UNCOMPRESSED"
        assert (tracks[0].width, tracks[0].height) == (shape[2], shape[1])
        assert dur == pytest.approx(shape[0] / 6, abs=0.01)
        assert (decode_mkv_video(mkv) == frames).all()
        assert len(mkv_blocks(mkv, 1)) == shape[0]


def test_mkv_compressed_codec_is_honest_stub():
    rng = np.random.default_rng(52)
    mkv = bytearray(encode_mkv_rawvideo(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)))
    idx = bytes(mkv).find(b"V_UNCOMPRESSED")
    mkv[idx : idx + 14] = b"V_VP9" + b"\x00" * 9
    with pytest.raises(NotImplementedError, match="V_VP9"):
        decode_mkv_video(bytes(mkv))
    tracks, _ = mkv_info(bytes(mkv))  # demux still real
    assert tracks[0].codec_id.startswith("V_VP9")


def test_mkv_corruption_fuzz():
    rng = np.random.default_rng(53)
    good = encode_mkv_rawvideo(rng.integers(0, 256, (2, 6, 6, 3), dtype=np.uint8))
    for trial in range(80):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(4, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_mkv_video(bytes(bad))
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError: {type(exc).__name__}: {exc}")


def test_frame_sample_stage_mkv_real(ray_session):
    import ray

    rng = np.random.default_rng(54)
    frames = rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_mkv_rawvideo(frames)], pa.binary()),
        }
    )
    rows = sorted(
        ray.data.from_arrow(tbl)
        .map_batches(
            FrameSampleStub, fn_constructor_kwargs={"n_frames": 3, "fake": False},
            concurrency=1, batch_size=2, batch_format="pyarrow",
        )
        .take_all(),
        key=lambda r: r["frame_no"],
    )
    assert (decode_png(rows[0]["frame"]) == frames[0]).all()
    assert (decode_png(rows[2]["frame"]) == frames[5]).all()


# ------------------------------------------- TGA / ICO / WebP / AVI ------

from pyjelly_ray.stages.media_containers import (  # noqa: E402
    avi_info,
    decode_avi_video,
    decode_ico,
    decode_tga,
    decode_webp,
    encode_avi_rawvideo,
    encode_ico,
    encode_tga,
    webp_info,
)


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("rle", [False, True])
def test_tga_roundtrip(channels, rle):
    rng = np.random.default_rng(channels + rle)
    img = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    assert (decode_tga(encode_tga(img, rle=rle)) == img).all()
    runs = np.repeat(rng.integers(0, 256, (9, 3, channels), dtype=np.uint8), [50, 60, 40], axis=1)
    assert (decode_tga(encode_tga(runs, rle=True)) == runs).all()
    if rle:
        assert len(encode_tga(runs, rle=True)) < len(encode_tga(runs)) / 3


def test_tga_bottom_up_and_gray():
    # hand-build a bottom-up type-3 grayscale TGA
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 5, 4, 8, 0)
    out = decode_tga(hdr + g[::-1].tobytes())
    assert (out[:, :, 0] == g).all()


def test_tga_corruption():
    img = np.zeros((4, 4, 3), np.uint8)
    good = encode_tga(img, rle=True)
    with pytest.raises(ValueError):
        decode_tga(good[:10])
    with pytest.raises(ValueError):
        decode_tga(good[:-8])  # truncated RLE stream


def test_ico_roundtrip_and_best():
    rng = np.random.default_rng(60)
    imgs = [rng.integers(0, 256, (s, s, 4), dtype=np.uint8) for s in (16, 32, 8)]
    ico = encode_ico(imgs)
    assert (decode_ico(ico) == imgs[1]).all()  # largest
    got = decode_ico(ico, best=False)
    assert len(got) == 3 and all((a == b).all() for a, b in zip(got, imgs))
    assert (sniff_decode_image(ico) == imgs[1]).all()
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x02\x00" + ico[4:])  # cursor, not icon


def test_webp_info_and_honest_stub():
    w, h = 320, 214
    bits = (w - 1) | ((h - 1) << 14) | (1 << 28)
    vp8l = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 10
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8l)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    )
    info = webp_info(payload)
    assert (info.format, info.width, info.height, info.has_alpha) == (
        "lossless", 320, 214, True,
    )
    vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480) + b"\x00" * 4
    lossy = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8)) + b"WEBP"
        + b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    )
    assert (webp_info(lossy).format, webp_info(lossy).width) == ("lossy", 640)
    # lossy VP8 stays the honest stub; lossless now decodes for real
    # (the truncated header-only VP8L above fails as corrupt, not as a stub)
    with pytest.raises(NotImplementedError, match="WebP"):
        decode_webp(lossy)
    with pytest.raises(NotImplementedError):
        sniff_decode_image(lossy)
    with pytest.raises(ValueError):
        decode_webp(payload)  # truncated VP8L bitstream
    with pytest.raises(ValueError):
        webp_info(b"RIFF\x04\x00\x00\x00WAVE")


def test_avi_rawvideo_roundtrip():
    rng = np.random.default_rng(61)
    for shape in ((6, 12, 17), (1, 5, 3)):
        frames = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        avi = encode_avi_rawvideo(frames, fps=12)
        info = avi_info(avi)
        assert (info.width, info.height, info.n_frames) == (shape[2], shape[1], shape[0])
        assert info.fps == 12.0
        assert (decode_avi_video(avi) == frames).all()


def test_avi_compressed_is_honest_stub():
    rng = np.random.default_rng(62)
    avi = bytearray(encode_avi_rawvideo(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)))
    i = bytes(avi).find(b"vids") + 4
    avi[i : i + 4] = b"H264"
    j = bytes(avi).find(b"strf") + 8
    avi[j + 16 : j + 20] = struct.pack("<I", 0x34363248)
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_video(bytes(avi))
    assert avi_info(bytes(avi)).fourcc == "H264"  # demux still real


def test_frame_sample_stage_avi_real(ray_session):
    import ray

    rng = np.random.default_rng(63)
    frames = rng.integers(0, 256, (5, 8, 8, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_avi_rawvideo(frames)], pa.binary()),
        }
    )
    rows = sorted(
        ray.data.from_arrow(tbl)
        .map_batches(
            FrameSampleStub, fn_constructor_kwargs={"n_frames": 2, "fake": False},
            concurrency=1, batch_size=2, batch_format="pyarrow",
        )
        .take_all(),
        key=lambda r: r["frame_no"],
    )
    assert (decode_png(rows[0]["frame"]) == frames[0]).all()
    assert (decode_png(rows[1]["frame"]) == frames[4]).all()


# --------------------------------------------------------- netpbm family ---

from pyjelly_ray.stages.media_containers import decode_pnm, encode_pnm  # noqa: E402


@pytest.mark.parametrize("kind", [1, 2, 3, 4, 5, 6])
def test_pnm_roundtrip(kind):
    rng = np.random.default_rng(kind)
    if kind in (1, 4):
        img = (rng.integers(0, 2, (9, 13, 1)) * 255).astype(np.uint8)
    elif kind in (2, 5):
        img = rng.integers(0, 256, (9, 13, 1), dtype=np.uint8)
    else:
        img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert (decode_pnm(encode_pnm(img, kind)) == img).all()


def test_pnm_comments_maxval_and_16bit():
    out = decode_pnm(b"P2 # c\n4 2 # d\n7\n0 1 2 3\n4 5 6 7\n")
    assert (out.reshape(-1) == np.arange(8) * 255 // 7).all()
    p5 = b"P5\n2 1\n65535\n" + np.array([65535, 256], ">u2").tobytes()
    assert list(decode_pnm(p5).reshape(-1)) == [255, 1]
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n2 1\n255\n\x00")  # truncated
    with pytest.raises(ValueError):
        decode_pnm(b"P7\nX")
    # sniff routes P1-P5 through decode_pnm
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
    assert (sniff_decode_image(encode_pnm(g, 5)) == g).all()


# ---------------------------------------------------- DDS / S3TC (BC1-3) ---

from pyjelly_ray.stages.media_containers import (  # noqa: E402
    _rgb565_to_888,
    decode_dds,
    encode_dds_bc1,
)


def _dds_hdr(h, w, fourcc, data_len):
    return (
        struct.pack("<4sIIIIIII", b"DDS ", 124, 0x1007 | 0x80000, h, w, data_len, 0, 0)
        + b"\x00" * 44
        + struct.pack("<II4sIIIII", 32, 0x4, fourcc, 0, 0, 0, 0, 0)
        + struct.pack("<IIIII", 0x1000, 0, 0, 0, 0)
    )


def test_dds_bc1_exact_roundtrip():
    rng = np.random.default_rng(70)
    for shape in ((8, 8), (12, 16), (5, 7), (4, 4)):
        bh, bw = (shape[0] + 3) // 4, (shape[1] + 3) // 4
        img = np.zeros((bh * 4, bw * 4, 3), np.uint8)
        for by in range(bh):
            for bx in range(bw):
                cols = _rgb565_to_888(rng.integers(0, 65536, 2, dtype=np.uint16))
                img[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = cols[
                    rng.integers(0, 2, (4, 4))
                ]
        img = img[: shape[0], : shape[1]]
        out = decode_dds(encode_dds_bc1(img))
        assert out.shape == (*shape, 4)
        assert (out[:, :, :3] == img).all() and (out[:, :, 3] == 255).all()
        assert (sniff_decode_image(encode_dds_bc1(img))[:, :, :3] == img).all()


def test_dds_bc1_interpolants_and_transparency():
    c0 = 31 << 11  # pure red in 565
    idx = 0
    for i in range(16):
        idx |= (i % 4) << (2 * i)
    out = decode_dds(_dds_hdr(4, 4, b"DXT1", 8) + struct.pack("<HHI", c0, 0, idx))
    row = out[0]
    assert list(row[0][:3]) == [255, 0, 0] and list(row[1][:3]) == [0, 0, 0]
    assert list(row[2][:3]) == [2 * 255 // 3, 0, 0]
    assert list(row[3][:3]) == [255 // 3, 0, 0]
    # c0 <= c1: 3-color mode, index 3 = transparent black
    out3 = decode_dds(_dds_hdr(4, 4, b"DXT1", 8) + struct.pack("<HHI", 0, c0, 0xFFFFFFFF))
    assert (out3[:, :, 3] == 0).all()


def test_dds_bc3_alpha_ramps():
    cblock = struct.pack("<HHI", 31 << 11, 0, 0)
    for a0, a1 in ((200, 40), (40, 200)):  # 8-value and 6-value modes
        abits = 0
        for i in range(16):
            abits |= (i % 8) << (3 * i)
        payload = _dds_hdr(4, 4, b"DXT5", 16) + bytes([a0, a1]) + abits.to_bytes(6, "little") + cblock
        alphas = list(decode_dds(payload).reshape(16, 4)[:, 3][:8])
        if a0 > a1:
            expect = [a0, a1] + [((7 - i) * a0 + i * a1) // 7 for i in range(1, 7)]
        else:
            expect = [a0, a1] + [((5 - i) * a0 + i * a1) // 5 for i in range(1, 5)] + [0, 255]
        assert alphas == expect, (a0, a1, alphas, expect)


def test_dds_bc2_explicit_alpha_and_uncompressed():
    nib = 0
    for i in range(16):
        nib |= (i % 16) << (4 * i)
    payload = _dds_hdr(4, 4, b"DXT3", 16) + nib.to_bytes(8, "little") + struct.pack("<HHI", 0, 0, 0)
    a = list(decode_dds(payload).reshape(16, 4)[:, 3])
    assert a == [(v << 4) | v for v in range(16)]

    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    pix = (
        img[:, :, 0].astype(np.uint32) | (img[:, :, 1].astype(np.uint32) << 8)
        | (img[:, :, 2].astype(np.uint32) << 16) | (img[:, :, 3].astype(np.uint32) << 24)
    )
    hdr = (
        struct.pack("<4sIIIIIII", b"DDS ", 124, 0x100F, 6, 5, 20, 0, 0)
        + b"\x00" * 44
        + struct.pack("<II4sIIIII", 32, 0x41, bytes(4), 32, 0xFF, 0xFF00, 0xFF0000, 0xFF000000)
        + struct.pack("<IIIII", 0x1000, 0, 0, 0, 0)
    )
    assert (decode_dds(hdr + pix.astype("<u4").tobytes()) == img).all()


def test_dds_corruption_and_dx10():
    rng = np.random.default_rng(72)
    img = _rgb565_to_888(rng.integers(0, 65536, 2, dtype=np.uint16))[
        rng.integers(0, 2, (8, 8))
    ]
    good = encode_dds_bc1(img)
    with pytest.raises(ValueError):
        decode_dds(good[:100])
    with pytest.raises(ValueError, match="DX10"):
        decode_dds(good[:84] + b"DX10" + good[88:])
    for trial in range(60):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(4, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_dds(bytes(bad))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError: {type(exc).__name__}: {exc}")


# ------------------------------------------- cross-format consistency ---


def test_lossless_image_formats_agree():
    """One source image through every lossless image codec → identical
    pixels back.  A whole-layer integration invariant."""
    from pyjelly_ray.stages.media_containers import encode_qoi, encode_tga
    from pyjelly_ray.stages.multimodal import encode_png, encode_ppm

    rng = np.random.default_rng(80)
    pal = np.unique(rng.integers(0, 256, (40, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (24, 32))]  # ≤256 colors: GIF-safe
    payloads = [
        encode_png(img, 3),
        encode_png(img, 4, interlace=True),
        encode_bmp(img),
        encode_qoi(img),
        encode_tiff(img, compression="lzw", predictor=True),
        encode_ppm(img),
        encode_gif(img, interlace=True),
        encode_ico([img]),
    ]
    for p in payloads:
        out = sniff_decode_image(p)
        assert (out[:, :, :3] == img).all(), p[:8]
    # TGA carries no magic bytes (not sniffable by design) — direct decode
    assert (decode_tga(encode_tga(img, rle=True)) == img).all()


def test_lossless_audio_formats_agree():
    """One source signal through every lossless audio path → identical
    int16 samples back via the sniffing decoder."""
    from pyjelly_ray.stages.flac import encode_flac
    from pyjelly_ray.stages.media_containers import sniff_decode_audio

    x = _tone(3000, seed=81)
    for payload in (
        encode_wav(x, 8000),
        encode_flac(x, 8000, mode="fixed"),
        encode_flac(x, 8000, mode="lpc", partition_order=2),
        encode_aiff(x, 8000),
        encode_au(x, 8000, encoding="pcm16"),
    ):
        mono, rate = sniff_decode_audio(payload)
        assert rate == 8000 and (mono == x).all()


def test_video_containers_agree():
    """The same clip through MP4, Matroska and AVI decodes identically."""
    from pyjelly_ray.stages.media_containers import decode_avi_video

    rng = np.random.default_rng(82)
    clip = rng.integers(0, 256, (5, 10, 14, 3), dtype=np.uint8)
    a = decode_mp4_video(encode_mp4_rawvideo(clip))
    b = decode_mkv_video(encode_mkv_rawvideo(clip))
    c = decode_avi_video(encode_avi_rawvideo(clip))
    assert (a == clip).all() and (b == clip).all() and (c == clip).all()
