"""FLAC codec tests — every decoder path driven by an encoder switch:
subframe family (constant/verbatim/fixed/LPC), stereo decorrelation mode,
rice partition orders, raw-escape partitions, wasted bits, bit depths,
multi-frame streams, CRC-8/16 + MD5 rejection, honest lossless contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pyjelly_ray.stages.flac import (
    FlacAudioStage,
    decode_flac,
    encode_flac,
    flac_info,
    synth_flac_table,
)


def _signal(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return np.clip(
        20000 * np.sin(t / 30) + rng.normal(0, 50, n), -32768, 32767
    ).astype(np.int16)


def _rt(x, rate=8000, **kw):
    enc = encode_flac(x, rate, **kw)
    dec, r, _bits = decode_flac(enc)
    x2 = x[:, None] if x.ndim == 1 else x
    assert r == rate and dec.shape == x2.shape
    assert (dec == np.asarray(x2)).all(), kw
    return len(enc)


@pytest.mark.parametrize("mode", ["fixed", "verbatim", "lpc"])
def test_flac_mono_modes(mode):
    _rt(_signal(), mode=mode)


def test_flac_fixed_beats_verbatim_on_smooth_signal():
    x = _signal()
    assert _rt(x, mode="fixed") < _rt(x, mode="verbatim") < x.nbytes * 1.2


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "side_right", "mid_side"]
)
def test_flac_stereo_decorrelation_modes(stereo_mode):
    x = _signal(4000)
    st = np.stack([x, np.roll(x, 3)], axis=1)
    _rt(st, stereo_mode=stereo_mode)


@pytest.mark.parametrize("po", [0, 1, 2, 4])
def test_flac_partition_orders(po):
    # 5000 samples: the 904-sample last frame forces per-frame po clamping
    _rt(_signal(), partition_order=po)


def test_flac_escape_partitions_and_wasted_bits():
    x = _signal()
    _rt(x, force_escape=True)
    xw = (x.astype(np.int32) & ~7).astype(np.int16)  # 3 wasted bits everywhere
    assert _rt(xw) < _rt(xw, use_wasted=False) * 0.75


def test_flac_constant_and_edge_sizes():
    _rt(np.full(100, -5, np.int16))
    _rt(np.zeros(7, np.int16))
    _rt(_signal()[:1])
    _rt(_signal()[:0])
    _rt(_signal(), block_size=192)


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_flac_bit_depths(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, 3000)
    _rt(x, bits=bits)


def test_flac_multichannel():
    x = _signal(2000)
    quad = np.stack([x, np.roll(x, 1), np.roll(x, 2), np.roll(x, 5)], axis=1)
    _rt(quad)


def test_flac_info():
    st = np.stack([_signal(1234), _signal(1234, seed=1)], axis=1)
    info = flac_info(encode_flac(st, 44100, stereo_mode="mid_side"))
    assert info.sample_rate == 44100
    assert info.channels == 2
    assert info.bits_per_sample == 16
    assert info.total_samples == 1234


def test_flac_corruption_fuzz():
    rng = np.random.default_rng(9)
    good = encode_flac(_signal(1000), 8000)
    rejected = 0
    for trial in range(150):
        bad = bytearray(good)
        if trial % 2 == 0:
            bad = bad[: rng.integers(1, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_flac(bytes(bad))
        except ValueError:
            rejected += 1
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"non-ValueError crash: {type(exc).__name__}: {exc}")
    # the only undetected flips land in ignored STREAMINFO min/max-frame-size
    assert rejected >= 140


def test_flac_md5_detects_payload_swap():
    a = encode_flac(_signal(500, seed=1), 8000)
    b = encode_flac(_signal(500, seed=2), 8000)
    # splice: a's metadata (incl. MD5) + b's frames; CRCs are per-frame valid
    frankenstein = a[:42] + b[42:]
    with pytest.raises(ValueError, match="MD5|CRC"):
        decode_flac(frankenstein)


def test_flac_not_flac_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # no STREAMINFO


def test_flac_audio_stage(ray_session):
    import ray

    tbl = synth_flac_table(n=8)
    ds = ray.data.from_arrow(tbl).map_batches(
        FlacAudioStage, concurrency=1, batch_size=4, batch_format="pyarrow"
    )
    rows = ds.take_all()
    assert len(rows) == 8
    assert all(r["sample_rate"] == 8000 for r in rows)
    assert all(len(r["features"]) == 11 for r in rows)  # 3 + 8 bands
    # features are real: distinct tones -> distinct band energies
    f0 = np.array(rows[0]["features"])
    f1 = np.array(rows[1]["features"])
    assert not np.allclose(f0, f1)
