"""The media lake: ONE Ray pipeline over a mixed-format corpus.

A real training-data lake is never one format.  This example builds a
corpus mixing nine image formats (PNG incl. interlaced + palette, WebP
lossless incl. palette, JPEG
baseline AND progressive, GIF, BMP, TIFF-LZW, QOI, TGA-in-ICO, DDS/BC1),
four audio formats (WAV, FLAC, AIFF, AU/μ-law) and three video containers
(MP4, Matroska, AVI — uncompressed tracks), then runs THREE actor-pool
stages — image sniff-decode, audio sniff-decode, video frame sampling —
each dispatching on magic bytes to the real pure-numpy codecs.  Every
payload decodes for real; nothing here needs an external library.

Run: python examples/17_media_lake.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import ray

from pyjelly_ray.stages.flac import encode_flac
from pyjelly_ray.stages.media_containers import (
    AudioDecodeStage,
    _rgb565_to_888,
    encode_au,
    encode_avi_rawvideo,
    encode_dds_bc1,
    encode_gif,
    encode_ico,
    encode_mkv_rawvideo,
    encode_mp4_rawvideo,
    encode_qoi,
    encode_tiff,
)
from pyjelly_ray.stages.media_containers import encode_aiff, encode_bmp as _encode_bmp
from pyjelly_ray.stages.multimodal import (
    FrameSampleStub,
    ImageDecodeStub,
    encode_jpeg,
    encode_png,
    encode_wav,
)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

rng = np.random.default_rng(0)

# ---- 1. images: eight formats, one decode stage -------------------------
pal = np.unique(rng.integers(0, 256, (24, 3), dtype=np.uint8), axis=0)


def rand_img(h=24, w=32):
    return pal[rng.integers(0, len(pal), (h, w))]


bc1_cols = _rgb565_to_888(rng.integers(0, 65536, 2, dtype=np.uint16))
image_payloads = [
    encode_png(rand_img(), 2, interlace=True),
    encode_jpeg(rand_img(), quality=90, subsample="422"),
    encode_jpeg(rand_img(), quality=90, progressive=True),
    encode_gif(rand_img(), interlace=True),
    _encode_bmp(rand_img()),
    encode_tiff(rand_img(), compression="lzw", predictor=True),
    encode_qoi(rand_img()),
    encode_ico([np.dstack([rand_img(16, 16)] * 1)]),
    encode_dds_bc1(bc1_cols[rng.integers(0, 2, (16, 16))]),
]
from pyjelly_ray.stages.vp8l import encode_webp_lossless

image_payloads.append(encode_webp_lossless(rand_img(), predictor_mode=7))
image_payloads.append(encode_webp_lossless(rand_img(), palette=True))
images = pa.table(
    {
        "media_id": pa.array(range(len(image_payloads)), pa.int64()),
        "payload": pa.array(image_payloads, pa.binary()),
    }
)
img_rows = (
    ray.data.from_arrow(images)
    .map_batches(
        ImageDecodeStub, fn_constructor_kwargs={"n_features": 32, "fake": False},
        concurrency=(1, 2), batch_size=4, batch_format="pyarrow",
    )
    .take_all()
)
print(f"images: decoded {len(img_rows)} payloads across 9 formats -> 32-dim features")

# ---- 2. audio: four formats, one decode stage ---------------------------
tone = (np.sin(np.arange(4000) / 9) * 18000).astype(np.int16)
audio_payloads = [
    encode_wav(tone, 8000),
    encode_flac(np.stack([tone, -tone], 1), 8000, stereo_mode="mid_side"),
    encode_aiff(tone, 8000),
    encode_au(tone, 8000, encoding="mulaw"),
]
audio = pa.table(
    {
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array(audio_payloads, pa.binary()),
    }
)
aud_rows = (
    ray.data.from_arrow(audio)
    .map_batches(AudioDecodeStage, concurrency=(1, 2), batch_size=2, batch_format="pyarrow")
    .take_all()
)
print(f"audio: decoded {len(aud_rows)} clips (WAV/FLAC/AIFF/AU-mulaw) -> features")

# ---- 3. video: three containers, one frame sampler ----------------------
clip = rng.integers(0, 256, (8, 12, 12, 3), dtype=np.uint8)
video_payloads = [
    encode_mp4_rawvideo(clip, fps=4),
    encode_mkv_rawvideo(clip, fps=4),
    encode_avi_rawvideo(clip, fps=4),
]
video = pa.table(
    {
        "media_id": pa.array(range(3), pa.int64()),
        "payload": pa.array(video_payloads, pa.binary()),
    }
)
frames = (
    ray.data.from_arrow(video)
    .map_batches(
        FrameSampleStub, fn_constructor_kwargs={"n_frames": 3, "fake": False},
        concurrency=1, batch_size=2, batch_format="pyarrow",
    )
    .take_all()
)
print(f"video: sampled {len(frames)} PNG frames from MP4 + Matroska + AVI containers")
assert len(img_rows) == 11 and len(aud_rows) == 4 and len(frames) == 9

ray.shutdown()
