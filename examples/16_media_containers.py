"""Container-format media pipeline, no external codec libraries:
GIF (full LZW) and BMP images decode for real through the generic
``ImageDecodeStub(fake=False)`` sniffing stage; MP4/ISO-BMFF files are
demuxed with full sample tables (``raw `` RGB24 tracks decode to frames,
compressed codecs stop at the honest stub boundary); FLAC clips decode
losslessly (full RFC 9639 codec) into audio features; MP3 streams yield
real frame-walk metadata (duration/bitrate/Xing) via a batch stage.

Run: python examples/16_media_containers.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import ray

from pyjelly_ray.stages.media_containers import (
    encode_bmp,
    encode_gif,
    encode_mp4_rawvideo,
    mp3_info,
    synth_mp3_stream,
)
from pyjelly_ray.stages.multimodal import FrameSampleStub, ImageDecodeStub

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

rng = np.random.default_rng(0)

# 1. GIF + BMP images through the generic sniffing decode stage
pal = np.unique(rng.integers(0, 256, (32, 3), dtype=np.uint8), axis=0)
payloads = []
for i in range(24):
    img = pal[rng.integers(0, len(pal), (32, 48))]
    payloads.append(encode_gif(img) if i % 2 == 0 else encode_bmp(img))
images = pa.table(
    {
        "media_id": pa.array(range(24), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }
)
feats = ray.data.from_arrow(images).map_batches(
    ImageDecodeStub,
    fn_constructor_kwargs={"n_features": 32, "fake": False},
    concurrency=(1, 2),
    batch_size=8,
    batch_format="pyarrow",
)
rows = feats.take_all()
print(f"decoded {len(rows)} GIF/BMP images into {len(rows[0]['features'])}-dim features")

# 2. MP4 demux + uniform frame sampling (raw RGB24 track decodes fully)
clips = pa.table(
    {
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(
            [
                encode_mp4_rawvideo(
                    rng.integers(0, 256, (12, 16, 16, 3), dtype=np.uint8), fps=6
                )
                for _ in range(2)
            ],
            pa.binary(),
        ),
    }
)
frames = ray.data.from_arrow(clips).map_batches(
    FrameSampleStub,
    fn_constructor_kwargs={"n_frames": 3, "fake": False},
    concurrency=1,
    batch_size=2,
    batch_format="pyarrow",
)
print(f"sampled {frames.count()} PNG frames from 2 MP4 clips (ISO-BMFF demux)")


# 3. FLAC: real lossless decode (compressed audio) through an actor stage
from pyjelly_ray.stages.flac import FlacAudioStage, synth_flac_table

flac_feats = ray.data.from_arrow(synth_flac_table(12)).map_batches(
    FlacAudioStage, concurrency=(1, 2), batch_size=4, batch_format="pyarrow"
)
rows = flac_feats.take_all()
print(f"decoded {len(rows)} FLAC clips (mid-side stereo) into audio features")

# 4. MP3 metadata extraction as a batch stage (frame walk is real; audio
#    sample decode is the stub boundary)
def mp3_meta(batch: pa.Table) -> pa.Table:
    infos = [mp3_info(p) for p in batch.column("payload").to_pylist()]
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "duration_s": pa.array([i.duration_s for i in infos], pa.float64()),
            "bitrate_kbps": pa.array([i.bitrate_kbps for i in infos], pa.float64()),
            "sample_rate": pa.array([i.sample_rate for i in infos], pa.int32()),
            "vbr": pa.array([i.vbr for i in infos], pa.bool_()),
        }
    )


audio = pa.table(
    {
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array(
            [synth_mp3_stream(20 + 5 * i, xing=i % 2 == 1, seed=i) for i in range(4)],
            pa.binary(),
        ),
    }
)
meta = ray.data.from_arrow(audio).map_batches(mp3_meta, batch_format="pyarrow")
for r in sorted(meta.take_all(), key=lambda r: r["media_id"]):
    print(
        f"  mp3 #{r['media_id']}: {r['duration_s']:.2f}s @ {r['bitrate_kbps']:.0f} kbps"
        f" {'VBR' if r['vbr'] else 'CBR'}"
    )

ray.shutdown()
