"""Multimodal image pipeline with REAL pure-numpy codecs (no image libs):
deterministic synth JPEGs (quality grid, 4:4:4/4:2:0 chroma, grayscale,
restart markers) and PNGs (all five filters, RGB/gray/RGBA) decode through
actor-pool ``map_batches`` stages — huffman+IDCT for JPEG, zlib inflate +
un-filtering for PNG — into per-image feature vectors, then the two
feature streams union into one embedding table ready for near-dup / ANN
stages.

Run: python examples/15_multimodal_image_features.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import ray

from pyjelly_ray.stages.multimodal import (
    JPEGImageStage,
    PNGImageStage,
    decode_jpeg,
    encode_jpeg,
    synth_jpeg_table,
    synth_png_table,
)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

# 1. the codec itself is real: encode → decode round-trips within JPEG's
#    quantization error (bit-exactness vs the spec reconstruction is pinned
#    in tests/test_stages.py::test_jpeg_codec_grid)
img = np.clip(
    np.linspace(0, 255, 32)[None, :, None] + np.zeros((24, 1, 3)), 0, 255
).astype(np.uint8)
out = decode_jpeg(encode_jpeg(img, quality=90))
print(
    f"codec round-trip: {img.shape} -> {len(encode_jpeg(img, quality=90))} bytes"
    f" -> {out.shape}, mean abs err {np.abs(out.astype(int) - img).mean():.2f}"
)

# 2. actor-pool decode stages: setup once per actor (__init__), decode per
#    batch; small batch_size keeps payload bytes × concurrency bounded
jpeg_feats = ray.data.from_arrow(synth_jpeg_table(48)).map_batches(
    JPEGImageStage, concurrency=(1, 2), batch_size=16, batch_format="pyarrow"
)
png_feats = ray.data.from_arrow(synth_png_table(48)).map_batches(
    PNGImageStage, concurrency=(1, 2), batch_size=16, batch_format="pyarrow"
)

# 3. one unified feature table (same output schema across decoders)
features = jpeg_feats.union(png_feats)
rows = features.take_all()
dims = {len(r["features"]) for r in rows}
print(f"decoded {len(rows)} images (48 JPEG + 48 PNG), feature dims: {dims}")
assert len(rows) == 96 and len(dims) == 1

ray.shutdown()
