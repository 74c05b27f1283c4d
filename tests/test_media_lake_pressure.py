"""Media-lake bounded-memory posture (r4 verdict item 6): the mixed-format
decode pipeline at a few thousand payloads under an object store sized
well below the payload volume — streaming execution + plasma spill must
complete the job with correct output (the KG pipeline's --mem-pressure
harness, applied to the media path).

Runs in a SUBPROCESS so the capped ray session doesn't collide with the
suite's shared fixture."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys, json, os, glob, threading
sys.path.insert(0, %(repo)r)
import numpy as np
import pyarrow as pa
import ray

N = %(n)d
STORE = 256 * 1024 * 1024  # 256 MB plasma vs ~%(mb)d MB of payloads
ray.init(address="local", num_cpus=8, include_dashboard=False,
         object_store_memory=STORE)
session = ray._private.worker.global_worker.node.get_session_dir_path()
peak = [0]
stop = threading.Event()

def _sample():
    pat = os.path.join(session, "**", "*spill*", "*")
    seen = {}
    while not stop.is_set():
        cur = 0
        for f in glob.glob(pat, recursive=True):
            try:
                sz = os.path.getsize(f)
            except OSError:
                continue
            cur += sz
            seen[f] = sz
        peak[0] = max(peak[0], cur)
        stop.wait(0.25)

threading.Thread(target=_sample, daemon=True).start()


def gen(batch):
    # deterministic mixed-format payload per media_id, built INSIDE the
    # task (generation streams; nothing is materialized driver-side)
    from pyjelly_ray.stages.media_containers import encode_bmp, encode_gif, encode_qoi
    from pyjelly_ray.stages.multimodal import encode_png, encode_wav

    ids = batch["id"]
    payloads, kinds = [], []
    for i in ids.tolist():
        rng = np.random.default_rng(1000 + i)
        k = i %% 5
        if k == 4:
            sig = (np.sin(np.arange(24000) / (3 + i %% 7)) * 20000).astype(np.int16)
            payloads.append(encode_wav(sig, 8000))
            kinds.append("audio")
        elif k == 3:
            pal = np.unique(rng.integers(0, 256, (20, 3), dtype=np.uint8), axis=0)
            img = pal[rng.integers(0, len(pal), (64, 64))]
            payloads.append(encode_gif(img))
            kinds.append("image")
        else:
            img = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
            enc = (encode_png, encode_bmp, encode_qoi)[k]
            payloads.append(enc(img))
            kinds.append("image")
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class DecodeStage:
    # actor-pool sniff decode -> tiny feature row (payload dropped)
    def __call__(self, batch: pa.Table) -> pa.Table:
        from pyjelly_ray.stages.multimodal import sniff_decode_image
        from pyjelly_ray.stages.media_containers import AudioDecodeStage as _A
        from pyjelly_ray.stages.multimodal import decode_wav

        hs, checks = [], []
        for kind, p in zip(batch.column("kind").to_pylist(),
                           batch.column("payload").to_pylist()):
            if kind == "image":
                img = sniff_decode_image(p)
                hs.append(img.shape[0])
                checks.append(float(img.mean()))
            else:
                s, rate = decode_wav(p)
                hs.append(len(s))
                checks.append(float(np.abs(s).mean()))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "dim0": pa.array(hs, pa.int64()),
            "feat": pa.array(checks, pa.float64()),
        })


ds = (
    ray.data.range(N, override_num_blocks=64)
    .map_batches(gen, batch_format="numpy", batch_size=32)
    .map_batches(DecodeStage, concurrency=(1, 4), batch_size=16,
                 batch_format="pyarrow")
)
out_dir = "/tmp/media_lake_pressure_out"
import shutil
shutil.rmtree(out_dir, ignore_errors=True)
ds.write_parquet(out_dir)
stop.set()

import pyarrow.dataset as pads
t = pads.dataset(out_dir).to_table()
assert t.num_rows == N, t.num_rows
ids = sorted(t.column("media_id").to_pylist())
assert ids == list(range(N))
import pyarrow.compute as pc
img_rows = t.filter(pc.equal(t.column("kind"), "image"))
assert set(img_rows.column("dim0").to_pylist()) <= {200, 64}
print(json.dumps({
    "rows": t.num_rows,
    "spill_peak_bytes": peak[0],
    "object_store_bytes": STORE,
}))
ray.shutdown()
"""


def test_media_lake_under_capped_object_store(tmp_path):
    n = int(os.environ.get("GRAFT_MEDIA_LAKE_N", "4000"))
    script = SCRIPT % {"repo": REPO, "n": n, "mb": n // 10}
    p = tmp_path / "lake.py"
    p.write_text(script)
    r = subprocess.run(
        [sys.executable, str(p)], capture_output=True, text=True, cwd=REPO,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == n
    # informational: peak concurrent spill volume under the 256 MB cap
    print("media-lake pressure:", out)
