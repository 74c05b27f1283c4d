"""Cross-node query identity sweep: every driver-benched query at sf0.01,
single-node vs a REAL 2-node cluster — row counts and order-insensitive
value hashes must match exactly.

Usage:
  RAY_ADDRESS= python tools/two_node_query_sweep.py single   # writes hashes
  (start 2-node cluster)
  RAY_ADDRESS= python tools/two_node_query_sweep.py cluster  # compares

Or `orchestrate` to do both (owns ray stop/start).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF = "/root/testdata/sf0.01"
OUT = "/tmp/query_sweep_hashes_{mode}.json"


def result_hash(r) -> tuple[int, str]:
    import pandas as pd
    import pyarrow as pa

    if isinstance(r, pa.Table):
        df = r.to_pandas()
    elif isinstance(r, pd.DataFrame):
        df = r
    else:
        df = r.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False).encode()
    return len(df), hashlib.sha256(payload).hexdigest()[:16]


def run(mode: str) -> dict:
    import ray

    if mode == "cluster":
        ray.init(address="127.0.0.1:6379")
        alive = [n for n in ray.nodes() if n["Alive"]]
        expected = int(os.environ.get("EXPECT_NODES", "2"))
        assert len(alive) == expected, f"expected {expected} nodes, got {len(alive)}"
    else:
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    names = sorted(json.load(open(os.path.join(REPO, "BENCH_r03.json")))["parsed"]["queries"])
    names += ["q_kg_jelly_roundtrip", "q_image_features_png"]
    names = sorted(set(names))
    qs = E.queries()
    out = {}
    for n in names:
        if n not in qs:
            continue
        rows, h = result_hash(qs[n](SF))
        out[n] = [rows, h]
    ray.shutdown()
    with open(OUT.format(mode=mode), "w") as f:
        json.dump(out, f)
    return out


def sh(cmd: str):
    return subprocess.run(cmd, shell=True, capture_output=True, text=True)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "orchestrate"
    if mode in ("single", "cluster"):
        out = run(mode)
        print(json.dumps({"mode": mode, "n": len(out)}))
        return
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    sh("ray stop --force")
    r = subprocess.run([sys.executable, __file__, "single"], env=env, cwd=REPO,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    sh("ray stop --force")
    time.sleep(2)
    assert sh("ray start --head --num-cpus=16 --port=6379 --include-dashboard=false").returncode == 0
    worker = subprocess.Popen(
        ["ray", "start", "--address=127.0.0.1:6379", "--num-cpus=16", "--block"],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(8)
    try:
        r = subprocess.run([sys.executable, __file__, "cluster"], env=env, cwd=REPO,
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
    finally:
        sh("ray stop --force")
        worker.poll()
    single = json.load(open(OUT.format(mode="single")))
    cluster = json.load(open(OUT.format(mode="cluster")))
    diff = {k: (single.get(k), cluster.get(k))
            for k in set(single) | set(cluster)
            if single.get(k) != cluster.get(k)}
    print(json.dumps({
        "queries": len(single), "identical": not diff, "mismatches": diff,
    }))
    assert not diff, diff


if __name__ == "__main__":
    main()
