"""4-node cluster evidence (r4 verdict item 5): the KG flagship AND the
full query sweep on FOUR real raylets (8+8+8+8 CPUs, separate object
stores, inter-node transfer over loopback gRPC) — the north rule's
"N → 4N nodes" exercised literally across real object-store boundaries.

Orchestrates: ray stop → head(8) + 3 workers(8) → flagship via
two_node_bench.py (EXPECT_NODES=4; per-node per-stage task counts from
GRAFT_TASKPROF) → query sweep via two_node_query_sweep.py cluster mode →
ray stop → single-node controls (sweep hashes + flagship digest) →
writes scaling_r5_4node.json.

Usage: RAY_ADDRESS= python tools/four_node_bench.py
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OBJ_STORE = "6000000000"  # 6 GB per raylet: 4 stores must coexist in 128 GB


def sh(cmd: list[str], **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def main() -> None:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    # ---- single-node controls first (head-only local sessions) ----------
    sh(["ray", "stop", "--force"])
    r = sh([sys.executable, "tools/two_node_query_sweep.py", "single"],
           env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]

    # flagship single-node reference digest: reuse any same-params build
    ref_dir = "/tmp/kg_4node_ref"
    r = sh([sys.executable, "-c", (
        "import sys; sys.path.insert(0, %r); import ray, time, glob, hashlib, shutil, json, os\n"
        "ray.init(address='local', num_cpus=32, include_dashboard=False)\n"
        "from pyjelly_ray.pipelines.kg import build_kg\n"
        "shutil.rmtree(%r, ignore_errors=True)\n"
        "t0 = time.perf_counter()\n"
        "rows = build_kg('/tmp/pyjelly_ray_corpus_sf0.1_1920000', %r, n_shards=32).take_all()\n"
        "wall = time.perf_counter() - t0\n"
        "parts = sorted(glob.glob(os.path.join(%r, 'part-*.jelly')))\n"
        "digest = hashlib.sha256(b''.join(open(f, 'rb').read() for f in parts)).hexdigest()\n"
        "print(json.dumps({'wall_sec': round(wall, 2), 'digest': digest[:16],\n"
        "                  'n_statements': sum(r['n_statements'] for r in rows)}))\n"
        "ray.shutdown()") % (REPO, ref_dir, ref_dir, ref_dir)],
        env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    single_flagship = json.loads(r.stdout.strip().splitlines()[-1])

    # ---- 4-raylet cluster ----------------------------------------------
    sh(["ray", "stop", "--force"])
    time.sleep(2)
    r = sh(["ray", "start", "--head", "--num-cpus=8", "--port=6379",
            "--include-dashboard=false", f"--object-store-memory={OBJ_STORE}"],
           env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    # workers join SERIALLY: simultaneous `ray start` on one box race on
    # session setup (observed: only 1 of 3 joined when started together)
    for i in range(3):
        r = sh(["ray", "start", "--address=127.0.0.1:6379", "--num-cpus=8",
                f"--object-store-memory={OBJ_STORE}"], env=env)
        assert r.returncode == 0, f"worker {i}: {r.stderr[-1500:]}"
        time.sleep(2)
    # poll until all 4 raylets are alive
    for _ in range(30):
        r = sh([sys.executable, "-c", (
            "import ray; ray.init(address='127.0.0.1:6379');"
            "print(sum(1 for n in ray.nodes() if n['Alive'])); ray.shutdown()")],
            env=env)
        if r.returncode == 0 and r.stdout.strip().splitlines()[-1] == "4":
            break
        time.sleep(2)
    else:
        raise AssertionError(f"4 raylets never alive: {r.stdout} {r.stderr[-500:]}")

    try:
        e4 = {**env, "EXPECT_NODES": "4"}
        r = sh([sys.executable, "tools/two_node_bench.py", "4node_8x4"],
               env=e4, cwd=REPO)
        assert r.returncode == 0, r.stderr[-3000:]
        flagship = json.loads(r.stdout.strip().splitlines()[-1])

        r = sh([sys.executable, "tools/two_node_query_sweep.py", "cluster"],
               env=e4, cwd=REPO)
        assert r.returncode == 0, r.stderr[-3000:]
    finally:
        sh(["ray", "stop", "--force"])

    single = json.load(open("/tmp/query_sweep_hashes_single.json"))
    cluster = json.load(open("/tmp/query_sweep_hashes_cluster.json"))
    diff = {k: (single.get(k), cluster.get(k))
            for k in set(single) | set(cluster) if single.get(k) != cluster.get(k)}

    out = {
        "what": "KG flagship + full query sweep on FOUR real raylets (8+8+8+8), single-node controls",
        "flagship_4node": flagship,
        "flagship_single": single_flagship,
        "digest_identical": flagship["digest"] == single_flagship["digest"],
        "all_nodes_execute": len(flagship.get("tasks_per_node", {})) == 4,
        "query_sweep": {
            "n_queries": len(single),
            "identical": not diff,
            "mismatches": diff,
        },
    }
    path = os.path.join(REPO, "scaling_r5_4node.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    assert out["digest_identical"], "digest mismatch across node counts"
    assert not diff, diff


if __name__ == "__main__":
    main()
