"""Bandwidth-limited keep-dict A/B on a REAL 2-node cluster (VERDICT r3 #2).

keep-dict (GRAFT_EXCHANGE_COMPRESS / GRAFT_KEEP_DICT) shrinks exchange
partitions to ~1/3 of raw bytes at a measured ~76% single-box wall cost —
its thesis is that the trade flips when the NIC, not the CPU, is the
bottleneck.  Loopback is not a NIC, so round 3 left that unmeasured.  This
harness creates the missing bottleneck with ``tc tbf`` on ``lo`` (same-node
plasma traffic is shared-memory and unaffected; CROSS-node object transfer
rides loopback gRPC and gets throttled — exactly the cluster posture):

  for each rate in {unlimited, 5gbit, 1gbit}:
      flat / keep-dict builds, interleaved repeats, digests compared

Writes ``scaling_r4_netem.json`` at the repo root.  Needs root (tc) and
exclusive Ray ownership (ray stop --force).  Usage:

    RAY_ADDRESS= python tools/netem_keepdict_ab.py [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATES = [None, "5gbit", "1gbit"]
BURST = "1mbit"


def sh(cmd: str, **kw):
    return subprocess.run(cmd, shell=True, capture_output=True, text=True, **kw)


def set_rate(rate: str | None) -> None:
    sh("tc qdisc del dev lo root")
    if rate is not None:
        r = sh(f"tc qdisc add dev lo root tbf rate {rate} burst {BURST} latency 100ms")
        assert r.returncode == 0, r.stderr


def start_cluster() -> subprocess.Popen:
    sh("ray stop --force")
    time.sleep(2)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = sh(
        "ray start --head --num-cpus=16 --port=6379 --include-dashboard=false",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    worker = subprocess.Popen(
        ["ray", "start", "--address=127.0.0.1:6379", "--num-cpus=16", "--block"],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        chk = sh(
            'python -c "import ray; ray.init(address=\'127.0.0.1:6379\');'
            'print(sum(1 for n in ray.nodes() if n[\'Alive\']))"',
            env=env,
        )
        if chk.stdout.strip().endswith("2"):
            return worker
        time.sleep(2)
    raise RuntimeError("worker never joined")


def run_build(label: str, keep_dict: bool) -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    args = [sys.executable, "tools/two_node_bench.py", label]
    if keep_dict:
        args.append("keep_dict")
    r = subprocess.run(args, env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {"rates": [], "burst": BURST, "repeats": repeats}
    try:
        start_cluster()
        for rate in RATES:
            set_rate(rate)
            walls: dict[str, list[float]] = {"flat": [], "keep_dict": []}
            digests = set()
            for rep in range(repeats):
                for mode, kd in (("flat", False), ("keep_dict", True)):
                    lbl = f"netem_{rate or 'none'}_{mode}_{rep}"
                    out = run_build(lbl, kd)
                    walls[mode].append(out["wall_sec"])
                    digests.add(out["digest"])
                    print(json.dumps({"rate": rate, "mode": mode, "rep": rep,
                                      **{k: out[k] for k in
                                         ("wall_sec", "triples_per_sec", "digest")}}),
                          flush=True)
            entry = {
                "rate": rate or "unlimited",
                "flat_walls": walls["flat"],
                "keep_dict_walls": walls["keep_dict"],
                "flat_best": min(walls["flat"]),
                "keep_dict_best": min(walls["keep_dict"]),
                "keep_dict_speedup": round(
                    min(walls["flat"]) / min(walls["keep_dict"]), 3
                ),
                "digest_identical": len(digests) == 1,
            }
            results["rates"].append(entry)
            print(json.dumps(entry), flush=True)
    finally:
        set_rate(None)
        sh("ray stop --force")
    with open(os.path.join(REPO, "scaling_r4_netem.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
