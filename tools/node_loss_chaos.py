"""Node-loss chaos: kill the worker node mid-KG-build, prove recovery.

The one untested leg of the multi-node claim (round-3 verdict #1): the
raw-task exchange holds materialized block refs whose reconstruction story
after node death had never been exercised.  This harness:

1. starts a REAL 2-node Ray cluster on this box (head + worker with its own
   raylet/object store; the worker runs under ``ray start --block`` in its
   own process group so SIGKILL takes the whole node down at once),
2. runs a clean 2-node build → reference digests,
3. starts a fresh build and SIGKILLs the worker's process group mid-flight,
4. records which recovery path the job took:
     - ``lineage``  — the driver-side run completes anyway (Ray re-executes
       lost tasks / reconstructs lost objects from lineage on the head),
     - ``resume``   — the run fails; a second build over the same out dir
       (manifest skip/rewrite) must finish the job,
   and asserts the final shard bytes equal the clean build's, byte for byte.

Usage:  RAY_ADDRESS= python tools/node_loss_chaos.py [kill_frac ...]

``kill_frac`` values (default ``0.3 0.7``) position the kill at that
fraction of the measured clean-build wall — early lands in extract/map,
late in the dedup/write exchange.  Writes ``chaos_r4_nodeloss.json`` next
to the repo root and prints it.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/pyjelly_ray_corpus_sf0.1_1920000"
HEAD_CPUS = 16
WORKER_CPUS = 16

BUILD_SNIPPET = r"""
import glob, hashlib, json, os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="127.0.0.1:6379", ignore_reinit_error=True)
# report which raylet the driver attached to: with two same-IP raylets on
# one box the GCS pick is ambiguous, so the harness kills the OTHER node
# (the semantics under test are REMOTE-node loss, whichever raylet that is)
sock = ray._private.worker.global_worker.node.raylet_socket_name
with open({status!r}, "w") as f:
    json.dump({{"driver_raylet": sock}}, f)
from pyjelly_ray.pipelines.kg import build_kg
t0 = time.perf_counter()
rows = build_kg({corpus!r}, {out!r}, n_shards=32).take_all()
wall = time.perf_counter() - t0
print(json.dumps({{"wall": wall, "n": sum(r["n_statements"] for r in rows)}}))
ray.shutdown()
"""


def sh(cmd, **kw):
    return subprocess.run(cmd, shell=True, capture_output=True, text=True, **kw)


def digests(out_dir: str) -> dict[str, str]:
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(out_dir, "part-*.jelly")))
    }


def start_cluster(head_only: bool = False):
    sh("ray stop --force")
    time.sleep(2)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = sh(
        f"ray start --head --num-cpus={HEAD_CPUS} --port=6379 "
        "--include-dashboard=false",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    if head_only:
        return None
    worker = subprocess.Popen(
        ["ray", "start", "--address=127.0.0.1:6379",
         f"--num-cpus={WORKER_CPUS}", "--block"],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the worker to register
    deadline = time.time() + 60
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


STATUS = "/tmp/kg_chaos_driver_status.json"


def run_build(out: str, timeout: int = 900) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    if os.path.exists(STATUS):
        os.unlink(STATUS)
    return subprocess.Popen(
        [sys.executable, "-c",
         BUILD_SNIPPET.format(repo=REPO, corpus=CORPUS, out=out, status=STATUS)],
        env=env, cwd=REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def raylet_pids() -> dict[str, int]:
    """{raylet_socket_name: pid} for every live raylet process."""
    import re

    r = sh("pgrep -af raylet")
    out = {}
    for line in r.stdout.splitlines():
        m = re.search(r"--raylet_socket_name=(\S+)", line)
        if m and "/raylet/raylet" in line.split()[1]:
            out[m.group(1)] = int(line.split()[0])
    return out


def kill_other_node(worker: subprocess.Popen) -> str:
    """SIGKILL the raylet the driver is NOT attached to; returns which
    ('worker_raylet' if it was the second node, else 'head_raylet')."""
    deadline = time.time() + 30
    while not os.path.exists(STATUS) and time.time() < deadline:
        time.sleep(0.2)
    with open(STATUS) as f:
        driver_sock = json.load(f)["driver_raylet"]
    victims = {s: pid for s, pid in raylet_pids().items() if s != driver_sock}
    assert victims, "no other raylet to kill"
    sock, pid = sorted(victims.items())[0]
    if sock.endswith(".1"):  # the worker node: kill its whole process group
        try:
            os.killpg(worker.pid, signal.SIGKILL)
        except ProcessLookupError:
            os.kill(pid, signal.SIGKILL)
        worker.wait()
        return "worker_raylet"
    os.kill(pid, signal.SIGKILL)  # head raylet (GCS survives separately)
    return "head_raylet"


def main() -> None:
    fracs = [float(a) for a in sys.argv[1:]] or [0.3, 0.7]
    assert os.path.isdir(CORPUS), (
        f"corpus cache missing: {CORPUS} — run `python bench.py --kg-only` once"
    )
    results = {"corpus": CORPUS, "head_cpus": HEAD_CPUS,
               "worker_cpus": WORKER_CPUS, "runs": []}

    worker = start_cluster()
    try:
        clean = "/tmp/kg_chaos_clean"
        shutil.rmtree(clean, ignore_errors=True)
        p = run_build(clean)
        out_line, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        clean_wall = json.loads(out_line.strip().splitlines()[-1])["wall"]
        want = digests(clean)
        results["clean_wall_sec"] = round(clean_wall, 2)
        results["n_shards"] = len(want)
        print(f"clean 2-node build: {clean_wall:.1f}s, {len(want)} shards",
              flush=True)

        for frac in fracs:
            # fresh 2-node cluster for each round (a node died last round)
            worker = start_cluster()
            out = f"/tmp/kg_chaos_kill_{int(frac * 100)}"
            shutil.rmtree(out, ignore_errors=True)
            t_kill = clean_wall * frac
            p = run_build(out)
            time.sleep(t_kill)
            victim = kill_other_node(worker)
            print(f"[frac={frac}] killed {victim} at t={t_kill:.1f}s",
                  flush=True)
            try:
                out_line, err = p.communicate(timeout=900)
                rc = p.returncode
            except subprocess.TimeoutExpired:
                p.kill()
                out_line, err = p.communicate()
                rc = -9
            run = {"kill_frac": frac, "kill_after_sec": round(t_kill, 2),
                   "victim": victim, "first_run_rc": rc}
            if rc == 0:
                run["path"] = "lineage"
                run["recovery_wall_sec"] = round(
                    json.loads(out_line.strip().splitlines()[-1])["wall"], 2
                )
            else:
                run["path"] = "resume"
                run["first_run_tail"] = err[-800:]
                # resume on a FRESH head-only cluster (the operational
                # scenario: job died with a node, cluster rescheduled) —
                # also sidesteps the dead-raylet GCS entry lingering in
                # the old control plane
                start_cluster(head_only=True)
                t0 = time.time()
                p2 = run_build(out)
                out2, err2 = p2.communicate(timeout=900)
                run["resume_rc"] = p2.returncode
                run["recovery_wall_sec"] = round(time.time() - t0, 2)
                assert p2.returncode == 0, err2[-3000:]
            got = digests(out)
            run["digest_equal"] = got == want
            run["recovered_shards"] = len(got)
            results["runs"].append(run)
            print(json.dumps(run), flush=True)
            assert got == want, f"digest mismatch after node loss (frac={frac})"
    finally:
        sh("ray stop --force")

    results["ok"] = all(r["digest_equal"] for r in results["runs"])
    path = os.path.join(REPO, "chaos_r4_nodeloss.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
