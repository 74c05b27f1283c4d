"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "num_cpus": N, "kg": {...}}

Modes:
  python bench.py            # full bench at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling  # same KG job at 8 vs 32 CPUs in fresh
                             # processes; prints throughputs + efficiency

The headline metric is end-to-end KG-construct wall time (corpus →
extract → link → dedup → Jelly shards) plus per-query wall times for the
representative operator pipelines. Codec-only serialize/parse throughput is
also measured (single core, bytes/s).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: corpus size per sf directory (deterministic synthesized code corpus).
#: sf0.1 uses the full bench corpus (1.92M files → 19.6M triples) so the
#: headline KG number measures the engine, not per-run fixed costs; override
#: with GRAFT_KG_FILES for a quick run.
_CORPUS_FILES = {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 1_920_000}

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q_top_parts",
    "q_mktsegment_stats",
    "q_events_by_type",
    "q_events_asof_order",
    "q_event_bursts",
    "q_order_price_quantiles",
    "q_doc_splits",
    "q_doc_token_stats",
    "q_doc_quality",
    "q_corpus_prep",
    "q_minhash_pairs",
    "q_ngram_jaccard_pairs",
    "q_simhash_pairs",
    "q_customer_running_spend",
    "q_lineitem_qty_price_corr",
    "q_embedding_topk",
    "q_embedding_topk_multi",
    "q_embedding_sim_range",
    "q_kg_jelly_roundtrip",
    # late-round operators (informational walls; headline metric is KG e2e)
    "q_priority_distinct_custs",
    "q_big_quantity_orders",
    "q_supplier_part_pagerank",
    "q_events_trailing_week",
    "q_doc_tfidf_top_terms",
    "q_user_event_sequence",
    "q_doc_merge_upsert",
    "q_customer_name_edit1",
    "q_near_dup_doc_groups",
    "q_incremental_event_stats",
    "q_copurchase_part_pairs",
    "q_weekly_retention_cohorts",
    "q_price_weighted_quantiles",
    "q_lineitem_spearman",
    "q_events_value_cusum",
    "q_concurrent_user_bursts",
    "q_doc_lm_perplexity",
    "q_embedding_self_nn",
    "q_hybrid_search_rrf",
    "q_click_purchase_value_ks",
    "q_nation_spend_gini",
    "q_customer_priority_scd2",
    "q_doc_bm25",
]


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _corpus_path(sf_dir: str, n_files: int | None = None) -> str:
    tag = _sf_tag(sf_dir)
    n = n_files or _CORPUS_FILES.get(tag, 3000)
    if n > 200_000:
        # big corpora: parallel generation into a parquet directory
        path = f"/tmp/pyjelly_ray_corpus_{tag}_{n}"
        marker = path + ".done"  # outside the dir so read_parquet never sees it
        if not os.path.exists(marker):
            import ray

            from pyjelly_ray.pipelines.corpus import write_corpus_parquet_ray

            own = not ray.is_initialized()
            if own:
                ray.init(address="local", include_dashboard=False)
            write_corpus_parquet_ray(path, seed=7, n_files=n)
            open(marker, "w").write("ok")
            if own:
                ray.shutdown()
        return path
    path = f"/tmp/pyjelly_ray_corpus_{tag}_{n}.parquet"
    if not os.path.exists(path):
        from pyjelly_ray.pipelines.corpus import write_corpus_parquet

        write_corpus_parquet(path, seed=7, n_files=n)
    return path


def _consume(ds) -> int:
    import pyarrow as pa

    if isinstance(ds, pa.Table):
        return ds.num_rows
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
    return n


def run_kg(sf_dir: str, out_root: str = "/tmp/pyjelly_ray_bench_kg",
           n_files: int | None = None) -> dict:
    """End-to-end KG construct; returns wall, rows, triples/sec."""
    from pyjelly_ray.pipelines.kg import build_kg

    corpus = _corpus_path(sf_dir, n_files)
    out_dir = os.path.join(out_root, _sf_tag(sf_dir))
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    # GRAFT_MATERIALIZE=0 → fully streaming plan (corpus scanned twice,
    # triples never pinned) — the plasma-constrained posture, see
    # build_kg's docstring and the --mem-pressure mode
    manifests = build_kg(
        corpus, out_dir, n_shards=32,
        materialize_triples=os.environ.get("GRAFT_MATERIALIZE", "1") != "0",
    )
    rows = manifests.take_all()
    wall = time.perf_counter() - t0
    n_stmts = sum(r["n_statements"] for r in rows)
    n_bytes = sum(r["n_bytes"] for r in rows)
    return {
        "wall_sec": round(wall, 3),
        "n_statements": n_stmts,
        "n_bytes": n_bytes,
        "triples_per_sec": round(n_stmts / wall, 1),
        "n_shards": len(rows),
    }


def run_codec_micro(n: int = 200_000) -> dict:
    """Single-core codec throughput (serialize + parse), statements/s."""
    from pyjelly_ray import terms as T
    from pyjelly_ray.jelly import StreamOptions, decode_flat, encode_flat

    stmts = []
    ex = "https://codekg.dev/sym/org0001/repo0001/"
    for i in range(n):
        stmts.append(
            (
                T.iri(f"{ex}pkg{i % 97}.mod_{i % 1009}"),
                T.iri("https://codekg.dev/ont#calls"),
                T.iri(f"{ex}pkg{i % 89}.fn_{i % 997}"),
            )
        )
    t0 = time.perf_counter()
    data = b"".join(encode_flat(iter(stmts), StreamOptions()))
    t_ser = time.perf_counter() - t0
    t0 = time.perf_counter()
    count = sum(1 for _ in decode_flat(data))
    t_de = time.perf_counter() - t0
    assert count == n

    # columnar fast paths (the shard-writer / jelly-source hot paths)
    from pyjelly_ray.jelly.decode_fast import decode_table
    from pyjelly_ray.jelly.encode_fast import encode_table
    from pyjelly_ray.sources.jelly_source import statements_to_table

    table = statements_to_table(stmts)
    t0 = time.perf_counter()
    fast_bytes = b"".join(encode_table(table, StreamOptions()))
    t_fser = time.perf_counter() - t0
    assert fast_bytes == data
    t0 = time.perf_counter()
    fast_table = decode_table(data)
    t_fde = time.perf_counter() - t0
    assert fast_table.num_rows == n
    return {
        "serialize_stmts_per_sec": round(n / t_ser, 1),
        "parse_stmts_per_sec": round(n / t_de, 1),
        "serialize_fast_stmts_per_sec": round(n / t_fser, 1),
        "parse_fast_stmts_per_sec": round(n / t_fde, 1),
        "serialize_mb_per_sec": round(len(data) / t_ser / 1e6, 2),
        "parse_mb_per_sec": round(len(data) / t_de / 1e6, 2),
        "bytes_per_stmt": round(len(data) / n, 2),
    }


def run_media_micro() -> dict:
    """Single-core REAL-media decode throughput (informational): the
    pure-numpy JPEG/PNG/GIF/TIFF-LZW image codecs and the FLAC audio codec
    over deterministic synth payloads (decode only, payloads pre-built)."""
    import numpy as np

    from pyjelly_ray.stages.flac import decode_flac, encode_flac
    from pyjelly_ray.stages.media_containers import (
        decode_gif, decode_tiff, encode_gif, encode_tiff,
    )
    from pyjelly_ray.stages.multimodal import (
        decode_jpeg, decode_png, synth_jpeg_table, synth_png_table,
    )

    rng = np.random.default_rng(0)
    pal = np.unique(rng.integers(0, 256, (64, 3), dtype=np.uint8), axis=0)
    gifs = [encode_gif(pal[rng.integers(0, len(pal), (48, 64))]) for _ in range(32)]
    tiffs = [
        encode_tiff(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8), compression="lzw")
        for _ in range(32)
    ]
    sig = (np.sin(np.arange(16000) / 9) * 18000).astype(np.int16)
    flacs = [encode_flac(np.roll(sig, 37 * i), 8000) for i in range(8)]
    jpegs = synth_jpeg_table(64).column("payload").to_pylist()
    pngs = synth_png_table(64).column("payload").to_pylist()

    # realistic-size payloads: the 48x64/24x32 grids above measure mostly
    # per-image fixed overhead; these measure sustained entropy-decode
    # throughput (the r5 compiled folds' target)
    from pyjelly_ray.stages.multimodal import encode_jpeg

    big = (
        rng.integers(0, 256, (512, 768, 3)).astype(np.float32) * 0.3
        + np.linspace(0, 180, 768)[None, :, None]
    ).astype(np.uint8)
    jpeg_big = [encode_jpeg(big, quality=85), encode_jpeg(big, quality=85, progressive=True)]
    from pyjelly_ray.stages.vp8l import decode_webp_lossless, encode_webp_lossless

    webps = [
        encode_webp_lossless(big[:256], subtract_green=True),
        encode_webp_lossless(big[:256], predictor_mode=7, cache_bits=6),
    ]
    sig_big = (np.sin(np.arange(240000) / 9) * 18000).astype(np.int16)
    flac_big = [encode_flac(sig_big, 8000)]

    out = {}
    for name, payloads, dec in (
        ("jpeg", jpegs, decode_jpeg),
        ("png", pngs, decode_png),
        ("gif", gifs, decode_gif),
        ("tiff_lzw", tiffs, decode_tiff),
        ("flac", flacs, lambda p: decode_flac(p)[0]),
        ("jpeg_large", jpeg_big, decode_jpeg),
        ("flac_large", flac_big, lambda p: decode_flac(p)[0]),
        ("webp_lossless", webps, decode_webp_lossless),
    ):
        t0 = time.perf_counter()
        for p in payloads:
            dec(p)
        dt = time.perf_counter() - t0
        out[f"{name}_decodes_per_sec"] = round(len(payloads) / dt, 1)
        out[f"{name}_mb_per_sec"] = round(sum(len(p) for p in payloads) / dt / 1e6, 2)
    return out


def run_queries(sf_dir: str) -> dict:
    from pyjelly_ray.pipelines.relational import QUERIES

    out = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(QUERIES[name](sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _warm_ray_data() -> None:
    """The first ray.data read-API call of a session pays ~1.1 s of
    one-time framework init (datasource/executor first touch — measured
    r5: an identical second constructor call costs 0.04 s).  Pay it on a
    1-row file BEFORE the timed region so the bench measures the
    pipeline, not the framework's first touch."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    p = "/tmp/pyjelly_ray_warm.parquet"
    if not os.path.exists(p):
        pq.write_table(pa.table({"x": [1]}), p)
    ray.data.read_parquet(p).materialize()


def bench_once(num_cpus: int, *, kg_only: bool = False, n_files: int | None = None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        _warm_ray_data()
        kg = run_kg(SF_DIR, n_files=n_files)
        result = {"kg": kg, "num_cpus": num_cpus}
        if not kg_only:
            result["queries"] = run_queries(SF_DIR)
            result["codec"] = run_codec_micro()
            result["media"] = run_media_micro()
        return result
    finally:
        ray.shutdown()


def _alu_task(_):
    """In-L1 register workload: pure compute, no memory traffic beyond
    ~64 KB.  Any sub-1.0 N→4N scaling measured on THIS is a property of
    the host (vCPU oversubscription / hidden SMT), not of any pipeline."""
    import numpy as np

    a = np.arange(8192, dtype=np.float64)
    for _ in range(40000):
        a = a * 1.000001 + 0.5
    return float(a[0])


def hw_ceiling(lo: int, hi: int) -> dict:
    """Measured hardware scaling ceiling for the (lo→hi)-worker pair via a
    compute-bound control (multiprocessing, Ray-free on purpose).

    On this sandbox the guest reports 32 independent cores but the host
    does not deliver them: the ALU control itself scales at ~0.60 for
    8→32 (per-task wall stretches ~1.9× from 4-way to 32-way with 0%
    steal reported).  Pipeline efficiencies should therefore be read
    against this ceiling — a real 4× node jump adds whole machines, not
    oversubscribed vCPUs.
    """
    import multiprocessing as mp

    def run(nworkers: int, ntasks: int) -> float:
        with mp.Pool(nworkers) as p:
            t0 = time.time()
            p.map(_alu_task, range(ntasks), chunksize=1)
            return time.time() - t0

    ntasks = hi * 2
    walls_lo, walls_hi = [], []
    for _ in range(2):  # interleaved, same noise window
        walls_lo.append(run(lo, ntasks))
        walls_hi.append(run(hi, ntasks))
    eff = (min(walls_lo) / min(walls_hi)) / (hi / lo)
    return {
        "alu_wall_lo": round(min(walls_lo), 2),
        "alu_wall_hi": round(min(walls_hi), 2),
        "alu_efficiency": round(eff, 3),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        # fresh processes at different parallelism on the SAME input —
        # sandbox stand-in for N vs 4N nodes (north rule scaling criterion).
        # A larger corpus is used so the job is compute-bound and per-task
        # fixed costs don't dominate (they wouldn't at 100 TB either).
        # GRAFT_SCALING_CPUS may list several ";"-separated N,4N pairs
        # (e.g. "2,8;8,32"): all are measured and reported, because a single
        # box saturates memory bandwidth past ~8-16 concurrent string-heavy
        # tasks (see ROADMAP) — a ceiling that does not exist across nodes,
        # where each node adds its own memory channels.
        scaling_files = int(os.environ.get("GRAFT_SCALING_FILES", "1920000"))
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
        pairs = [
            tuple(int(x) for x in p.split(","))
            for p in os.environ.get("GRAFT_SCALING_CPUS", "2,8;8,32").split(";")
        ]
        _corpus_path(SF_DIR, scaling_files)  # generate once before timing
        # INTERLEAVE repeats across cpu configs (8,32,8,32 — not 8,8,32,32):
        # the host's effective per-core throughput drifts ~2-3× on minute
        # timescales (physical-host co-tenancy; 0% steal, CPU-seconds for
        # identical work measured varying 574 s → 864 s run-to-run).  Two
        # estimators are reported per pair:
        #   - best-of-N walls per config ("efficiency"): comparable across
        #     rounds, but each config's best may sample a DIFFERENT noise
        #     window, so the ratio is biased on a noisy host;
        #   - per-window efficiency median ("efficiency_median_window"):
        #     each repeat window runs every config back-to-back, so the two
        #     legs of a ratio share most of that window's noise factor —
        #     the median across windows is the robust scaling estimate.
        samples: dict[int, list[dict]] = {c: [] for p in pairs for c in p}
        cpu_configs = sorted(samples)
        for _ in range(repeats):
            for cpus in cpu_configs:
                # flush write-back so neither run pays the other's dirty pages
                subprocess.run(["sync"], check=False)
                cmd = [
                    sys.executable, __file__, "--kg-only",
                    f"--cpus={cpus}", f"--files={scaling_files}",
                ]
                out = subprocess.run(cmd, capture_output=True, text=True, check=True)
                line = out.stdout.strip().splitlines()[-1]
                samples[cpus].append(json.loads(line))
        payload = {
            "metric": "kg_construct_scaling",
            "sf": _sf_tag(SF_DIR),
            "pairs": {},
        }
        results = {
            c: min(rs, key=lambda r: r["kg"]["wall_sec"]) for c, rs in samples.items()
        }
        for lo, hi in pairs:
            t_lo = results[lo]["kg"]["triples_per_sec"]
            t_hi = results[hi]["kg"]["triples_per_sec"]
            eff = (t_hi / t_lo) / (hi / lo)
            window_effs = sorted(
                (w_hi["kg"]["triples_per_sec"] / w_lo["kg"]["triples_per_sec"])
                / (hi / lo)
                for w_lo, w_hi in zip(samples[lo], samples[hi])
            )
            med = window_effs[len(window_effs) // 2]
            if len(window_effs) % 2 == 0:
                med = (med + window_effs[len(window_effs) // 2 - 1]) / 2
            ceiling = hw_ceiling(lo, hi)
            payload["pairs"][f"{lo}->{hi}"] = {
                "efficiency": round(eff, 3),
                "efficiency_median_window": round(med, 3),
                "efficiency_windows": [round(e, 3) for e in window_effs],
                # compute-bound control ceiling for the same pair on this
                # host + the pipeline's efficiency normalized to it (a
                # value ≥ 1.0 means the pipeline scales as well as pure
                # in-cache compute can on this box)
                **ceiling,
                "efficiency_vs_hw_ceiling": round(
                    eff / ceiling["alu_efficiency"], 3
                ),
                f"throughput_{lo}cpu": t_lo,
                f"throughput_{hi}cpu": t_hi,
                f"wall_{lo}cpu": results[lo]["kg"]["wall_sec"],
                f"wall_{hi}cpu": results[hi]["kg"]["wall_sec"],
                f"walls_{lo}cpu": [r["kg"]["wall_sec"] for r in samples[lo]],
                f"walls_{hi}cpu": [r["kg"]["wall_sec"] for r in samples[hi]],
            }
        # headline: the first pair's efficiency
        first = payload["pairs"][f"{pairs[0][0]}->{pairs[0][1]}"]
        payload["value"] = first["efficiency"]
        payload["unit"] = f"efficiency(N={pairs[0][0]}->4N={pairs[0][1]})"
        print(json.dumps(payload))
        return

    if "--mem-pressure" in sys.argv:
        # Memory-pressure posture (VERDICT r2 next-round #4): run the KG
        # flagship with an object store sized ≪ the triple working set and
        # prove streaming execution + plasma spill complete the job with
        # correct output and bounded memory — the 100-TB claim's "data far
        # exceeds aggregate plasma" leg.  Spill volume is read from the Ray
        # session's object_spilling directory (public on-disk surface).
        import glob as _glob

        import ray

        store = int(os.environ.get("GRAFT_STORE_BYTES", str(512 * 1024 * 1024)))
        n = int(os.environ.get("GRAFT_KG_FILES", "1920000"))
        _corpus_path(SF_DIR, n)  # ensure generated outside the timed window
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            object_store_memory=store,
        )
        session = ray._private.worker.global_worker.node.get_session_dir_path()
        # spill files are deleted as objects are freed — sample the spill
        # dir during the run to get cumulative volume + peak concurrency
        import threading

        seen: dict = {}
        peak = [0]
        stop = threading.Event()

        def _sample():
            pat = os.path.join(session, "**", "*spill*", "*")
            while not stop.is_set():
                cur = 0
                for f in _glob.glob(pat, recursive=True):
                    try:
                        sz = os.path.getsize(f)
                    except OSError:
                        continue
                    cur += sz
                    seen[f] = max(seen.get(f, 0), sz)
                peak[0] = max(peak[0], cur)
                stop.wait(0.5)

        th = threading.Thread(target=_sample, daemon=True)
        th.start()
        r = run_kg(SF_DIR, out_root="/tmp/pyjelly_ray_memp_kg", n_files=n)
        stop.set()
        th.join(timeout=5)
        spilled = sum(seen.values())
        ray.shutdown()
        print(json.dumps({
            "metric": "kg_mem_pressure",
            "object_store_bytes": store,
            "num_cpus": NUM_CPUS,
            "kg": r,
            "spilled_bytes_cumulative": spilled,
            "spilled_bytes_peak_concurrent": peak[0],
            "value": r["wall_sec"],
            "unit": "sec",
        }))
        return

    cpus = NUM_CPUS
    kg_only = "--kg-only" in sys.argv
    n_files = (
        int(os.environ["GRAFT_KG_FILES"]) if "GRAFT_KG_FILES" in os.environ else None
    )
    for a in sys.argv:
        if a.startswith("--cpus="):
            cpus = int(a.split("=")[1])
        elif a.startswith("--files="):
            n_files = int(a.split("=")[1])
    r = bench_once(cpus, kg_only=kg_only, n_files=n_files)
    payload = {
        "metric": "kg_construct_e2e_wall",
        "value": r["kg"]["wall_sec"],
        "unit": "sec",
        "queries": r.get("queries", {}),
        "sf": _sf_tag(SF_DIR),
        "num_cpus": cpus,
        "kg": r["kg"],
    }
    if "codec" in r:
        payload["codec"] = r["codec"]
    if "media" in r:
        payload["media"] = r["media"]
    print(json.dumps(payload))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
