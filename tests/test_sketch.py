"""Mergeable sketch operators: accuracy vs exact answers through Ray."""

import numpy as np
import pyarrow as pa


def test_hll_kernel_accuracy_and_merge_order():
    from pyjelly_ray.stages.sketch import HyperLogLog, _hash64

    rng = np.random.default_rng(1)
    vals = np.unique(rng.integers(0, 10**12, 20_000))
    h = _hash64(pa.array(vals, pa.int64()))
    whole = HyperLogLog(12)
    whole.add_hashes(h)
    # merge of shuffled partials == single-pass registers (associativity)
    perm = rng.permutation(len(h))
    acc = HyperLogLog(12)
    for chunk in np.array_split(h[perm], 7):
        part = HyperLogLog(12)
        part.add_hashes(chunk)
        acc = acc.merge(part)
    assert (acc.registers == whole.registers).all()
    err = abs(acc.estimate() - len(vals)) / len(vals)
    assert err < 0.05  # ~3 sigma at p=12 (sigma ~1.6%)


def test_tdigest_kernel_bounded_and_accurate():
    from pyjelly_ray.stages.sketch import TDigest

    rng = np.random.default_rng(2)
    data = rng.exponential(3.0, 100_000)
    acc = TDigest(200.0)
    for chunk in np.array_split(data, 11):
        acc = acc.merge(TDigest.from_values(chunk))
    assert len(acc.means) <= 2 * 200  # bounded regardless of input size
    for q in (0.25, 0.5, 0.9):
        exact = float(np.quantile(data, q))
        assert abs(acc.quantile(q) - exact) / max(abs(exact), 1e-9) < 0.05
    # round-trip through the wire format
    back = TDigest.from_bytes(acc.to_bytes())
    assert back.quantile(0.5) == acc.quantile(0.5)


def test_grouped_sketches_vs_exact(ray_session):
    import duckdb
    import ray

    from pyjelly_ray.stages.sketch import (
        grouped_approx_distinct,
        grouped_approx_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/events.parquet",
                               columns=["event_type", "user_id", "value"])
    approx = grouped_approx_distinct(ds, ["event_type"], "user_id",
                                     out_name="n").to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).fetchdf()
    m = approx.merge(exact, on="event_type", suffixes=("_a", "_e"))
    assert len(m) == len(exact)
    assert (abs(m.n_a - m.n_e) / m.n_e).max() < 0.06

    qa = grouped_approx_quantiles(
        ds, ["event_type"], "value", [("p50", 0.5), ("p90", 0.9)]
    ).to_pandas()
    qe = con.execute(
        f"SELECT event_type, quantile_cont(value, 0.5) AS p50, "
        f"quantile_cont(value, 0.9) AS p90 "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).fetchdf()
    mq = qa.merge(qe, on="event_type", suffixes=("_a", "_e"))
    assert len(mq) == len(qe)
    for c in ("p50", "p90"):
        rel = abs(mq[f"{c}_a"] - mq[f"{c}_e"]) / abs(mq[f"{c}_e"])
        assert rel.max() < 0.05, (c, rel.max())


def test_approx_heavy_hitters_vs_exact(ray_session):
    """Zipf-ish multi-block stream: sketch top-k == exact top-k, counts
    exact for always-retained values and within the n/(m+1) bound."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray

    from pyjelly_ray.stages.sketch import approx_heavy_hitters

    rng = np.random.RandomState(11)
    # 40 heavy words (zipf weights) + a long tail of rare ones
    heavy = [f"w{i}" for i in range(40)]
    w = 1.0 / np.arange(1, 41)
    vals = list(rng.choice(heavy, size=20_000, p=w / w.sum()))
    vals += [f"rare{i}" for i in range(5_000)]
    rng.shuffle(vals)
    t = pa.table({"word": pa.array(vals, pa.string())})
    got = approx_heavy_hitters(
        ray.data.from_arrow(t).repartition(8), "word", k=10, per_block=640
    ).take_all()
    exact = collections.Counter(vals)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["word"], r["approx_count"]) for r in got] == want


def test_bloom_semi_prefilter(ray_session):
    """No false negatives; FP rate near target; bloom-prefilter + exact
    semi == plain exact semi."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pyjelly_ray.stages.joins import broadcast_semi
    from pyjelly_ray.stages.sketch import BloomFilter, _hash64, build_bloom, bloom_semi

    keys = pa.table({"k": pa.array(range(0, 4000, 2), pa.int64())})  # evens
    big = pa.table(
        {"k": pa.array(range(6000), pa.int64()),
         "v": pa.array(range(6000), pa.int64())}
    )
    bloom = build_bloom(
        ray.data.from_arrow(keys).repartition(4), "k", n_expected=2000, fp_rate=0.01
    )
    # merge is OR: building from two halves equals one-shot build
    h1 = BloomFilter(2000, 0.01); h1.add_hashes(_hash64(keys.column("k").slice(0, 1000)))
    h2 = BloomFilter(2000, 0.01); h2.add_hashes(_hash64(keys.column("k").slice(1000)))
    assert np.array_equal(h1.merge(h2).bits, bloom.bits)

    ref = ray.put(bloom)
    surv = bloom_semi(
        ray.data.from_arrow(big).repartition(4), ref, "k"
    ).to_pandas()
    members = set(range(0, 4000, 2))
    got = set(surv["k"])
    assert members <= got  # NO false negatives
    fp = len(got - members) / (6000 - len(members))
    assert fp < 0.03  # ~1% target with slack
    # prefilter + exact semi == exact semi
    exact = broadcast_semi(
        ray.data.from_arrow(big), ray.data.from_arrow(keys),
        left_key="k", right_key="k",
    ).to_pandas()
    refined = broadcast_semi(
        bloom_semi(ray.data.from_arrow(big).repartition(4), ref, "k"),
        ray.data.from_arrow(keys), left_key="k", right_key="k",
    ).to_pandas()
    assert sorted(refined["k"]) == sorted(exact["k"])
