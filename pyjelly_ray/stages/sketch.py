"""Mergeable sketches for 100 TB-scale aggregates (SURVEY.md §2 custom
operators, "novel sketch" class).

Exact per-group quantiles (`agg.grouped_quantiles`) and exact distinct
counts co-locate each group's full value set — fine for small group
cardinalities, unbounded at web scale.  These operators keep the pipeline
shape (partial per batch → ONE tiny groupby shuffle → merge) but bound the
per-group state to a fixed-size sketch:

- :class:`HyperLogLog` / :func:`grouped_approx_distinct` — 2^p uint8
  registers per group (default p=12 → 4 KiB); union = elementwise max, so
  partials combine associatively in any order.
- :class:`TDigest` / :func:`grouped_approx_quantiles` — bounded centroid
  list compressed by a scale-function cap; merge = concat + recompress.

Shuffle volume is |groups| × |blocks| × sketch_size regardless of row
count — the property that makes these the 100 TB swap-in documented in
``grouped_quantiles``.  Accuracy is property-tested against exact answers
(HLL ~1.04/sqrt(2^p) ≈ 1.6% at p=12; t-digest sub-percent mid-quantiles).

Value hashing is splitmix64 (vectorized numpy uint64 arithmetic) for
integer columns and pandas' fixed-key siphash (vectorized) for strings —
both deterministic across runs and processes, unlike Python's salted
``hash``.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of an int or string column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        x = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64 finalizer
        with np.errstate(over="ignore"):
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        return x
    # strings/other: pandas' siphash with its fixed default key — vectorized
    # C loop, deterministic across processes (unlike builtin hash under
    # PYTHONHASHSEED); one splitmix finalizer pass decorrelates low bits
    import pandas as pd

    h = pd.util.hash_array(np.asarray(arr.to_numpy(zero_copy_only=False)))
    with np.errstate(over="ignore"):
        h = (h + np.uint64(0x9E3779B97F4A7C15))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _group_partition(b: pa.Table, keys: list[str]):
    """Partition a batch's row indices by group key, loop-free.

    Returns ``(out_keys, order, bounds)``: one representative key row per
    group, a permutation grouping rows, and the group boundary offsets
    (group ``i`` is ``order[bounds[i]:bounds[i+1]]``).
    """
    codes = np.zeros(b.num_rows, np.int64)
    for k in keys:
        _, inv = np.unique(
            b.column(k).to_numpy(zero_copy_only=False), return_inverse=True
        )
        codes = codes * (int(inv.max()) + 1 if len(inv) else 1) + inv
    uniq_codes, first_idx, inv_codes = np.unique(
        codes, return_index=True, return_inverse=True
    )
    out_keys = {k: pc.take(b.column(k), pa.array(first_idx)) for k in keys}
    order = np.argsort(inv_codes, kind="stable")
    bounds = np.searchsorted(inv_codes[order], np.arange(len(uniq_codes) + 1))
    return out_keys, order, bounds


class HyperLogLog:
    """Fixed-size distinct-count sketch; union by register-wise max."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, np.uint8)
        )

    @staticmethod
    def _clz32(v: np.ndarray) -> np.ndarray:
        """Exact leading-zero count of nonzero uint32 values.

        uint32 → float64 is exact and ``np.frexp`` decomposes without
        rounding (v = m·2^e, 0.5 ≤ m < 1 ⇒ MSB index = e-1), unlike a
        ``log2``-based trick which can be off by one near powers of two.
        """
        _, e = np.frexp(v.astype(np.float64))
        return 32 - e.astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, top-aligned
        hi = (rest >> np.uint64(32)).astype(np.uint32)
        lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        clz = np.full(len(h), 64, np.int64)
        nzhi = hi != 0
        clz[nzhi] = self._clz32(hi[nzhi])
        nzlo = ~nzhi & (lo != 0)
        clz[nzlo] = 32 + self._clz32(lo[nzlo])
        # rank = first-set-bit position (1-based), capped at 64-p+1
        rank = np.minimum(clz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / float(np.sum(2.0 ** -self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small n
        return est


def grouped_approx_distinct(ds, keys: list[str] | str, col: str, *,
                            p: int = 12, out_name: str = "approx_distinct"):
    """Approximate COUNT(DISTINCT col) per group via mergeable HLL partials.

    Per batch: one HLL per in-batch group, emitted as a binary register
    row.  One groupby shuffle over |groups|×|blocks| 2^p-byte rows, then a
    register-max merge.  Error ~1.04/sqrt(2^p) (~1.6% at p=12).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {**{k: b.column(k) for k in keys},
                 "_hll": pa.array([], pa.binary())}
            )
        h = _hash64(b.column(col))
        out_keys, order, bounds = _group_partition(b, keys)
        sketches = []
        for gi in range(len(bounds) - 1):
            hll = HyperLogLog(p)
            hll.add_hashes(h[order[bounds[gi]:bounds[gi + 1]]])
            sketches.append(hll.registers.tobytes())
        out_keys["_hll"] = pa.array(sketches, pa.binary())
        return pa.table(out_keys)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], group.schema.field(k).type) for k in keys},
                 out_name: pa.array([], pa.int64())}
            )
        regs = np.zeros(1 << p, np.uint8)
        for s in group.column("_hll").to_pylist():
            regs = np.maximum(regs, np.frombuffer(s, np.uint8))
        est = HyperLogLog(p, regs).estimate()
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        out[out_name] = pa.array([int(round(est))], pa.int64())
        return pa.table(out)

    from .agg import grouped_map

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return grouped_map(partials, keys, merge)


class TDigest:
    """Bounded-size quantile sketch (centroid list, k0 scale cap)."""

    def __init__(self, compression: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.compression = compression
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)

    @classmethod
    def from_values(cls, vals: np.ndarray, compression: float = 200.0) -> "TDigest":
        d = cls(compression)
        if len(vals):
            d._absorb(np.sort(vals.astype(np.float64)), np.ones(len(vals)))
        return d

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merge sorted (means, weights) into the digest and recompress."""
        if len(self.means):
            means = np.concatenate([self.means, means])
            weights = np.concatenate([self.weights, weights])
            order = np.argsort(means, kind="stable")
            means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            return
        # k0 scale function: uniform quantile-space buckets of width 1/δ
        cum = np.cumsum(weights) - weights / 2.0
        bucket = np.floor(cum / total * self.compression).astype(np.int64)
        # combine consecutive centroids sharing a bucket (vectorized segment sums)
        new_seg = np.ones(len(bucket), bool)
        new_seg[1:] = bucket[1:] != bucket[:-1]
        seg_id = np.cumsum(new_seg) - 1
        n_seg = int(seg_id[-1]) + 1
        w = np.zeros(n_seg); np.add.at(w, seg_id, weights)
        m = np.zeros(n_seg); np.add.at(m, seg_id, means * weights)
        self.means, self.weights = m / w, w

    def merge(self, other: "TDigest") -> "TDigest":
        d = TDigest(self.compression, self.means.copy(), self.weights.copy())
        if len(other.means):
            order = np.argsort(other.means, kind="stable")
            d._absorb(other.means[order], other.weights[order])
        return d

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype(np.float64).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, compression: float = 200.0) -> "TDigest":
        arr = np.frombuffer(b, np.float64)
        n = len(arr) // 2
        return cls(compression, arr[:n].copy(), arr[n:].copy())


def grouped_approx_quantiles(ds, keys: list[str] | str, col: str,
                             quantiles: list[tuple[str, float]], *,
                             compression: float = 200.0):
    """Approximate per-group quantiles via mergeable t-digest partials.

    Same pipeline shape as :func:`grouped_approx_distinct`; per-group state
    is ≤ ~2·compression centroids however many rows feed it — the scale
    swap documented in ``agg.grouped_quantiles``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {**{k: b.column(k) for k in keys},
                 "_td": pa.array([], pa.binary())}
            )
        vals = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        out_keys, order, bounds = _group_partition(b, keys)
        sketches = [
            TDigest.from_values(vals[order[bounds[i]:bounds[i + 1]]], compression).to_bytes()
            for i in range(len(bounds) - 1)
        ]
        out_keys["_td"] = pa.array(sketches, pa.binary())
        return pa.table(out_keys)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            cols = {k: pa.array([], group.schema.field(k).type) for k in keys}
            for name, _ in quantiles:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        acc = TDigest(compression)
        for s in group.column("_td").to_pylist():
            acc = acc.merge(TDigest.from_bytes(s, compression))
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        for name, q in quantiles:
            out[name] = pa.array([acc.quantile(q)], pa.float64())
        return pa.table(out)

    from .agg import grouped_map

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return grouped_map(partials, keys, merge)


def approx_heavy_hitters(ds, col: str, k: int = 10, *, per_block: int | None = None,
                         count_name: str = "approx_count"):
    """Approximate global top-k values by frequency (mergeable heavy hitters).

    Space-bounded alternative to the exact explode→count→topk pipeline
    (``q_top_words``) whose intermediate is |distinct values| — unbounded at
    web scale.  Shape (the Misra-Gries / lossy-counting family, mergeable-
    summaries style):

    1. per block: EXACT in-block counts (one Arrow ``group_by``), pruned to
       the ``per_block`` largest counters (default ``64·k``) — bounded
       per-block state and shuffle volume ``per_block × blocks``;
    2. one hash exchange summing retained counters per value;
    3. global top-k on the merged lower-bound counts.

    Guarantee: each block drops only counters ≤ its (per_block+1)-th
    largest, so a value's reported count under-counts by at most
    Σ_b n_b/(per_block+1) ≤ n/(per_block+1).  Any value with true frequency
    above that slack cannot be displaced out of the top-k by pruning.
    Counts are exact for values retained in every block.
    """
    from .agg import global_topk, grouped_agg

    m = per_block if per_block is not None else 64 * k

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {col: b.column(col) if col in b.column_names
                 else pa.array([], pa.string()),
                 "_cnt": pa.array([], pa.int64())}
            )
        g = b.select([col]).group_by([col]).aggregate([([], "count_all")])
        cnt = g.column("count_all")
        if g.num_rows > m:
            order = pc.select_k_unstable(
                g, k=m, sort_keys=[("count_all", "descending")]
            )
            g = g.take(order)
            cnt = g.column("count_all")
        return pa.table({col: g.column(col), "_cnt": pc.cast(cnt, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = grouped_agg(
        partials, [col], [(count_name, "_cnt", "sum")], sum_as_float=False
    )
    return global_topk(merged, [count_name, col], k, descending=[True, False])


class BloomFilter:
    """Vectorized Bloom filter over 64-bit value hashes (mergeable by OR).

    Double hashing (Kirsch-Mitzenmatcher): probe bit i is
    ``(h1 + i·h2) mod m`` from two halves of one splitmix64/sha256 hash —
    no per-hash recomputation.  ``m`` is rounded up to a power of two.
    """

    def __init__(self, n_expected: int, fp_rate: float = 0.01,
                 bits: np.ndarray | None = None):
        m = max(64, int(-n_expected * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = 1 << int(np.ceil(np.log2(m)))
        self.n_hashes = max(1, int(round(self.m / max(1, n_expected) * np.log(2))))
        self.bits = (
            bits if bits is not None else np.zeros(self.m // 64, np.uint64)
        )

    def _probes(self, h: np.ndarray) -> np.ndarray:
        """(n, n_hashes) bit positions in [0, m)."""
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → cycles all slots
        i = np.arange(self.n_hashes, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) & np.uint64(self.m - 1)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._probes(h).reshape(-1)
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, bool)
        pos = self._probes(h)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.n_hashes == other.n_hashes
        out = BloomFilter.__new__(BloomFilter)
        out.m, out.n_hashes, out.bits = self.m, self.n_hashes, self.bits | other.bits
        return out


def build_bloom(ds, col: str, *, n_expected: int, fp_rate: float = 0.01) -> BloomFilter:
    """Build a Bloom filter of ``ds[col]`` (one pass, partial OR per block).

    Partials are per-block bitmaps OR-merged by an O(log blocks) tree of
    Ray tasks (the driver receives exactly ONE bitmap) — bitmap size is
    fixed by (n_expected, fp_rate) regardless of row count, the same
    bounded-state shape as the other sketches.  Broadcast the result with
    ``ray.put`` into :func:`bloom_semi` to pre-filter a big table by a big
    key set WITHOUT a shuffle: no false negatives, ~fp_rate of non-matching
    rows survive (chase exactness with a hash_join semi on the survivors —
    orders of magnitude smaller input).
    """

    import ray

    def partial(b: pa.Table):
        bf = BloomFilter(n_expected, fp_rate)
        if b.num_rows:
            bf.add_hashes(_hash64(b.column(col)))
        return pa.table({"_bloom": pa.array([bf.bits.tobytes()], pa.binary())})

    @ray.remote
    def _or_tables(*tables: pa.Table) -> pa.Table:
        acc = None
        for t in tables:
            if "_bloom" not in t.column_names:  # skipped-UDF empty block
                continue
            for v in t.column("_bloom").to_pylist():
                a = np.frombuffer(v, np.uint64)
                acc = a.copy() if acc is None else (acc | a)
        if acc is None:
            return pa.table({"_bloom": pa.array([], pa.binary())})
        return pa.table({"_bloom": pa.array([acc.tobytes()], pa.binary())})

    # tree-reduce the partials (VERDICT r1 #5): with n_expected=1e10 each
    # bitmap is ~1.5 GB — an O(blocks) driver fold would stream every one
    # through the driver; the O(log blocks) tree keeps peak driver traffic
    # at ONE bitmap and parallelizes the ORs across the cluster
    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    refs = list(parts.to_arrow_refs())
    FANIN = 8
    while len(refs) > 1:
        refs = [
            _or_tables.remote(*refs[i : i + FANIN])
            for i in range(0, len(refs), FANIN)
        ]
    acc = BloomFilter(n_expected, fp_rate)
    if refs:
        t = ray.get(refs[0])
        if t.num_rows and "_bloom" in t.column_names:
            acc.bits |= np.frombuffer(t.column("_bloom")[0].as_py(), np.uint64)
    return acc


def bloom_semi(ds, bloom_ref, col: str):
    """Keep rows whose ``col`` MAY be in the broadcast Bloom filter.

    ``bloom_ref``: a :class:`BloomFilter` or a ``ray.put`` ObjectRef to one
    (broadcast once, read per task — never re-shipped per batch).
    """
    import ray

    class _Member:
        def __init__(self) -> None:
            self.bf = (
                ray.get(bloom_ref)
                if isinstance(bloom_ref, ray.ObjectRef)
                else bloom_ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            return b.filter(pa.array(self.bf.contains_hashes(_hash64(b.column(col)))))

    return ds.map_batches(_Member, batch_format="pyarrow", concurrency=(1, 8))


def distinct_state(ds, keys: list[str] | str, col: str, *, p: int = 12):
    """Persistable distinct-count state: one HLL register blob per key —
    the sketch analogue of :func:`~pyjelly_ray.stages.agg.agg_state`.
    Register-max is associative and commutative, so folding deltas into a
    saved state is BIT-IDENTICAL to sketching the concatenated stream:
    incremental COUNT(DISTINCT) maintenance without history rescans.
    Persist with ``write_parquet`` (binary column); merge with
    :func:`merge_distinct_state`; read counts with
    :func:`finalize_distinct_state`.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {**{k: b.column(k) for k in keys},
                 "_hll": pa.array([], pa.binary())}
            )
        h = _hash64(b.column(col))
        out_keys, order, bounds = _group_partition(b, keys)
        sketches = []
        for gi in range(len(bounds) - 1):
            hll = HyperLogLog(p)
            hll.add_hashes(h[order[bounds[gi]:bounds[gi + 1]]])
            sketches.append(hll.registers.tobytes())
        out_keys["_hll"] = pa.array(sketches, pa.binary())
        return pa.table(out_keys)

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], group.schema.field(k).type) for k in keys},
                 "_hll": pa.array([], pa.binary())}
            )
        regs = np.zeros(1 << p, np.uint8)
        for s in group.column("_hll").to_pylist():
            regs = np.maximum(regs, np.frombuffer(s, np.uint8))
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        out["_hll"] = pa.array([regs.tobytes()], pa.binary())
        return pa.table(out)

    from .agg import grouped_map

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return grouped_map(partials, keys, fold)


def merge_distinct_state(states, keys: list[str] | str, *, p: int = 12):
    """Fold several distinct states (saved + deltas) into one — register
    max per key; new keys appear, existing keys union exactly."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    import ray

    dss = []
    for s in states:
        dss.append(ray.data.from_arrow(s) if isinstance(s, pa.Table) else s)
    ds = dss[0]
    if len(dss) > 1:
        ds = ds.union(*dss[1:])

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], group.schema.field(k).type) for k in keys},
                 "_hll": pa.array([], pa.binary())}
            )
        regs = np.zeros(1 << p, np.uint8)
        for s in group.column("_hll").to_pylist():
            regs = np.maximum(regs, np.frombuffer(s, np.uint8))
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        out["_hll"] = pa.array([regs.tobytes()], pa.binary())
        return pa.table(out)

    from .agg import grouped_map

    return grouped_map(ds, keys, fold)


def finalize_distinct_state(state_ds, keys: list[str] | str, *, p: int = 12,
                            out_name: str = "approx_distinct"):
    """State → estimates (one row per key), no further shuffle."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def est(b: pa.Table) -> pa.Table:
        vals = [
            int(round(HyperLogLog(p, np.frombuffer(s, np.uint8)).estimate()))
            for s in b.column("_hll").to_pylist()
        ]
        return pa.table(
            {**{k: b.column(k) for k in keys},
             out_name: pa.array(vals, pa.int64())}
        )

    return state_ds.map_batches(est, batch_format="pyarrow")


def quantile_state(ds, keys: list[str] | str, col: str, *,
                   compression: float = 200.0):
    """Persistable quantile state: one t-digest blob per key — the
    quantile analogue of :func:`distinct_state`.  Unlike HLL registers
    the digest is approximate and merge-ORDER-dependent (the estimate is
    stable within sketch error, not bit-identical), so tests pin the
    estimates against exact quantiles, not bytes.  Persist with
    ``write_parquet``; merge deltas with :func:`merge_quantile_state`;
    read quantiles with :func:`finalize_quantile_state`."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {**{k: b.column(k) for k in keys},
                 "_td": pa.array([], pa.binary())}
            )
        arr = b.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        out_keys, order, bounds = _group_partition(b, keys)
        sketches = [
            TDigest.from_values(vals[order[bounds[i]:bounds[i + 1]]],
                                compression).to_bytes()
            for i in range(len(bounds) - 1)
        ]
        out_keys["_td"] = pa.array(sketches, pa.binary())
        return pa.table(out_keys)

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], group.schema.field(k).type) for k in keys},
                 "_td": pa.array([], pa.binary())}
            )
        acc = TDigest(compression)
        for s in group.column("_td").to_pylist():
            acc = acc.merge(TDigest.from_bytes(s, compression))
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        out["_td"] = pa.array([acc.to_bytes()], pa.binary())
        return pa.table(out)

    from .agg import grouped_map

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return grouped_map(partials, keys, fold)


def merge_quantile_state(states, keys: list[str] | str, *,
                         compression: float = 200.0):
    """Fold several quantile states (saved + deltas) into one per key."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    import ray

    dss = [ray.data.from_arrow(s) if isinstance(s, pa.Table) else s
           for s in states]
    ds = dss[0]
    if len(dss) > 1:
        ds = ds.union(*dss[1:])

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], group.schema.field(k).type) for k in keys},
                 "_td": pa.array([], pa.binary())}
            )
        acc = TDigest(compression)
        for s in group.column("_td").to_pylist():
            acc = acc.merge(TDigest.from_bytes(s, compression))
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        out["_td"] = pa.array([acc.to_bytes()], pa.binary())
        return pa.table(out)

    from .agg import grouped_map

    return grouped_map(ds, keys, fold)


def finalize_quantile_state(state_ds, keys: list[str] | str,
                            quantiles: list[tuple[str, float]], *,
                            compression: float = 200.0, round_to: int = 6):
    """State → quantile estimates (one row per key), no further shuffle."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def est(b: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in quantiles}
        for s in b.column("_td").to_pylist():
            d = TDigest.from_bytes(s, compression)
            for name, q in quantiles:
                cols[name].append(round(d.quantile(q), round_to))
        return pa.table(
            {**{k: b.column(k) for k in keys},
             **{name: pa.array(cols[name], pa.float64())
                for name, _ in quantiles}}
        )

    return state_ds.map_batches(est, batch_format="pyarrow")
