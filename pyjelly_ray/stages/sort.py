"""Global distributed sort: range partition → per-partition Arrow sort.

Ray Data's ``Dataset.sort`` runs a sample+sort shuffle through its own
planner; this implements the same range-partitioned strategy on the
repo's explicit hash-exchange machinery so it composes with the other
operators and keeps the shuffle volume observable:

1. a cheap SAMPLE pass collects ~``samples_per_block`` evenly spaced key
   values per block (each block locally sorted first, so the samples are
   that block's quantiles — deterministic, no RNG);
2. the driver merges the samples and picks ``num_partitions − 1`` cut
   points — global range boundaries;
3. one ``map_batches`` assigns each row its range bucket via vectorized
   ``searchsorted``; ONE exchange co-locates each range; each reduce does
   a single vectorized Arrow sort of its range.

Output blocks come back in partition order, so iterating the result
Dataset yields globally sorted rows (block i's rows all precede block
i+1's).  At 100 TB the sample pass moves ``samples_per_block × blocks``
keys — tiny — and each reduce sorts only ``rows / num_partitions`` rows.
Skewed key distributions are handled by the quantile cut points (equal
ROW counts per range, not equal key spans); a single repeated hot key
value still lands in one partition — salt upstream if one VALUE exceeds
a worker's memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _sort_spec(key: str, tiebreak: list[str], descending: bool):
    direction = "descending" if descending else "ascending"
    return [(key, direction)] + [(c, "ascending") for c in tiebreak]


def range_sort(ds, key: str, *, descending: bool = False,
               tiebreak: list[str] | None = None, num_partitions: int | None = None,
               samples_per_block: int = 64):
    """Globally sort ``ds`` by ``key`` (then ``tiebreak`` columns ascending).

    Returns a Dataset whose block order IS the global order.  NULL keys
    sort last (Arrow default), matching SQL ``NULLS LAST``.
    """
    from ..state.exchange import default_partitions

    num_partitions = num_partitions or default_partitions()
    import ray

    from ..state.exchange import hash_exchange

    tiebreak = tiebreak or []
    spec = _sort_spec(key, tiebreak, descending)

    # two passes (sample, then bucket) read the same blocks; materialize
    # once so upstream transforms don't re-execute for the second pass
    ds = ds.materialize()

    # ---- pass 1: per-block quantile samples of the key ----
    def sample(b: pa.Table) -> pa.Table:
        col = b.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) == 0:
            return pa.table({key: pa.array([], b.schema.field(key).type)})
        srt = pc.array_sort_indices(col)
        take = np.unique(
            np.linspace(0, len(col) - 1, min(samples_per_block, len(col))).astype(
                np.int64
            )
        )
        return pa.table({key: col.take(pc.take(srt, pa.array(take)))})

    sample_refs = (
        ds.map_batches(sample, batch_format="pyarrow", batch_size=None)
        .materialize()
        .to_arrow_refs()
    )
    tables = [t for t in map(ray.get, sample_refs) if t.num_rows]
    if not tables:
        # no non-null keys anywhere: single partition, plain sort
        samples = pa.table({key: pa.array([], pa.string())})
    else:
        samples = pa.concat_tables(tables, promote_options="default")
    key_vals = samples.column(key)
    if isinstance(key_vals, pa.ChunkedArray):
        key_vals = key_vals.combine_chunks()
    sorted_vals = key_vals.take(pc.array_sort_indices(key_vals))
    n = len(sorted_vals)
    if n == 0 or num_partitions <= 1:
        cuts = sorted_vals.slice(0, 0)
    else:
        idx = np.unique(
            (np.arange(1, num_partitions) * n // num_partitions).clip(0, n - 1)
        )
        cuts = sorted_vals.take(pa.array(idx, pa.int64()))
    cuts_np = np.asarray(cuts.to_numpy(zero_copy_only=False))
    n_parts = len(cuts_np) + 1

    # ---- pass 2: bucket by range, exchange, sort each range ----
    def add_bucket(b: pa.Table) -> pa.Table:
        from .agg import _zero_like

        col = b.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nulls = None
        if col.null_count:
            # fill before searchsorted: None in an object array breaks
            # numpy comparisons; the filled value's bucket is overwritten
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            col = pc.fill_null(col, _zero_like(col.type))
        vals = col.to_numpy(zero_copy_only=False)
        if len(cuts_np):
            bucket = np.searchsorted(cuts_np, vals, side="right").astype(np.int64)
        else:
            bucket = np.zeros(len(vals), np.int64)
        if descending:
            bucket = (n_parts - 1) - bucket
        # NULL keys sort LAST in either direction (SQL/Arrow NULLS LAST):
        # pin them to the highest bucket AFTER the descending flip
        if nulls is not None:
            bucket[nulls] = n_parts - 1
        return b.append_column("__bucket", pa.array(bucket))

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)

    def reduce_part(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return t
        return t.sort_by(spec)

    return hash_exchange(
        tagged,
        bucket_col="__bucket",
        n_partitions=n_parts,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def global_row_numbers(sorted_ds, *, out_name: str = "rn", start: int = 1):
    """Assign a GLOBAL sequential row number to an already-range-sorted
    Dataset (block order = global order, :func:`range_sort`'s contract)
    without any further shuffle or driver-side data movement: one tiny
    remote count per block, a cumsum of O(blocks) ints on the driver, then
    per-block vectorized id columns — blocks never leave the object store.
    The distributed ``row_number() OVER (ORDER BY ...)`` / stable global-id
    assignment primitive."""
    import ray

    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1] + start

    @ray.remote
    def tag(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            out_name, pa.array(np.arange(off, off + t.num_rows, dtype=np.int64))
        )

    tagged = [tag.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(tagged)


def global_prefix_sums(sorted_ds, col: str, *, out_name: str = "prefix",
                       exclusive: bool = True):
    """Global running sum of ``col`` over an already-range-sorted Dataset
    (block order = global order, :func:`range_sort`'s contract) — the
    distributed ``sum(col) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    primitive, without any further shuffle: one tiny remote per-block
    total, a cumsum of O(blocks) floats on the driver, then per-block
    vectorized cumsums — blocks never leave the object store (same shape
    as :func:`global_row_numbers`).

    ``exclusive=True`` gives each row the sum of everything STRICTLY
    before it (prefix); ``False`` includes the row itself (running total).
    """
    import ray

    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_total(t: pa.Table) -> float:
        if t.num_rows == 0 or col not in t.column_names:
            return 0.0
        return float(
            np.sum(t.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        )

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0.0], np.cumsum(totals)])[:-1]

    @ray.remote
    def tag(t: pa.Table, off: float) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_name, pa.array([], pa.float64()))
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        run = off + np.cumsum(v)
        if exclusive:
            run = run - v
        return t.append_column(out_name, pa.array(run, pa.float64()))

    tagged = [tag.remote(r, float(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(tagged)


def global_shift(sorted_ds, col: str, *, out_name: str, lead: bool = True):
    """Cross-block LEAD/LAG by one row over an already-range-sorted
    Dataset (block order = global order, :func:`range_sort`'s contract)
    — the distributed ``lead(col) OVER (ORDER BY …)`` /
    ``lag(col) OVER (ORDER BY …)`` primitive, without any shuffle or
    self-join: each block shifts its own column vectorized, and only the
    boundary row takes the NEIGHBOR block's edge value, fetched as
    O(blocks) scalars on the driver (same shape as
    :func:`global_prefix_sums` — blocks never leave the object store).
    The global first (lag) / last (lead) row gets NULL.  Type-generic:
    the shifted column keeps ``col``'s Arrow type.  Empty blocks pass
    through untouched when they carry no schema (Ray Data emits
    schema-less 0-row blocks) and get an empty typed column otherwise."""
    import ray

    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def edges(t: pa.Table):
        if col not in t.column_names or t.num_rows == 0:
            return None, None, 0
        c = t.column(col)
        return c[0].as_py(), c[t.num_rows - 1].as_py(), t.num_rows

    info = ray.get([edges.remote(r) for r in refs])
    neighbor: list[object] = [None] * len(refs)
    if lead:
        nxt = None
        for i in range(len(refs) - 1, -1, -1):
            neighbor[i] = nxt
            if info[i][2]:
                nxt = info[i][0]  # this block's first value
    else:
        prev = None
        for i in range(len(refs)):
            neighbor[i] = prev
            if info[i][2]:
                prev = info[i][1]  # this block's last value

    @ray.remote
    def shift(t: pa.Table, edge):
        if col not in t.column_names:
            return t
        typ = t.schema.field(col).type
        if t.num_rows == 0:
            return t.append_column(out_name, pa.array([], typ))
        arr = t.column(col).combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], typ)
        edge_arr = pa.array([edge], typ)
        if lead:
            shifted = pa.concat_arrays([arr.slice(1), edge_arr])
        else:
            shifted = pa.concat_arrays([edge_arr, arr.slice(0, len(arr) - 1)])
        return t.append_column(out_name, shifted)

    return ray.data.from_arrow_refs(
        [shift.remote(r, e) for r, e in zip(refs, neighbor)]
    )


def global_exact_quantiles(ds, col: str,
                           quantiles: list[tuple[str, float]], *,
                           round_to: int = 2,
                           samples_per_block: int = 64,
                           collect_cap: int = 5_000_000):
    """EXACT global quantiles (SQL ``quantile_cont``) WITHOUT a global
    sort — distributed selection in three bounded passes:

    1. SAMPLE: each block contributes its ``samples_per_block`` local
       quantile values (deterministic, blocks locally sorted) → a driver
       pivot ladder of ~samples·blocks values;
    2. COUNT: one pass of per-block vectorized ``searchsorted`` against
       the broadcast ladder, summed on the driver → the global rank of
       every pivot → the pivot interval containing each target order
       statistic;
    3. COLLECT: one filter pass pulls only the values inside the needed
       intervals (expected n/(samples·blocks) rows each, plus exact
       interval-boundary bookkeeping) and the driver finishes the k-th /
       k+1-th selection + interpolation locally.

    At 100 TB this moves samples + counts + a sliver of the data instead
    of shuffling everything (``range_sort`` + take would).  NULLs are
    ignored (SQL semantics).  Heavily duplicated values make intervals
    collapse onto the duplicate, which short-circuits exactly; a
    pathological interval wider than ``collect_cap`` raises rather than
    OOMing the driver.  Returns ``{name: value}``.
    """
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def sample_block(t: pa.Table):
        if t.num_rows == 0 or col not in t.column_names:
            return np.array([], np.float64), 0
        arr = t.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        v = np.sort(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        if len(v) == 0:
            return np.array([], np.float64), 0
        idx = np.linspace(0, len(v) - 1, min(samples_per_block, len(v)))
        return v[idx.astype(np.int64)], len(v)

    sampled = ray.get([sample_block.remote(r) for r in refs])
    pivots = np.unique(np.concatenate([s for s, _ in sampled])
                       if sampled else np.array([], np.float64))
    n = int(sum(c for _, c in sampled))
    if n == 0:
        return {name: None for name, _ in quantiles}
    piv_ref = ray.put(pivots)

    @ray.remote
    def count_below(t: pa.Table):
        # counts of values <= pivot_i, vectorized
        if t.num_rows == 0 or col not in t.column_names:
            return np.zeros(len(pivots), np.int64)
        arr = t.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        v = np.sort(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        return np.searchsorted(v, ray.get(piv_ref), side="right").astype(np.int64)

    cum = np.sum(ray.get([count_below.remote(r) for r in refs]), axis=0)

    # ranks (0-based) of the order statistics every quantile needs
    need_ranks: set = set()
    for _, q in quantiles:
        pos = q * (n - 1)
        need_ranks.add(int(np.floor(pos)))
        need_ranks.add(int(np.ceil(pos)))
    # half-open value intervals (lo, hi] per needed rank, from the ladder
    intervals = {}
    for k in need_ranks:
        j = int(np.searchsorted(cum, k + 1, side="left"))  # first cum >= k+1
        hi = pivots[j] if j < len(pivots) else np.inf
        lo = pivots[j - 1] if j > 0 else -np.inf
        below = int(cum[j - 1]) if j > 0 else 0
        intervals[k] = (lo, hi, below)

    los = np.array([v[0] for v in intervals.values()])
    his = np.array([v[1] for v in intervals.values()])
    lo_ref, hi_ref = ray.put(los), ray.put(his)

    @ray.remote
    def collect(t: pa.Table):
        if t.num_rows == 0 or col not in t.column_names:
            return np.array([], np.float64)
        arr = t.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        l, h = ray.get(lo_ref), ray.get(hi_ref)
        m = ((v[:, None] > l[None, :]) & (v[:, None] <= h[None, :])).any(axis=1)
        return v[m]

    pulled = np.concatenate(ray.get([collect.remote(r) for r in refs]))
    if len(pulled) > collect_cap:
        raise ValueError(
            f"selection interval holds {len(pulled)} rows (> cap"
            f" {collect_cap}); raise samples_per_block")
    pulled.sort()

    def order_stat(k: int) -> float:
        lo, hi, below = intervals[k]
        seg = pulled[(pulled > lo) & (pulled <= hi)]
        return float(seg[k - below])

    def round_half_away(x: float, nd: int) -> float:
        s = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * s + 0.5), x) / s)

    out = {}
    for name, q in quantiles:
        pos = q * (n - 1)
        f, c = int(np.floor(pos)), int(np.ceil(pos))
        if f == c:
            val = order_stat(f)
        else:
            vf, vc = order_stat(f), order_stat(c)
            val = vf * (c - pos) + vc * (pos - f)
        out[name] = round_half_away(val, round_to)
    return out
