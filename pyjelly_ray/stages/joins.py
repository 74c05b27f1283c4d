"""Join strategies (SURVEY.md §2.5).

- :func:`broadcast_join` — small side collected once, shipped via ``ray.put``
  and hashed into every ``map_batches`` task (no shuffle).  Use for dims
  (region/nation/supplier/part/customer); this is the 100 TB-safe path for
  small-side joins.
- :func:`broadcast_semi` — broadcast semi-join (filter by key membership).
- :func:`hash_join` — large ⋈ large equi-join as an explicit co-partitioned
  hash exchange (:func:`pyjelly_ray.state.exchange.hash_exchange_pair`) with
  a vectorized ``pyarrow.Table.join`` per partition.  Ray's own
  ``Dataset.join`` ran its shuffle in 5–9 s for 600k × 150k rows on this
  box; the explicit exchange needs no sampling/sorting and scales by
  raising ``num_partitions`` with data volume.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _collect_table(ds_or_table) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    # execute distributed, then fetch the (small) blocks — NOT iter_batches,
    # which streams every block through the driver's sequential iterator.
    import ray

    refs = ds_or_table.materialize().to_arrow_refs()
    if not refs:
        return pa.table({})
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return ray.get(refs[0])
    return pa.concat_tables(tables, promote_options="default")


def broadcast_join(ds, small, *, left_key: str, right_key: str | None = None,
                   how: str = "inner", columns: list[str] | None = None):
    """Join ``ds`` (big, streaming) with ``small`` (Dataset or Arrow table).

    The small side is materialized ONCE on the driver, pruned to ``columns``,
    put in the object store, and every task reads it zero-copy — never
    re-shipped per batch, never shuffled.
    """
    import ray

    right_key = right_key or left_key
    table = _collect_table(small)
    if columns:
        cols = list(dict.fromkeys([right_key] + columns))
        table = table.select(cols)
    ref = ray.put(table)

    # task pool, not actor pool: the small side rides in plasma (ray.get is
    # a zero-copy local read after the first task per node) and tasks start
    # immediately — an autoscaling actor pool added 1–2 s of startup per
    # join in chained-dim pipelines.
    def join_batch(batch: pa.Table) -> pa.Table:
        small_t = ray.get(ref)
        return batch.join(
            small_t, keys=[left_key], right_keys=[right_key], join_type=how
        )

    return ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


#: per-worker-process memo for broadcast_join_refs — the small side is
#: concatenated once per process, not once per batch
_BCAST_REF_CACHE: dict = {}


def broadcast_join_refs(ds, small_ds, *, left_key: str,
                        right_key: str | None = None, how: str = "inner"):
    """:func:`broadcast_join` without the driver hop (VERDICT r1 #3).

    The small side is executed to plasma blocks and each scan task concats
    the block REFS locally (zero-copy after the first read per node) — the
    driver never holds the table, so a hot candidate set cannot become a
    driver-memory cliff.  Pass a MATERIALIZED Dataset so the count/refs
    come from metadata; callers should early-out on an empty small side
    (an all-empty small side degrades to a key-only join that drops the
    small side's columns).
    """
    import ray

    right_key = right_key or left_key
    refs = tuple(small_ds.to_arrow_refs())
    key = (refs[0].hex() if refs else "", len(refs))

    def join_batch(batch: pa.Table) -> pa.Table:
        got = _BCAST_REF_CACHE.get(key)
        if got is None:
            tables = [t for t in ray.get(list(refs)) if t.num_columns]
            got = (
                pa.concat_tables(tables, promote_options="default")
                if tables
                else pa.table({right_key: pa.array([], batch.column(left_key).type)})
            )
            _BCAST_REF_CACHE.clear()  # one live broadcast per worker
            _BCAST_REF_CACHE[key] = got
        return batch.join(
            got, keys=[left_key], right_keys=[right_key], join_type=how
        )

    return ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


def broadcast_semi(ds, small, *, left_key: str, right_key: str | None = None,
                   anti: bool = False):
    """Semi/anti join: keep rows whose key is (not) in the small side."""
    import ray

    right_key = right_key or left_key
    table = _collect_table(small)
    keys = pc.unique(table.column(right_key))
    ref = ray.put(keys)

    def semi_batch(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(left_key), value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(semi_batch, batch_format="pyarrow", batch_size=None)


def hash_join(left, right, *, left_key: str | list[str],
              right_key: str | list[str] | None = None,
              how: str = "inner", num_partitions: int | None = None,
              post=None):
    """Distributed equi-join: co-partition both sides by ``hash(keys) % P``,
    then one vectorized Arrow join per partition.

    ``left_key``/``right_key`` accept a single column or a composite key
    list (hashed together, so composite-equal rows co-locate).  Correct
    for all key-equi join types (inner/left/right/full outer, semi, anti —
    ``how`` passes through to ``pyarrow.Table.join``) because equal keys
    always share a partition.  At 100 TB, size ``num_partitions`` so one
    partition of both sides fits a worker's heap; skewed keys want salting
    upstream (see SURVEY.md §2.5).

    ``post``: optional per-partition function applied to each joined
    partition INSIDE the reduce task.  The output is already partitioned by
    the join key, so any key-local consumer (an aggregate grouped by that
    key, a dedup on it, a per-key window) is globally correct here —
    fusing it saves re-exchanging the full join output by the same key,
    and the joined rows never hit the object store.
    """
    from ..state.exchange import default_partitions, hash_exchange_pair
    from .agg import bucket_codes

    num_partitions = num_partitions or default_partitions()
    lkeys = [left_key] if isinstance(left_key, str) else list(left_key)
    rkeys = lkeys if right_key is None else (
        [right_key] if isinstance(right_key, str) else list(right_key)
    )

    def _with_bucket(keys):
        def add(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__bucket", pa.array(bucket_codes(b, keys, num_partitions))
            )

        return add

    lt = left.map_batches(_with_bucket(lkeys), batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(_with_bucket(rkeys), batch_format="pyarrow", batch_size=None)

    def _strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__bucket"]) if "__bucket" in t.column_names else t

    def join_part(lp: pa.Table, rp: pa.Table) -> pa.Table:
        out = _strip(lp).join(
            _strip(rp),
            keys=lkeys,
            right_keys=rkeys,
            join_type=how,
        )
        return post(out) if post is not None else out

    return hash_exchange_pair(
        lt,
        rt,
        left_bucket_col="__bucket",
        right_bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=join_part,
    )


def _cast_ts(col, typ):
    """Cast a timestamp-ish column to the join's canonical ts type.

    Both sides go through this (ADVICE r1: tag_left previously skipped the
    cast, so a caller-supplied ``left_cols`` without the ts entry silently
    compared mismatched units).  Sub-resolution truncation is allowed —
    the canonical type IS the join's declared resolution.
    """
    if col.type == typ:
        return col
    try:
        return pc.cast(col, typ)
    except pa.ArrowInvalid:
        return pc.cast(col, options=pc.CastOptions(typ, allow_time_truncate=True))


def _asof_split_nulls(lpart: pa.Table, rpart: pa.Table):
    """Null-timestamp hygiene before a searchsorted merge (ADVICE r1).

    Right rows with a null ``_ts`` or ``_rv`` can never match (SQL
    comparisons with NULL are false) and, left in place, surface from
    ``to_numpy(zero_copy_only=False)`` as float NaN arrays that corrupt
    the int64 distance math — drop them.  Left rows with a null ``_ts``
    keep left-join semantics: split off here, re-emitted by
    :func:`_asof_pad` with a null out value.
    """
    lnull_mask = pc.is_null(lpart.column("_ts"))
    lnull = None
    if pc.any(lnull_mask).as_py():
        lnull = lpart.filter(lnull_mask)
        lpart = lpart.filter(pc.invert(lnull_mask))
    rvalid = pc.and_(
        pc.is_valid(rpart.column("_ts")), pc.is_valid(rpart.column("_rv"))
    )
    if rpart.num_rows and not pc.all(rvalid).as_py():
        rpart = rpart.filter(rvalid)
    return lpart, rpart, lnull


def _asof_pad(out_table: pa.Table, lnull, left_cols, out_value: str) -> pa.Table:
    """Append the null-``_ts`` left rows with a null joined value."""
    if lnull is None:
        return out_table
    pad = {c: lnull.column(c) for c in left_cols}
    pad[out_value] = pa.nulls(lnull.num_rows, pa.int64())
    return pa.concat_tables([out_table, pa.table(pad)])


def asof_join_backward(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_value: str | None = None,
    left_cols: dict[str, "pa.DataType"] | None = None,
):
    """Backward as-of join: for each left row, the right row with the LARGEST
    ``right_ts`` ≤ ``left_ts`` within the same key (left-join semantics —
    unmatched left rows keep a null value).

    Ray Data lacks an as-of join; this is the documented composition
    (SURVEY.md §2 custom-operator rule (a)): tag both sides into one
    schema-aligned Dataset, ``union``, ONE ``groupby(key)`` shuffle, then a
    vectorized per-group merge (sort right side once, ``np.searchsorted``
    the left timestamps — no per-row Python).  Tie-break at equal
    timestamps: the maximum ``right_value`` wins (deterministic; mirrors a
    pre-aggregated ``max() GROUP BY key, ts`` right side in SQL).

    Partitioning assumption: one group = one key's full history.  Hot keys
    are bounded by per-key history size, not corpus size; at 100 TB shard
    keys are salted upstream only if one key's history exceeds a block.
    """
    import numpy as np

    out_value = out_value or right_value
    #: left columns carried to the output, with their Arrow types (needed to
    #: null-pad the right side into the same union schema)
    left_cols = left_cols or {left_key: pa.int64(), left_ts: pa.timestamp("us")}
    # canonical ts resolution for BOTH sides (decoupled from the output-
    # column list: left_cols may legitimately omit the ts column)
    ts_type = left_cols.get(left_ts, pa.timestamp("us"))

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_ts": _cast_ts(b.column(left_ts), ts_type),
            "_rv": pa.nulls(n, pa.int64()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(right_key),
            "_side": pa.array(np.ones(n, np.int8)),
            "_ts": _cast_ts(b.column(right_ts), ts_type),
            "_rv": pc.cast(b.column(right_value), pa.int64()),
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        rpart = group.filter(pc.invert(mask))
        lpart, rpart, lnull = _asof_split_nulls(lpart, rpart)
        if rpart.num_rows == 0 and lnull is not None:
            # no matchable right rows: every left row (incl. null-ts) is
            # unmatched — fold the split-off rows back in
            lpart = pa.concat_tables([lpart, lnull])
            lnull = None
        out = {c: lpart.column(c) for c in left_cols}
        if lpart.num_rows == 0:
            out[out_value] = pa.nulls(0, pa.int64())
            return _asof_pad(pa.table(out), lnull, left_cols, out_value)
        if rpart.num_rows == 0:
            out[out_value] = pa.nulls(lpart.num_rows, pa.int64())
            return pa.table(out)
        rpart = rpart.sort_by([("_ts", "ascending"), ("_rv", "ascending")])
        rts = pc.cast(rpart.column("_ts"), pa.int64()).to_numpy(zero_copy_only=False)
        lts = pc.cast(lpart.column("_ts"), pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="right") - 1
        rv = rpart.column("_rv").to_numpy(zero_copy_only=False)
        vals = rv[np.maximum(idx, 0)]
        out[out_value] = pa.array(
            np.where(idx >= 0, vals, 0), pa.int64(), mask=idx < 0
        )
        return _asof_pad(pa.table(out), lnull, left_cols, out_value)

    from .agg import grouped_map

    return grouped_map(unioned, "_key", merge)


def interval_join_agg(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    start_col: str,
    end_col: str,
    right_ts: str,
    right_value: str | None = None,
    count_name: str = "n_matches",
    sum_name: str | None = None,
    left_cols: dict[str, "pa.DataType"] | None = None,
):
    """Range (interval) join + aggregate: for each left row's half-open
    window ``[start_col, end_col)`` count (and optionally sum) the right
    rows with the same key whose ``right_ts`` falls inside.

    Ray Data lacks a range join; this is the custom-operator composition
    (SURVEY.md §2 rule (a), same shape as :func:`asof_join_backward`): tag
    both sides into one schema, ``union``, ONE ``groupby(key)`` shuffle,
    then a fully vectorized per-group band match — sort the right side's
    timestamps once, two ``np.searchsorted`` calls give each interval's
    ``[lo, hi)`` index band, counts are ``hi - lo`` and sums come from a
    prefix-sum difference.  No per-row Python, no quadratic pair blowup:
    the aggregate is computed straight from the index bands, so output
    cardinality is |left| regardless of match multiplicity.  Left-join
    semantics: every left row appears, zero-count when unmatched.

    Partitioning assumption: one key's rows fit in one group (same as the
    as-of join); salt hot keys upstream if a single key's history exceeds
    a block.  For the pair-producing variant see :func:`interval_join`.
    """
    import numpy as np

    left_cols = left_cols or {left_key: pa.int64()}

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_start": pc.cast(b.column(start_col), pa.int64()),
            "_end": pc.cast(b.column(end_col), pa.int64()),
            "_rv": pa.nulls(n, pa.float64()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        rv = (
            pc.cast(b.column(right_value), pa.float64())
            if right_value is not None
            else pa.nulls(n, pa.float64())
        )
        cols = {
            "_key": b.column(right_key),
            "_side": pa.array(np.ones(n, np.int8)),
            "_start": pc.cast(b.column(right_ts), pa.int64()),
            "_end": pa.nulls(n, pa.int64()),
            "_rv": rv,
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        out = {c: lpart.column(c) for c in left_cols}
        n = lpart.num_rows
        if n == 0:
            out[count_name] = pa.nulls(0, pa.int64())
            if sum_name:
                out[sum_name] = pa.nulls(0, pa.float64())
            return pa.table(out)
        rpart = group.filter(pc.invert(mask)).sort_by([("_start", "ascending")])
        rts = rpart.column("_start").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rts, lpart.column("_start").to_numpy(zero_copy_only=False), side="left")
        hi = np.searchsorted(rts, lpart.column("_end").to_numpy(zero_copy_only=False), side="left")
        out[count_name] = pa.array(hi - lo, pa.int64())
        if sum_name:
            rv = rpart.column("_rv").to_numpy(zero_copy_only=False)
            cs = np.concatenate(([0.0], np.cumsum(rv)))
            out[sum_name] = pa.array(cs[hi] - cs[lo], pa.float64())
        return pa.table(out)

    from .agg import grouped_map

    return grouped_map(unioned, "_key", merge)


def interval_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    start_col: str,
    end_col: str,
    right_ts: str,
    right_cols: dict[str, "pa.DataType"] | list[str],
    left_cols: dict[str, "pa.DataType"] | None = None,
):
    """Pair-producing range join: inner-join each left interval
    ``[start_col, end_col)`` to every same-key right row inside it.

    Same union + one-shuffle + searchsorted-band machinery as
    :func:`interval_join_agg`, but materializes the matched pairs
    (``np.repeat`` on the left, gather on the right).  Output cardinality
    is the true match count — prefer :func:`interval_join_agg` when the
    downstream only needs per-interval aggregates.

    ``right_cols`` maps carried right columns to their Arrow types (needed
    to null-pad the left side into the shared union schema; a plain list
    assumes ``int64``).
    """
    import numpy as np

    left_cols = left_cols or {left_key: pa.int64()}
    if not isinstance(right_cols, dict):
        right_cols = {c: pa.int64() for c in right_cols}

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_start": pc.cast(b.column(start_col), pa.int64()),
            "_end": pc.cast(b.column(end_col), pa.int64()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        for c, typ in right_cols.items():
            cols[f"_r_{c}"] = pa.nulls(n, typ)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(right_key),
            "_side": pa.array(np.ones(n, np.int8)),
            "_start": pc.cast(b.column(right_ts), pa.int64()),
            "_end": pa.nulls(n, pa.int64()),
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        for c, typ in right_cols.items():
            cols[f"_r_{c}"] = pc.cast(b.column(c), typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        rpart = group.filter(pc.invert(mask)).sort_by([("_start", "ascending")])
        out_cols = list(left_cols) + [f"_r_{c}" for c in right_cols]
        if lpart.num_rows == 0 or rpart.num_rows == 0:
            return pa.table(
                {
                    **{c: pa.nulls(0, lpart.schema.field(c).type) for c in left_cols},
                    **{c: pa.nulls(0, rpart.schema.field(f"_r_{c}").type) for c in right_cols},
                }
            )
        rts = rpart.column("_start").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rts, lpart.column("_start").to_numpy(zero_copy_only=False), side="left")
        hi = np.searchsorted(rts, lpart.column("_end").to_numpy(zero_copy_only=False), side="left")
        counts = hi - lo
        total = int(counts.sum())
        lidx = np.repeat(np.arange(lpart.num_rows), counts)
        # ridx = [lo_i, lo_i+1, ..., hi_i) for each i, flattened — built
        # without a Python loop: global arange minus each segment's offset
        seg_starts = np.repeat(np.cumsum(counts) - counts, counts)
        ridx = np.repeat(lo, counts) + (np.arange(total) - seg_starts)
        out = {}
        for c in left_cols:
            out[c] = pc.take(lpart.column(c), pa.array(lidx, pa.int64()))
        for c in right_cols:
            out[c] = pc.take(rpart.column(f"_r_{c}"), pa.array(ridx, pa.int64()))
        return pa.table(out)

    from .agg import grouped_map

    return grouped_map(unioned, "_key", merge)


def asof_join_forward(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_value: str | None = None,
    left_cols: dict[str, "pa.DataType"] | None = None,
):
    """Forward as-of join: for each left row, the right row with the
    SMALLEST ``right_ts`` ≥ ``left_ts`` within the same key (left-join
    semantics; nulls when no later right row exists).

    Mirror image of :func:`asof_join_backward` (same union + one keyed
    shuffle + vectorized searchsorted merge); equal timestamps match
    (non-strict, like DuckDB ``ASOF ... ON l.ts <= r.ts``), tie-break at
    equal ``right_ts`` = minimum ``right_value`` (deterministic).
    """
    import numpy as np

    out_value = out_value or right_value
    left_cols = left_cols or {left_key: pa.int64(), left_ts: pa.timestamp("us")}
    # canonical ts resolution for BOTH sides (decoupled from the output-
    # column list: left_cols may legitimately omit the ts column)
    ts_type = left_cols.get(left_ts, pa.timestamp("us"))

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_ts": _cast_ts(b.column(left_ts), ts_type),
            "_rv": pa.nulls(n, pa.int64()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(right_key),
            "_side": pa.array(np.ones(n, np.int8)),
            "_ts": _cast_ts(b.column(right_ts), ts_type),
            "_rv": pc.cast(b.column(right_value), pa.int64()),
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        rpart = group.filter(pc.invert(mask))
        lpart, rpart, lnull = _asof_split_nulls(lpart, rpart)
        if rpart.num_rows == 0 and lnull is not None:
            # no matchable right rows: every left row (incl. null-ts) is
            # unmatched — fold the split-off rows back in
            lpart = pa.concat_tables([lpart, lnull])
            lnull = None
        out = {c: lpart.column(c) for c in left_cols}
        if lpart.num_rows == 0:
            out[out_value] = pa.nulls(0, pa.int64())
            return _asof_pad(pa.table(out), lnull, left_cols, out_value)
        if rpart.num_rows == 0:
            out[out_value] = pa.nulls(lpart.num_rows, pa.int64())
            return pa.table(out)
        rpart = rpart.sort_by([("_ts", "ascending"), ("_rv", "ascending")])
        rts = pc.cast(rpart.column("_ts"), pa.int64()).to_numpy(zero_copy_only=False)
        lts = pc.cast(lpart.column("_ts"), pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="left")
        valid = idx < len(rts)
        rv = rpart.column("_rv").to_numpy(zero_copy_only=False)
        vals = rv[np.minimum(idx, len(rts) - 1)]
        out[out_value] = pa.array(
            np.where(valid, vals, 0), pa.int64(), mask=~valid
        )
        return _asof_pad(pa.table(out), lnull, left_cols, out_value)

    from .agg import grouped_map

    return grouped_map(unioned, "_key", merge)


def asof_join_nearest(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_value: str | None = None,
    left_cols: dict[str, "pa.DataType"] | None = None,
):
    """NEAREST as-of join: for each left row, the right row whose
    ``right_ts`` is closest in absolute time within the same key
    (left-join semantics; ties at equal distance break to the EARLIER
    right row, matching the two-sided-ASOF SQL idiom).

    Same shape as :func:`asof_join_forward` — one union, one keyed
    shuffle, a vectorized two-sided searchsorted merge per key
    partition; cost is one exchange regardless of how lopsided the
    sides are.  Equal-timestamp right rows dedupe to the minimum
    ``right_value`` (deterministic)."""
    import numpy as np

    out_value = out_value or right_value
    left_cols = left_cols or {left_key: pa.int64(),
                              left_ts: pa.timestamp("us")}
    ts_type = left_cols.get(left_ts, pa.timestamp("us"))

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_ts": _cast_ts(b.column(left_ts), ts_type),
            "_rv": pa.nulls(n, pa.int64()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(right_key),
            "_side": pa.array(np.ones(n, np.int8)),
            "_ts": _cast_ts(b.column(right_ts), ts_type),
            "_rv": pc.cast(b.column(right_value), pa.int64()),
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           batch_size=None)
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        rpart = group.filter(pc.invert(mask))
        lpart, rpart, lnull = _asof_split_nulls(lpart, rpart)
        if rpart.num_rows == 0 and lnull is not None:
            # no matchable right rows: every left row (incl. null-ts) is
            # unmatched — fold the split-off rows back in
            lpart = pa.concat_tables([lpart, lnull])
            lnull = None
        out = {c: lpart.column(c) for c in left_cols}
        if lpart.num_rows == 0:
            out[out_value] = pa.nulls(0, pa.int64())
            return _asof_pad(pa.table(out), lnull, left_cols, out_value)
        if rpart.num_rows == 0:
            out[out_value] = pa.nulls(lpart.num_rows, pa.int64())
            return pa.table(out)
        rpart = rpart.sort_by([("_ts", "ascending"), ("_rv", "ascending")])
        rts = pc.cast(rpart.column("_ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        lts = pc.cast(lpart.column("_ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        rv = rpart.column("_rv").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="left")   # first rts >= lts
        has_next = idx < len(rts)
        has_prev = idx > 0
        d_next = np.where(has_next,
                          rts[np.minimum(idx, len(rts) - 1)] - lts,
                          np.iinfo(np.int64).max)
        # previous run: step to the FIRST index of its equal-ts run so
        # the tie-break (min right_value at that ts) matches forward's
        prev_i = np.maximum(idx - 1, 0)
        prev_first = np.searchsorted(rts, rts[prev_i], side="left")
        d_prev = np.where(has_prev, lts - rts[prev_i],
                          np.iinfo(np.int64).max)
        # ties at equal distance go to the EARLIER (previous) row
        take_prev = (d_prev <= d_next) & has_prev
        pick = np.where(take_prev, prev_first,
                        np.minimum(idx, len(rts) - 1))
        valid = has_prev | has_next
        out[out_value] = pa.array(
            np.where(valid, rv[pick], 0), pa.int64(), mask=~valid)
        return _asof_pad(pa.table(out), lnull, left_cols, out_value)

    from .agg import grouped_map

    return grouped_map(unioned, "_key", merge)


def hash_join_skew(left, right, *, left_key: str,
                   right_key: str | None = None, how: str = "inner",
                   hot_keys=None, detect_top: int = 16,
                   num_partitions: int | None = None):
    """Hybrid equi-join for a SKEWED left side: hot keys take the broadcast
    path, the cold remainder takes the normal hash exchange.

    A plain hash join sends every row of a hot key to ONE reduce partition —
    the straggler that dominates wall time at scale.  Here the hot keys'
    right-side rows (small by assumption: hot on the probe side, not the
    build side) are broadcast once via ``ray.put`` and joined map-side with
    zero movement of the skewed left rows; only the cold keys pay the
    all-to-all.  Key-disjoint split + union preserves exact inner /
    left-outer semantics (each left row takes exactly one path and meets
    every matching right row there).

    ``hot_keys``: explicit values, else detected with one
    :func:`~pyjelly_ray.stages.sketch.approx_heavy_hitters` pass over the
    left key (no-false-negative within its retained set; a missed warm key
    only costs performance, never correctness).
    """
    if how not in ("inner", "left outer"):
        raise ValueError("skew split preserves semantics for inner/left outer only")
    right_key = right_key or left_key

    if hot_keys is None:
        from .sketch import approx_heavy_hitters

        hot = approx_heavy_hitters(left, left_key, k=detect_top)
        batches = list(hot.iter_batches(batch_format="pyarrow"))
        hot_keys = (
            pa.concat_tables(batches).column(left_key).combine_chunks()
            if batches
            else None
        )
    else:
        vals = list(hot_keys)
        hot_keys = pa.array(vals) if vals else None
    if hot_keys is None or len(hot_keys) == 0:
        # nothing hot (or empty left side): plain co-partitioned join
        return hash_join(left, right, left_key=left_key, right_key=right_key,
                         how=how, num_partitions=num_partitions)

    def split(ds, key, keep_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            mask = pc.is_in(b.column(key), value_set=hot_keys)
            return b.filter(mask if keep_hot else pc.invert(mask))

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    left_hot, left_cold = split(left, left_key, True), split(left, left_key, False)
    right_hot, right_cold = split(right, right_key, True), split(right, right_key, False)

    hot_joined = broadcast_join(
        left_hot, right_hot, left_key=left_key, right_key=right_key, how=how
    )
    cold_joined = hash_join(
        left_cold, right_cold, left_key=left_key, right_key=right_key,
        how=how, num_partitions=num_partitions,
    )
    return hot_joined.union(cold_joined)


def table_diff(old, new, *, key: str, compare_cols: list[str],
               num_partitions: int | None = None):
    """Snapshot diff: classify every key as added / removed / changed
    between two table versions (unchanged keys are dropped).

    One co-partitioned FULL OUTER join; presence markers distinguish a
    missing side from a NULL value, and the comparison + classification
    run fused in the join reduce — the diff ships |old|+|new| rows once
    and emits only the changed keys.  The audit primitive for incremental
    pipeline runs (what did this rebuild actually touch?).
    """
    mark_old, mark_new = "__in_old", "__in_new"

    def tag(marker, rename):
        def f(b: pa.Table) -> pa.Table:
            cols = {key: b.column(key)}
            for c in compare_cols:
                cols[rename(c)] = b.column(c)
            cols[marker] = pa.array([1] * b.num_rows, pa.int8())
            return pa.table(cols)

        return f

    o = old.map_batches(tag(mark_old, lambda c: c), batch_format="pyarrow")
    n = new.map_batches(
        tag(mark_new, lambda c: f"{c}__new"), batch_format="pyarrow"
    )

    def classify(t: pa.Table) -> pa.Table:
        in_old = pc.is_valid(t.column(mark_old))
        in_new = pc.is_valid(t.column(mark_new))
        differs = pa.array([False] * t.num_rows, pa.bool_())
        for c in compare_cols:
            a, b2 = t.column(c), t.column(f"{c}__new")
            ne = pc.or_kleene(
                pc.not_equal(a, b2),
                pc.xor(pc.is_null(a), pc.is_null(b2)),
            )
            ne = pc.fill_null(ne, False)
            differs = pc.or_(differs, ne)
        change = pc.if_else(
            pc.invert(in_new),
            pa.scalar("removed"),
            pc.if_else(pc.invert(in_old), pa.scalar("added"), pa.scalar("changed")),
        )
        keep = pc.or_(pc.or_(pc.invert(in_new), pc.invert(in_old)), differs)
        out = pa.table({key: t.column(key), "change": change})
        return out.filter(keep)

    return hash_join(
        o, n, left_key=key, how="full outer",
        num_partitions=num_partitions, post=classify,
    )


def interval_overlap_join(left, right, *, key: str,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          num_partitions: int | None = None,
                          post=None, chunk: int | None = None):
    """Interval × interval OVERLAP join per key: emit one row for every
    (left, right) pair with the same key whose half-open spans intersect
    (``l_start < r_end AND r_start < l_end``) — outage × session overlap,
    co-activity detection, schedule conflicts.

    Ray Data has no inequality joins; this is the custom-operator
    composition: co-partition both sides by ``hash(key)``
    (:func:`~pyjelly_ray.state.exchange.hash_exchange_pair`), then a
    per-key vectorized band probe — rights sorted by start once, and for
    each left span two ``np.searchsorted`` calls bound the candidates to
    ``r_start ∈ [l_start − max_right_len, l_end)`` (anything outside
    cannot overlap), followed by one exact vectorized end check.  Output:
    all left columns + all right columns except the right key (caller
    ensures unique names).

    ``post``: optional per-partition consumer applied to each joined
    partition INSIDE the reduce (same contract as ``hash_join(post=)``) —
    a key-local aggregate fused here never materializes the raw pair
    stream.  With ``chunk`` the post output is a per-chunk PARTIAL (one
    pair's spans can be attributed to different chunks across bursts);
    merge downstream.

    ``chunk`` (int, same units as the start/end columns, which must then
    be integers): ALSO co-partition by time chunk.  Each interval is
    replicated to every chunk it touches with CLIPPED coordinates; the
    candidate band then uses clipped spans (width ≤ chunk, immune to one
    giant interval), and each pair is counted exactly once — in the chunk
    containing ``max(l_start, r_start)`` (the overlap's first instant).
    This is the scale path when keys are few or spans are long: the
    exchange fan-out becomes |keys|·|chunks| and reduce work is bounded
    per chunk.  Replication factor = span/chunk + 1; pick ``chunk`` near
    the typical span length.
    """
    import numpy as np

    from ..state.exchange import default_partitions, hash_exchange_pair
    from .agg import bucket_codes

    num_partitions = num_partitions or default_partitions()
    part_keys = [key] if chunk is None else [key, "__chunk"]

    def _explode(start_col: str, end_col: str):
        def f(b: pa.Table) -> pa.Table:
            if chunk is None:
                return b.append_column(
                    "__bucket",
                    pa.array(bucket_codes(b, part_keys, num_partitions)),
                )
            s = b.column(start_col).to_numpy(zero_copy_only=False)
            e = b.column(end_col).to_numpy(zero_copy_only=False)
            c0 = s // chunk
            c1 = np.maximum((np.maximum(e, s + 1) - 1) // chunk, c0)
            reps = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(b.num_rows), reps)
            offs = np.cumsum(reps) - reps
            ch = np.repeat(c0, reps) + (np.arange(int(reps.sum()))
                                        - np.repeat(offs, reps))
            out = b.take(pa.array(idx, pa.int64()))
            out = out.append_column("__chunk", pa.array(ch, pa.int64()))
            cs = np.maximum(s[idx], ch * chunk)
            ce = np.minimum(e[idx], (ch + 1) * chunk)
            out = out.append_column("__cs", pa.array(cs, pa.int64()))
            out = out.append_column("__ce", pa.array(ce, pa.int64()))
            return out.append_column(
                "__bucket",
                pa.array(bucket_codes(out, part_keys, num_partitions)),
            )

        return f

    lt = left.map_batches(_explode(left_start, left_end),
                          batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(_explode(right_start, right_end),
                           batch_format="pyarrow", batch_size=None)

    helper_cols = ["__bucket"] + (["__chunk", "__cs", "__ce"]
                                  if chunk is not None else [])

    def _strip(t: pa.Table, cols) -> pa.Table:
        drop = [c for c in cols if c in t.column_names]
        return t.drop_columns(drop) if drop else t

    def _empty_out(lp: pa.Table, rp: pa.Table) -> pa.Table:
        cols = {f.name: pa.array([], f.type)
                for f in _strip(lp, helper_cols).schema}
        for f in _strip(rp, helper_cols).schema:
            if f.name != key:
                cols[f.name] = pa.array([], f.type)
        out = pa.table(cols)
        return post(out) if post is not None else out

    def reduce(lp: pa.Table, rp: pa.Table) -> pa.Table:
        lp, rp = _strip(lp, ["__bucket"]), _strip(rp, ["__bucket"])
        if lp.num_rows == 0 or rp.num_rows == 0:
            return _empty_out(lp, rp)
        ls_col, le_col = (left_start, left_end) if chunk is None else ("__cs", "__ce")
        rs_col, re_col = (right_start, right_end) if chunk is None else ("__cs", "__ce")
        lp = lp.sort_by([(k, "ascending") for k in part_keys]
                        + [(ls_col, "ascending")])
        rp = rp.sort_by([(k, "ascending") for k in part_keys]
                        + [(rs_col, "ascending")])
        from .agg import _key_run_bounds

        lb = _key_run_bounds(lp, part_keys)
        rb = _key_run_bounds(rp, part_keys)

        def run_key(t: pa.Table, i: int):
            return tuple(t.column(k)[i].as_py() for k in part_keys)

        rkeys = {run_key(rp, int(s)): (int(s), int(e))
                 for s, e in zip(rb[:-1], rb[1:])}
        ls = lp.column(ls_col).to_numpy(zero_copy_only=False)
        le = lp.column(le_col).to_numpy(zero_copy_only=False)
        rs = rp.column(rs_col).to_numpy(zero_copy_only=False)
        re_ = rp.column(re_col).to_numpy(zero_copy_only=False)
        if chunk is not None:
            ols = lp.column(left_start).to_numpy(zero_copy_only=False)
            ole = lp.column(left_end).to_numpy(zero_copy_only=False)
            ors = rp.column(right_start).to_numpy(zero_copy_only=False)
            ore = rp.column(right_end).to_numpy(zero_copy_only=False)
            chs = lp.column("__chunk").to_numpy(zero_copy_only=False)
        li_all, ri_all = [], []
        for s, e in zip(lb[:-1], lb[1:]):
            kv = run_key(lp, int(s))
            if kv not in rkeys:
                continue
            rs0, re0 = rkeys[kv]
            seg_rs, seg_re = rs[rs0:re0], re_[rs0:re0]
            m = (seg_re - seg_rs).max()
            seg_ls, seg_le = ls[s:e], le[s:e]
            lo = np.searchsorted(seg_rs, seg_ls - m, side="left")
            hi = np.searchsorted(seg_rs, seg_le, side="left")
            counts = np.maximum(hi - lo, 0)
            total = int(counts.sum())
            if total == 0:
                continue
            li = np.repeat(np.arange(e - s), counts)
            offs = np.cumsum(counts) - counts
            ri = np.repeat(lo, counts) + (np.arange(total) - np.repeat(offs, counts))
            if chunk is None:
                keep = seg_re[ri] > seg_ls[li]
            else:
                gl, gr = li + s, ri + rs0
                t0 = np.maximum(ols[gl], ors[gr])
                keep = (
                    (ore[gr] > ols[gl]) & (ors[gr] < ole[gl])
                    & (t0 >= chs[gl] * chunk)  # count the pair once
                )
            li_all.append(li[keep] + s)
            ri_all.append(ri[keep] + rs0)
        if not li_all:
            return _empty_out(lp, rp)
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)
        out = _strip(lp, helper_cols).take(pa.array(li, pa.int64()))
        rtk = _strip(rp, helper_cols).drop_columns([key]).take(
            pa.array(ri, pa.int64()))
        for c in rtk.column_names:
            out = out.append_column(c, rtk.column(c))
        return post(out) if post is not None else out

    return hash_exchange_pair(
        lt, rt,
        left_bucket_col="__bucket",
        right_bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce,
    )
