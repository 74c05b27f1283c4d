"""Join strategies (SURVEY.md §2.5).

- :func:`broadcast_join` — small side collected once, shipped via ``ray.put``
  and hashed into every ``map_batches`` task (no shuffle).  Use for dims
  (region/nation/supplier/part/customer); this is the 100 TB-safe path for
  small-side joins.
- :func:`broadcast_semi` — broadcast semi-join (filter by key membership).
- Large-large joins use ``Dataset.join`` (Ray's hash shuffle join) directly;
  helpers here only pick ``num_partitions`` sensibly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _collect_table(ds_or_table) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    batches = list(ds_or_table.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


class _BroadcastJoiner:
    """Actor/task-pool callable: hash-join each batch against the small side."""

    def __init__(self, small_ref, left_key: str, right_key: str, how: str) -> None:
        try:
            import ray

            if isinstance(small_ref, ray.ObjectRef):
                small_ref = ray.get(small_ref)
        except ImportError:
            pass
        self.small: pa.Table = small_ref
        self.left_key = left_key
        self.right_key = right_key
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.join(
            self.small,
            keys=[self.left_key],
            right_keys=[self.right_key],
            join_type=self.how,
        )


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
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, left_key, right_key, how),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def broadcast_semi(ds, small, *, left_key: str, right_key: str | None = None,
                   anti: bool = False):
    """Semi/anti join: keep rows whose key is (not) in the small side."""
    import ray

    right_key = right_key or left_key
    table = _collect_table(small)
    keys = pc.unique(table.column(right_key))
    ref = ray.put(keys)

    class _Semi:
        def __init__(self) -> None:
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(left_key), value_set=self.keys)
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

    return ds.map_batches(_Semi, batch_format="pyarrow", concurrency=(1, 8))


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

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b.column(left_key),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_ts": b.column(left_ts),
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
            "_ts": pc.cast(b.column(right_ts), left_cols.get(left_ts, pa.timestamp("us"))),
            "_rv": pc.cast(b.column(right_value), pa.int64()),
        }
        for c, typ in left_cols.items():
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    unioned = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("_side"), 0)
        lpart = group.filter(mask)
        rpart = group.filter(pc.invert(mask))
        out = {c: lpart.column(c) for c in left_cols}
        if lpart.num_rows == 0:
            out[out_value] = pa.nulls(0, pa.int64())
            return pa.table(out)
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
        return pa.table(out)

    return unioned.groupby("_key").map_groups(merge, batch_format="pyarrow")
