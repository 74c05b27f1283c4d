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
