"""Explicit hash exchange built on raw Ray tasks (SURVEY.md §2 escape hatch).

Ray Data's ``groupby`` runs a sample+sort shuffle whose wall time proved
bimodal under load (observed 13–170 s for the same 6 GB exchange).  When
the partition count is known and the key is already an int bucket column,
an all-to-all needs neither sampling nor sorting:

    map side:   split each input block into P sub-tables by ``bucket``
                (one vectorized take per partition), returning P object refs
    reduce side: per partition, concat its P_i parts and apply ``reduce_fn``

Everything stays zero-copy Arrow in plasma; the result re-enters the
Dataset API via ``from_arrow_refs``.  Deterministic by construction (the
reduce sees all rows of its buckets; ``reduce_fn`` must itself be
order-insensitive or sort internally, which our dedup/writer kernels do).

This is the documented partitioning assumption: ``bucket ∈ [0, P)``.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _split_block(table: pa.Table, n_partitions: int, bucket_col: str) -> list[pa.Table]:
    """One int sort + boundary search → P zero-copy slices (NOT P filters:
    filtering P times re-scans the block P times)."""
    import numpy as np

    t = table.sort_by([(bucket_col, "ascending")])
    b = t.column(bucket_col).to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(b, np.arange(n_partitions + 1))
    return [
        t.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(n_partitions)
    ]


def hash_exchange(
    ds,
    *,
    bucket_col: str,
    n_partitions: int,
    reduce_fn: Callable[[pa.Table], pa.Table],
):
    """All-to-all by an int bucket column with a per-partition reduce.

    Returns a new Dataset of ``reduce_fn`` outputs (one block per
    partition).  ``bucket_col`` values MUST lie in [0, n_partitions).
    """
    import ray

    split = ray.remote(num_returns=n_partitions)(_split_block)
    reduce_remote = ray.remote(
        lambda *parts: reduce_fn(
            pa.concat_tables([p for p in parts if p.num_rows], promote_options="default")
        )
        if any(p.num_rows for p in parts)
        else parts[0]
    )

    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return ds
    part_refs: list[list] = [[] for _ in range(n_partitions)]
    for ref in block_refs:
        outs = split.remote(ref, n_partitions, bucket_col)
        if n_partitions == 1:
            outs = [outs]
        for p, r in enumerate(outs):
            part_refs[p].append(r)
    reduced = [reduce_remote.remote(*parts) for parts in part_refs]
    return ray.data.from_arrow_refs(reduced)
