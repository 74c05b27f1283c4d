"""Distinct set operations (SQL UNION / INTERSECT / EXCEPT).

SQL's set operators are DISTINCT by definition, so each one is a dedup
problem: tag which side a row came from, dedup rows per side inside every
batch (the combiner), then ONE hash exchange on the full row co-locates
equal rows and a per-partition presence test decides membership.  Shuffle
volume is Σ|distinct rows per block|, never |rows|.

Both inputs must share the (already projected/renamed) output schema —
exactly SQL's positional-column contract.  NULLs compare equal, as in SQL
set ops (Arrow ``group_by`` groups NULL keys together).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import bucket_codes, null_safe_group_by


def _tagged(ds, cols: list[str], side: str, num_partitions: int):
    def tag(b: pa.Table) -> pa.Table:
        # in-batch distinct: group_by with no aggregates = unique rows
        t = null_safe_group_by(b.select(cols), cols, [])
        ones = pa.array([1] * t.num_rows, pa.int8())
        zeros = pa.array([0] * t.num_rows, pa.int8())
        t = t.append_column("__l", ones if side == "l" else zeros)
        t = t.append_column("__r", zeros if side == "l" else ones)
        return t.append_column(
            "__bucket", pa.array(bucket_codes(t, cols, num_partitions))
        )

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None)


def set_op(left, right, op: str, *, columns: list[str] | None = None,
           num_partitions: int | None = None):
    """``op`` ∈ {"union", "intersect", "except"} with DISTINCT semantics.

    ``columns``: the row identity (defaults to the left schema's columns);
    the right side must carry the same column names (rename upstream, as
    SQL matches set-op columns positionally).
    """
    from ..state.exchange import default_partitions, hash_exchange

    if op not in ("union", "intersect", "except"):
        raise ValueError(op)
    num_partitions = num_partitions or default_partitions()
    cols = columns or left.schema().names

    tagged = _tagged(left, cols, "l", num_partitions).union(
        _tagged(right, cols, "r", num_partitions)
    )

    def reduce_part(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        g = null_safe_group_by(t, cols, [("__l", "max"), ("__r", "max")])
        in_l = pc.equal(g.column("__l_max"), pa.scalar(1, pa.int8()))
        in_r = pc.equal(g.column("__r_max"), pa.scalar(1, pa.int8()))
        if op == "union":
            mask = pc.or_(in_l, in_r)
        elif op == "intersect":
            mask = pc.and_(in_l, in_r)
        else:  # except
            mask = pc.and_(in_l, pc.invert(in_r))
        return g.filter(mask).select(cols)

    return hash_exchange(
        tagged,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def union_by_name(datasets, *, strict_types: bool = True):
    """UNION ALL BY NAME with schema evolution: columns are aligned by
    name across all inputs; a column missing from an input comes back
    NULL (typed from the first input that has it) — the lakehouse
    ingest-evolving-parquet primitive (SQL ``UNION ALL BY NAME``).

    Pure map-side: each input gets one ``map_batches`` that adds the
    missing NULL columns and reorders; no shuffle, streaming preserved.
    ``strict_types=False`` casts colliding column types to the first
    occurrence's type instead of raising.
    """
    import ray

    datasets = list(datasets)
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    types: dict[str, pa.DataType] = {}
    for ds in datasets:
        schema = ds.schema()
        schema = getattr(schema, "base_schema", schema)
        for f in schema:
            if f.name not in types:
                types[f.name] = f.type
            elif f.type != types[f.name]:
                if strict_types:
                    raise TypeError(
                        f"column {f.name!r}: {f.type} vs {types[f.name]} "
                        "(pass strict_types=False to cast)"
                    )
    names = list(types)

    def align(b: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in b.column_names:
                col = b.column(n)
                if col.type != types[n]:
                    col = pc.cast(col, types[n])
                cols.append(col)
            else:
                cols.append(pa.nulls(b.num_rows, types[n]))
        return pa.table(dict(zip(names, cols)))

    out = datasets[0].map_batches(align, batch_format="pyarrow")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(align, batch_format="pyarrow"))
    return out
