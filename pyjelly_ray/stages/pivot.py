"""PIVOT / UNPIVOT reshaping as pure map compositions.

Ray Data has no native pivot; SQL ``PIVOT ... FOR col IN (v1, v2, ...)``
(reference workflows reshape per-category stats the same way) decomposes
into per-value conditional columns + one :func:`grouped_agg` — i.e. the
classic ``agg FILTER (WHERE pivot_col = v)`` rewrite.  The pivot value
list is explicit (as in SQL PIVOT's IN list) so the output schema is
stable without a driver-side distinct pass; at 100 TB the conditional
columns are appended map-side and the single exchange carries
``|keys| × |values|`` aggregate cells per block.

``unpivot`` (SQL UNPIVOT / pandas melt) is the inverse: a stateless
``map_batches`` that stacks value columns into (name, value) rows —
id columns are taken zero-copy per stacked slice, no shuffle at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import grouped_agg


def pivot_agg(ds, keys, *, pivot_col: str, values: list, value_col: str | None = None,
              agg: str = "count", name_fmt: str = "{}",
              round_to: int | None = None, num_partitions: int = 16):
    """``agg(value_col) FILTER (WHERE pivot_col = v)`` per key, one column
    per ``v`` in ``values`` (column name = ``name_fmt.format(v)``).

    ``agg`` ∈ {count, sum, min, max}.  SQL FILTER semantics: count → 0 for
    keys with no matching rows, sum/min/max → NULL.  ``count`` needs no
    ``value_col``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if agg not in ("count", "sum", "min", "max"):
        raise ValueError(agg)
    if agg != "count" and value_col is None:
        raise ValueError("value_col required for sum/min/max")
    names = [name_fmt.format(v) for v in values]
    cond_cols = [f"__pv_{i}" for i in range(len(values))]

    def add_conditionals(t: pa.Table) -> pa.Table:
        piv = t.column(pivot_col)
        for v, cc in zip(values, cond_cols):
            match = pc.fill_null(pc.equal(piv, v), False)
            if agg == "count":
                col = pc.cast(match, pa.int64())
            else:
                src = t.column(value_col)
                if pa.types.is_integer(src.type):
                    src = pc.cast(src, pa.float64())
                col = pc.if_else(match, src, pa.scalar(None, src.type))
            t = t.append_column(cc, col)
        return t.select(keys + cond_cols)

    # FILTER-count == sum of 0/1 indicators (int64, like SQL count)
    spec_fn = "sum" if agg == "count" else agg
    specs = [(n, cc, spec_fn) for n, cc in zip(names, cond_cols)]
    mapped = ds.map_batches(add_conditionals, batch_format="pyarrow")
    return grouped_agg(
        mapped, keys, specs, round_to=round_to,
        num_partitions=num_partitions, sum_as_float=(agg != "count"),
    )


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "name", value_name: str = "value",
            value_type: pa.DataType | None = None):
    """Stack ``value_cols`` into (``var_name``, ``value_name``) rows — SQL
    ``UNPIVOT`` / ``UNION ALL`` of one SELECT per column.  Output rows =
    input rows × |value_cols|, emitted per batch with zero-copy id-column
    reuse; value columns are cast to a common ``value_type`` (default
    float64, as SQL's implicit numeric unification would)."""
    vt = value_type if value_type is not None else pa.float64()

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.repeat(pa.scalar(c, pa.string()), t.num_rows)
            cols[value_name] = pc.cast(t.column(c), vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")
