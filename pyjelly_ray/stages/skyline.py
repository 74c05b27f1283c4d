"""Distributed skyline (Pareto frontier) operator.

A row is on the skyline iff no other row dominates it: dominance means
at-least-as-good on EVERY dimension and strictly better on at least one
(rows equal on all dimensions do not dominate each other, so exact
duplicates both survive — same semantics as the SQL ``NOT EXISTS``
dominance anti-join).

Scale shape: the classic two-level skyline.  Each block keeps only its
LOCAL skyline (any point dominated inside a block is dominated globally,
so local pruning is lossless); survivors — O(log^{d−1} n) points on
independent dimensions, i.e. tiny — flow through one single-partition
exchange where the same kernel runs once more on the union.  No global
sort, no quadratic pass over the raw data; the all-pairs work happens
only on local-skyline survivors, chunked so memory stays bounded.

Reference parity: the reference engine has no skyline operator; this is
part of the training-data/analytics extension surface (multi-objective
"best corpus documents" style selection).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(X: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Boolean keep-mask of the Pareto frontier of ``X`` (orientation:
    larger is better on every column).

    Rows are visited in descending lexicographic order, so a row can only
    be dominated by rows already seen; each chunk is checked (vectorized)
    against the accumulated skyline AND against its own chunk-mates.
    Checking against not-yet-pruned chunk-mates is sound because dominance
    is transitive: if a dominated q dominates p, q's dominator does too.
    """
    n, d = X.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort(tuple(X[:, j] for j in range(d - 1, -1, -1)))[::-1]
    Xs = X[order]
    keep_sorted = np.zeros(n, dtype=bool)
    sky = np.empty((0, d), dtype=X.dtype)
    for s in range(0, n, chunk):
        cand = Xs[s : s + chunk]
        dom = np.zeros(len(cand), dtype=bool)
        if len(sky):
            ge = (sky[None, :, :] >= cand[:, None, :]).all(axis=2)
            gt = (sky[None, :, :] > cand[:, None, :]).any(axis=2)
            dom = (ge & gt).any(axis=1)
        ge = (cand[None, :, :] >= cand[:, None, :]).all(axis=2)
        gt = (cand[None, :, :] > cand[:, None, :]).any(axis=2)
        dom |= (ge & gt).any(axis=1)
        surv = ~dom
        keep_sorted[s : s + len(cand)] = surv
        if surv.any():
            sky = np.concatenate([sky, cand[surv]])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _oriented(t: pa.Table, dims: list[tuple[str, str]]) -> np.ndarray:
    cols = []
    for col, direction in dims:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        cols.append(-v if direction == "min" else v)
    return np.column_stack(cols)


def skyline(ds, dims: list[tuple[str, str]], *, chunk: int = 2048):
    """Pareto frontier of ``ds`` over ``dims`` = [(column, "min"|"max"), …].

    Rows with a NULL in any skyline dimension are excluded (NULL has no
    defined dominance order — the SQL oracle's comparisons would be
    UNKNOWN for them anyway).  Returns the surviving rows with their full
    original schema.
    """
    from ..stages.agg import grouped_map

    for _, direction in dims:
        if direction not in ("min", "max"):
            raise ValueError(f"direction must be min|max, got {direction!r}")
    dim_cols = [c for c, _ in dims]

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        import pyarrow.compute as pc

        valid = pc.is_valid(b.column(dim_cols[0]))
        for c in dim_cols[1:]:
            valid = pc.and_(valid, pc.is_valid(b.column(c)))
        b = b.filter(valid)
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(_skyline_mask(_oriented(b, dims), chunk)))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    keyed = pruned.map_batches(
        lambda b: b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )

    def final(t: pa.Table) -> pa.Table:
        if "__g" in t.column_names:
            t = t.drop_columns(["__g"])
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(_skyline_mask(_oriented(t, dims), chunk)))

    return grouped_map(keyed, "__g", final, per_group=False, num_partitions=1)
