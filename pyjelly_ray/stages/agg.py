"""Scale-aware grouped aggregation: partial combine → hash exchange → finalize.

``grouped_agg`` expresses SUM/COUNT/MEAN/MIN/MAX group-bys as:

1. per-batch partial aggregation with Arrow's ``Table.group_by`` (vectorized,
   no shuffle) — the combiner that collapses each block to ≤ |groups| rows —
   plus an int bucket column ``hash(keys) % P``;
2. one explicit hash exchange over the partials
   (:func:`pyjelly_ray.state.exchange.hash_exchange`) with a vectorized
   ``Table.group_by`` merge per partition.  Ray Data's own
   ``groupby().sum()`` runs a sample+sort shuffle that measured 80 s of
   remote wall for 478k partial rows on this box (q_top_parts, sf0.1);
   with the bucket known up front the all-to-all needs neither sampling
   nor sorting and the same combine runs in well under a second;
3. a finalize ``map_batches`` computing derived columns (mean = sum/count)
   and giving every output column its user-specified name — names are part
   of the oracle contract (driver compares by column name).

This is the map-side-combine pattern SURVEY.md §2.5 calls for; at 100 TB the
exchange volume is |groups| × blocks, not the raw row count, and
``num_partitions`` scales with |groups| (each reduce holds only its
buckets' groups).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..state.exchange import default_partitions

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


def bucket_codes(batch: pa.Table, keys: list[str], n_partitions: int):
    """Vectorized, cross-process-deterministic ``hash(keys) % P``.

    Int keys use a Fibonacci-multiply mix; other types go through
    ``pandas.util.hash_array`` (siphash with a fixed key — stable across
    processes, unlike builtin ``hash`` under PYTHONHASHSEED).  Null ints
    hash as 0, null strings as ""; temporal/float nulls ride their
    NaT/NaN bit patterns.
    """
    import numpy as np
    import pandas as pd

    h = np.zeros(batch.num_rows, np.uint64)
    for c in keys:
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            if col.null_count:
                col = pc.fill_null(col, 0)
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
            hv = v * np.uint64(0x9E3779B97F4A7C15)
        else:
            if col.null_count and (
                pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)
                or pa.types.is_binary(col.type)
            ):
                col = pc.fill_null(col, "")
            # timestamps/floats pass through: hash_array handles NaT/NaN
            # deterministically via their int64/float64 bit patterns
            hv = pd.util.hash_array(np.asarray(col.to_numpy(zero_copy_only=False)))
        h = h * np.uint64(31) + hv
    return (h % np.uint64(n_partitions)).astype(np.int64)


def _zero_like(typ: pa.DataType):
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.scalar("", typ)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.scalar(b"", typ)
    return pc.cast(pa.scalar(0, pa.int64()), typ)


def null_safe_group_by(t: pa.Table, keys: list[str], plan) -> pa.Table:
    """``t.group_by(keys).aggregate(plan)`` that is correct under NULL keys.

    Arrow 16.1's Acero grouper can emit SPLIT groups when a multi-column
    key contains nulls (observed: duplicate ``(None, b)`` output rows, each
    holding a partial sum — silently wrong final merges).  Null keys are
    lifted into companion boolean columns, the key filled with a
    type-appropriate placeholder, grouped, then restored — so a genuine
    NULL key and the placeholder value can never collide (the companion
    distinguishes them).  Fast path: no nulls → plain ``group_by``.
    """
    null_keys = [k for k in keys if k in t.column_names and t.column(k).null_count]
    if not null_keys or t.num_rows == 0:
        return t.group_by(keys).aggregate(plan)
    work = t
    for k in null_keys:
        col = work.column(k)
        isnull = pc.is_null(col)
        work = work.set_column(
            work.schema.get_field_index(k), k,
            pc.fill_null(col, _zero_like(col.type)),
        )
        work = work.append_column(f"__isnull_{k}", isnull)
    out = work.group_by(keys + [f"__isnull_{k}" for k in null_keys]).aggregate(plan)
    for k in null_keys:
        col = out.column(k)
        restored = pc.if_else(
            out.column(f"__isnull_{k}"), pa.scalar(None, col.type), col
        )
        out = out.set_column(out.schema.get_field_index(k), k, restored)
    return out.drop_columns([f"__isnull_{k}" for k in null_keys])


def _partial_fn(keys: list[str], specs: list[Spec]):
    aggs = []
    seen = set()
    sq_cols: list[str] = []
    cb_cols: list[str] = []
    q4_cols: list[str] = []
    xy_cols: list[tuple[str, str]] = []
    pw_cols: list[tuple[str, str]] = []
    ln_cols: list[str] = []
    inv_cols: list[str] = []
    nv_cols: list[str] = []
    for _, col, fn in specs:
        if fn == "wmean":
            # col is (x, w): Σ(x·w) and Σw — rows with NULL x still count
            # toward Σw, exactly like SQL sum(x*w)/sum(w)
            x, y = col
            if ("s", y) not in seen:
                aggs.append((y, "sum"))
                seen.add(("s", y))
            if ("xy", x, y) not in seen:
                aggs.append((f"{x}__xy__{y}", "sum"))
                xy_cols.append((x, y))
                seen.add(("xy", x, y))
            continue
        if fn in ("corr", "covar", "slope", "intercept"):
            # col is an (x, y) pair; PAIRWISE-COMPLETE moments — SQL
            # corr/covar_samp/regr_* drop a row when EITHER side is NULL,
            # so each pair gets its own masked n, Σx, Σy, Σx², Σy², Σxy
            # (the per-column sums other kinds share would over-count)
            x, y = col
            if ("pw", x, y) not in seen:
                for m in ("n", "sx", "sy", "sxx", "syy", "sxy"):
                    aggs.append((f"{x}__pw__{y}__{m}", "sum"))
                pw_cols.append((x, y))
                seen.add(("pw", x, y))
            continue
        if fn in ("sum", "mean", "var", "std"):
            if ("s", col) not in seen:
                aggs.append((col, "sum"))
                seen.add(("s", col))
        if fn in ("var", "std"):
            # mergeable second moment: Σx² partial per batch
            if ("sq", col) not in seen:
                aggs.append((f"{col}__sq", "sum"))
                sq_cols.append(col)
                seen.add(("sq", col))
        if fn in ("skew", "kurt"):
            # higher mergeable moments: Σx, Σx², Σx³ (+ Σx⁴ for kurtosis)
            if ("s", col) not in seen:
                aggs.append((col, "sum"))
                seen.add(("s", col))
            if ("sq", col) not in seen:
                aggs.append((f"{col}__sq", "sum"))
                sq_cols.append(col)
                seen.add(("sq", col))
            if ("cb", col) not in seen:
                aggs.append((f"{col}__cb", "sum"))
                cb_cols.append(col)
                seen.add(("cb", col))
            if fn == "kurt" and ("q4", col) not in seen:
                aggs.append((f"{col}__q4", "sum"))
                q4_cols.append(col)
                seen.add(("q4", col))
        if fn in ("geomean", "harmmean"):
            # mergeable transforms: Σln(x) / Σ(1/x) plus the NON-NULL count
            # (NULLs drop like SQL avg/sum — COUNT(*) would dilute).
            # PRECONDITION: values must be strictly positive for SQL parity —
            # Arrow gives ln(0) = -inf and 1/0 = inf where DuckDB errors on
            # ln(0) and NULLs 1/0, so zero/negative inputs silently diverge.
            # Filter or clamp upstream when the column can contain them.
            if ("ln", col) not in seen and fn == "geomean":
                aggs.append((f"{col}__ln", "sum"))
                ln_cols.append(col)
                seen.add(("ln", col))
            if ("inv", col) not in seen and fn == "harmmean":
                aggs.append((f"{col}__inv", "sum"))
                inv_cols.append(col)
                seen.add(("inv", col))
            if ("nv", col) not in seen:
                aggs.append((f"{col}__nv", "sum"))
                nv_cols.append(col)
                seen.add(("nv", col))
        if fn in ("count", "mean"):
            if ("c",) not in seen:
                seen.add(("c",))
        if fn in ("min", "max"):
            if (fn, col) not in seen:
                aggs.append((col, fn))
                seen.add((fn, col))

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        work = batch.append_column(
            "__cnt", pa.array(np.ones(batch.num_rows, np.int64))
        )
        for col in sq_cols:
            x = pc.cast(work.column(col), pa.float64())
            work = work.append_column(f"{col}__sq", pc.multiply(x, x))
        for col in cb_cols:
            x = pc.cast(work.column(col), pa.float64())
            work = work.append_column(f"{col}__cb", pc.multiply(pc.multiply(x, x), x))
        for col in q4_cols:
            x = pc.cast(work.column(col), pa.float64())
            x2 = pc.multiply(x, x)
            work = work.append_column(f"{col}__q4", pc.multiply(x2, x2))
        for x, y in xy_cols:
            xv = pc.cast(work.column(x), pa.float64())
            yv = pc.cast(work.column(y), pa.float64())
            work = work.append_column(f"{x}__xy__{y}", pc.multiply(xv, yv))
        for col in ln_cols:
            x = pc.cast(work.column(col), pa.float64())
            work = work.append_column(f"{col}__ln", pc.ln(x))
        for col in inv_cols:
            x = pc.cast(work.column(col), pa.float64())
            work = work.append_column(
                f"{col}__inv", pc.divide(pa.scalar(1.0, pa.float64()), x)
            )
        for col in nv_cols:
            work = work.append_column(
                f"{col}__nv", pc.cast(pc.is_valid(work.column(col)), pa.int64())
            )
        for x, y in pw_cols:
            xv = pc.cast(work.column(x), pa.float64())
            yv = pc.cast(work.column(y), pa.float64())
            both = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
            xm = pc.if_else(both, xv, pa.scalar(None, pa.float64()))
            ym = pc.if_else(both, yv, pa.scalar(None, pa.float64()))
            work = work.append_column(f"{x}__pw__{y}__n", pc.cast(both, pa.int64()))
            work = work.append_column(f"{x}__pw__{y}__sx", xm)
            work = work.append_column(f"{x}__pw__{y}__sy", ym)
            work = work.append_column(f"{x}__pw__{y}__sxx", pc.multiply(xm, xm))
            work = work.append_column(f"{x}__pw__{y}__syy", pc.multiply(ym, ym))
            work = work.append_column(f"{x}__pw__{y}__sxy", pc.multiply(xm, ym))
        plan = list(aggs) + [("__cnt", "sum")]
        # empty-safe: group_by on a 0-row table still yields the aggregated
        # schema, which the exchange and finalize rely on.
        out = work.group_by(keys).aggregate(plan)
        # pyarrow names results "<col>_<fn>"
        return out

    return partial


def _merge_cols(specs: list[Spec]):
    """Partial-column names (as emitted by :func:`_partial_fn`) grouped by
    the merge operation that combines them across partials."""
    wmean_pairs = [col for _, col, fn in specs if fn == "wmean"]
    pw_pairs = [
        col for _, col, fn in specs if fn in ("corr", "covar", "slope", "intercept")
    ]
    sum_cols = sorted(
        {f"{col}_sum" for _, col, fn in specs if fn in ("sum", "mean", "var", "std")}
        | {f"{col}__sq_sum" for _, col, fn in specs if fn in ("var", "std")}
        | {f"{col}_sum" for _, col, fn in specs if fn in ("skew", "kurt")}
        | {f"{col}__sq_sum" for _, col, fn in specs if fn in ("skew", "kurt")}
        | {f"{col}__cb_sum" for _, col, fn in specs if fn in ("skew", "kurt")}
        | {f"{col}__q4_sum" for _, col, fn in specs if fn == "kurt"}
        | {f"{col}__ln_sum" for _, col, fn in specs if fn == "geomean"}
        | {f"{col}__inv_sum" for _, col, fn in specs if fn == "harmmean"}
        | {f"{col}__nv_sum" for _, col, fn in specs
           if fn in ("geomean", "harmmean")}
        | {f"{y}_sum" for x, y in wmean_pairs}
        | {f"{x}__xy__{y}_sum" for x, y in wmean_pairs}
        | {f"{x}__pw__{y}__{m}_sum" for x, y in pw_pairs
           for m in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        | {"__cnt_sum"}
    )
    min_cols = sorted({f"{col}_min" for _, col, fn in specs if fn == "min"})
    max_cols = sorted({f"{col}_max" for _, col, fn in specs if fn == "max"})
    return sum_cols, min_cols, max_cols


def _derived_columns(batch: pa.Table, specs: list[Spec], round_to: int | None,
                     sum_as_float: bool) -> dict:
    """Final output columns (named per spec) from merged partial columns."""
    cols: dict[str, object] = {}
    cnt = batch.column("__cnt_sum")
    for out_name, col, fn in specs:
        if fn == "sum":
            v = batch.column(f"{col}_sum")
            if sum_as_float and pa.types.is_integer(v.type):
                # DuckDB sum(int) is HUGEINT → float64 in pandas; match
                # it so the driver's value-hash sees identical dtypes
                v = pc.cast(v, pa.float64())
        elif fn == "count":
            v = cnt
        elif fn == "mean":
            v = pc.divide(
                pc.cast(batch.column(f"{col}_sum"), pa.float64()),
                pc.cast(cnt, pa.float64()),
            )
        elif fn == "min":
            v = batch.column(f"{col}_min")
        elif fn == "max":
            v = batch.column(f"{col}_max")
        elif fn in ("var", "std"):
            # sample variance from mergeable moments:
            # (Σx² − (Σx)²/n) / (n−1); NULL when n ≤ 1 (= DuckDB
            # var_samp/stddev).  max(·, 0) guards the tiny negative
            # residue floating-point cancellation can leave.
            s = pc.cast(batch.column(f"{col}_sum"), pa.float64())
            sq = pc.cast(batch.column(f"{col}__sq_sum"), pa.float64())
            n = pc.cast(cnt, pa.float64())
            num = pc.subtract(sq, pc.divide(pc.multiply(s, s), n))
            num = pc.max_element_wise(num, pa.scalar(0.0, pa.float64()))
            v = pc.divide(num, pc.subtract(n, pa.scalar(1.0, pa.float64())))
            if fn == "std":
                v = pc.sqrt(v)
            v = pc.if_else(
                pc.greater(cnt, pa.scalar(1, pa.int64())),
                v,
                pa.scalar(None, pa.float64()),
            )
        elif fn in ("skew", "kurt"):
            # DuckDB skewness / kurtosis (bias-corrected, excess) from the
            # naive moment sums Σx, Σx², Σx³, Σx⁴ — the SAME formulation
            # DuckDB uses (skew.cpp / kurtosis.cpp), so both sides suffer
            # identical float conditioning.  skew NULL when n ≤ 2 or the
            # (clamped) variance term is 0; kurt NULL when n ≤ 3 or m2 = 0.
            n = pc.cast(cnt, pa.float64())
            s = pc.cast(batch.column(f"{col}_sum"), pa.float64())
            sq = pc.cast(batch.column(f"{col}__sq_sum"), pa.float64())
            cb = pc.cast(batch.column(f"{col}__cb_sum"), pa.float64())
            temp = pc.divide(pa.scalar(1.0, pa.float64()), n)
            inner = pc.multiply(temp, pc.subtract(sq, pc.multiply(pc.multiply(s, s), temp)))
            one = pa.scalar(1.0, pa.float64())
            if fn == "skew":
                p = pc.max_element_wise(
                    pc.power(inner, pa.scalar(3.0, pa.float64())),
                    pa.scalar(0.0, pa.float64()),
                )
                div = pc.sqrt(p)
                ok = pc.and_(
                    pc.greater(cnt, pa.scalar(2, pa.int64())),
                    pc.greater(div, pa.scalar(0.0, pa.float64())),
                )
                t1 = pc.divide(
                    pc.sqrt(pc.multiply(n, pc.subtract(n, one))),
                    pc.if_else(ok, pc.subtract(n, pc.add(one, one)), one),
                )
                m3num = pc.add(
                    pc.subtract(
                        cb,
                        pc.multiply(
                            pa.scalar(3.0, pa.float64()),
                            pc.multiply(pc.multiply(sq, s), temp),
                        ),
                    ),
                    pc.multiply(
                        pa.scalar(2.0, pa.float64()),
                        pc.multiply(
                            pc.power(s, pa.scalar(3.0, pa.float64())),
                            pc.multiply(temp, temp),
                        ),
                    ),
                )
                v = pc.divide(
                    pc.multiply(pc.multiply(t1, temp), m3num),
                    pc.if_else(ok, div, one),
                )
                v = pc.if_else(ok, v, pa.scalar(None, pa.float64()))
            else:
                q4 = pc.cast(batch.column(f"{col}__q4_sum"), pa.float64())
                m4 = pc.multiply(
                    temp,
                    pc.add(
                        pc.subtract(
                            q4,
                            pc.multiply(
                                pa.scalar(4.0, pa.float64()),
                                pc.multiply(pc.multiply(cb, s), temp),
                            ),
                        ),
                        pc.subtract(
                            pc.multiply(
                                pa.scalar(6.0, pa.float64()),
                                pc.multiply(
                                    pc.multiply(sq, pc.multiply(s, s)),
                                    pc.multiply(temp, temp),
                                ),
                            ),
                            pc.multiply(
                                pa.scalar(3.0, pa.float64()),
                                pc.multiply(
                                    pc.power(s, pa.scalar(4.0, pa.float64())),
                                    pc.power(temp, pa.scalar(3.0, pa.float64())),
                                ),
                            ),
                        ),
                    ),
                )
                m2 = inner
                ok = pc.and_(
                    pc.greater(cnt, pa.scalar(3, pa.int64())),
                    pc.not_equal(m2, pa.scalar(0.0, pa.float64())),
                )
                m2sq = pc.if_else(ok, pc.multiply(m2, m2), one)
                nm1 = pc.subtract(n, one)
                v = pc.divide(
                    pc.multiply(
                        nm1,
                        pc.subtract(
                            pc.multiply(pc.add(n, one), pc.divide(m4, m2sq)),
                            pc.multiply(pa.scalar(3.0, pa.float64()), nm1),
                        ),
                    ),
                    pc.if_else(
                        ok,
                        pc.multiply(
                            pc.subtract(n, pc.add(one, one)),
                            pc.subtract(n, pa.scalar(3.0, pa.float64())),
                        ),
                        one,
                    ),
                )
                v = pc.if_else(ok, v, pa.scalar(None, pa.float64()))
        elif fn in ("geomean", "harmmean"):
            # geometric mean = exp(Σln x / n), harmonic = n / Σ(1/x) — both
            # from mergeable transform-sums; n = NON-NULL count; NULL when
            # the group has no valid rows (= SQL exp(avg(ln x)) /
            # count(x)/sum(1/x))
            nv = batch.column(f"{col}__nv_sum")
            n = pc.cast(nv, pa.float64())
            ok = pc.greater(nv, pa.scalar(0, pa.int64()))
            if fn == "geomean":
                s = pc.cast(batch.column(f"{col}__ln_sum"), pa.float64())
                v = pc.exp(
                    pc.divide(s, pc.if_else(ok, n, pa.scalar(1.0, pa.float64())))
                )
            else:
                s = pc.cast(batch.column(f"{col}__inv_sum"), pa.float64())
                v = pc.divide(n, s)
            v = pc.if_else(ok, v, pa.scalar(None, pa.float64()))
        elif fn == "wmean":
            # weighted mean with col = (x, w): Σ(x·w) / Σw, NULL when
            # Σw = 0 (matches SQL sum(x*w)/sum(w): rows with a NULL x
            # still contribute their weight to Σw — NOT pairwise-deleted)
            x, y = col
            sy = pc.cast(batch.column(f"{y}_sum"), pa.float64())
            sxy = pc.cast(batch.column(f"{x}__xy__{y}_sum"), pa.float64())
            ok = pc.not_equal(sy, pa.scalar(0.0, pa.float64()))
            v = pc.divide(sxy, pc.if_else(ok, sy, pa.scalar(1.0, pa.float64())))
            v = pc.if_else(ok, v, pa.scalar(None, pa.float64()))
        elif fn in ("corr", "covar", "slope", "intercept"):
            # Pearson r / sample covariance / OLS regression from
            # PAIRWISE-COMPLETE mergeable moments (n counts only rows
            # where BOTH sides are non-null — SQL corr/covar_samp/regr_*
            # semantics):
            # corr = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²));
            # covar_samp = (Σxy − ΣxΣy/n) / (n−1);
            # slope = (nΣxy − ΣxΣy) / (nΣx²−(Σx)²)  [col = (x, y), y on x];
            # intercept = (Σy − slope·Σx) / n;
            # NULL when n ≤ 1 or the relevant variance is 0 (= DuckDB)
            x, y = col
            base = f"{x}__pw__{y}"
            npair = batch.column(f"{base}__n_sum")
            n = pc.cast(npair, pa.float64())
            sx = pc.cast(batch.column(f"{base}__sx_sum"), pa.float64())
            sy = pc.cast(batch.column(f"{base}__sy_sum"), pa.float64())
            sxx = pc.cast(batch.column(f"{base}__sxx_sum"), pa.float64())
            syy = pc.cast(batch.column(f"{base}__syy_sum"), pa.float64())
            sxy = pc.cast(batch.column(f"{base}__sxy_sum"), pa.float64())
            num = pc.subtract(pc.multiply(n, sxy), pc.multiply(sx, sy))
            dx = pc.max_element_wise(
                pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)),
                pa.scalar(0.0, pa.float64()),
            )
            dy = pc.max_element_wise(
                pc.subtract(pc.multiply(n, syy), pc.multiply(sy, sy)),
                pa.scalar(0.0, pa.float64()),
            )
            if fn in ("slope", "intercept"):
                ok = pc.and_(
                    pc.greater(npair, pa.scalar(1, pa.int64())),
                    pc.greater(dx, pa.scalar(0.0, pa.float64())),
                )
                slope = pc.divide(
                    num, pc.if_else(ok, dx, pa.scalar(1.0, pa.float64()))
                )
                if fn == "slope":
                    v = pc.if_else(ok, slope, pa.scalar(None, pa.float64()))
                else:
                    v = pc.if_else(
                        ok,
                        pc.divide(
                            pc.subtract(sy, pc.multiply(slope, sx)), n
                        ),
                        pa.scalar(None, pa.float64()),
                    )
            elif fn == "covar":
                v = pc.divide(
                    pc.subtract(sxy, pc.divide(pc.multiply(sx, sy), n)),
                    pc.subtract(n, pa.scalar(1.0, pa.float64())),
                )
                v = pc.if_else(
                    pc.greater(npair, pa.scalar(1, pa.int64())),
                    v,
                    pa.scalar(None, pa.float64()),
                )
            else:
                den = pc.sqrt(pc.multiply(dx, dy))
                ok = pc.and_(
                    pc.greater(npair, pa.scalar(1, pa.int64())),
                    pc.greater(den, pa.scalar(0.0, pa.float64())),
                )
                v = pc.if_else(
                    ok,
                    pc.divide(
                        num, pc.if_else(ok, den, pa.scalar(1.0, pa.float64()))
                    ),
                    pa.scalar(None, pa.float64()),
                )
        else:
            raise ValueError(fn)
        if round_to is not None and pa.types.is_floating(v.type):
            v = round_like_duckdb(v, round_to)
        cols[out_name] = v
    return cols


def _merge_partials(partial_ds, keys: list[str], specs: list[Spec],
                    num_partitions: int):
    """Exchange + merge a Dataset of partial-moment rows (the layout
    :func:`_partial_fn` emits) down to one state row per key.  Shared by
    :func:`grouped_agg` (inline) and the incremental-view path
    (:func:`agg_state` / :func:`merge_agg_state`)."""
    from ..state.exchange import hash_exchange

    def with_bucket(batch: pa.Table) -> pa.Table:
        if "__bucket" in batch.column_names:
            return batch
        return batch.append_column(
            "__bucket", pa.array(bucket_codes(batch, keys, num_partitions))
        )

    partial_ds = partial_ds.map_batches(
        with_bucket, batch_format="pyarrow", batch_size=None
    )

    # merge partials per hash partition: sum the sums/counts, min the mins, ...
    sum_cols, min_cols, max_cols = _merge_cols(specs)
    rename = (
        {f"{c}_sum": c for c in sum_cols}
        | {f"{c}_min": c for c in min_cols}
        | {f"{c}_max": c for c in max_cols}
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            # every upstream block of this partition was empty AND
            # schema-less (Ray Data skips map UDFs on empty blocks) — only
            # possible when the whole input dataset is empty; pass through
            # rather than crash the group_by on missing key columns.
            return t
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        plan = (
            [(c, "sum") for c in sum_cols]
            + [(c, "min") for c in min_cols]
            + [(c, "max") for c in max_cols]
        )
        out = null_safe_group_by(t, keys, plan)
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    return hash_exchange(
        partial_ds,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=merge,
        reduce_empty=True,
    )


def grouped_agg(ds, keys: list[str] | str, specs: list[Spec], *,
                round_to: int | None = None, num_partitions: int | None = None,
                sum_as_float: bool = True):
    """Partial-combine grouped aggregation (see module docstring).

    Semantics note: the ``count`` kind is SQL ``COUNT(*)`` (rows per
    group), NOT ``COUNT(col)`` — for non-null counts, sum an
    ``is_valid`` int flag column (see ``q_union_by_name_events``).
    ``sum``/``mean``/``min``/``max`` and the moment kinds ignore NULLs
    like their SQL counterparts.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()
    partial = _partial_fn(keys, specs)

    partial_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    aggregated = _merge_partials(partial_ds, keys, specs, num_partitions)

    def finalize(batch: pa.Table) -> pa.Table:
        cols: dict[str, object] = {k: batch.column(k) for k in keys}
        cols |= _derived_columns(batch, specs, round_to, sum_as_float)
        return pa.table(cols)

    return aggregated.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def agg_state(ds, keys: list[str] | str, specs: list[Spec], *,
              num_partitions: int | None = None):
    """Mergeable aggregate STATE: one partial-moment row per key (counts,
    Σx, Σx², mins, maxes — whatever ``specs`` need), NOT the finished
    values.  This is the materialized-view form of :func:`grouped_agg`:
    persist it (plain parquet), fold new data in with
    :func:`merge_agg_state`, and render results any time with
    :func:`finalize_agg_state` — no rescan of history, ever.  Any spec
    family grouped_agg supports works except exact quantiles (swap in the
    t-digest sketch for those).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()
    partial_ds = ds.map_batches(
        _partial_fn(keys, specs), batch_format="pyarrow", batch_size=None
    )
    return _merge_partials(partial_ds, keys, specs, num_partitions)


def merge_agg_state(states, keys: list[str] | str, specs: list[Spec], *,
                    deltas=(), num_partitions: int | None = None):
    """Fold aggregate states together, optionally absorbing raw-row
    ``deltas``: each delta runs the map-side partial combiner, then ONE
    exchange merges everything — cost is O(|states| + |delta groups|),
    independent of the history the states summarize."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()
    states = list(states)
    partial = _partial_fn(keys, specs)
    parts = states + [
        d.map_batches(partial, batch_format="pyarrow", batch_size=None)
        for d in deltas
    ]
    u = parts[0]
    for other in parts[1:]:
        u = u.union(other)
    return _merge_partials(u, keys, specs, num_partitions)


def finalize_agg_state(state_ds, keys: list[str] | str, specs: list[Spec], *,
                       round_to: int | None = None, sum_as_float: bool = True):
    """Render an aggregate state (from :func:`agg_state` /
    :func:`merge_agg_state`) into final values — identical output to
    running :func:`grouped_agg` over all the data the state absorbed."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        if "__bucket" in batch.column_names:
            batch = batch.drop_columns(["__bucket"])
        cols: dict[str, object] = {k: batch.column(k) for k in keys}
        cols |= _derived_columns(batch, specs, round_to, sum_as_float)
        return pa.table(cols)

    return state_ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def grouped_agg_sets(ds, keys: list[str] | str, specs: list[Spec], *,
                     sets: list[list[str]] | None = None,
                     round_to: int | None = None, num_partitions: int | None = None,
                     sum_as_float: bool = True,
                     grouping_id: str | None = "grouping_id"):
    """GROUP BY GROUPING SETS / ROLLUP / CUBE in ONE pass over the data.

    ``sets`` is a list of key subsets (keep ``keys`` order); the default is
    the ROLLUP lattice ``[keys, keys[:-1], ..., []]``.  The map side runs
    the finest-grain partial combiner once per batch (same as
    :func:`grouped_agg`), then derives every coarser set's partial by
    re-aggregating those ≤|groups| partial rows — the raw data is scanned
    once and the single exchange carries Σ|set groups| rows per block, not
    |rows|·|sets|.  Rolled-up key columns come back NULL (SQL semantics);
    ``grouping_id`` names an output column carrying the SQL ``GROUPING()``
    bitmask (first key = most significant bit), which disambiguates a
    rolled-up NULL from a genuine NULL key value.  Pass ``grouping_id=None``
    to omit it.

    Divergence from SQL: on a fully EMPTY input SQL still emits one
    global-aggregate row for the ``()`` set; this returns 0 rows.
    """
    import numpy as np

    from ..state.exchange import hash_exchange

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()
    if sets is None:
        sets = [keys[:i] for i in range(len(keys), -1, -1)]
    sets = [list(s) for s in sets]
    for s in sets:
        unknown = [k for k in s if k not in keys]
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns {unknown}")

    partial = _partial_fn(keys, specs)
    sum_cols, min_cols, max_cols = _merge_cols(specs)
    replan = (
        [(c, "sum") for c in sum_cols]
        + [(c, "min") for c in min_cols]
        + [(c, "max") for c in max_cols]
    )
    rename = (
        {f"{c}_sum": c for c in sum_cols}
        | {f"{c}_min": c for c in min_cols}
        | {f"{c}_max": c for c in max_cols}
    )
    part_cols = sum_cols + min_cols + max_cols
    masks = np.array(
        [
            sum(
                1 << (len(keys) - 1 - i)
                for i, k in enumerate(keys)
                if k not in s
            )
            for s in sets
        ],
        np.int64,
    )

    def partial_sets(batch: pa.Table) -> pa.Table:
        fin = partial(batch)
        outs = []
        for si, s in enumerate(sets):
            if s == keys:
                t = fin
            else:
                if s:
                    t = null_safe_group_by(fin, s, replan)
                else:
                    tmp = fin.append_column(
                        "__all", pa.array(np.zeros(fin.num_rows, np.int8))
                    )
                    t = tmp.group_by(["__all"]).aggregate(replan)
                    t = t.drop_columns(["__all"])
                t = t.rename_columns([rename.get(c, c) for c in t.column_names])
                for k in keys:
                    if k not in s:
                        t = t.append_column(
                            k, pa.nulls(t.num_rows, batch.schema.field(k).type)
                        )
            t = t.select(keys + part_cols)
            t = t.append_column("__set", pa.array(np.full(t.num_rows, si, np.int64)))
            outs.append(t)
        out = pa.concat_tables(outs)
        return out.append_column(
            "__bucket",
            pa.array(bucket_codes(out, keys + ["__set"], num_partitions)),
        )

    partial_ds = ds.map_batches(partial_sets, batch_format="pyarrow", batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        # NULL keys (rolled-up levels AND genuine null key values) need the
        # null-safe grouper; __set keeps distinct sets from collapsing
        out = null_safe_group_by(t, keys + ["__set"], replan)
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    aggregated = hash_exchange(
        partial_ds,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=merge,
        reduce_empty=True,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols: dict[str, object] = {k: batch.column(k) for k in keys}
        if grouping_id is not None:
            set_ids = batch.column("__set").to_numpy(zero_copy_only=False)
            cols[grouping_id] = pa.array(masks[set_ids], pa.int64())
        cols |= _derived_columns(batch, specs, round_to, sum_as_float)
        return pa.table(cols)

    return aggregated.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def global_topk(ds, sort_cols: list[str], k: int, *, descending: list[bool],
                empty_schema: pa.Table | None = None):
    """Global ORDER BY ... LIMIT k without a full distributed sort.

    Each block is cut to its local top-k (one Arrow sort), then a single
    reduce re-sorts the ≤ k·|blocks| survivors and takes the head — the
    same partial/merge shape as :func:`grouped_agg`.  Ray's ``Dataset.sort``
    ran its sample+sort shuffle in ~1.4 s for 20k rows on this box; this is
    sub-100 ms.  At 100 TB the merge input stays k·|blocks| rows.

    ``empty_schema``: 0-row table with the input schema, required when the
    whole upstream CAN be empty (Ray Data then skips every upstream UDF and
    the merge would otherwise see a schema-less 0-column block).
    """
    from ..state.exchange import hash_exchange

    spec = [
        (c, "descending" if d else "ascending") for c, d in zip(sort_cols, descending)
    ]

    def local_cut(b: pa.Table) -> pa.Table:
        out = b.sort_by(spec).slice(0, k) if b.num_rows > k else b
        return out.append_column(
            "__bucket", pa.array([0] * out.num_rows, pa.int64())
        )

    partials = ds.map_batches(local_cut, batch_format="pyarrow", batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_columns == 0 and empty_schema is not None:
            return empty_schema
        return t.sort_by(spec).slice(0, k)

    return hash_exchange(
        partials,
        bucket_col="__bucket",
        n_partitions=1,
        reduce_fn=merge,
        reduce_empty=True,
        empty_base=empty_schema,
    )


def _key_run_bounds(t: pa.Table, keys: list[str]):
    """Boundaries of equal-key runs in a key-sorted table.

    Returns an int array ``[0, ..., num_rows]`` where consecutive entries
    delimit one group.  Uses per-block dictionary codes in a mixed-radix
    combine — injective per table, so adjacent-row inequality is exact.
    """
    import numpy as np

    codes = np.zeros(t.num_rows, np.int64)
    for c in keys:
        idx = t.column(c).combine_chunks().dictionary_encode().indices
        if idx.null_count:
            # null keys get their own code (dictionary indices are null
            # for null values; -1 then shift keeps them distinct)
            idx = pc.fill_null(idx, -1)
            arr = idx.to_numpy(zero_copy_only=False).astype(np.int64) + 1
        else:
            arr = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = codes * (int(arr.max()) + 1 if len(arr) else 1) + arr
    starts = np.zeros(t.num_rows, bool)
    starts[0] = True
    starts[1:] = codes[1:] != codes[:-1]
    return np.append(np.flatnonzero(starts), t.num_rows)


def grouped_map(ds, keys: list[str] | str, fn, *, num_partitions: int | None = None,
                per_group: bool = True, empty_schema: pa.Table | None = None):
    """Drop-in replacement for ``ds.groupby(keys).map_groups(fn)`` built on
    the explicit hash exchange (no sample+sort shuffle).

    Partials are bucketed by ``hash(keys) % P``; each reduce sorts its
    partition by the keys once and applies ``fn`` to every equal-key run.
    ``fn`` MUST be empty-safe: ``fn(0-row table)`` has to return a 0-row
    table with the output schema (it is called on empty partitions so all
    output blocks share a schema).  Outputs are concatenated per partition.

    ``per_group=False`` hands ``fn`` the whole key-sorted partition instead
    (all of a key's rows are contiguous; find runs with
    :func:`_key_run_bounds`).  Use it when groups are numerous and tiny —
    a vectorized partition-level kernel beats thousands of per-group calls.

    ``empty_schema``: 0-row table with the expected INPUT schema.  When the
    whole upstream dataset is empty, Ray Data has skipped every map UDF
    (including this operator's bucket tagger), so partitions arrive as
    schema-less 0-column tables; ``fn`` then runs on ``empty_schema``
    instead, keeping the output schema stable for pass-through reducers.
    """
    from ..state.exchange import hash_exchange

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__bucket", pa.array(bucket_codes(b, keys, num_partitions))
        )

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)

    def reduce_part(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return fn(t)
        t = t.sort_by([(k, "ascending") for k in keys])
        if not per_group:
            return fn(t)
        bounds = _key_run_bounds(t, keys)
        outs = [
            fn(t.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(bounds) - 1)
        ]
        outs = [o for o in outs if o is not None and o.num_rows]
        if not outs:
            return fn(t.slice(0, 0))
        return pa.concat_tables(outs, promote_options="default")

    # size-based plan choice: below the cutoff apply the SAME reduce
    # kernel to the whole (collected) table instead of a P-way exchange —
    # semantically the num_partitions=1 case, minus the fixed cost every
    # small grouped operator was paying.  The cutoff must stay SMALL: the
    # local kernel runs serially, so it only wins while kernel time is
    # well under the exchange's ~0.5 s fixed cost (measured: 100k rows ok,
    # 2M rows regressed pair-heavy queries 2-4x).  The tagged dataset is
    # materialized first either way (hash_exchange does it internally),
    # so the count is a metadata read and no extra copy is made.
    # GRAFT_GROUPED_LOCAL_MAX=0 forces the exchange.
    import os as _os

    import ray

    local_max = int(_os.environ.get("GRAFT_GROUPED_LOCAL_MAX", "20000"))
    tagged = tagged.materialize()
    if tagged.count() <= local_max:
        tables = [t for t in ray.get(tagged.to_arrow_refs()) if t.num_rows]
        if tables:
            t = pa.concat_tables(tables, promote_options="default")
            if t.column("__bucket").num_chunks > 1:
                t = t.combine_chunks()
        else:
            t = empty_schema if empty_schema is not None else pa.table({})
            if "__bucket" in t.column_names:
                t = t.drop_columns(["__bucket"])
        return ray.data.from_arrow(reduce_part(t))

    return hash_exchange(
        tagged,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
        empty_base=empty_schema,
    )


def grouped_map_salted(ds, keys: list[str] | str, partial_fn, merge_fn, *,
                       salt: int = 8, salt_cols: list[str] | None = None,
                       num_partitions: int | None = None,
                       empty_schema: pa.Table | None = None):
    """Skew-safe :func:`grouped_map` for DECOMPOSABLE kernels.

    A hot key funnels all its rows into one reduce slot under plain
    ``grouped_map``; when the kernel decomposes into a mergeable partial
    (counts, sums, top-k, distinct sets, sketches — NOT order-dependent
    kernels like sessionize), salting bounds any slot's input:

    phase 1 groups by ``(keys, salt)`` with ``salt = hash(salt_cols) % salt``
    (default: all non-key columns — deterministic, no RNG), so a hot key's
    rows spread across ``salt`` subgroups and ``partial_fn`` sees at most
    ``rows(key)/salt`` rows (in expectation); phase 2 regroups the ≤``salt``
    partial rows per key and ``merge_fn`` combines them.  Both phases ride
    the explicit hash exchange; phase 2's input is |keys|·salt rows total.

    ``partial_fn(group) -> Table`` must echo the key columns;
    ``merge_fn(group) -> Table`` combines one key's partials.
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_salt(b: pa.Table) -> pa.Table:
        cols = salt_cols or [c for c in b.column_names if c not in keys]
        s = (
            bucket_codes(b, cols, salt)
            if cols
            else np.zeros(b.num_rows, np.int64)
        )
        return b.append_column("__salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)

    def partial_wrap(g: pa.Table) -> pa.Table:
        if "__salt" in g.column_names:
            g = g.drop_columns(["__salt"])
        return partial_fn(g)

    salted_empty = None
    if empty_schema is not None:
        salted_empty = empty_schema.append_column(
            "__salt", pa.array([], pa.int64())
        )
    partials = grouped_map(
        salted, keys + ["__salt"], partial_wrap,
        num_partitions=num_partitions, empty_schema=salted_empty,
    )
    return grouped_map(
        partials, keys, merge_fn, num_partitions=num_partitions,
    )


def grouped_quantiles(ds, keys: list[str] | str, col: str,
                      quantiles: list[tuple[str, float]], *, round_to: int = 2,
                      interpolation: str = "cont"):
    """EXACT per-group quantiles (linear interpolation, = SQL quantile_cont).

    ``interpolation="disc"`` switches to SQL ``quantile_disc`` /
    ``percentile_disc`` semantics: the smallest actual value whose
    cumulative share ≥ q (``sorted[ceil(q·n) − 1]``) — no interpolation,
    so the result is always an observed value.

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
        if interpolation == "disc":
            idx = max(0, int(np.ceil(q * len(sorted_vals))) - 1)
            return float(sorted_vals[idx])
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
        # DuckDB quantile_cont ignores NULLs; drop them before sorting
        arr = group.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        vals = np.sort(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        out: dict[str, object] = {k: [group.column(k)[0].as_py()] for k in keys}
        for name, q in quantiles:
            out[name] = [round_half_away(quantile_cont(vals, q), round_to)]
        return pa.table(out)

    from ..state.exchange import hash_exchange

    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = project(b)
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def reduce_part(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            cols: dict[str, object] = {
                k: pa.array([], t.schema.field(k).type) for k in keys
            }
            for name, _ in quantiles:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        t = t.sort_by([(k, "ascending") for k in keys])
        bounds = _key_run_bounds(t, keys)
        return pa.concat_tables(
            fold(t.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(bounds) - 1)
        )

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow", batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def grouped_robust_outliers(ds, keys: list[str] | str, col: str, *,
                            scale: float = 4.4478, round_to: int = 6):
    """Per-group robust (median / MAD) outlier report.

    For each group: ``n`` = COUNT(*), exact median ``med``, exact median
    absolute deviation ``mad_v`` (DuckDB ``mad()``: the interpolated median
    of |x − med|), and ``n_outliers`` = rows with ``|x − med| > scale ·
    mad_v`` (default scale 4.4478 = 3 robust z-scores · the 1.4826 normal
    consistency constant).  The robust alternative to mean/stddev outlier
    cuts — a contaminated tail cannot drag its own threshold.

    Same shape as :func:`grouped_quantiles` (exact order statistics need
    each group's values co-located): project map-side, one hash exchange,
    vectorized per-group fold.  NULL values are ignored for med/MAD/outlier
    counting but still count in ``n``, matching SQL COUNT(*) vs aggregate
    NULL semantics.
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)

    def quantile_cont(sorted_vals: "np.ndarray", q: float) -> float:
        pos = q * (len(sorted_vals) - 1)
        f = int(np.floor(pos))
        c = int(np.ceil(pos))
        if f == c:
            return float(sorted_vals[f])
        return float(sorted_vals[f] * (c - pos) + sorted_vals[c] * (pos - f))

    def round_half_away(x: float, nd: int) -> float:
        s = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * s + 0.5), x) / s)

    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = b.select(keys + [col])
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 "n": pa.array([], pa.int64()),
                 "med": pa.array([], pa.float64()),
                 "mad_v": pa.array([], pa.float64()),
                 "n_outliers": pa.array([], pa.int64())}
            )
        t = t.sort_by([(k, "ascending") for k in keys])
        bounds = _key_run_bounds(t, keys)
        rows: dict[str, list] = {k: [] for k in keys}
        rows.update(n=[], med=[], mad_v=[], n_outliers=[])
        full = t.column(col).combine_chunks()
        for i in range(len(bounds) - 1):
            g = t.slice(bounds[i], bounds[i + 1] - bounds[i])
            arr = full.slice(bounds[i], bounds[i + 1] - bounds[i])
            vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            med = quantile_cont(np.sort(vals), 0.5)
            dev = np.abs(vals - med)
            mad = quantile_cont(np.sort(dev), 0.5)
            for k in keys:
                rows[k].append(g.column(k)[0].as_py())
            rows["n"].append(g.num_rows)
            rows["med"].append(round_half_away(med, round_to))
            rows["mad_v"].append(round_half_away(mad, round_to))
            rows["n_outliers"].append(int(np.count_nonzero(dev > scale * mad)))
        return pa.table(
            {**{k: pa.array(rows[k], t.schema.field(k).type) for k in keys},
             "n": pa.array(rows["n"], pa.int64()),
             "med": pa.array(rows["med"], pa.float64()),
             "mad_v": pa.array(rows["mad_v"], pa.float64()),
             "n_outliers": pa.array(rows["n_outliers"], pa.int64())}
        )

    from ..state.exchange import hash_exchange

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def grouped_topk(ds, keys: list[str] | str, order_col: str, k: int, *,
                 descending: bool = True, tiebreak: list[str] | None = None,
                 with_ties: bool = False):
    """Top-k rows per group (SQL ``row_number() OVER (PARTITION BY keys
    ORDER BY order_col [DESC], tiebreak) <= k``).

    Map-side combine first: each batch is cut to ≤ k rows per in-batch
    group (vectorized sort + rank, no Python loop), so the single groupby
    shuffle moves at most k·|groups| rows per block — the same
    partial-then-merge shape as :func:`grouped_agg`.  ``tiebreak`` columns
    (ascending) make the cut deterministic; pass enough columns to break
    all ties or results are only set-stable, not row-stable.

    ``with_ties=True`` switches to SQL ``rank() <= k`` / ``FETCH FIRST k
    WITH TIES`` semantics: every row tying the k-th order value survives
    (don't combine with ``tiebreak``).  The map-side cut stays safe
    because an in-batch rank > k already implies ≥ k strictly better rows
    globally; the shuffle then carries k + ties rows per group.
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
        # rows are key-sorted, so each group is one run; rank = offset in run
        bounds = _key_run_bounds(t, keys)
        starts = np.zeros(t.num_rows, bool)
        starts[bounds[:-1]] = True
        run_id = np.cumsum(starts) - 1
        if with_ties:
            # min-rank of each row's peer run (rows equal on order_col)
            ov = t.column(order_col).to_numpy(zero_copy_only=False)
            peer_start = starts.copy()
            peer_start[1:] |= ov[1:] != ov[:-1]
            ps = np.flatnonzero(peer_start)
            peer_lens = np.diff(np.append(ps, t.num_rows))
            rank = np.repeat(ps, peer_lens) - bounds[run_id]
        else:
            rank = np.arange(t.num_rows) - bounds[run_id]
        return t.filter(pa.array(rank < k))

    from ..state.exchange import hash_exchange

    num_partitions = default_partitions(small=True)

    def partial_with_bucket(b: pa.Table) -> pa.Table:
        out = topk_within(b)
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    partials = ds.map_batches(partial_with_bucket, batch_format="pyarrow", batch_size=None)

    return hash_exchange(
        partials,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=lambda t: topk_within(t.drop_columns(["__bucket"])),
        reduce_empty=True,
    )


def grouped_count_distinct(ds, keys: list[str] | str, col: str | list[str],
                           out_name: str = "n_distinct", *,
                           num_partitions: int | None = None):
    """Exact per-group ``COUNT(DISTINCT col)`` — shuffle sized by distinct
    pairs, skew-proof for hot groups.

    Map side dedups ``(keys, col)`` pairs per batch (the exchange carries
    distinct pairs, not rows) and buckets by the hash of the FULL pair, so a
    hot group's distinct values spread across every partition instead of
    converging on one reducer.  After the pair exchange each surviving pair
    exists exactly once globally, so a per-partition count per key is a
    valid partial count; a second, tiny exchange (≤ |groups| × partitions
    rows) sums the partials.  ``col`` may be a LIST of columns —
    ``COUNT(DISTINCT (a, b))`` — counting rows where no counted column is
    NULL.  Single-column NULL values are not counted (SQL semantics); NULL
    keys group together (via :func:`null_safe_group_by`).

    The reference has no aggregates (SURVEY.md §2.5) — this is the from-
    scratch design for e.g. distinct-subject counts per predicate at 100 TB.
    """
    from ..state.exchange import hash_exchange

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = num_partitions or default_partitions()
    cols = [col] if isinstance(col, str) else list(col)
    pair_cols = keys + cols

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(pair_cols)
        for c in cols:
            t = t.filter(pc.is_valid(t.column(c)))
        t = null_safe_group_by(t, pair_cols, [])
        return t.append_column(
            "__bucket", pa.array(bucket_codes(t, pair_cols, num_partitions))
        )

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)

    def count_partial(t: pa.Table) -> pa.Table:
        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        t = null_safe_group_by(t, pair_cols, [])  # global dedup (one owner partition per pair)
        out = null_safe_group_by(t, keys, [(cols[0], "count")])
        return out.rename_columns(
            [("__partial" if c == f"{cols[0]}_count" else c) for c in out.column_names]
        )

    partials = hash_exchange(
        pairs,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=count_partial,
        reduce_empty=True,
    )
    return grouped_agg(
        partials, keys, [(out_name, "__partial", "sum")],
        num_partitions=min(num_partitions, 8), sum_as_float=False,
    )


def fixed_width_histogram(ds, col: str, width: float, *, origin: float = 0.0,
                          bucket_name: str = "bucket",
                          num_partitions: int | None = None, round_to: int | None = 2):
    """Fixed-width histogram: ``bucket = floor((col − origin) / width)`` plus
    per-bucket count and observed min/max.

    Pure map-side binning followed by one small :func:`grouped_agg` exchange
    (≤ |buckets| rows per block) — the classic scale-friendly histogram: no
    sort, no sample pass, deterministic bucket ids.  Output columns:
    ``bucket`` (int64), ``n`` (count), ``lo`` / ``hi`` (min/max of ``col``).
    """
    def bucketize(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(col), pa.float64())
        bk = pc.floor(
            pc.divide(pc.subtract(x, pa.scalar(float(origin))), pa.scalar(float(width)))
        )
        return b.append_column(bucket_name, pc.cast(bk, pa.int64()))

    binned = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
    return grouped_agg(
        binned, bucket_name,
        [("n", col, "count"), ("lo", col, "min"), ("hi", col, "max")],
        num_partitions=num_partitions, round_to=round_to,
    )


def grouped_collect(ds, keys: list[str] | str, col: str, *,
                    order_by: list[str] | str, out_name: str = "collected",
                    sep: str = ",", as_list: bool = False,
                    num_partitions: int | None = None):
    """Ordered per-group collect: SQL ``string_agg(col, sep ORDER BY ...)``
    (or ``array_agg`` with ``as_list=True``).

    One keyed exchange; the reduce sorts each partition once by
    ``keys + order_by`` and builds every group's list in a single
    vectorized pass (a ListArray assembled from the key-run offsets, then
    ``pc.binary_join`` for the string form) — no per-group Python calls.
    Same partitioning assumption as all ordered per-key operators: one
    key's rows co-locate; the collected value is O(group size), so this is
    for human-scale groups (samples, lineage traces) — use an aggregate,
    not a collect, for unbounded groups.
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: pa.array([], t.schema.field(k).type) if k in t.column_names
                    else pa.array([], pa.string()) for k in keys}
            typ = (pa.list_(t.schema.field(col).type)
                   if as_list and col in t.column_names else
                   (pa.list_(pa.string()) if as_list else pa.string()))
            cols[out_name] = pa.array([], typ)
            return pa.table(cols)
        t = t.sort_by([(k, "ascending") for k in keys]
                      + [(o, "ascending") for o in order_by])
        bounds = _key_run_bounds(t, keys)
        values = t.column(col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not as_list:
            values = pc.cast(values, pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(np.asarray(bounds), pa.int32()), values
        )
        out_cols = {k: t.column(k).take(pa.array(bounds[:-1])) for k in keys}
        if as_list:
            out_cols[out_name] = lists
        else:
            out_cols[out_name] = pc.binary_join(lists, sep)
        return pa.table(out_cols)

    return grouped_map(ds, keys, part, per_group=False,
                       num_partitions=num_partitions)


def corr_matrix(ds, cols: list[str], *, round_to: int = 6,
                num_partitions: int | None = None):
    """All pairwise Pearson correlations over ``cols`` in ONE pass.

    Per batch: cast to a float64 matrix, pairwise-complete masks (a pair's
    moments use only rows where BOTH columns are non-null, matching SQL
    ``corr``), one partial row per (i<j) pair with mergeable moments
    (n, Σx, Σy, Σx², Σy², Σxy).  The exchange then carries p·(p−1)/2 rows
    per block regardless of input size; finalize applies the same
    DuckDB-matched formula as the ``corr`` kind of :func:`grouped_agg`
    (NULL when n ≤ 1 or a variance is 0).  Long-format output:
    ``(col_a, col_b, corr_v, n_pairs)``.
    """
    pairs = [(cols[i], cols[j]) for i in range(len(cols))
             for j in range(i + 1, len(cols))]
    a_names = pa.array([a for a, _ in pairs], pa.string())
    b_names = pa.array([b for _, b in pairs], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        mat = np.column_stack(
            [
                pc.cast(batch.column(c), pa.float64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                for c in cols
            ]
        ) if batch.num_rows else np.empty((0, len(cols)))
        valid = ~np.isnan(mat)
        out = {"col_a": a_names, "col_b": b_names}
        n_l, sx_l, sy_l, sxx_l, syy_l, sxy_l = [], [], [], [], [], []
        for i, j in [(cols.index(a), cols.index(b)) for a, b in pairs]:
            m = valid[:, i] & valid[:, j]
            x, y = mat[m, i], mat[m, j]
            n_l.append(len(x))
            sx_l.append(x.sum()); sy_l.append(y.sum())
            sxx_l.append((x * x).sum()); syy_l.append((y * y).sum())
            sxy_l.append((x * y).sum())
        out.update(
            n=pa.array(n_l, pa.int64()),
            sx=pa.array(sx_l, pa.float64()), sy=pa.array(sy_l, pa.float64()),
            sxx=pa.array(sxx_l, pa.float64()), syy=pa.array(syy_l, pa.float64()),
            sxy=pa.array(sxy_l, pa.float64()),
        )
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = grouped_agg(
        partials, ["col_a", "col_b"],
        [("n", "n", "sum"), ("sx", "sx", "sum"), ("sy", "sy", "sum"),
         ("sxx", "sxx", "sum"), ("syy", "syy", "sum"), ("sxy", "sxy", "sum")],
        num_partitions=num_partitions, sum_as_float=False,
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        sx, sy = b.column("sx"), b.column("sy")
        sxx, syy, sxy = b.column("sxx"), b.column("syy"), b.column("sxy")
        num = pc.subtract(pc.multiply(n, sxy), pc.multiply(sx, sy))
        dx = pc.max_element_wise(
            pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)),
            pa.scalar(0.0, pa.float64()),
        )
        dy = pc.max_element_wise(
            pc.subtract(pc.multiply(n, syy), pc.multiply(sy, sy)),
            pa.scalar(0.0, pa.float64()),
        )
        ok = pc.and_(
            pc.greater(n, pa.scalar(1.0)),
            pc.and_(pc.greater(dx, pa.scalar(0.0)), pc.greater(dy, pa.scalar(0.0))),
        )
        denom = pc.sqrt(pc.multiply(dx, dy))
        r = pc.divide(num, pc.if_else(ok, denom, pa.scalar(1.0)))
        r = pc.if_else(ok, r, pa.scalar(None, pa.float64()))
        return pa.table(
            {
                "col_a": b.column("col_a"),
                "col_b": b.column("col_b"),
                "corr_v": round_like_duckdb(r, round_to),
                "n_pairs": pc.cast(b.column("n"), pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_weighted_quantiles(ds, keys: list[str] | str, col: str,
                               weight_col: str,
                               quantiles: list[tuple[str, float]], *,
                               round_to: int = 2):
    """EXACT per-group weighted quantiles: the smallest value whose
    cumulative weight share reaches q — i.e. ``min(x) FILTER (WHERE
    cum_w >= q * total_w)`` over the value-ordered group, the SQL-window
    formulation.  The lower weighted quantile (always an observed value);
    weights must be non-negative.

    Same co-location shape as :func:`grouped_quantiles` (exact order
    statistics need the group's values together): project map-side, one
    hash exchange, then per-group one sort + cumsum + searchsorted.  For
    integer-valued double weights (counts, quantities) the cumulative sums
    are exact, so the threshold comparison matches SQL bit-for-bit
    regardless of tie order.
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = b.select(keys + [col, weight_col])
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def round_half_away(x: float, nd: int) -> float:
        s = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * s + 0.5), x) / s)

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 **{name: pa.array([], pa.float64()) for name, _ in quantiles}}
            )
        t = t.sort_by([(k, "ascending") for k in keys] + [(col, "ascending")])
        bounds = _key_run_bounds(t, keys)
        vals = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        wts = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        rows: dict[str, list] = {k: [] for k in keys}
        rows.update({name: [] for name, _ in quantiles})
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            cw = np.cumsum(wts[s:e])
            tw = cw[-1]
            for name, q in quantiles:
                idx = int(np.searchsorted(cw, q * tw, side="left"))
                rows[name].append(
                    round_half_away(float(vals[s + min(idx, e - s - 1)]), round_to)
                )
            for k in keys:
                rows[k].append(t.column(k)[s].as_py())
        return pa.table(
            {**{k: pa.array(rows[k], t.schema.field(k).type) for k in keys},
             **{name: pa.array(rows[name], pa.float64()) for name, _ in quantiles}}
        )

    from ..state.exchange import hash_exchange

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def _fractional_ranks(ds, col: str, out_name: str):
    """(value → tie-averaged SQL rank) table for one column, distributed.

    Fractional (average) rank of value v = |rows < v| + (|rows = v| + 1)/2,
    the ``rank() + (peer_count − 1)/2`` identity.  Computed WITHOUT ranking
    raw rows: one grouped count per distinct value, a range sort of the
    |distinct| table, then :func:`~pyjelly_ray.stages.sort.global_prefix_sums`
    (per-block cumsum + O(blocks) driver offsets) — the full table is never
    globally sorted.
    """
    from .sort import global_prefix_sums, range_sort

    cnts = grouped_agg(ds, [col], [("__cnt", col, "count")])
    s = range_sort(cnts, col)
    p = global_prefix_sums(s, "__cnt", out_name="__below", exclusive=True)

    def fin(b: pa.Table) -> pa.Table:
        import numpy as np

        below = b.column("__below").to_numpy(zero_copy_only=False)
        cnt = b.column("__cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            col: b.column(col),
            out_name: pa.array(below + (cnt + 1.0) / 2.0, pa.float64()),
        })

    return p.map_batches(fin, batch_format="pyarrow")


def spearman_corr(ds, x_col: str, y_col: str, *, out_name: str = "spearman",
                  round_to: int = 6):
    """Spearman rank correlation of two columns = Pearson correlation of
    their tie-averaged ranks, distributed end-to-end:

    1. fractional ranks per column (:func:`_fractional_ranks` — shuffles
       only |distinct| rows per column);
    2. two hash joins attach ranks back to the pair rows;
    3. one mergeable-moment ``corr`` aggregate (same machinery as the
       correlation matrix).

    Rows with a NULL in either column are excluded (SQL ``corr``
    semantics).  Returns a 1-row Dataset ``{out_name}``.
    """
    from .joins import hash_join

    def project(b: pa.Table) -> pa.Table:
        return b.select([x_col, y_col]).drop_null()

    base = ds.map_batches(project, batch_format="pyarrow")

    # size-based plan choice (same pattern as the graph operators): the
    # five fixed-cost exchanges below exist for pair tables too big for
    # one machine; under the cutoff compute the identical ranks + raw-
    # moment corr locally.  Ordering/ties are decided with Arrow compare
    # on the ORIGINAL values (no float cast — decimal ties must match the
    # distributed path).  GRAFT_CORR_LOCAL_MAX=0 forces distributed.
    import os as _os

    local_max = int(_os.environ.get("GRAFT_CORR_LOCAL_MAX", "2000000"))
    n_rows = base.count()
    if 0 < n_rows <= local_max:
        import math

        import numpy as np
        import ray

        t = pa.concat_tables(
            list(base.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )

        def franks(col) -> np.ndarray:
            col = col.combine_chunks()
            order = pc.sort_indices(col).to_numpy(zero_copy_only=False)
            sv = col.take(pa.array(order))
            neq = pc.not_equal(sv.slice(1), sv.slice(0, len(sv) - 1))
            starts = np.concatenate(
                [[True], neq.to_numpy(zero_copy_only=False).astype(bool)]
            )
            run_id = np.cumsum(starts) - 1
            counts = np.bincount(run_id).astype(np.float64)
            below = np.cumsum(counts) - counts
            avg = below + (counts + 1.0) / 2.0  # == _fractional_ranks
            r = np.empty(len(sv), np.float64)
            r[order] = avg[run_id]
            return r

        rxv = franks(t.column(x_col))
        ryv = franks(t.column(y_col))
        n = float(n_rows)
        sx, sy = rxv.sum(), ryv.sum()
        sxx, syy, sxy = (rxv * rxv).sum(), (ryv * ryv).sum(), (rxv * ryv).sum()
        dx = max(n * sxx - sx * sx, 0.0)
        dy = max(n * syy - sy * sy, 0.0)
        if n_rows <= 1 or dx == 0.0 or dy == 0.0:
            val = None
        else:
            val = (n * sxy - sx * sy) / math.sqrt(dx * dy)
        arr = pa.array([val], pa.float64())
        if round_to is not None:
            arr = round_like_duckdb(arr, round_to)
        return ray.data.from_arrow(pa.table({out_name: arr}))

    rx = _fractional_ranks(base, x_col, "__rx")
    ry = _fractional_ranks(base, y_col, "__ry")
    j1 = hash_join(base, rx, left_key=x_col, right_key=x_col, how="inner")
    j2 = hash_join(j1, ry, left_key=y_col, right_key=y_col, how="inner")

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    out = grouped_agg(
        j2.map_batches(add_g, batch_format="pyarrow"),
        ["__g"], [(out_name, (  "__rx", "__ry"), "corr")], round_to=round_to,
    )
    return out.map_batches(
        lambda b: b.drop_columns(["__g"]), batch_format="pyarrow"
    )


def ab_welch_ttest(ds, group_col: str, variant_col: str, value_col: str, *,
                   variant_a: str = "A", variant_b: str = "B",
                   round_to: int = 6):
    """Per-group two-sample Welch t-test between two experiment variants.

    One mergeable-moment ``grouped_agg`` by ``(group, variant)`` collapses
    the raw stream to |groups|·2 rows (n, mean, sample variance — DuckDB
    ``var_samp`` semantics), then a tiny per-group kernel computes the
    Welch statistic ``(m_a − m_b)/√(v_a/n_a + v_b/n_b)`` and the
    Welch–Satterthwaite degrees of freedom.  Groups missing either variant
    are dropped (SQL inner-join semantics); t/df are NULL when either
    variance is NULL (n ≤ 1).  The experiment-readout primitive: raw data
    is touched exactly once regardless of group count.
    """

    g = grouped_agg(
        ds, [group_col, variant_col],
        [("n", value_col, "count"), ("m", value_col, "mean"),
         ("v", value_col, "var")],
    )

    def kernel(t: pa.Table) -> pa.Table:
        import numpy as np

        cols: dict[str, list] = {group_col: [], "n_a": [], "n_b": [],
                                 "mean_a": [], "mean_b": [],
                                 "t_welch": [], "df_welch": []}
        if t.num_rows:
            t = t.sort_by([(group_col, "ascending"),
                           (variant_col, "ascending")])
            bounds = _key_run_bounds(t, [group_col])
            for i in range(len(bounds) - 1):
                grp = t.slice(bounds[i], bounds[i + 1] - bounds[i])
                rows = {r[variant_col]: r for r in grp.to_pylist()}
                if variant_a not in rows or variant_b not in rows:
                    continue
                a, b = rows[variant_a], rows[variant_b]
                cols[group_col].append(a[group_col])
                cols["n_a"].append(a["n"])
                cols["n_b"].append(b["n"])
                cols["mean_a"].append(a["m"])
                cols["mean_b"].append(b["m"])
                if a["v"] is None or b["v"] is None:
                    cols["t_welch"].append(None)
                    cols["df_welch"].append(None)
                    continue
                se_a, se_b = a["v"] / a["n"], b["v"] / b["n"]
                se2 = se_a + se_b
                cols["t_welch"].append((a["m"] - b["m"]) / np.sqrt(se2))
                cols["df_welch"].append(
                    se2 ** 2 / (se_a ** 2 / (a["n"] - 1)
                                + se_b ** 2 / (b["n"] - 1))
                )
        key_type = t.schema.field(group_col).type
        out = pa.table({
            group_col: pa.array(cols[group_col], key_type),
            "n_a": pa.array(cols["n_a"], pa.int64()),
            "n_b": pa.array(cols["n_b"], pa.int64()),
            "mean_a": pa.array(cols["mean_a"], pa.float64()),
            "mean_b": pa.array(cols["mean_b"], pa.float64()),
            "t_welch": pa.array(cols["t_welch"], pa.float64()),
            "df_welch": pa.array(cols["df_welch"], pa.float64()),
        })
        if round_to is not None:
            for name in ("mean_a", "mean_b", "t_welch", "df_welch"):
                idx = out.column_names.index(name)
                out = out.set_column(
                    idx, name, round_like_duckdb(out.column(name), round_to))
        return out

    return grouped_map(g, group_col, kernel, per_group=False)


def mutual_information(ds, x_col: str, y_col: str, *,
                       out_name: str = "mi_nats", round_to: int = 6):
    """Exact mutual information (nats) between two categorical columns —
    the dependence screen behind feature selection and leakage detection.

    One COUNT grouped_agg by ``(x, y)`` collapses the stream to the
    contingency table (|x|·|y| rows); marginals and
    ``Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`` finalize in a single-partition
    kernel over that tiny table.  Returns a 1-row Dataset.
    """

    g = grouped_agg(ds, [x_col, y_col], [("n", x_col, "count")])

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return pa.table({out_name: pa.array([], pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        total = n.sum()
        xe = t.column(x_col)
        ye = t.column(y_col)
        _, xi = np.unique(xe.to_numpy(zero_copy_only=False), return_inverse=True)
        _, yi = np.unique(ye.to_numpy(zero_copy_only=False), return_inverse=True)
        nx = np.zeros(xi.max() + 1)
        ny = np.zeros(yi.max() + 1)
        np.add.at(nx, xi, n)
        np.add.at(ny, yi, n)
        mi = float(np.sum((n / total) * np.log((n * total) / (nx[xi] * ny[yi]))))
        s = 10.0 ** round_to
        mi = float(np.copysign(np.floor(abs(mi) * s + 0.5), mi) / s)
        return pa.table({out_name: pa.array([mi], pa.float64())})

    out = grouped_map(g.map_batches(add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(lambda b: b.select([out_name]),
                           batch_format="pyarrow")


def roc_auc(ds, score_col: str, label_col: str, *, out_name: str = "auc",
            round_to: int = 6):
    """Exact ROC-AUC of a score against a binary label (1 = positive) —
    the Mann–Whitney U identity with tie correction:
    ``AUC = (Σ_{y=1} frank(score) − n⁺(n⁺+1)/2) / (n⁺ · n⁻)`` where
    ``frank`` is the tie-averaged rank.

    Rides the same distributed fractional-rank machinery as
    :func:`spearman_corr` (|distinct score| shuffle + O(blocks) driver
    offsets), one hash join to attach ranks, one scalar aggregate.
    Rows with NULL score or label are excluded.  Returns a 1-row Dataset.
    """
    from .joins import hash_join

    def project(b: pa.Table) -> pa.Table:
        return b.select([score_col, label_col]).drop_null()

    base = ds.map_batches(project, batch_format="pyarrow")
    fr = _fractional_ranks(base, score_col, "__fr")
    j = hash_join(base, fr, left_key=score_col, right_key=score_col,
                  how="inner")

    def parts(b: pa.Table) -> pa.Table:
        import numpy as np

        y = b.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
        f = b.column("__fr").to_numpy(zero_copy_only=False)
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "fr_pos": pa.array(f * y, pa.float64()),
            "y": pa.array(y, pa.float64()),
        })

    g = grouped_agg(
        j.map_batches(parts, batch_format="pyarrow"), ["__g"],
        [("s_fr", "fr_pos", "sum"), ("n_pos", "y", "sum"),
         ("n_all", "y", "count")],
    )

    def fin(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table({out_name: pa.array([], pa.float64())})
        s_fr = b.column("s_fr")[0].as_py()
        n_pos = b.column("n_pos")[0].as_py()
        n_neg = b.column("n_all")[0].as_py() - n_pos
        if n_pos == 0 or n_neg == 0:
            return pa.table({out_name: pa.array([None], pa.float64())})
        auc = (s_fr - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
        s = 10.0 ** round_to
        auc = float(np.copysign(np.floor(abs(auc) * s + 0.5), auc) / s)
        return pa.table({out_name: pa.array([auc], pa.float64())})

    return g.map_batches(fin, batch_format="pyarrow")


def chi_square_independence(ds, x_col: str, y_col: str, *, round_to: int = 6):
    """Pearson chi-square test of independence for two categoricals:
    ``χ² = Σ (o − e)²/e`` with ``e = n_x·n_y/N``, plus the degrees of
    freedom ``(|x|−1)(|y|−1)`` — the drift/dependence screen paired with
    :func:`mutual_information`, from the same one-pass contingency
    grouped_agg and tiny single-partition finalize.  Returns a 1-row
    Dataset ``{chi2, df}``.
    """

    g = grouped_agg(ds, [x_col, y_col], [("n", x_col, "count")])

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return pa.table({"chi2": pa.array([], pa.float64()),
                             "df": pa.array([], pa.int64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        total = n.sum()
        _, xi = np.unique(t.column(x_col).to_numpy(zero_copy_only=False),
                          return_inverse=True)
        _, yi = np.unique(t.column(y_col).to_numpy(zero_copy_only=False),
                          return_inverse=True)
        nx = np.zeros(xi.max() + 1)
        ny = np.zeros(yi.max() + 1)
        np.add.at(nx, xi, n)
        np.add.at(ny, yi, n)
        # full |x|×|y| grid (zero-observed cells contribute e), tiny by
        # construction — the contingency table already fits one partition
        o = np.zeros((len(nx), len(ny)))
        o[xi, yi] = n
        e = np.outer(nx, ny) / total
        chi2 = float(np.sum((o - e) ** 2 / e))
        s = 10.0 ** round_to
        chi2 = float(np.copysign(np.floor(abs(chi2) * s + 0.5), chi2) / s)
        df = int((len(nx) - 1) * (len(ny) - 1))
        return pa.table({"chi2": pa.array([chi2], pa.float64()),
                         "df": pa.array([df], pa.int64())})

    out = grouped_map(g.map_batches(add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(lambda b: b.select(["chi2", "df"]),
                           batch_format="pyarrow")


def grouped_roc_auc(ds, keys: list[str] | str, score_col: str,
                    label_col: str, *, out_name: str = "auc",
                    round_to: int = 6):
    """Per-group ROC-AUC (tie-corrected Mann–Whitney), groups co-located
    like :func:`grouped_quantiles`: one hash exchange, then a vectorized
    in-group kernel — sort by score, peer-run average ranks, the rank-sum
    identity.  Single-class groups report NULL.  For GLOBAL AUC over a
    huge table use :func:`roc_auc` (fractional ranks without
    co-locating raw rows).
    """
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = b.select(keys + [score_col, label_col]).drop_null()
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def round_half_away(x: float, nd: int) -> float:
        s = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * s + 0.5), x) / s)

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 out_name: pa.array([], pa.float64())}
            )
        t = t.sort_by([(k, "ascending") for k in keys]
                      + [(score_col, "ascending")])
        bounds = _key_run_bounds(t, keys)
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
        out: dict[str, list] = {k: [] for k in keys}
        out[out_name] = []
        for i in range(len(bounds) - 1):
            a, b = int(bounds[i]), int(bounds[i + 1])
            sv, yv = s[a:b], y[a:b]
            m = b - a
            # peer runs on equal score → tie-averaged 1-based ranks
            starts = np.ones(m, bool)
            starts[1:] = sv[1:] != sv[:-1]
            ps = np.flatnonzero(starts)
            plen = np.diff(np.append(ps, m))
            fr = np.repeat(ps + (plen - 1) / 2.0, plen) + 1.0
            n_pos = yv.sum()
            n_neg = m - n_pos
            if n_pos == 0 or n_neg == 0:
                auc = None
            else:
                auc = round_half_away(
                    (float((fr * yv).sum()) - n_pos * (n_pos + 1) / 2.0)
                    / (n_pos * n_neg), round_to)
            for k in keys:
                out[k].append(t.column(k)[a].as_py())
            out[out_name].append(auc)
        return pa.table(
            {**{k: pa.array(out[k], t.schema.field(k).type) for k in keys},
             out_name: pa.array(out[out_name], pa.float64())}
        )

    from ..state.exchange import hash_exchange

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def grouped_spearman(ds, keys: list[str] | str, x_col: str, y_col: str, *,
                     out_name: str = "spearman", round_to: int = 6):
    """Per-group Spearman rank correlation, groups co-located like
    :func:`grouped_roc_auc`: one hash exchange, then per group two
    tie-averaged rank vectors (peer runs over each column's sort order)
    and a Pearson on the ranks.  Groups with < 2 rows or a constant
    column report NULL (SQL ``corr`` semantics).  For GLOBAL Spearman
    over a huge table use :func:`spearman_corr` (fractional ranks
    without co-locating raw rows)."""
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = b.select(keys + [x_col, y_col]).drop_null()
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def franks(v: "np.ndarray") -> "np.ndarray":
        import numpy as np

        order = np.argsort(v, kind="stable")
        sv = v[order]
        starts = np.ones(len(v), bool)
        starts[1:] = sv[1:] != sv[:-1]
        ps = np.flatnonzero(starts)
        plen = np.diff(np.append(ps, len(v)))
        fr_sorted = np.repeat(ps + (plen - 1) / 2.0, plen) + 1.0
        fr = np.empty(len(v))
        fr[order] = fr_sorted
        return fr

    def round_half_away(x: float, nd: int) -> float:
        s = 10.0 ** nd
        return float(np.copysign(np.floor(abs(x) * s + 0.5), x) / s)

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 out_name: pa.array([], pa.float64())}
            )
        t = t.sort_by([(k, "ascending") for k in keys])
        bounds = _key_run_bounds(t, keys)
        xs = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ys = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        out: dict[str, list] = {k: [] for k in keys}
        out[out_name] = []
        for i in range(len(bounds) - 1):
            a, b = int(bounds[i]), int(bounds[i + 1])
            rx, ry = franks(xs[a:b]), franks(ys[a:b])
            n = b - a
            sxy = float((rx * ry).sum())
            sx, sy = rx.sum(), ry.sum()
            sxx = float((rx * rx).sum())
            syy = float((ry * ry).sum())
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            val = (None if n < 2 or den <= 0
                   else round_half_away((n * sxy - sx * sy) / np.sqrt(den),
                                        round_to))
            for k in keys:
                out[k].append(t.column(k)[a].as_py())
            out[out_name].append(val)
        return pa.table(
            {**{k: pa.array(out[k], t.schema.field(k).type) for k in keys},
             out_name: pa.array(out[out_name], pa.float64())}
        )

    from ..state.exchange import hash_exchange

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def grouped_gini(ds, keys: list[str] | str, value_col: str, *,
                 out_name: str = "gini", round_to: int = 6):
    """Per-group Gini coefficient (inequality/concentration of a value
    within each group), groups co-located like :func:`grouped_roc_auc`:
    one hash exchange, then ONE segmented numpy pass per partition —
    sort by (keys, value), ``G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n`` with
    1-based in-group rank i over ascending value.  The rank formula is
    invariant to tie order, so it matches any SQL ``row_number() OVER
    (ORDER BY x)`` formulation exactly.  NULL values drop; groups whose
    value sum is 0 report NULL (the coefficient is undefined there)."""
    import numpy as np

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_partitions = default_partitions(small=True)

    def project_with_bucket(b: pa.Table) -> pa.Table:
        out = b.select(keys + [value_col]).drop_null()
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, keys, num_partitions))
        )

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        if "__bucket" in t.column_names:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 out_name: pa.array([], pa.float64())}
            )
        t = t.sort_by([(k, "ascending") for k in keys]
                      + [(value_col, "ascending")])
        bounds = _key_run_bounds(t, keys)
        starts = bounds[:-1]
        n = np.diff(bounds).astype(np.float64)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        # 1-based rank within each key run, fully segmented
        i = (np.arange(len(x), dtype=np.float64)
             - np.repeat(starts.astype(np.float64), np.diff(bounds)) + 1.0)
        sx = np.add.reduceat(x, starts)
        sixy = np.add.reduceat(i * x, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            g = 2.0 * sixy / (n * sx) - (n + 1.0) / n
        scale = 10.0 ** round_to
        g = np.copysign(np.floor(np.abs(g) * scale + 0.5), g) / scale
        vals = pa.array(np.where(sx == 0.0, np.nan, g), pa.float64())
        vals = pc.if_else(pc.is_nan(vals), pa.scalar(None, pa.float64()),
                          vals)
        key_rows = t.select(keys).take(pa.array(starts))
        return key_rows.append_column(out_name, vals)

    from ..state.exchange import hash_exchange

    projected = ds.map_batches(project_with_bucket, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def ks_two_sample(ds, value_col: str, side_col: str, side_a, side_b, *,
                  out_value: str = "at_value", out_name: str = "ks_d",
                  round_to: int = 6):
    """Exact two-sample Kolmogorov–Smirnov statistic D = sup|F_a − F_b|
    between the ``value_col`` distributions of two ``side_col`` groups —
    WITHOUT collecting either sample:

    1. per-batch indicator projection + the distinct-value combiner
       exchange (ships |distinct values| rows, not |rows|);
    2. :func:`~pyjelly_ray.stages.sort.range_sort` by value (global block
       order) + two :func:`global_prefix_sums` passes → both empirical
       CDFs at every distinct value;
    3. a vectorized |F_a − F_b| per block and a top-1 merge (deterministic
       value tiebreak).

    Returns a 1-row dataset ``(at_value, ks_d)`` — the supremum location
    and the statistic.  The division order matches SQL ``f/n`` exactly,
    so the argmax agrees bitwise with a window-function oracle."""
    import numpy as np

    from .sort import global_prefix_sums, range_sort

    def project(b: pa.Table) -> pa.Table:
        side = b.column(side_col)
        keep = pc.and_(
            pc.is_valid(b.column(value_col)),
            pc.or_(pc.equal(side, pa.scalar(side_a)),
                   pc.equal(side, pa.scalar(side_b))),
        )
        b = b.filter(keep)
        side = b.column(side_col)
        return pa.table({
            "value": b.column(value_col),
            "i1": pc.cast(pc.equal(side, pa.scalar(side_a)), pa.int64()),
            "i2": pc.cast(pc.equal(side, pa.scalar(side_b)), pa.int64()),
        })

    proj = ds.map_batches(project, batch_format="pyarrow")
    g = grouped_agg(proj, ["value"], [("c1", "i1", "sum"),
                                      ("c2", "i2", "sum")])
    totals = g.sum(["c1", "c2"])
    n1, n2 = float(totals["sum(c1)"]), float(totals["sum(c2)"])
    s = range_sort(g, "value")
    s = global_prefix_sums(s, "c1", out_name="__f1", exclusive=False)
    s = global_prefix_sums(s, "c2", out_name="__f2", exclusive=False)

    def diff(b: pa.Table) -> pa.Table:
        f1 = pc.divide(b.column("__f1"), pa.scalar(n1, pa.float64()))
        f2 = pc.divide(b.column("__f2"), pa.scalar(n2, pa.float64()))
        return pa.table({
            "value": b.column("value"),
            "__d_raw": pc.abs(pc.subtract(f1, f2)),
        })

    scored = s.map_batches(diff, batch_format="pyarrow")
    top = global_topk(scored, ["__d_raw", "value"], 1,
                      descending=[True, False])

    def finalize(b: pa.Table) -> pa.Table:
        scale = 10.0 ** round_to
        d = b.column("__d_raw").to_numpy(zero_copy_only=False)
        d = np.copysign(np.floor(np.abs(d) * scale + 0.5), d) / scale
        return pa.table({
            out_value: b.column("value"),
            out_name: pa.array(d, pa.float64()),
        })

    return top.map_batches(finalize, batch_format="pyarrow")


def oneway_anova(ds, group_col: str, value_col: str, *, round_to: int = 6):
    """One-way ANOVA F-test of ``value_col`` across ``group_col`` levels —
    the k-sample generalization of :func:`ab_welch_ttest` (reference
    parity: the reference's stats module exposes the same fixed-effects
    screen; here it is one mergeable-moment pass).

    One grouped_agg by group collapses the raw stream to k rows
    (n, mean, var_samp per level); a single-partition finalize computes
    SS_between = Σ nᵢ(mᵢ − m̄)², SS_within = Σ (nᵢ−1)vᵢ and
    F = (SSB/(k−1)) / (SSW/(N−k)), plus the effect size
    η² = SSB/(SSB+SSW).  NULL values are excluded before grouping (SQL
    ``avg``/``var_samp`` semantics).  Returns a 1-row Dataset
    ``(k_groups, n_total, f_stat, eta_sq)``.
    """

    def project(b: pa.Table) -> pa.Table:
        # drop NULL VALUES only — a NULL group key forms its own group,
        # matching the SQL oracle's WHERE value IS NOT NULL + GROUP BY
        return b.select([group_col, value_col]).filter(
            pc.is_valid(b.column(value_col)))

    g = grouped_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        [group_col],
        [("n", value_col, "count"), ("m", value_col, "mean"),
         ("v", value_col, "var")],
    )

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        empty = pa.table({
            "k_groups": pa.array([], pa.int64()),
            "n_total": pa.array([], pa.int64()),
            "f_stat": pa.array([], pa.float64()),
            "eta_sq": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([(group_col, "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        m = t.column("m").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        k = len(n)
        total = float(n.sum())
        if k < 2 or total <= k:
            return empty
        gm = float((n * m).sum()) / total
        ssb = float((n * (m - gm) ** 2).sum())
        # var_samp is NULL for n=1 groups — they contribute 0 to SSW
        ssw = float(np.nansum((n - 1.0) * np.where(np.isnan(v), 0.0, v)))
        # degenerate dispersion (all groups internally constant) -> NULL
        # statistics, matching the oracles' CASE guards
        f = ((ssb / (k - 1.0)) / (ssw / (total - k))
             if ssw > 0.0 else None)
        eta = ssb / (ssb + ssw) if ssb + ssw > 0.0 else None
        s = 10.0 ** round_to

        def _r6(x):
            return (None if x is None
                    else float(np.copysign(np.floor(abs(x) * s + 0.5), x)
                               / s))

        return pa.table({
            "k_groups": pa.array([k], pa.int64()),
            "n_total": pa.array([int(total)], pa.int64()),
            "f_stat": pa.array([_r6(f)], pa.float64()),
            "eta_sq": pa.array([_r6(eta)], pa.float64()),
        })

    out = grouped_map(g.map_batches(add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["k_groups", "n_total", "f_stat", "eta_sq"]),
        batch_format="pyarrow")


def mann_whitney_u(ds, group_col: str, variant_col: str, value_col: str, *,
                   variant_a: str = "A", variant_b: str = "B",
                   round_to: int = 6):
    """Per-group Mann–Whitney U (Wilcoxon rank-sum) test between two
    variants — the non-parametric companion to :func:`ab_welch_ttest`,
    computed WITHOUT ranking raw rows:

    1. a distinct-value combiner by ``(group, value)`` counts each
       variant's occurrences (ships |distinct| rows, not |rows|);
    2. one keyed exchange co-partitions by group; inside each group the
       sorted distinct values give tie-averaged ranks by exclusive cumsum
       (``below + (t+1)/2`` — exact half-integers, so the rank-sum is
       order-independent in float64);
    3. U₁ = R₁ − n₁(n₁+1)/2 and the tie-corrected normal approximation
       z = (U₁ − n₁n₂/2) / σ with
       σ² = n₁n₂/12 · ((n+1) − Σ(tᵢ³−tᵢ)/(n(n−1))).

    NULL values and other variants are dropped; groups missing either
    variant are omitted (SQL inner-join semantics); z is NULL when σ = 0
    (all values tied).  Returns ``(group, n_a, n_b, u_stat, z_stat)``.
    """

    def project(b: pa.Table) -> pa.Table:
        var = b.column(variant_col)
        keep = pc.and_(
            pc.is_valid(b.column(value_col)),
            pc.or_(pc.equal(var, pa.scalar(variant_a)),
                   pc.equal(var, pa.scalar(variant_b))),
        )
        b = b.filter(keep)
        var = b.column(variant_col)
        return pa.table({
            group_col: b.column(group_col),
            "value": b.column(value_col),
            "i1": pc.cast(pc.equal(var, pa.scalar(variant_a)), pa.int64()),
            "i2": pc.cast(pc.equal(var, pa.scalar(variant_b)), pa.int64()),
        })

    g = grouped_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        [group_col, "value"],
        [("c1", "i1", "sum"), ("c2", "i2", "sum")],
    )

    def kernel(t: pa.Table) -> pa.Table:
        import numpy as np

        key_type = t.schema.field(group_col).type
        cols: dict[str, list] = {group_col: [], "n_a": [], "n_b": [],
                                 "u_stat": [], "z_stat": []}
        if t.num_rows:
            t = t.sort_by([(group_col, "ascending"), ("value", "ascending")])
            bounds = _key_run_bounds(t, [group_col])
            gkeys = t.column(group_col).to_numpy(zero_copy_only=False)
            c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
            c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
            for i in range(len(bounds) - 1):
                lo, hi = bounds[i], bounds[i + 1]
                a, b = c1[lo:hi], c2[lo:hi]
                tt = a + b
                n1, n2 = float(a.sum()), float(b.sum())
                n = n1 + n2
                if n1 == 0.0 or n2 == 0.0:
                    continue
                below = np.concatenate(([0.0], np.cumsum(tt)[:-1]))
                avgrank = below + (tt + 1.0) / 2.0
                r1 = float((a * avgrank).sum())
                u1 = r1 - n1 * (n1 + 1.0) / 2.0
                tie = float((tt ** 3 - tt).sum())
                var_u = n1 * n2 / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
                z = ((u1 - n1 * n2 / 2.0) / np.sqrt(var_u)
                     if var_u > 0.0 else None)
                cols[group_col].append(gkeys[lo])
                cols["n_a"].append(int(n1))
                cols["n_b"].append(int(n2))
                cols["u_stat"].append(u1)
                cols["z_stat"].append(z)
        out = pa.table({
            group_col: pa.array(cols[group_col], key_type),
            "n_a": pa.array(cols["n_a"], pa.int64()),
            "n_b": pa.array(cols["n_b"], pa.int64()),
            "u_stat": pa.array(cols["u_stat"], pa.float64()),
            "z_stat": pa.array(cols["z_stat"], pa.float64()),
        })
        if round_to is not None:
            for name in ("u_stat", "z_stat"):
                idx = out.column_names.index(name)
                out = out.set_column(
                    idx, name, round_like_duckdb(out.column(name), round_to))
        return out

    return grouped_map(g, group_col, kernel, per_group=False)
