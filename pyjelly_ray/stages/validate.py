"""Data-quality validation: expectation rules → a violations report.

The pre-training gate every large corpus pipeline runs before a job is
allowed to consume a table: nulls where there must be none, values out of
range / outside an enum, malformed strings, duplicate keys.  Reference has
per-stream option validation (`jelly/options.py`); this generalizes it to
table-level expectations at scale.

Scale shape: every rule except ``unique`` is a pure map-side partial (one
vectorized count per batch, a ≤|rules|-row combine — nothing wide); the
``unique`` rule needs key co-location and rides the same hash-exchange
`grouped_agg` as every other wide operator (shuffle volume = |distinct
keys| after the map-side combiner, not |rows|).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rule_mask(batch: pa.Table, rule: dict):
    """Boolean violation mask for one non-unique rule over a batch."""
    col = batch.column(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        return pc.is_null(col)
    if kind == "in_range":
        lo, hi = rule.get("lo"), rule.get("hi")
        bad = pa.array(np.zeros(len(batch), bool))
        if lo is not None:
            bad = pc.or_(bad, pc.less(col, lo))
        if hi is not None:
            bad = pc.or_(bad, pc.greater(col, hi))
        # SQL-style: NULLs are not range violations (not_null is its own rule)
        return pc.and_(bad, pc.is_valid(col))
    if kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(rule["values"]))
        return pc.and_(pc.invert(ok), pc.is_valid(col))
    if kind == "regex":
        ok = pc.match_substring_regex(col, rule["pattern"])
        return pc.and_(pc.invert(ok), pc.is_valid(col))
    raise ValueError(f"unknown rule kind: {kind}")


def validate_table(ds, rules: list[dict], *, num_partitions: int | None = None):
    """Evaluate expectation ``rules`` over a Dataset; returns one report row
    per rule: ``(rule, column, n_violations, n_rows, passed)``.

    Each rule is a dict: ``{"rule": name, "column": c, "kind": k, ...}``
    with kind ∈ {not_null, in_range (lo/hi), in_set (values), regex
    (pattern), unique}.  ``unique`` counts surplus rows per duplicated
    value (SQL ``sum(cnt - 1)``); NULLs never violate range/set/regex
    rules (declare ``not_null`` separately, as in SQL semantics).
    """
    from .agg import grouped_agg

    plain = [r for r in rules if r["kind"] != "unique"]
    uniques = [r for r in rules if r["kind"] == "unique"]

    results = []

    if plain:
        names = [r["rule"] for r in plain]

        def partial(batch: pa.Table) -> pa.Table:
            viol = [
                np.int64(pc.sum(_rule_mask(batch, r)).as_py() or 0) for r in plain
            ]
            return pa.table(
                {
                    "rule": pa.array(names, pa.string()),
                    "viol": pa.array(viol, pa.int64()),
                    "rows": pa.array([batch.num_rows] * len(plain), pa.int64()),
                }
            )

        partials = ds.map_batches(partial, batch_format="pyarrow")
        merged = grouped_agg(
            partials, ["rule"],
            [("n_violations", "viol", "sum"), ("n_rows", "rows", "sum")],
            num_partitions=num_partitions, sum_as_float=False,
        )
        results.append(merged)

    for r in uniques:
        col = r["column"]
        # NULLs never violate uniqueness (SQL UNIQUE semantics) — drop them
        # map-side so the NULL-key group can't produce a zero count
        nonnull = ds.map_batches(
            lambda b, c=col: b.select([c]).filter(pc.is_valid(b.column(c))),
            batch_format="pyarrow",
        )
        counts = grouped_agg(
            nonnull, [col], [("cnt", col, "count")], num_partitions=num_partitions,
        )

        def dup_partial(b: pa.Table, rule_name=r["rule"]) -> pa.Table:
            cnt = b.column("cnt").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "rule": pa.array([rule_name], pa.string()),
                    "viol": pa.array([int((cnt - 1).sum())], pa.int64()),
                    "rows": pa.array([int(cnt.sum())], pa.int64()),
                }
            )

        dup = counts.map_batches(dup_partial, batch_format="pyarrow")
        results.append(
            grouped_agg(
                dup, ["rule"],
                [("n_violations", "viol", "sum"), ("n_rows", "rows", "sum")],
                num_partitions=num_partitions, sum_as_float=False,
            )
        )

    out = results[0]
    for other in results[1:]:
        out = out.union(other)
    col_of = {r["rule"]: r["column"] for r in rules}

    def finalize(b: pa.Table) -> pa.Table:
        rule_names = b.column("rule").to_pylist()
        nv = pc.cast(b.column("n_violations"), pa.int64())
        return pa.table(
            {
                "rule": b.column("rule"),
                "column": pa.array([col_of[n] for n in rule_names], pa.string()),
                "n_violations": nv,
                "n_rows": pc.cast(b.column("n_rows"), pa.int64()),
                "passed": pc.equal(nv, pa.scalar(0, pa.int64())),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def validate_foreign_key(ds, *, rule: str, column: str, ref_ds, ref_column: str,
                         broadcast: bool = True,
                         num_partitions: int | None = None):
    """Referential-integrity rule: count rows of ``ds`` whose ``column``
    has no match in ``ref_ds.ref_column`` (FK orphans).  Same report row
    shape as :func:`validate_table` so reports union cleanly.

    ``broadcast=True`` collects the distinct reference keys once
    (``ray.put``) and anti-filters map-side — zero shuffle, right for
    dimension-sized reference tables.  ``broadcast=False`` runs the
    co-partitioned big⋈big LEFT ANTI hash join for fact-sized references;
    at 100 TB put a Bloom prefilter (`stages/sketch.py::bloom_semi`) in
    front to cut the exchange to ~fp_rate of the probe side.
    NULL FKs are not violations (SQL semantics — declare not_null
    separately).
    """
    from .joins import broadcast_semi, hash_join

    nonnull = ds.map_batches(
        lambda b, c=column: b.select([c]).filter(pc.is_valid(b.column(c))),
        batch_format="pyarrow",
    )
    total = nonnull.count()
    if broadcast:
        orphans = broadcast_semi(
            nonnull, ref_ds, left_key=column, right_key=ref_column, anti=True
        )
    else:
        orphans = hash_join(
            nonnull, ref_ds, left_key=column, right_key=ref_column,
            how="left anti", num_partitions=num_partitions,
        )
    n_orphans = orphans.count()
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "rule": pa.array([rule], pa.string()),
                "column": pa.array([column], pa.string()),
                "n_violations": pa.array([n_orphans], pa.int64()),
                "n_rows": pa.array([total], pa.int64()),
                "passed": pa.array([n_orphans == 0], pa.bool_()),
            }
        )
    )


def benford_digit_report(ds, col: str, *, round_to: int = 6):
    """First-significant-digit distribution vs Benford's law — the
    classic forensic data-quality screen for fabricated or truncated
    monetary columns.

    The digit is extracted with pure integer arithmetic (value → cents →
    repeated //10), no log10 on data values, so the bucketing is exact and
    reproducible in SQL via integer-to-string truncation.  Map side emits
    ≤9 partial count rows per block; one tiny merge; the share
    normalization runs in a single-partition kernel over the 9-row table.
    Output: ``digit, n, share, expected`` (expected = log10(1 + 1/d)).
    """
    import numpy as np

    from .agg import grouped_agg, grouped_map, round_like_duckdb

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        x = b.column(col).drop_null().to_numpy(zero_copy_only=False)
        x = x[np.isfinite(x) & (x > 0)]
        cents = np.rint(x * 100.0).astype(np.int64)
        cents = cents[cents > 0]
        d = cents.copy()
        while True:
            m = d >= 10
            if not m.any():
                break
            d[m] //= 10
        counts = np.bincount(d, minlength=10)[1:10]
        keep = counts > 0
        return pa.table({
            "digit": pa.array(np.arange(1, 10)[keep], pa.int64()),
            "n": pa.array(counts[keep], pa.int64()),
        })

    merged = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["digit"], [("n", "n", "sum")], sum_as_float=False,
    )

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    def share_kernel(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "share": pa.array([], pa.float64()),
                             "expected": pa.array([], pa.float64())})
        t = t.sort_by([("digit", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        dig = t.column("digit").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "digit": t.column("digit"),
            "n": t.column("n"),
            "share": round_like_duckdb(pa.array(n / n.sum()), round_to),
            "expected": round_like_duckdb(
                pa.array(np.log10(1.0 + 1.0 / dig)), round_to),
        })

    tiny = merged.map_batches(add_g, batch_format="pyarrow")
    out = grouped_map(tiny, "__g", share_kernel, per_group=False)
    return out.map_batches(
        lambda b: b.select(["digit", "n", "share", "expected"]),
        batch_format="pyarrow",
    )


def drift_psi_report(ds, col: str, side_col: str, *, n_bins: int = 10,
                     round_to: int = 6):
    """Population Stability Index drift report between a reference
    (``side_col == 0``) and a current (``1``) population — the standard
    ML-monitoring screen for feature drift.

    Bin edges are the reference side's exact ``n_bins``-quantiles
    (DuckDB-identical interpolation, rounded to ``round_to`` so the SQL
    oracle bins bit-identically); both sides are bucketed map-side with
    one ``searchsorted`` (= the strict ``value > edge`` counting rule),
    counted with one tiny grouped merge, and the per-bin PSI terms
    ``(p_cur − p_ref)·ln(p_cur/p_ref)`` finalize in a single-partition
    kernel over ≤ ``n_bins`` rows.  Empty-on-either-side bins report a
    NULL term (the caller decides an epsilon policy).  The edge fit is
    one extra pass over the reference; at 100 TB swap
    :func:`~pyjelly_ray.stages.agg.grouped_quantiles` for the t-digest
    sketch, shapes unchanged.
    """
    import numpy as np
    import ray

    from .agg import grouped_agg, grouped_map, grouped_quantiles, round_like_duckdb

    qs = [(f"e{i}", i / n_bins) for i in range(1, n_bins)]

    def ref_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column(side_col), pa.scalar(0)))
        out = t.select([col])
        return out.append_column("__g", pa.array(np.zeros(t.num_rows, np.int8)))

    edges_row = grouped_quantiles(
        ds.map_batches(ref_only, batch_format="pyarrow"), "__g", col, qs,
        round_to=round_to,
    ).take_all()
    edges = np.array([edges_row[0][name] for name, _ in qs], np.float64)
    edges_ref = ray.put(edges)

    def binner(b: pa.Table) -> pa.Table:
        import numpy as np
        import ray as _ray

        e = _ray.get(edges_ref)
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "side": b.column(side_col),
            "bin": pa.array(np.searchsorted(e, v, side="left"), pa.int64()),
        })

    counts = grouped_agg(
        ds.map_batches(binner, batch_format="pyarrow", batch_size=None),
        ["side", "bin"], [("n", "bin", "count")],
    )

    def add_g(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        empty = {
            "bin": pa.array([], pa.int64()), "n_ref": pa.array([], pa.int64()),
            "n_cur": pa.array([], pa.int64()), "p_ref": pa.array([], pa.float64()),
            "p_cur": pa.array([], pa.float64()),
            "psi_term": pa.array([], pa.float64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        side = t.column("side").to_numpy(zero_copy_only=False)
        bins = t.column("bin").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        all_bins = np.unique(bins)
        n_ref = np.zeros(len(all_bins), np.int64)
        n_cur = np.zeros(len(all_bins), np.int64)
        pos = np.searchsorted(all_bins, bins)
        np.add.at(n_ref, pos[side == 0], n[side == 0])
        np.add.at(n_cur, pos[side == 1], n[side == 1])
        with np.errstate(divide="ignore", invalid="ignore"):
            p_ref = n_ref / n_ref.sum()
            p_cur = n_cur / n_cur.sum()
            term = (p_cur - p_ref) * np.log(p_cur / p_ref)
        ok = (n_ref > 0) & (n_cur > 0)
        term_arr = pa.array(np.where(ok, term, np.nan), pa.float64())
        term_arr = pc.if_else(pc.is_nan(term_arr),
                              pa.scalar(None, pa.float64()), term_arr)
        return pa.table({
            "bin": pa.array(all_bins, pa.int64()),
            "n_ref": pa.array(n_ref), "n_cur": pa.array(n_cur),
            "p_ref": round_like_duckdb(pa.array(p_ref), round_to),
            "p_cur": round_like_duckdb(pa.array(p_cur), round_to),
            "psi_term": round_like_duckdb(term_arr, round_to),
        })

    return grouped_map(counts.map_batches(add_g, batch_format="pyarrow"),
                       "__g", finalize, per_group=False)


def profile_table(ds, columns: list[str], *, round_to: int = 2):
    """One-pass dataset profile — the "look at the data first" report every
    pipeline starts with: per column, row count, NULL count, exact distinct
    count, and numeric min/max (NULL for non-numeric columns).  Rows /
    NULLs / min / max all fold in ONE map_batches partial pass (≤ |columns|
    rows per block) merged by a tiny per-column exchange; each exact
    distinct count is its own distinct-value combiner pipeline whose
    1-scalar result lands driver-side (|columns| small by definition).
    Returns long format ``(column, n, n_null, n_distinct, min_num,
    max_num)``."""
    import numpy as np

    from .agg import grouped_agg, round_like_duckdb

    def partial(b: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [],
                "min_num": [], "max_num": []}
        for c in columns:
            arr = b.column(c)
            rows["column"].append(c)
            rows["n"].append(b.num_rows)
            rows["n_null"].append(arr.null_count)
            if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
                f = pc.cast(arr, pa.float64())
                rows["min_num"].append(pc.min(f).as_py())
                rows["max_num"].append(pc.max(f).as_py())
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_num": pa.array(rows["min_num"], pa.float64()),
            "max_num": pa.array(rows["max_num"], pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = grouped_agg(partials, ["column"], [
        ("n", "n", "sum"),
        ("n_null", "n_null", "sum"),
        ("min_num", "min_num", "min"),
        ("max_num", "max_num", "max"),
    ], sum_as_float=False)

    # exact distinct per column: the distinct-value combiner collapses each
    # block to its distinct values, the exchange merges, count() is the
    # 1-scalar read (NULL counts as a distinct value in SQL COUNT(DISTINCT)?
    # no — SQL drops NULL; mirror that with drop_null map-side).
    nd = {}
    for c in columns:
        def proj(b: pa.Table, c=c) -> pa.Table:
            return pa.table({c: b.column(c).drop_null()})

        dvals = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                            [c], [("__c", c, "count")])
        nd[c] = int(dvals.count())

    def finalize(b: pa.Table) -> pa.Table:
        ndist = pa.array([nd[c] for c in b.column("column").to_pylist()],
                         pa.int64())
        return pa.table({
            "column": b.column("column"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "n_null": pc.cast(b.column("n_null"), pa.int64()),
            "n_distinct": ndist,
            "min_num": round_like_duckdb(b.column("min_num"), round_to),
            "max_num": round_like_duckdb(b.column("max_num"), round_to),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")
