"""Windowed / ordered operators over event streams.

Ray Data has no native session windows; this implements them as the
composition SURVEY.md §2 prescribes for missing operators:
``groupby(key).map_groups`` with an in-group sort — the partitioning
assumption is that one key's events fit in one group (true for per-user
streams; salt by day for pathological users).

- :func:`sessionize` — gap-based session ids per user (deterministic
  tie-break on ``event_id``).
- :func:`session_stats` — per-session aggregates (computed inside the same
  group call, so no cross-batch leakage).
- :func:`rolling_mean` — sliding-window (ROWS BETWEEN n-1 PRECEDING AND
  CURRENT ROW) trailing mean over an ordered per-key series.  Meant for
  *pre-aggregated* series (e.g. daily sums), so each group is |distinct
  order values| rows — tiny even at 100 TB of raw events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .agg import grouped_map, round_like_duckdb


def _session_ids_part(t: pa.Table, gap_minutes: float, key: str) -> pa.Table:
    """Assign 0-based gap sessions for a WHOLE key-sorted partition.

    One sort by (key, ts, event_id), then a single vectorized pass: a
    session increments on a same-key gap > threshold; the per-key counter
    resets by subtracting the running count at each key's first row.
    """
    from .agg import _key_run_bounds

    if t.num_rows == 0:
        return t.append_column("session_id", pa.array([], pa.int64()))
    t = t.sort_by([(key, "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
    us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    gap_us = int(gap_minutes * 60 * 1_000_000)
    bounds = _key_run_bounds(t, [key])
    key_start = np.zeros(t.num_rows, bool)
    key_start[bounds[:-1]] = True
    inc = np.zeros(t.num_rows, np.int64)
    inc[1:] = ((us[1:] - us[:-1] > gap_us) & ~key_start[1:]).astype(np.int64)
    run = np.cumsum(inc)
    base = np.repeat(run[bounds[:-1]], np.diff(bounds))
    return t.append_column("session_id", pa.array(run - base, pa.int64()))


def sessionize(events_ds, *, gap_minutes: float = 30.0, key: str = "user_id"):
    """Assign ``session_id`` (0-based per key) with a gap rule."""

    def part(t: pa.Table) -> pa.Table:
        return _session_ids_part(t, gap_minutes, key)

    return grouped_map(events_ds, key, part, per_group=False)


def session_stats(events_ds, *, gap_minutes: float = 30.0, round_to: int = 2):
    """Per-(user, session) aggregates: n_events, sum_value.

    Sessions are assigned and aggregated inside one partition kernel, so a
    session can never straddle batch boundaries.
    """

    def part(t: pa.Table) -> pa.Table:
        s = _session_ids_part(t, gap_minutes, "user_id")
        g = s.group_by(["user_id", "session_id"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "session_id": g.column("session_id"),
                "n_events": pc.cast(g.column("value_count"), pa.int64()),
                "sum_value": round_like_duckdb(g.column("value_sum"), round_to),
            }
        )

    return grouped_map(events_ds, "user_id", part, per_group=False)


def rolling_mean(ds, *, key: str, order_col: str, value_col: str,
                 window: int, out_name: str, round_to: int = 6):
    """Trailing moving average over each key's series ordered by ``order_col``.

    Equivalent to SQL ``avg(value) OVER (PARTITION BY key ORDER BY order_col
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.  One groupby shuffle;
    the per-group merge is a short numpy loop over windows (the input is
    expected to be an already-aggregated series, e.g. one row per day, so
    groups are small by construction — aggregate BEFORE windowing).
    """

    def fn(group: pa.Table) -> pa.Table:
        t = group.sort_by([(order_col, "ascending")])
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # direct per-window mean (not cumsum-diff) to match SQL summation
        # order bit-for-bit at round_to precision
        ma = np.empty(len(vals), dtype=np.float64)
        for i in range(len(vals)):
            ma[i] = vals[max(0, i - window + 1): i + 1].mean()
        return t.append_column(out_name, round_like_duckdb(pa.array(ma), round_to))

    return grouped_map(ds, key, fn)


def grouped_running(ds, *, key: str, order_col: str, value_col: str,
                    kinds: list[tuple[str, str]], round_to: int | None = None,
                    tiebreak: str | None = None):
    """Ordered per-key running-window columns in one exchange.

    ``kinds``: ``(out_name, kind)`` with kind ∈ {cumsum, cummax, lag,
    lead, first_value, locf, row_number, rank, dense_rank, percent_rank,
    cume_dist} or
    ``("ntile", k)`` / ``("nth_value", n)`` / ``("lag", k)`` — SQL ``SUM/MAX(value) OVER (PARTITION BY key ORDER
    BY order_col)``, ``lag/lead(value)``, ``first_value(value)`` (default
    frame: the partition's first value), ``row_number()``, ``rank()``,
    ``dense_rank()``, ``percent_rank()``, ``ntile(k)`` (earlier tiles get
    the extra rows, as in SQL).
    ``tiebreak`` (extra sort column) makes ordering total when
    ``order_col`` has ties — without it, ties make lag/row_number
    nondeterministic, exactly as in SQL.  The rank family is computed on
    ``order_col`` peer groups (rows equal on ``order_col`` share a rank),
    so it IS deterministic under ties without a tiebreak; percent_rank is
    ``(rank−1)/(n−1)`` with 0 for single-row partitions (SQL semantics).

    Partition-level vectorized kernel (``grouped_map(per_group=False)``):
    one sort, run bounds, then segmented numpy ops — no per-group Python
    call.  Every key's rows co-locate via the one hash exchange; series
    length per key is unbounded ONLY by that key's row count (same
    partitioning assumption as sessionize; salt or pre-aggregate hot keys).
    """
    sort_keys = [(key, "ascending"), (order_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def part(t: pa.Table) -> pa.Table:
        from ..stages.agg import _key_run_bounds

        if t.num_rows == 0:
            out = t
            for name, kind in kinds:
                is_int = kind in ("row_number", "rank", "dense_rank") or (
                    isinstance(kind, tuple) and kind[0] == "ntile"
                )  # nth_value stays float64 (default branch)
                if kind in ("lag_any", "lead_any"):
                    typ = t.schema.field(value_col).type
                else:
                    typ = pa.int64() if is_int else pa.float64()
                out = out.append_column(name, pa.array([], typ))
            return out
        t = t.sort_by(sort_keys)
        bounds = _key_run_bounds(t, [key])
        # index of each row's group start / size, vectorized
        grp_start = np.repeat(bounds[:-1], np.diff(bounds))
        grp_size = np.repeat(np.diff(bounds), np.diff(bounds))
        idx = np.arange(t.num_rows)
        _no_float = {"row_number", "rank", "dense_rank", "percent_rank",
                     "cume_dist", "lag_any", "lead_any"}
        if all(kind in _no_float for _, kind in kinds):
            vals = None  # type-generic kinds never touch the float view
        else:
            vals = t.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
        rank_kinds = {"rank", "dense_rank", "percent_rank", "cume_dist"}
        if any(kind in rank_kinds for _, kind in kinds):
            # peer groups: rows equal on (key, order_col) share a rank.
            # order values are already key-run-sorted, so peers are runs.
            ov = t.column(order_col).to_numpy(zero_copy_only=False)
            key_start = np.zeros(t.num_rows, bool)
            key_start[bounds[:-1]] = True
            peer_start = key_start.copy()
            peer_start[1:] |= ov[1:] != ov[:-1]
            ps = np.flatnonzero(peer_start)
            # index of each row's peer-run start → rank = start − grp_start + 1
            peer_lens = np.diff(np.append(ps, t.num_rows))
            peer_start_idx = np.repeat(ps, peer_lens)
            peer_end_idx = np.repeat(ps + peer_lens - 1, peer_lens)
            rank_np = peer_start_idx - grp_start + 1
            dense_cum = np.cumsum(peer_start)
            dense_np = dense_cum - dense_cum[grp_start] + 1
        out = t
        for name, kind in kinds:
            if kind == "row_number":
                col = pa.array(idx - grp_start + 1, pa.int64())
            elif kind == "rank":
                col = pa.array(rank_np, pa.int64())
            elif kind == "dense_rank":
                col = pa.array(dense_np, pa.int64())
            elif kind == "cume_dist":
                # rows with order value ≤ current / partition size
                col = pa.array(
                    (peer_end_idx - grp_start + 1) / grp_size, pa.float64()
                )
            elif kind == "percent_rank":
                with np.errstate(invalid="ignore", divide="ignore"):
                    pr = np.where(
                        grp_size > 1, (rank_np - 1) / np.maximum(grp_size - 1, 1), 0.0
                    )
                col = pa.array(pr, pa.float64())
            elif isinstance(kind, tuple) and kind[0] == "ewma":
                # exponentially weighted moving average per run (pandas
                # ewm(alpha, adjust=False) recurrence: y_i = (1-a)·y_{i-1}
                # + a·x_i).  Closed form via scaled cumsum so each run is
                # two vectorized passes, no per-row Python: with
                # w = (1-a)^{-i}, y_i = (1-a)^i · (x_0 + a·Σ_{1..i} x_j·w_j).
                # (1-a)^{±i} overflows float64 past i ≈ 700/|ln(1-a)|, so
                # long runs fold in bounded chunks carrying y across.
                a = float(kind[1])
                col_np = vals.copy()
                chunk = max(int(64.0 / abs(np.log1p(-a))), 8) if a < 1.0 else 1 << 30
                for s, e in zip(bounds[:-1], bounds[1:]):
                    carry = None
                    for cs in range(s, e, chunk):
                        ce = min(cs + chunk, e)
                        x = vals[cs:ce]
                        i = np.arange(ce - cs, dtype=np.float64)
                        decay = (1.0 - a) ** i
                        head = x[0] if carry is None else (1.0 - a) * carry + a * x[0]
                        scaled = np.empty(ce - cs)
                        scaled[0] = head
                        if ce - cs > 1:
                            scaled[1:] = a * x[1:]
                        y = decay * np.cumsum(scaled / decay)
                        col_np[cs:ce] = y
                        carry = y[-1]
                col = pa.array(col_np, pa.float64())
            elif isinstance(kind, tuple) and kind[0] == "cusum":
                # one-sided CUSUM drift statistic with clamp at zero:
                # s_i = max(0, s_{i-1} + (x_i − drift)) has the closed form
                # s_i = c_i − min(0, min_{j≤i} c_j) with c = cumsum(x −
                # drift) — two vectorized accumulates per run, and the
                # SAME two window functions in SQL (bit-identical: the fp
                # op order matches the sequential recurrence exactly).
                drift = float(kind[1])
                col_np = np.empty(t.num_rows, np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    c = np.cumsum(vals[s:e] - drift)
                    col_np[s:e] = c - np.minimum(np.minimum.accumulate(c), 0.0)
                col = pa.array(col_np, pa.float64())
            elif isinstance(kind, tuple) and kind[0] == "centered_mean":
                # symmetric smoother: SQL AVG(v) OVER (... ROWS BETWEEN w
                # PRECEDING AND w FOLLOWING); per-run direct window means
                # (cumsum-difference would drift ulps from SQL's
                # left-to-right adds at the rounding boundary)
                w = int(kind[1])
                full = 2 * w + 1
                col_np = np.empty(t.num_rows, np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    x = vals[s:e]
                    L = e - s
                    if L >= full:
                        sw = np.lib.stride_tricks.sliding_window_view(x, full)
                        col_np[s + w: s + L - w] = sw.mean(axis=1)
                    for i in range(min(w, L)):       # leading edge
                        col_np[s + i] = x[: min(L, i + w + 1)].mean()
                    for i in range(max(L - w, w, 0), L):  # trailing edge
                        col_np[s + i] = x[max(0, i - w):].mean()
                col = pa.array(col_np, pa.float64())
            elif isinstance(kind, tuple) and kind[0] in ("rolling_min",
                                                         "rolling_max"):
                # trailing ROWS-frame min/max: strided view + one reduce
                # per run (same shape as rolling_median); ≤ w−1 ramp rows
                w = int(kind[1])
                fn = np.min if kind[0] == "rolling_min" else np.max
                acc = (np.minimum.accumulate if kind[0] == "rolling_min"
                       else np.maximum.accumulate)
                col_np = np.empty(t.num_rows, np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    x = vals[s:e]
                    ramp = min(w - 1, e - s)
                    if ramp:
                        col_np[s:s + ramp] = acc(x[:ramp])
                    if e - s >= w:
                        sw = np.lib.stride_tricks.sliding_window_view(x, w)
                        col_np[s + w - 1: e] = fn(sw, axis=1)
                col = pa.array(col_np, pa.float64())
            elif isinstance(kind, tuple) and kind[0] == "rolling_median":
                # exact trailing ROWS-frame median (order-statistic window,
                # = SQL median(v) OVER (... ROWS BETWEEN w-1 PRECEDING AND
                # CURRENT ROW)).  Full windows: one strided view + ONE
                # vectorized np.median call per run; only the ≤ w−1 ramp-up
                # rows per run need per-row medians (bounded by the window
                # width, never the run length).  np.median's even-count
                # (a+b)/2 equals DuckDB's interpolated percentile bit-for-
                # bit (halving by a power of two commutes with rounding).
                w = int(kind[1])
                col_np = np.empty(t.num_rows, np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    x = vals[s:e]
                    ramp = min(w - 1, e - s)
                    for i in range(ramp):
                        col_np[s + i] = np.median(x[: i + 1])
                    if e - s >= w:
                        sw = np.lib.stride_tricks.sliding_window_view(x, w)
                        col_np[s + w - 1: e] = np.median(sw, axis=1)
                col = pa.array(col_np, pa.float64())
            elif kind in ("cumsum", "cummax"):
                # per-run accumulate in SQL's sequential order (a global
                # cumsum minus a group base differs in final ulps from the
                # window function's left-to-right adds)
                op = np.add if kind == "cumsum" else np.maximum
                col_np = vals.copy()
                for s, e in zip(bounds[:-1], bounds[1:]):
                    col_np[s:e] = op.accumulate(vals[s:e])
                col = pa.array(col_np, pa.float64())
            elif kind == "lag":
                lagged = np.roll(vals, 1)
                col_np = np.where(idx == grp_start, np.nan, lagged)
                col = pa.array(col_np, pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif isinstance(kind, tuple) and kind[0] == "lag":
                # lag(value, k): first k rows of each key run are NULL
                k = int(kind[1])
                lagged = np.roll(vals, k)
                col_np = np.where(idx - grp_start < k, np.nan, lagged)
                col = pa.array(col_np, pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif kind in ("lag_any", "lead_any"):
                # type-generic lag/lead: one Arrow take with null-masked
                # shifted indices — strings/timestamps keep their type
                # (the float kinds above predate this and stay float64
                # for their existing callers)
                arr = t.column(value_col).combine_chunks()
                if kind == "lag_any":
                    src = idx - 1
                    bad = idx == grp_start
                else:
                    src = idx + 1
                    bad = idx == grp_start + grp_size - 1
                iarr = pa.array(np.where(bad, 0, src), pa.int64(),
                                mask=bad)
                col = arr.take(iarr)
            elif kind == "lead":
                led = np.roll(vals, -1)
                col_np = np.where(idx == grp_start + grp_size - 1, np.nan, led)
                col = pa.array(col_np, pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif kind == "first_value":
                col = pa.array(vals[grp_start], pa.float64())
            elif kind == "locf":
                # forward fill (last observation carried forward) per key:
                # index of the most recent non-NaN row within the run, via
                # per-run maximum.accumulate over observed positions
                valid = ~np.isnan(vals)
                pos = np.where(valid, idx, -1)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    np.maximum.accumulate(pos[s:e], out=pos[s:e])
                filled = np.where(pos >= 0, vals[np.maximum(pos, 0)], np.nan)
                col = pa.array(filled, pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif kind == "linear_interp":
                # linear interpolation of NULL gaps between the bounding
                # observations ON THE ORDER AXIS (time-weighted, not
                # row-weighted); pure interpolation — leading/trailing
                # NULLs stay NULL (use locf for carry)
                ocol = t.column(order_col).combine_chunks()
                if pa.types.is_temporal(ocol.type):
                    ocol = pc.cast(ocol, pa.int64())
                tv = ocol.to_numpy(zero_copy_only=False).astype(np.float64)
                valid = ~np.isnan(vals)
                prev = np.where(valid, idx, -1)
                nxt = np.where(valid, idx, len(vals))
                for s, e in zip(bounds[:-1], bounds[1:]):
                    np.maximum.accumulate(prev[s:e], out=prev[s:e])
                    nxt[s:e] = np.minimum.accumulate(nxt[s:e][::-1])[::-1]
                has_both = (prev >= 0) & (nxt < len(vals))
                pi = np.maximum(prev, 0)
                ni = np.minimum(nxt, len(vals) - 1)
                pv, nv = vals[pi], vals[ni]
                pt, nt = tv[pi], tv[ni]
                with np.errstate(invalid="ignore", divide="ignore"):
                    frac = np.where(nt > pt, (tv - pt) / (nt - pt), 0.0)
                    interp = pv + (nv - pv) * frac
                filled = np.where(valid, vals, np.where(has_both, interp, np.nan))
                col = pa.array(filled, pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif isinstance(kind, tuple) and kind[0] == "nth_value":
                # SQL default frame (up to current row): null until the
                # frame holds n rows; requires a total order (tiebreak)
                nth = int(kind[1])
                pos = grp_start + nth - 1
                have = idx >= pos
                vv = vals[np.minimum(pos, len(vals) - 1)]
                col = pa.array(np.where(have, vv, np.nan), pa.float64())
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            elif isinstance(kind, tuple) and kind[0] == "ntile":
                k = int(kind[1])
                # SQL ntile: first (n mod k) tiles hold ceil(n/k) rows,
                # the rest floor(n/k)
                i = idx - grp_start
                q, r = grp_size // k, grp_size % k
                big = r * (q + 1)  # rows covered by the larger tiles
                with np.errstate(divide="ignore", invalid="ignore"):
                    tile = np.where(
                        i < big,
                        i // np.maximum(q + 1, 1),
                        r + (i - big) // np.maximum(q, 1),
                    )
                col = pa.array(tile + 1, pa.int64())
            else:
                raise ValueError(kind)
            if round_to is not None and pa.types.is_floating(col.type):
                col = round_like_duckdb(col, round_to)
            out = out.append_column(name, col)
        return out

    return grouped_map(ds, key, part, per_group=False)


def time_weighted_avg(ds, *, key: str, ts_col: str, value_col: str,
                      out_name: str = "twap", tiebreak: str | None = None,
                      round_to: int = 6):
    """Time-weighted average (TWAP) of each key's step series.

    Each observation holds its value until the key's next event, so the
    weight of row *i* is ``ts[i+1] − ts[i]``; the last event has no
    holding interval and contributes nothing — exactly SQL's
    ``sum(v·dur)/sum(dur)`` over ``dur = lead(ts) OVER w − ts`` with the
    NULL last row filtered.  Keys whose total duration is 0 (single event,
    or all events at one timestamp) produce no output row, matching
    ``HAVING sum(dur) > 0``.

    One hash exchange; the partition kernel is one sort + segmented
    ``np.add.reduceat`` — no per-key Python.  Input is the raw event
    stream, output is |keys| rows, so this is a pure reduction (the 100 TB
    shape: exchange volume can be cut further by pre-aggregating
    ``(Σ v·dur, Σ dur)`` map-side per key; kept single-pass here because
    the interval spans batch boundaries).
    """

    def part(t: pa.Table) -> pa.Table:
        from .agg import _key_run_bounds

        key_t = t.schema.field(key).type
        if t.num_rows == 0:
            return pa.table({key: pa.array([], key_t),
                             out_name: pa.array([], pa.float64())})
        sort_keys = [(key, "ascending"), (ts_col, "ascending")] + (
            [(tiebreak, "ascending")] if tiebreak else []
        )
        t = t.sort_by(sort_keys)
        bounds = _key_run_bounds(t, [key])
        us = pc.cast(t.column(ts_col).combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        dur = np.empty(t.num_rows, np.float64)
        dur[:-1] = us[1:] - us[:-1]
        dur[bounds[1:] - 1] = 0.0  # last event of every key holds nothing
        num = np.add.reduceat(vals * dur, bounds[:-1])
        den = np.add.reduceat(dur, bounds[:-1])
        keep = den > 0
        twap = num[keep] / den[keep]
        out_keys = t.column(key).take(pa.array(bounds[:-1][keep], pa.int64()))
        return pa.table({
            key: out_keys,
            out_name: round_like_duckdb(pa.array(twap, pa.float64()), round_to),
        })

    return grouped_map(ds, key, part, per_group=False)


def windowed_agg(ds, *, ts_col: str, width_s: float, hop_s: float | None = None,
                 keys=(), specs, round_to: int | None = None,
                 out_col: str = "w_start", num_partitions: int | None = None,
                 sum_as_float: bool = True):
    """Event-time tumbling / hopping windowed aggregate.

    Windows are epoch-aligned: window ``k`` covers ``[k·hop, k·hop +
    width)``; tumbling is the default (``hop_s=None`` ⇒ hop = width).
    Window assignment is a stateless vectorized map — tumbling appends one
    truncated-timestamp column (zero shuffle cost), hopping replicates each
    row into its ``⌈width/hop⌉`` overlapping windows via ``np.repeat``
    BEFORE :func:`~pyjelly_ray.stages.agg.grouped_agg`'s per-batch partial
    combiner (Ray fuses the two map stages), so the exchange still carries
    only ``|windows × keys|`` partial rows per block, never the replicated
    raw rows.  At 100 TB this is the streaming-window shape: no ordering
    requirement, no per-key state, late data lands in its window by value.

    ``specs`` / ``round_to`` / ``sum_as_float`` as in ``grouped_agg``.
    Null timestamps are dropped (SQL GROUP BY would emit a null bucket;
    a windowed stream has no meaningful null-time window).
    """
    from ..state.exchange import default_partitions

    num_partitions = num_partitions or default_partitions()
    from .agg import grouped_agg

    width_us = int(round(width_s * 1e6))
    hop_us = int(round((hop_s if hop_s is not None else width_s) * 1e6))
    if width_us <= 0 or hop_us <= 0 or hop_us > width_us:
        raise ValueError("need 0 < hop_s <= width_s")
    keys = [keys] if isinstance(keys, str) else list(keys)

    def assign(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if ts.null_count:
            keep = pc.is_valid(ts)
            t = t.filter(keep)
            ts = ts.filter(keep)
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        if hop_us == width_us:
            w = pc.multiply(pc.divide(us, width_us), width_us)
            return t.append_column(out_col, pc.cast(w, pa.timestamp("us")))
        usv = us.to_numpy(zero_copy_only=False)
        k_hi = usv // hop_us
        k_lo = (usv - width_us) // hop_us + 1
        n = k_hi - k_lo + 1
        idx = np.repeat(np.arange(len(usv)), n)
        first = np.cumsum(n) - n
        off = np.arange(int(n.sum())) - np.repeat(first, n)
        k = k_lo[idx] + off
        out = t.take(pa.array(idx))
        return out.append_column(
            out_col, pc.cast(pa.array(k * hop_us), pa.timestamp("us"))
        )

    mapped = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(
        mapped, [out_col, *keys], specs, round_to=round_to,
        num_partitions=num_partitions, sum_as_float=sum_as_float,
    )


def grouped_trailing_agg(ds, *, key: str, ts_col: str, value_col: str,
                         width_s: float, out_count: str = "w_count",
                         out_sum: str | None = "w_sum",
                         out_mean: str | None = None,
                         out_std: str | None = None,
                         round_to: int = 2):
    """Per-ROW trailing time-window aggregates: SQL ``count(*)/sum(value)
    OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL width
    PRECEDING AND CURRENT ROW)``.

    The per-row retrospective feature (events-in-last-N-days) every
    training pipeline derives.  One keyed exchange; per partition one sort
    and two vectorized ``searchsorted`` passes per key run: window =
    ``[searchsorted(ts, ts−width, left), searchsorted(ts, ts, right))`` —
    the right bound includes ties (RANGE-frame peer semantics), the sum is
    a cumsum difference (all-positive, no cancellation).  O(n log n) per
    partition, no per-row loop, window width never materialized.

    ``out_mean``/``out_std`` add the trailing mean and SAMPLE stddev (the
    windowed z-score ingredients) from the same band sums plus a Σx²
    cumsum — stddev NULL when the window holds < 2 rows, matching SQL
    ``stddev_samp OVER (RANGE ...)``.
    """
    need_vals = bool(out_sum or out_mean or out_std)

    def part(t: pa.Table) -> pa.Table:
        from ..stages.agg import _key_run_bounds

        if t.num_rows == 0:
            out = t.append_column(out_count, pa.array([], pa.int64()))
            for name in (out_sum, out_mean, out_std):
                if name:
                    out = out.append_column(name, pa.array([], pa.float64()))
            return out
        t = t.sort_by([(key, "ascending"), (ts_col, "ascending")])
        bounds = _key_run_bounds(t, [key])
        us = pc.cast(t.column(ts_col).combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        width_us = int(width_s * 1_000_000)
        vals = (
            t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            if need_vals
            else None
        )
        counts = np.empty(t.num_rows, np.int64)
        sums = np.empty(t.num_rows, np.float64) if need_vals else None
        sqs = np.empty(t.num_rows, np.float64) if out_std else None
        for s, e in zip(bounds[:-1], bounds[1:]):
            run = us[s:e]
            lo = np.searchsorted(run, run - width_us, side="left")
            hi = np.searchsorted(run, run, side="right")
            counts[s:e] = hi - lo
            if need_vals:
                cs = np.concatenate(([0.0], np.cumsum(vals[s:e])))
                sums[s:e] = cs[hi] - cs[lo]
            if out_std:
                c2 = np.concatenate(([0.0], np.cumsum(vals[s:e] ** 2)))
                sqs[s:e] = c2[hi] - c2[lo]
        out = t.append_column(out_count, pa.array(counts, pa.int64()))
        if out_sum:
            out = out.append_column(
                out_sum, round_like_duckdb(pa.array(sums, pa.float64()), round_to)
            )
        if out_mean:
            out = out.append_column(
                out_mean,
                round_like_duckdb(pa.array(sums / counts, pa.float64()), round_to),
            )
        if out_std:
            n = counts.astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                var = np.maximum(sqs - sums * sums / n, 0.0) / (n - 1.0)
                std = np.sqrt(var)
            std = np.where(counts > 1, std, np.nan)
            col = pa.array(std, pa.float64())
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
            out = out.append_column(out_std, round_like_duckdb(col, round_to))
        return out

    return grouped_map(ds, key, part, per_group=False)


def funnel_stages(ds, *, key: str, ts_col: str, type_col: str,
                  steps: list[str], within_s: float | None = None,
                  out: str = "stage"):
    """Ordered funnel analysis: the furthest step each key reached.

    A key is at stage i when its events contain ``steps[0..i-1]`` in strict
    time order, each step's FIRST qualifying occurrence chosen greedily
    (the standard product-analytics funnel).  ``within_s`` bounds the gap
    from the previous step's chosen event (conversion window); the first
    step is unbounded.  One keyed exchange; each partition sorts once and
    walks each key's (short) event run — same per-key contract as
    sessionize.  Returns ``(key, stage)`` with stage ∈ 0..len(steps).
    """
    from .agg import _key_run_bounds, grouped_map

    win_us = int(within_s * 1_000_000) if within_s is not None else None

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], t.schema.field(key).type
                                  if key in t.column_names else pa.int64()),
                    out: pa.array([], pa.int64()),
                }
            )
        t = t.sort_by([(key, "ascending"), (ts_col, "ascending")])
        bounds = _key_run_bounds(t, [key])
        us = pc.cast(t.column(ts_col).combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        types = t.column(type_col).to_numpy(zero_copy_only=False)
        keys_out, stages = [], []
        kcol = t.column(key)
        for s, e in zip(bounds[:-1], bounds[1:]):
            run_ts, run_ty = us[s:e], types[s:e]
            prev = None
            stage = 0
            for i, st in enumerate(steps):
                mask = run_ty == st
                if prev is not None:
                    mask = mask & (run_ts > prev)
                    if win_us is not None:
                        mask = mask & (run_ts <= prev + win_us)
                hit = np.flatnonzero(mask)
                if len(hit) == 0:
                    break
                prev = run_ts[hit[0]]  # earliest qualifying (run is sorted)
                stage = i + 1
            keys_out.append(kcol[s].as_py())
            stages.append(stage)
        return pa.table(
            {key: pa.array(keys_out, kcol.type), out: pa.array(stages, pa.int64())}
        )

    return grouped_map(ds, key, part, per_group=False)


def coalesce_intervals(ds, *, key: str, start: str, end: str,
                       num_partitions: int | None = None):
    """Merge overlapping/touching intervals per key (interval coalescing —
    availability windows, log-span merging, on-time unions).

    One keyed hash exchange; per partition: one sort by ``(key, start,
    end)``, a per-run ``maximum.accumulate`` of the end column, and island
    detection (``start > running max end`` opens a new span — touching
    intervals, ``start == prev end``, merge, as in the usual SQL
    gaps-and-islands rewrite).  Output: one row per merged span with
    ``span_start``, ``span_end`` and ``n_merged`` (input intervals
    absorbed).  Works on any orderable numeric/timestamp columns.  Same
    partitioning assumption as :func:`sessionize`: one key's intervals
    co-locate (series per key bounded by that key's rows).
    """
    from .agg import _key_run_bounds

    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)  # Ray wraps pyarrow.Schema
    key_t = schema.field(key).type
    val_t = schema.field(start).type
    empty = pa.table(
        {
            key: pa.array([], key_t),
            "span_start": pa.array([], val_t),
            "span_end": pa.array([], val_t),
            "n_merged": pa.array([], pa.int64()),
        }
    )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [(key, "ascending"), (start, "ascending"), (end, "ascending")]
        )
        bounds = _key_run_bounds(t, [key])
        s_np = t.column(start).combine_chunks().to_numpy(zero_copy_only=False)
        e_np = t.column(end).combine_chunks().to_numpy(zero_copy_only=False)
        n = t.num_rows
        cm = np.empty_like(e_np)
        new = np.zeros(n, bool)
        for rs, re_ in zip(bounds[:-1], bounds[1:]):
            cm[rs:re_] = np.maximum.accumulate(e_np[rs:re_])
            new[rs] = True
            if re_ - rs > 1:
                new[rs + 1 : re_] = s_np[rs + 1 : re_] > cm[rs : re_ - 1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        return pa.table(
            {
                key: t.column(key).take(pa.array(starts)),
                "span_start": pa.array(s_np[starts]),
                "span_end": pa.array(cm[ends - 1]),
                "n_merged": pa.array(ends - starts, pa.int64()),
            }
        )

    return grouped_map(
        ds, key, kernel, per_group=False, num_partitions=num_partitions,
        empty_schema=pa.table(
            {
                key: pa.array([], key_t),
                start: pa.array([], val_t),
                end: pa.array([], val_t),
            }
        ),
    )


def densify_days(ds, *, key: str, day: str, value: str,
                 num_partitions: int | None = None):
    """Time-series densification: per key, emit one row per integer day
    from that key's min to max observed day, zero-filling days with no
    data (the gap-fill step before any rolling/lag feature, which is
    wrong on sparse series).

    One keyed exchange; the spine is built fully vectorized per partition
    (offsets from per-run day spans + one scatter of the observed values —
    no per-key Python, no per-day rows ever leave the partition that owns
    the key).  Emitted rows per key = that key's day span; pre-aggregate
    to (key, day) before calling so input rows are already one-per-day.
    """
    from .agg import _key_run_bounds

    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)
    key_t = schema.field(key).type
    val_t = schema.field(value).type
    empty = pa.table(
        {
            key: pa.array([], key_t),
            day: pa.array([], pa.int64()),
            value: pa.array([], val_t),
        }
    )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([(key, "ascending"), (day, "ascending")])
        bounds = _key_run_bounds(t, [key])
        days = t.column(day).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column(value).combine_chunks().to_numpy(zero_copy_only=False)
        starts, ends = bounds[:-1], bounds[1:]
        lo, hi = days[starts], days[ends - 1]
        spans = (hi - lo + 1).astype(np.int64)
        off = np.concatenate([[0], np.cumsum(spans)])
        total = int(off[-1])
        nruns = len(starts)
        run_of_out = np.repeat(np.arange(nruns), spans)
        out_day = np.arange(total, dtype=np.int64) - off[run_of_out] + lo[run_of_out]
        out_val = np.zeros(total, dtype=vals.dtype)
        run_of_obs = np.repeat(np.arange(nruns), ends - starts)
        obs_pos = off[run_of_obs] + (days - lo[run_of_obs])
        out_val[obs_pos] = vals
        out_key = t.column(key).take(pa.array(starts)).combine_chunks()
        return pa.table(
            {
                key: out_key.take(pa.array(run_of_out)),
                day: pa.array(out_day),
                value: pa.array(out_val),
            }
        )

    return grouped_map(
        ds, key, kernel, per_group=False, num_partitions=num_partitions,
        empty_schema=pa.table(
            {
                key: pa.array([], key_t),
                day: pa.array([], pa.int64()),
                value: pa.array([], val_t),
            }
        ),
    )


def scd2_intervals(ds, *, key: str, order_col: str, tiebreak: str,
                   attr_col: str, valid_from: str = "valid_from",
                   valid_to: str = "valid_to",
                   current_flag: str = "is_current"):
    """Build an SCD-type-2 history table from an event/fact stream:
    consecutive equal ``attr_col`` runs per key collapse into validity
    intervals ``[valid_from, valid_to)`` — ``valid_to`` NULL (and
    ``current_flag`` true) on each key's open last regime.  Equivalent to
    the SQL lag-change-filter + lead-close two-window build, but in ONE
    keyed exchange with a single segmented kernel: sort by (key, order,
    tiebreak), change rows = first-of-key ∪ attr≠prev, close each change
    row with the next change's order value inside the same key.  A NULL
    attr is treated as a distinct regime value (SQL's ``prev <>`` drops
    NULL-attr rows instead — don't rely on parity for NULL attrs)."""
    from .agg import _key_run_bounds

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key: pa.array([], t.schema.field(key).type
                              if key in t.column_names else pa.int64()),
                attr_col: pa.array([], t.schema.field(attr_col).type
                                   if attr_col in t.column_names
                                   else pa.string()),
                valid_from: pa.array([], t.schema.field(order_col).type
                                     if order_col in t.column_names
                                     else pa.timestamp("us")),
                valid_to: pa.array([], t.schema.field(order_col).type
                                   if order_col in t.column_names
                                   else pa.timestamp("us")),
                current_flag: pa.array([], pa.bool_()),
            })
        t = t.sort_by([(key, "ascending"), (order_col, "ascending"),
                       (tiebreak, "ascending")])
        bounds = _key_run_bounds(t, [key])
        first_of_key = np.zeros(t.num_rows, bool)
        first_of_key[bounds[:-1]] = True
        codes = (t.column(attr_col).combine_chunks()
                 .dictionary_encode().indices)
        codes = pc.fill_null(codes, -1).to_numpy(zero_copy_only=False)
        change = first_of_key.copy()
        change[1:] |= codes[1:] != codes[:-1]
        idx = np.flatnonzero(change)
        # which key run each change row belongs to (for same-key closing)
        run_id = np.searchsorted(bounds[:-1], idx, side="right") - 1
        has_next = np.zeros(len(idx), bool)
        has_next[:-1] = run_id[1:] == run_id[:-1]
        next_idx = np.zeros(len(idx), np.int64)
        next_idx[:-1] = idx[1:]
        order_arr = t.column(order_col).combine_chunks()
        vt = order_arr.take(pa.array(next_idx))
        vt = pc.if_else(pa.array(has_next), vt,
                        pa.scalar(None, order_arr.type))
        rows = t.take(pa.array(idx))
        return pa.table({
            key: rows.column(key),
            attr_col: rows.column(attr_col),
            valid_from: rows.column(order_col),
            valid_to: vt,
            current_flag: pc.is_null(vt),
        })

    return grouped_map(ds, key, part, per_group=False)
